"""Cuckoo-filter seen set (operators/cuckoo.py): the no-false-negative
contract under insert / delete / merge / overload, plus the distributed
executor-side build's equivalence with a driver-side build and
``filter_unseen`` exactness with the cuckoo as the pre-filter."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from llm_scraper_spark.operators.cuckoo import (
    CuckooShard, ShardedCuckoo, build_cuckoo_distributed)
from llm_scraper_spark.operators.seen import filter_unseen

RNG = np.random.RandomState(42)


def _hashes(n, exclude=None):
    h = np.unique(RNG.randint(-2**63, 2**63 - 1, size=n, dtype=np.int64))
    if exclude is not None:
        h = h[~np.isin(h, exclude)]
    return h


def test_no_false_negatives_and_fpp():
    h = _hashes(200_000)
    f = ShardedCuckoo(capacity=2 * len(h))
    f.add_many(h)
    assert f.contains_many(h).all()
    other = _hashes(100_000, exclude=h)
    # 16-bit fingerprints in 4-slot buckets: theoretical FPP ~ 8/2^16
    assert f.contains_many(other).mean() < 0.005


def test_delete_retires_without_harming_kept():
    h = _hashes(50_000)
    f = ShardedCuckoo(capacity=2 * len(h))
    f.add_many(h)
    gone, kept = h[:2_000], h[2_000:]
    assert f.delete_many(gone) == len(gone)
    # kept items must never lose membership (packed-bucket re-compaction)
    assert f.contains_many(kept).all()
    # deleted items are (modulo fingerprint collisions) actually retired —
    # the property a Bloom cannot offer
    assert f.contains_many(gone).mean() < 0.01


def test_merge_equals_union_membership():
    a, b = _hashes(30_000), _hashes(30_000)
    f = ShardedCuckoo(capacity=4 * len(a))
    f.add_many(a)
    delta = ShardedCuckoo(1, geometry=f.geometry())
    delta.add_many(b)
    f.merge_(delta)
    assert f.contains_many(a).all()
    assert f.contains_many(b).all()


def test_merge_rejects_geometry_mismatch():
    f = ShardedCuckoo(capacity=100_000)
    g = ShardedCuckoo(capacity=100_000_000)
    with pytest.raises(ValueError, match="geometry mismatch"):
        f.merge_(g)


def test_overload_stashes_never_drops():
    h = _hashes(5_000)
    f = ShardedCuckoo(capacity=1_000)  # 5x overloaded
    f.add_many(h)
    assert f.contains_many(h).all(), "overload must stash, not drop"
    assert f.saturated(), "a stash pile-up must request a rebuild"


def test_shard_serialization_roundtrip_with_stash():
    h = _hashes(4_000)
    f = ShardedCuckoo(capacity=1_000)
    f.add_many(h)
    s0 = f.shards[0]
    assert s0.stash, "overload test setup should produce stashed pairs"
    s1 = CuckooShard.from_bytes(s0.to_bytes(), f.n_buckets, seed=0)
    assert (s1.table == s0.table).all()
    assert s1.stash == s0.stash
    assert (s1.occ == s0.occ).all()


def test_distributed_build_matches_driver_build(spark):
    h = _hashes(20_000)
    df = spark.createDataFrame(
        [(int(x),) for x in h], "url_hash long").repartition(8)
    dist = build_cuckoo_distributed(df, capacity=2 * len(h))
    assert dist.contains_many(h).all()
    other = _hashes(20_000, exclude=h)
    assert dist.contains_many(other).mean() < 0.005
    # delta with pinned geometry merges into the standing filter
    d2 = _hashes(5_000, exclude=h)
    df2 = spark.createDataFrame([(int(x),) for x in d2], "url_hash long")
    delta = build_cuckoo_distributed(df2, geometry=dist.geometry())
    dist.merge_(delta)
    assert dist.contains_many(np.concatenate([h, d2])).all()


def test_filter_unseen_with_cuckoo_is_exact(spark):
    seen_h = _hashes(5_000)
    new_h = _hashes(5_000, exclude=seen_h)
    cand = spark.createDataFrame(
        [(int(x),) for x in np.concatenate([seen_h[:2_500], new_h])],
        "url_hash long")
    seen_df = spark.createDataFrame(
        [(int(x),) for x in seen_h], "url_hash long")
    filt = ShardedCuckoo(capacity=2 * len(seen_h))
    filt.add_many(seen_h)
    got = filter_unseen(cand, seen_df, bloom=filt)
    got_set = {r["url_hash"] for r in got.collect()}
    # the anti-join restores exactness regardless of filter false positives
    assert got_set == set(int(x) for x in new_h)
