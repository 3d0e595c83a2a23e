"""The URL-seen set (SURVEY.md §2.2, D1/D2; reference cache.py:78-136).

Design for 10^10 URLs:

- State = a columnar ``seen`` table of 64-bit hashes (xxhash64 of the
  canonical URL), partitioned/stored as Parquet now, Iceberg when the
  catalog jars are present (``crawl/state.py`` handles commits).
- Membership = **Bloom pre-filter + exact left_anti join**. The Bloom is a
  ``ShardedBloom``: hash-prefix shards, each shard's bit array built
  **executor-side** by the reducer that owns that shard
  (``groupBy(shard).applyInPandas`` — the only driver transfer is the
  finished bitmaps, which IS the broadcast payload; no row ever crosses to
  the driver). Membership is evaluated vectorized in numpy inside an Arrow
  UDF: candidate rows whose hash is *definitely unseen* bypass the
  anti-join entirely, so the shuffle carries only the maybe-seen minority.
  Exactness is restored by the anti-join (Bloom has no false negatives ⇒
  no lost URLs; false positives are re-checked).
- Incremental across waves: blooms built with the same geometry
  (n_shards, bits, k) OR together, so the wave loop builds a small delta
  bloom from the newly seen rows and ORs it into the standing filter
  instead of rebuilding from the full 10^10-row seen table every wave
  (rebuild only when item count outgrows the sized capacity).
- Spark's runtime bloom-filter join
  (spark.sql.optimizer.runtime.bloomFilter.enabled) adds a second,
  automatic layer inside the join itself.

The reference's check-then-insert (cache.py:88-92) maps to:
``new = candidates ANTI JOIN seen`` then ``seen += new`` — same semantics,
batch-atomic per wave instead of per URL.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

SHARD_TARGET_BITS = 1 << 27  # ~16 MiB of bits per shard bitmap


class NumpyBloom:
    """A minimal split-Bloom filter over int64 hashes, vectorized with numpy.

    k bit-positions are derived from the 64-bit hash by splitmix64-style
    remixing — no per-row Python, one numpy pass per Arrow batch.
    """

    __slots__ = ("m_bits", "k", "bits")

    def __init__(self, n_items: int, fpp: float = 0.01):
        n_items = max(n_items, 1)
        m = int(-n_items * math.log(fpp) / (math.log(2) ** 2))
        self.m_bits = max(64, m)
        self.k = max(1, int(round(self.m_bits / n_items * math.log(2))))
        self.bits = np.zeros((self.m_bits + 63) // 64, dtype=np.uint64)

    @staticmethod
    def _mix(h: np.ndarray, i: int) -> np.ndarray:
        # splitmix64 finalizer with a per-probe offset; the offset is
        # reduced mod 2^64 in Python int space (same value as uint64
        # wraparound, without numpy's scalar-overflow RuntimeWarning)
        z = h + np.uint64((0x9E3779B97F4A7C15 * (i + 1)) & 0xFFFFFFFFFFFFFFFF)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))

    def add_many(self, hashes: np.ndarray) -> None:
        h = hashes.astype(np.uint64, copy=False)
        for i in range(self.k):
            pos = self._mix(h, i) % np.uint64(self.m_bits)
            np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership: True = maybe present, False = definitely not."""
        h = hashes.astype(np.uint64, copy=False)
        result = np.ones(len(h), dtype=bool)
        for i in range(self.k):
            pos = self._mix(h, i) % np.uint64(self.m_bits)
            word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
            result &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return result


def _geometry(capacity: int, fpp: float) -> tuple[int, int, int]:
    """(n_shards, bits_per_shard, k) for a target capacity/fpp; bits per
    shard is rounded up so total bits >= the classic -n*ln(p)/ln(2)^2."""
    capacity = max(capacity, 1)
    m = max(64, int(-capacity * math.log(fpp) / (math.log(2) ** 2)))
    n_shards = max(1, (m + SHARD_TARGET_BITS - 1) // SHARD_TARGET_BITS)
    bits_per_shard = ((m + n_shards - 1) // n_shards + 63) // 64 * 64
    k = max(1, int(round(n_shards * bits_per_shard / capacity * math.log(2))))
    return n_shards, bits_per_shard, k


class ShardedBloom:
    """Hash-prefix-sharded Bloom over int64 hashes.

    Shard routing uses the raw hash mod n_shards; bit positions within a
    shard use the splitmix64 remix (NumpyBloom._mix), so routing and
    probing consume independent bits. Two ShardedBlooms with the same
    geometry OR together — the basis of the incremental wave update.

    Scale note: total bitmap bytes = capacity * 1.2 bytes at fpp=1%
    (50M URLs -> ~60 MB broadcast; at the 10^10 design point you either
    raise fpp to ~5% (~7 GB, still one broadcast) or keep per-hash-range
    blooms alongside the hash-partitioned seen table and route candidate
    partitions to their range's bloom — the shard layout here is exactly
    that layout, minus the routing table).
    """

    __slots__ = ("n_shards", "bits_per_shard", "k", "shards", "capacity", "items")

    def __init__(self, capacity: int, fpp: float = 0.01):
        self.n_shards, self.bits_per_shard, self.k = _geometry(capacity, fpp)
        self.capacity = max(capacity, 1)
        self.items = 0
        self.shards = [
            np.zeros(self.bits_per_shard // 64, dtype=np.uint64)
            for _ in range(self.n_shards)
        ]

    def geometry(self) -> tuple[int, int, int]:
        return (self.n_shards, self.bits_per_shard, self.k)

    def shard_of(self, hashes: np.ndarray) -> np.ndarray:
        return (hashes.astype(np.uint64, copy=False)
                % np.uint64(self.n_shards)).astype(np.int64)

    def add_many(self, hashes: np.ndarray) -> None:
        h = hashes.astype(np.uint64, copy=False)
        sid = self.shard_of(h)
        for s in np.unique(sid):
            sub = h[sid == s]
            for i in range(self.k):
                pos = NumpyBloom._mix(sub, i) % np.uint64(self.bits_per_shard)
                np.bitwise_or.at(
                    self.shards[int(s)],
                    (pos >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (pos & np.uint64(63)),
                )
        self.items += len(h)

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64, copy=False)
        sid = self.shard_of(h)
        result = np.ones(len(h), dtype=bool)
        for s in np.unique(sid):
            mask = sid == s
            sub = h[mask]
            bits = self.shards[int(s)]
            r = np.ones(len(sub), dtype=bool)
            for i in range(self.k):
                pos = NumpyBloom._mix(sub, i) % np.uint64(self.bits_per_shard)
                word = bits[(pos >> np.uint64(6)).astype(np.int64)]
                r &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
            result[mask] = r
        return result

    def or_(self, other: "ShardedBloom") -> None:
        """In-place union; requires identical geometry."""
        if self.geometry() != other.geometry():
            raise ValueError(
                f"bloom geometry mismatch: {self.geometry()} vs {other.geometry()}"
            )
        for mine, theirs in zip(self.shards, other.shards):
            np.bitwise_or(mine, theirs, out=mine)
        self.items += other.items

    def saturated(self, headroom: float = 0.8) -> bool:
        return self.items > self.capacity * headroom


def build_bloom_distributed(
    seen_df: DataFrame,
    hash_col: str = "url_hash",
    capacity: int | None = None,
    fpp: float = 0.01,
    geometry: tuple[int, int, int] | None = None,
) -> ShardedBloom:
    """Build a ShardedBloom fully executor-side.

    Plan: hashes -> groupBy(shard = hash % n_shards) -> applyInPandas
    builds that shard's bit array in the reducer that owns it -> the only
    rows reaching the driver are the finished (shard_id, bitmap) pairs,
    i.e. exactly the bytes that must be broadcast anyway. No toPandas of
    the seen table at any size (the round-1 driver-side build collected up
    to 50M hashes; this replaces it per VERDICT #4).

    ``geometry`` overrides capacity sizing so delta blooms match a standing
    bloom's geometry and can be OR-merged (incremental wave updates).
    """
    if geometry is None:
        if capacity is None:
            capacity = seen_df.count()
        bloom = ShardedBloom(capacity, fpp)
    else:
        bloom = ShardedBloom(1, fpp)
        bloom.n_shards, bloom.bits_per_shard, bloom.k = geometry
        bloom.capacity = max(capacity or 1, 1)
        bloom.shards = [
            np.zeros(bloom.bits_per_shard // 64, dtype=np.uint64)
            for _ in range(bloom.n_shards)
        ]
    n_shards, bits_per_shard, k = bloom.geometry()

    hashes = seen_df.select(F.col(hash_col).alias("h"))
    sharded = hashes.withColumn(
        "shard", F.pmod(F.col("h"), F.lit(n_shards)).cast("int")
    )

    def build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        h = pdf["h"].to_numpy(dtype=np.int64).astype(np.uint64)
        bits = np.zeros(bits_per_shard // 64, dtype=np.uint64)
        for i in range(k):
            pos = NumpyBloom._mix(h, i) % np.uint64(bits_per_shard)
            np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))
        return pd.DataFrame(
            {"shard": [int(pdf["shard"].iloc[0])], "n": [len(h)],
             "bits": [bits.tobytes()]}
        )

    rows = (
        sharded.groupBy("shard")
        .applyInPandas(build_shard, schema="shard int, n long, bits binary")
        .collect()
    )
    total = 0
    for r in rows:
        arr = np.frombuffer(r["bits"], dtype=np.uint64)
        np.bitwise_or(bloom.shards[r["shard"]], arr, out=bloom.shards[r["shard"]])
        total += r["n"]
    bloom.items = total
    return bloom


def bloom_tag(candidates: DataFrame, bloom,
              hash_col: str = "url_hash",
              out_col: str = "_maybe_seen") -> DataFrame:
    """Attach the approximate-membership verdict as a boolean column —
    one vectorized probe of the broadcast filter per Arrow batch. Split
    out of filter_unseen so the wave loop can FUSE the tag into its
    discovery checkpoint (the tag then computes once, during that
    materialization, instead of once per consumer branch)."""
    bc = candidates.sparkSession.sparkContext.broadcast(bloom)

    @F.pandas_udf("boolean")
    def maybe_seen(h: pd.Series) -> pd.Series:
        arr = h.to_numpy(dtype=np.int64)
        return pd.Series(bc.value.contains_many(arr))

    return candidates.withColumn(out_col, maybe_seen(F.col(hash_col)))


def filter_unseen(
    candidates: DataFrame,
    seen_df: DataFrame | None,
    hash_col: str = "url_hash",
    bloom: "ShardedBloom | NumpyBloom | None" = None,
    broadcast_candidates: bool = False,
    checked_ck=None,
) -> DataFrame:
    """Return the candidate rows whose hash is not in the seen set.

    Plan shape: [bloom split] -> definitely-new ∪ (maybe-seen ANTI JOIN seen).
    The anti join only ever sees the maybe-seen minority; at steady state on
    a growing crawl most candidates are new and skip the shuffle.

    The seen side is NOT de-duplicated before the join: anti-join results
    are invariant under build-side duplicates (a candidate is dropped iff
    ANY match exists), and the seen deltas are duplicate-free by the
    commit protocol anyway (a url_hash enters at most one delta ever —
    crawl/state.py module docs). A ``.distinct()`` here cost one full
    aggregation pass over the ENTIRE seen table per wave — at the 10^10
    design point that's re-shuffling the biggest table in the system
    every wave for zero semantic effect.

    ``broadcast_candidates=True`` (bloom path only) REVERSES the join so
    the seen table is never shuffled at all: broadcast the maybe-seen
    hashes, LEFT SEMI them against a narrow scan of seen (map-side,
    no exchange on the 10^10-row side), then broadcast the tiny matched
    set back as a broadcast anti join. Correct whenever the maybe side
    fits a broadcast — the caller gates it on the wave's discovered
    count (an upper bound on the maybe side it already has from the
    wave Observation), falling back to the shuffled anti join beyond
    the threshold. This is the wave loop's default regime: per-wave
    discoveries are millions of rows while the seen table is the
    biggest table in the system.
    """
    if seen_df is None:
        return candidates.drop("_maybe_seen") \
            if "_maybe_seen" in candidates.columns else candidates

    if bloom is not None:
        # callers that already materialized the tag (bloom_tag fused into
        # their discovery checkpoint — one Arrow pass instead of one per
        # branch below) are detected by the column's presence
        if "_maybe_seen" in candidates.columns:
            tagged = candidates
        else:
            tagged = bloom_tag(candidates, bloom, hash_col)
        definitely_new = tagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
        maybe = tagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
        if broadcast_candidates:
            matched = seen_df.select(F.col(hash_col)).join(
                F.broadcast(maybe.select(F.col(hash_col))),
                on=hash_col, how="left_semi")
            checked = maybe.join(F.broadcast(matched),
                                 on=hash_col, how="left_anti")
        else:
            checked = maybe.join(
                seen_df.select(F.col(hash_col)), on=hash_col, how="left_anti"
            )
        # ``checked_ck``: optional materializer (wave loop passes its
        # tracked-localCheckpoint helper) for JUST the anti-join branch —
        # it is the only expensive sub-plan here (the seen-side shuffle),
        # and it is tiny in rows (bloom false positives + true in-wave
        # re-sights), so pinning it makes the whole returned union cheap
        # to re-evaluate: a native filter over the caller's candidate
        # checkpoint plus cached small blocks. That lets downstream seq
        # assignment skip ITS input materialization entirely.
        if checked_ck is not None:
            checked = checked_ck(checked)
        return definitely_new.unionByName(checked)

    return candidates.join(
        seen_df.select(F.col(hash_col)), on=hash_col, how="left_anti"
    )


def first_occurrence_dedup(df: DataFrame, key_col: str, order_col: str) -> DataFrame:
    """In-batch order-preserving dedup (D3, worker.py:146,189:
    ``list(dict.fromkeys(urls))``): keep the min(order_col) row per key.

    Implemented as a partial-aggregable min-by (map-side combine) rather
    than a window, so the shuffle carries one row per key.
    """
    others = [c for c in df.columns if c != key_col]
    packed = df.select(
        F.col(key_col),
        F.struct(F.col(order_col).alias("_ord"), *[F.col(c) for c in others]).alias("_row"),
    )
    agg = packed.groupBy(key_col).agg(F.min_by("_row", F.col("_row._ord")).alias("_row"))
    return agg.select(F.col(key_col), *[F.col(f"_row.{c}").alias(c) for c in others])
