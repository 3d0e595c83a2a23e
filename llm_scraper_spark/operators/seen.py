"""The URL-seen set (SURVEY.md §2.2, D1/D2; reference cache.py:78-136).

Design for 10^10 URLs:

- State = a columnar ``seen`` table of 64-bit hashes (xxhash64 of the
  canonical URL), partitioned/stored as Parquet now, Iceberg when the
  catalog jars are present (``crawl/state.py`` handles commits).
- Membership = **Bloom pre-filter + exact left_anti join**. The Bloom filter
  is built from the seen table (driver-side, ``df.stat.bloomFilter`` — a
  single distributed agg), broadcast, and evaluated **vectorized in numpy**
  inside an Arrow UDF: candidate rows whose hash is *definitely unseen*
  bypass the anti-join entirely, so the shuffle carries only the
  maybe-seen minority. Exactness is restored by the anti-join (Bloom has
  no false negatives ⇒ no lost URLs; false positives are re-checked).
- At cluster scale the Bloom would be sharded by hash prefix; the numpy
  membership kernel is unchanged. Spark's runtime bloom-filter join
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

BLOOM_MAX_ITEMS_DRIVER = 50_000_000  # above this, skip driver bloom (shard instead)


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


def build_bloom(seen_df: DataFrame, hash_col: str = "url_hash",
                fpp: float = 0.01) -> NumpyBloom | None:
    """Build the broadcastable Bloom from the seen table (one distributed agg
    + one collect of hashes in manageable chunks via toLocalIterator-free
    collect; returns None when the table is too large for a driver bloom)."""
    n = seen_df.count()
    if n == 0:
        bloom = NumpyBloom(1, fpp)
        return bloom
    if n > BLOOM_MAX_ITEMS_DRIVER:
        return None
    bloom = NumpyBloom(n, fpp)
    pdf = seen_df.select(hash_col).toPandas()
    bloom.add_many(pdf[hash_col].to_numpy(dtype=np.int64))
    return bloom


def filter_unseen(
    candidates: DataFrame,
    seen_df: DataFrame | None,
    hash_col: str = "url_hash",
    bloom: NumpyBloom | None = None,
) -> DataFrame:
    """Return the candidate rows whose hash is not in the seen set.

    Plan shape: [bloom split] -> definitely-new ∪ (maybe-seen ANTI JOIN seen).
    The anti join only ever sees the maybe-seen minority; at steady state on
    a growing crawl most candidates are new and skip the shuffle.
    """
    if seen_df is None:
        return candidates

    if bloom is not None:
        bc = candidates.sparkSession.sparkContext.broadcast(bloom)

        @F.pandas_udf("boolean")
        def maybe_seen(h: pd.Series) -> pd.Series:
            arr = h.to_numpy(dtype=np.int64)
            return pd.Series(bc.value.contains_many(arr))

        tagged = candidates.withColumn("_maybe_seen", maybe_seen(F.col(hash_col)))
        definitely_new = tagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
        maybe = tagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
        checked = maybe.join(
            seen_df.select(F.col(hash_col)).distinct(), on=hash_col, how="left_anti"
        )
        return definitely_new.unionByName(checked)

    return candidates.join(
        seen_df.select(F.col(hash_col)).distinct(), on=hash_col, how="left_anti"
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
