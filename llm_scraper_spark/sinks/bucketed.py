"""Bucketed parquet sink — shuffle-free co-located joins at 100 TB.

The crawl's standing tables meet in the same joins every wave: the seen
set anti-joins new candidates on ``url_hash``; per-host state joins the
frontier on ``host``. At 100 TB those are the dominant shuffles — every
wave re-exchanges the multi-TB seen table just to line it up with a much
smaller delta. Bucketing is Spark's answer: write both sides
``bucketBy(N, key)`` into the catalog and Catalyst plans a SortMergeJoin
with NO Exchange on either side (bucket pruning + co-location replace
the shuffle). The reference keeps this state in Redis sets
(/root/reference/cache.py:78-148) — one box, no layout question; here
the layout IS the optimization.

Usage shape::

    write_bucketed(seen_df, "seen", ["url_hash"], 256, path=...)
    write_bucketed(delta_df, "delta", ["url_hash"], 256, path=...)
    joined = colocated_join(spark, "seen", "delta", on=["url_hash"])
    # .explain(): SortMergeJoin, zero Exchange operators

Pick ``n_buckets`` so a bucket of the BIG table fits an executor core's
memory at target scale (e.g. 100 TB / 8192 buckets ~ 12 GB per bucket —
size to taste); both sides must use the same N and the same key for the
exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) parquet catalog table.

    ``sort_cols`` defaults to ``bucket_cols`` — pre-sorting within buckets
    lets the SortMergeJoin skip its per-partition sort too, so the join is
    a pure streaming merge.
    """
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key.

    When both tables were written with :func:`write_bucketed` using the
    same ``n_buckets`` over ``on``, the physical plan contains no
    Exchange (asserted in tests/test_plans.py) — at 100 TB this is the
    difference between re-shuffling the seen table every wave and
    streaming it from disk already lined up.
    """
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
