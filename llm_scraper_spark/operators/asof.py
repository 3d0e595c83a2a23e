"""As-of (time-travel) join — Spark has no native ASOF JOIN, and the naive
formulations are scale-killers: a range-condition join degenerates to
broadcast-nested-loop, and "join all earlier rows then keep the max"
explodes quadratically per key. This is the canonical scalable
re-expression: UNION the two sides, one window pass per key carries the
most recent right-side row forward, filter back to left rows. ONE shuffle
(the window exchange on the key), no Python, no row explosion — the same
plan shape kdb/Flink temporal joins lower to.

The reference has no temporal joins (its tasks are point lookups,
SURVEY §2.4); this is a training-pipeline extension — e.g. attach the
latest robots snapshot, parser-config version, or label event to every
fetched page as of its crawl time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, ts_col: str = "ts",
              by_cols: tuple[str, ...] | list[str] = ("user_id",),
              value_cols: list[str] | None = None,
              prefix: str = "asof_") -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``ts_col`` <= the left row's (per ``by_cols``) — DuckDB/pandas
    ``merge_asof`` backward semantics. Right ``value_cols`` (plus the
    matched timestamp) come back prefixed; unmatched left rows get nulls.

    Equal timestamps match (at-or-before): the union sorts right rows
    before left rows within a tie. Ties BETWEEN right rows at the same
    (key, ts) are broken DETERMINISTICALLY — the row whose payload struct
    has the greatest xxhash64 wins, so the result is stable under any
    partitioning (an engine-specific pick would make oracle comparison
    flaky). Pre-dedupe the right side if a semantic tie-break matters.
    """
    by = list(by_cols)
    reserved = {"_ts", "_side", "_tb", "_rv", "_match"}
    clash = reserved & set(left.columns) | reserved & set(right.columns)
    if clash:
        raise ValueError(f"asof_join: rename input columns {sorted(clash)}")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in by and c != ts_col]
    payload = F.struct(
        F.col(ts_col).alias(ts_col), *[F.col(c) for c in value_cols]
    )
    r2 = right.select(
        *by, F.col(ts_col).alias("_ts"), F.lit(0).alias("_side"),
        F.xxhash64(payload).alias("_tb"),
        payload.alias("_rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by],
    )
    rv_type = r2.schema["_rv"].dataType
    l2 = left.select(
        *by, F.col(ts_col).alias("_ts"), F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_tb"),
        F.lit(None).cast(rv_type).alias("_rv"),
        *[c for c in left.columns if c not in by],
    )
    # _side orders right(0) before left(1) at equal ts; _tb only orders
    # right-vs-right ties (last-in-frame = max hash wins) — left rows'
    # constant 0 is inert because _side already separates the sides.
    w = (
        Window.partitionBy(*by)
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = r2.unionByName(l2).withColumn(
        "_match", F.last("_rv", ignorenulls=True).over(w)
    )
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col(f"_match.{ts_col}").alias(f"{prefix}{ts_col}"))
    out_cols += [F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in value_cols]
    return matched.filter(F.col("_side") == 1).select(*out_cols)


def asof_join_tolerance(left: DataFrame, right: DataFrame,
                        tolerance_us: int, ts_col: str = "ts",
                        by_cols: tuple[str, ...] | list[str] = ("user_id",),
                        value_cols: list[str] | None = None,
                        prefix: str = "asof_") -> DataFrame:
    """asof_join with a max-staleness window: matches older than
    ``tolerance_us`` microseconds are nulled out (pandas merge_asof
    ``tolerance``). Same single-shuffle plan — the staleness check is a
    post-window codegen'd projection, not a join condition."""
    if value_cols is None:
        by = set(by_cols)
        value_cols = [c for c in right.columns if c not in by and c != ts_col]
    joined = asof_join(left, right, ts_col, by_cols, value_cols, prefix)
    # cast: unix_micros rejects TIMESTAMP_NTZ (parquet default); under the
    # engine's pinned UTC session tz the cast is exact
    age = (F.unix_micros(F.col(ts_col).cast("timestamp"))
           - F.unix_micros(F.col(f"{prefix}{ts_col}").cast("timestamp")))
    fresh = age <= F.lit(int(tolerance_us))
    # null out exactly the columns the join ADDED — a prefix string match
    # would also null pre-existing left columns that happen to start with
    # `prefix`
    added = {f"{prefix}{ts_col}", *(f"{prefix}{c}" for c in value_cols)}
    clash = added & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join_tolerance: left columns {sorted(clash)} collide with "
            f"the join's output names — rename them or change prefix")
    return joined.select(
        *[c for c in joined.columns if c not in added],
        *[F.when(fresh, F.col(c)).otherwise(F.lit(None)).alias(c)
          for c in joined.columns if c in added],
    )
