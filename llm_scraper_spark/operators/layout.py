"""Z-order (Morton) file-layout keys and data-skipping statistics.

At 100 TB the fastest operator is the file you never open. Engines skip
parquet row-groups with min/max footer stats, but stats only prune when
the WRITE ORDER clusters each column — and sorting by one column
destroys clustering on every other. The standard fix (Delta/Iceberg
``OPTIMIZE ZORDER BY``) is to sort by the Z-ORDER KEY: interleave the
bits of the dimension columns so proximity in the key approximates
proximity in every dimension at once, then cut the sorted stream into
files. A 2-D box predicate (host range x quality range) then prunes the
large majority of files instead of none.

This module computes the Morton key with NATIVE integer expressions
(shift-or-mask bit spreading — no UDF, whole-stage codegen keeps it in
one projection), assigns files by key-space range division (zero
shuffles here; production writers get the same effect with
``repartitionByRange(zkey)`` + sortWithinPartitions, whose sampling
boundaries are the only non-determinism — the fixed-width key-space cut
below is the deterministic twin both engines replay), and reports
per-file min/max stats plus which files a box query would scan — the
pruning ratio IS the operator's figure of merit.

Reference spec: the reference persists results one document at a time
(cache.py insert per URL) and has no layout story; this is a pure
100 TB extension.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SPREAD_STEPS = ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
                 (2, 0x33333333), (1, 0x55555555))


def _spread16(col: Column) -> Column:
    """Spread a 16-bit value's bits into the even positions of 32 bits
    (the classic shift-or-mask ladder, Morton-code standard)."""
    x = col.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def _spread16_sql(expr: str) -> str:
    """DuckDB twin of :func:`_spread16` — identical ladder, BIGINT ops."""
    x = f"(({expr})::BIGINT & 65535)"
    for shift, mask in _SPREAD_STEPS:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def zorder_key(x: Column, y: Column) -> Column:
    """32-bit Morton interleave of two 16-bit dimensions: y bits odd,
    x bits even — one codegen'd projection, no UDF."""
    return _spread16(x).bitwiseOR(F.shiftleft(_spread16(y), 1))


def zorder_key_sql(x_expr: str, y_expr: str) -> str:
    return (f"({_spread16_sql(x_expr)} | "
            f"({_spread16_sql(y_expr)} << 1))")


def zorder_file_width(n_files: int) -> int:
    """Key-space width per file group: ceil(2^32 / n_files) — THE single
    definition of the bucketing geometry, shared by the pruning-stats
    operator and the physical sink so they can never disagree."""
    return (1 << 32) // n_files + (1 if (1 << 32) % n_files else 0)


def layout_pruning_stats(df: DataFrame, x_col: str, y_col: str,
                         n_files: int = 64,
                         box: tuple[int, int, int, int] = (0, 0, 0, 0),
                         ) -> DataFrame:
    """Per-file min/max stats + box-query skip decisions for a Z-ordered
    layout of ``df`` over two 16-bit dimensions.

    ``file_id = zkey DIV ceil(2^32 / n_files)`` — a fixed key-space cut,
    deterministic across engines and partitionings (no window, no
    sample-based range boundaries). File sizes vary with key density;
    production writers balance them with repartitionByRange instead,
    which preserves the same min/max geometry this query verifies.

    ``box = (x_lo, x_hi, y_lo, y_hi)`` inclusive. A file is SCANNED when
    its (min,max) rectangle intersects the box — the exact decision a
    reader makes from parquet footer stats; ``match_rows`` counts rows
    actually satisfying the predicate, so scanned-but-zero-match files
    measure the clustering slack.

    Plan shape: one projection (the Morton ladder) + one
    map-side-combined groupBy on file_id. One shuffle of n_files slim
    rows.
    """
    x_lo, x_hi, y_lo, y_hi = box
    width = zorder_file_width(n_files)
    keyed = df.select(
        F.col(x_col).alias("x"), F.col(y_col).alias("y"),
        zorder_key(F.col(x_col), F.col(y_col)).alias("zkey"),
    ).withColumn("file_id", F.expr(f"zkey DIV {width}"))
    per_file = keyed.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("x").alias("min_x"), F.max("x").alias("max_x"),
        F.min("y").alias("min_y"), F.max("y").alias("max_y"),
        F.sum(
            ((F.col("x") >= x_lo) & (F.col("x") <= x_hi)
             & (F.col("y") >= y_lo) & (F.col("y") <= y_hi)).cast("long")
        ).alias("match_rows"),
    )
    scanned = ((F.col("min_x") <= x_hi) & (F.col("max_x") >= x_lo)
               & (F.col("min_y") <= y_hi) & (F.col("max_y") >= y_lo))
    return per_file.withColumn("scanned", scanned)


def layout_pruning_oracle_sql(rows_sql: str, n_files: int = 64,
                              box: tuple[int, int, int, int] = (0, 0, 0, 0),
                              ) -> str:
    """DuckDB twin of :func:`layout_pruning_stats`; ``rows_sql`` must
    yield columns (x, y)."""
    x_lo, x_hi, y_lo, y_hi = box
    width = zorder_file_width(n_files)
    z = zorder_key_sql("x", "y")
    return f"""
WITH rows_in AS ({rows_sql}),
keyed AS (
  SELECT x, y, {z} AS zkey, {z} // {width} AS file_id FROM rows_in
),
per_file AS (
  SELECT file_id, count(*)::BIGINT AS n_rows,
         min(x) AS min_x, max(x) AS max_x,
         min(y) AS min_y, max(y) AS max_y,
         sum((x >= {x_lo} AND x <= {x_hi} AND
              y >= {y_lo} AND y <= {y_hi})::BIGINT)::BIGINT AS match_rows
  FROM keyed GROUP BY file_id
)
SELECT file_id, n_rows, min_x, max_x, min_y, max_y, match_rows,
       (min_x <= {x_hi} AND max_x >= {x_lo} AND
        min_y <= {y_hi} AND max_y >= {y_lo}) AS scanned
FROM per_file"""
