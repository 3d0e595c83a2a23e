"""Z-ordered parquet layout with a manifest — write-side data skipping.

`operators/layout.py` computes the Morton keys and proves the pruning
geometry; this module makes it PHYSICAL: documents land in parquet
partitioned by the z-range file group, a manifest records each group's
(min, max) per dimension — exactly the role of an Iceberg manifest's
column stats — and the reader turns a 2-D box predicate into a
PARTITION FILTER, so skipped file groups are never opened, listed or
decoded. At 100 TB this is the difference between a query that reads
64 files and one that reads 6,400.

The reader prunes with manifest stats (a files-count-sized driver read,
the same thing an Iceberg planner does), pushes `file_id IN (...)` into
the scan as a partition filter, and re-applies the exact box predicate
for row-level correctness — stats pruning is a superset admission test,
never a substitute for the filter.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.layout import zorder_file_width, zorder_key


def write_zorder_layout(df: DataFrame, path: str, x_col: str, y_col: str,
                        n_files: int = 64) -> None:
    """Write ``df`` as parquet partitioned by the Morton file group,
    plus ``_manifest.parquet`` with per-group min/max stats.

    The manifest aggregates the parquet JUST WRITTEN — never the input
    lineage: a nondeterministic upstream (sample(), rand(), a mutated
    source) would otherwise produce a manifest describing different
    rows than the files, and an under-covering min/max makes the pruned
    reader silently drop matching rows. Reading back also skips a full
    recompute of the upstream DAG."""
    width = zorder_file_width(n_files)
    keyed = df.withColumn(
        "zkey", zorder_key(F.col(x_col), F.col(y_col))
    ).withColumn("file_id", F.expr(f"zkey DIV {width}"))
    keyed.write.mode("overwrite").partitionBy("file_id").parquet(path)
    written = df.sparkSession.read.parquet(path)
    manifest = written.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min(x_col).alias("min_x"), F.max(x_col).alias("max_x"),
        F.min(y_col).alias("min_y"), F.max(y_col).alias("max_y"),
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "_manifest.parquet"))


def read_pruned(spark: SparkSession, path: str, x_col: str, y_col: str,
                box: tuple[int, int, int, int]) -> tuple[DataFrame, dict]:
    """Read only the file groups whose manifest rectangle intersects
    ``box`` (inclusive), then re-apply the exact predicate.

    Returns (rows, stats) where stats reports total vs scanned groups —
    the pruning ratio a planner would log.
    """
    x_lo, x_hi, y_lo, y_hi = box
    manifest = spark.read.parquet(os.path.join(path, "_manifest.parquet"))
    hit = manifest.filter(
        (F.col("min_x") <= x_hi) & (F.col("max_x") >= x_lo)
        & (F.col("min_y") <= y_hi) & (F.col("max_y") >= y_lo))
    # manifest is files-count-sized: collecting the hit list is the same
    # driver-side work an Iceberg planner does per query
    file_ids = [r["file_id"] for r in hit.select("file_id").collect()]
    n_total = manifest.count()
    rows = (
        spark.read.parquet(path)
        .filter(F.col("file_id").isin(file_ids))   # partition filter
        .filter((F.col(x_col) >= x_lo) & (F.col(x_col) <= x_hi)
                & (F.col(y_col) >= y_lo) & (F.col(y_col) <= y_hi))
    )
    return rows, {"total_groups": n_total, "scanned_groups": len(file_ids)}
