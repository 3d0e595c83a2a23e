"""Compaction EXECUTOR tests (VERDICT r3 #5): content equality pre/post,
read-amplification reduction, and crash safety at both sides of the
manifest commit point."""

import json
import os

import pytest
from pyspark.sql import functions as F

from llm_scraper_spark.sinks.compaction import (
    MANIFEST, STAGE, compact_files, data_files, recover_compaction)


def _fragmented_table(spark, path, n_waves=6, rows_per_wave=300):
    """Wave-fragmented layout like the crawl state's documents table:
    one dir per wave, several small files each."""
    for w in range(n_waves):
        df = spark.range(w * rows_per_wave, (w + 1) * rows_per_wave).select(
            F.col("id").alias("doc_id"),
            F.lit(w).alias("wave"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        df.repartition(3).write.mode("overwrite").parquet(
            os.path.join(path, f"wave={w}"))
    return os.path.join(path)


def _content(spark, table_dir):
    files = [os.path.join(table_dir, rel) for rel, _ in data_files(table_dir)]
    rows = spark.read.parquet(*files).select(
        "doc_id", "wave", "payload").collect()
    return sorted((r["doc_id"], r["wave"], r["payload"]) for r in rows)


def test_compact_preserves_rows_and_cuts_read_amplification(spark, tmp_path):
    table = _fragmented_table(spark, str(tmp_path / "t"))
    before = _content(spark, table)
    n_before = len(data_files(table))
    assert n_before >= 18  # 6 waves x 3 files
    stats = compact_files(spark, table, capacity=1 << 40)  # one big group
    after = _content(spark, table)
    assert after == before
    assert stats["files_before"] == n_before
    assert stats["files_after"] == 1
    assert stats["read_amplification"] == round(n_before / 1, 3)
    # layout is flat now; wave provenance survives in the data
    assert all("/" not in rel and os.sep not in rel
               for rel, _ in data_files(table))


def test_compact_by_rows_groups_and_retains_single_files(spark, tmp_path):
    table = _fragmented_table(spark, str(tmp_path / "t"), n_waves=4,
                              rows_per_wave=200)
    before = _content(spark, table)
    # 12 files x ~66 rows; capacity 300 rows -> ceil(800/300) >= 3 groups
    stats = compact_files(spark, table, capacity=300, by_rows=True)
    assert _content(spark, table) == before
    assert 1 < stats["files_after"] < stats["files_before"]
    # a second pass at the same capacity must be ~idempotent: every group
    # already fits, so everything is retained
    stats2 = compact_files(spark, table, capacity=1_000_000, by_rows=True)
    assert stats2["files_after"] == 1  # now they merge into one
    assert _content(spark, table) == before


def test_crash_before_commit_rolls_back(spark, tmp_path, monkeypatch):
    """A crash BEFORE the manifest rename leaves the committed table
    untouched; recover discards the stage."""
    import llm_scraper_spark.sinks.compaction as comp

    table = _fragmented_table(spark, str(tmp_path / "t"), n_waves=3)
    before = _content(spark, table)

    real_replace = os.replace

    def boom(src, dst):
        if dst.endswith(MANIFEST):
            raise RuntimeError("crash at commit")
        return real_replace(src, dst)

    monkeypatch.setattr(comp.os, "replace", boom)
    with pytest.raises(RuntimeError):
        compact_files(spark, table, capacity=1 << 40)
    monkeypatch.setattr(comp.os, "replace", real_replace)

    assert os.path.isdir(os.path.join(table, STAGE))
    assert recover_compaction(table) == "rollback"
    assert _content(spark, table) == before
    assert len(data_files(table)) == 9  # original fragmentation intact
    # and a fresh attempt completes
    compact_files(spark, table, capacity=1 << 40)
    assert _content(spark, table) == before
    assert len(data_files(table)) == 1


def test_crash_after_commit_rolls_forward(spark, tmp_path, monkeypatch):
    """A crash AFTER the manifest rename (mid-GC) rolls forward on
    recover: the new layout wins, content identical, no duplicates."""
    import llm_scraper_spark.sinks.compaction as comp

    table = _fragmented_table(spark, str(tmp_path / "t"), n_waves=3)
    before = _content(spark, table)

    def boom(_dir):
        raise RuntimeError("crash after commit")

    monkeypatch.setattr(comp, "_finish", boom)
    with pytest.raises(RuntimeError):
        compact_files(spark, table, capacity=1 << 40)
    monkeypatch.undo()

    mpath = os.path.join(table, MANIFEST)
    assert os.path.exists(mpath)
    with open(mpath) as f:
        manifest = json.load(f)
    assert manifest["new"] and manifest["old"]

    assert recover_compaction(table) == "forward"
    assert not os.path.exists(mpath)
    assert _content(spark, table) == before
    assert len(data_files(table)) == 1
    # finish is idempotent: a second recover is a no-op
    assert recover_compaction(table) == "clean"


def test_recompaction_never_clobbers_retained_files(spark, tmp_path):
    """ADVICE r4 (high): a rewritten group's output name must never
    collide with a RETAINED file from a prior pass. Reproduces the
    reported scenario — 11 prior compact outputs (80 rows each) + 5 new
    wave files (40 rows each), capacity=100 by_rows — where lexicographic
    path sort (g10 < g2) shifts group ids and pack groups span ~2x
    capacity, so an un-epoched dst name equals a retained bystander and
    os.replace silently drops its rows. Epoch naming makes every dst
    fresh; total rows must survive arbitrary re-compaction passes."""
    table = str(tmp_path / "t")
    # 11 single-file outputs named like a prior pass's legacy outputs
    os.makedirs(table)
    for g in range(11):
        df = spark.range(g * 80, (g + 1) * 80).selectExpr(
            "id AS doc_id", "0 AS wave", "md5(id::string) AS payload")
        tmp = f"{table}/_stage_g{g}"
        df.coalesce(1).write.parquet(tmp)
        part = [n for n in os.listdir(tmp) if n.endswith(".parquet")]
        os.replace(os.path.join(tmp, part[0]),
                   os.path.join(table, f"part-compact-g{g}.parquet"))
        import shutil
        shutil.rmtree(tmp)
    # 5 fresh wave files, 40 rows each
    for w in range(5):
        spark.range(880 + w * 40, 880 + (w + 1) * 40).selectExpr(
            "id AS doc_id", "1 AS wave", "md5(id::string) AS payload"
        ).coalesce(1).write.parquet(f"{table}/wave={w}")
    before = _content(spark, table)
    assert len(before) == 11 * 80 + 5 * 40  # 1080
    stats = compact_files(spark, table, capacity=100, by_rows=True)
    assert _content(spark, table) == before, "re-compaction lost rows"
    assert stats["retained"] + stats["rewritten"] == stats["groups"]
    # epochs advance: a further pass also preserves everything
    compact_files(spark, table, capacity=500, by_rows=True)
    assert _content(spark, table) == before
    compact_files(spark, table, capacity=1 << 40)
    assert _content(spark, table) == before
    assert len(data_files(table)) == 1


def test_zero_row_part_file_compacts_away(spark, tmp_path):
    """A zero-row part (an empty wave's commit) gets weight 0 in the
    row-count plan, joins a group, and is GC'd with it."""
    table = str(tmp_path / "t")
    spark.range(0, 50).selectExpr(
        "id AS doc_id", "0 AS wave", "md5(id::string) AS payload"
    ).coalesce(1).write.parquet(f"{table}/wave=0")
    spark.range(0, 0).selectExpr(
        "id AS doc_id", "0 AS wave", "md5(id::string) AS payload"
    ).coalesce(1).write.parquet(f"{table}/wave=1")
    before = _content(spark, table)
    stats = compact_files(spark, table, capacity=1_000_000, by_rows=True)
    assert stats["files_after"] == 1
    assert _content(spark, table) == before
