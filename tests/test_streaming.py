"""Structured Streaming smoke tests (memory sink + processAllAvailable)."""

import shutil

from pyspark.sql import functions as F

from llm_scraper_spark.streaming.ingest import (
    stream_chunk_documents,
    stream_discovery_counts,
    stream_frontier_append,
)


def _as_dir(spark, src, dst):
    # readStream needs a directory source; testdata tables are single files
    spark.read.parquet(src).write.mode("overwrite").parquet(dst)
    return dst


def test_stream_chunk_documents(spark, sf_small, tmp_path):
    d = _as_dir(spark, f"{sf_small}/documents.parquet", str(tmp_path / "docs_in"))
    out = stream_chunk_documents(spark, d)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("docs_stream")
         .option("checkpointLocation", str(tmp_path / "cp1")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("select * from docs_stream")
    assert got.count() == 500
    row = got.filter(F.size("spans") > 0).first()
    assert row is not None and row["spans"][0]["kind"] in ("text", "media")


def test_stream_discovery_counts(spark, sf_small, tmp_path):
    d = _as_dir(spark, f"{sf_small}/events.parquet", str(tmp_path / "ev_in"))
    agg = stream_discovery_counts(spark, d)
    q = (agg.writeStream.outputMode("append").format("memory")
         .queryName("ev_stream")
         .option("checkpointLocation", str(tmp_path / "cp2")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("select * from ev_stream")
    # watermark append-mode emits all-but-last windows once input is drained
    assert got.count() > 0
    assert got.agg(F.sum("n")).first()[0] > 0


def test_stream_frontier_append_dedups_across_batches(spark, tmp_path):
    in_dir = tmp_path / "in"
    state = tmp_path / "state"
    df1 = spark.createDataFrame(
        [("https://h.com/a", 0), ("https://h.com/b", 1)], "url string, seq long")
    # write part files directly into the source dir (file stream sources do
    # not recurse into nested output dirs)
    df1.coalesce(1).write.mode("append").parquet(str(in_dir))
    writer = stream_frontier_append(spark, str(in_dir), str(state))
    q = writer.option("checkpointLocation", str(tmp_path / "cp3")).start()
    try:
        q.processAllAvailable()
        # second batch re-discovers /a plus one new URL
        df2 = spark.createDataFrame(
            [("https://h.com/a", 2), ("https://h.com/c", 3)], "url string, seq long")
        df2.coalesce(1).write.mode("append").parquet(str(in_dir))
        q.processAllAvailable()
    finally:
        q.stop()
    seen = spark.read.option("basePath", str(state / "seen_delta")).parquet(
        str(state / "seen_delta"))
    urls = sorted(r["canonical_url"] for r in seen.collect())
    assert urls == ["https://h.com/a", "https://h.com/b", "https://h.com/c"]


def test_stream_host_budget_carries_state_across_batches(spark, tmp_path):
    from llm_scraper_spark.streaming.ingest import stream_host_budget

    in_dir = tmp_path / "budget_in"
    in_dir.mkdir()
    out = stream_host_budget(spark, str(in_dir), budget=3)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("budget_stream")
         .option("checkpointLocation", str(tmp_path / "cp_budget")).start())
    try:
        # batch 1: h1 x2, h2 x1 -> all admitted (under budget)
        spark.createDataFrame(
            [("https://h1/a", "h1", 0), ("https://h1/b", "h1", 1),
             ("https://h2/a", "h2", 2)],
            "url string, host string, seq long",
        ).coalesce(1).write.mode("append").parquet(str(in_dir))
        q.processAllAvailable()
        # batch 2: h1 x3 more -> only ONE admitted (state: 2 used of 3);
        # a per-batch/windowed cap would wrongly admit all three
        spark.createDataFrame(
            [("https://h1/c", "h1", 3), ("https://h1/d", "h1", 4),
             ("https://h1/e", "h1", 5)],
            "url string, host string, seq long",
        ).coalesce(1).write.mode("append").parquet(str(in_dir))
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("select * from budget_stream").collect()
    by_host = {}
    for r in got:
        by_host.setdefault(r["host"], []).append(r["seq"])
    assert sorted(by_host["h1"]) == [0, 1, 3]  # budget 3, seq order, cross-batch
    assert sorted(by_host["h2"]) == [2]


def test_stream_url_dedup_drops_rearrivals_across_batches(spark, tmp_path):
    from llm_scraper_spark.streaming.ingest import stream_url_dedup

    in_dir = str(tmp_path / "in")
    (tmp_path / "in").mkdir()
    out = stream_url_dedup(spark, in_dir)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("t_url_dedup")
         .option("checkpointLocation", str(tmp_path / "cp")).start())
    try:
        base = 1_700_000_000
        b1 = [(base + 1, "http://a/1"), (base + 2, "http://a/2"),
              (base + 1, "http://a/1")]              # in-batch dup
        b2 = [(base + 1, "http://a/1"),              # cross-batch dup
              (base + 3, "http://a/3")]
        for rows in (b1, b2):
            df = spark.createDataFrame(rows, "sec long, url string").select(
                F.timestamp_seconds("sec").alias("ts"), "url")
            df.coalesce(1).write.mode("append").parquet(in_dir)
            q.processAllAvailable()
        got = sorted(r.url for r in spark.table("t_url_dedup").collect())
        assert got == ["http://a/1", "http://a/2", "http://a/3"]
    finally:
        q.stop()
