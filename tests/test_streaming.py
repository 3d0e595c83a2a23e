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


def test_stream_crawl_matches_batch_wave_replay(spark, tmp_path):
    """VERDICT r3 #7: the composed continuous crawl (canonicalize ->
    in-batch dedup -> cross-batch seen anti-join -> per-host politeness
    -> idempotent delta commit) must produce EXACTLY the schedule a
    batch wave-loop replay produces on the same input, batch for batch
    over 4 micro-batches. The oracle is an independent single-node
    Python replay (dict/set/sort — no Spark operators), sharing only
    the pure canonicalize_url function the crawl simulator already
    shares."""
    from llm_scraper_spark.functions.urls import canonicalize_url
    from llm_scraper_spark.streaming.ingest import stream_crawl

    in_dir, state = tmp_path / "in", tmp_path / "state"
    budget = 2
    batches = [
        # batch 0: h1 over budget (3 urls), one in-batch canonical dup
        [("https://h1.com/a", 0), ("https://h1.com/b", 1),
         ("https://h1.com/c", 2), ("HTTPS://h1.com/a#frag", 3),
         ("https://h2.com/x", 4)],
        # batch 1: re-arrivals of already-scheduled urls + new ones
        [("https://h1.com/a", 5), ("https://h1.com/d", 6),
         ("https://h2.com/y", 7), ("https://h2.com/x", 8)],
        # batch 2: the over-budget leftover redelivered (schedulable now)
        [("https://h1.com/c", 9), ("h2.com/z", 10)],
        # batch 3: everything a duplicate -> empty schedule
        [("https://h1.com/c", 11), ("https://h2.com/z", 12)],
    ]

    def replay():
        seen, out = set(), []
        for k, rows in enumerate(batches):
            best = {}
            for url, seq in rows:
                c, host = canonicalize_url(url)
                if c not in best or seq < best[c][1]:
                    best[c] = (url, seq, host)
            per_host = {}
            for c, (url, seq, host) in sorted(
                    best.items(), key=lambda kv: kv[1][1]):
                if c in seen:
                    continue
                per_host.setdefault(host, []).append((url, seq, c))
            for host, items in per_host.items():
                for rank, (url, seq, c) in enumerate(items[:budget], 1):
                    out.append((k, host, url, seq, rank))
                    seen.add(c)
        return sorted(out)

    def write_batch(rows):
        spark.createDataFrame(rows, "url string, seq long").coalesce(
            1).write.mode("append").parquet(str(in_dir))

    write_batch(batches[0])
    q = (stream_crawl(spark, str(in_dir), str(state), default_budget=budget)
         .option("checkpointLocation", str(tmp_path / "cp_crawl")).start())
    try:
        q.processAllAvailable()
        for rows in batches[1:]:
            write_batch(rows)
            q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.option(
        "basePath", str(state / "schedule_log")).parquet(
        str(state / "schedule_log"))
    got_rows = sorted(
        (int(r["batch"]), r["host"], r["url"], int(r["seq"]),
         int(r["sched_rank"]))
        for r in got.collect())
    assert got_rows == replay()
    # cumulative host_used equals the schedule's per-host totals
    used = spark.read.option("basePath", str(state / "host_used")).parquet(
        str(state / "host_used"))
    tot = {r["host"]: r["n"] for r in used.groupBy("host").agg(
        F.sum("n_fetched").alias("n")).collect()}
    from collections import Counter
    want = Counter(h for _, h, _, _, _ in replay())
    assert tot == dict(want)


def test_stream_crawl_redelivery_idempotent(spark, tmp_path):
    """Structured Streaming redelivers a micro-batch after a sink
    failure; the crawl step must be idempotent under that replay. The
    trap: batch K's own seen delta already exists on redelivery, and an
    unfiltered seen read would anti-join the batch against ITSELF —
    schedule empty, delta overwritten empty, rows silently lost. The
    processor reads strictly-earlier deltas only; pinned by processing
    the same batch id twice and requiring byte-identical results."""
    from llm_scraper_spark.streaming.ingest import crawl_batch_processor

    state = str(tmp_path / "state")
    proc = crawl_batch_processor(spark, state, default_budget=2)
    b0 = spark.createDataFrame(
        [("https://h1.com/a", 0), ("https://h1.com/b", 1),
         ("https://h2.com/x", 2)], "url string, seq long")
    b1 = spark.createDataFrame(
        [("https://h1.com/a", 3), ("https://h1.com/c", 4)],
        "url string, seq long")

    def snapshot():
        got = spark.read.option(
            "basePath", f"{state}/schedule_log").parquet(
            f"{state}/schedule_log")
        return sorted((int(r["batch"]), r["url"], int(r["seq"]),
                       int(r["sched_rank"])) for r in got.collect())

    proc(b0, 0)
    proc(b1, 1)
    want = snapshot()
    assert [u for b, u, _, _ in want if b == 1] == ["https://h1.com/c"]
    # redeliver BOTH batches (sink-failure replay): results identical
    proc(b1, 1)
    assert snapshot() == want
    proc(b0, 0)
    assert snapshot() == want
