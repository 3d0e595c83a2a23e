"""Vector sink semantics — Spark twin of the reference tests/test_vectors.py
(upsert/search flow assertions, there against mocked OpenAI/AstraDB;
here against the engine's DataFrame re-expression)."""

from pyspark.sql import functions as F

from llm_scraper_spark.operators.vectors import (
    EMBED_DIM, embed_chunks, upsert)


def test_upsert_replaces_matched_ids(spark):
    """insert_many-by-_id: incoming row wins for every matched id, existing
    rows pass through (astradb.py:100-116)."""
    existing = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "vec_id long, text string, v int")
    incoming = spark.createDataFrame(
        [(2, "B", 2), (4, "D", 2)], "vec_id long, text string, v int")
    out = {r["vec_id"]: (r["text"], r["v"])
           for r in upsert(existing, incoming).collect()}
    assert out == {1: ("a", 1), 2: ("B", 2), 3: ("c", 1), 4: ("D", 2)}


def test_upsert_broadcasts_small_batch(spark):
    existing = spark.range(1000).select(
        F.col("id").alias("vec_id"), F.lit("x").alias("text"))
    incoming = spark.range(20).select(
        F.col("id").alias("vec_id"), F.lit("y").alias("text"))
    plan = upsert(existing, incoming)._jdf.queryExecution(
        ).executedPlan().toString()
    assert "Broadcast" in plan


def test_embed_chunks_shape_and_determinism(spark):
    chunks = spark.createDataFrame(
        [("c1", "hello world"), ("c2", "other text"), ("c3", "hello world")],
        "chunk_id string, text string")
    rows = {r["chunk_id"]: r["embedding"]
            for r in embed_chunks(chunks).collect()}
    assert all(len(v) == EMBED_DIM for v in rows.values())
    # unit-normalized
    assert abs(sum(x * x for x in rows["c1"]) - 1.0) < 1e-5
    # deterministic: same text -> same vector (uuid-style stability the
    # reference relies on for chunk ids, worker.py:404)
    assert rows["c1"] == rows["c3"]
    assert rows["c1"] != rows["c2"]
