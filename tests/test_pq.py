"""Product-quantization ANN (operators/pq.py): cross-engine exactness of
the learned-codebook chain, partitioning-invariance of the integer
k-means fit, and the no-Python plan shape.

Reference anchor: the reference's exact cosine top-k
(/root/reference/src/llm_scraper/vectors/engine.py:80-91) is what PQ/ADC
approximates; exactness here is vs the DuckDB replay of the SAME
fit+encode+ADC arithmetic, not vs exact cosine (recall vs brute force is
the IVF/LSH suite's job — PQ's value is the m-bytes-per-vector layout).
"""

import math

import duckdb
import pytest

from llm_scraper_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    pq_fit,
    pq_oracle_sql,
)

DIM = 64
QVEC = [math.sin(i * 0.7) * 0.3 for i in range(DIM)]


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/embeddings.parquet")


def test_pq_cross_engine_exact(emb, sf_small):
    cb = pq_fit(emb, m=8, k=8, iters=2, fit_rows=256, dim=DIM)
    codes = pq_encode(emb, cb, m=8, dim=DIM)
    top = pq_adc_topk(codes, cb, QVEC, k_top=10, m=8, dim=DIM)
    got = [(r["id"], r["adc_dist"]) for r in top.collect()]

    sql = pq_oracle_sql(
        f"SELECT * FROM read_parquet('{sf_small}/embeddings.parquet')",
        QVEC, m=8, k=8, iters=2, k_top=10, fit_rows=256, dim=DIM)
    want = duckdb.connect().execute(sql).fetchall()
    assert got == want


def test_pq_fit_partitioning_invariant(emb):
    """Integer sums are order-independent: the fit must be bit-identical
    no matter how the corpus is partitioned."""
    def fit_rows(df):
        cb = pq_fit(df, m=4, k=4, iters=1, fit_rows=128, dim=DIM)
        return sorted(
            (r["sub_id"], r["code"], tuple(r["centroid"]))
            for r in cb.collect())

    assert fit_rows(emb.repartition(1)) == fit_rows(emb.repartition(13))


def test_pq_encode_is_m_rows_per_vector(emb):
    cb = pq_fit(emb, m=8, k=8, iters=1, fit_rows=128, dim=DIM)
    codes = pq_encode(emb.limit(50), cb, m=8, dim=DIM)
    per_id = codes.groupBy("id").count().collect()
    assert len(per_id) == 50 and all(r["count"] == 8 for r in per_id)
    rng = codes.selectExpr("min(code) AS lo", "max(code) AS hi").first()
    assert 0 <= rng["lo"] and rng["hi"] <= 7


def test_pq_plan_no_python_no_cartesian(emb):
    cb = pq_fit(emb, m=8, k=8, iters=1, fit_rows=128, dim=DIM)
    codes = pq_encode(emb, cb, m=8, dim=DIM)
    top = pq_adc_topk(codes, cb, QVEC, k_top=5, m=8, dim=DIM)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
