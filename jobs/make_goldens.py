"""Generate the committed golden parquet files under goldens/.

These are the independent reference points the driver's DuckDB oracles
read (via read_parquet) to content-verify queries whose semantics are not
expressible in SQL alone (VERDICT #1/#5):

- ``spans_sf{X}.parquet``     — the exploded interleaved spans of
  build_documents_interleaved at that scale factor. Validity chain: the
  chunker producing these is equality-tested against the actual reference
  ``chunking.py`` module (tests/test_chunker.py) and the interleave policy
  against the simulator (tests/test_crawl.py); the driver oracle then
  recomputes per-doc digests from THIS file while the live query computes
  them from the live chunker — any chunker/interleave drift mismatches.
- ``ann_candidates_sf{X}.parquet`` — the multi-probe LSH candidate set for
  query vec_id=0 (planes=6, seed=42, probe_hamming=1). The oracle computes
  exact cosine top-k over this set in SQL; live ann_topk must agree.
- ``knn_buckets_sf{X}.parquet`` — the (vec_id, bucket) hyperplane-LSH
  assignment (planes=6, seed=42) q_knn_join buckets by. The bucket id is a
  numpy-seeded projection (no SQL twin); the oracle takes THIS table as
  given and independently recomputes the whole downstream join — bucket
  equi-join, exact cosine, per-row top-k — in DuckDB. Validity chain:
  sign-of-projection correctness is tested against direct numpy in
  tests/test_vectors.py, and tests/test_goldens.py pins the live
  assignment to this file.
- ``minhash_pairs_sf{X}.parquet`` — q_minhash_neardup's candidate pairs on
  the production xxhash64 family (bands=4, rows=8). xxhash64 has no DuckDB
  twin; validity chain: the md5-family twin of the SAME pipeline is fully
  recomputed by the driver's minhash_neardup_md5 oracle, and
  tests/test_goldens.py pins the live xxhash64 output to this file so any
  drift in shingling/banding/bucketing/estimation is caught.
- ``crawl_schedule_log.parquet`` — the single-node oracle simulator's
  (wave, seq, url) fetch schedule for the fixed synthetic crawl that
  q_crawl_schedule_log runs distributed (CRAWL_* params below). Pure
  Python (crawl/simulator.py) — no Spark involved in the golden.

Deterministic by construction (md5/uuid5/seeded planes); regenerate with
``python jobs/make_goldens.py`` — a regeneration on unchanged code must be
byte-stable, and tests/test_goldens.py asserts the live pipelines still
match the committed files.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
GOLDENS = os.path.join(REPO, "goldens")

SPAN_SFS = ("0.001", "0.01")
ANN_PLANES = 6
ANN_SEED = 42
ANN_PROBE_HAMMING = 1

CRAWL_N_SEEDS = 60
CRAWL_N_HOSTS = 12
CRAWL_FANOUT = 3
CRAWL_BUDGET = 3
CRAWL_WAVES = 3


def make_spans(spark, sf: str) -> None:
    from pyspark.sql import functions as F

    from llm_scraper_spark.sources.synthetic import build_documents_interleaved

    docs = build_documents_interleaved(spark, f"/root/testdata/sf{sf}")
    expl = docs.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "sp")
    ).select(
        "doc_id", "span_idx",
        F.col("sp.kind").alias("kind"), F.col("sp.text").alias("text"),
        F.col("sp.media_ref").alias("media_ref"), F.col("sp.offset").alias("offset"),
    )
    pdf = expl.toPandas().sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
    assert (pdf["span_idx"] == pdf["offset"]).all()
    path = os.path.join(GOLDENS, f"spans_sf{sf}.parquet")
    pdf.to_parquet(path, index=False)
    print(f"wrote {path}: {len(pdf)} spans, {pdf['doc_id'].nunique()} docs")


def make_ann_candidates(spark, sf: str) -> None:
    from pyspark.sql import functions as F

    from llm_scraper_spark.operators.similarity import ann_candidates

    emb = spark.read.parquet(f"/root/testdata/sf{sf}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    cand = ann_candidates(
        emb.filter(F.col("vec_id") != 0), list(qv),
        planes=ANN_PLANES, seed=ANN_SEED, probe_hamming=ANN_PROBE_HAMMING,
    )
    pdf = cand.select("vec_id").toPandas().sort_values("vec_id").reset_index(drop=True)
    path = os.path.join(GOLDENS, f"ann_candidates_sf{sf}.parquet")
    pdf.to_parquet(path, index=False)
    print(f"wrote {path}: {len(pdf)} candidates")


def make_knn_buckets(spark, sf: str) -> None:
    from llm_scraper_spark.operators.similarity import hyperplane_bucket

    emb = spark.read.parquet(f"/root/testdata/sf{sf}/embeddings.parquet")
    b = hyperplane_bucket(emb, "embedding", planes=ANN_PLANES, seed=ANN_SEED,
                          dim=64).select("vec_id", "bucket")
    pdf = b.toPandas().sort_values("vec_id").reset_index(drop=True)
    path = os.path.join(GOLDENS, f"knn_buckets_sf{sf}.parquet")
    pdf.to_parquet(path, index=False)
    print(f"wrote {path}: {len(pdf)} bucket assignments, "
          f"{pdf['bucket'].nunique()} buckets")


def make_minhash_pairs(spark, sf: str) -> None:
    from pyspark.sql import functions as F

    from llm_scraper_spark.operators.dedup import minhash_candidates

    docs = spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet").select(
        "doc_id", "text")
    pairs = minhash_candidates(docs, bands=4, rows=8, hash_family="xxhash64").select(
        "id_a", "id_b",
        (F.col("est_jaccard") * 32).cast("int").alias("n_match"),
        "est_jaccard",
    )
    pdf = pairs.toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    path = os.path.join(GOLDENS, f"minhash_pairs_sf{sf}.parquet")
    pdf.to_parquet(path, index=False)
    print(f"wrote {path}: {len(pdf)} candidate pairs")


def make_crawl_log(spark) -> None:
    from llm_scraper_spark.crawl.simulator import simulate_crawl
    from llm_scraper_spark.sources.synthetic import synth_page, synth_seeds

    seeds = synth_seeds(spark, CRAWL_N_SEEDS, n_hosts=CRAWL_N_HOSTS)
    urls = [r["url"] for r in seeds.orderBy("seq").collect()]
    sim = simulate_crawl(
        urls, CRAWL_WAVES, budget=CRAWL_BUDGET,
        fetch_fn=lambda u: synth_page(u, n_hosts=CRAWL_N_HOSTS, fanout=CRAWL_FANOUT),
    )
    pdf = pd.DataFrame(sim["schedule_log"], columns=["wave", "seq", "url"])
    pdf["wave"] = pdf["wave"].astype("int32")
    pdf["seq"] = pdf["seq"].astype("int64")
    path = os.path.join(GOLDENS, "crawl_schedule_log.parquet")
    pdf.to_parquet(path, index=False)
    print(f"wrote {path}: {len(pdf)} scheduled fetches over {CRAWL_WAVES} waves")


def make_fixture_goldens() -> None:
    """Pin the extraction pipeline's current output on the reference's 7
    real fixture pages (VERDICT #7): the reference itself cannot run
    in-sandbox (bs4/lxml absent), so byte-fidelity vs upstream is
    unprovable — but pinning makes any DRIFT in our own pipeline
    detectable (tests/test_fixtures_real.py::test_fixture_extraction_pinned).
    Pure Python, no Spark."""
    import glob
    import hashlib
    import json

    from llm_scraper_spark.operators.extraction.pipeline import (
        config_for_domain, extract_article, load_parser_configs)

    configs = load_parser_configs("/root/reference/src/llm_scraper/parsers/configs")
    out = {}
    for path in sorted(glob.glob("/root/reference/fixtures/**/*.json", recursive=True)):
        try:
            with open(path) as f:
                obj = json.load(f)
        except Exception:
            continue
        if not (isinstance(obj, dict) and {"url", "domain", "raw_html"} <= set(obj)):
            continue
        cfg = config_for_domain(configs, obj["domain"])
        rec = extract_article(obj["raw_html"], obj["url"], cfg)
        out[obj["url"]] = {
            "domain": obj["domain"],
            "status": rec["status"],
            "title": rec.get("title"),
            "published_at": rec.get("published_at"),
            "authors": rec.get("authors"),
            "tags": rec.get("tags"),
            "topics": rec.get("topics"),
            "language": rec.get("language"),
            "content_len": len(rec.get("content") or ""),
            "content_md5": hashlib.md5(
                (rec.get("content") or "").encode("utf-8")).hexdigest(),
            "meta_nest": rec.get("meta_nest"),
        }
    path = os.path.join(GOLDENS, "fixture_extraction.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True, ensure_ascii=False)
    print(f"wrote {path}: {len(out)} fixtures pinned")


def make_crawl_doc_spans(spark) -> None:
    """Flattened spans of the documents the SIMULATOR's crawl emits at
    the golden config — the independently-derived corpus the
    q_crawl_media_align oracle (VERDICT r4 #8) replays over. Pure
    single-node Python: simulator fetch loop + the chunker's pure
    functions; the distributed crawl must land on the same spans."""
    from llm_scraper_spark.crawl.simulator import simulate_crawl
    from llm_scraper_spark.operators.chunker import (
        chunk_by_token_estimate, doc_id_for_url, interleave_spans)
    from llm_scraper_spark.sources.synthetic import synth_page, synth_seeds

    seeds = synth_seeds(spark, CRAWL_N_SEEDS, n_hosts=CRAWL_N_HOSTS)
    urls = [r["url"] for r in seeds.orderBy("seq").collect()]
    sim = simulate_crawl(
        urls, CRAWL_WAVES, budget=CRAWL_BUDGET,
        fetch_fn=lambda u: synth_page(u, n_hosts=CRAWL_N_HOSTS,
                                      fanout=CRAWL_FANOUT),
    )
    rows = []
    for canon, content, media in sim["documents"]:
        did = doc_id_for_url(canon)
        for i, s in enumerate(interleave_spans(
                chunk_by_token_estimate(content), media)):
            rows.append((did, i, s["kind"], s["media_ref"]))
    pdf = pd.DataFrame(rows,
                       columns=["doc_id", "span_idx", "kind", "media_ref"])
    pdf["span_idx"] = pdf["span_idx"].astype("int32")
    path = os.path.join(GOLDENS, "crawl_doc_spans.parquet")
    pdf.to_parquet(path, index=False)
    print(f"wrote {path}: {len(pdf)} spans over "
          f"{pdf['doc_id'].nunique()} crawled documents")


def main() -> None:
    from llm_scraper_spark.session import get_spark

    os.makedirs(GOLDENS, exist_ok=True)
    make_fixture_goldens()
    spark = get_spark(app_name="make_goldens", master="local[8]")
    for sf in SPAN_SFS:
        make_spans(spark, sf)
        make_ann_candidates(spark, sf)
        make_knn_buckets(spark, sf)
        make_minhash_pairs(spark, sf)
    make_crawl_log(spark)
    make_crawl_doc_spans(spark)
    spark.stop()


if __name__ == "__main__":
    main()
