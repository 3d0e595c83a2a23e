"""Hashed n-gram language-model scoring and importance resampling.

Two standard corpus-curation primitives the reference has no analogue for
(it scrapes; it does not curate), both built so the MODEL is a bounded
table and the scorer is a broadcast join:

- ``lm_score`` — a CCNet-style quality signal (Wenzek et al. 2020 use a
  KenLM 5-gram; the in-engine stand-in is an add-one-smoothed bigram LM
  over HASHED n-gram buckets, the trick DSIR formalizes): train bucket
  counts over the corpus itself (or any reference corpus), then score
  every document's per-token log-probability. Hashing n-grams into 2^B
  buckets bounds the model at 2^B rows REGARDLESS of corpus size — that is
  what makes the scorer a broadcast join at 100 TB, where a raw bigram
  table would itself be TB-scale.
- ``dsir_weights`` / ``dsir_resample`` — Data Selection with Importance
  Resampling (Xie et al., NeurIPS 2023): hashed-unigram importance
  weights log(p_target / q_raw) per bucket, summed per document, then
  Gumbel-top-k resampling. The Gumbel noise is derived from a 60-bit md5
  content hash (same construction as sampling.hash_uniform), so the
  resample is a pure function of (doc key, seed) — reproducible on any
  cluster layout and replayable by the DuckDB oracle.

Determinism discipline (what lets the driver hash-compare values): every
count is exact integer; every probability ratio is ONE IEEE division of
exact-in-double integers; every transcendental (ln, the Gumbel double-ln)
is immediately quantized by floor(SCALE * x) with SCALE=1e4 — a 1-2 ulp
libm difference (~1e-12 relative) moves a floor only if the true value
sits within ~1e-12 of a step boundary, the same argument as
sampling.temperature_mixture_rates' fixed-point pow.

Scale shape: tokenize/hash/bucket are codegen'd projections; training is
one map-side-combined aggregate of slim (bucket) rows; scoring joins a
<= 2^B-row model table — broadcast, no corpus shuffle beyond the
training aggregate; the per-doc sum is a single groupBy(doc) combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .dedup import tokens_expr
from .sketches import _hash60

SCALE = 10_000


def _bucket(col, buckets_pow: int, hash_family: str = "md5"):
    return F.pmod(_hash60(col, hash_family), F.lit(1 << buckets_pow))


def _bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, pos, w0, w1) adjacent-token pairs via posexplode + one lead —
    the same HOF-free plan shape as dedup.shingles_exploded; the window
    is per-document, never corpus-wide."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens_expr(text_col)).alias("pos", "w0"),
    )
    win = W.partitionBy("id").orderBy("pos")
    return (toks.withColumn("w1", F.lead("w0").over(win))
            .filter(F.col("w1").isNotNull()))


def lm_train(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             buckets_pow: int = 16,
             hash_family: str = "md5") -> tuple[DataFrame, DataFrame]:
    """Bucket-count tables (c2: bigram, c1: context) from the corpus.
    Both are <= 2^buckets_pow rows — broadcastable model state."""
    bi = _bigrams(df, text_col, id_col)
    c2 = (bi.groupBy(_bucket(F.concat_ws(" ", "w0", "w1"), buckets_pow,
                             hash_family).alias("b2"))
          .agg(F.count(F.lit(1)).alias("c2")))
    c1 = (bi.groupBy(_bucket(F.col("w0"), buckets_pow,
                             hash_family).alias("b1"))
          .agg(F.count(F.lit(1)).alias("c1")))
    return c2, c1


def lm_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             buckets_pow: int = 16, hash_family: str = "md5",
             model: tuple[DataFrame, DataFrame] | None = None) -> DataFrame:
    """Per-document add-one-smoothed bigram log-probability:

        ll = sum over bigrams of ln((c2[b]+1) / (c1[ctx]+2^B))

    quantized per-term to floor(SCALE * ln(...)) and summed as BIGINT
    (``ll_fp``); ``avg_logprob`` = ll_fp / (SCALE * n_bigrams) is the
    comparable quality signal (higher = more in-distribution). Docs with
    no bigram score NULL avg and 0 terms.

    The model defaults to the scored corpus itself (self-perplexity, the
    CCNet setup where the reference corpus is the quality tier)."""
    c2_df, c1_df = model if model is not None else lm_train(
        df, text_col, id_col, buckets_pow, hash_family)
    vocab = 1 << buckets_pow
    bi = _bigrams(df, text_col, id_col)
    scored = (
        bi.withColumn("b2", _bucket(F.concat_ws(" ", "w0", "w1"),
                                    buckets_pow, hash_family))
        .withColumn("b1", _bucket(F.col("w0"), buckets_pow, hash_family))
        .join(F.broadcast(c2_df), "b2", "left")
        .join(F.broadcast(c1_df), "b1", "left")
        .select(
            "id",
            F.floor(
                F.lit(SCALE)
                * F.log(
                    (F.coalesce("c2", F.lit(0)) + F.lit(1)).cast("double")
                    / (F.coalesce("c1", F.lit(0)) + F.lit(vocab))
                    .cast("double")
                )
            ).cast("long").alias("ll_term"),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.sum("ll_term").alias("ll_fp"),
        F.count(F.lit(1)).alias("n_bigrams"),
    )
    ids = df.select(F.col(id_col).alias("id"))
    return ids.join(per_doc, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("ll_fp", F.lit(0)).alias("ll_fp"),
        F.round(
            F.col("ll_fp").cast("double")
            / (F.lit(float(SCALE)) * F.col("n_bigrams")), 6
        ).alias("avg_logprob"),
    )


# ---------------------------------------------------------------------------
# DSIR importance resampling
# ---------------------------------------------------------------------------

def dsir_weights(raw: DataFrame, target: DataFrame, text_col: str = "text",
                 buckets_pow: int = 14,
                 hash_family: str = "md5") -> DataFrame:
    """Per-bucket importance weight, add-one smoothed:

        w_b = floor(SCALE * ln( ((p_b+1) * (q_tot+2^B))
                              / ((q_b+1) * (p_tot+2^B)) ))

    p = hashed-unigram counts over the TARGET corpus (what we want more
    of), q = over the RAW corpus. The two cross-products are exact BIGINTs
    (both < 2^53 at any plausible bucket/corpus ratio), so the ln argument
    is one correctly-rounded division — engine-portable. Result is
    <= 2^buckets_pow rows: broadcast model state."""
    vocab = 1 << buckets_pow

    def counts(df: DataFrame, name: str) -> DataFrame:
        toks = df.select(F.explode(tokens_expr(text_col)).alias("w"))
        return (toks.groupBy(_bucket(F.col("w"), buckets_pow, hash_family)
                             .alias("bucket"))
                .agg(F.count(F.lit(1)).alias(name)))

    p = counts(target, "p_cnt")
    q = counts(raw, "q_cnt")
    p_tot = p.agg(F.sum("p_cnt").alias("_pt"))
    q_tot = q.agg(F.sum("q_cnt").alias("_qt"))
    joined = (
        q.join(p, "bucket", "full")
        .crossJoin(F.broadcast(p_tot)).crossJoin(F.broadcast(q_tot))
        .select(
            "bucket",
            F.coalesce("p_cnt", F.lit(0)).alias("p_cnt"),
            F.coalesce("q_cnt", F.lit(0)).alias("q_cnt"),
            F.col("_pt"), F.col("_qt"),
        )
    )
    num = ((F.col("p_cnt") + 1) * (F.col("_qt") + F.lit(vocab))).cast("double")
    den = ((F.col("q_cnt") + 1) * (F.col("_pt") + F.lit(vocab))).cast("double")
    return joined.select(
        "bucket", "p_cnt", "q_cnt",
        F.floor(F.lit(SCALE) * F.log(num / den)).cast("long").alias("w_fp"),
    )


def dsir_scores(df: DataFrame, weights: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", buckets_pow: int = 14,
                hash_family: str = "md5") -> DataFrame:
    """Per-document importance score: sum of bucket weights over the doc's
    tokens (BIGINT), normalized per token for comparability. Broadcast
    model join; one per-doc combine."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_expr(text_col)).alias("_w"),
    ).select("id", _bucket(F.col("_w"), buckets_pow, hash_family)
             .alias("bucket"))
    per_doc = (
        toks.join(F.broadcast(weights.select("bucket", "w_fp")), "bucket",
                  "left")
        .groupBy("id")
        .agg(F.sum(F.coalesce("w_fp", F.lit(0))).alias("score_fp"),
             F.count(F.lit(1)).alias("n_tokens"))
    )
    return per_doc.select(
        F.col("id").alias(id_col), "n_tokens", "score_fp",
        F.round(F.col("score_fp").cast("double")
                / (F.lit(float(SCALE)) * F.col("n_tokens")), 6)
        .alias("avg_log_ratio"),
    )


def gumbel_key_fp(score_fp, n_tokens, key_col, seed: str = "dsir",
                  temperature: float = 1.0):
    """Deterministic Gumbel-top-k key: per-token-normalized score plus
    Gumbel noise g = -ln(-ln(u)) from the md5 uniform, both in SCALE
    fixed-point. Taking the k largest keys samples WITHOUT replacement
    with probability proportional to exp(score / temperature) — the
    Gumbel-max trick, made reproducible by the content-hash uniform."""
    from .sampling import hash_uniform

    u = hash_uniform(key_col, seed)
    g = -F.log(-F.log(u))
    norm = (score_fp.cast("double")
            / (F.col(n_tokens) if isinstance(n_tokens, str) else n_tokens)
            .cast("double"))
    return (
        F.floor(norm / F.lit(float(temperature)) + F.lit(SCALE) * g)
        .cast("long")
    )


def dsir_resample(scores: DataFrame, k: int, id_col: str = "doc_id",
                  seed: str = "dsir",
                  temperature: float = 1.0) -> DataFrame:
    """Gumbel-top-k importance resample: the k docs with the largest
    (normalized score + Gumbel) keys, deterministic given (ids, seed).
    TakeOrdered top-k — per-partition heads only, no global sort shuffle."""
    keyed = scores.withColumn(
        "gumbel_key_fp",
        gumbel_key_fp(F.col("score_fp"), "n_tokens", id_col, seed,
                      temperature),
    )
    return keyed.orderBy(F.desc("gumbel_key_fp"), F.col(id_col)).limit(k)
