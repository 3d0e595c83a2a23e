"""Deterministic hash-based sampling for training-data mixture building.

A 100 TB corpus is never trained on uniformly: sources/languages get
per-stratum sampling rates (data-mixture weights, cf. the Pile / LLaMA
mixture tables). Spark's ``df.sample`` is seed-dependent on PARTITIONING
(per-partition XORShift streams), so the same row can flip in/out when the
input is repartitioned — useless for reproducible corpus builds and
impossible to oracle. These operators derive the keep/drop decision from a
content hash of a stable key instead: the sample is a pure function of
(key, seed), identical on any cluster layout, any engine, any day.

The reference has no sampling at all (it scrapes everything it schedules);
this is a training-pipeline extension per the brief.

All expressions are native (md5/conv/comparison — whole-stage codegen, no
Python). The md5-derived 60-bit uniform has an exact DuckDB twin
(('0x' || substring(md5(k),1,15))::BIGINT), which is what lets the driver
content-verify the sample membership itself, not just its size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 2^60: the hash below keeps 15 hex chars = 60 bits
_HASH_SPACE = float(1 << 60)


def hash_uniform(key_col, seed: str = "s0") -> Column:
    """Deterministic uniform [0,1) from a stable key: the first 60 bits of
    md5(key || '#' || seed). Independent samples = different seeds.

    NULL keys yield NULL (F.concat is null-propagating, matching the SQL
    twin's ``key || '#' || seed``), so a NULL-keyed row is dropped by every
    ``< rate`` filter on BOTH engines — concat_ws would silently hash
    '#seed' on the Spark side only and diverge the membership."""
    k = F.col(key_col) if isinstance(key_col, str) else key_col
    hexpart = F.substring(
        F.md5(F.concat(k.cast("string"), F.lit("#"), F.lit(seed))), 1, 15
    )
    return F.conv(hexpart, 16, 10).cast("long").cast("double") / F.lit(_HASH_SPACE)


def hash_uniform_sql(key_expr: str, seed: str = "s0") -> str:
    """The DuckDB-exact twin of hash_uniform (for oracle SQL generation)."""
    return (
        f"(('0x' || substring(md5({key_expr} || '#' || '{seed}'), 1, 15))::BIGINT"
        f" / {int(_HASH_SPACE)}.0)"
    )


def hash_sample(df: DataFrame, rate: float, key_col: str = "doc_id",
                seed: str = "s0") -> DataFrame:
    """Keep each row iff hash_uniform(key) < rate. Reproducible under any
    repartitioning; no shuffle, no Python — a codegen'd filter that stacks
    under whatever scan pushdown is already happening."""
    return df.filter(hash_uniform(key_col, seed) < F.lit(rate))


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      strata_col: str, key_col: str = "doc_id",
                      seed: str = "s0",
                      default_rate: float = 0.0) -> DataFrame:
    """Per-stratum sampling rates (the data-mixture table): keep a row iff
    hash_uniform(key) < rates[stratum]. Strata absent from ``rates`` get
    ``default_rate``. The rate table is a literal CASE expression — no join,
    no broadcast, stays inside codegen next to the scan."""
    rate = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == s, F.lit(float(r))).otherwise(rate)
    return df.filter(hash_uniform(key_col, seed) < rate)


def split_train_eval(df: DataFrame, eval_frac: float = 0.01,
                     key_col: str = "doc_id", seed: str = "split") -> DataFrame:
    """Deterministic train/eval split as a column (no data movement): the
    same doc lands in the same split on every run and every cluster, which
    is the property that makes downstream decontamination auditable."""
    return df.withColumn(
        "split",
        F.when(hash_uniform(key_col, seed) < F.lit(eval_frac), F.lit("eval"))
        .otherwise(F.lit("train")),
    )


def temperature_mixture_rates(df: DataFrame, source_col: str = "source",
                              alpha: float = 0.5,
                              boost: int = 3) -> DataFrame:
    """Temperature-based mixture weights: a source with n_i documents gets
    sampling probability proportional to n_i^alpha (alpha < 1 upsamples
    the tail — the multinomial smoothing rule of mBERT/XLM-R/mT5,
    Conneau & Lample 2019 §3.1; alpha=1 is natural proportions, alpha=0
    uniform over sources). The per-row keep rate is
    ``min(1, boost * p_i * n_total / n_i)``-free form: we expose
    ``rate_i = min(1, boost * w_i / sum_j w_j * n_total / n_i)`` reduced
    to its stable fixed-point form below.

    Cross-engine determinism (what makes the sample EXACTLY oracle-able,
    not statistically): ``w_i = floor(pow(n_i, alpha) * 1e6)`` as BIGINT —
    pow's worst-case 1-ulp libm difference is ~1e-8 of an integer step,
    so the floor agrees across engines; the normalizing sum is then
    INTEGER (associativity-proof), and the final rate is a single IEEE
    division + multiply, correctly rounded everywhere.

    Returns one row per source: (source, n_docs, w, rate).

    Scale shape: one map-side-combined count aggregate over the corpus;
    the rate table is |sources| rows — broadcast it into the membership
    filter (temperature_sample)."""
    counts = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"))
    w = F.floor(F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
                * F.lit(1_000_000.0)).cast("long")
    weighted = counts.withColumn("w", w)
    tot = weighted.agg(F.sum("w").alias("_tw"), F.sum("n_docs").alias("_tn"))
    rate = F.least(
        F.lit(1.0),
        F.lit(float(boost)) * (F.col("w").cast("double") / F.col("_tw"))
        * (F.col("_tn").cast("double") / F.col("n_docs")),
    )
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select("source", "n_docs", "w", rate.alias("rate"))
    )


def temperature_sample(df: DataFrame, source_col: str = "source",
                       key_col: str = "doc_id", alpha: float = 0.5,
                       boost: int = 3, seed: str = "temp") -> DataFrame:
    """Apply temperature mixture rates as deterministic membership: keep a
    row iff hash_uniform(key, seed) < rate(source). Two jobs total: the
    tiny rate table (one aggregate) broadcasts into a codegen'd filter —
    the corpus itself is touched by exactly one scan with no shuffle, so
    the sample composes with whatever pushdown the scan already has."""
    rates = temperature_mixture_rates(df, source_col, alpha, boost)
    return (
        df.join(F.broadcast(rates.select(
            F.col("source").alias("_rate_source"), "rate")),
            F.col(source_col) == F.col("_rate_source"))
        .filter(hash_uniform(key_col, seed) < F.col("rate"))
        .drop("_rate_source")
    )


def aes_key_fp(key_col, weight_col, seed: str = "wrs") -> Column:
    """Efraimidis & Spirakis (IPL 2006) weighted-reservoir key, made
    deterministic: keeping the k items with the LARGEST u^(1/w) samples
    without replacement with probability proportional to weight w. We
    rank by the equivalent -ln(u)/w ASCENDING (monotone transform, avoids
    pow), with u the md5 content-hash uniform — so the sample is a pure
    function of (key, seed), reproducible on any cluster layout.

    Fixed-point: floor(1e6 * (-ln(u)) / w) as BIGINT. ln's 1-2 ulp libm
    wiggle (~1e-15 abs) cannot move the floor except within 1e-15 of a
    step — the same cross-engine argument as temperature_mixture_rates.
    Zero/negative/null weights are rejected to NULL (never sampled)."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = hash_uniform(key_col, seed)
    key = F.floor(F.lit(1_000_000.0) * (-F.log(u)) / w.cast("double"))
    return F.when(w > 0, key).cast("long")


def weighted_sample_topk(df: DataFrame, k: int, weight_col: str,
                         key_col: str = "doc_id",
                         seed: str = "wrs") -> DataFrame:
    """The k-item weighted sample: smallest A-ES keys first, ties broken
    by the id for full determinism. orderBy+limit compiles to
    TakeOrderedAndProject — per-partition top-k heaps then a k-row driver
    merge, NO global sort shuffle, which is what makes a top-k sample of
    a 10^10-row table one scan."""
    keyed = df.withColumn("aes_key_fp", aes_key_fp(key_col, weight_col, seed))
    return (keyed.filter(F.col("aes_key_fp").isNotNull())
            .orderBy(F.asc("aes_key_fp"), F.col(key_col)).limit(k))


def cluster_split(
    clusters: DataFrame,
    val_pct: int = 10,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    seed: str = "split",
) -> DataFrame:
    """Leakage-safe train/validation split: the split decision hashes the
    near-dup CLUSTER id, not the document id, so two near-duplicate
    documents can NEVER straddle the boundary — the train/test
    contamination mode document-level hashing cannot prevent (a val doc's
    near-twin sitting in train is memorization leakage that benchmark
    decontamination won't catch because the val set isn't a benchmark).
    Input is any (doc_id, cluster_id) assignment — e.g.
    ``dedup.line_share_clusters`` or connected components over minhash
    pairs; singleton docs are their own cluster and split independently.

    Deterministic and engine-replayable: ``md5(cluster_id || '#' ||
    seed)`` 60-bit, uniform mod 100 < val_pct — the hash_uniform family
    (null-propagating F.concat, same expression in the oracle). Zero
    shuffles on top of the cluster assignment: one narrow projection.

    Returns the input plus ``split`` ('val' | 'train').
    """
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(cluster_col).cast("string"),
                               F.lit("#"), F.lit(seed))), 1, 15),
            16, 10).cast("long") % 100
    )
    return clusters.withColumn(
        "split",
        F.when(h < int(val_pct), F.lit("val")).otherwise(F.lit("train")))


def cluster_split_sql_expr(cluster_sql: str, val_pct: int = 10,
                           seed: str = "split") -> str:
    """DuckDB scalar twin of :func:`cluster_split`'s split expression."""
    return (
        f"(CASE WHEN ('0x' || substring(md5({cluster_sql}::VARCHAR"
        f" || '#{seed}'), 1, 15))::BIGINT % 100 < {int(val_pct)}"
        " THEN 'val' ELSE 'train' END)")
