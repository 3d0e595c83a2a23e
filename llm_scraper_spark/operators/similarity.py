"""Similarity search over embedding columns (reference J6,
/root/reference/src/llm_scraper/vectors/engine.py:80-91 — cosine top-k
against a query vector; here generalized to distributed ANN).

- cosine_expr       — native dot/norm via zip_with + aggregate (no UDF)
- brute_force_topk  — exact top-k for a query vector (the correctness baseline)
- hyperplane_bucket — random-hyperplane LSH bucket id (numpy matmul in one
                      Arrow-batched pandas UDF — the only Python, vectorized)
- ann_topk          — LSH-bucketed approximate top-k with multi-probe
- hyperplane_bucket_md5 / ann_topk_md5 — sign-LSH twin with md5-derived
                      +-1 planes + integer fixed-point projections: zero
                      Python stages AND fully recomputable by the DuckDB
                      oracle (no goldens anywhere in its chain)
- knn_join          — per-row top-k neighbor join between two tables
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W, functions as F


def cosine_expr(a, b) -> Column:
    """Cosine similarity of two array<float|double> columns, fully native."""
    ca = (F.col(a) if isinstance(a, str) else a).cast("array<double>")
    cb = (F.col(b) if isinstance(b, str) else b).cast("array<double>")
    dot = F.aggregate(F.zip_with(ca, cb, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(ca, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(cb, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def brute_force_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k vs a broadcast query vector. The scan is a single
    narrow pass (no shuffle); top-k is a TakeOrdered, not a full sort."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(F.col(id_col), cosine_expr(F.col(vec_col), q).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def _planes(dim: int, planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(dim, planes).astype(np.float64)


def hyperplane_bucket(df: DataFrame, vec_col: str, planes: int = 16,
                      seed: int = 42, out_col: str = "bucket",
                      dim: int | None = None) -> DataFrame:
    """Sign-of-projection LSH bucket (one int64 of `planes` sign bits).

    numpy matmul over the whole Arrow batch — vectorized, executor-side.
    Pass ``dim`` (the embedding dimensionality) when the caller knows it —
    otherwise a 1-row ``first()`` probe infers it, which costs an extra
    driver action per call (unwanted in lazy/hot paths).
    """
    if dim is None:
        sample = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if sample is None:
            return df.withColumn(out_col, F.lit(0).cast("long"))
        dim = sample["d"]
    mat = _planes(dim, planes, seed)
    bc = df.sparkSession.sparkContext.broadcast(mat)
    weights = np.array([1 << i for i in range(planes)], dtype=np.int64)

    @F.pandas_udf("long")
    def bucket_of(vs: pd.Series) -> pd.Series:
        m = np.stack(vs.to_numpy())            # (batch, dim)
        signs = (m.astype(np.float64) @ bc.value) > 0   # (batch, planes)
        return pd.Series(signs.astype(np.int64) @ weights)

    return df.withColumn(out_col, bucket_of(F.col(vec_col)))


def ann_candidates(df: DataFrame, query_vec: list[float],
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   planes: int = 8, seed: int = 42,
                   probe_hamming: int = 1) -> DataFrame:
    """The multi-probe LSH candidate set for a query vector: rows whose
    hyperplane bucket is within ``probe_hamming`` bits of the query's
    (all bit-flip combinations up to that radius — at radius 2 over p
    planes that is 1 + p + p(p-1)/2 buckets, still a vanishing corpus
    fraction at scale while lifting near-neighbor recall from ~0.8 to
    ~0.99 for cos≈0.96 neighbors)."""
    from itertools import combinations

    q = np.asarray(query_vec, dtype=np.float64)
    dim = len(query_vec)
    mat = _planes(dim, planes, seed)
    qbits = int(((q @ mat) > 0).astype(np.int64) @ np.array(
        [1 << i for i in range(planes)], dtype=np.int64))
    probes = [qbits]
    for radius in range(1, probe_hamming + 1):
        for flips in combinations(range(planes), radius):
            mask = 0
            for b in flips:
                mask |= 1 << b
            probes.append(qbits ^ mask)
    # dim is known from the query vector — no driver-side probe needed
    bucketed = hyperplane_bucket(df, vec_col, planes, seed, dim=dim)
    return bucketed.filter(F.col("bucket").isin(probes))


def ann_topk(df: DataFrame, query_vec: list[float], k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             planes: int = 8, seed: int = 42, probe_hamming: int = 1) -> DataFrame:
    """Approximate top-k: restrict the exact cosine to LSH buckets within
    ``probe_hamming`` bits of the query's bucket (multi-probe), then rank.
    At 100 TB this prunes the scan to ~(1+planes)/2^planes of the corpus;
    partition-prune further by writing the table bucketed on `bucket`."""
    cand = ann_candidates(df, query_vec, vec_col, id_col, planes, seed,
                          probe_hamming)
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)


def knn_join(left: DataFrame, right: DataFrame, k: int = 5,
             vec_col: str = "embedding", left_id: str = "vec_id",
             right_id: str = "vec_id", planes: int = 8, seed: int = 42,
             dim: int | None = None) -> DataFrame:
    """For each left row, its k most-cosine-similar right rows sharing an LSH
    bucket. Equi-join on bucket + per-left-row window top-k. Pass ``dim``
    to keep the plan fully lazy (no per-side first() probe)."""
    lb = hyperplane_bucket(
        left.select(F.col(left_id).alias("lid"), F.col(vec_col).alias("lv")),
        "lv", planes, seed, dim=dim)
    rb = hyperplane_bucket(
        right.select(F.col(right_id).alias("rid"), F.col(vec_col).alias("rv")),
        "rv", planes, seed, dim=dim)
    # eqNullSafe, not on="bucket": plain equi-join keys get IsNotNull
    # filters injected, and a filter + projection each referencing the
    # bucket UDF plan SEPARATE ArrowEvalPython stages — the bucketing
    # would run twice per row. Null-safe equality skips the null filter
    # (buckets are never null) and still hash-joins.
    joined = (
        lb.join(rb, lb["bucket"].eqNullSafe(rb["bucket"]))
        .filter(F.col("lid") != F.col("rid"))
        .withColumn("cos_sim", cosine_expr("lv", "rv"))
    )
    w = W.partitionBy("lid").orderBy(F.col("cos_sim").desc(), F.col("rid"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("lid", "rid", "cos_sim", "rank")
    )


# --- md5-derived sign-LSH: the fully-recomputable twin ------------------
#
# hyperplane_bucket's Gaussian planes come from numpy's RNG, which no SQL
# engine reproduces — its driver-gate oracle therefore reads a committed
# golden bucket assignment (drift detector, not independent verification).
# This variant removes that gap: plane entries are Rademacher (+1/-1)
# drawn from md5("hp:{seed}:{plane}:{dim}") — the same keyed-md5 family
# every other recomputed oracle here uses — and projections are computed
# over integer-quantized components (floor(v * 2^20)), so the per-plane
# dot product is exact integer arithmetic, independent of summation
# order, and bit-identical between Spark codegen and a DuckDB GROUP BY.
# Sign-LSH with +-1 entries keeps the Charikar collision guarantee
# (E[collision] is monotone in angle for any symmetric sign-stable
# distribution); the 2^-20 quantization perturbs a projection only when
# |proj| < dim * 2^-20 * max|v| — vanishingly rare and harmless (a
# near-zero projection means the plane barely separates the pair).
# Bucketing is 100% native Spark expressions (zip_with + aggregate over
# literal sign arrays — whole-stage codegen, no Python stage at all),
# which also makes this the preferred variant for the hot path.

def md5_plane_signs(dim: int, planes: int, seed: int) -> list[list[int]]:
    """(planes, dim) Rademacher matrix from keyed md5 — pure driver-side
    Python, reproducible by any engine with md5 (see the DuckDB oracle in
    __spark_entry__.oracle_sql()['ann_topk_md5'])."""
    import hashlib

    return [
        [1 if int(hashlib.md5(f"hp:{seed}:{p}:{d}".encode())
                  .hexdigest()[:15], 16) % 2 == 0 else -1
         for d in range(dim)]
        for p in range(planes)
    ]


QUANT = 1 << 20  # fixed-point scale for exact integer projections


def hyperplane_bucket_md5(df: DataFrame, vec_col: str, planes: int = 8,
                          seed: int = 42, dim: int = 64,
                          out_col: str = "bucket") -> DataFrame:
    """Sign-of-projection LSH bucket with md5-derived +-1 planes and
    integer fixed-point projections — fully native (no UDF), fully
    recomputable by the SQL oracle. ``dim`` is required: the sign matrix
    is embedded as literal arrays (planes x dim ints — trivially small),
    so the plan stays lazy with no driver probe."""
    signs = md5_plane_signs(dim, planes, seed)
    qv = F.transform(F.col(vec_col).cast("array<double>"),
                     lambda x: F.floor(x * F.lit(float(QUANT))))
    bucket = F.lit(0).cast("long")
    for p, srow in enumerate(signs):
        sarr = F.array(*[F.lit(s).cast("long") for s in srow])
        proj = F.aggregate(F.zip_with(qv, sarr, lambda x, y: x * y),
                           F.lit(0).cast("long"), lambda acc, x: acc + x)
        bucket = bucket + F.when(proj > 0,
                                 F.lit(1 << p).cast("long")).otherwise(F.lit(0))
    return df.withColumn(out_col, bucket)


def _md5_bucket_of(vec: list[float], planes: int, seed: int) -> int:
    """Driver-side bucket of a known vector (the query side of ann_topk_md5
    / probe generation) — same arithmetic as hyperplane_bucket_md5."""
    import math

    signs = md5_plane_signs(len(vec), planes, seed)
    b = 0
    for p, srow in enumerate(signs):
        proj = sum(s * math.floor(float(v) * QUANT)
                   for s, v in zip(srow, vec))
        if proj > 0:
            b |= 1 << p
    return b


def ann_topk_md5(df: DataFrame, query_vec: list[float], k: int = 10,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 planes: int = 8, seed: int = 42,
                 probe_hamming: int = 1) -> DataFrame:
    """ann_topk with the md5-derived sign-LSH: identical multi-probe
    candidate semantics (buckets within ``probe_hamming`` bits of the
    query's), exact cosine rerank — but the whole chain (quantization,
    planes, buckets, probes, rerank) is recomputable from the corpus
    alone, no goldens. Same 100 TB shape as ann_topk: the isin(probes)
    filter partition-prunes a table written bucketed on `bucket`."""
    from itertools import combinations

    qbits = _md5_bucket_of(query_vec, planes, seed)
    probes = [qbits]
    for radius in range(1, probe_hamming + 1):
        for flips in combinations(range(planes), radius):
            mask = 0
            for b in flips:
                mask |= 1 << b
            probes.append(qbits ^ mask)
    bucketed = hyperplane_bucket_md5(df, vec_col, planes, seed,
                                     dim=len(query_vec))
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)


def knn_join_md5(left: DataFrame, right: DataFrame, k: int = 5,
                 vec_col: str = "embedding", left_id: str = "vec_id",
                 right_id: str = "vec_id", planes: int = 8, seed: int = 42,
                 dim: int = 64) -> DataFrame:
    """knn_join with the md5-derived sign-LSH buckets: same bucket
    equi-join + per-left-row window top-k shape, but bucketing is native
    expressions (no UDF — so none of knn_join's double-evaluation
    footwork is needed; a plain equi-join key is fine) and the whole
    chain is recomputable by the SQL oracle with no committed golden."""
    lb = hyperplane_bucket_md5(
        left.select(F.col(left_id).alias("lid"), F.col(vec_col).alias("lv")),
        "lv", planes, seed, dim=dim)
    rb = hyperplane_bucket_md5(
        right.select(F.col(right_id).alias("rid"), F.col(vec_col).alias("rv")),
        "rv", planes, seed, dim=dim)
    joined = (
        lb.join(rb, lb["bucket"] == rb["bucket"])
        .filter(F.col("lid") != F.col("rid"))
        .withColumn("cos_sim", cosine_expr("lv", "rv"))
    )
    w = W.partitionBy("lid").orderBy(F.col("cos_sim").desc(), F.col("rid"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("lid", "rid", "cos_sim", "rank")
    )


# --- IVF (inverted-file) ANN: the coarse-quantizer alternative to LSH ----

def ivf_fit_centroids(df: DataFrame, k_centroids: int = 16,
                      vec_col: str = "embedding", seed: int = 42,
                      max_iter: int = 5) -> np.ndarray:
    """Coarse quantizer for an IVF index: MLlib kmeans|| over the corpus
    (distributed fit — the idiomatic Spark path; no vector leaves the
    executors except the k centroids). Returns a (k_centroids, dim)
    ndarray to broadcast into assignment/probing. At 100 TB the fit runs
    on a sample (`df.sample`) — centroid quality, not corpus coverage,
    is what matters for a coarse quantizer."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=k_centroids, seed=seed, maxIter=max_iter).fit(feats)
    return np.stack([c for c in model.clusterCenters()])


def ivf_assign(df: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding",
               out_col: str = "centroid_id") -> DataFrame:
    """Nearest-centroid (L2) assignment — one numpy matmul per Arrow
    batch against the broadcast centroid matrix. Writing the table
    partitioned/bucketed by this column turns every probe into a
    partition-pruned scan."""
    bc = df.sparkSession.sparkContext.broadcast(
        np.asarray(centroids, dtype=np.float64))

    @F.pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        m = np.stack(vs.to_numpy()).astype(np.float64)     # (batch, dim)
        c = bc.value
        # argmin ||x-c||^2 = argmin -2 x.c + ||c||^2 (||x||^2 constant in c)
        d = -2.0 * (m @ c.T) + (c * c).sum(axis=1)[None, :]
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return df.withColumn(out_col, assign(F.col(vec_col)))


def ivf_probe_ids(query_vec: list[float], centroids: np.ndarray,
                  nprobe: int) -> list[int]:
    """The nprobe centroid ids nearest (L2) to the query — driver-side
    arithmetic on the (k, dim) centroid matrix only."""
    q = np.asarray(query_vec, dtype=np.float64)
    c = np.asarray(centroids, dtype=np.float64)
    d = ((c - q[None, :]) ** 2).sum(axis=1)
    return [int(i) for i in np.argsort(d, kind="stable")[:nprobe]]


def ivf_topk(df: DataFrame, query_vec: list[float], centroids: np.ndarray,
             k: int = 10, nprobe: int = 2, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """IVF approximate top-k: exact cosine restricted to the nprobe
    nearest inverted lists. nprobe == len(centroids) degenerates to the
    exact brute-force answer (used by the driver oracle to content-check
    the machinery; recall at partial probe is measured in
    tests/test_goldens.py)."""
    probes = ivf_probe_ids(query_vec, centroids, nprobe)
    cand = ivf_assign(df, centroids, vec_col).filter(
        F.col("centroid_id").isin(probes))
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)


def embedding_pca(emb: DataFrame, vec_col: str = "embedding",
                  id_col: str = "vec_id", iterations: int = 4,
                  quant: int = 256, vscale: int = 1024) -> DataFrame:
    """Top principal component of an embedding table by INTEGER power
    iteration — the primitive under embedding hygiene at corpus scale:
    Mu & Viswanath's all-but-the-top (ICLR 2018) removes the dominant
    component to de-bias embeddings, whitening divides by it, and a
    drifting top component between crawl snapshots flags an embedding
    regression before any retrieval metric does.

    Exactness: embeddings are quantized ``floor(x * quant)`` with quant
    a POWER OF TWO (float32 -> double -> *2^k -> floor is exact IEEE on
    any engine); the scaled covariance ``n*Sxy - Sx*Sy`` is exact
    BIGINT sufficient statistics (same eigenvectors as covariance); each
    power-iteration step is one integer mat-vec followed by a
    rescale to ``vscale`` via ``sign(w) * (abs(w)*vscale DIV max|w|)``
    — abs() keeps the operands non-negative so Spark's truncating DIV
    and DuckDB's flooring // agree. The eigenvalue read-out is the
    integer Rayleigh quotient (num*1000 DIV den, num >= 0 for a PSD
    matrix). Bit-reproducible end-to-end; magnitudes bounded: |x| <=
    quant, cov <= n^2*d*quant^2, matvec <= cov*vscale*d — safe in
    int64 through sf 1 at d = 64 with the defaults.

    Scale shape: the quantized explode is one projection; Sxy is ONE
    self-equi-join on the row id (fan-out d per side — bounded by the
    embedding dim, never corpus size) + a map-side-combined groupBy to
    d^2 rows; everything after lives on d- and d^2-row tables — the
    corpus is touched exactly twice regardless of iteration count.

    Returns (dim, v_fp, lam_fp): the component at vscale fixed point
    per dimension, and the Rayleigh eigenvalue estimate (identical on
    every row).
    """
    x = emb.select(
        F.col(id_col).alias("_id"),
        F.posexplode(vec_col).alias("i", "_e"),
    ).select(
        "_id", "i",
        F.floor(F.col("_e").cast("double") * quant).cast("long").alias("x"),
    )
    n_df = emb.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    si = x.groupBy("i").agg(F.sum("x").cast("long").alias("s"))
    sij = (
        x.alias("a").join(x.alias("b"), F.col("a._id") == F.col("b._id"))
        .select(F.col("a.i").alias("i"), F.col("b.i").alias("j"),
                (F.col("a.x") * F.col("b.x")).alias("p"))
        .groupBy("i", "j").agg(F.sum("p").cast("long").alias("sp"))
    )
    from .checkpoints import local_checkpoint_tracked, release_checkpoint

    spark = emb.sparkSession
    cov = (
        sij.join(si.select("i", F.col("s").alias("_si")), "i")
        .join(si.select(F.col("i").alias("j"), F.col("s").alias("_sj")), "j")
        .crossJoin(F.broadcast(n_df))
        .select("i", "j",
                (F.col("_n") * F.col("sp") - F.col("_si") * F.col("_sj"))
                .cast("long").alias("c"))
    )
    # EAGER checkpoint, not persist: nothing inside this function runs an
    # action, so a lazy persist would never populate and every one of the
    # ~2^iterations references to cov in the nested mat-vec plan would
    # recompute the corpus self-join. The checkpoint materializes the d^2
    # table once; blocks are released after the result is materialized.
    cov, cov_ids = local_checkpoint_tracked(cov)
    v = cov.select("j").distinct().select(
        "j", F.lit(vscale).cast("long").alias("v"))

    def _matvec(vec):
        return (
            cov.join(vec, "j")
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("v")).cast("long").alias("w"))
        )

    prev_v_ids: set[int] = set()
    for _ in range(iterations):
        w = _matvec(v)
        m = w.agg(F.max(F.abs(F.col("w"))).cast("long").alias("_m"))
        v = w.crossJoin(F.broadcast(m)).select(
            F.col("i").alias("j"),
            (F.when(F.col("w") < 0, -1).otherwise(1).cast("long")
             * F.expr(f"(abs(w) * {vscale}) DIV _m")).cast("long").alias("v"),
        )
        # d-row table: checkpointing per round is free and stops the plan
        # from doubling (each v references w twice — direct + the max agg)
        v, v_ids = local_checkpoint_tracked(v)
        release_checkpoint(spark, prev_v_ids)
        prev_v_ids = v_ids
    w = _matvec(v)
    ray = (
        v.select(F.col("j").alias("i"), "v").join(w, "i")
        .agg(F.sum(F.col("v") * F.col("w")).cast("long").alias("_num"),
             F.sum(F.col("v") * F.col("v")).cast("long").alias("_den"))
        .select(F.expr("(_num * 1000) DIV _den").alias("lam_fp"))
    )
    out = (
        v.select(F.col("j").alias("dim"), F.col("v").alias("v_fp"))
        .crossJoin(F.broadcast(ray))
    )
    # materialize the d-row result, then free the cov and round blocks
    out, _final = local_checkpoint_tracked(out)
    release_checkpoint(spark, cov_ids | prev_v_ids)
    return out


def embedding_pca_oracle_sql(emb_sql: str, iterations: int = 4,
                             quant: int = 256, vscale: int = 1024) -> str:
    """Unrolled-CTE DuckDB twin of :func:`embedding_pca` — identical
    quantization, sufficient statistics, per-round mat-vec + abs-DIV
    rescale, and Rayleigh read-out (SUM over BIGINT is HUGEINT — cast
    back before reuse)."""
    parts = [f"""WITH x AS (
  SELECT id, i - 1 AS i, floor(x * {quant})::BIGINT AS x FROM (
    SELECT vec_id AS id, unnest(embedding) AS x,
           generate_subscripts(embedding, 1) AS i
    FROM ({emb_sql}))),
nn AS (SELECT count(DISTINCT id)::BIGINT AS n FROM x),
si AS (SELECT i, sum(x)::BIGINT AS s FROM x GROUP BY i),
sij AS (
  SELECT a.i AS i, b.i AS j, sum(a.x * b.x)::BIGINT AS sp
  FROM x a JOIN x b ON a.id = b.id GROUP BY a.i, b.i),
cov AS (
  SELECT sij.i, sij.j,
         (nn.n * sij.sp - s1.s * s2.s)::BIGINT AS c
  FROM sij JOIN si s1 ON s1.i = sij.i JOIN si s2 ON s2.i = sij.j, nn),
v0 AS (SELECT DISTINCT j, {vscale}::BIGINT AS v FROM cov)"""]
    k = 0
    for k in range(1, iterations + 1):
        parts.append(f""",
w{k} AS (
  SELECT cov.i, sum(cov.c * v{k-1}.v)::BIGINT AS w
  FROM cov JOIN v{k-1} ON v{k-1}.j = cov.j GROUP BY cov.i),
m{k} AS (SELECT max(abs(w))::BIGINT AS m FROM w{k}),
v{k} AS (
  SELECT w{k}.i AS j,
         (CASE WHEN w < 0 THEN -1 ELSE 1 END
          * ((abs(w) * {vscale}) // m{k}.m))::BIGINT AS v
  FROM w{k}, m{k})""")
    parts.append(f""",
wf AS (
  SELECT cov.i, sum(cov.c * v{k}.v)::BIGINT AS w
  FROM cov JOIN v{k} ON v{k}.j = cov.j GROUP BY cov.i),
ray AS (
  SELECT ((sum(v{k}.v * wf.w)::BIGINT * 1000)
          // sum(v{k}.v * v{k}.v)::BIGINT)::BIGINT AS lam_fp
  FROM v{k} JOIN wf ON wf.i = v{k}.j)
SELECT v{k}.j AS dim, v{k}.v AS v_fp, ray.lam_fp
FROM v{k}, ray""")
    return "".join(parts)
