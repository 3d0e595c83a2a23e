"""Distributed cardinality sketches with a deterministic register layout.

HyperLogLog (Flajolet, Fusy, Gandouet & Meunier, AofA 2007) re-expressed as
two plain aggregations so the sketch itself — not just the estimate — is a
reproducible, mergeable table: ``(group, register, max_rho)`` rows are the
exact partial state a 1000-executor job would combine, and two sketches
built on different clusters (or engines) from the same keys are
bit-identical.

Why not ``approx_count_distinct``: Spark's built-in HLL++ is opaque JVM
state — useful, but not oracle-able and not portable across engines. This
layout derives every register from an md5/xxhash64 content hash, so DuckDB
can rebuild the identical sketch with plain SQL (the driver's correctness
gate does exactly that), and the register table can be stored, merged
wave-over-wave (``max`` is the merge), and diffed.

Determinism of the estimate: the harmonic sum is computed as an INTEGER —
``sum(2^(53 - max_rho))`` over registers plus ``2^53`` per empty register
(rho <= 53 for a 52-bit word, so every term is a non-negative power of
two; the sum fits comfortably in a BIGINT for m <= 2^10). The final
estimate is then a fixed sequence of correctly-rounded IEEE ops
(alpha * m * m * 2^53 / S), identical on any engine. The small-range
linear-counting branch uses ln(m/V) of a ratio of ints <= m — its 1-ulp
libm wiggle is orders of magnitude below the 1e-4 rounding of the output.

Scale shape: one shuffle of slim ``(group, register)`` rows with map-side
partial max; the register table is ``|groups| * m`` rows regardless of
input size; the estimate is a tiny second aggregate. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

_WORD_BITS = 52  # 60-bit hash: top 8+ bits pick the register at p<=8


def _hash60(key_col, hash_family: str = "xxhash64") -> Column:
    """Non-negative 60-bit content hash. md5 family = exact DuckDB twin
    (('0x' || substring(md5(k),1,15))::BIGINT); xxhash64 = scale path
    (shiftrightunsigned(xxhash64(k), 4) keeps 60 non-negative bits)."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    if hash_family == "md5":
        return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10
                      ).cast("long")
    if hash_family == "xxhash64":
        return F.shiftrightunsigned(F.xxhash64(c), 4)
    raise ValueError(f"unknown hash_family: {hash_family}")


def hll_registers(df: DataFrame, key_col: str, group_cols: list[str] | None
                  = None, p: int = 8,
                  hash_family: str = "xxhash64") -> DataFrame:
    """The sketch itself: per group, per register index (top ``p`` hash
    bits), the max leading-zero rank rho of the remaining
    ``60 - p``-bit word. This table IS the mergeable HLL state: union two
    of them and re-max to combine sketches (wave-over-wave, or across
    clusters). NULL keys are dropped explicitly — md5(NULL) is NULL on
    both engines, but xxhash64(NULL) is the seed value, so the filter
    keeps the two families (and the SQL twin) membership-identical."""
    if p < 4 or p > 10:
        raise ValueError("p in [4, 10] keeps every term integral in BIGINT")
    group_cols = list(group_cols or [])
    word_bits = 60 - p
    h = _hash60(key_col, hash_family)
    idx = F.shiftright(h, word_bits).alias("register")
    w = h.bitwiseAND(F.lit((1 << word_bits) - 1))
    # rho = leading zeros of the word + 1 = (word_bits - bitlen(w)) + 1;
    # bin(w) has no leading zeros so bitlen = length(bin(w)); w == 0 means
    # all zeros -> rho = word_bits + 1
    rho = (
        F.when(w == 0, F.lit(word_bits + 1))
        .otherwise(F.lit(word_bits + 1) - F.length(F.bin(w)))
        .cast("int")
        .alias("rho")
    )
    kc = F.col(key_col) if isinstance(key_col, str) else key_col
    return (
        df.filter(kc.isNotNull())
        .select(*group_cols, idx, rho)
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str] | None = None,
                 p: int = 8) -> DataFrame:
    """Estimate from the register table: alpha_m * m^2 / sum(2^-M[j]),
    with the standard small-range linear-counting correction
    (E <= 2.5m and empty registers -> m * ln(m / V)).

    Integer harmonic sum: every 2^-M[j] is scaled by 2^(word_bits+1) so
    the sum is exact BIGINT arithmetic on both engines."""
    group_cols = list(group_cols or [])
    m = 1 << p
    word_bits = 60 - p
    scale_pow = word_bits + 1  # max rho, so every exponent >= 0
    alpha = _alpha(m)
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_nobs"),
        # SQL-form shiftleft: the PySpark wrapper only takes a literal
        # numBits, the SQL function takes a column
        F.sum(F.expr(f"shiftleft(1L, {scale_pow} - max_rho)")).alias("_ssum"),
    )
    v = F.lit(m) - F.col("_nobs")
    s_scaled = (F.col("_ssum")
                + v * F.lit(1 << scale_pow).cast("long")).cast("double")
    e_raw = (F.lit(alpha) * F.lit(m) * F.lit(m)
             * F.lit(float(1 << scale_pow)) / s_scaled)
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        *group_cols,
        F.col("_nobs").alias("n_registers"),
        F.round(est, 4).alias("hll_estimate"),
    )


def _alpha(m: int) -> float:
    # the paper's bias constants; the m >= 128 closed form elsewhere
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(df: DataFrame, key_col: str,
                 group_cols: list[str] | None = None, p: int = 8,
                 hash_family: str = "xxhash64") -> DataFrame:
    """registers |> estimate, one call. At 100 TB this replaces a
    count(DISTINCT url)-sized shuffle (every distinct key crosses the
    wire) with a ``|groups| * 2^p``-row sketch whose build is map-side
    combined — the canonical "how many unique URLs per host have we seen"
    frontier metric."""
    return hll_estimate(
        hll_registers(df, key_col, group_cols, p, hash_family),
        group_cols, p,
    )


# ---------------------------------------------------------------------------
# count-min sketch (heavy hitters / frequency estimation)
# ---------------------------------------------------------------------------

def cms_table(df: DataFrame, key_col: str,
              group_cols: list[str] | None = None, depth: int = 4,
              width_pow: int = 12,
              hash_family: str = "xxhash64") -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan, J.Alg 2005) as a table:
    one row per (group, row d, bucket), counting keys whose d-th hash
    lands in that bucket. Like hll_registers, the table IS the mergeable
    state (sum is the merge) and is deterministic in the key content, so
    two engines build the identical sketch.

    The d hash functions are the content hash salted with the row index
    (md5(key || '#cms' || d) for the oracle family; xxhash64(key, d) at
    scale). Size is bounded at ``depth * 2^width_pow`` rows per group
    regardless of input — broadcastable, storable, diffable.

    Scale shape: one explode-free projection per row d (a union of d slim
    aggregates — Spark unions aggregate partials without rescanning when
    the source is cached; at 100 TB prefer depth scans of a cached slim
    (group,key) projection), each a map-side-combined groupBy of
    (group, bucket) rows."""
    group_cols = list(group_cols or [])
    width = 1 << width_pow
    kc = F.col(key_col)
    parts = []
    for d in range(depth):
        if hash_family == "md5":
            h = F.conv(
                F.substring(
                    F.md5(F.concat(kc.cast("string"),
                                   F.lit(f"#cms{d}"))), 1, 15),
                16, 10).cast("long")
        elif hash_family == "xxhash64":
            h = F.shiftrightunsigned(F.xxhash64(kc, F.lit(d)), 4)
        else:
            raise ValueError(f"unknown hash_family: {hash_family}")
        parts.append(
            df.filter(kc.isNotNull()).select(
                *group_cols,
                F.lit(d).alias("d"),
                F.pmod(h, F.lit(width)).alias("bucket"),
            )
        )
    allrows = parts[0]
    for p in parts[1:]:
        allrows = allrows.unionByName(p)
    return (allrows.groupBy(*group_cols, "d", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_point_estimates(cms: DataFrame, keys: DataFrame, key_col: str,
                        depth: int = 4, width_pow: int = 12,
                        hash_family: str = "xxhash64") -> DataFrame:
    """Point-query the sketch for each key in ``keys``: est = min over
    rows d of cnt[d, h_d(key)] — the classic one-sided overestimate
    (est >= true count, within eps*N w.h.p.). The sketch side is bounded
    (depth * width rows) so every join is a broadcast; missing buckets
    count 0."""
    width = 1 << width_pow
    kc = F.col(key_col)
    out = keys.select(kc.alias("key")).distinct()
    for d in range(depth):
        if hash_family == "md5":
            h = F.conv(
                F.substring(
                    F.md5(F.concat(F.col("key").cast("string"),
                                   F.lit(f"#cms{d}"))), 1, 15),
                16, 10).cast("long")
        else:
            h = F.shiftrightunsigned(F.xxhash64(F.col("key"), F.lit(d)), 4)
        side = (cms.filter(F.col("d") == d)
                .select(F.col("bucket").alias(f"_b{d}"),
                        F.col("cnt").alias(f"_c{d}")))
        out = (out.withColumn(f"_k{d}", F.pmod(h, F.lit(width)))
               .join(F.broadcast(side),
                     F.col(f"_k{d}") == F.col(f"_b{d}"), "left")
               .drop(f"_b{d}", f"_k{d}"))
    est = F.least(*[F.coalesce(F.col(f"_c{d}"), F.lit(0))
                    for d in range(depth)])
    return out.select(F.col("key").alias(key_col),
                      est.cast("long").alias("cms_estimate"))


# ---------------------------------------------------------------------------
# KMV / bottom-k distinct sketch
# ---------------------------------------------------------------------------

def kmv_sketch(df: DataFrame, key_col: str,
               group_cols: list[str] | None = None, k: int = 64,
               hash_family: str = "xxhash64") -> DataFrame:
    """KMV (k-minimum-values) sketch, Bar-Yossef et al. RANDOM'02: per
    group, the k smallest DISTINCT 60-bit key hashes. Dual-purpose state:
    (a) distinct-count estimation from the k-th minimum, (b) a uniform
    mergeable SAMPLE of distinct keys (each kept hash is a random
    distinct key — the bottom-k trick behind theta sketches), which HLL
    registers cannot give you. Merge = union two sketches, distinct,
    re-bottom-k.

    Scale shape: distinct on slim (group, h) rows (one map-side-combined
    shuffle), then rank <= k — Spark plans the rank filter as
    WindowGroupLimit, i.e. per-partition bottom-k heaps BEFORE the final
    per-group pass, so the full distinct-hash set of a hot group never
    concentrates on one task."""
    group_cols = list(group_cols or [])
    kc = F.col(key_col) if isinstance(key_col, str) else key_col
    hashes = (
        df.filter(kc.isNotNull())
        .select(*group_cols, _hash60(key_col, hash_family).alias("h"))
        .distinct()
    )
    # ungrouped sketches still get a (constant) partition key so the plan
    # keeps the WindowGroupLimit per-partition bottom-k pass
    parts = [F.col(c) for c in group_cols] or [F.lit(1)]
    win = W.partitionBy(*parts).orderBy("h")
    return (
        hashes.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= int(k))
        .select(*group_cols, "rnk", "h")
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str] | None = None,
                 k: int = 64) -> DataFrame:
    """Distinct-count estimate from the bottom-k sketch: if the group has
    fewer than k distinct hashes the count is EXACT (= sketch size);
    otherwise (k-1) * 2^60 / h_k with h_k the k-th minimum — one IEEE
    division, engine-portable. Returns (group..., n_kept, kmv_estimate)."""
    group_cols = list(group_cols or [])
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("_hk"),
    )
    est = F.when(
        F.col("n_kept") < int(k), F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(1 << 60))
        / F.col("_hk").cast("double")
    )
    return agg.select(*group_cols, "n_kept",
                      F.round(est, 4).alias("kmv_estimate"))
