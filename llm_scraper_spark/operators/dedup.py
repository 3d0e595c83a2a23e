"""Deduplication operators for large-scale training-data pipelines.

All hot paths are native Spark SQL expressions (JVM, whole-stage codegen):
shingling via split/transform/sequence, hashing via xxhash64, banding via
xxhash64-over-array — no Python anywhere. The reference only has exact
URL-level dedup (cache.py:110-136, SURVEY §2.2); the content-level family
here is the scale extension a 100 TB corpus needs.

Operators:
- exact_dedup          — hash-groupBy keep-first (one shuffle, map-side combine)
- shingle/minhash/LSH  — MinHash signatures + banded LSH candidate pairs
- minhash_near_dups    — end-to-end near-dup marking (drop docs with a
                         smaller near-duplicate neighbor — greedy, deterministic)
- simhash64            — 64-bit SimHash via explode + bit-bucket aggregation
- ngram_jaccard_pairs  — exact Jaccard over shingle sets for candidate pairs
- embedding_near_dups  — cosine near-dup via random-hyperplane LSH buckets
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                normalize: bool = True) -> DataFrame:
    """Keep the lowest-id row per distinct (normalized) text.

    groupBy on a 64-bit content hash with min_by — partial aggregation
    (map-side combine) means the shuffle carries one row per distinct text
    per map task, not the full corpus.
    """
    c = F.col(text_col)
    if normalize:
        c = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    packed = df.withColumn("_h", F.xxhash64(c))
    others = [x for x in df.columns]
    agg = packed.groupBy("_h").agg(
        F.min_by(F.struct(*others), F.col(id_col)).alias("_row")
    )
    return agg.select(*[F.col(f"_row.{x}").alias(x) for x in others])


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH
# ---------------------------------------------------------------------------

def tokens_expr(text_col) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.lower(F.trim(c)), r"\s+")


def shingles_expr(text_col, n: int = 3) -> Column:
    """Word n-gram shingles, all native: sequence + transform + element_at.

    element_at is O(1) per token; a slice()-based lambda copies the
    sub-array per shingle and, being an interpreted HOF, dominated the
    whole MinHash pipeline (~10x slower on benchmark)."""
    toks = tokens_expr(text_col)
    n_sh = F.size(toks) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    # sequence(1, 0) is DESCENDING [1,0] in Spark — guard the empty case
    return F.when(n_sh >= 1, grams).otherwise(F.array().cast("array<string>"))


def minhash_signature(shingles_col, k: int = 64) -> Column:
    """k-permutation MinHash: sig[i] = min over shingles of xxhash64(s, i).

    k array_min/transform expressions, all codegen'd; empty shingle sets get
    sig of Long.MaxValue so they never collide with real content.
    """
    c = F.col(shingles_col) if isinstance(shingles_col, str) else shingles_col
    maxlong = F.lit(9223372036854775807).cast("long")

    def _hash_fn(i):
        # a 2-arg lambda would become an (element, index) HOF in PySpark and
        # the array index would silently replace the permutation id — close over i
        return lambda s: F.xxhash64(s, F.lit(i))

    return F.array(
        *[
            F.coalesce(F.array_min(F.transform(c, _hash_fn(i))), maxlong)
            for i in range(k)
        ]
    )


def shingles_exploded(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, s) word n-gram shingles via posexplode + window leads.

    HOF-free on purpose: transform/slice (or element_at) lambdas run
    interpreted and measured ~10x slower than this explode + lead plan,
    which stays in codegen'd projections + one UnsafeRow window pass."""
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens_expr(text_col)).alias("pos", "w0"),
    )
    win = W.partitionBy("id").orderBy("pos")
    out = toks
    for j in range(1, n):
        out = out.withColumn(f"w{j}", F.lead("w0", j).over(win))
    return out.filter(F.col(f"w{n-1}").isNotNull()).select(
        "id", F.concat_ws(" ", *[f"w{j}" for j in range(n)]).alias("s")
    )


def perm_hash_exprs(s_col, k: int, hash_family: str = "xxhash64") -> list[Column]:
    """The k MinHash permutation hashes of a shingle column.

    - ``xxhash64`` (production): k native 64-bit hashes — the scale path.
    - ``md5``: 32-bit hashes carved from md5 hex, 4 per digest
      (h_p = int(md5(s + '#' + p//4)[8*(p%4) : 8*(p%4)+8], 16)) — every
      step (md5 / substring / hex-int) has an exact DuckDB twin, which is
      what lets the driver content-verify the LSH pipeline (VERDICT #1).
      32-bit permutation hashes keep min-collision probability ~n²/2³²
      per doc — negligible at document shingle counts.
    """
    c = F.col(s_col) if isinstance(s_col, str) else s_col
    if hash_family == "xxhash64":
        return [F.xxhash64(c, F.lit(i)).alias(f"h{i}") for i in range(k)]
    if hash_family == "md5":
        out = []
        for p in range(k):
            g, j = divmod(p, 4)
            hexpart = F.substring(
                F.md5(F.concat_ws("#", c, F.lit(str(g)))), 1 + 8 * j, 8
            )
            out.append(F.conv(hexpart, 16, 10).cast("long").alias(f"h{p}"))
        return out
    raise ValueError(f"unknown hash_family: {hash_family}")


def minhash_signatures_df(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", k: int = 64,
                          n_shingle: int = 3,
                          hash_family: str = "xxhash64") -> DataFrame:
    """(id, sig array<long>) via exploded shingles + k codegen'd hash
    columns + one grouped min (map-side combined)."""
    exploded = shingles_exploded(df, text_col, id_col, n_shingle)
    if hash_family == "md5":
        # stage the k/4 digests in their own projection so each md5 is
        # computed once and its 4 8-hex-char windows are carved in a second
        # projection; CollapseProject keeps non-cheap aliases referenced
        # more than once un-inlined, so the staged plan runs k/4 md5 calls
        # per shingle instead of relying on codegen subexpr elimination
        n_dig = (k + 3) // 4
        staged = exploded.select(
            "id",
            *[
                F.md5(F.concat_ws("#", F.col("s"), F.lit(str(g)))).alias(f"d{g}")
                for g in range(n_dig)
            ],
        )
        hashed = staged.select(
            "id",
            *[
                F.conv(F.substring(F.col(f"d{p // 4}"), 1 + 8 * (p % 4), 8), 16, 10)
                .cast("long")
                .alias(f"h{p}")
                for p in range(k)
            ],
        )
    else:
        hashed = exploded.select("id", *perm_hash_exprs("s", k, hash_family))
    mins = hashed.groupBy("id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(k)]
    )
    return mins.select("id", F.array(*[f"h{i}" for i in range(k)]).alias("sig"))


def lsh_bands(sig_col, bands: int = 16, rows: int = 4,
              hash_family: str = "xxhash64") -> Column:
    """Band hashes: band j = xxhash64(slice(sig, j*rows+1, rows), j); the
    md5 family hashes the comma-joined decimal signature slice + band id
    (string in, hex string out — DuckDB-replicable)."""
    c = F.col(sig_col) if isinstance(sig_col, str) else sig_col
    if hash_family == "xxhash64":
        return F.array(
            *[F.xxhash64(F.slice(c, j * rows + 1, rows), F.lit(j)) for j in range(bands)]
        )
    return F.array(
        *[
            F.md5(F.concat_ws(
                ",",
                *[F.element_at(c, j * rows + i + 1).cast("string") for i in range(rows)],
                F.lit(str(j)),
            ))
            for j in range(bands)
        ]
    )


def minhash_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n_shingle: int = 3, bands: int = 16, rows: int = 4,
    max_bucket_size: int = 200, hash_family: str = "xxhash64",
) -> DataFrame:
    """Candidate near-dup pairs (a < b) + estimated Jaccard from signatures.

    Plan shape (scale-aware):
    - signatures are computed once and kept in a slim (id, sig) table;
      the exploded band rows carry only (id, band_idx, band_hash) so the
      self-join shuffle moves 24 bytes/row, not k*8
    - degenerate buckets (> max_bucket_size ids) are dropped before the
      pair join — they are near-duplicate cliques that would blow up
      O(b^2); on a 10^10 corpus these are boilerplate pages that exact
      dedup already collapses, and every surviving pair is still found
      through its other (smaller) bands with high probability
    - pairs are distinct'd BEFORE re-joining signatures (two broadcastable
      hash joins on ids) so the expensive est computation runs once/pair
    """
    k = bands * rows
    sigs = minhash_signatures_df(
        df.select(F.col(id_col).alias(id_col), F.col(text_col).alias("__t")),
        "__t", id_col, k, n_shingle, hash_family,
    )
    bands_df = sigs.select(
        "id",
        F.posexplode(lsh_bands("sig", bands, rows, hash_family)).alias(
            "band_idx", "band_hash"),
    )
    ok_buckets = (
        bands_df.groupBy("band_idx", "band_hash")
        .agg(F.count("*").alias("_bsz"))
        .filter((F.col("_bsz") > 1) & (F.col("_bsz") <= max_bucket_size))
        .select("band_idx", "band_hash")
    )
    in_bucket = bands_df.join(ok_buckets, on=["band_idx", "band_hash"])
    a = in_bucket.select(F.col("id").alias("id_a"), "band_idx", "band_hash")
    b = in_bucket.select(F.col("id").alias("id_b"), "band_idx", "band_hash")
    pairs = (
        a.join(b, on=["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        ).cast("double") / F.lit(float(k))
    )
    return (
        pairs.join(sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")),
                   on="id_a")
        .join(sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")),
              on="id_b")
        .withColumn("est_jaccard", est)
        .select("id_a", "id_b", "est_jaccard")
    )


def minhash_near_dups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    threshold: float = 0.8, **kw,
) -> DataFrame:
    """Return df minus docs having a near-duplicate with a smaller id
    (greedy keep-first; deterministic)."""
    pairs = minhash_candidates(df, text_col, id_col, **kw)
    drop = (
        pairs.filter(F.col("est_jaccard") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.join(drop, on=id_col, how="left_anti")


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n_shingle: int = 3, bands: int = 16, rows: int = 4,
    max_bucket_size: int = 200, hash_family: str = "xxhash64",
) -> DataFrame:
    """Exact n-gram Jaccard for LSH candidate pairs (verification stage):
    |A ∩ B| / |A ∪ B| with array_intersect/array_union — native.
    ``hash_family='md5'`` makes the whole pipeline (candidates + exact
    verify) SQL-twin reproducible for the driver oracle."""
    cands = minhash_candidates(df, text_col, id_col, n_shingle, bands, rows,
                               max_bucket_size, hash_family)
    sh = (
        shingles_exploded(df, text_col, id_col, n_shingle)
        .groupBy("id").agg(F.collect_set("s").alias("sh"))
    )
    out = (
        cands.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"),
                   on="id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"),
              on="id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")),
        )
    )
    return out.select("id_a", "id_b", "est_jaccard", "jaccard")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              hash_family: str = "xxhash64") -> DataFrame:
    """64-bit SimHash: explode tokens, one groupBy with 64 ±1 bit sums,
    rebuild the fingerprint with bit ops — single shuffle, all native.

    ``hash_family='md5'`` is the 60-bit driver-oracle variant: the token
    hash is the first 15 md5 hex chars as an integer
    (DuckDB: ``('0x' || substring(md5(tok),1,15))::BIGINT``), so the
    whole fingerprint is recomputable in SQL (VERDICT #1). xxhash64
    stays the scale default (one JVM hash vs an md5 per token)."""
    n_bits = 64 if hash_family == "xxhash64" else 60
    if hash_family == "xxhash64":
        h = F.xxhash64("tok")
    elif hash_family == "md5":
        h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError(f"unknown hash_family: {hash_family}")
    toks = df.select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("tok")
    ).withColumn("h", h)
    sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{b}")
            for b in range(n_bits)
        ]
    )
    fp = None
    for b in range(n_bits):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return sums.select(F.col(id_col), fp.alias("simhash"))


def hamming64(a, b) -> Column:
    """Popcount of a XOR b via bit_count (native)."""
    x = (F.col(a) if isinstance(a, str) else a).bitwiseXOR(F.col(b) if isinstance(b, str) else b)
    return F.bit_count(x)


def simhash_near_dups(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: block on 4 x 16-bit chunks (any pair within
    hamming<=3 shares at least one identical chunk), verify exact hamming."""
    sh = simhash64(df, text_col, id_col)
    chunks = sh.select(
        id_col, "simhash",
        F.posexplode(
            F.array(*[
                F.shiftright(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF))
                for i in range(4)
            ])
        ).alias("chunk_idx", "chunk"),
    )
    a = chunks.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"),
                      "chunk_idx", "chunk")
    b = chunks.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"),
                      "chunk_idx", "chunk")
    return (
        a.join(b, on=["chunk_idx", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming64("sh_a", "sh_b"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup (see similarity.py for the ANN machinery)
# ---------------------------------------------------------------------------

def embedding_near_dups(df: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id", threshold: float = 0.95,
                        planes: int = 16, seed: int = 42,
                        dim: int | None = None,
                        hash_family: str = "rng") -> DataFrame:
    """Cosine near-dup pairs via random-hyperplane LSH bucketing + exact
    cosine verification on bucket-mates.

    hash_family='rng' (default) buckets with the numpy-matmul pandas UDF
    (`similarity.hyperplane_bucket`); 'md5' uses the md5-Rademacher
    native-expression twin (`hyperplane_bucket_md5`, requires ``dim``) so
    the ENTIRE chain — sign matrix, fixed-point projections, buckets,
    pair join, sequential-fold cosine, threshold — is recomputable by a
    SQL oracle with no goldens (the ann_topk_md5 pattern). Both share the
    same 100 TB shape: a slim bucket self-join, never all-pairs."""
    from .similarity import (cosine_expr, hyperplane_bucket,
                             hyperplane_bucket_md5)

    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if hash_family == "md5":
        if dim is None:
            raise ValueError("hash_family='md5' requires dim")
        bucketed = hyperplane_bucket_md5(base, "v", planes=planes,
                                         seed=seed, dim=dim)
    else:
        bucketed = hyperplane_bucket(base, "v", planes=planes, seed=seed,
                                     dim=dim)
    a = bucketed.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"),
                        F.col("bucket").alias("bucket_a"))
    b = bucketed.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"),
                        F.col("bucket").alias("bucket_b"))
    if hash_family == "md5":
        # native-expression buckets: a plain equi-key is fine (no UDF to
        # double-plan) and keeps the join broadcast/SMJ-eligible as-is
        joined = a.join(b, F.col("bucket_a") == F.col("bucket_b"))
    else:
        # eqNullSafe: a plain equi-key injects IsNotNull filters that make
        # the bucket UDF plan twice per side (see similarity.knn_join)
        joined = a.join(b, F.col("bucket_a").eqNullSafe(F.col("bucket_b")))
    return (
        joined
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cos_sim", cosine_expr("v_a", "v_b"))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


# ---------------------------------------------------------------------------
# cross-document line-level dedup (CCNet-style)
# ---------------------------------------------------------------------------

def line_dedup(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Cross-corpus line deduplication: every distinct (trimmed) line
    survives only at its global first occurrence — lowest ``id_col``, then
    lowest line position — and is dropped everywhere else, including later
    repeats inside the same document. Returns one row per document that
    keeps >= 1 line: (id, text with survivors rejoined in original order,
    n_lines, n_kept).

    CCNet-style paragraph/line dedup is the single highest-yield cleanup on
    web corpora (boilerplate nav/footer lines repeat across millions of
    pages). The reference has no content-level dedup at all (only URL seen,
    cache.py:110-136); this is the scale extension.

    Scale shape: posexplode (no shuffle) -> groupBy(line hash) min_by
    (ONE shuffle with map-side partial agg — skew-safe even for the empty
    line that appears in every document, unlike a window over the hash,
    whose hot partition would hold one row per corpus document) -> join
    survivors back on the hash (AQE skew-join splits the hot probe side)
    -> groupBy(id) to reassemble. Lines shuffle as (hash, id, pos) slim
    rows, never full text.
    """
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("_h", F.xxhash64(F.trim(F.col("line"))))
    first = lines.groupBy("_h").agg(
        F.min(F.struct("id", "pos")).alias("_first")
    )
    kept = lines.join(first, "_h").filter(
        (F.col("id") == F.col("_first.id")) & (F.col("pos") == F.col("_first.pos"))
    )
    n_lines = df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), "\n")).alias("n_lines"),
    )
    out = (
        kept.groupBy("id")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "line"))).alias("_ls"),
        )
        # small per-doc array post-aggregation: the interpreted HOF cost is
        # per-document, not per-line (cf. shingles_exploded's rationale)
        .select(
            "id",
            F.array_join(F.transform("_ls", lambda s: s["line"]), "\n").alias(text_col),
            F.size("_ls").alias("n_kept"),
        )
        .join(n_lines, "id")
        .select(F.col("id").alias(id_col), text_col, "n_lines", "n_kept")
    )
    return out


# ---------------------------------------------------------------------------
# benchmark contamination (n-gram overlap vs an eval set)
# ---------------------------------------------------------------------------

def ngram_contamination(df: DataFrame, bench_df: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        bench_text_col: str | None = None,
                        bench_id_col: str | None = None,
                        n: int = 8) -> DataFrame:
    """Per-document benchmark-contamination signal: the fraction of the
    document's DISTINCT word n-grams that also occur anywhere in
    ``bench_df`` (the eval/benchmark corpus). Docs with fewer than ``n``
    tokens have zero n-grams and score 0.0. Returns
    (id, n_ngrams, n_hits, contamination).

    Decontamination is a standard training-corpus step (the n-gram-overlap
    check popularized by GPT-3 appendix C / PaLM): any doc whose n-grams
    collide with an eval set is flagged before training.

    Scale shape: both sides shingle via the HOF-free explode+lead plan,
    reduce to DISTINCT 64-bit shingle hashes (slim), and equi-join on the
    hash. The benchmark side is an eval set — tiny vs the corpus — so it
    is broadcast after distinct; the corpus side never shuffles full
    shingle strings, only (id, hash). Aggregation is a map-side-combined
    groupBy(id).
    """
    bench_text_col = bench_text_col or text_col
    bench_id_col = bench_id_col or id_col
    doc_sh = (
        shingles_exploded(df, text_col, id_col, n)
        .select("id", F.xxhash64("s").alias("_h"))
        .distinct()
    )
    bench_sh = (
        shingles_exploded(bench_df, bench_text_col, bench_id_col, n)
        .select(F.xxhash64("s").alias("_h"))
        .distinct()
    )
    hit = doc_sh.join(
        F.broadcast(bench_sh).withColumn("_hit", F.lit(1)), "_h", "left"
    )
    scored = hit.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hits"),
    )
    # docs with < n tokens have no shingles — surface them with score 0.0
    # rather than dropping them from the corpus-wide signal
    all_ids = df.select(F.col(id_col).alias("id")).distinct()
    return (
        all_ids.join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits") / F.col("n_ngrams"), F.lit(0.0)), 6
            ).alias("contamination"),
        )
    )

# ---------------------------------------------------------------------------
# connected components over a near-dup pair graph (cluster assignment)
# ---------------------------------------------------------------------------

def connected_components(pairs: DataFrame, a_col: str = "id_a",
                         b_col: str = "id_b", max_iters: int = 25) -> DataFrame:
    """Assign every node in an undirected pair graph the MINIMUM node id of
    its connected component. Returns (node, cluster_id).

    This is the canonical step after LSH candidate generation: MinHash /
    SimHash / line-sharing emit PAIRS, but "keep one doc per duplicate
    group" needs the transitive closure (a~b, b~c => {a,b,c} is one group).
    The reference has no content-level dedup at all (SURVEY §2.2 is a URL
    seen-set, cache.py:110-136); this is the 100 TB extension.

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — converges in
    O(log d) rounds on the component diameter and, unlike naive min-label
    propagation, never materializes per-node neighbor arrays: each half-step
    is a skew-safe groupBy-min (map-side combine) plus an equi-join on the
    SAME key, so Catalyst reuses the exchange instead of reshuffling.
    Per-round lineage is cut with localCheckpoint (iterative plans otherwise
    grow exponentially). Convergence is detected by a (count, hash-xor)
    fingerprint of the edge set computed in the same action.
    """
    from .checkpoints import local_checkpoint_tracked, release_checkpoint

    spark = pairs.sparkSession
    e = (
        pairs.select(F.col(a_col).cast("long").alias("u"),
                     F.col(b_col).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    prev = None
    prev_ck_ids: set[int] = set()
    for _ in range(max_iters):
        # large-star: every neighbor v > u links to m = min(Γ(u) ∪ {u})
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("_mv"))
        mins = mins.select("u", F.least("_mv", F.col("u")).alias("m"))
        e = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star: orient u=max; every neighbor (and u) links to min(Γ(u))
        o = e.select(F.greatest("u", "v").alias("u"),
                     F.least("u", "v").alias("v")).distinct()
        mins = o.groupBy("u").agg(F.min("v").alias("m"))
        e, ck_ids = local_checkpoint_tracked(
            o.join(mins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select("u", F.col("m").alias("v")))
            .distinct()
        )
        # the new round is materialized — the previous round's checkpoint
        # blocks are dead weight from here on (long-lived sessions would
        # otherwise accumulate one round of MEMORY_AND_DISK blocks per call)
        release_checkpoint(spark, prev_ck_ids)
        prev_ck_ids = ck_ids
        # xor, not sum: order-independent, immune to ANSI long overflow, and
        # collision-safe here because the edge set is distinct
        fp = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).first()
        cur = (fp["n"], fp["h"])
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iters} rounds")
    # converged edge set is a star forest: u -> component min; roots map to
    # themselves
    return (
        e.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
        .union(e.select(F.col("v").alias("node"), F.col("v").alias("cluster_id")))
        .distinct()
    )


def line_share_clusters(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", min_len: int = 30,
                        max_docs_per_line: int = 200,
                        hash_family: str = "xxhash64") -> DataFrame:
    """Cluster documents that share any long (>= ``min_len`` chars, trimmed)
    line — the boilerplate/mirror-detection graph — and assign each doc its
    component-minimum ``cluster_id``. Returns every input doc as
    (doc_id, cluster_id, cluster_size, keep) where keep marks the one
    representative (lowest id) per cluster.

    Scale shape: lines posexplode (no shuffle) -> distinct slim
    (line-hash, id) rows -> per-hash doc count with a ``max_docs_per_line``
    cap (drops megaclique lines — a cookie banner shared by 10^8 pages
    would otherwise emit 10^16 pairs; same rationale as the LSH bucket cap,
    minhash_candidates) -> capped self-join emits pairs -> alternating-star
    connected components. Nothing ever shuffles line text, only 64-bit
    hashes and ids.

    ``hash_family='md5'`` carves the line hash from md5 hex (60 bits) so a
    DuckDB oracle can recompute the whole pipeline including the closure
    (via WITH RECURSIVE); production default stays xxhash64.
    """
    line = F.trim(F.col("line"))
    if hash_family == "md5":
        h = F.conv(F.substring(F.md5(line), 1, 15), 16, 10).cast("long")
    else:
        h = F.xxhash64(line)
    ld = (
        df.select(F.col(id_col).alias("id"),
                  F.explode(F.split(F.col(text_col), "\n")).alias("line"))
        .filter(F.length(line) >= min_len)
        .select(h.alias("_h"), "id")
        .distinct()
    )
    ok = ld.groupBy("_h").agg(F.count(F.lit(1)).alias("_n")).filter(
        (F.col("_n") >= 2) & (F.col("_n") <= max_docs_per_line)
    )
    capped = ld.join(ok.select("_h"), "_h")
    pairs = (
        capped.alias("a")
        .join(capped.alias("b"), "_h")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    labels = connected_components(pairs)
    out = (
        df.select(F.col(id_col).alias("node"))
        .join(labels, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("cluster_id", F.col("node")).alias("cluster_id"),
        )
    )
    sizes = out.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return out.join(sizes, "cluster_id").select(
        id_col, "cluster_id", "cluster_size",
        (F.col(id_col) == F.col("cluster_id")).alias("keep"),
    )


def select_representatives(assign: DataFrame, quality: DataFrame,
                           id_col: str = "doc_id",
                           cluster_col: str = "cluster_id",
                           quality_col: str = "quality") -> DataFrame:
    """Canonical-document selection: given a near-dup cluster assignment
    (``id, cluster``) and a per-document quality score, keep the
    highest-quality member of each cluster (ties break to the smallest
    id, so the choice is reproducible under any partitioning). This is
    the decision step the dedup tier feeds — the reference deletes
    arbitrary duplicates (its store upserts by URL id,
    /root/reference/worker.py:221-318); a training-corpus pipeline wants
    the BEST duplicate kept, not the first seen (cf. the quality-first
    keep rule in deduplication writeups like Lee et al. 2022 §3).

    Returns every input doc as (id, cluster, quality, rep_id, is_rep).

    Scale shape: one inner join on the id key (both sides unique on id —
    no skew), then ONE hash aggregate per cluster using
    ``min_by(id, struct(-quality, id))`` — an arg-min with full map-side
    partial combine, chosen over a row_number window because the window
    would sort every cluster's members while the agg forwards exactly one
    candidate row per cluster per map task. The rep table (one row per
    cluster) joins back on the cluster key; AQE broadcasts it when small.
    """
    j = assign.join(quality.select(id_col, quality_col), id_col)
    reps = j.groupBy(cluster_col).agg(
        F.min_by(F.col(id_col),
                 F.struct((-F.col(quality_col)).alias("_nq"),
                          F.col(id_col).alias("_id"))).alias("rep_id"))
    return j.join(reps, cluster_col).select(
        id_col, cluster_col, quality_col, "rep_id",
        (F.col(id_col) == F.col("rep_id")).alias("is_rep"),
    )


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3, w: int = 4,
                        hash_family: str = "xxhash64") -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every word ``k``-gram, slide a
    window of ``w`` consecutive gram hashes, keep each window's minimum.
    The selected set is a position-robust sketch with the paper's
    guarantee: any shared run of at least ``w + k - 1`` tokens between two
    documents yields at least one shared fingerprint — unlike MinHash
    (whole-doc similarity) this catches LOCAL overlap (quoted passages,
    boilerplate splices, partial mirrors), and unlike every-gram
    fingerprinting it keeps only ~2/(w+1) of the grams.

    Returns the exploded sketch ``(id, fp)``, distinct per doc.

    Scale shape: the gram hashing and window minima are ONE codegen'd
    projection per document (higher-order transform over sequence —
    O(m*w) comparisons per doc, all JVM, no shuffle); the only exchange
    is the final distinct on (id, fp). Docs shorter than ``w`` grams
    degrade to their single overall-min gram (the whole-doc degenerate
    that ``text_analysis.fingerprint`` uses); docs with no full gram emit
    nothing.

    ``hash_family='md5'`` (lexicographic hex min) lets a DuckDB oracle
    replay the identical chain; production default is xxhash64 (numeric
    min, 8-byte fps).
    """
    toks = F.split(F.col(text_col), " ")
    m = F.size(toks) - F.lit(k - 1)  # number of k-grams

    def gram_hash(i):
        joined = F.concat_ws(" ", F.slice(toks, i, k))
        if hash_family == "md5":
            return F.md5(joined)
        return F.xxhash64(joined)

    grams = F.transform(F.sequence(F.lit(1), m), gram_hash)
    n_win = m - F.lit(w - 1)
    window_mins = F.array_distinct(
        F.transform(F.sequence(F.lit(1), n_win),
                    lambda j: F.array_min(F.slice(grams, j, w))))
    fps = (
        F.when(m >= w, window_mins)
        .when(m >= 1, F.array(F.array_min(grams)))
        .otherwise(F.array().cast(
            "array<string>" if hash_family == "md5" else "array<long>"))
    )
    return (
        df.select(F.col(id_col), F.explode(fps).alias("fp"))
        .distinct()
    )


def winnow_pairs(fps: DataFrame, id_col: str = "doc_id",
                 min_shared: int = 2,
                 max_docs_per_fp: int = 200) -> DataFrame:
    """Candidate pairs from winnowing sketches: docs sharing >=
    ``min_shared`` fingerprints, with the standard megaclique cap (a
    fingerprint carried by more than ``max_docs_per_fp`` docs is
    boilerplate, not evidence — same rationale as the LSH bucket and
    line-share caps). Slim (fp, id) self-join -> pair count >= threshold;
    only hashes and ids ever shuffle."""
    ok = (fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_n"))
          .filter((F.col("_n") >= 2) & (F.col("_n") <= max_docs_per_fp))
          .select("fp"))
    slim = fps.join(ok, "fp")
    a = slim.select(F.col("fp"), F.col(id_col).alias("a"))
    b = slim.select(F.col("fp"), F.col(id_col).alias("b"))
    return (
        a.join(b, "fp")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_shared))
    )


# ---------------------------------------------------------------------------
# exact duplicated-substring spans (ExactSubstr-style)
# ---------------------------------------------------------------------------

def _gram_hash_expr(s_col, hash_family: str = "xxhash64") -> Column:
    """64-bit content hash of an n-gram string. ``xxhash64`` is the scale
    path; ``md5`` carves the first 15 hex chars (60 bits) so DuckDB can
    replay the identical value: ('0x' || substring(md5(s),1,15))::BIGINT."""
    c = F.col(s_col) if isinstance(s_col, str) else s_col
    if hash_family == "xxhash64":
        return F.xxhash64(c)
    if hash_family == "md5":
        return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hash_family: {hash_family}")


def duplicated_substring_spans(df: DataFrame, text_col: str = "text",
                               id_col: str = "doc_id", window: int = 5,
                               min_docs: int = 2,
                               hash_family: str = "xxhash64") -> DataFrame:
    """Exact duplicated-substring detection, the span-removal dedup of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499 — their ExactSubstr tool) re-expressed for
    Spark. Their single-node suffix array cannot shard; the equivalent
    distributed formulation hashes every length-``window`` token n-gram
    and calls an n-gram duplicated when its hash occurs in >= ``min_docs``
    DISTINCT documents. Overlapping/adjacent duplicated windows then merge
    into maximal removal spans in token coordinates — exactly the spans a
    trainer would cut (the paper removes the duplicated substring, not the
    whole document).

    Returns one row per merged span:
    ``(id_col, span_start, span_end, n_windows)`` with token-coordinate
    ``[span_start, span_end)`` half-open bounds.

    Scale shape (the part a suffix array can't give you):
    - gram stream: posexplode + ``window-1`` lead()s over (id, pos) — one
      per-doc window pass, no HOFs (the explode+lead plan measured ~10x
      faster than transform/slice lambdas for shingles, see
      shingles_exploded).
    - duplicated-hash set: groupBy(hash) count_distinct(id) — ONE corpus
      shuffle of slim (hash, id) rows with map-side partial aggregation.
    - hit join: shuffle equi-join back on hash (AQE handles skew; the
      duplicated set is proportional to duplicated content, so it is NOT
      assumed broadcastable at 100 TB).
    - span merge: lag + running-sum group ids over (id, pos) — windows are
      per-document, bounded by document length, never corpus-wide.

    A duplicated n-gram whose hash merely collides with another doc's
    different n-gram false-positives a window; at 64 bits (xxhash64) the
    corpus-level collision expectation is ~n^2/2^64 — negligible. The md5
    family keeps 60 bits for the same reason.
    """
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens_expr(text_col)).alias("pos", "w0"),
    )
    win = W.partitionBy("id").orderBy("pos")
    out = toks
    for j in range(1, window):
        out = out.withColumn(f"w{j}", F.lead("w0", j).over(win))
    grams = out.filter(F.col(f"w{window-1}").isNotNull()).select(
        "id", "pos",
        _gram_hash_expr(
            F.concat_ws(" ", *[f"w{j}" for j in range(window)]), hash_family
        ).alias("h"),
    )
    dup = (
        grams.groupBy("h")
        .agg(F.count_distinct("id").alias("_nd"))
        .filter(F.col("_nd") >= int(min_docs))
        .select("h")
    )
    hits = grams.join(dup, "h").select("id", "pos")
    mw = W.partitionBy("id").orderBy("pos")
    flagged = hits.withColumn(
        "_new",
        F.when(
            F.lag("pos").over(mw).isNull()
            | (F.col("pos") > F.lag("pos").over(mw) + window), 1
        ).otherwise(0),
    )
    grp = flagged.withColumn("_grp", F.sum("_new").over(mw))
    return (
        grp.groupBy("id", "_grp")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + window).cast("long").alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(F.col("id").alias(id_col), "span_start", "span_end",
                "n_windows")
    )


def substring_dup_stats(spans: DataFrame, docs: DataFrame,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Per-document duplicated-token totals from merged spans: spans are
    disjoint after the merge, so the duplicated token count is a plain sum
    of span lengths; frac is over the doc's whitespace token count. One
    slim aggregate + a broadcast-eligible join back to doc lengths."""
    per_doc = spans.groupBy(id_col).agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_tokens"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    lens = docs.select(
        F.col(id_col),
        F.size(tokens_expr(text_col)).cast("long").alias("n_tokens"),
    )
    return lens.join(per_doc, id_col, "left").select(
        id_col, "n_tokens",
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
    )


def duplicated_gram_counts(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", window: int = 5,
                           min_docs: int = 2,
                           hash_family: str = "xxhash64") -> DataFrame:
    """Per-document duplicated-n-gram counts — the gate form of
    duplicated_substring_spans (a curation funnel wants "is more than X%
    of this doc duplicated elsewhere", which needs counts, not merged
    span coordinates). Returns (id_col, n_grams, n_dup) with n_dup the
    number of this doc's ``window``-grams whose hash appears in >=
    ``min_docs`` distinct docs. Same plan skeleton: slim (hash,id) rows,
    one corpus shuffle, hit join, per-doc combine."""
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens_expr(text_col)).alias("pos", "w0"),
    )
    win = W.partitionBy("id").orderBy("pos")
    out = toks
    for j in range(1, window):
        out = out.withColumn(f"w{j}", F.lead("w0", j).over(win))
    grams = out.filter(F.col(f"w{window-1}").isNotNull()).select(
        "id",
        _gram_hash_expr(
            F.concat_ws(" ", *[f"w{j}" for j in range(window)]), hash_family
        ).alias("h"),
    )
    dup = (
        grams.groupBy("h")
        .agg(F.count_distinct("id").alias("_nd"))
        .filter(F.col("_nd") >= int(min_docs))
        .select("h", F.lit(1).alias("_isdup"))
    )
    return (
        grams.join(dup, "h", "left")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_grams"),
             F.sum(F.coalesce("_isdup", F.lit(0))).alias("n_dup"))
        .select(F.col("id").alias(id_col), "n_grams", "n_dup")
    )


# ---------------------------------------------------------------------------
# incremental SimHash dedup (new batch vs existing corpus)
# ---------------------------------------------------------------------------

def incremental_simhash_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    hash_family: str = "xxhash64",
    max_bucket: int = 1000,
) -> DataFrame:
    """Incremental near-dup gate: which docs of a NEW crawl ``batch`` are
    near-duplicates of an EXISTING ``corpus``? The operation a continuous
    crawl actually needs — re-deduping 100 TB on every wave is a full
    O(corpus) pass, while this is O(batch + matched buckets): in
    production the corpus side of the bucket join reads a precomputed
    (chunk, id, simhash) table (exactly what this function's first stage
    emits) partition-pruned to the batch's chunk values, so cost scales
    with the DELTA.

    Blocking: 4 chunks of 16 bits (xxhash64 family) or 15 bits (60-bit
    md5 oracle family) — any pair within hamming<=3 of a 4-chunk split
    agrees on >= 1 chunk (pigeonhole), same recall argument as
    :func:`simhash_near_dups`. Chunks matching more than ``max_bucket``
    CORPUS docs are dropped from candidate generation (the all-zero
    fingerprint of empty/near-empty docs and boilerplate-dominated
    chunks would otherwise quadratically explode the join) — the cap is
    part of the spec and replayed by the oracle.

    Returns one row per batch doc: ``(doc_id, simhash, is_dup, dup_of,
    hamming)`` with ``dup_of`` = the minimum matching corpus id at the
    minimum hamming distance (deterministic), NULL when ``is_dup`` is
    false.
    """
    n_bits = 64 if hash_family == "xxhash64" else 60
    chunk_bits = n_bits // 4
    mask = (1 << chunk_bits) - 1
    c_sig = simhash64(corpus, text_col, id_col, hash_family)
    b_sig = simhash64(batch, text_col, id_col, hash_family)

    def chunked(sig: DataFrame, side: str) -> DataFrame:
        return sig.select(
            F.col(id_col).alias(f"id_{side}"),
            F.col("simhash").alias(f"sh_{side}"),
            F.posexplode(
                F.array(*[
                    F.shiftright(F.col("simhash"), chunk_bits * i)
                    .bitwiseAND(F.lit(mask))
                    for i in range(4)
                ])
            ).alias("chunk_idx", "chunk"),
        )

    c_chunks = chunked(c_sig, "c")
    # hot-chunk cap, measured on the CORPUS side (the big side)
    ok = (c_chunks.groupBy("chunk_idx", "chunk")
          .agg(F.count(F.lit(1)).alias("_n"))
          .filter(F.col("_n") <= int(max_bucket))
          .select("chunk_idx", "chunk"))
    b_chunks = chunked(b_sig, "b")
    cand = (
        b_chunks.join(ok, ["chunk_idx", "chunk"])
        .join(c_chunks, ["chunk_idx", "chunk"])
        .select("id_b", "sh_b", "id_c", "sh_c")
        .dropDuplicates(["id_b", "id_c"])
        .withColumn("hamming", hamming64("sh_b", "sh_c"))
        .filter(F.col("hamming") <= int(max_hamming))
    )
    best = (
        cand.groupBy("id_b")
        .agg(F.min(F.struct("hamming", "id_c")).alias("_m"))
        .select(F.col("id_b"),
                F.col("_m.id_c").alias("dup_of"),
                F.col("_m.hamming").alias("hamming"))
    )
    return (
        b_sig.join(best, b_sig[id_col] == best["id_b"], "left")
        .select(
            F.col(id_col), F.col("simhash"),
            F.col("dup_of").isNotNull().alias("is_dup"),
            "dup_of", "hamming",
        )
    )


def incremental_simhash_oracle_sql(
    corpus_sql: str,
    batch_sql: str,
    max_hamming: int = 3,
    max_bucket: int = 1000,
    n_bits: int = 60,
) -> str:
    """DuckDB twin of :func:`incremental_simhash_dedup` (md5 family):
    recomputes both sides' fingerprints token-by-token, the 4-chunk
    blocking, the corpus-side bucket cap, the xor-popcount verify, and
    the (hamming, id)-minimum dup_of."""
    chunk_bits = n_bits // 4
    mask = (1 << chunk_bits) - 1
    sums = ", ".join(
        f"sum(CASE WHEN ((v >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(n_bits))
    fp = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN (1::BIGINT << {b}) ELSE 0::BIGINT END)"
        for b in range(n_bits))
    chunks = ", ".join(
        f"(simhash >> {chunk_bits * i}) & {mask}" for i in range(4))

    def sig_cte(src_sql: str, name: str) -> str:
        return f"""
{name}_t AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
  FROM ({src_sql})),
{name}_h AS (
  SELECT doc_id, ('0x' || substring(md5(tok), 1, 15))::BIGINT AS v
  FROM {name}_t),
{name}_s AS (SELECT doc_id, {sums} FROM {name}_h GROUP BY doc_id),
{name}_sig AS (SELECT doc_id, ({fp}) AS simhash FROM {name}_s),
{name}_ch AS (
  SELECT doc_id, simhash,
         unnest(generate_series(0, 3)) AS chunk_idx,
         unnest([{chunks}]) AS chunk
  FROM {name}_sig)"""

    return f"""
WITH {sig_cte(corpus_sql, 'c')},
{sig_cte(batch_sql, 'b').lstrip()},
ok AS (
  SELECT chunk_idx, chunk FROM c_ch GROUP BY chunk_idx, chunk
  HAVING count(*) <= {int(max_bucket)}),
cand AS (
  SELECT DISTINCT b.doc_id AS id_b, b.simhash AS sh_b,
                  c.doc_id AS id_c, c.simhash AS sh_c
  FROM b_ch b
  JOIN ok USING (chunk_idx, chunk)
  JOIN c_ch c USING (chunk_idx, chunk)),
ver AS (
  SELECT id_b, id_c, bit_count(xor(sh_b, sh_c)) AS hamming
  FROM cand WHERE bit_count(xor(sh_b, sh_c)) <= {int(max_hamming)}),
best AS (
  SELECT id_b, min(hamming) AS hamming FROM ver GROUP BY id_b),
pick AS (
  SELECT v.id_b, min(v.id_c) AS dup_of, b.hamming
  FROM ver v JOIN best b ON b.id_b = v.id_b AND b.hamming = v.hamming
  GROUP BY v.id_b, b.hamming)
SELECT s.doc_id, s.simhash,
       p.dup_of IS NOT NULL AS is_dup, p.dup_of, p.hamming
FROM b_sig s LEFT JOIN pick p ON p.id_b = s.doc_id"""


# ---------------------------------------------------------------------------
# mirror-host detection (Bharat & Broder 1999)
# ---------------------------------------------------------------------------

def mirror_hosts(
    pages: DataFrame,
    host_col: str = "host",
    fp_col: str = "content_fp",
    min_shared: int = 5,
    min_overlap_pct: int = 50,
    max_hosts_per_fp: int = 50,
) -> DataFrame:
    """Host-pair mirror detection from ``(host, content_fingerprint)``
    crawl evidence — Bharat & Broder's "mirror, mirror on the web"
    (WWW 1999) shingle-overlap test lifted to whole-page fingerprints: two
    hosts serving largely the same content set are mirrors (or
    scraper/proxy copies), and the crawler should fetch ONE of them and
    alias the other (the host-level big brother of DUST's param rules).

    Overlap score is the containment coefficient in integer percent:
    ``100 * |A ∩ B| DIV min(|A|, |B|)`` — containment (not Jaccard)
    deliberately, so a small mirror fully contained in a big host still
    scores 100. A pair ships when ``shared >= min_shared`` and the
    percent clears ``min_overlap_pct``.

    Scale shape: the pair generator joins the slim DISTINCT (fp, host)
    projection with itself ON fp — and fingerprints served by more than
    ``max_hosts_per_fp`` hosts are dropped first (empty pages, shared
    boilerplate, parked-domain templates would otherwise create a
    quadratic hot key; a fingerprint on 1000 hosts is boilerplate, not
    mirror evidence — documented cap, replayed by the oracle). Host
    sizes come from one map-side-combined groupBy; everything is
    integer.

    Returns ``(host_a, host_b, shared, n_a, n_b, overlap_pct)`` with
    host_a < host_b.
    """
    hf = pages.select(F.col(host_col).alias("host"),
                      F.col(fp_col).alias("fp")).distinct()
    sizes = hf.groupBy("host").agg(F.count(F.lit(1)).alias("n"))
    ok = (hf.groupBy("fp").agg(F.count(F.lit(1)).alias("_n"))
          .filter(F.col("_n") <= int(max_hosts_per_fp)).select("fp"))
    slim = hf.join(ok, "fp")
    a = slim.select(F.col("fp"), F.col("host").alias("host_a"))
    b = slim.select(F.col("fp"), F.col("host").alias("host_b"))
    pairs = (
        a.join(b, "fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .filter(F.col("shared") >= int(min_shared))
    )
    sa = sizes.select(F.col("host").alias("host_a"),
                      F.col("n").cast("long").alias("n_a"))
    sb = sizes.select(F.col("host").alias("host_b"),
                      F.col("n").cast("long").alias("n_b"))
    return (
        pairs.join(sa, "host_a").join(sb, "host_b")
        .withColumn("overlap_pct",
                    F.expr("(100 * shared) DIV least(n_a, n_b)").cast("int"))
        .filter(F.col("overlap_pct") >= int(min_overlap_pct))
        .select("host_a", "host_b", "shared", "n_a", "n_b", "overlap_pct")
    )


def mirror_hosts_oracle_sql(
    pages_sql: str,
    min_shared: int = 5,
    min_overlap_pct: int = 50,
    max_hosts_per_fp: int = 50,
) -> str:
    """DuckDB twin of :func:`mirror_hosts` — identical distinct
    projection, hot-fingerprint cap, pair counts, and integer containment
    percent."""
    return f"""
WITH hf AS (
  SELECT DISTINCT host, content_fp AS fp FROM ({pages_sql})),
sizes AS (SELECT host, count(*)::BIGINT AS n FROM hf GROUP BY host),
ok AS (
  SELECT fp FROM hf GROUP BY fp
  HAVING count(*) <= {int(max_hosts_per_fp)}),
slim AS (SELECT hf.* FROM hf JOIN ok USING (fp)),
pairs AS (
  SELECT a.host AS host_a, b.host AS host_b, count(*)::BIGINT AS shared
  FROM slim a JOIN slim b ON a.fp = b.fp AND a.host < b.host
  GROUP BY 1, 2
  HAVING count(*) >= {int(min_shared)})
SELECT p.host_a, p.host_b, p.shared, sa.n AS n_a, sb.n AS n_b,
       ((100 * p.shared) // least(sa.n, sb.n))::INT AS overlap_pct
FROM pairs p
JOIN sizes sa ON sa.host = p.host_a
JOIN sizes sb ON sb.host = p.host_b
WHERE (100 * p.shared) // least(sa.n, sb.n) >= {int(min_overlap_pct)}"""


def ngram_containment_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n_shingle: int = 3, bands: int = 16, rows: int = 4,
    max_bucket_size: int = 200, hash_family: str = "xxhash64",
) -> DataFrame:
    """Exact n-gram CONTAINMENT for LSH candidate pairs — the asymmetric
    companion to :func:`ngram_jaccard_pairs`: ``C(A,B) = |A∩B| / |A|``
    (Broder's resemblance-vs-containment distinction, SEQUENCES 1997).
    Jaccard misses inclusions — a tweet quoted inside an article scores
    near-zero Jaccard but containment ~1 from the tweet's side — so
    quotation/inclusion detection, boilerplate-envelope discovery, and
    "is this doc a superset of that one" all key on containment.

    Integer end-to-end: shingle sets are exact, the three counts are
    ints, and both directions ship as ppm (1e6 * common DIV size) — no
    float division, engine-replayable. Same candidate generator and
    bucket caps as the minhash pipeline (md5 family = oracle twin).

    Returns ``(id_a, id_b, n_common, n_a, n_b, containment_a_ppm,
    containment_b_ppm)``.
    """
    cands = minhash_candidates(df, text_col, id_col, n_shingle, bands, rows,
                               max_bucket_size, hash_family)
    sh = (
        shingles_exploded(df, text_col, id_col, n_shingle)
        .groupBy("id").agg(F.collect_set("s").alias("sh"))
    )
    return (
        cands.select("id_a", "id_b")
        .join(sh.withColumnRenamed("id", "id_a")
              .withColumnRenamed("sh", "sh_a"), on="id_a")
        .join(sh.withColumnRenamed("id", "id_b")
              .withColumnRenamed("sh", "sh_b"), on="id_b")
        .withColumn("n_common",
                    F.size(F.array_intersect("sh_a", "sh_b")).cast("long"))
        .withColumn("n_a", F.size("sh_a").cast("long"))
        .withColumn("n_b", F.size("sh_b").cast("long"))
        .select(
            "id_a", "id_b", "n_common", "n_a", "n_b",
            F.expr("(1000000 * n_common) DIV n_a").cast("long")
            .alias("containment_a_ppm"),
            F.expr("(1000000 * n_common) DIV n_b").cast("long")
            .alias("containment_b_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# content-defined chunking (CDC) dedup
# ---------------------------------------------------------------------------

def cdc_chunks(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", modulus: int = 16,
               hash_family: str = "xxhash64") -> DataFrame:
    """Word-level content-defined chunking — the storage-dedup idea
    (Rabin/LBFS, Muthitacharoen et al. SOSP'01) applied to text: a chunk
    boundary falls AFTER every token whose hash ≡ 0 (mod ``modulus``),
    so boundaries are determined by CONTENT, not position — insert a
    paragraph into a 100-page document and only the chunks overlapping
    the edit change, where fixed-size chunking would shift-invalidate
    everything downstream. This is the mechanism that makes chunk-level
    dedup robust to boilerplate injection and partial edits, and the
    natural unit between line-dedup (too fine for prose) and whole-doc
    near-dup (too coarse for long docs).

    Fully native: tokens posexplode, a boundary flag, ONE per-doc
    cumulative window (the count of boundaries strictly BEFORE each
    token is its chunk ordinal), then a groupBy rebuilding each chunk's
    text in token order via sort_array(collect_list(struct(pos, tok)))
    and hashing it in the selected family. Expected chunk length =
    ``modulus`` tokens.

    Returns ``(doc_id, chunk_idx, n_tokens, chunk_hash)``.
    """
    if hash_family == "xxhash64":
        th = F.xxhash64("tok")
        ch = F.xxhash64("chunk_text")
    elif hash_family == "md5":
        th = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10) \
            .cast("long")
        ch = F.conv(F.substring(F.md5(F.col("chunk_text")), 1, 15), 16, 10) \
            .cast("long")
    else:
        raise ValueError(f"unknown hash_family: {hash_family}")
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens_expr(text_col)).alias("pos", "tok"),
    ).withColumn("bnd", (F.pmod(th, F.lit(int(modulus))) == 0).cast("long"))
    w = (W.partitionBy(id_col).orderBy("pos")
         .rowsBetween(W.unboundedPreceding, -1))
    chunked = toks.withColumn(
        "chunk_idx", F.coalesce(F.sum("bnd").over(w), F.lit(0))
        .cast("long"))
    return (
        chunked.groupBy(id_col, "chunk_idx")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
             F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct(F.col("pos"), F.col("tok")))),
                     lambda s: s["tok"]), " ").alias("chunk_text"))
        .select(F.col(id_col), "chunk_idx", "n_tokens",
                ch.alias("chunk_hash"))
    )


def cdc_dedup_stats(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", modulus: int = 16,
                    hash_family: str = "xxhash64") -> DataFrame:
    """Per-doc CDC dedup statistics: how much of each document is made of
    chunks that also occur in OTHER documents? ``shared_chunks`` counts
    this doc's chunks whose hash appears in >= 2 distinct docs,
    ``dup_token_ppm`` is the token-weighted share. The chunk-hash global
    table is one map-side-combined groupBy (slim (hash, n_docs) rows);
    rejoining it is a hash join on the 64-bit chunk hash.

    Returns ``(doc_id, n_chunks, n_tokens, shared_chunks, dup_token_ppm)``.
    """
    chunks = cdc_chunks(df, text_col, id_col, modulus, hash_family)
    global_ = (
        chunks.groupBy("chunk_hash")
        .agg(F.countDistinct(id_col).alias("_docs"))
    )
    j = chunks.join(global_, "chunk_hash")
    return (
        j.groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_chunks"),
             F.sum("n_tokens").cast("long").alias("n_tokens"),
             F.sum(F.when(F.col("_docs") >= 2, 1).otherwise(0))
             .cast("long").alias("shared_chunks"),
             F.sum(F.when(F.col("_docs") >= 2, F.col("n_tokens"))
                   .otherwise(0)).cast("long").alias("_duptok"))
        .withColumn("dup_token_ppm",
                    F.expr("(1000000 * _duptok) DIV n_tokens").cast("long"))
        .drop("_duptok")
    )


def cdc_dedup_oracle_sql(docs_sql: str, modulus: int = 16) -> str:
    """DuckDB twin of :func:`cdc_dedup_stats` (md5 family) — identical
    tokenization, boundary rule, strictly-before cumulative chunk
    ordinal, ordered chunk-text rebuild, and integer ppm."""
    m = int(modulus)
    return rf"""
WITH warr AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(text)), '\s+') AS w
  FROM ({docs_sql})),
idx AS (
  SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i FROM warr),
toks AS (
  SELECT doc_id, i - 1 AS pos, w[i] AS tok FROM idx),
flags AS (
  SELECT *, CASE WHEN ('0x' || substring(md5(tok), 1, 15))::BIGINT
                      % {m} = 0 THEN 1 ELSE 0 END AS bnd
  FROM toks),
chunked AS (
  SELECT *, coalesce(sum(bnd) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0)::BIGINT AS chunk_idx
  FROM flags),
chunks AS (
  SELECT doc_id, chunk_idx, count(*)::BIGINT AS n_tokens,
         ('0x' || substring(md5(string_agg(tok, ' ' ORDER BY pos)),
                            1, 15))::BIGINT AS chunk_hash
  FROM chunked GROUP BY doc_id, chunk_idx),
g AS (
  SELECT chunk_hash, count(DISTINCT doc_id) AS _docs
  FROM chunks GROUP BY chunk_hash)
SELECT c.doc_id, count(*)::BIGINT AS n_chunks,
       sum(c.n_tokens)::BIGINT AS n_tokens,
       sum(CASE WHEN g._docs >= 2 THEN 1 ELSE 0 END)::BIGINT
         AS shared_chunks,
       ((1000000 * sum(CASE WHEN g._docs >= 2 THEN c.n_tokens
                            ELSE 0 END)) // sum(c.n_tokens))::BIGINT
         AS dup_token_ppm
FROM chunks c JOIN g USING (chunk_hash)
GROUP BY c.doc_id"""
