"""Corpus-level analytics for training-data builds: per-source salient
terms (TF-IDF) and context-window sequence packing. All native expressions
and windows — zero Python, every number integer-or-IEEE-exact so a DuckDB
oracle reproduces results bit-for-bit.

The reference has per-document word counts only (utils/helpers word_count,
SURVEY §2.5); corpus-level term statistics and packing are the
training-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def tf_idf_top_terms(df: DataFrame, text_col: str = "text",
                     group_col: str = "source", k: int = 10,
                     idf_mode: str = "ratio") -> DataFrame:
    """Top-k salient terms per group: tf(term, group) weighted by inverse
    group frequency. Returns (group, term, tf, df, score, rank), rank<=k.

    ``idf_mode='ratio'`` scores tf * (N+1)/(df+1) — multiplication and
    division are IEEE-defined, so Spark and any oracle engine produce the
    IDENTICAL double and the rank order cannot diverge. ``'log'`` uses the
    textbook ln((N+1)/(df+1))+1 (transcendentals differ in the last ulp
    across math libs, so 'log' is the production choice and 'ratio' the
    oracle-exact one).

    Scale shape: tokenization explodes shuffle-free; term counts are ONE
    map-side-combined groupBy(group, term); document frequency reuses the
    same aggregate (no second scan); ranking is a per-group window whose
    WindowGroupLimit pushes the top-k below the exchange (only ~k rows per
    group per map task shuffle). Ties break on term ascending —
    deterministic output.
    """
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("tf"))
    # scalar N as a broadcast 1-row cross join: stays lazy (one job total)
    # instead of an eager .count() action on the driver
    ng = df.agg(F.countDistinct(group_col).alias("_n"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "term").crossJoin(F.broadcast(ng))
    num = (F.col("_n") + F.lit(1)).cast("double")
    den = (F.col("df") + F.lit(1)).cast("double")
    if idf_mode == "ratio":
        idf = num / den
    elif idf_mode == "log":
        idf = F.log(num / den) + F.lit(1.0)
    else:
        raise ValueError(f"unknown idf_mode: {idf_mode}")
    scored = scored.withColumn("score", F.col("tf").cast("double") * idf)
    w = Window.partitionBy("grp").orderBy(
        F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("grp").alias(group_col), "term", "tf", "df",
                "score", "rank")
    )


def pack_sequences(df: DataFrame, tokens_col: str, capacity: int,
                   order_col: str = "doc_id",
                   by_col: str | None = None) -> DataFrame:
    """GPT-style concat-then-chunk packing: documents are concatenated in
    ``order_col`` order (per ``by_col`` stream if given) and the token
    stream is cut every ``capacity`` tokens. Returns every input row plus
    (seq_id, seq_offset, end_seq_id, spans_boundary): which training
    sequence the document starts in, at what offset, where it ends, and
    whether it straddles a cut.

    This is how pretraining corpora are actually batched (documents packed
    back-to-back, loss-masked at boundaries); the operator makes the
    batch geometry a queryable column so mixture builders can audit
    boundary waste per source.

    One window exchange (the running sum per stream); everything else is
    codegen'd integer arithmetic — exact on any engine, so the oracle
    recomputes it with the same SQL window.
    """
    part = [by_col] if by_col else []
    w = (
        Window.partitionBy(*part).orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    out = df.withColumn("_cum0", cum_before)
    cap = int(capacity)
    # integer DIV/pmod end-to-end (Spark `/` on longs is DOUBLE division,
    # which loses exactness past 2^53 cumulative tokens — the oracle's
    # DuckDB `//` is integer, so the engines must share the arithmetic)
    last_tok = F.col("_cum0") + F.greatest(F.col(tokens_col), F.lit(1)) - F.lit(1)
    return (
        out.withColumn("_last", last_tok.cast("long"))
        .withColumn("seq_id", F.expr(f"_cum0 DIV {cap}"))
        .withColumn("seq_offset", F.expr(f"pmod(_cum0, {cap})").cast("long"))
        .withColumn("end_seq_id", F.expr(f"_last DIV {cap}"))
        .withColumn("spans_boundary", F.col("end_seq_id") > F.col("seq_id"))
        .drop("_cum0", "_last")
    )


def interleave_pack(spans: DataFrame, capacity: int, media_cost: int = 64,
                    stream_col: str | None = None,
                    id_col: str = "doc_id", idx_col: str = "span_idx",
                    kind_col: str = "kind",
                    text_col: str = "text") -> DataFrame:
    """Pack INTERLEAVED text+media spans into training sequences — the
    multimodal extension of :func:`pack_sequences` for the north rule's
    interleaved documents table (doc_id, spans<kind,text,media_ref,offset>).

    This is how interleaved pretraining corpora (MMC4/OBELICS-style) are
    batched: text spans cost their token estimate, each media span costs a
    fixed placeholder budget (``media_cost`` tokens — the slot the vision
    encoder's embeddings occupy), and the mixed stream is concatenated in
    document order and cut every ``capacity`` tokens. Emits the same batch
    geometry columns as pack_sequences (seq_id / seq_offset / end_seq_id /
    spans_boundary) plus the per-span ``cost``, so mixture builders can
    audit how much context-window budget media placeholders consume.

    ``stream_col`` shards the packing into independent streams (one per
    worker in a real batching job) — without it the running-sum window is
    a single global ordering, fine for audits, wrong for 100 TB. Span
    order within a stream is (id_col, idx_col) via a fixed-width composite
    key, exact on any engine. All arithmetic is integer; the only float
    would be in a token *estimator*, and word_count is an integer regex
    count — so a SQL oracle reproduces every value bit-for-bit.
    """
    from ..functions.text import word_count

    cost = F.when(
        F.col(kind_col) == "text",
        F.greatest(word_count(F.col(text_col)), F.lit(1)),
    ).otherwise(F.lit(int(media_cost))).cast("long")
    ord_key = F.concat(
        F.col(id_col).cast("string"), F.lit("#"),
        F.lpad(F.col(idx_col).cast("string"), 6, "0"),
    )
    df = spans.withColumn("cost", cost).withColumn("_ord", ord_key)
    out = pack_sequences(df, tokens_col="cost", capacity=capacity,
                         order_col="_ord", by_col=stream_col)
    return out.drop("_ord")


def inverted_index(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", max_postings: int = 1000,
                   min_token_len: int = 1) -> DataFrame:
    """Build a positional inverted index: one row per term with document
    frequency and a delta-encoded posting list — the search-index
    artifact a crawled corpus ultimately feeds (Lucene/ES posting-list
    layout, gap-encoded for compression).

    Output: ``(term, doc_freq, n_postings, postings)`` where postings is
    the flat (doc_id, pos) stream ordered by (doc_id, pos) and
    gap-encoded: each element is ``struct(doc_gap, pos)`` with doc_gap
    the delta from the previous posting's doc_id (first = doc_id itself)
    — the classic layout where long runs in one doc cost 0-gaps.

    Skew: a stopword's posting list is the whole corpus; materializing it
    with collect_list would sink one task. Postings are therefore CAPPED
    at ``max_postings`` via row_number <= k, which Spark plans as
    WindowGroupLimit — per-partition top-k heaps run BEFORE the shuffle,
    so the hot term's rows are pruned map-side and never concentrate.
    doc_freq is computed exactly (it aggregates, never materializes) so
    the cap is visible: n_postings < doc-frequency-weighted total means
    the list was truncated (block-sharded continuation lists are the
    production extension; the cap keeps this single-table layout
    shuffle-safe).

    Delta encoding is a per-term transform over the capped, sorted
    array — pure codegen'd HOFs over <= max_postings elements."""
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
        .alias("pos", "term"),
    ).filter(F.length("term") >= int(min_token_len))
    win = W.partitionBy("term").orderBy("doc", "pos")
    capped = (
        toks.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= int(max_postings))
    )
    per_term = capped.groupBy("term").agg(
        F.sort_array(F.collect_list(F.struct("doc", "pos"))).alias("_ps"),
    )
    exact_df = toks.groupBy("term").agg(
        F.count_distinct("doc").alias("doc_freq"),
        F.count(F.lit(1)).alias("total_occurrences"),
    )
    gaps = F.transform(
        "_ps",
        lambda p, i: F.struct(
            F.when(i == 0, p["doc"])
            .otherwise(p["doc"] - F.element_at(F.col("_ps"), i)["doc"])
            .alias("doc_gap"),
            p["pos"].alias("pos"),
        ),
    )
    return (
        per_term.join(exact_df, "term")
        .select(
            "term", "doc_freq", "total_occurrences",
            F.size("_ps").alias("n_postings"),
            gaps.alias("postings"),
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1_num: int = 6,
    k1_den: int = 5,
    b_num: int = 3,
    b_den: int = 4,
    scale: int = 1_000_000,
    min_token_len: int = 1,
) -> DataFrame:
    """BM25 relevance scoring (Robertson & Zaragoza 2009, the Lucene
    ``(N+1)/(df+0.5)`` idf variant) of every document against a fixed
    query-term set — the ranking function the inverted-index artifact
    exists to serve, and the standard "query-relevant subset" selector
    when curating a training corpus around a topic.

    Engine-exact arithmetic: k1 and b are exact rationals
    (default 6/5 = 1.2, 3/4 = 0.75), so the tf saturation term reduces to
    a ratio of two exact BIGINTs::

        tf_part = (k1d + k1n) * bd * T * tf
                  / (k1d*bd*T*tf + k1n*(bd-bn)*T + k1n*bn*dl*N)

    (T = total corpus tokens, N = docs, dl = doc length) — ONE IEEE
    double division per (doc, term). idf likewise collapses to
    ``ln((2N+2) / (2df+1))`` — one division, one ln. Their product is
    quantized to ``floor(score * scale)`` fixed point BEFORE the per-doc
    sum, so the reduction over query terms is exact integer arithmetic
    under any partitioning (the lm_score discipline).

    Scale shape: tokenization is a narrow explode; tf/df/dl are
    map-side-combined aggregates; the per-(doc,term) score row set is
    bounded by |query| * |docs|; corpus scalars (N, T) and the per-term
    df ride in on broadcast joins — no windows, no Python.

    Returns ``(doc_id, n_matched, score_fp)`` for docs matching >= 1
    query term, score_fp = BIGINT fixed-point BM25 * scale.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
        .alias("term"),
    ).filter(F.length("term") >= int(min_token_len))
    dl = toks.groupBy("doc").agg(F.count(F.lit(1)).alias("dl"))
    q = [str(t) for t in query_terms]
    qtoks = toks.filter(F.col("term").isin(q))
    tf = qtoks.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = qtoks.groupBy("term").agg(
        F.count_distinct("doc").alias("df"))
    stats = toks.agg(
        F.count_distinct("doc").alias("n_docs"),
        F.count(F.lit(1)).alias("total_toks"),
    )
    kd, kn, bd, bn = int(k1_den), int(k1_num), int(b_den), int(b_num)
    num = f"{(kd + kn) * bd} * total_toks * tf"
    den = (f"{kd * bd} * total_toks * tf + {kn * (bd - bn)} * total_toks"
           f" + {kn * bn} * dl * n_docs")
    idf = "ln(CAST(2 * n_docs + 2 AS DOUBLE) / CAST(2 * df + 1 AS DOUBLE))"
    term_fp = (f"CAST(floor(({idf}) * (CAST({num} AS DOUBLE)"
               f" / CAST({den} AS DOUBLE)) * {int(scale)}) AS BIGINT)")
    scored = (
        tf.join(dl, "doc")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(F.col("doc"), F.expr(term_fp).alias("fp"))
    )
    return (
        scored.groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_matched"),
             F.sum("fp").cast("long").alias("score_fp"))
        .select(F.col("doc").alias(id_col), "n_matched", "score_fp")
    )


def bm25_oracle_sql(
    docs_sql: str,
    query_terms: list[str],
    k1_num: int = 6,
    k1_den: int = 5,
    b_num: int = 3,
    b_den: int = 4,
    scale: int = 1_000_000,
    min_token_len: int = 1,
) -> str:
    """DuckDB twin of :func:`bm25_scores`: identical tokenization
    (regexp split on whitespace of lower(trim(text))), identical exact
    integer numerator/denominator, the same single-division +
    single-ln double chain, same floor quantization before the integer
    sum. ``docs_sql`` must yield (doc_id, text). Ends in a SELECT with
    no ORDER BY."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    qlist = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    kd, kn, bd, bn = int(k1_den), int(k1_num), int(b_den), int(b_num)
    num = f"{(kd + kn) * bd} * total_toks * tf"
    den = (f"{kd * bd} * total_toks * tf + {kn * (bd - bn)} * total_toks"
           f" + {kn * bn} * dl * n_docs")
    idf = "ln(CAST(2 * n_docs + 2 AS DOUBLE) / CAST(2 * df + 1 AS DOUBLE))"
    term_fp = (f"CAST(floor(({idf}) * (CAST({num} AS DOUBLE)"
               f" / CAST({den} AS DOUBLE)) * {int(scale)}) AS BIGINT)")
    return f"""WITH src AS ({docs_sql}),
toks AS (
  SELECT doc_id AS doc,
         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
  FROM src
),
ftoks AS (SELECT doc, term FROM toks
          WHERE length(term) >= {int(min_token_len)}),
dl AS (SELECT doc, count(*)::BIGINT AS dl FROM ftoks GROUP BY doc),
qtoks AS (SELECT doc, term FROM ftoks WHERE term IN ({qlist})),
tf AS (SELECT doc, term, count(*)::BIGINT AS tf
       FROM qtoks GROUP BY doc, term),
dfreq AS (SELECT term, count(DISTINCT doc)::BIGINT AS df
          FROM qtoks GROUP BY term),
stats AS (SELECT count(DISTINCT doc)::BIGINT AS n_docs,
                 count(*)::BIGINT AS total_toks FROM ftoks),
scored AS (
  SELECT tf.doc, {term_fp} AS fp
  FROM tf JOIN dl USING (doc) JOIN dfreq USING (term), stats
)
SELECT doc AS doc_id, count(*) AS n_matched,
       CAST(sum(fp) AS BIGINT) AS score_fp
FROM scored GROUP BY doc"""


# ---------------------------------------------------------------------------
# per-domain share cap (C4 / RefinedWeb-style diversity control)
# ---------------------------------------------------------------------------

def domain_cap(
    docs: DataFrame,
    cap_ppm: int,
    host_col: str = "host",
    tokens_col: str = "tokens",
    quality_col: str = "quality_fp",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain token-share cap — the corpus diversity control every
    web-scale training set applies (C4 and RefinedWeb cap any single
    registered domain's contribution so Wikipedia mirrors and SEO farms
    can't dominate the mixture): no host may contribute more than
    ``cap_ppm`` parts-per-million of the corpus' total tokens, and when a
    host overflows, its LOWEST-quality docs are dropped first.

    Exact integer protocol: ``cap_tokens = (total_tokens * cap_ppm) DIV
    1e6`` (one tiny agg broadcast back); within each host docs are
    ranked ``(quality DESC, doc_id ASC)`` and kept while the
    cumulative-inclusive token count stays ``<= cap_tokens`` — a strict
    prefix rule, so the decision for every doc is reproducible from the
    (host-local) ordering alone under any partitioning.

    Scale shape: ONE per-host window over the slim (host, tokens,
    quality, id) projection + one scalar aggregate joined via broadcast
    — no global ordering anywhere. Returns the input columns plus
    ``cum_tokens, cap_tokens, keep``.
    """
    tot = docs.agg(F.sum(tokens_col).cast("long").alias("_total"))
    cap_expr = F.expr(f"(_total * {int(cap_ppm)}) DIV 1000000")
    w = (
        Window.partitionBy(host_col)
        .orderBy(F.col(quality_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.crossJoin(F.broadcast(tot))
        .withColumn("cap_tokens", cap_expr.cast("long"))
        .withColumn("cum_tokens",
                    F.sum(tokens_col).over(w).cast("long"))
        .withColumn("keep", F.col("cum_tokens") <= F.col("cap_tokens"))
        .drop("_total")
    )


def domain_cap_oracle_sql(docs_sql: str, cap_ppm: int) -> str:
    """DuckDB twin of :func:`domain_cap` — same integer cap derivation
    and the same (quality DESC, doc_id) cumulative prefix rule."""
    return f"""
WITH d AS ({docs_sql}),
tot AS (SELECT sum(tokens)::BIGINT AS _total FROM d),
ranked AS (
  SELECT d.*, ((tot._total * {int(cap_ppm)}) // 1000000)::BIGINT
           AS cap_tokens,
         sum(tokens) OVER (PARTITION BY host
                           ORDER BY quality_fp DESC, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                          )::BIGINT AS cum_tokens
  FROM d, tot)
SELECT *, cum_tokens <= cap_tokens AS keep
FROM ranked"""


# ---------------------------------------------------------------------------
# token-budget corpus selection (histogram-threshold, no global sort)
# ---------------------------------------------------------------------------

def budget_select(
    docs: DataFrame,
    budget_tokens: int,
    bin_width: int = 10_000,
    tokens_col: str = "tokens",
    quality_col: str = "quality_fp",
    id_col: str = "doc_id",
) -> DataFrame:
    """Select the highest-quality docs whose tokens fit a global budget —
    the "take the best N tokens" curation step — WITHOUT a global sort.
    A naive top-k orders the whole corpus by quality (one
    all-data-on-one-ordering exchange, the classic 100 TB scale killer);
    this is the histogram-threshold form: quantize quality into
    ``quality_fp DIV bin_width`` bins, aggregate (tokens, count) per bin
    (map-side combined, bins are bounded), find the threshold bin where
    the budget crosses via a window over the TINY bin table, take every
    doc ABOVE the threshold outright, and order only WITHIN the single
    boundary bin to fill what remains — the per-row decision everywhere
    else is a broadcast integer comparison.

    Exact integer protocol: docs in bins strictly above ``thr_bin`` are
    kept; the remaining budget ``rem = budget - tokens_above`` fills the
    boundary bin in ``(quality DESC, doc_id ASC)`` order under the same
    cumulative-inclusive ``<= rem`` prefix rule as :func:`domain_cap`.
    Ties and boundaries are thus fully deterministic, and the single
    window only ever sees ONE bin's rows (bounded by corpus/bins under
    any non-adversarial quality distribution; pick ``bin_width`` so a
    bin's tokens ~ budget/100).

    Returns the input columns plus ``bin, tier ('full'|'boundary'|NULL),
    keep``.
    """
    b = F.expr(f"{quality_col} DIV {int(bin_width)}")
    binned = docs.withColumn("bin", b.cast("long"))
    per_bin = binned.groupBy("bin").agg(
        F.sum(tokens_col).cast("long").alias("_bt"))
    wb = (Window.orderBy(F.col("bin").desc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    bins = per_bin.withColumn("_cum", F.sum("_bt").over(wb).cast("long"))
    # threshold bin: the HIGHEST bin whose cumulative-from-top EXCEEDS the
    # budget — the first crossing walking down from the top, so every bin
    # above it fits entirely; if none exceeds, all fit
    thr = bins.agg(
        F.max(F.when(F.col("_cum") > int(budget_tokens), F.col("bin")))
        .alias("_thr"),
        F.coalesce(
            F.max(F.when(F.col("_cum") <= int(budget_tokens), F.col("_cum"))),
            F.lit(0)).cast("long").alias("_above"),
    )
    wq = (
        Window.partitionBy("bin")
        .orderBy(F.col(quality_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tiered = (
        binned.crossJoin(F.broadcast(thr))
        .withColumn(
            "tier",
            F.when(F.col("_thr").isNull() | (F.col("bin") > F.col("_thr")),
                   F.lit("full"))
            .when(F.col("bin") == F.col("_thr"), F.lit("boundary")))
    )
    # FILTER to the boundary bin BEFORE the window: the ordered exchange
    # then moves only ~corpus/n_bins rows — masking the window's output
    # with a CASE would still shuffle+sort the whole corpus
    boundary = (
        tiered.filter(F.col("tier") == F.lit("boundary"))
        .withColumn("_cumq", F.sum(tokens_col).over(wq).cast("long"))
    )
    rest = (
        tiered.filter(F.coalesce(F.col("tier"), F.lit("")) != "boundary")
        .withColumn("_cumq", F.lit(None).cast("long"))
    )
    out = (
        rest.unionByName(boundary)
        .withColumn(
            "keep",
            F.when(F.col("tier") == "full", F.lit(True))
            .when(F.col("tier") == "boundary",
                  F.col("_cumq") <= F.lit(int(budget_tokens)) - F.col("_above"))
            .otherwise(F.lit(False)))
        .drop("_thr", "_above", "_cumq")
    )
    return out


def budget_select_oracle_sql(docs_sql: str, budget_tokens: int,
                             bin_width: int = 10_000) -> str:
    """DuckDB twin of :func:`budget_select` — same binning, threshold
    scan, and boundary-bin prefix fill."""
    B = int(budget_tokens)
    return f"""
WITH d AS ({docs_sql}),
binned AS (SELECT d.*, (quality_fp // {int(bin_width)})::BIGINT AS bin
           FROM d),
per_bin AS (SELECT bin, sum(tokens)::BIGINT AS _bt
            FROM binned GROUP BY bin),
bins AS (
  SELECT bin, sum(_bt) OVER (ORDER BY bin DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW)::BIGINT AS _cum
  FROM per_bin),
thr AS (
  SELECT max(CASE WHEN _cum > {B} THEN bin END) AS _thr,
         coalesce(max(CASE WHEN _cum <= {B} THEN _cum END), 0)::BIGINT
           AS _above
  FROM bins),
tiered AS (
  SELECT b.*,
         CASE WHEN t._thr IS NULL OR b.bin > t._thr THEN 'full'
              WHEN b.bin = t._thr THEN 'boundary' END AS tier,
         t._above
  FROM binned b, thr t),
cumq AS (
  SELECT tiered.*,
         CASE WHEN tier = 'boundary' THEN
           sum(tokens) OVER (PARTITION BY bin
                             ORDER BY quality_fp DESC, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW)
         END::BIGINT AS _cumq
  FROM tiered)
SELECT * EXCLUDE (_cumq, _above),
       CASE WHEN tier = 'full' THEN TRUE
            WHEN tier = 'boundary' THEN _cumq <= {B} - _above
            ELSE FALSE END AS keep
FROM cumq"""


# ---------------------------------------------------------------------------
# Zipf term-frequency tail (Hill estimator)
# ---------------------------------------------------------------------------

def zipf_terms(df: DataFrame, text_col: str = "text",
               k_min: int = 5) -> DataFrame:
    """Term-frequency distribution with the Hill MLE power-law exponent
    over the tail (count >= ``k_min``) — Zipf's law is the oldest
    corpus-scale invariant, and the fitted alpha is a cheap corpus
    HEALTH check: natural text sits near the Zipf-Mandelbrot regime,
    while template/boilerplate floods or synthetic spam shift the tail
    visibly (the same Clauset-Shalizi-Newman machinery as the host-graph
    degree fit, applied to the token space).

    Same exactness discipline as graph.degree_powerlaw: per-term
    ``floor(1e6 * ln(c / k_min))`` BIGINTs sum exactly, then
    ``alpha_fp = 1e6 + (n_tail * 1e12) DIV S``. Scale shape: one
    explode + one map-side-combined groupBy to term counts, one groupBy
    to the (count, n_terms) histogram (rows = distinct counts, tiny),
    one 2-value broadcast summary.

    Returns ``(count, n_terms)`` histogram rows with ``(k_min, n_tail,
    sum_ln_fp, alpha_fp)`` repeated on each.
    """
    if k_min < 1:
        raise ValueError("k_min must be >= 1")
    toks = df.select(
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"))
    counts = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    hist = (counts.groupBy("c").agg(F.count(F.lit(1)).cast("long")
                                    .alias("n_terms"))
            .withColumnRenamed("c", "count"))
    term = F.floor(F.lit(1e6) * F.log(F.col("c").cast("double")
                                      / F.lit(float(k_min)))).cast("long")
    summ = (counts.filter(F.col("c") >= int(k_min))
            .agg(F.count(F.lit(1)).cast("long").alias("n_tail"),
                 F.coalesce(F.sum(term), F.lit(0)).cast("long")
                 .alias("sum_ln_fp")))
    # DOUBLE read-out (not n_tail*1e12 DIV s): a web-scale vocabulary
    # easily exceeds 9.2M tail terms, overflowing the BIGINT product;
    # exact-int operands make the float division IEEE-identical on both
    # engines
    summ = summ.select(
        F.lit(int(k_min)).alias("k_min"), "n_tail", "sum_ln_fp",
        F.when(F.col("sum_ln_fp") > 0,
               F.lit(1_000_000)
               + F.floor((F.lit(1e12) * F.col("n_tail").cast("double"))
                         / F.col("sum_ln_fp").cast("double")))
        .cast("long").alias("alpha_fp"))
    return hist.crossJoin(F.broadcast(summ))


def zipf_terms_oracle_sql(docs_sql: str, k_min: int = 5) -> str:
    """DuckDB twin of :func:`zipf_terms` — identical tokenization,
    counts, floored log terms, and integer alpha."""
    k = int(k_min)
    return rf"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
  FROM ({docs_sql})),
counts AS (SELECT tok, count(*)::BIGINT AS c FROM toks GROUP BY tok),
hist AS (SELECT c AS count, count(*)::BIGINT AS n_terms
         FROM counts GROUP BY c),
summ AS (
  SELECT count(*)::BIGINT AS n_tail,
         coalesce(sum(floor(1e6 * ln(c::DOUBLE / {k}.0))::BIGINT),
                  0)::BIGINT AS sum_ln_fp
  FROM counts WHERE c >= {k})
SELECT h.count, h.n_terms, {k} AS k_min, s.n_tail, s.sum_ln_fp,
       CASE WHEN s.sum_ln_fp > 0
            THEN 1000000 + floor((1e12 * s.n_tail::DOUBLE)
                                 / s.sum_ln_fp::DOUBLE)
       END::BIGINT AS alpha_fp
FROM hist h, summ s"""


def span_integrity(docs: DataFrame, doc_id_col: str = "doc_id",
                   spans_col: str = "spans") -> DataFrame:
    """Per-document integrity + shape metrics for the north-rule
    interleaved spans table — the invariant the whole graft hangs on is
    span-sequence equality (kind, text, media_ref, order), so this is
    the operator that AUDITS it corpus-wide: a writer bug, a shuffle
    that drops array order, or a media_ref mixup shows up here as a
    non-zero violation count long before a downstream consumer decodes
    garbage.

    Checks, all NATIVE array higher-order functions over the nested
    column (zip_with/filter/aggregate — one codegen'd projection, no
    explode, no shuffle, no Python):

    - ``order_ok``     — span offsets are exactly 0..n-1 in array order
      (the chunker contract, chunker.py interleave_spans).
    - ``shape_ok``     — every media span carries a non-empty media_ref
      and empty text; every text span an empty media_ref (the writer
      contract for the struct).
    - ``kind_runs``    — number of maximal same-kind runs (1 + count of
      kind transitions): the interleaving geometry a packing consumer
      (interleave_pack) sees.
    - ``text_chars``   — total text payload bytes-as-chars.
    - ``media_ppm``    — media spans per million spans, integer DIV.

    The DuckDB oracle recomputes every metric from the FLAT golden spans
    parquet with windows/GROUP BY — a structurally different dataflow
    over independently validated rows (goldens are pinned against the
    actual reference chunking module), so agreement certifies both the
    live chunker UDF and the HOF arithmetic.
    """
    s = F.col(spans_col)
    n = F.size(s)
    idx = F.sequence(F.lit(0), n - 1)

    # NULL fields are exactly the corruption this operator audits for, so
    # every predicate coalesces first: a NULL text/media_ref/offset must
    # read as a VIOLATION (False), never as SQL-NULL that forall/aggregate
    # would swallow (Spark forall returns NULL, DuckDB bool_and skips —
    # both would hide the one row that matters)
    def _kind(sp):
        return F.coalesce(sp["kind"], F.lit(""))

    def _ref(sp):
        return F.coalesce(sp["media_ref"], F.lit(""))

    def _txt(sp):
        return F.coalesce(sp["text"], F.lit(""))

    order_ok = F.when(n == 0, F.lit(True)).otherwise(
        F.forall(F.zip_with(
            s, idx, lambda sp, i: F.coalesce(sp["offset"], F.lit(-1)) == i),
            lambda x: x))
    shape_ok = F.forall(
        s,
        lambda sp: ((_kind(sp) == "media") & (_ref(sp) != "")
                    & (_txt(sp) == ""))
        | ((_kind(sp) == "text") & (_ref(sp) == "")))
    transitions = F.when(n <= 1, F.lit(0)).otherwise(F.size(F.filter(
        F.zip_with(F.slice(s, 1, n - 1), F.slice(s, 2, n - 1),
                   lambda a, b: _kind(a) != _kind(b)),
        lambda x: x)))
    n_media = F.size(F.filter(s, lambda sp: _kind(sp) == "media"))
    return docs.select(
        F.col(doc_id_col).alias("doc_id"),
        n.cast("long").alias("n_spans"),
        n_media.cast("long").alias("n_media"),
        order_ok.alias("order_ok"),
        shape_ok.alias("shape_ok"),
        F.when(n == 0, F.lit(0)).otherwise(transitions + 1)
        .cast("long").alias("kind_runs"),
        F.aggregate(s, F.lit(0).cast("long"),
                    lambda acc, sp: acc + F.length(
                        F.coalesce(sp["text"], F.lit(""))))
        .alias("text_chars"),
        F.when(n == 0, F.lit(0)).otherwise(
            F.expr(f"(size(filter({spans_col}, "
                   f"sp -> coalesce(sp.kind, '') = 'media')) * 1000000) "
                   f"DIV size({spans_col})"))
        .cast("long").alias("media_ppm"),
    )


def span_integrity_oracle_sql(flat_spans_sql: str) -> str:
    """DuckDB twin of :func:`span_integrity` over FLAT rows
    (doc_id, span_idx, kind, text, media_ref, offset) — windows +
    GROUP BY instead of array HOFs."""
    return f"""
WITH sp AS ({flat_spans_sql}),
t AS (
  SELECT doc_id, span_idx,
         coalesce(kind, '') AS kind, coalesce(text, '') AS text,
         coalesce(media_ref, '') AS media_ref,
         coalesce("offset", -1) AS "offset",
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY span_idx) - 1
             AS arr_pos,
         LAG(kind) OVER (PARTITION BY doc_id ORDER BY span_idx)
             AS prev_kind
  FROM sp
)
SELECT doc_id,
       count(*)::BIGINT AS n_spans,
       sum((kind = 'media')::BIGINT)::BIGINT AS n_media,
       bool_and("offset" = arr_pos) AS order_ok,
       bool_and((kind = 'media' AND media_ref <> '' AND text = '')
                OR (kind = 'text' AND media_ref = '')) AS shape_ok,
       (1 + sum((prev_kind IS NOT NULL AND kind <> prev_kind)::BIGINT)
       )::BIGINT AS kind_runs,
       sum(length(text))::BIGINT AS text_chars,
       (sum((kind = 'media')::BIGINT) * 1000000 // count(*))::BIGINT
           AS media_ppm
FROM t GROUP BY doc_id"""
