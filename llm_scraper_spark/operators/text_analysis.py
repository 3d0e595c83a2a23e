"""Text analysis for training-data pipelines — all native Spark expressions.

- language_id     — stopword-hit heuristic over a small per-language lexicon
- quality_score   — length / punctuation / stopword / word-length signals
                    (reference QualitySignals fields, articles.py:118-122,
                    are declared but never computed — this implements them)
- token_count_*   — whitespace + BPE-ish regex token counts
- fingerprint     — min-hash-of-word-3-grams document fingerprint (md5-based
                    so a DuckDB oracle can replicate it exactly)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for",
           "on", "with", "as", "was", "at", "by", "an", "be", "this", "are"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den",
           "von", "mit", "auf", "für", "im", "nicht", "sich", "auch"),
    "fr": ("le", "la", "les", "de", "des", "et", "est", "un", "une", "dans",
           "que", "pour", "qui", "sur", "pas", "au", "plus"),
    "es": ("el", "la", "los", "las", "de", "y", "es", "un", "una", "en",
           "que", "por", "con", "para", "no", "se", "su"),
    "vi": ("và", "của", "là", "có", "được", "cho", "này", "một", "những",
           "các", "với", "không", "người", "trong"),
}


def _tokens(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def stopword_hits(col, lang: str = "en") -> Column:
    toks = _tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def language_id(col) -> Column:
    """argmax over languages of stopword-hit count; 'und' when no hits.

    greatest-of-structs trick keeps it a single codegen'd expression."""
    toks = _tokens(col)
    scored = []

    def _hit_fn(sw):
        # NB: a 2-arg lambda (even with a default) becomes an (element, index)
        # higher-order function in PySpark — close over sw instead
        return lambda t: F.array_contains(sw, t)

    for lang in STOPWORDS:
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hits = F.size(F.filter(toks, _hit_fn(sw)))
        scored.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.greatest(*scored)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def token_count_ws(col) -> Column:
    """Whitespace token count."""
    return F.size(_tokens(col))


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_bpe(col) -> Column:
    """BPE-ish regex token count (letters / digits / punct as separate
    tokens) — pattern chosen to behave identically under Java regex and
    DuckDB's RE2 so the oracle can replicate it."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


def punct_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", ""))
    return n_punct.cast("double") / F.greatest(F.length(c), F.lit(1))


def mean_word_len(col) -> Column:
    toks = _tokens(col)
    total = F.aggregate(F.transform(toks, lambda t: F.length(t)),
                        F.lit(0), lambda a, x: a + x)
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1))


def quality_score(col, lang: str = "en") -> Column:
    """Composite [0,1] quality heuristic:
    0.25*length_sat + 0.25*stopword_density + 0.25*punct_sanity + 0.25*word_len_sanity.
    Deterministic arithmetic only (oracle-replicable)."""
    c = F.col(col) if isinstance(col, str) else col
    n_words = token_count_ws(c)
    length_sat = F.least(n_words.cast("double") / F.lit(100.0), F.lit(1.0))
    sw_density = F.least(
        stopword_hits(c, lang).cast("double")
        / F.greatest(n_words, F.lit(1)) * F.lit(4.0),
        F.lit(1.0),
    )
    p = punct_ratio(c)
    punct_sanity = F.when((p >= 0.005) & (p <= 0.2), F.lit(1.0)).otherwise(F.lit(0.0))
    mwl = mean_word_len(c)
    wl_sanity = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round(
        F.lit(0.25) * length_sat + F.lit(0.25) * sw_density
        + F.lit(0.25) * punct_sanity + F.lit(0.25) * wl_sanity, 6)


def fingerprint(col) -> Column:
    """Document fingerprint: lexicographic min of md5(word-3-gram) over the
    doc — a rolling-hash winnowing degenerate (window = whole doc). md5 so
    Spark and DuckDB agree byte-for-byte; swap for xxhash64 at scale."""
    toks = F.split(F.col(col) if isinstance(col, str) else col, " ")
    n = F.size(toks) - F.lit(2)
    grams = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, 3))),
    )
    # sequence(1, 0) is DESCENDING in Spark — guard docs with < 3 words
    return F.when(n >= 1, F.array_min(grams)).otherwise(F.lit(None).cast("string"))


def dup_line_frac(col) -> Column:
    """Fraction of lines that repeat an earlier line:
    1 - distinct_lines/lines. Pure array expression — zero shuffle. One of
    the Gopher repetition filters (Rae et al. 2021 §A1.1); the reference
    declares no quality-filter stage, so this is part of the
    training-data-pipeline tier, not reference parity."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, "\n")
    return (
        F.lit(1.0)
        - F.size(F.array_distinct(lines)).cast("double") / F.size(lines)
    )


def repetition_signals(df, text_col: str = "text",
                       id_col: str = "doc_id"):
    """Gopher-style repetition quality signals, per document:

    - ``dup_line_frac``  — 1 - distinct lines / lines (no shuffle)
    - ``dup_3gram_frac`` — 1 - distinct word-3-grams / word-3-grams
    - ``top_2gram_frac`` — share of 2-gram occurrences taken by the most
      frequent 2-gram

    Shingling reuses the HOF-free posexplode + lead plan from
    ``operators.dedup.shingles_exploded`` (codegen'd projections, one
    UnsafeRow window pass per n). Aggregations are map-side-combined
    groupBys keyed on the document id, so at 100 TB this is two bounded
    doc_id shuffles — no joins wider than the document count. Docs too
    short for an n-gram get 0.0 (left join + coalesce), matching the
    DuckDB oracle in __spark_entry__.py.
    """
    from llm_scraper_spark.operators.dedup import shingles_exploded

    base = df.select(
        F.col(id_col).alias("id"),
        dup_line_frac(text_col).alias("dup_line_frac"),
    )
    tri = (
        shingles_exploded(df, text_col, id_col, n=3)
        .groupBy("id")
        .agg((
            F.lit(1.0)
            - F.count_distinct(F.col("s")).cast("double") / F.count(F.lit(1))
        ).alias("dup_3gram_frac"))
    )
    bi = (
        shingles_exploded(df, text_col, id_col, n=2)
        .groupBy("id", "s").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg((F.max("c").cast("double") / F.sum("c")).alias("top_2gram_frac"))
    )
    return (
        base.join(tri, on="id", how="left")
        .join(bi, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            "dup_line_frac",
            F.coalesce("dup_3gram_frac", F.lit(0.0)).alias("dup_3gram_frac"),
            F.coalesce("top_2gram_frac", F.lit(0.0)).alias("top_2gram_frac"),
        )
    )


# ---------------------------------------------------------------------------
# PII redaction (training-data scrubbing)
# ---------------------------------------------------------------------------
# Patterns are deliberately restricted to the regex subset that Java
# (Spark/JVM) and RE2 (DuckDB) interpret identically, so the driver's
# DuckDB oracle replicates the operator byte-for-byte. Order matters:
# emails first (an email contains dot-separated digits a later IP pass
# could half-match), then IPs, then phone numbers.

PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d\-\s]{7,}\d", "<PHONE>"),
)


def pii_counts(col) -> list[Column]:
    """One count column per PII class (email/ipv4/phone) BEFORE redaction.

    Counts are taken on the original text in the same order the redaction
    chain runs, mirroring what each replace pass actually sees: emails are
    counted on raw text; IPs on email-redacted text (so an address inside
    an email never double-counts); phones after both.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = []
    seen = c
    for name, pat, repl in PII_PATTERNS:
        out.append(F.regexp_count(seen, F.lit(pat)).alias(f"n_{name}"))
        seen = F.regexp_replace(seen, pat, repl)
    return out


def redact_pii(col) -> Column:
    """Scrubbed text: every email, IPv4, and international-format phone
    number replaced with a typed placeholder token. Single codegen'd
    projection — three chained JVM regexp_replace calls, no Python, no
    shuffle; at 100 TB this runs at scan speed fused into whatever stage
    consumes the text."""
    c = F.col(col) if isinstance(col, str) else col
    for _name, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def c4_filters(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", min_words: int = 3,
               min_sentences: int = 5) -> DataFrame:
    """The C4 cleaning heuristics (Raffel et al., JMLR 2020 §2.2) as one
    native projection — the canonical first-pass page filter every
    web-scale training corpus applies before dedup and quality scoring:

    - line KEPT iff it ends in terminal punctuation (. ! ? \"), has at
      least ``min_words`` words, and does not contain 'javascript';
    - page KEPT iff its kept lines carry at least ``min_sentences``
      sentence terminators, and the raw page contains neither the
      phrase 'lorem ipsum' nor a curly bracket.

    (C4's bad-words list is a licensing-encumbered external artifact —
    callers wanting it chain an extra rlike on the raw text; the core
    structural rules are what this operator owns.)

    All array higher-order functions and regexes over the split line
    list — no explode, no shuffle, no Python; the regexes are simple
    character classes, identical under Java regex and DuckDB RE2, and
    word counting is the repo-standard \\w+ extraction, so the oracle
    reproduces every count exactly.

    Returns (doc_id, n_lines, n_kept, n_sentences, has_lorem,
    has_brace, keep).
    """
    lines = F.split(F.col(text_col), "\n")
    is_kept = lambda l: (
        l.rlike('[.!?"]$')
        & (F.size(F.regexp_extract_all(l, F.lit(r"\w+"), 0)) >= min_words)
        & ~l.contains("javascript")
    )
    kept = F.filter(lines, is_kept)
    n_sent = F.aggregate(
        kept, F.lit(0).cast("long"),
        lambda acc, l: acc + F.size(
            F.regexp_extract_all(l, F.lit("[.!?]"), 0)))
    has_lorem = F.instr(F.col(text_col), "lorem ipsum") > 0
    has_brace = F.instr(F.col(text_col), "{") > 0
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        n_sent.alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        ((n_sent >= min_sentences) & ~has_lorem & ~has_brace)
        .alias("keep"),
    )


def c4_filters_oracle_sql(docs_sql: str, min_words: int = 3,
                          min_sentences: int = 5) -> str:
    """DuckDB twin of :func:`c4_filters` over (doc_id, text) —
    unnest + GROUP BY instead of array HOFs."""
    return rf"""
WITH d AS ({docs_sql}),
l AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM d),
flt AS (
  SELECT doc_id, line,
         (regexp_matches(line, '[.!?"]$')
          AND len(regexp_extract_all(line, '\w+')) >= {min_words}
          AND NOT contains(line, 'javascript')) AS kept
  FROM l),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_lines,
         sum(kept::BIGINT)::BIGINT AS n_kept,
         sum(CASE WHEN kept
             THEN len(regexp_extract_all(line, '[.!?]')) ELSE 0
             END)::BIGINT AS n_sentences
  FROM flt GROUP BY doc_id),
page AS (
  SELECT doc_id, contains(text, 'lorem ipsum') AS has_lorem,
         contains(text, '{{') AS has_brace
  FROM d)
SELECT a.doc_id, a.n_lines, a.n_kept, a.n_sentences,
       p.has_lorem, p.has_brace,
       (a.n_sentences >= {min_sentences}
        AND NOT p.has_lorem AND NOT p.has_brace) AS keep
FROM agg a JOIN page p USING (doc_id)"""
