"""Scalar text/number functions as native Spark expressions (SURVEY.md §2.5, §2.8).

All JVM-side (whole-stage codegen); no Python. Regex patterns carry the
``(?U)`` flag so Java ``\\w`` matches Python's unicode ``re.UNICODE``
semantics (reference WORD_RE, /root/reference/src/llm_scraper/utils/text.py:22).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

WORD_PATTERN_JVM = r"(?U)\w+"


def word_count(col) -> Column:
    """len(WORD_RE.findall(text)) — utils/text.py:55-75 (A1)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull() | (c == ""), F.lit(0)).otherwise(
        F.size(F.regexp_extract_all(c, F.lit(WORD_PATTERN_JVM), 0))
    )


def token_estimate(col, avg_token_per_word: float = 1.33) -> Column:
    """ceil(words * 1.33) — utils/text.py:25-52 (A2)."""
    return F.ceil(word_count(col).cast("double") * F.lit(avg_token_per_word)).cast("int")


def reading_time_minutes(col) -> Column:
    """round(word_count / 220, 2) — articles.py:185-188 (A3)."""
    return F.round(word_count(col).cast("double") / F.lit(220.0), 2)


def normalize_content(col) -> Column:
    """Article content normalization (articles.py:160-172, P14):
    [\\r\\n\\t]+ -> ' ', NBSP -> ' ', 2+ spaces -> ' ', trim."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"[\r\n\t]+", " ")
    c = F.regexp_replace(c, "\u00A0", " ")
    c = F.regexp_replace(c, r" {2,}", " ")
    return F.trim(c)


def normalize_str_ref(col) -> Column:
    """Bug-compatible normalize_str (utils/normalization.py:73-80): the second
    re.sub re-applies to the ORIGINAL value, so the [\\r\\n\\t]+ collapse is
    lost — only 2+ spaces collapse + trim survive. Kept for strict equality;
    see normalize_str_fixed for the intended behavior."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r" {2,}", " "))


def normalize_str_fixed(col) -> Column:
    """The intended normalize_str: collapse [\\r\\n\\t]+ then multi-space, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.regexp_replace(c, r"[\r\n\t]+", " "), r" {2,}", " "))


def normalize_list_str(col, rejected_keywords: tuple[str, ...] = ()) -> Column:
    """Split on [\\r\\n\\t,]+, trim, drop empties + rejected keywords
    (utils/normalization.py:61-70, P19/D5 consumers)."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.split(c, r"[\r\n\t,]+")
    arr = F.transform(arr, lambda s: F.trim(F.regexp_replace(s, r" {2,}", " ")))
    cond = lambda s: (s != "")  # noqa: E731
    if rejected_keywords:
        rejected = F.array(*[F.lit(k) for k in rejected_keywords])
        return F.filter(arr, lambda s: (s != "") & ~F.array_contains(rejected, F.lower(s)))
    return F.filter(arr, cond)


def normalize_datetime(col) -> Column:
    """Try-chain of the 5 ISO patterns then a permissive cast
    (utils/normalization.py:10-16,38-54)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.trim(c)
    return F.coalesce(
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSS")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd")),
        s.cast("timestamp"),
    )


def dedupe_cap(col, cap: int) -> Column:
    """Order-preserving dedup + cap, e.g. topics[:5]
    (models/schema.py:210-216, D5/O2/O3)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.slice(F.array_distinct(c), 1, cap)
