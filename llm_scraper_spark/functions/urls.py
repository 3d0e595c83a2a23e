"""Batch URL canonicalization + hashing (SURVEY.md §2.2 D1, §2.11 UDF #1).

Reference semantics re-expressed:

- ``normalize_url`` — default scheme to https
  (/root/reference/src/llm_scraper/utils/normalization.py:28-35)
- cache keys — md5/sha1/sha256/hmac-sha256 hex of the *raw* URL string
  (/root/reference/cache.py:17-44); md5 is the default, so the
  reference-equality seen set keys on ``md5(url)`` — Spark's native ``F.md5``
  matches hashlib byte-for-byte.
- the engine-scale path hashes the *canonical* URL with native ``xxhash64``
  (JVM-side, codegen'd) — 64-bit per the north rule.

Canonicalization runs as ONE Arrow-batched pandas UDF returning a struct
(one urllib pass per URL batch, vectorized transfer); everything downstream
(hashing, host grouping, salting) is native Spark SQL.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from pyspark.sql import types as T

CANON_SCHEMA = T.StructType([
    T.StructField("canonical_url", T.StringType()),
    T.StructField("host", T.StringType()),
])

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(u: str) -> tuple[str, str]:
    """Canonical form: default scheme https (reference rule), lowercase
    scheme/host, strip fragment and default port, '/' path if empty.

    Returns (canonical_url, host). Pure function; used batch-wise in the UDF
    and by the single-node oracle simulator so both sides share one source
    of truth.
    """
    if not isinstance(u, str):
        return "", ""
    s = u.strip()
    if not s:
        return "", ""
    try:
        p = urlsplit(s)
        if not p.scheme:
            # reference normalize_url defaults scheme to https
            # (utils/normalization.py:31-32); re-split so netloc is parsed
            p = urlsplit("https://" + s.lstrip("/"))
        scheme = p.scheme.lower()
        host = (p.hostname or "").lower()
        port = p.port
        netloc = host
        if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
            netloc = f"{host}:{port}"
        path = p.path or "/"
        return urlunsplit((scheme, netloc, path, p.query, "")), host
    except Exception:
        return s, ""


_FAST_RE = (
    r"^(?:(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://)?"
    r"(?P<auth>[^/?#]*)(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$"
)
# plain hostname: no userinfo/port/IPv6 -> eligible for the vectorized path
_PLAIN_HOST_RE = r"^[A-Za-z0-9.\-]+$"


def canonicalize_batch(urls: pd.Series) -> pd.DataFrame:
    """Vectorized canonicalization: one pandas regex extract covers the
    common shape (C-loop speed); rows with userinfo/ports/IPv6/empty hosts
    fall back to the exact per-row ``canonicalize_url`` — outputs are
    identical by construction (property-tested in tests/test_urls.py)."""
    s = urls.fillna("").astype(str).str.strip()
    m = s.str.extract(_FAST_RE)
    plain = m["auth"].str.match(_PLAIN_HOST_RE, na=False)
    fast = plain & (s != "")

    scheme = m["scheme"].str.lower()
    scheme = scheme.where(scheme.notna(), "https")
    host = m["auth"].str.lower()
    path = m["path"].fillna("")
    path = path.where(path != "", "/")
    query = m["query"]
    canon = scheme + "://" + host + path
    canon = canon.where(query.isna() | (query == ""), canon + "?" + query.fillna(""))

    out = pd.DataFrame({"canonical_url": canon, "host": host})
    slow_idx = out.index[~fast]
    if len(slow_idx):
        slow = [canonicalize_url(u) for u in s.loc[slow_idx]]
        out.loc[slow_idx, "canonical_url"] = [c for c, _h in slow]
        out.loc[slow_idx, "host"] = [h for _c, h in slow]
    return out


@F.pandas_udf(CANON_SCHEMA)
def canonicalize_urls(urls: pd.Series) -> pd.DataFrame:
    """Vectorized batch canonicalization (Arrow in/out)."""
    return canonicalize_batch(urls)


def with_canonical(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach canonical_url, host and the two hash keys.

    - ``url_hash``: xxhash64(canonical_url) — the 64-bit engine key (native)
    - ``key_hex``: md5(raw url) — reference seen-set key (cache.py:34)
    """
    c = canonicalize_urls(F.col(url_col)).alias("_c")
    return (
        df.withColumn("_c", c)
        .withColumn("canonical_url", F.col("_c.canonical_url"))
        .withColumn("host", F.col("_c.host"))
        .drop("_c")
        .withColumn("url_hash", F.xxhash64(F.col("canonical_url")))
        .withColumn("key_hex", F.md5(F.col(url_col)))
    )


def cache_key_expr(col, algorithm: str = "md5"):
    """Native column expr matching reference _compute_cache_key
    (/root/reference/cache.py:17-44) for the non-HMAC algorithms."""
    algo = (algorithm or "md5").lower()
    if algo == "md5":
        return F.md5(col)
    if algo == "sha1":
        return F.sha1(col)
    if algo == "sha256":
        return F.sha2(col, 256)
    # unknown algo falls back to md5 (cache.py:43-44); hmac needs a UDF
    return F.md5(col)


def hmac_sha256_udf(secret: str):
    """hmac-sha256 cache key (reference cache.py:39-42) — no native Spark
    expr exists, so an Arrow-batched UDF; only used when reference-equality
    of an hmac-keyed seen set is required."""
    import hashlib
    import hmac as hmac_mod

    key = secret.encode("utf-8")

    @F.pandas_udf("string")
    def _udf(values: pd.Series) -> pd.Series:
        return values.map(
            lambda v: hmac_mod.new(key, str(v).encode("utf-8"),
                                   hashlib.sha256).hexdigest()
        )

    return _udf


def same_domain_filter(df: DataFrame, domain_col: str = "domain",
                       host_col: str = "host") -> DataFrame:
    """Keep links whose host ∈ {domain, www.domain}
    (/root/reference/worker.py:552-560)."""
    d = F.col(domain_col)
    h = F.col(host_col)
    return df.filter((h == d) | (h == F.concat(F.lit("www."), d)) |
                     (F.concat(F.lit("www."), h) == d))
