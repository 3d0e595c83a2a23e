"""DUST-style URL alias-rule mining: learn per-site content-irrelevant
query parameters from crawl evidence.

"Do Not Crawl in the DUST" (Bar-Yossef, Keidar & Schonfeld, WWW 2007)
frames the production problem: large sites expose the SAME content under
Different URLs with Similar Text — session ids, tracking tokens, sort
params — and a crawler that cannot learn the site's alias rules wastes
fetch budget and poisons its dedup stats. The static tracking-param strip
(functions/urls.py strip_tracking_params) kills the globally-known
offenders; this module learns the SITE-SPECIFIC ones from the crawl's own
(url, content-fingerprint) table, the way DUST mines rules from "similar
text" evidence. The reference crawler has no analogue (it dedups whole
URLs only, /root/reference/cache.py:78-92) — this is the corpus-level
generalization a 10^10-URL frontier needs.

Rule language (deliberately restricted to keep both mining and the DuckDB
oracle exact): "query parameter P on host H never changes content". For
every crawled URL and every parameter position in it, the candidate alias
is the URL with that one parameter removed; if the alias was ALSO crawled,
the pair is direct evidence — equal fingerprints support the rule,
differing fingerprints veto it (DUST's "rule validation" step, §4 of the
paper, collapsed into the same join). A rule ships only with zero
violations and ``support >= min_support``.

Scale shape (100 TB story):

- Evidence generation is narrow: split + posexplode over the URL's own
  parameters (bounded by the crawl-scope param cap, functions/urls.py),
  no shuffle until the join.
- The evidence join is ONE string equi-join of the slim
  ``(alias_url, param, fp)`` projection against ``(url, fp)`` — hash
  join on the shuffle key a frontier already uses (the URL), so it
  co-partitions with existing state for free under bucketing.
- Rule aggregation groups on (host, param) — site count x param-name
  vocabulary, many orders below page count; map-side combine does most
  of it.
- Applying rules is a broadcast join (rules are tiny) + one native
  filter() HOF over each URL's param list — no UDF, no extra shuffle.

Everything is exact string/integer work: the oracle replays mining AND
application value-for-value in DuckDB (list lambdas there take 1-based
indices vs Spark's 0-based — both sides compare indices, never mix them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"


def _url_host(c: Column) -> Column:
    return F.regexp_extract(c, HOST_RE, 1)


def mine_param_rules(
    pages: DataFrame,
    url_col: str = "url",
    fp_col: str = "content_fp",
    min_support: int = 2,
    by_host: bool = True,
) -> DataFrame:
    """Mine content-irrelevant query parameters from ``(url, fingerprint)``
    crawl evidence.

    Returns ``(host?, param, support, violations, valid)`` where
    ``support`` counts crawled (url, url-minus-param) pairs with EQUAL
    fingerprints, ``violations`` counts pairs that differ, and ``valid``
    is the ship decision (no violations, enough support). With
    ``by_host=False`` rules are global (host grouping dropped).
    """
    u = F.col(url_col)
    q_at = F.instr(u, "?")
    withq = pages.filter(q_at > 0).select(
        u.alias("_url"),
        F.col(fp_col).alias("_fp"),
        _url_host(u).alias("host"),
        F.substring_index(u, "?", 1).alias("_base"),
        F.split(F.substring(u, q_at + F.lit(1), F.length(u)), "&")
        .alias("_params"),
    )
    cand = withq.select(
        "host", "_fp", "_base", "_params",
        F.posexplode(F.col("_params")).alias("_idx", "_kv"),
    ).select(
        "host", "_fp",
        F.lower(F.substring_index(F.col("_kv"), "=", 1)).alias("param"),
        F.expr("filter(_params, (x, i) -> i != _idx)").alias("_kept"),
        F.col("_base"),
    ).select(
        "host", "_fp", "param",
        F.when(F.size("_kept") == 0, F.col("_base"))
        .otherwise(F.concat(F.col("_base"), F.lit("?"),
                            F.array_join(F.col("_kept"), "&")))
        .alias("_alias"),
    )
    # evidence: the alias URL was itself crawled
    corpus = pages.select(F.col(url_col).alias("_alias"),
                          F.col(fp_col).alias("_fp2"))
    ev = cand.join(corpus, "_alias")
    keys = ["host", "param"] if by_host else ["param"]
    return (
        ev.groupBy(*keys)
        .agg(
            F.sum(F.when(F.col("_fp") == F.col("_fp2"), 1).otherwise(0))
            .cast("long").alias("support"),
            F.sum(F.when(F.col("_fp") != F.col("_fp2"), 1).otherwise(0))
            .cast("long").alias("violations"),
        )
        .withColumn(
            "valid",
            (F.col("violations") == 0) & (F.col("support") >= int(min_support)),
        )
    )


def apply_param_rules(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    out_col: str = "rewritten_url",
    by_host: bool = True,
) -> DataFrame:
    """Rewrite URLs by stripping every parameter a VALID mined rule covers
    (per host when ``by_host``). Broadcast join + one filter() HOF — no
    UDF, no shuffle beyond the broadcast."""
    valid = rules.filter(F.col("valid"))
    if by_host:
        drop = valid.groupBy("host").agg(F.collect_set("param").alias("_drop"))
        joined = df.withColumn("_h", _url_host(F.col(url_col))).join(
            F.broadcast(drop.withColumnRenamed("host", "_h")), "_h", "left"
        )
    else:
        drop = valid.agg(F.collect_set("param").alias("_drop"))
        joined = df.crossJoin(F.broadcast(drop))
    u = F.col(url_col)
    q_at = F.instr(u, "?")
    params = F.split(F.substring(u, q_at + F.lit(1), F.length(u)), "&")
    base = F.substring_index(u, "?", 1)
    kept = F.expr(
        "filter(_params_tmp, kv -> NOT array_contains("
        "_drop, lower(substring_index(kv, '=', 1))))"
    )
    out = (
        joined.withColumn("_params_tmp", params)
        .withColumn(
            out_col,
            F.when(q_at == 0, u)
            .when(F.col("_drop").isNull(), u)
            .when(F.size(kept) == 0, base)
            .otherwise(F.concat(base, F.lit("?"), F.array_join(kept, "&"))),
        )
        .drop("_params_tmp", "_drop")
    )
    return out.drop("_h") if by_host else out


def mine_param_rules_oracle_sql(
    pages_sql: str,
    min_support: int = 2,
    by_host: bool = True,
) -> str:
    """DuckDB twin of :func:`mine_param_rules` — same split/explode/join/
    count chain. DuckDB list lambdas use 1-based indices (Spark's filter
    HOF is 0-based); both engines compare the explode index against the
    lambda index in their own base, so the kept-set is identical."""
    keys = "host, param" if by_host else "param"
    return f"""
WITH pages AS ({pages_sql}),
withq AS (
  SELECT content_fp AS _fp,
         regexp_extract(url, '{HOST_RE}', 1) AS host,
         split_part(url, '?', 1) AS _base,
         string_split(substr(url, instr(url, '?') + 1), '&') AS _params
  FROM pages WHERE instr(url, '?') > 0
),
exploded AS (
  SELECT host, _fp, _base, _params,
         unnest(generate_series(1, len(_params))) AS i
  FROM withq
),
cand AS (
  SELECT host, _fp,
         lower(split_part(_params[i], '=', 1)) AS param,
         CASE WHEN len(list_filter(_params, (x, j) -> j <> i)) = 0
              THEN _base
              ELSE _base || '?' ||
                   array_to_string(list_filter(_params, (x, j) -> j <> i), '&')
         END AS _alias
  FROM exploded
),
ev AS (
  SELECT c.host, c.param, c._fp, p.content_fp AS _fp2
  FROM cand c JOIN pages p ON p.url = c._alias
)
SELECT {keys},
       CAST(SUM(CASE WHEN _fp = _fp2 THEN 1 ELSE 0 END) AS BIGINT)
         AS support,
       CAST(SUM(CASE WHEN _fp <> _fp2 THEN 1 ELSE 0 END) AS BIGINT)
         AS violations,
       (SUM(CASE WHEN _fp <> _fp2 THEN 1 ELSE 0 END) = 0
        AND SUM(CASE WHEN _fp = _fp2 THEN 1 ELSE 0 END) >= {int(min_support)})
         AS valid
FROM ev GROUP BY {keys}"""


def apply_param_rules_oracle_sql(
    pages_sql: str,
    min_support: int = 2,
) -> str:
    """DuckDB twin of mine + :func:`apply_param_rules` end-to-end
    (by_host form): mine the valid per-host drop-set with
    :func:`mine_param_rules_oracle_sql`'s chain, then rewrite every URL
    by filtering its param list against that set — identical null/empty
    handling (no ?, no rules for the host, all params dropped). Emits
    ``(url, rewritten_url)``."""
    mine = mine_param_rules_oracle_sql(pages_sql, min_support=min_support,
                                       by_host=True)
    return f"""
WITH rules AS ({mine}),
drops AS (
  SELECT host, list(param) AS _drop
  FROM rules WHERE valid GROUP BY host),
pages2 AS (
  SELECT url,
         regexp_extract(url, '{HOST_RE}', 1) AS _h,
         instr(url, '?') AS _q,
         split_part(url, '?', 1) AS _base,
         string_split(substr(url, instr(url, '?') + 1), '&') AS _params
  FROM ({pages_sql})),
joined AS (
  SELECT p.*, d._drop,
         list_filter(p._params,
                     kv -> NOT list_contains(
                       coalesce(d._drop, []),
                       lower(split_part(kv, '=', 1)))) AS _kept
  FROM pages2 p LEFT JOIN drops d ON d.host = p._h)
SELECT url,
       CASE WHEN _q = 0 THEN url
            WHEN _drop IS NULL THEN url
            WHEN len(_kept) = 0 THEN _base
            ELSE _base || '?' || array_to_string(_kept, '&')
       END AS rewritten_url
FROM joined"""


def canonical_url_election(
    pages: DataFrame,
    url_col: str = "url",
    fp_col: str = "content_fp",
) -> DataFrame:
    """Elect ONE canonical URL per content-duplicate group — the
    flip side of the param-rule mining above: once a crawl knows several
    URLs serve identical content (equal fingerprints), every index,
    frontier and dedup table should carry a single representative, chosen
    the way search engines break canonical ties (Google's documented
    canonicalization signals, simplified to the deterministic core):

      1. a URL WITHOUT query parameters beats one with them,
      2. https beats other schemes,
      3. shorter beats longer,
      4. lexicographic as the final total-order tie-break.

    Scale shape: ONE map-side-combined groupBy(fingerprint) taking
    ``min(struct(rank..., url))`` — the skew-safe choice over a window
    (the all-identical boilerplate fingerprint is a classic hot key, and
    a window would pile it onto one partition; the line_dedup rationale)
    — then a broadcast-eligible join back on the fingerprint. Integer
    flags; fully engine-replayable.

    Returns the input plus ``canonical_url`` and ``is_canonical``.
    """
    u = F.col(url_col)
    key = F.struct(
        (F.instr(u, "?") > 0).cast("int").alias("k1"),
        (~u.startswith("https://")).cast("int").alias("k2"),
        F.length(u).alias("k3"),
        u.alias("k4"),
    )
    winners = (
        pages.groupBy(F.col(fp_col).alias("_fp"))
        .agg(F.min(key).alias("_w"))
        .select("_fp", F.col("_w.k4").alias("canonical_url"))
    )
    return (
        pages.join(winners, pages[fp_col] == winners["_fp"])
        .drop("_fp")
        .withColumn("is_canonical", F.col(url_col) == F.col("canonical_url"))
    )


def canonical_url_election_oracle_sql(pages_sql: str) -> str:
    """DuckDB twin of :func:`canonical_url_election` — same four-level
    composite order, replayed as a rank-1 window (same winner as the
    skew-safe min(struct) on the Spark side)."""
    return f"""
WITH p AS ({pages_sql}),
r AS (
  SELECT *, row_number() OVER (
           PARTITION BY content_fp
           ORDER BY (instr(url, '?') > 0)::INT,
                    (NOT starts_with(url, 'https://'))::INT,
                    length(url), url) AS _rn
  FROM p),
w AS (SELECT content_fp, url AS canonical_url FROM r WHERE _rn = 1)
SELECT p.*, w.canonical_url, p.url = w.canonical_url AS is_canonical
FROM p JOIN w USING (content_fp)"""
