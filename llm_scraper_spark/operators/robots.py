"""robots.txt parsing + frontier gating (SURVEY.md §2.1 S2, north-rule "robots gating").

The reference only mines robots.txt for Sitemap: lines
(/root/reference/discovery.py:15-25); the north rule upgrades this to real
allow/disallow gating of the frontier. Semantics implemented: longest-match
prefix rule wins (Google REP), Allow beats Disallow on equal length, empty
Disallow = allow all. Rules are parsed batch-wise in an Arrow UDF and the
per-host rules table is **broadcast-joined** to the frontier (the rules side
is tiny: one row per host).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def parse_robots_txt(body: str) -> dict:
    """Parse one robots.txt body → {allow, disallow, sitemaps, crawl_delay}.

    Group selection: rules under 'User-agent: *' (the engine fetches as a
    generic agent, like the reference's single UA, scraper.py:37-41).
    Sitemap lines are global (discovery.py:20-24 reads them wherever they
    appear).
    """
    allow: list[str] = []
    disallow: list[str] = []
    sitemaps: list[str] = []
    crawl_delay: float | None = None
    applies = False
    saw_any_agent = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            applies = val == "*"
            saw_any_agent = True
        elif key == "sitemap":
            if val:
                sitemaps.append(val)
        elif applies or not saw_any_agent:
            if key == "allow" and val:
                allow.append(val)
            elif key == "disallow":
                if val:
                    disallow.append(val)
            elif key == "crawl-delay":
                try:
                    crawl_delay = float(val)
                except ValueError:
                    pass
    return {
        "allow_prefixes": allow,
        "disallow_prefixes": disallow,
        "sitemaps": sitemaps,
        "crawl_delay": crawl_delay,
    }


from pyspark.sql import types as T

ROBOTS_RULES_SCHEMA = T.StructType([
    T.StructField("allow_prefixes", T.ArrayType(T.StringType())),
    T.StructField("disallow_prefixes", T.ArrayType(T.StringType())),
    T.StructField("sitemaps", T.ArrayType(T.StringType())),
    T.StructField("crawl_delay", T.DoubleType()),
])


@F.pandas_udf(ROBOTS_RULES_SCHEMA)
def parse_robots_udf(bodies: pd.Series) -> pd.DataFrame:
    rows = [parse_robots_txt(b if isinstance(b, str) else "") for b in bodies]
    return pd.DataFrame(rows)


def robots_allowed(path_col, allow_col, disallow_col):
    """Native-expression REP longest-match check.

    For each rule list, the longest matching prefix is found with
    filter+transform+array_max over prefix lengths — pure Catalyst exprs,
    no Python. Allowed iff longest_allow >= longest_disallow (ties favor
    Allow) or no disallow matches.
    """
    def longest_match(rules):
        matched = F.filter(rules, lambda r: path_col.startswith(r))
        return F.coalesce(
            F.array_max(F.transform(matched, lambda r: F.length(r))), F.lit(-1)
        )

    la = longest_match(F.coalesce(allow_col, F.array().cast("array<string>")))
    ld = longest_match(F.coalesce(disallow_col, F.array().cast("array<string>")))
    return (ld == -1) | (la >= ld)


def gate_frontier(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Filter frontier rows whose canonical path robots rules forbid.

    ``robots(host, allow_prefixes, disallow_prefixes, ...)`` is broadcast;
    hosts with no robots row are allowed (reference behavior: missing
    robots.txt ⇒ crawl, discovery.py:154-155).
    """
    path = F.regexp_replace(
        F.col("canonical_url"), r"^[a-z][a-z0-9+.-]*://[^/]*", ""
    )
    rules = robots.select(
        F.col("host").alias("_r_host"),
        F.col("allow_prefixes").alias("_r_allow"),
        F.col("disallow_prefixes").alias("_r_disallow"),
    )
    joined = frontier.join(
        F.broadcast(rules), frontier["host"] == rules["_r_host"], "left"
    )
    allowed = F.col("_r_host").isNull() | robots_allowed(
        F.when(path == "", "/").otherwise(path), F.col("_r_allow"), F.col("_r_disallow")
    )
    return joined.filter(allowed).drop("_r_host", "_r_allow", "_r_disallow")
