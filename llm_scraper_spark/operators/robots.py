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


def gate_frontier(frontier: DataFrame, robots: DataFrame,
                  rep_wildcards: bool = False) -> DataFrame:
    """Filter frontier rows whose canonical path robots rules forbid.

    ``robots(host, allow_prefixes, disallow_prefixes, ...)`` is broadcast;
    hosts with no robots row are allowed (reference behavior: missing
    robots.txt ⇒ crawl, discovery.py:154-155). ``rep_wildcards=True``
    matches rules with the full RFC 9309 language (:func:`robots_allowed_rep`
    — ``*`` runs, ``$`` anchors, longest-octets wins) instead of the prefix
    rule; it is opt-in because the crawl-equality goldens pin the prefix
    semantics the single-node simulator implements.
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
    matcher = robots_allowed_rep if rep_wildcards else robots_allowed
    allowed = F.col("_r_host").isNull() | matcher(
        F.when(path == "", "/").otherwise(path), F.col("_r_allow"), F.col("_r_disallow")
    )
    return joined.filter(allowed).drop("_r_host", "_r_allow", "_r_disallow")


# ---------------------------------------------------------------------------
# RFC 9309 wildcard matching (*, $)
# ---------------------------------------------------------------------------

_RE_META = r"([\\.\^\$\|\(\)\[\]\{\}\+\?\*\\\\])"


def _rule_regex(rule_col):
    """Compile one REP rule into an anchored regex, natively: a trailing
    ``$`` becomes the end anchor, every ``*`` becomes ``.*``, every other
    regex metacharacter is escaped. Pure string expressions — evaluated
    inside HOF lambdas over the (tiny, broadcast) per-host rule arrays."""
    ends = rule_col.endswith("$")
    core = F.when(
        ends, rule_col.substr(F.lit(1), F.length(rule_col) - 1)
    ).otherwise(rule_col)
    escaped = F.regexp_replace(core, _RE_META, r"\\$1")
    # our '*' was escaped to '\*' above; now turn it into '.*'
    wild = F.regexp_replace(escaped, r"\\\*", ".*")
    return F.concat(F.lit("^"), wild, F.when(ends, F.lit("$"))
                    .otherwise(F.lit("")))


def robots_allowed_rep(path_col, allow_col, disallow_col):
    """Full RFC 9309 (Google REP) rule matching — the wildcard upgrade of
    :func:`robots_allowed`: ``*`` matches any char run, a trailing ``$``
    anchors the rule to the path end, and the most-specific (LONGEST, in
    rule octets — RFC 9309 §2.2.2) matching rule wins, Allow beating
    Disallow on ties. Rules without metacharacters degrade to exactly
    the prefix semantics of the base matcher (``^literal``), so this is
    a strict superset.

    All native: each rule compiles to an anchored regex inside a
    transform() lambda (escape metachars, ``*`` -> ``.*``) and matches
    with per-row RLIKE; specificity is array_max over matched rule
    lengths. Rule arrays are per-host and tiny (they ride the broadcast
    robots join), so the per-row regex compilation cost is bounded by
    rules-per-host, not corpus size.
    """
    def longest(rules):
        scored = F.transform(
            rules,
            lambda r: F.when(F.regexp_like(path_col, _rule_regex(r)),
                             F.length(r))
            .otherwise(F.lit(-1)))
        return F.coalesce(F.array_max(scored), F.lit(-1))

    la = longest(F.coalesce(allow_col, F.array().cast("array<string>")))
    ld = longest(F.coalesce(disallow_col, F.array().cast("array<string>")))
    return (ld == -1) | (la >= ld)


def robots_allowed_rep_sql_expr(path_sql: str, allow_sql: str,
                                disallow_sql: str) -> str:
    """DuckDB scalar twin of :func:`robots_allowed_rep` — identical
    escape chain, ``.*`` substitution, anchors, longest-octets pick."""
    def longest(rules_sql: str) -> str:
        rx = (
            "'^' || replace(regexp_replace("
            "  CASE WHEN r LIKE '%$' THEN substr(r, 1, length(r) - 1)"
            "       ELSE r END,"
            r"  '([\\.\^\$\|\(\)\[\]\{{\}}\+\?\*\\\\])', '\\\1', 'g'),"
            "  '\\*', '.*')"
            " || CASE WHEN r LIKE '%$' THEN '$' ELSE '' END"
        )
        return (
            f"coalesce(list_max(list_transform(coalesce({rules_sql}, []),"
            f" r -> CASE WHEN regexp_matches({path_sql}, {rx})"
            " THEN length(r) ELSE -1 END)), -1)"
        )

    la = longest(allow_sql)
    ld = longest(disallow_sql)
    return f"(({ld}) = -1 OR ({la}) >= ({ld}))"
