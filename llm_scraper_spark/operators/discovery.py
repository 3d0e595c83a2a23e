"""Feed discovery parsers (SURVEY.md §2.1 S2-S6): robots/sitemap/RSS/Atom.

Semantics-exact re-expression of /root/reference/discovery.py:

- ``parse_sitemap`` (discovery.py:28-60): <loc> URLs, transparent gunzip on
  the 1f8b magic, sitemapindex fallback treated as discoverable URLs.
- ``parse_rss_feed`` (discovery.py:78-93): item/link text + Atom entry/link
  href.
- ``find_sitemaps_from_robots`` (discovery.py:15-25): 'Sitemap:' lines,
  absolutized against the base URL.

Spark surface: one pandas UDF per parser over a ``feeds_raw(feed_url, host,
kind, body binary)`` table, then ``explode`` — the seed-expansion stage of
§3.2. The union of all discovered URLs deduped first-occurrence is the
frontier bootstrap (D4: discovery.py:107,121,131 set-union semantics).
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

URLS_TYPE = T.ArrayType(T.StringType())


def parse_sitemap(content: bytes) -> list[str]:
    """Pure function mirroring discovery.py:28-60 (incl. gzip + index fallback)."""
    urls: list[str] = []
    if content is None:
        return urls
    try:
        if content[:2] == b"\x1f\x8b":
            content = gzip.decompress(content)
        root = ET.fromstring(content)
        namespace = {"ns": root.tag.split("}")[0][1:]} if "}" in root.tag else {"ns": ""}
        for loc in root.findall(".//ns:loc", namespace):
            if loc.text:
                urls.append(loc.text.strip())
    except ET.ParseError:
        try:
            root = ET.fromstring(content)
            namespace = {"ns": root.tag.split("}")[0][1:]} if "}" in root.tag else {"ns": ""}
            for sitemap in root.findall(".//ns:sitemap/ns:loc", namespace):
                if sitemap.text:
                    urls.append(sitemap.text.strip())
        except ET.ParseError:
            pass
    return urls


ATOM = "{http://www.w3.org/2005/Atom}"


def parse_rss_feed(content: bytes) -> list[str]:
    """Pure function mirroring discovery.py:78-93 (RSS item/link + Atom entry/link)."""
    urls: list[str] = []
    if content is None:
        return urls
    try:
        root = ET.fromstring(content)
        for item in root.findall(".//item/link") + root.findall(
            f".//{ATOM}entry/{ATOM}link"
        ):
            url = item.text or item.get("href")
            if url:
                urls.append(url.strip())
    except ET.ParseError:
        pass
    return urls


def find_sitemaps_from_robots(robots_txt: str, base_url: str) -> list[str]:
    """Pure function mirroring discovery.py:15-25."""
    sitemaps = []
    for line in (robots_txt or "").splitlines():
        if line.lower().startswith("sitemap:"):
            sitemaps.append(urljoin(base_url, line.split(":", 1)[1].strip()))
    return sitemaps


def find_rss_feeds(html: str, base_url: str) -> list[str]:
    """S4 (discovery.py:63-75): <link type="application/rss+xml|atom+xml">
    hrefs from the page head, absolutized — over the engine DOM."""
    from .extraction.dom import parse_html

    feeds = []
    root = parse_html(html)
    for link in root.find_all("link"):
        if (link.get("type") or "") in (
            "application/rss+xml", "application/atom+xml"
        ):
            href = link.get("href")
            if href:
                feeds.append(urljoin(base_url, href))
    return feeds


SITEMAP_ENTRY_TYPE = T.ArrayType(T.StructType([
    T.StructField("loc", T.StringType()),
    T.StructField("lastmod", T.StringType()),
    T.StructField("changefreq", T.StringType()),
    T.StructField("priority", T.DoubleType()),
]))


def parse_sitemap_entries(content: bytes) -> list[tuple]:
    """Full per-URL sitemap entries — (loc, lastmod, changefreq, priority)
    per the sitemaps.org protocol. Extension beyond the reference (its
    discovery.py:28-60 keeps only <loc>): priority/lastmod feed the
    priority frontier (operators/frontier.py schedule_wave orders by
    priority DESC) and freshness-aware re-crawl. Same tolerance rules as
    parse_sitemap: gzip sniff, namespace-agnostic, malformed -> []; a
    missing <priority> defaults to 0.5 (protocol default), missing
    lastmod/changefreq stay NULL, entries without <loc> are dropped."""
    out: list[tuple] = []
    if content is None:
        return out
    try:
        if content[:2] == b"\x1f\x8b":
            content = gzip.decompress(content)
        root = ET.fromstring(content)
        ns = root.tag.split("}")[0][1:] if "}" in root.tag else ""
        pre = ("{" + ns + "}") if ns else ""
        for url_el in root.iter(pre + "url"):
            loc = url_el.findtext(pre + "loc")
            if not loc or not loc.strip():
                continue
            pr_text = url_el.findtext(pre + "priority")
            try:
                priority = float(pr_text) if pr_text is not None else 0.5
            except ValueError:
                priority = 0.5
            lastmod = url_el.findtext(pre + "lastmod")
            changefreq = url_el.findtext(pre + "changefreq")
            out.append((loc.strip(),
                        lastmod.strip() if lastmod else None,
                        changefreq.strip() if changefreq else None,
                        priority))
    except ET.ParseError:
        pass
    return out


@F.pandas_udf(SITEMAP_ENTRY_TYPE)
def sitemap_entries_udf(bodies: pd.Series) -> pd.Series:
    return bodies.map(
        lambda b: parse_sitemap_entries(bytes(b) if b is not None else None))


@F.pandas_udf(URLS_TYPE)
def parse_sitemap_udf(bodies: pd.Series) -> pd.Series:
    return bodies.map(lambda b: parse_sitemap(bytes(b) if b is not None else None))


@F.pandas_udf(URLS_TYPE)
def parse_rss_udf(bodies: pd.Series) -> pd.Series:
    return bodies.map(lambda b: parse_rss_feed(bytes(b) if b is not None else None))


@F.pandas_udf(URLS_TYPE)
def rss_links_udf(htmls: pd.Series, base_urls: pd.Series) -> pd.Series:
    """S4 as a batch UDF: RSS/Atom <link> hrefs from page heads,
    absolutized against the page URL (find_rss_feeds over the stdlib DOM
    engine)."""
    return pd.Series(
        [find_rss_feeds(h if h is not None else "", b)
         for h, b in zip(htmls, base_urls)]
    )


@F.pandas_udf(URLS_TYPE)
def robots_sitemaps_udf(bodies: pd.Series, base_urls: pd.Series) -> pd.Series:
    return pd.Series(
        [
            find_sitemaps_from_robots(
                (bytes(b).decode("utf-8", errors="ignore") if b is not None else ""),
                base,
            )
            for b, base in zip(bodies, base_urls)
        ]
    )


def discover_from_feeds(feeds_raw: DataFrame) -> DataFrame:
    """feeds_raw(feed_url, host, kind, body) -> (host, url, disc_ord) candidates.

    Dispatch by kind, parse batch-wise, explode with position so
    first-occurrence dedup preserves in-feed discovery order (D3/D4).
    Manual-priority semantics (S6, discovery.py:135-138) are the caller's
    concern: pass only the manual feeds when the config lists any.
    """
    base = F.concat(F.lit("https://"), F.col("host"), F.lit("/"))
    parsed = feeds_raw.withColumn(
        "urls",
        F.when(F.col("kind").isin("sitemap", "sitemapindex"),
               parse_sitemap_udf(F.col("body")))
        .when(F.col("kind").isin("rss", "atom"), parse_rss_udf(F.col("body")))
        .when(F.col("kind") == "robots", robots_sitemaps_udf(F.col("body"), base))
        .otherwise(F.array().cast("array<string>")),
    )
    return parsed.select(
        "feed_url", "host", "kind",
        F.posexplode_outer("urls").alias("link_idx", "url"),
    ).filter(F.col("url").isNotNull())
