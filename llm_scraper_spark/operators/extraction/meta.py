"""Meta-tag extraction (reference P15/P17,
/root/reference/src/llm_scraper/models/meta.py:268-336,403-434) as plain
dicts (no pydantic in the executor hot path).
"""

from __future__ import annotations

import re

from ...functions.urls import canonicalize_url  # noqa: F401  (doc cross-ref)
from .dom import Node

# reference rejected topic keywords (models/meta.py:340-344)
REJECTED_TOPICS = ("home", "homepage", "trang")


def normalize_str_ref(value) -> str:
    """Bug-compatible normalize_str (utils/normalization.py:73-80): the
    [\\r\\n\\t] collapse is lost; only 2+ space collapse + strip apply."""
    if isinstance(value, bytes):
        value = value.decode("utf-8", errors="ignore")
    if not isinstance(value, str) or not value:
        return ""
    s = re.sub(r" {2,}", " ", value)
    return s.strip()


def normalize_list_str(value, rejected=()) -> list[str]:
    """utils/normalization.py:61-70."""
    if isinstance(value, (list, tuple, set)):
        values = [normalize_str_ref(s) for s in value if isinstance(s, str)]
    else:
        if isinstance(value, bytes):
            value = value.decode("utf-8", errors="ignore")
        if isinstance(value, str):
            values = [normalize_str_ref(s) for s in re.split(r"[\r\n\t,]+", value)]
        else:
            values = []
    return [s.strip() for s in values
            if s.strip() and s.lower().strip() not in rejected]


def meta_dict(root: Node) -> dict[str, str]:
    """All <meta> tags keyed by property|name (meta.py:274-280)."""
    out: dict[str, str] = {}
    for tag in root.find_all("meta"):
        key = tag.get("property") or tag.get("name")
        content = tag.get("content")
        if key and content:
            out[key] = content
    return out


def response_meta(root: Node) -> dict:
    """ResponseMeta-equivalent dict (meta.py:403-434 + Meta.from_soup):

    keys: title, description, author, language, locale, canonical,
    date_published, date_modified (raw strings), tags, topics, image.
    Precedence mirrors the reference exactly:
      title: og:title > twitter:title > meta[name=title] ... > <title> text
      is NOT part of Meta.from_soup (it reads only meta tags); the <title>
      element fallback happens nowhere in the reference -> not added here.
      date_published: article:published_time > datePublished > dateCreated
      tags: article:tag > keywords > news_keywords
      topics: article:section split
      language: <html lang> > locale.split('_')[0]
    """
    md = meta_dict(root)
    title = md.get("og:title") or md.get("twitter:title") or md.get("title")
    description = md.get("description") or md.get("og:description")
    author = md.get("author")
    locale = md.get("og:locale")

    html_el = root.find("html")
    language = None
    if html_el is not None and html_el.get("lang"):
        language = html_el.get("lang")
    elif locale:
        language = locale.split("_")[0]

    date_published = (
        md.get("article:published_time")
        or md.get("datePublished")
        or md.get("dateCreated")
    )
    date_modified = md.get("article:modified_time") or md.get("dateModified")

    if md.get("article:tag"):
        tags = normalize_list_str(md.get("article:tag"))
    else:
        tags = normalize_list_str(md.get("keywords")) or normalize_list_str(
            md.get("news_keywords")
        )
    topics = normalize_list_str(md.get("article:section"), REJECTED_TOPICS)

    # full nested OG/article/twitter surface (Meta.from_soup,
    # /root/reference/src/llm_scraper/models/meta.py:282-306): plain dicts
    # with None values dropped; twitter:* keys prefix-stripped (we keep the
    # raw k:v map where the reference's pydantic TwitterCard would validate)
    article_data = {
        k: md.get(f"article:{k}")
        for k in ("published_time", "modified_time", "author", "section", "tag")
        if md.get(f"article:{k}") is not None
    }
    og_data = {
        k: md.get(f"og:{k}")
        for k in ("title", "description", "url", "site_name", "locale")
        if md.get(f"og:{k}") is not None
    }
    if md.get("og:image"):
        og_data["image"] = {"image": md.get("og:image")}
    twitter_data = {
        k[len("twitter:"):]: v for k, v in md.items() if k.startswith("twitter:")
    }
    nest = {}
    if article_data:
        nest["article"] = article_data
    if og_data:
        nest["open_graph"] = og_data
    if twitter_data:
        nest["twitter"] = twitter_data

    return {
        "title": normalize_str_ref(title) or None,
        "description": normalize_str_ref(description) or None,
        "author": normalize_str_ref(author) or None,
        "language": language,
        "locale": locale,
        "canonical": md.get("og:url") or md.get("canonical"),
        "date_published": date_published,
        "date_modified": date_modified,
        "tags": tags,
        "topics": topics,
        "image": md.get("og:image") or md.get("twitter:image"),
        "nest": nest,
        "_meta": md,
    }
