"""JSON-LD (schema.org) extraction (reference P16,
parsers/base.py:393-439 + models/schema.py:219-278).

- every <script type="application/ld+json"> parsed tolerantly
- @graph flattened (models/helper.py:101-121)
- topics from BreadcrumbList itemListElement names (position>1 pages,
  deduped order-preserving, capped 5 — models/schema.py:210-216) and from
  articleSection of Article/NewsArticle/WebPage
"""

from __future__ import annotations

import json

from .dom import Node
from .meta import REJECTED_TOPICS

ARTICLE_TYPES = {"Article", "NewsArticle", "WebPage", "BlogPosting", "Report"}


def normalize_dict(obj) -> dict:
    """Tolerant dict coercion — standalone twin of the reference
    ``normalize_dict`` (/root/reference/src/llm_scraper/utils/normalization.py:82-92):
    dict passes through; bytes decode utf-8 (strict, as upstream — a
    decode error propagates); str json-parses; parse failure or any other
    type -> {}. The Spark column analogue is
    ``coalesce(from_json(c, schema), empty)`` — this is the Python-side
    form the extraction UDFs use."""
    if isinstance(obj, dict):
        return obj
    if isinstance(obj, (bytes, bytearray)):
        obj = bytes(obj).decode("utf-8")
    if isinstance(obj, str):
        try:
            return json.loads(obj)
        except json.JSONDecodeError:
            pass
    return {}


def _iter_schemas(raw):
    """Flatten top-level lists and @graph containers into schema dicts."""
    if isinstance(raw, list):
        for item in raw:
            yield from _iter_schemas(item)
    elif isinstance(raw, dict):
        if "@graph" in raw and isinstance(raw["@graph"], list):
            for item in raw["@graph"]:
                yield from _iter_schemas(item)
        else:
            yield raw


def _breadcrumb_topics(schema: dict) -> list[str]:
    """BreadcrumbList -> item names, skipping the first crumb (site home),
    dedup order-preserving, cap 5 (models/schema.py:196-216)."""
    items = schema.get("itemListElement")
    if not isinstance(items, list):
        return []
    names = []
    for el in items:
        if isinstance(el, dict):
            name = el.get("name")
            if name is None and isinstance(el.get("item"), dict):
                name = el["item"].get("name")
            pos = el.get("position")
            if name and (pos is None or (isinstance(pos, (int, float)) and pos > 1)):
                names.append(str(name).strip())
    names = [n for n in names if n and n.lower() not in REJECTED_TOPICS]
    return list(dict.fromkeys(names))[:5]


def _sections(schema: dict) -> list[str]:
    sec = schema.get("articleSection")
    if isinstance(sec, list):
        return [str(s) for s in sec]
    if isinstance(sec, str):
        return [sec]
    return []


def extract_jsonld(root: Node) -> dict:
    """-> {schemas: [raw dicts], topics: [...], headline, date_published,
    date_modified, authors: [...]}; topic precedence mirrors
    parsers/base.py:418-433 (breadcrumbs + articleSection union in
    document order)."""
    schemas: list[dict] = []
    topics: list[str] = []
    headline = None
    date_published = None
    date_modified = None
    authors: list[str] = []

    for script in root.find_all("script"):
        if (script.get("type") or "").strip().lower() != "application/ld+json":
            continue
        payload = script.get_text()
        if not payload or not payload.strip():
            continue
        try:
            raw = json.loads(payload)
        except Exception:
            continue
        if isinstance(raw, (dict, list)):
            schemas.append(raw)
        for schema in _iter_schemas(raw):
            stype = schema.get("@type")
            stypes = set(stype) if isinstance(stype, list) else {stype}
            if "BreadcrumbList" in stypes:
                topics.extend(_breadcrumb_topics(schema))
            if stypes & ARTICLE_TYPES:
                topics.extend(_sections(schema))
                headline = headline or schema.get("headline")
                date_published = date_published or schema.get("datePublished")
                date_modified = date_modified or schema.get("dateModified")
                auth = schema.get("author")
                if isinstance(auth, dict) and auth.get("name"):
                    authors.append(str(auth["name"]))
                elif isinstance(auth, list):
                    authors.extend(
                        str(a.get("name")) for a in auth
                        if isinstance(a, dict) and a.get("name")
                    )
                elif isinstance(auth, str):
                    authors.append(auth)

    return {
        "schemas": schemas,
        "topics": topics,
        "headline": headline,
        "date_published": date_published,
        "date_modified": date_modified,
        "authors": authors,
    }
