"""Per-document extraction engine (SURVEY.md §2.3, P1-P17).

A stdlib-only re-implementation of the reference's declarative selector
programs (/root/reference/src/llm_scraper/parsers/base.py) — the sandbox
has no bs4/lxml/markdownify, and at 100 TB the parse must be cheap and
dependency-light anyway. The engine parses each page ONCE into a small DOM
(html.parser), then runs CSS-lite and XPath-lite selector programs,
3-layer cleanup, meta/JSON-LD extraction, and markdown/text conversion —
all inside one Arrow-batched pandas UDF per document batch.
"""

from .pipeline import extract_article, extract_articles_udf, load_parser_configs  # noqa: F401
