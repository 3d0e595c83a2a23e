"""HTML -> Markdown / plain text (reference P11/P12,
articles.py:446-461: markdownify with ATX headings, '-' bullets,
script/style stripped, then blank-line squeeze).

A markdownify-lite over the engine DOM covering the constructs article
bodies use: headings, paragraphs, lists, links, emphasis, code, blockquote,
images, line breaks, tables degraded to text.
"""

from __future__ import annotations

import re

from .dom import Node

_SKIP = {"script", "style", "noscript", "template", "head"}
_BLOCK = {"p", "div", "section", "article", "main", "header", "footer",
          "ul", "ol", "li", "blockquote", "pre", "table", "tr",
          "h1", "h2", "h3", "h4", "h5", "h6", "figure", "figcaption"}


def _md(node: Node, depth: int = 0) -> str:
    if node.tag is None:
        return re.sub(r"\s+", " ", node.text or "")
    if node.tag in _SKIP:
        return ""
    inner = "".join(_md(c, depth + (1 if node.tag in ("ul", "ol") else 0))
                    for c in node.children)
    tag = node.tag
    if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
        return f"\n\n{'#' * int(tag[1])} {inner.strip()}\n\n"
    if tag == "p":
        return f"\n\n{inner.strip()}\n\n"
    if tag == "br":
        return "\n"
    if tag == "hr":
        return "\n\n---\n\n"
    if tag in ("strong", "b"):
        s = inner.strip()
        return f"**{s}**" if s else ""
    if tag in ("em", "i"):
        s = inner.strip()
        return f"*{s}*" if s else ""
    if tag == "code":
        return f"`{inner.strip()}`" if inner.strip() else ""
    if tag == "pre":
        return f"\n\n```\n{node.get_text()}\n```\n\n"
    if tag == "a":
        href = node.get("href")
        s = inner.strip()
        return f"[{s}]({href})" if href and s else s
    if tag == "img":
        alt = node.get("alt") or ""
        src = node.get("src") or ""
        return f"![{alt}]({src})" if src else ""
    if tag == "li":
        return f"\n- {inner.strip()}"
    if tag in ("ul", "ol"):
        return f"\n{inner}\n"
    if tag == "blockquote":
        body = inner.strip()
        quoted = "\n".join(f"> {line}" for line in body.splitlines() if line.strip())
        return f"\n\n{quoted}\n\n"
    if tag in _BLOCK:
        return f"\n{inner}\n"
    return inner


def to_markdown(node: Node) -> str:
    """Markdown + the reference's whitespace squeeze (articles.py:456):
    every line stripped, blank lines dropped."""
    md = _md(node)
    return "\n".join(line.strip() for line in md.split("\n") if line.strip())


def to_plain_text(node: Node) -> str:
    """get_text(separator=' ', strip=True) + split/join squeeze
    (articles.py:459-461)."""
    return " ".join(node.get_text(separator=" ", strip=True).split())
