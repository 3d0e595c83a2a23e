"""HTML -> Markdown / plain text (reference P11/P12,
articles.py:446-461: ``markdownify(heading_style="ATX", strip=['script',
'style'], bullets='-')`` then the blank-line squeeze).

A markdownify-conformant converter over the engine DOM. The reference
pins ``markdownify>=1.2.0`` (pyproject.toml:30); this module reproduces
that library's documented 1.x conversion rules AS OBSERVED THROUGH the
reference's post-processing (every line stripped, blank lines dropped —
articles.py:456), which is the only form the reference ever emits:

- ATX headings, ``-`` bullets, ordered lists numbered from ``start``
- inline chomp: leading/trailing whitespace moves OUTSIDE ``**``/``*``/
  ``~~``/backtick markers (``a<b> x </b>b`` -> ``a **x** b``)
- default escaping: ``*`` and ``_`` in text become ``\\*`` / ``\\_``
  (markdownify defaults escape_asterisks/escape_underscores=True,
  escape_misc=False); no escaping inside code/pre/kbd/samp
- autolinks: ``<a href=U>U</a>`` -> ``<U>`` (markdownify default
  autolinks=True); link/image titles -> ``[t](u "title")``
- ``del``/``s`` -> ``~~x~~``; ``kbd``/``samp`` -> backticks
- tables -> pipe rows with a ``---`` separator under the header row
  (markdownify table rules: an all-``th`` first row is the header; a
  headerless first row gets an empty header + separator above it)

Conformance is pinned by tests/test_markdown_conformance.py: public
markdownify test-suite vectors transcribed and passed through the same
squeeze the reference applies. Byte-equality against the live library
remains unprovable in-sandbox (markdownify not installable) — the
vectors are the spec.
"""

from __future__ import annotations

import re

from .dom import Node

_SKIP = {"script", "style", "noscript", "template", "head"}
_BLOCK = {"p", "div", "section", "article", "main", "header", "footer",
          "ul", "ol", "li", "blockquote", "pre", "table", "tr",
          "h1", "h2", "h3", "h4", "h5", "h6", "figure", "figcaption"}
# escaping is suppressed inside these (markdownify convert_code family)
_CODE = {"code", "pre", "kbd", "samp"}


def _escape(text: str) -> str:
    return re.sub(r"([*_])", r"\\\1", text)


def _chomp(inner: str) -> tuple[str, str, str]:
    """markdownify's chomp: whitespace framing an inline element moves
    outside the emphasis markers so ``** x **`` can't occur."""
    prefix = " " if inner and inner[0] == " " else ""
    suffix = " " if inner and inner[-1] == " " else ""
    return prefix, suffix, inner.strip()


def _inline(inner: str, marker: str) -> str:
    p, s, t = _chomp(inner)
    return f"{p}{marker}{t}{marker}{s}" if t else ""


def _li_bullet(node: Node) -> str:
    """'-' for ul items; 'N.' for ol items counted over preceding li
    siblings from the ol's start attribute (markdownify convert_li)."""
    parent = node.parent
    if parent is not None and parent.tag == "ol":
        start_attr = parent.get("start")
        start = (int(start_attr)
                 if start_attr and str(start_attr).isdigit() else 1)
        prev = 0
        for c in parent.children:
            if c is node:
                break
            if c.tag == "li":
                prev += 1
        return f"{start + prev}."
    return "-"


def _tr(node: Node, in_code: bool) -> str:
    cells = [c for c in node.children if c.tag in ("td", "th")]
    texts = ["".join(_md(gc, in_code=in_code) for gc in c.children).strip()
             for c in cells]
    row = "| " + " | ".join(texts) + " |"
    sep = "| " + " | ".join(["---"] * len(cells)) + " |"
    table = node.parent
    while table is not None and table.tag != "table":
        table = table.parent
    first = None
    if table is not None:
        for el in table.iter_elements():
            if el.tag == "tr":
                first = el
                break
    if first is node and cells:
        if all(c.tag == "th" for c in cells):
            return f"\n{row}\n{sep}\n"
        # headerless table: markdownify inserts an empty header row
        empty = "| " + " | ".join([""] * len(cells)) + " |"
        return f"\n{empty}\n{sep}\n{row}\n"
    return f"\n{row}\n"


def _md(node: Node, depth: int = 0, in_code: bool = False) -> str:
    if node.tag is None:
        text = re.sub(r"\s+", " ", node.text or "")
        return text if in_code else _escape(text)
    if node.tag in _SKIP:
        return ""
    tag = node.tag
    if tag == "tr":
        return _tr(node, in_code)
    inner = "".join(
        _md(c, depth + (1 if tag in ("ul", "ol") else 0),
            in_code or tag in _CODE)
        for c in node.children)
    if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
        return f"\n\n{'#' * int(tag[1])} {inner.strip()}\n\n"
    if tag == "p":
        return f"\n\n{inner.strip()}\n\n"
    if tag == "br":
        return "\n"
    if tag == "hr":
        return "\n\n---\n\n"
    if tag in ("strong", "b"):
        return _inline(inner, "**")
    if tag in ("em", "i"):
        return _inline(inner, "*")
    if tag in ("del", "s"):
        return _inline(inner, "~~")
    if tag in ("code", "kbd", "samp"):
        return _inline(inner, "`")
    if tag == "pre":
        return f"\n\n```\n{node.get_text()}\n```\n\n"
    if tag == "a":
        href = node.get("href")
        title = node.get("title")
        p, s, text = _chomp(inner)
        if not (href and text):
            return text
        # autolink check must un-escape every char the text escaper
        # escaped (markdownify compares pre-escape text to href): both
        # \_ and \* or an href containing '*' never matches
        if text.replace(r"\_", "_").replace(r"\*", "*") == href and not title:
            return f"{p}<{href}>{s}"
        title_part = ' "{}"'.format(title.replace('"', '\\"')) if title else ""
        return f"{p}[{text}]({href}{title_part}){s}"
    if tag == "img":
        alt = node.get("alt") or ""
        src = node.get("src") or ""
        title = node.get("title")
        title_part = ' "{}"'.format(title.replace('"', '\\"')) if title else ""
        return f"![{alt}]({src}{title_part})" if src else ""
    if tag == "li":
        return f"\n{_li_bullet(node)} {inner.strip()}"
    if tag in ("ul", "ol"):
        return f"\n{inner}\n"
    if tag == "blockquote":
        # markdownify prefixes EVERY line (line_beginning_re.sub('> ')),
        # including blanks between nested quotes — post-squeeze those
        # survive as a bare '>' connector line
        body = inner.strip()
        quoted = "\n".join(f"> {line}" for line in body.splitlines())
        # single leading newline (markdownify: '\n%s\n\n'), so an inner
        # blockquote attaches flush under its preceding sibling text
        return f"\n{quoted}\n\n"
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
