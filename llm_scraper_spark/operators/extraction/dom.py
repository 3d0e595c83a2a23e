"""Minimal DOM over html.parser (stdlib) — the engine's one-parse tree.

The reference parses every page TWICE (bs4 + lxml,
/root/reference/src/llm_scraper/parsers/base.py:29-37) — a documented
de-optimization (SURVEY.md §4) we deliberately do not replicate: one parse
feeds both selector engines.
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# elements whose open tag implicitly closes a same-name ancestor
_AUTOCLOSE_SAME = frozenset(("p", "li", "option", "tr", "td", "th", "dd", "dt"))


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "text")

    def __init__(self, tag: str | None, attrs: dict | None = None,
                 text: str | None = None):
        self.tag = tag          # None for text nodes
        self.attrs = attrs or {}
        self.children: list[Node] = []
        self.parent: Node | None = None
        self.text = text        # set only for text nodes

    # --- tree ops ---------------------------------------------------------
    def append(self, node: "Node") -> None:
        node.parent = self
        self.children.append(node)

    def detach(self) -> None:
        """decompose(): remove self from the parent's children."""
        if self.parent is not None:
            self.parent.children = [c for c in self.parent.children if c is not self]
            self.parent = None

    def iter_elements(self):
        """All element descendants, document order (self excluded)."""
        stack = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if n.tag is not None:
                yield n
                stack.extend(reversed(n.children))

    def iter_text(self):
        stack = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if n.tag is None:
                yield n.text
            else:
                stack.extend(reversed(n.children))

    # --- accessors --------------------------------------------------------
    def get(self, attr: str, default=None):
        return self.attrs.get(attr, default)

    @property
    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    def get_text(self, separator: str = "", strip: bool = False) -> str:
        """bs4 get_text semantics: join (optionally stripped, empty-dropped)
        text pieces with the separator."""
        pieces = list(self.iter_text())
        if strip:
            pieces = [p.strip() for p in pieces]
            pieces = [p for p in pieces if p]
        return separator.join(pieces)

    def text_content(self) -> str:
        """lxml text_content(): raw concatenation of all text."""
        return "".join(self.iter_text())

    def find(self, tag: str) -> "Node | None":
        for el in self.iter_elements():
            if el.tag == tag:
                return el
        return None

    def find_all(self, tag: str) -> list["Node"]:
        return [el for el in self.iter_elements() if el.tag == tag]

    # --- serialization ----------------------------------------------------
    def inner_html(self) -> str:
        return "".join(_serialize(c) for c in self.children)

    def outer_html(self) -> str:
        return _serialize(self)

    def __repr__(self):  # pragma: no cover
        return f"<Node {self.tag or 'text'!r}>"


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _serialize(n: Node) -> str:
    if n.tag is None:
        return _escape(n.text or "")
    attrs = "".join(
        f' {k}' if v is None else f' {k}="{v}"' for k, v in n.attrs.items()
    )
    if n.tag in VOID_ELEMENTS:
        return f"<{n.tag}{attrs}/>"
    return f"<{n.tag}{attrs}>{n.inner_html()}</{n.tag}>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        if tag in _AUTOCLOSE_SAME and self.stack[-1].tag == tag:
            self.stack.pop()
        node = Node(tag, dict(attrs))
        self.stack[-1].append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].append(Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched end tag: ignore (tolerant parse)

    def handle_data(self, data):
        if data:
            self.stack[-1].append(Node(None, text=data))


def parse_html(html: str) -> Node:
    """Parse HTML into the engine DOM; tolerant of malformed markup."""
    builder = _TreeBuilder()
    try:
        builder.feed(html or "")
        builder.close()
    except Exception:
        pass  # keep whatever was built (tolerant parse like lxml recover)
    return builder.root


def _clone(node: Node) -> Node:
    new = Node(node.tag, dict(node.attrs), node.text)
    for c in node.children:
        new.append(_clone(c))
    return new


def clone(self: Node) -> Node:
    """Deep-copy the subtree (parent pointer NOT copied — a naive deepcopy
    would chase .parent and clone the whole document)."""
    return _clone(self)


Node.clone = clone
