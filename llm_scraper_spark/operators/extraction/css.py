"""CSS-lite selector engine over the stdlib DOM (reference P2:
bs4 soup.select semantics for the selector subset the 93 domain configs
and the reference test suite actually use).

Supported grammar:
    group      : selector ("," selector)*
    selector   : compound ((">" | " ") compound)*
    compound   : [tag | "*"] ("#id" | ".class" | "[attr]" | "[attr<op>val]")*
    <op>       : = ^= $= *= ~=
"""

from __future__ import annotations

import re

from .dom import Node

_TOKEN = re.compile(
    r"""
    (?P<combinator>\s*>\s*|\s+)
  | (?P<tag>[a-zA-Z][\w-]*|\*)
  | \#(?P<id>[\w-]+)
  | \.(?P<cls>[\w-]+)
  | \[(?P<attr>[\w-]+)(?:(?P<op>[~^$*|]?=)(?P<val>"[^"]*"|'[^']*'|[^\]]*))?\]
    """,
    re.VERBOSE,
)


class Compound:
    __slots__ = ("tag", "ids", "classes", "attrs")

    def __init__(self):
        self.tag: str | None = None
        self.ids: list[str] = []
        self.classes: list[str] = []
        self.attrs: list[tuple[str, str | None, str | None]] = []

    def matches(self, node: Node) -> bool:
        if node.tag is None:
            return False
        if self.tag and self.tag != "*" and node.tag != self.tag:
            return False
        if self.ids and node.get("id") not in self.ids:
            return False
        if self.classes:
            cls = node.classes
            if any(c not in cls for c in self.classes):
                return False
        for attr, op, val in self.attrs:
            actual = node.get(attr)
            if actual is None:
                return False
            if op is None:
                continue
            if op == "=" and actual != val:
                return False
            if op == "^=" and not actual.startswith(val):
                return False
            if op == "$=" and not actual.endswith(val):
                return False
            if op == "*=" and val not in actual:
                return False
            if op == "~=" and val not in actual.split():
                return False
        return True


def parse_selector(sel: str) -> list[list[tuple[str, Compound]]]:
    """-> groups; each group = [(combinator, compound), ...] left-to-right,
    combinator in {'root', 'descendant', 'child'}."""
    groups = []
    for part in sel.split(","):
        part = part.strip()
        if not part:
            continue
        chain: list[tuple[str, Compound]] = []
        pos = 0
        pending_comb = "root"
        cur: Compound | None = None
        while pos < len(part):
            m = _TOKEN.match(part, pos)
            if not m:
                raise ValueError(f"bad CSS selector: {sel!r} at {part[pos:]!r}")
            pos = m.end()
            if m.group("combinator") is not None:
                if cur is not None:
                    chain.append((pending_comb, cur))
                    cur = None
                pending_comb = "child" if ">" in m.group("combinator") else "descendant"
                continue
            if cur is None:
                cur = Compound()
            if m.group("tag"):
                cur.tag = m.group("tag")
            elif m.group("id"):
                cur.ids.append(m.group("id"))
            elif m.group("cls"):
                cur.classes.append(m.group("cls"))
            elif m.group("attr"):
                val = m.group("val")
                if val is not None and len(val) >= 2 and val[0] in "\"'" and val[-1] == val[0]:
                    val = val[1:-1]
                cur.attrs.append((m.group("attr"), m.group("op"), val))
        if cur is not None:
            chain.append((pending_comb, cur))
        if chain:
            groups.append(chain)
    if not groups:
        raise ValueError(f"empty CSS selector: {sel!r}")
    return groups


def _matches_chain(node: Node, chain: list[tuple[str, Compound]], scope: Node) -> bool:
    """Right-to-left match with ancestor walking, bounded by the scope."""
    comb, compound = chain[-1]
    if not compound.matches(node):
        return False
    idx = len(chain) - 2
    current = node
    while idx >= 0:
        comb_here = chain[idx + 1][0]  # combinator BETWEEN chain[idx] and its right
        comb_here = comb_here if comb_here != "root" else "descendant"
        target = chain[idx][1]
        anc = current.parent
        if comb_here == "child":
            if anc is None or anc is scope.parent or not target.matches(anc):
                return False
            current = anc
        else:  # descendant: find any matching ancestor within scope
            found = None
            while anc is not None and anc is not scope.parent:
                if target.matches(anc):
                    found = anc
                    break
                anc = anc.parent
            if found is None:
                return False
            current = found
        idx -= 1
    return True


def select(scope: Node, selector: str) -> list[Node]:
    """All matching element descendants of scope, document order."""
    groups = parse_selector(selector)
    out: list[Node] = []
    seen = set()
    for node in scope.iter_elements():
        for chain in groups:
            if _matches_chain(node, chain, scope):
                if id(node) not in seen:
                    seen.add(id(node))
                    out.append(node)
                break
    return out


def select_one(scope: Node, selector: str) -> Node | None:
    groups = parse_selector(selector)
    for node in scope.iter_elements():
        for chain in groups:
            if _matches_chain(node, chain, scope):
                return node
    return None
