"""XPath-lite engine over the stdlib DOM (reference P3: lxml .xpath() for
the expression subset used by the 93 domain configs, e.g.
"//article[@id='article']/div[3]",
"//div[normalize-space(@class)='post']", "//a[@rel='author']",
"//time[@datetime]/@datetime", "//meta[@property='x']/@content").

Supported steps: ``//tag``, ``/tag``, ``*``, ``.``, terminal ``@attr``.
Predicates: ``[@attr]``, ``[@attr='v']``, ``[n]``, ``[normalize-space(@a)='v']``,
``[contains(@a,'v')]``, ``[starts-with(@a,'v')]`` — combinable; positional
predicates apply per-context (proper XPath semantics).

A terminal ``/@attr`` returns attribute *strings*. NB the reference then
filters results to element nodes only (parsers/base.py:145), so attribute-
returning XPaths never match and the fallback chain moves on — a real
reference quirk we preserve at the call site (values.py / pipeline.py).
"""

from __future__ import annotations

import re

from .dom import Node

_STEP_RE = re.compile(r"(//|/)([^/]+)")
_PRED_RE = re.compile(r"\[([^\]]*)\]")


class _Step:
    __slots__ = ("axis", "test", "preds")

    def __init__(self, axis: str, test: str, preds: list[str]):
        self.axis = axis      # 'child' | 'descendant'
        self.test = test      # tag | '*' | '@attr'
        self.preds = preds


def _parse(path: str) -> tuple[list[_Step], bool]:
    """-> (steps, relative_to_context)."""
    p = path.strip()
    relative = False
    if p.startswith("."):
        relative = True
        p = p[1:]
        if not p:
            return [], True
    if not p.startswith("/"):
        p = "//" + p  # bare name treated as descendant (lenient)
    steps: list[_Step] = []
    for m in _STEP_RE.finditer(p):
        axis = "descendant" if m.group(1) == "//" else "child"
        body = m.group(2)
        preds = _PRED_RE.findall(body)
        test = _PRED_RE.sub("", body).strip()
        steps.append(_Step(axis, test, preds))
    return steps, relative


def _pred_match(node: Node, pred: str) -> bool | None:
    """True/False for boolean predicates; None if positional (handled apart)."""
    pred = pred.strip()
    if re.fullmatch(r"\d+", pred):
        return None
    m = re.fullmatch(r"@([\w:-]+)", pred)
    if m:
        return node.get(m.group(1)) is not None
    m = re.fullmatch(r"@([\w:-]+)\s*=\s*(['\"])(.*?)\2", pred)
    if m:
        return node.get(m.group(1)) == m.group(3)
    m = re.fullmatch(r"normalize-space\(@([\w:-]+)\)\s*=\s*(['\"])(.*?)\2", pred)
    if m:
        v = node.get(m.group(1))
        return v is not None and " ".join(v.split()) == m.group(3)
    m = re.fullmatch(r"contains\(@([\w:-]+)\s*,\s*(['\"])(.*?)\2\)", pred)
    if m:
        v = node.get(m.group(1))
        return v is not None and m.group(3) in v
    m = re.fullmatch(r"starts-with\(@([\w:-]+)\s*,\s*(['\"])(.*?)\2\)", pred)
    if m:
        v = node.get(m.group(1))
        return v is not None and v.startswith(m.group(3))
    return False  # unsupported predicate: match nothing (safe for fallbacks)


def xpath(context: Node, path: str):
    """Evaluate; returns list of Node and/or str (attribute values)."""
    steps, _relative = _parse(path)
    if not steps:
        return [context]
    current: list = [context]
    for step in steps:
        nxt: list = []
        seen = set()
        if step.test.startswith("@"):
            attr = step.test[1:]
            for node in current:
                if isinstance(node, Node):
                    v = node.get(attr)
                    if v is not None:
                        nxt.append(v)
            current = nxt
            continue
        for node in current:
            if not isinstance(node, Node):
                continue
            if step.axis == "child":
                cands = [c for c in node.children if c.tag is not None]
            else:
                cands = list(node.iter_elements())
            if step.test != "*":
                cands = [c for c in cands if c.tag == step.test]
            # boolean predicates first, then positional within this context
            for pred in step.preds:
                if re.fullmatch(r"\d+", pred.strip()):
                    idx = int(pred)
                    cands = [cands[idx - 1]] if 1 <= idx <= len(cands) else []
                else:
                    cands = [c for c in cands if _pred_match(c, pred)]
            for c in cands:
                if id(c) not in seen:
                    seen.add(id(c))
                    nxt.append(c)
        current = nxt
    return current
