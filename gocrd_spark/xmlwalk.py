"""Namespace-blind XML tree walking, reproducing the XPath-subset
semantics the reference inherits from its ``launchpad.net/xmlpath``
dependency (see SURVEY.md §1.3).

Observable semantics reproduced here (each pinned by the reference's own
tests against namespaced fixtures):

- **Local-name matching, namespaces ignored** — element steps like
  ``mets`` match ``mets:mets``; attribute steps like ``@href`` match
  ``xlink:href`` (reference: mets/mets.go:13,72 vs mets/testdata/mets.xml:2,26).
- **First-match string extraction** — ``path.String(node)`` returns the
  string value of the first matching node (mets/mets.go:98).
- **Positional predicates are 1-based over same-named direct children**
  (page/page.go:35-37).
- **XML comments are not elements** (mets/testdata/mets.xml:20-22 yields
  zero files) — ``xml.etree`` drops comments natively.

This is a hand-rolled walker rather than a real XPath engine on purpose:
stock XPath is namespace-aware and would reject these documents; the
namespace-blind subset is the contract (SURVEY.md §7 "What's hard" (b)).
All functions here are pure Python over ``xml.etree`` Elements so the
same code runs inside Arrow batch UDFs on executors with zero Spark
dependencies.
"""

from __future__ import annotations

import re
from typing import Iterator, Optional
from xml.etree import ElementTree as ET

_INT_RE = re.compile(r"^[+-]?[0-9]+$")


def parse_bytes(data: bytes) -> ET.Element:
    """Parse an XML document from bytes; raises ET.ParseError on bad XML."""
    return ET.fromstring(data)


def local_name(tag: object) -> Optional[str]:
    """Local part of an element tag. Comments/PIs have non-str tags -> None."""
    if not isinstance(tag, str):
        return None
    # ElementTree renders namespaced tags as '{uri}local'
    if tag.startswith("{"):
        return tag.rsplit("}", 1)[-1]
    # Un-namespaced parsers may keep a 'prefix:local' form
    if ":" in tag:
        return tag.rsplit(":", 1)[-1]
    return tag


def attr(elem: ET.Element, name: str) -> Optional[str]:
    """First attribute whose *local name* equals ``name`` (document order).

    Mirrors xmlpath's ``@href`` matching ``xlink:href``
    (mets/mets.go:13 vs mets/testdata/mets.xml:26).
    """
    for key, value in elem.attrib.items():
        k = key.rsplit("}", 1)[-1] if key.startswith("{") else key.rsplit(":", 1)[-1]
        if k == name:
            return value
    return None


def children(elem: ET.Element, name: str) -> Iterator[ET.Element]:
    """Direct children with the given local name; '*' matches any element."""
    for child in elem:
        ln = local_name(child.tag)
        if ln is None:
            continue  # comment / processing instruction
        if name == "*" or ln == name:
            yield child


def first_child(elem: ET.Element, name: str) -> Optional[ET.Element]:
    return next(children(elem, name), None)


def nth_child(elem: ET.Element, name: str, pos1: int) -> Optional[ET.Element]:
    """1-based positional predicate over same-named direct children
    (``./TextEquiv[i]``, page/page.go:35-37)."""
    if pos1 < 1:
        return None
    for i, child in enumerate(children(elem, name), start=1):
        if i == pos1:
            return child
    return None


def string_value(elem: ET.Element) -> str:
    """XPath string value of an element: concatenated descendant text.

    An element that matched but holds no text yields '' (with the caller
    treating the *match* as ok=True, per SURVEY.md §2.1 P11).
    """
    return "".join(elem.itertext())


def walk(roots, steps) -> Iterator[ET.Element]:
    """Evaluate a list of child steps from a set of start nodes.

    Each step is ``(name, attr_name, attr_value)``; name '*' is a
    wildcard; attr_name None means no predicate. Yields matches lazily in
    document order, enabling the reference's first-match short-circuit
    (page/page.go:111, mets/mets.go:55).
    """
    if isinstance(roots, ET.Element):
        roots = [roots]

    def _walk(nodes, depth):
        if depth == len(steps):
            yield from nodes
            return
        name, attr_name, attr_value = steps[depth]
        for node in nodes:
            nxt = (
                c
                for c in children(node, name)
                if attr_name is None or attr(c, attr_name) == attr_value
            )
            yield from _walk(nxt, depth + 1)

    yield from _walk(roots, 0)


def parse_go_int(s: str) -> int:
    """strconv.Atoi-compatible integer parse: optional ASCII sign + ASCII
    digits only (rejects whitespace, unicode digits, underscores that
    Python's int() would accept), and Atoi's ErrRange for values outside
    int64 — the reference skips such ReadingOrder entries
    (page/page.go:220-222,144-146), so we must too."""
    if not _INT_RE.match(s):
        raise ValueError(f"invalid integer: {s!r}")
    value = int(s)
    if not -(2**63) <= value < 2**63:
        raise ValueError(f"integer out of int64 range: {s!r}")
    return value
