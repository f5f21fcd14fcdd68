"""PAGE-XML document model — pure Python, Spark-free.

Re-creates the observable behavior of the reference's ``page`` package
(/root/reference/page/page.go) on the namespace-blind walker. Runs
unchanged inside Arrow batch UDFs on executors.

Parity map (reference file:line):
- ``Page.open/from_bytes``    <- page.Open           (page/page.go:70-81)
- ``Page.regions``            <- Page.Regions        (page/page.go:140-153)
  ReadingOrder/*/RegionRefIndexed, malformed entries silently skipped
  (page/page.go:144-146), stable sort by int @index (page/page.go:149-152).
- ``Page.find_region_by_id``  <- Page.FindRegionByID (page/page.go:156-163)
  -> a TextRegion absent from ReadingOrder is invisible (page/page_test.go:23).
- ``Page.find`` + ``Match``   <- Page.Find/Match.xpath (page/page.go:90-137)
  eight path shapes, first match wins, deepest-set ID decides result type.
- ``Region/Line/Word``        <- page/page.go:166-295; Region re-resolves
  itself by ID from the document root (page/page.go:199-212).
- ``Polygon`` / ``rectangle`` <- page/page.go:299-351: strict Atoi ints,
  split-on-space/comma errors, order-independent min/max bbox.
- ``text_equiv_unicode_at``   <- ./TextEquiv[i+1]/Unicode, 1-based
  positional over direct children (page/page.go:35-37,199-204).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Union

from . import xmlwalk as xw

# The reference labels this "page XML" but ships the ALTO MIME string —
# reproduced verbatim (page/page.go:15-19, SURVEY.md §2.1 P20).
MIMETYPE = "application/alto+xml"


@dataclass(frozen=True)
class Rect:
    """Bounding rectangle (min/max corners)."""

    x0: int
    y0: int
    x1: int
    y1: int


class Polygon(list):
    """List of (x, y) int tuples parsed from Coords@points."""

    def rectangle(self) -> Rect:
        """Order-independent min/max fold (page/page.go:302-322); the
        fixture has right-to-left word coords, so order must not matter."""
        xs = [p[0] for p in self]
        ys = [p[1] for p in self]
        return Rect(min(xs), min(ys), max(xs), max(ys))


def parse_polygon(node) -> Polygon:
    """Parse ./Coords/@points of a node (page/page.go:325-351).

    Errors (ValueError) mirror the reference exactly: missing Coords or
    points attribute; fewer than 2 points; a point without exactly 2
    comma-separated components; non-integer coordinate (strconv.Atoi
    semantics — float coords are a parse error, SURVEY.md §1.2).
    """
    # xmlpath semantics: ./Coords/@points yields the first points ATTRIBUTE
    # across Coords children — a Coords without the attribute is skipped,
    # not an error, as long as a later sibling carries it.
    points_attr = None
    for coords in xw.children(node, "Coords"):
        points_attr = xw.attr(coords, "points")
        if points_attr is not None:
            break
    if points_attr is None:
        raise ValueError("invalid coordinates: missing")
    parts = points_attr.split(" ")
    if len(parts) < 2:
        raise ValueError(f"invalid coordinates: {points_attr!r}")
    points = Polygon()
    for part in parts:
        comps = part.split(",")
        if len(comps) != 2:
            raise ValueError(f"invalid coordinates: invalid point: {part!r}")
        points.append((xw.parse_go_int(comps[0]), xw.parse_go_int(comps[1])))
    return points


def _text_equiv_unicode_at(node, pos: int) -> tuple[str, bool]:
    """./TextEquiv[pos+1]/Unicode first-match string (page/page.go:35-37).

    Out-of-range position or missing Unicode child -> ("", False)
    (page/page_test.go:49); an empty <Unicode/> -> ("", True).
    """
    te = xw.nth_child(node, "TextEquiv", pos + 1)
    if te is None:
        return "", False
    uni = xw.first_child(te, "Unicode")
    if uni is None:
        return "", False
    return xw.string_value(uni), True


@dataclass(frozen=True)
class Match:
    """Hierarchical ID predicate; empty string = wildcard level
    (page/page.go:83-88)."""

    region_id: str = ""
    line_id: str = ""
    word_id: str = ""

    def __str__(self) -> str:  # page/page.go:129-131
        return f'{{"{self.region_id}","{self.line_id}","{self.word_id}"}}'


class Word:
    """A word on a line (page/page.go:276-295); holds its DOM node."""

    def __init__(self, node) -> None:
        self.node = node
        self._id = xw.attr(node, "id") or ""  # idFromNode: missing -> ""

    def id(self) -> str:
        return self._id

    def text_equiv_unicode_at(self, pos: int) -> tuple[str, bool]:
        return _text_equiv_unicode_at(self.node, pos)

    def polygon(self) -> Polygon:
        return parse_polygon(self.node)


class Line:
    """A text line (page/page.go:234-273); holds its DOM node."""

    def __init__(self, node) -> None:
        self.node = node
        self._id = xw.attr(node, "id") or ""

    def id(self) -> str:
        return self._id

    def text_equiv_unicode_at(self, pos: int) -> tuple[str, bool]:
        return _text_equiv_unicode_at(self.node, pos)

    def words(self) -> list[Word]:
        """Direct ./Word children in document order (page/page.go:251-258)."""
        return [Word(n) for n in xw.children(self.node, "Word")]

    def find_word_by_id(self, word_id: str) -> Optional[Word]:
        for word in self.words():
            if word.id() == word_id:
                return word
        return None

    def polygon(self) -> Polygon:
        return parse_polygon(self.node)


class Region:
    """A reading-order region (page/page.go:166-231).

    Carries the ReadingOrder @index and resolves its own TextRegion
    element lazily by ID from the document root
    (page/page.go:199-212) — so a dangling regionRef yields
    text ("", False) and a polygon error, exactly like the reference.
    """

    def __init__(self, root, region_id: str, index: int) -> None:
        self.root = root
        self._id = region_id
        self.index = index

    def id(self) -> str:
        return self._id

    def _resolve(self):
        """/PcGts/Page/TextRegion[@id=..] first match (page/page.go:43-45)."""
        return next(
            xw.walk(self.root, [("Page", None, None), ("TextRegion", "id", self._id)]),
            None,
        )

    def lines(self) -> list[Line]:
        """Document-order direct TextLine children (page/page.go:173-180)."""
        node = self._resolve()
        if node is None:
            return []
        return [Line(n) for n in xw.children(node, "TextLine")]

    def find_line_by_id(self, line_id: str) -> Optional[Line]:
        for line in self.lines():
            if line.id() == line_id:
                return line
        return None

    def text_equiv_unicode_at(self, pos: int) -> tuple[str, bool]:
        node = self._resolve()
        if node is None:
            return "", False
        return _text_equiv_unicode_at(node, pos)

    def polygon(self) -> Polygon:
        node = self._resolve()
        if node is None:
            raise ValueError(f"invalid region: {self._id}")
        return parse_polygon(node)


TextRegion = Union[Region, Line, Word]


def _new_region(root, ro_node) -> Region:
    """RegionRefIndexed node -> Region; raises on missing/non-int @index
    or missing @regionRef (page/page.go:214-231)."""
    index_str = xw.attr(ro_node, "index")
    if index_str is None:
        raise ValueError("invalid region: missing index")
    index = xw.parse_go_int(index_str)
    region_ref = xw.attr(ro_node, "regionRef")
    if region_ref is None:
        raise ValueError("invalid region: missing id")
    return Region(root, region_ref, index)


class Page:
    """An opened PAGE-XML document."""

    def __init__(self, root, path: str = "<bytes>") -> None:
        self.path = path
        self.root = root

    @classmethod
    def from_bytes(cls, data: bytes, path: str = "<bytes>") -> "Page":
        return cls(xw.parse_bytes(data), path)

    @classmethod
    def open(cls, path: str) -> "Page":
        with open(path, "rb") as fh:
            return cls.from_bytes(fh.read(), path)

    def _ro_nodes(self):
        """/PcGts/Page/ReadingOrder/*/RegionRefIndexed (page/page.go:27)."""
        if xw.local_name(self.root.tag) != "PcGts":
            return iter(())
        return xw.walk(
            self.root,
            [
                ("Page", None, None),
                ("ReadingOrder", None, None),
                ("*", None, None),
                ("RegionRefIndexed", None, None),
            ],
        )

    def regions(self) -> list[Region]:
        """All reading-order regions, malformed entries skipped, stable
        sort by int index (page/page.go:140-153)."""
        regions = []
        for node in self._ro_nodes():
            try:
                regions.append(_new_region(self.root, node))
            except ValueError:
                continue  # skip erroneous nodes (page/page.go:144-146)
        regions.sort(key=lambda r: r.index)  # Python sort is stable
        return regions

    def find_region_by_id(self, region_id: str) -> Optional[Region]:
        """Linear scan of regions() — ReadingOrder membership defines
        visibility (page/page.go:156-163, page/page_test.go:23)."""
        for region in self.regions():
            if region.id() == region_id:
                return region
        return None

    def find(self, m: Match) -> Optional[TextRegion]:
        """Hierarchical point lookup; first match wins; result type is the
        deepest non-empty ID level (page/page.go:90-127).

        Path truth table (SURVEY.md §2.1 P5): a region-only match resolves
        via ReadingOrder membership; wildcard levels become '*' steps.
        """
        if xw.local_name(self.root.tag) != "PcGts":
            return None
        r, l, w = m.region_id, m.line_id, m.word_id
        steps: list[tuple[str, Optional[str], Optional[str]]] = [("Page", None, None)]
        if r and not l and not w:
            # /PcGts/Page/ReadingOrder/*/RegionRefIndexed[@regionRef=r]
            steps += [
                ("ReadingOrder", None, None),
                ("*", None, None),
                ("RegionRefIndexed", "regionRef", r),
            ]
            node = next(xw.walk(self.root, steps), None)
            if node is None:
                return None
            try:
                return _new_region(self.root, node)
            except ValueError:
                return None  # parse failure -> not found (page/page.go:119-123)
        if not r and not l and not w:
            return None  # empty match: path hits /PcGts/Page, no wrap -> false
        steps.append(("TextRegion", "id", r) if r else None)
        steps.append(("TextLine", "id", l) if l else None)
        steps.append(("Word", "id", w) if w else None)
        # Drop trailing wildcards; interior Nones become '*' steps
        while steps and steps[-1] is None:
            steps.pop()
        full = [s if s is not None else ("*", None, None) for s in steps]
        node = next(xw.walk(self.root, full), None)
        if node is None:
            return None
        if w:
            return Word(node)
        if l:
            return Line(node)
        return None  # unreachable: r-only handled above
