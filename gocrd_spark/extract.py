"""Canonical document extraction — the single definition of the
pipeline's per-document semantics (SURVEY.md §7 step 2, FIXTURES.md §2).

``extract_document(html: bytes)`` re-expresses the reference's
reading-order walk (page/page.go:140-153 + 199-204) as one function:

1. regions = ReadingOrder ``RegionRefIndexed`` entries, malformed entries
   silently skipped, stable-sorted by int ``@index``;
2. per region, text = first direct-child ``TextEquiv``'s ``Unicode``
   verbatim (literal embedded whitespace preserved — byte identity);
   a dangling regionRef (no TextRegion with that id) is skipped, same as
   the reference's ("", false) resolution;
3. document text = region texts joined by ``"\\n"``;
4. spans = per-region byte+char offsets into the joined text plus the
   bbox min/max over ``Coords@points`` (page/page.go:302-322); a region
   whose Coords are missing/malformed carries a null bbox (the reference
   surfaces that as a Polygon error, page/page.go:328-346).

Golden values for the kant fixture are pinned in FIXTURES.md §3
(sha256 7bac7349…, 1518 chars / 1591 bytes, spans table).

Everything here is pure Python so the exact same code path is unit
tested without Spark and executed inside Arrow batches on executors.
"""

from __future__ import annotations

import re
from typing import Any, Optional

from . import xmlwalk as xw
from .htmlextract import extract_html
from .mets import Match as MetsMatch
from .mets import Mets
from .page import Page, Rect, _text_equiv_unicode_at, parse_polygon
from .spans import assemble, stable_error
from .xmlwalk import local_name, parse_bytes


def sniff_kind(data: bytes) -> str:
    """Classify a document payload by its root element local name:
    'page' (PcGts), 'mets', or 'other'. Pays one XML parse; for
    parse-free routing on the hot path use extract_any_document, which
    sniffs HTML from the head bytes and reuses its single parse."""
    try:
        root = parse_bytes(data)
    except Exception:
        return "other"
    ln = local_name(root.tag)
    if ln == "PcGts":
        return "page"
    if ln == "mets":
        return "mets"
    return "other"


def extract_document(data: bytes) -> dict[str, Any]:
    """bytes -> {'text': str|None, 'spans': list[dict]|None, 'error': str|None}.

    Never raises: malformed documents yield text=None with an error
    message (mirrors the reference's silent-skip tolerance,
    page/page.go:144-146; per-partition error counters live in the Spark
    kernel, SURVEY.md §4.4).

    Hot path: a SINGLE pass over the parsed tree. The reference
    re-resolves every region by ID from the document root
    (page/page.go:199-212, an O(regions x document) artifact); we build
    the id->TextRegion index once instead (SURVEY.md §3.2 note) —
    observable output is identical, including ("", False) for dangling
    regionRefs (absent from the index -> skipped).
    """
    try:
        page = Page.from_bytes(data)
        if local_name(page.root.tag) != "PcGts":
            return {"text": None, "spans": None, "error": "not a PAGE-XML document"}
        return _extract_page_root(page.root)
    except Exception as exc:  # malformed XML etc.
        return {"text": None, "spans": None, "error": stable_error(exc)}


def _extract_page_root(root) -> dict[str, Any]:
    """Extraction over an already-parsed PcGts root (single pass)."""
    try:
        # one pass: id -> first matching direct TextRegion child of any Page,
        # and the reading-order refs — no Region objects, no re-resolution
        region_index: dict[str, Any] = {}
        refs: list[tuple[int, str]] = []
        for page_el in xw.children(root, "Page"):
            for child in page_el:
                ln = xw.local_name(child.tag)
                if ln == "TextRegion":
                    rid = xw.attr(child, "id")
                    if rid is not None and rid not in region_index:
                        region_index[rid] = child
                elif ln == "ReadingOrder":
                    for group in child:
                        if xw.local_name(group.tag) is None:
                            continue
                        for node in group:
                            if xw.local_name(node.tag) != "RegionRefIndexed":
                                continue
                            index_str = xw.attr(node, "index")
                            ref = xw.attr(node, "regionRef")
                            if index_str is None or ref is None:
                                continue  # silent skip (page/page.go:144-146)
                            try:
                                refs.append((xw.parse_go_int(index_str), ref))
                            except ValueError:
                                continue
        refs.sort(key=lambda r: r[0])  # stable, like sort.Slice by index

        def blocks():
            for index, rid in refs:
                node = region_index.get(rid)
                if node is None:
                    continue  # dangling regionRef: reference yields ("", False)
                text, ok = _text_equiv_unicode_at(node, 0)
                if not ok:
                    continue  # no TextEquiv/Unicode
                bbox: Optional[Rect] = None
                try:
                    bbox = parse_polygon(node).rectangle()
                except ValueError:
                    bbox = None
                yield (
                    rid,
                    index,
                    text,
                    {"x0": bbox.x0, "y0": bbox.y0, "x1": bbox.x1, "y1": bbox.y1}
                    if bbox is not None
                    else None,
                )

        return assemble(blocks())
    except Exception as exc:  # malformed XML etc.
        return {"text": None, "spans": None, "error": stable_error(exc)}


_HTML_HEAD_RE = re.compile(rb"<\s*(?:!doctype\s+html|html)[\s>]", re.IGNORECASE)


def extract_any_document(data: bytes) -> dict[str, Any]:
    """Document-kind routing for Common-Crawl-style ``html: binary``
    payloads — one output contract for every kind:

    - PAGE-XML (PcGts root)  -> reading-order extraction (gocrd semantics)
    - HTML (doctype/<html>, or any non-PcGts XML) -> boilerplate-strip
      main-content extraction (htmlextract, DOM heuristics)
    - PDF (%PDF header)       -> from-scratch PDF text parser (pdfparse)
    - METS manifests          -> error row (manifests carry no page text;
      query them via pipeline.mets_files)
    - unparseable bytes       -> error row

    The sniff is one cheap regex over the head plus at most one XML
    parse, which is then REUSED for PAGE-XML extraction (no re-parse on
    the majority path).
    """
    head = data[:4096] if data else b""
    if head.startswith(b"%PDF"):
        from .pdfextract import extract_pdf

        return extract_pdf(data)
    if _HTML_HEAD_RE.search(head):
        return extract_html(data)
    try:
        root = parse_bytes(data)
    except Exception as exc:
        return {"text": None, "spans": None, "error": stable_error(exc)}
    ln = local_name(root.tag)
    if ln == "PcGts":
        return _extract_page_root(root)
    if ln == "mets":
        return {
            "text": None,
            "spans": None,
            "error": "METS manifest (no page text; use mets_files)",
        }
    # other XML (incl. XHTML without doctype): tolerant HTML heuristics
    return extract_html(data)


def mets_records(
    data: bytes, use: str = "", file_id: str = "", mimetype: str = ""
) -> list[dict[str, str]]:
    """bytes -> flat rows of the METS file-resolution query
    (Mets.Find, mets/mets.go:53-59). Returns [] for non-METS payloads."""
    try:
        m = Mets.from_bytes(data)
    except Exception:
        return []
    return [
        {
            "file_id": f.id,
            "mimetype": f.mimetype,
            "flocat_type": f.flocat.type,
            "flocat_url": f.flocat.url,
        }
        for f in m.find(MetsMatch(use=use, file_id=file_id, mimetype=mimetype))
    ]
