"""Single definition of the span-assembly contract.

Every extractor (PAGE-XML DOM, streaming expat, HTML boilerplate strip,
PDF stub) emits blocks; this helper joins them with '\\n' and computes
the byte/char offsets of each block inside the joined text. Keeping the
offset bookkeeping in ONE place means the output contract ("spans slice
the joined text exactly") has one implementation to test and fix.
"""

from __future__ import annotations

import re
from typing import Any, Iterable, Optional

_POSITION_RE = re.compile(r":? line \d+, column \d+")


def stable_error(exc: BaseException) -> str:
    """Engine-stable error string for tolerance rows: class + message
    with parser-reported positions STRIPPED. CPython's two expat
    bindings (_elementtree vs pyexpat) disagree by one column on some
    malformed tokens (observed: attr name ``c:9`` + backtick — ET says
    column 23, raw expat 24), so a position in the driver-compared
    ``error`` column is not stable across walkers — the same rule that
    keeps raw doubles out of oracle-checked outputs (CLAUDE.md). Lives
    here (with the output contract) so every extractor and its golden
    twin formats errors identically."""
    return f"{type(exc).__name__}: {strip_positions(str(exc))}"


def strip_positions(msg: str) -> str:
    """Strip ``line N, column M`` parser positions from an error
    message (see stable_error)."""
    return _POSITION_RE.sub("", msg)


def assemble(blocks: Iterable[tuple[str, int, str, Optional[dict]]]) -> dict[str, Any]:
    """blocks of (region_id, index, text, bbox|None) ->
    {'text': joined, 'spans': [...], 'error': None}."""
    parts: list[str] = []
    spans: list[dict[str, Any]] = []
    byte_off = 0
    char_off = 0
    for region_id, index, text, bbox in blocks:
        if parts:  # '\n' separator: 1 byte, 1 char
            byte_off += 1
            char_off += 1
        n_bytes = len(text.encode("utf-8"))
        n_chars = len(text)
        spans.append(
            {
                "region_id": region_id,
                "index": index,
                "byte_start": byte_off,
                "byte_end": byte_off + n_bytes,
                "char_start": char_off,
                "char_end": char_off + n_chars,
                "bbox": bbox,
            }
        )
        parts.append(text)
        byte_off += n_bytes
        char_off += n_chars
    return {"text": "\n".join(parts), "spans": spans, "error": None}
