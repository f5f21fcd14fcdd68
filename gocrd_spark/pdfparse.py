"""Minimal from-scratch PDF text extraction — pure stdlib (zlib for
FlateDecode), no PDF library.

Scope (a real, documented subset — not a stub):

- classic PDF layout: ``N G obj ... endobj`` bodies scanned sequentially
  (stream payloads are skipped via /Length, so compressed bytes can't
  fake object headers);
- object model: dicts, arrays, names, numbers, literal ``(...)`` strings
  (escapes ``\\n \\r \\t \\b \\f \\( \\) \\\\ \\ddd`` + line
  continuations + nested parens), hex ``<...>`` strings, ``R``
  references, booleans/null;
- page tree: trailer ``/Root`` -> catalog ``/Pages`` -> ``/Kids`` walk
  (document page order); falls back to /Type /Page objects in object
  order if the trailer is unparseable;
- content streams: raw or /FlateDecode (zlib); text operators ``BT/ET``,
  ``Tj``, ``TJ`` (kern < -120/1000 em treated as a word space), ``'``,
  ``"``, with ``Td/TD/T*/Tm`` starting new lines inside a text object;
- strings decoded as Latin-1 (simple fonts; no CMap/ToUnicode — out of
  scope, documented).

Out of scope (error rows or skipped, never crashes): encrypted PDFs,
xref streams /ObjStm-packed objects, non-Flate filters, composite
fonts. The synthetic corpus (pdfgen.synth_pdf) and the reference tests
exercise everything in scope.
"""

from __future__ import annotations

import re
import zlib
from typing import Any, Optional

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_TRAILER_RE = re.compile(rb"trailer")


class Ref:
    __slots__ = ("num",)

    def __init__(self, num: int) -> None:
        self.num = num

    def __repr__(self) -> str:  # debug only
        return f"Ref({self.num})"


class Name(str):
    """A /Name token (distinct from string values)."""


def _skip_ws(data: bytes, p: int) -> int:
    n = len(data)
    while p < n:
        c = data[p : p + 1]
        if c in (b"%",):  # comment to EOL
            while p < n and data[p : p + 1] not in (b"\r", b"\n"):
                p += 1
        elif c in _WS:
            p += 1
        else:
            break
    return p


def _parse_name(data: bytes, p: int) -> tuple[Name, int]:
    p += 1  # '/'
    start = p
    n = len(data)
    while p < n and data[p : p + 1] not in _WS and data[p : p + 1] not in _DELIM:
        p += 1
    raw = data[start:p]
    # #xx hex escapes in names: require exactly two hex digits, else the
    # '#' is taken literally (a cosmetic glitch must not abort the object)
    if b"#" in raw:
        hexdigits = b"0123456789abcdefABCDEF"
        out = bytearray()
        i = 0
        while i < len(raw):
            if (
                raw[i : i + 1] == b"#"
                and i + 2 < len(raw)
                and raw[i + 1] in hexdigits
                and raw[i + 2] in hexdigits
            ):
                out.append(int(raw[i + 1 : i + 3], 16))
                i += 3
            else:
                out.append(raw[i])
                i += 1
        raw = bytes(out)
    return Name(raw.decode("latin-1")), p


def _parse_literal_string(data: bytes, p: int) -> tuple[bytes, int]:
    p += 1  # '('
    out = bytearray()
    depth = 1
    n = len(data)
    while p < n:
        c = data[p]
        if c == 0x5C:  # backslash
            p += 1
            if p >= n:
                break
            e = data[p]
            if e in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                p += 1
            elif e in b"()\\":
                out.append(e)
                p += 1
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                oct_digits = bytearray([e])
                p += 1
                for _ in range(2):
                    if p < n and 0x30 <= data[p] <= 0x37:
                        oct_digits.append(data[p])
                        p += 1
                    else:
                        break
                out.append(int(oct_digits.decode(), 8) & 0xFF)
            elif e in b"\r\n":  # line continuation
                p += 1
                if e == 0x0D and p < n and data[p] == 0x0A:
                    p += 1
            else:  # unknown escape: the char itself
                out.append(e)
                p += 1
        elif c == 0x28:  # '('
            depth += 1
            out.append(c)
            p += 1
        elif c == 0x29:  # ')'
            depth -= 1
            if depth == 0:
                p += 1
                return bytes(out), p
            out.append(c)
            p += 1
        else:
            out.append(c)
            p += 1
    return bytes(out), p


def _parse_hex_string(data: bytes, p: int) -> tuple[bytes, int]:
    p += 1  # '<'
    end = data.index(b">", p)
    hexs = re.sub(rb"\s", b"", data[p:end])
    if len(hexs) % 2:
        hexs += b"0"
    return bytes.fromhex(hexs.decode("latin-1")), end + 1


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_REF_TAIL_RE = re.compile(rb"\s+(\d+)\s+R\b")


def parse_value(data: bytes, p: int) -> tuple[Any, int]:
    """Parse one PDF object value starting at p (whitespace allowed)."""
    p = _skip_ws(data, p)
    c = data[p : p + 1]
    if c == b"/":
        return _parse_name(data, p)
    if c == b"(":
        return _parse_literal_string(data, p)
    if data[p : p + 2] == b"<<":
        p += 2
        d: dict[str, Any] = {}
        while True:
            p = _skip_ws(data, p)
            if data[p : p + 2] == b">>":
                return d, p + 2
            key, p = _parse_name(data, p)
            val, p = parse_value(data, p)
            d[key] = val
    if c == b"<":
        return _parse_hex_string(data, p)
    if c == b"[":
        p += 1
        arr = []
        while True:
            p = _skip_ws(data, p)
            if data[p : p + 1] == b"]":
                return arr, p + 1
            val, p = parse_value(data, p)
            arr.append(val)
    if data[p : p + 4] == b"true":
        return True, p + 4
    if data[p : p + 5] == b"false":
        return False, p + 5
    if data[p : p + 4] == b"null":
        return None, p + 4
    m = _NUM_RE.match(data, p)
    if m:
        tok = m.group(0)
        p2 = m.end()
        # indirect reference lookahead: "N G R" — matched in place
        # (pattern.match(data, p2)), never via a slice of the remaining
        # buffer, which would make parsing quadratic in document size
        m2 = _REF_TAIL_RE.match(data, p2)
        if m2 and b"." not in tok:
            return Ref(int(tok)), m2.end()
        return (float(tok) if b"." in tok else int(tok)), p2
    raise ValueError(f"unparseable PDF value at byte {p}: {data[p:p+16]!r}")


def _scan_objects(data: bytes) -> dict[int, tuple[Any, Optional[bytes]]]:
    """Sequential object scan: num -> (value, raw stream bytes or None).
    Streams are skipped via /Length so their payloads are never
    mis-scanned as object headers."""
    objects: dict[int, tuple[Any, Optional[bytes]]] = {}
    pos = 0
    n = len(data)
    while True:
        m = _OBJ_RE.search(data, pos)
        if not m:
            break
        num = int(m.group(1))
        try:
            value, p = parse_value(data, m.end())
        except Exception:
            pos = m.end()
            continue
        stream: Optional[bytes] = None
        p = _skip_ws(data, p)
        if data[p : p + 6] == b"stream":
            p += 6
            if data[p : p + 2] == b"\r\n":
                p += 2
            elif data[p : p + 1] == b"\n":
                p += 1
            length = value.get("Length") if isinstance(value, dict) else None
            if isinstance(length, int):
                stream = data[p : p + length]
                p += length
                end = data.find(b"endstream", p)
            else:  # indirect /Length: fall back to delimiter search
                end = data.find(b"endstream", p)
                stream = data[p:end] if end != -1 else data[p:]
                # the spec allows ONE EOL before 'endstream' — strip at
                # most that; stripping every trailing CR/LF would corrupt
                # Flate payloads that legitimately end in 0x0A/0x0D
                if stream.endswith(b"\r\n"):
                    stream = stream[:-2]
                elif stream.endswith(b"\n") or stream.endswith(b"\r"):
                    stream = stream[:-1]
            p = (end + len(b"endstream")) if end != -1 else n
        # last definition wins: an incrementally-updated PDF appends the
        # replacement object after %%EOF, and the append-order scan must
        # surface the NEW content, not silently return stale text
        objects[num] = (value, stream)
        e = data.find(b"endobj", p)
        pos = (e + 6) if e != -1 else p
    return objects


def _resolve(objects: dict, v: Any) -> Any:
    seen = 0
    while isinstance(v, Ref) and seen < 32:
        v = objects.get(v.num, (None, None))[0]
        seen += 1
    return v


def _trailer_root(data: bytes, objects: dict) -> Optional[dict]:
    for m in reversed(list(_TRAILER_RE.finditer(data))):
        try:
            d, _ = parse_value(data, m.end())
            root = _resolve(objects, d.get("Root"))
            if isinstance(root, dict):
                return root
        except Exception:
            continue
    return None


def _page_objects(data: bytes, objects: dict) -> list[tuple[int, dict]]:
    """Pages in document order via the catalog's page tree; object-order
    fallback when the trailer/tree is unparseable."""
    root = _trailer_root(data, objects)
    if root is not None:
        pages: list[tuple[int, dict]] = []

        def walk(node_ref: Any, depth: int = 0) -> None:
            if depth > 64:
                return
            node = _resolve(objects, node_ref)
            if not isinstance(node, dict):
                return
            t = node.get("Type")
            if t == "Page":
                num = node_ref.num if isinstance(node_ref, Ref) else -1
                pages.append((num, node))
            elif t == "Pages" or "Kids" in node:
                for kid in _resolve(objects, node.get("Kids")) or []:
                    walk(kid, depth + 1)

        walk(root.get("Pages"))
        if pages:
            return pages
    return sorted(
        (num, val)
        for num, (val, _) in objects.items()
        if isinstance(val, dict) and val.get("Type") == "Page"
    )


def _decode_stream(objects: dict, num: int) -> bytes:
    value, raw = objects.get(num, (None, None))
    if raw is None:
        raise ValueError(f"object {num} is not a stream")
    filt = _resolve(objects, value.get("Filter")) if isinstance(value, dict) else None
    if filt is None:
        return raw
    filters = filt if isinstance(filt, list) else [filt]
    out = raw
    for f in filters:
        if f == "FlateDecode":
            out = zlib.decompress(out)
        else:
            raise ValueError(f"unsupported PDF stream filter: {f}")
    return out


# --- content-stream text interpreter ---------------------------------------

_OP_RE = re.compile(rb"[A-Za-z'\"*]{1,3}")


def _content_text_blocks(content: bytes) -> list[dict[str, Any]]:
    """BT..ET text objects -> [{'text', 'x', 'y'}]. Shows on one line are
    concatenated; Td/TD/T*/Tm/' start a new line; TJ kerns below
    -120/1000 em count as a word space."""
    blocks: list[dict[str, Any]] = []
    p = 0
    n = len(content)
    stack: list[Any] = []
    in_text = False
    lines: list[str] = []
    cur: list[str] = []
    tx = ty = 0.0
    bx = by = 0.0
    first_pos = True

    def show(s: bytes) -> None:
        cur.append(s.decode("latin-1"))

    def newline() -> None:
        nonlocal cur
        if cur and "".join(cur):
            lines.append("".join(cur))
        cur = []

    while p < n:
        p = _skip_ws(content, p)
        if p >= n:
            break
        c = content[p : p + 1]
        if c in b"/([<" or c.isdigit() or c in b"+-." or content[p : p + 2] == b"<<":
            try:
                v, p = parse_value(content, p)
            except Exception:
                p += 1
                continue
            stack.append(v)
            continue
        m = _OP_RE.match(content, p)
        if not m:
            p += 1
            continue
        op = m.group(0)
        p = m.end()
        if op == b"BT":
            in_text = True
            lines, cur = [], []
            tx = ty = 0.0
            bx = by = 0.0  # a block with no Td/Tm owns origin (0,0)
            first_pos = True
        elif op == b"ET":
            if in_text:
                newline()
                if lines:
                    blocks.append({"text": "\n".join(lines), "x": bx, "y": by})
            in_text = False
        elif in_text and op == b"Tj":
            if stack and isinstance(stack[-1], bytes):
                show(stack[-1])
        elif in_text and op == b"TJ":
            if stack and isinstance(stack[-1], list):
                for el in stack[-1]:
                    if isinstance(el, bytes):
                        show(el)
                    elif isinstance(el, (int, float)) and el < -120:
                        cur.append(" ")
        elif in_text and op in (b"'", b'"'):
            newline()
            if stack and isinstance(stack[-1], bytes):
                show(stack[-1])
        elif in_text and op in (b"Td", b"TD"):
            if (
                len(stack) >= 2
                and isinstance(stack[-1], (int, float))
                and isinstance(stack[-2], (int, float))
            ):
                tx += float(stack[-2])
                ty += float(stack[-1])
                if first_pos:
                    bx, by = tx, ty
                    first_pos = False
            newline()
        elif in_text and op == b"Tm":
            if (
                len(stack) >= 6
                and isinstance(stack[-1], (int, float))
                and isinstance(stack[-2], (int, float))
            ):
                tx, ty = float(stack[-2]), float(stack[-1])
                if first_pos:
                    bx, by = tx, ty
                    first_pos = False
            newline()
        elif in_text and op == b"T*":
            newline()
        stack.clear()
    return blocks


def pdf_text_blocks(data: bytes) -> list[dict[str, Any]]:
    """bytes -> [{'text', 'page', 'x', 'y'}] in document page order.
    Raises ValueError on out-of-scope PDFs (encrypted, non-Flate,
    no parseable pages)."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF (missing %PDF header)")
    objects = _scan_objects(data)
    if not objects:
        raise ValueError("no PDF objects found")
    pages = _page_objects(data, objects)
    if not pages:
        raise ValueError("no pages found")
    blocks: list[dict[str, Any]] = []
    for page_idx, (_, page) in enumerate(pages):
        contents = page.get("Contents")
        refs = contents if isinstance(contents, list) else [contents]
        payload = b""
        for r in refs:
            if isinstance(r, Ref):
                payload += _decode_stream(objects, r.num) + b"\n"
        for b in _content_text_blocks(payload):
            blocks.append(
                {"text": b["text"], "page": page_idx, "x": b["x"], "y": b["y"]}
            )
    return blocks
