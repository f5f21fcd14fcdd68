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
- modern cross-reference STREAMS (`/Type /XRef`): /W field widths,
  /Index subsections, FlateDecode with PNG predictors (None/Sub/Up/
  Average/Paeth — /Predictor 10-15, the layout ~every post-2005 writer
  emits); the xref stream dict doubles as the trailer (/Root);
- `/ObjStm` object streams: /N /First header parsing, embedded objects
  unpacked; residency (top-level vs in-stream version of an object
  number) follows the xref entries when they parse (type-1 = scanned
  object current, type-2 = ObjStm version current), with an
  unpack-all-ObjStms fallback when the xref is corrupt;
- page tree: trailer ``/Root`` (classic keyword or xref-stream dict) ->
  catalog ``/Pages`` -> ``/Kids`` walk (document page order), CYCLE-SAFE
  (visited object set — a /Pages node listed as its own kid terminates
  instead of exploding); falls back to /Type /Page objects in object
  order if the trailer is unparseable;
- content streams: raw or /FlateDecode (zlib); text operators ``BT/ET``,
  ``Tj``, ``TJ`` (kern < -120/1000 em treated as a word space), ``'``,
  ``"``, with ``Td/TD/T*/Tm`` starting new lines inside a text object;
- composite (Type0) fonts via ``/ToUnicode`` CMaps: ``Tf`` tracks the
  selected font, 2-byte glyph codes map through the font's bfchar/
  bfrange tables (UTF-16BE destinations); simple fonts — and fonts
  without a parseable ToUnicode — decode as Latin-1.

Hostile-input bounds (crawl bytes are untrusted; a bad document must be
an error row, never an executor OOM/hang): every FlateDecode output is
capped at MAX_DECOMPRESSED_BYTES (a few-KB zlib bomb otherwise inflates
to GBs), and the page-tree walk tracks visited objects (depth cap alone
leaves cyclic trees exponential in path count).

Out of scope (error rows or skipped, never crashes): encrypted PDFs,
non-Flate filters (LZW/DCT/...), composite fonts WITHOUT a ToUnicode
(pure CID glyphs carry no text mapping — extractors universally punt).
The synthetic corpus (pdfgen.synth_pdf, classic AND xref-stream/ObjStm
layouts, CID text blocks) and the tests exercise everything in scope.
"""

from __future__ import annotations

import re
import zlib
from typing import Any, Optional

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_TRAILER_RE = re.compile(rb"trailer")

# FlateDecode output cap — same bound family as the XML kernel's
# max_doc_bytes tolerance contract: a hostile stream that inflates past
# this is a ValueError (-> error row), never an executor OOM
MAX_DECOMPRESSED_BYTES = 64 * 1024 * 1024


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
    """/Root from the classic ``trailer`` keyword dict, else from an
    xref STREAM's dict (which doubles as the trailer in the modern
    layout — there is no ``trailer`` keyword at all)."""
    for m in reversed(list(_TRAILER_RE.finditer(data))):
        try:
            d, _ = parse_value(data, m.end())
            root = _resolve(objects, d.get("Root"))
            if isinstance(root, dict):
                return root
        except Exception:
            continue
    for num in sorted(objects, reverse=True):  # newest definition first
        value, raw = objects[num]
        if isinstance(value, dict) and value.get("Type") == "XRef" and raw is not None:
            root = _resolve(objects, value.get("Root"))
            if isinstance(root, dict):
                return root
    return None


def _page_objects(data: bytes, objects: dict) -> list[tuple[int, dict]]:
    """Pages in document order via the catalog's page tree; object-order
    fallback when the trailer/tree is unparseable. Cycle-safe: visited
    object numbers are walked once — a hostile /Pages node listed twice
    as its own kid would otherwise blow up exponentially in path count
    (the depth cap alone does not prevent that)."""
    root = _trailer_root(data, objects)
    if root is not None:
        pages: list[tuple[int, dict]] = []
        visited: set[int] = set()

        def walk(node_ref: Any, depth: int = 0) -> None:
            if depth > 64:
                return
            if isinstance(node_ref, Ref):
                if node_ref.num in visited:
                    return
                visited.add(node_ref.num)
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


def _inflate_capped(raw: bytes, cap: int | None = None) -> bytes:
    """zlib.decompress with an output cap: decompressobj(max_length)
    stops inflating at the bound, so a few-KB Flate bomb costs at most
    ``cap`` bytes before the ValueError — never an executor OOM.
    ``cap=None`` reads MAX_DECOMPRESSED_BYTES at CALL time (late
    binding, so deployments can tune the module global)."""
    if cap is None:
        cap = MAX_DECOMPRESSED_BYTES
    d = zlib.decompressobj()
    out = d.decompress(raw, cap)
    if d.unconsumed_tail:
        raise ValueError(
            f"FlateDecode output exceeds {cap} bytes (decompression bomb?)"
        )
    return out + d.flush()


def _png_unpredict(data: bytes, columns: int) -> bytes:
    """Reverse PNG row predictors (filter types 0-4, bpp=1 — the layout
    xref streams use: /Predictor 10-15, /Colors 1, /BitsPerComponent 8).
    Each row is 1 filter byte + ``columns`` data bytes."""
    if columns <= 0:
        raise ValueError(f"bad predictor Columns: {columns}")
    rowlen = columns + 1
    if len(data) % rowlen:
        raise ValueError("predictor data not a whole number of rows")
    out = bytearray()
    prev = bytes(columns)
    for off in range(0, len(data), rowlen):
        ftype = data[off]
        row = bytearray(data[off + 1 : off + rowlen])
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(1, columns):
                row[i] = (row[i] + row[i - 1]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(columns):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(columns):
                left = row[i - 1] if i else 0
                row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(columns):
                a = row[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out += row
        prev = bytes(row)
    return bytes(out)


def _decode_stream(objects: dict, num: int) -> bytes:
    value, raw = objects.get(num, (None, None))
    if raw is None:
        raise ValueError(f"object {num} is not a stream")
    filt = _resolve(objects, value.get("Filter")) if isinstance(value, dict) else None
    if filt is None:
        return raw
    filters = filt if isinstance(filt, list) else [filt]
    parms = _resolve(objects, value.get("DecodeParms")) if isinstance(value, dict) else None
    parms_list = parms if isinstance(parms, list) else [parms] * len(filters)
    out = raw
    for f, pm in zip(filters, parms_list):
        if f == "FlateDecode":
            out = _inflate_capped(out)
            pm = _resolve(objects, pm)
            if isinstance(pm, dict):
                pred = _resolve(objects, pm.get("Predictor", 1))
                if isinstance(pred, int) and pred >= 10:
                    out = _png_unpredict(out, int(_resolve(objects, pm.get("Columns", 1))))
                elif pred not in (None, 1):
                    raise ValueError(f"unsupported predictor {pred}")
        else:
            raise ValueError(f"unsupported PDF stream filter: {f}")
    return out


# --- xref streams + object streams ------------------------------------------


def _xref_stream_entries(objects: dict) -> Optional[dict[int, tuple[int, int, int]]]:
    """Entries from every /Type /XRef stream: objnum -> (type, f2, f3)
    where type 1 = at-offset (top-level), type 2 = packed in ObjStm f2
    at index f3. Earlier xref streams are read first so LATER (newer,
    incremental-update) sections overwrite — matching the last-wins rule
    of the sequential scan. None when no xref stream parses."""
    entries: dict[int, tuple[int, int, int]] = {}
    found = False
    for num in sorted(objects):
        value, raw = objects[num]
        if not (isinstance(value, dict) and value.get("Type") == "XRef" and raw is not None):
            continue
        try:
            data = _decode_stream(objects, num)
            w = [int(x) for x in value["W"]]
            if len(w) != 3 or any(x < 0 for x in w) or sum(w) == 0:
                continue
            size = int(_resolve(objects, value.get("Size", 0)))
            index = value.get("Index", [0, size])
            rowlen = sum(w)
            pos = 0
            for k in range(0, len(index), 2):
                start, count = int(index[k]), int(index[k + 1])
                for objnum in range(start, start + count):
                    if pos + rowlen > len(data):
                        raise ValueError("xref stream truncated")
                    fields = []
                    for fi, width in enumerate(w):
                        # zero-width defaults per PDF 1.5 §7.5.8.2:
                        # field 1 (type) defaults to 1, fields 2/3 to 0
                        fields.append(
                            int.from_bytes(data[pos : pos + width], "big")
                            if width
                            else (1 if fi == 0 else 0)
                        )
                        pos += width
                    entries[objnum] = (fields[0], fields[1], fields[2])
            found = True
        except Exception:
            continue
    return entries if found else None


def _unpack_objstm(objects: dict, num: int) -> dict[int, Any]:
    """Embedded objects of one /Type /ObjStm stream: header = /N pairs
    of (objnum, byte offset relative to /First)."""
    value, _ = objects[num]
    data = _decode_stream(objects, num)
    n = int(_resolve(objects, value["N"]))
    first = int(_resolve(objects, value["First"]))
    header = data[:first].split()
    if len(header) < 2 * n:
        raise ValueError(f"ObjStm {num}: header shorter than /N pairs")
    out: dict[int, Any] = {}
    for i in range(n):
        objnum = int(header[2 * i])
        off = int(header[2 * i + 1])
        val, _ = parse_value(data, first + off)
        out[objnum] = val
    return out


def _expand_object_streams(objects: dict) -> None:
    """Merge /ObjStm-packed objects into the object map, in place.

    Residency: when the xref entries parse, they are authoritative —
    a type-2 entry means the ObjStm version is current (overwrites the
    scan), a type-1 entry keeps the scanned top-level object. Fallback
    (corrupt/absent xref): unpack every ObjStm but let scanned
    definitions win (classic objects were visible to the scan's
    last-definition-wins rule; embedded ones fill the gaps)."""
    stms = [
        num
        for num, (value, raw) in objects.items()
        if isinstance(value, dict) and value.get("Type") == "ObjStm" and raw is not None
    ]
    if not stms:
        return
    xref = _xref_stream_entries(objects)
    unpacked: dict[int, dict[int, Any]] = {}
    for num in sorted(stms):
        try:
            unpacked[num] = _unpack_objstm(objects, num)
        except Exception:
            continue  # a corrupt ObjStm skips; its objects stay missing
    if xref is not None:
        for objnum, (etype, f2, f3) in xref.items():
            if etype == 2 and f2 in unpacked and objnum in unpacked[f2]:
                objects[objnum] = (unpacked[f2][objnum], None)
    else:
        for num in sorted(unpacked):
            for objnum, val in unpacked[num].items():
                if objnum not in objects:
                    objects[objnum] = (val, None)


# --- ToUnicode CMaps (composite / Type0 fonts) ------------------------------


def _utf16be(hexs: str) -> str:
    return bytes.fromhex(hexs).decode("utf-16-be", errors="replace")


_CMAP_TOK = re.compile(rb"<([0-9A-Fa-f]+)>|(\[)|(\])")


def parse_tounicode_cmap(data: bytes) -> dict[int, str]:
    """/ToUnicode CMap -> {glyph code: unicode string}. Handles both
    ``bfchar`` (src/dst pairs) and ``bfrange`` (lo hi dstStart, and the
    lo hi [dst1 dst2 ...] array form); destinations are UTF-16BE. This
    is the subset every mainstream PDF writer emits for text
    extraction; CID system info / cmap-name plumbing is ignored (only
    the code->unicode mapping matters for text)."""
    cmap: dict[int, str] = {}
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        toks = re.findall(rb"<([0-9A-Fa-f]+)>", m.group(1))
        for i in range(0, len(toks) - 1, 2):
            cmap[int(toks[i], 16)] = _utf16be(toks[i + 1].decode())
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        toks: list[tuple[str, str]] = []
        for mm in _CMAP_TOK.finditer(m.group(1)):
            if mm.group(1):
                toks.append(("hex", mm.group(1).decode()))
            elif mm.group(2):
                toks.append(("[", ""))
            else:
                toks.append(("]", ""))
        i = 0
        while i < len(toks):
            if (
                toks[i][0] != "hex"
                or i + 2 >= len(toks)
                or toks[i + 1][0] != "hex"
            ):
                i += 1
                continue
            lo, hi = int(toks[i][1], 16), int(toks[i + 1][1], 16)
            if toks[i + 2][0] == "[":
                j = i + 3
                k = 0
                while j < len(toks) and toks[j][0] == "hex":
                    if lo + k <= hi:
                        cmap[lo + k] = _utf16be(toks[j][1])
                    j += 1
                    k += 1
                i = j + 1  # skip the closing ]
            elif toks[i + 2][0] == "hex":
                start_hex = toks[i + 2][1]
                base = int(start_hex, 16)
                width = len(start_hex)
                for c in range(lo, hi + 1):
                    cmap[c] = _utf16be(f"{base + (c - lo):0{width}x}")
                i += 3
            else:
                i += 1
    return cmap


def _page_fonts(objects: dict, page: dict) -> dict[str, tuple[Optional[dict], int]]:
    """Page /Resources /Font -> {name: (ToUnicode cmap or None,
    bytes per code)}. Type0 (composite) fonts use 2-byte codes; simple
    fonts 1 byte. A font without a parseable ToUnicode falls back to
    Latin-1 (the simple-font behavior)."""
    res = _resolve(objects, page.get("Resources"))
    if not isinstance(res, dict):
        return {}
    fdict = _resolve(objects, res.get("Font"))
    if not isinstance(fdict, dict):
        return {}
    out: dict[str, tuple[Optional[dict], int]] = {}
    for name, fref in fdict.items():
        font = _resolve(objects, fref)
        if not isinstance(font, dict):
            continue
        width = 2 if font.get("Subtype") == "Type0" else 1
        cmap = None
        tu = font.get("ToUnicode")
        if isinstance(tu, Ref):
            try:
                cmap = parse_tounicode_cmap(_decode_stream(objects, tu.num)) or None
            except Exception:
                cmap = None
        out[str(name)] = (cmap, width)
    return out


# --- content-stream text interpreter ---------------------------------------

_OP_RE = re.compile(rb"[A-Za-z'\"*]{1,3}")


def _content_text_blocks(
    content: bytes,
    fonts: Optional[dict[str, tuple[Optional[dict], int]]] = None,
) -> list[dict[str, Any]]:
    """BT..ET text objects -> [{'text', 'x', 'y'}]. Shows on one line are
    concatenated; Td/TD/T*/Tm/' start a new line; TJ kerns below
    -120/1000 em count as a word space. ``fonts`` (from _page_fonts)
    drives string decoding: the font selected by ``Tf`` decodes shows
    through its ToUnicode cmap (2-byte codes for Type0); fonts without
    a cmap — and all text when fonts is None — decode as Latin-1."""
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
    cur_font: tuple[Optional[dict], int] = (None, 1)

    def show(s: bytes) -> None:
        cmap, width = cur_font
        if cmap is None:
            cur.append(s.decode("latin-1"))
            return
        out = []
        for i in range(0, len(s) - width + 1, width):
            code = int.from_bytes(s[i : i + width], "big")
            out.append(cmap.get(code, "�"))
        cur.append("".join(out))

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
        elif op == b"Tf":
            # text-state font selection: /Fx size Tf (valid outside BT too)
            if fonts and len(stack) >= 2 and isinstance(stack[-2], Name):
                cur_font = fonts.get(str(stack[-2]), (None, 1))
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
    _expand_object_streams(objects)
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
        for b in _content_text_blocks(payload, fonts=_page_fonts(objects, page)):
            blocks.append(
                {"text": b["text"], "page": page_idx, "x": b["x"], "y": b["y"]}
            )
    return blocks
