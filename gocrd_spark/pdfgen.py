"""Deterministic synthesis of REAL (classic-layout) PDF documents for
the PDF extraction path — header, object table, Flate or raw content
streams, xref table, trailer. Returns the bytes plus the template SPEC
(expected blocks per page) so goldens derive from the specification,
never from the parser under test (same pattern as datagen/gen_goldens).

Content variants exercised per block (rng-chosen):
- plain literal string ``(...) Tj``;
- literal with escape-needing chars ``( ) \\`` in the text;
- hex string ``<...> Tj``;
- ``TJ`` array with a word-space kern (``-250``, below the -120 cutoff);
- multi-line blocks (``Td`` line advance inside one BT/ET).
Streams are zlib-compressed ~70% of the time, raw otherwise.
"""

from __future__ import annotations

import random
import zlib

# bump when synth_pdf/_block_content/make_pdf_row change: the /tmp corpus
# cache AND the spec-derived golden must move together (a stale cached
# corpus against a fresh golden shows up as spurious oracle failures)
PDFGEN_VERSION = 1

WORDS = (
    "spark parquet shuffle codegen arrow batch kernel page region text "
    "broadcast salt skew plan column prune stream state watermark commit"
).split()
FANCY = ["a(b)", "c\\d", "(x)", "q)e("]  # escape-needing payloads


def _escape_literal(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _block_content(rng: random.Random, x: int, y: int) -> tuple[str, str]:
    """-> (content-stream snippet inside BT/ET, expected block text)."""
    kind = rng.randint(0, 4)
    if kind == 0:  # plain literal
        text = " ".join(rng.choice(WORDS) for _ in range(rng.randint(3, 10)))
        return f"({_escape_literal(text)}) Tj", text
    if kind == 1:  # escape-needing literal
        text = " ".join(
            rng.choice(WORDS if i % 3 else FANCY) for i in range(rng.randint(3, 8))
        )
        return f"({_escape_literal(text)}) Tj", text
    if kind == 2:  # hex string
        text = " ".join(rng.choice(WORDS) for _ in range(rng.randint(2, 6)))
        return f"<{text.encode('latin-1').hex()}> Tj", text
    if kind == 3:  # TJ with a word-space kern
        a = " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 4)))
        b = " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 4)))
        return (
            f"[({_escape_literal(a)}) -250 ({_escape_literal(b)})] TJ",
            f"{a} {b}",
        )
    # multi-line block: Td line advances
    n_lines = rng.randint(2, 3)
    lines = [
        " ".join(rng.choice(WORDS) for _ in range(rng.randint(2, 6)))
        for _ in range(n_lines)
    ]
    snippet = f"({_escape_literal(lines[0])}) Tj"
    for ln in lines[1:]:
        snippet += f"\n0 -14 Td ({_escape_literal(ln)}) Tj"
    return snippet, "\n".join(lines)


def synth_pdf(rng: random.Random) -> tuple[bytes, list[dict]]:
    """One synthetic PDF. Returns (bytes, expected blocks) where each
    expected block is {'page', 'x', 'y', 'text'} in document order."""
    n_pages = rng.randint(1, 3)
    expected: list[dict] = []
    page_contents: list[bytes] = []
    for page in range(n_pages):
        parts = []
        for b in range(rng.randint(1, 4)):
            x, y = rng.randint(36, 500), rng.randint(36, 740)
            snippet, text = _block_content(rng, x, y)
            parts.append(f"BT\n/F1 12 Tf\n{x} {y} Td\n{snippet}\nET")
            expected.append({"page": page, "x": float(x), "y": float(y), "text": text})
        page_contents.append("\n".join(parts).encode("latin-1"))

    # object layout: 1=catalog, 2=pages, 3=font, then per page (page, content)
    objects: dict[int, bytes] = {}
    first_page_obj = 4
    kids = []
    for i, content in enumerate(page_contents):
        page_num = first_page_obj + 2 * i
        cont_num = page_num + 1
        kids.append(f"{page_num} 0 R")
        objects[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {cont_num} 0 R >>".encode()
        )
        if rng.random() < 0.7:
            payload = zlib.compress(content)
            objects[cont_num] = (
                f"<< /Length {len(payload)} /Filter /FlateDecode >>".encode()
                + b"\nstream\n" + payload + b"\nendstream"
            )
        else:
            objects[cont_num] = (
                f"<< /Length {len(content)} >>".encode()
                + b"\nstream\n" + content + b"\nendstream"
            )
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (
        f"<< /Type /Pages /Kids [{' '.join(kids)}] /Count {n_pages} >>".encode()
    )
    objects[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    max_num = max(objects)
    out += f"xref\n0 {max_num + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, max_num + 1):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {max_num + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out), expected


def make_pdf_row(doc_id: int) -> tuple[dict, list[dict]]:
    """Deterministic (row, expected blocks) per doc_id. ~1 in 19 rows is
    a corrupt payload (error-row path)."""
    rng = random.Random(0x9D7 ^ (doc_id * 0x9E3779B9))
    if doc_id % 19 == 18:
        data = b"%PDF-1.4\n1 0 obj << /Type /Catalog garbage"
        return {"doc_id": doc_id, "pdf": data}, []
    data, expected = synth_pdf(rng)
    return {"doc_id": doc_id, "pdf": data}, expected


def ensure_pdf_parquet(n: int) -> str:
    """Materialize the synthetic PDF table (doc_id, pdf binary) as one
    parquet file (shared by the Spark query and the golden generator)."""
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join("/tmp", "gocrd_pdf_cache", f"v{PDFGEN_VERSION}_n{n}.parquet")
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        rows = [make_pdf_row(i)[0] for i in range(n)]
        table = pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
                "pdf": pa.array([r["pdf"] for r in rows], pa.binary()),
            }
        )
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        pq.write_table(table, tmp, compression="zstd")
        os.replace(tmp, path)
    return path
