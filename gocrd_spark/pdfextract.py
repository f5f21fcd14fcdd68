"""PDF layout-parse plumbing — decode STUBBED (no PDF library ships in
this container), Spark-side contract real.

Mirrors the multimodal pattern (operators/multimodal.py): the layout
parser raises NotImplementedError unless ``fake=True``, in which case a
deterministic fake derives a plausible page/block layout from a stable
byte hash, so the schema, batching and span plumbing are fully testable.

Output contract matches the other extractors: {text, spans, error},
spans carrying per-block offsets and a synthetic bbox per block — so a
PDF corpus drops into the same downstream (dedup, textstats, golden
audits) unchanged.
"""

from __future__ import annotations

import hashlib
import random
from typing import Any

from .spans import assemble

_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
    "eiusmod tempor incididunt ut labore et dolore magna aliqua"
).split()


def parse_pdf_layout(payload: bytes, fake: bool = False) -> list[dict[str, Any]]:
    """payload -> list of text blocks [{'text', 'page', 'bbox'}].

    STUB: real parsing needs a PDF library (e.g. pypdf/pdfminer), absent
    here. ``fake=True`` yields a deterministic layout derived from
    sha256(payload) — stable across runs and processes.
    """
    if not fake:
        raise NotImplementedError(
            "PDF layout parsing requires a PDF library (e.g. pdfminer); "
            "not available in this environment — use fake=True for plumbing tests"
        )
    digest = hashlib.sha256(payload).digest()
    rng = random.Random(int.from_bytes(digest[:8], "big"))
    blocks = []
    for page in range(rng.randint(1, 3)):
        for _ in range(rng.randint(1, 4)):
            n = rng.randint(5, 20)
            x0, y0 = rng.randint(0, 400), rng.randint(0, 600)
            blocks.append(
                {
                    "text": " ".join(rng.choice(_WORDS) for _ in range(n)),
                    "page": page,
                    "bbox": {"x0": x0, "y0": y0, "x1": x0 + 200, "y1": y0 + 40},
                }
            )
    return blocks


def extract_pdf(data: bytes, fake: bool = False) -> dict[str, Any]:
    """Same output contract as extract_document / extract_html."""
    try:
        layout = parse_pdf_layout(data, fake=fake)
        return assemble(
            (f"p{block['page']}_b{i}", i, block["text"], block["bbox"])
            for i, block in enumerate(layout)
        )
    except NotImplementedError as exc:
        return {"text": None, "spans": None, "error": f"NotImplementedError: {exc}"}
    except Exception as exc:
        return {"text": None, "spans": None, "error": f"{type(exc).__name__}: {exc}"}
