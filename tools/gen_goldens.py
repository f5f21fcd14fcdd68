"""Generate golden parquet files for the extraction queries' DuckDB
oracles — produced by the PURE-PYTHON kernel (no Spark), so the driver's
oracle comparison pits the distributed pipeline against an independent
single-process implementation of the same semantics.

Keyed by DATAGEN_VERSION; tests/test_entry_contract.py asserts the
committed files match a fresh in-memory regeneration, so a datagen or
kernel change cannot silently ship stale goldens.

Usage: python tools/gen_goldens.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gocrd_spark import datagen  # noqa: E402
from gocrd_spark.extract import extract_any_document, mets_records  # noqa: E402

N_DOCS_SF001 = 1000  # matches __spark_entry__._pages at sf0.01


def build_tables(n_docs: int) -> dict[str, pa.Table]:
    text_rows = {"url": [], "text": [], "error": []}
    span_rows = {k: [] for k in (
        "url", "region_id", "ro_index", "byte_start", "byte_end",
        "char_start", "char_end")}
    mets_rows = {k: [] for k in (
        "url", "file_id", "mimetype", "flocat_type", "flocat_url")}
    for i in range(n_docs):
        row = datagen.make_row(i)
        url, html = row["url"], row["html"]
        result = extract_any_document(html)
        text_rows["url"].append(url)
        text_rows["text"].append(result["text"])
        text_rows["error"].append(result["error"])
        for s in result["spans"] or []:
            span_rows["url"].append(url)
            span_rows["region_id"].append(s["region_id"])
            span_rows["ro_index"].append(s["index"])
            for k in ("byte_start", "byte_end", "char_start", "char_end"):
                span_rows[k].append(s[k])
        for rec in mets_records(html, mimetype="application/alto+xml"):
            mets_rows["url"].append(url)
            for k in ("file_id", "mimetype", "flocat_type", "flocat_url"):
                mets_rows[k].append(rec[k])
    return {
        "extract_text": pa.table(text_rows),
        "extract_spans": pa.table(
            {k: pa.array(v, type=pa.int64() if "start" in k or "end" in k or k == "ro_index" else None)
             for k, v in span_rows.items()}
        ),
        "mets_files_alto": pa.table(mets_rows),
    }


def golden_path(name: str) -> str:
    return os.path.join(
        REPO, "goldens", f"{name}_v{datagen.DATAGEN_VERSION}_sf001.parquet"
    )


def main() -> int:
    os.makedirs(os.path.join(REPO, "goldens"), exist_ok=True)
    for name, table in build_tables(N_DOCS_SF001).items():
        path = golden_path(name)
        pq.write_table(table, path, compression="zstd")
        print(f"{path}: {table.num_rows} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
