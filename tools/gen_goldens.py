"""Generate golden parquet files for the driver's DuckDB oracles —
produced by INDEPENDENT pure-Python implementations (no Spark), so the
driver's oracle comparison pits the distributed pipeline against a
second implementation of the same semantics:

- extraction goldens: the pure-Python kernel over the synthetic pages;
- operator goldens (simhash / winnowing): the oracle_twins module,
  built on the from-scratch xxHash64 in gocrd_spark.pyxxh.

Keyed by DATAGEN_VERSION / OPS_GOLDEN_VERSION; tests/test_entry_contract.py
asserts the committed files match a fresh regeneration, so a datagen or
operator change cannot silently ship stale goldens.

Usage: python tools/gen_goldens.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from gocrd_spark import datagen  # noqa: E402
from gocrd_spark.extract import extract_any_document, mets_records  # noqa: E402

N_DOCS_SF001 = 1000  # matches __spark_entry__._pages at sf0.01
TESTDATA_SF001 = "/root/testdata/sf0.01"
OPS_GOLDEN_VERSION = 1  # bump when an operator twin's params/semantics change


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


def _load_documents(sf_dir: str = TESTDATA_SF001) -> list[tuple[int, str]]:
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return sorted(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def build_operator_tables(
    docs: list[tuple[int, str]] | None = None,
) -> dict[str, pa.Table]:
    """Operator goldens from the pure-Python twins (oracle_twins) over
    the driver's sf0.01 documents table — shaped exactly like the
    corresponding __spark_entry__ query outputs."""
    import oracle_twins as tw

    docs = docs if docs is not None else _load_documents()
    sh = tw.simhash_near_dups(docs, n=2, max_hamming=3)
    winnow = []
    for doc_id, text in docs:
        fps = tw.winnowing_fingerprints(text)
        winnow.append((doc_id, len(fps), fps[0]))

    emb = tw.load_embeddings(os.path.join(TESTDATA_SF001, "embeddings.parquet"))
    qids = [0, 1, 2, 3, 4]
    nd = tw.embedding_near_dups_lsh(emb, threshold=0.42)
    lsh = tw.topk_lsh(emb, qids, k=10)
    ivf = tw.topk_ivf(emb, qids, k=10, n_cells=64, n_probe=16)

    i64 = pa.int64()

    def _t(rows: list[tuple], names: list[str]) -> pa.Table:
        return pa.table(
            {n: pa.array([r[i] for r in rows], i64) for i, n in enumerate(names)}
        )

    return {
        "simhash_near_dups": _t(sh, ["doc_a", "doc_b", "hamming"]),
        "winnowing_fingerprints": _t(
            winnow, ["doc_id", "n_fingerprints", "min_fingerprint"]
        ),
        "embedding_near_dups": _t(nd, ["id_a", "id_b", "cos_e6"]),
        "ann_topk_lsh": _t(lsh, ["query_id", "neighbor_id", "rank"]),
        "ann_topk_ivf": _t(ivf, ["query_id", "neighbor_id", "rank"]),
    }


def golden_path(name: str) -> str:
    return os.path.join(
        REPO, "goldens", f"{name}_v{datagen.DATAGEN_VERSION}_sf001.parquet"
    )


def ops_golden_path(name: str) -> str:
    return os.path.join(
        REPO, "goldens", f"{name}_v{OPS_GOLDEN_VERSION}_sf001.parquet"
    )


def main() -> int:
    os.makedirs(os.path.join(REPO, "goldens"), exist_ok=True)
    for name, table in build_tables(N_DOCS_SF001).items():
        path = golden_path(name)
        pq.write_table(table, path, compression="zstd")
        print(f"{path}: {table.num_rows} rows")
    for name, table in build_operator_tables().items():
        path = ops_golden_path(name)
        pq.write_table(table, path, compression="zstd")
        print(f"{path}: {table.num_rows} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
