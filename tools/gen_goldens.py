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

Scale-parameterized: the driver's oracle gate runs at sf0.01 (the
default), but every golden can be produced for any sf so the full
correctness sweep can also run at sf0.1 (tools/check_oracles.py sets
SPARK_GRAFT_ORACLE_SF, which golden_path/ops_golden_path read at call
time). Tags: sf0.01 -> _sf001, sf0.1 -> _sf01.

Usage: python tools/gen_goldens.py [--sf 0.01]
"""

from __future__ import annotations

import datetime
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from gocrd_spark import datagen  # noqa: E402
from gocrd_spark.fastextract import extract_document_fast  # noqa: E402

DEFAULT_SF = 0.01  # the driver's oracle scale
OPS_GOLDEN_VERSION = 1  # bump when an operator twin's params/semantics change


def oracle_sf() -> float:
    """Scale factor the oracles should read goldens for — the driver's
    sf0.01 unless SPARK_GRAFT_ORACLE_SF overrides (the sf0.1 sweep)."""
    return float(os.environ.get("SPARK_GRAFT_ORACLE_SF", DEFAULT_SF))


def sf_tag(sf: float | None = None) -> str:
    """0.01 -> 'sf001' (the historical tag), 0.1 -> 'sf01'."""
    sf = oracle_sf() if sf is None else float(sf)
    return "sf" + repr(sf).replace(".", "")


def n_docs_for(sf: float) -> int:
    """Matches __spark_entry__._pages: n_docs = sf * 100_000."""
    return max(int(sf * 100_000), 10)


def testdata_dir(sf: float) -> str:
    return f"/root/testdata/sf{sf:g}"


# back-compat aliases (pre-parameterization constants)
N_DOCS_SF001 = n_docs_for(DEFAULT_SF)
TESTDATA_SF001 = testdata_dir(DEFAULT_SF)

# Pinned contract values (FIXTURES.md §3-§4, derived from the reference's
# own tests) — the fixture rows' goldens are checked against these, so a
# regression in BOTH walkers cannot slip through silently.
KANT_SHA256 = "7bac7349cf86baac9834073fbfd7e589efa9d716e28578d6940362a02c7ec065"
KANT_SPANS = [  # (region_id, index, byte_start, byte_end, char_start, char_end)
    ("r_1_1", 0, 0, 7, 0, 7),
    ("r_2_1", 1, 8, 626, 8, 600),
    ("r_2_2", 2, 627, 1585, 601, 1512),
    ("r_2_3", 3, 1586, 1591, 1513, 1518),
]
METS_FIXTURE_ALTO_IDS = ["PAGE_0020_ALTO", "PAGE_0021_ALTO"]
METS_FIXTURE_0020_URL = (
    "https://github.com/OCR-D/assets/raw/master/data/kant_aufklaerung_1784/"
    "alto/kant_aufklaerung_1784_0020.xml"
)
# the extraction contract's error row for manifests (extract.py routing)
METS_ERROR = "METS manifest (no page text; use mets_files)"


def _spans_from_blocks(blocks: list[tuple[str, int, str]]):
    """Spec-level offset arithmetic: blocks joined by '\\n', spans carry
    byte (UTF-8) and char offsets — written from the output contract
    (FIXTURES.md §2), independent of gocrd_spark.spans."""
    text_parts, spans = [], []
    byte_off = char_off = 0
    for region_id, index, text in blocks:
        if text_parts:
            byte_off += 1
            char_off += 1
        nb, nc = len(text.encode("utf-8")), len(text)
        spans.append((region_id, index, byte_off, byte_off + nb, char_off, char_off + nc))
        text_parts.append(text)
        byte_off += nb
        char_off += nc
    return "\n".join(text_parts), spans


def _expected_fixture_page(html: bytes):
    """Kant fixture: extracted by the INDEPENDENT expat walker
    (fastextract), then asserted against the FIXTURES.md §3 pins."""
    import hashlib

    res = extract_document_fast(html)
    assert res["error"] is None
    got_sha = hashlib.sha256(res["text"].encode("utf-8")).hexdigest()
    assert got_sha == KANT_SHA256, f"kant text sha drifted: {got_sha}"
    got_spans = [
        (s["region_id"], s["index"], s["byte_start"], s["byte_end"],
         s["char_start"], s["char_end"])
        for s in res["spans"]
    ]
    assert got_spans == KANT_SPANS, f"kant spans drifted: {got_spans}"
    return res["text"], got_spans


def build_tables(n_docs: int) -> dict[str, pa.Table]:
    """Extraction goldens, independent of the kernel under test:

    - synthetic PAGE/HTML/METS rows: expected text/spans/file rows are
      computed from the TEMPLATE SPEC (datagen.make_row_with_spec) by
      spec-level arithmetic — no extractor runs at all;
    - the two reference-fixture rows: extracted by the independent expat
      walkers (fastextract / oracle_twins.mets_files_expat) and asserted
      against the FIXTURES.md §3-§4 pinned values;
    - garbage rows: the expat parse error (identical parser family and
      message contract as the kernel's tolerance path).
    """
    import oracle_twins as tw

    text_rows = {"url": [], "text": [], "error": []}
    span_rows = {k: [] for k in (
        "url", "region_id", "ro_index", "byte_start", "byte_end",
        "char_start", "char_end")}
    mets_rows = {k: [] for k in (
        "url", "file_id", "mimetype", "flocat_type", "flocat_url")}
    meta_rows: dict[str, list] = {k: [] for k in (
        "url", "warc_ts_epoch", "title", "description", "canonical_url",
        "og_title", "lang_attr", "robots", "noindex", "nofollow", "error")}

    def _robots_flags_spec(raw):
        """Spec-level robots-meta token rule (comma-separated,
        case-insensitive, 'none' implies both) — written from the
        documented rule, independent of htmlextract.robots_meta_flags."""
        toks = [t.strip().lower() for t in raw.split(",")] if raw else []
        return (
            1 if ("noindex" in toks or "none" in toks) else 0,
            1 if ("nofollow" in toks or "none" in toks) else 0,
        )

    def emit_meta(url: str, warc_ts, meta) -> None:
        """page_metadata golden row from the TEMPLATE SPEC: html rows
        carry the spec's decoded metadata, every other payload kind is
        all-null with flags 0 (absence is data, not error)."""
        epoch = int((warc_ts - datetime.datetime(1970, 1, 1)).total_seconds())
        meta_rows["url"].append(url)
        meta_rows["warc_ts_epoch"].append(epoch)
        if meta is None:
            for k in ("title", "description", "canonical_url", "og_title",
                      "lang_attr", "robots"):
                meta_rows[k].append(None)
            meta_rows["noindex"].append(0)
            meta_rows["nofollow"].append(0)
        else:
            meta_rows["title"].append(meta["title"])
            meta_rows["description"].append(meta["description"])
            meta_rows["canonical_url"].append(meta["canonical"])
            meta_rows["og_title"].append(meta["og_title"])
            meta_rows["lang_attr"].append(meta["lang_attr"])
            meta_rows["robots"].append(meta["robots"])
            ni, nf = _robots_flags_spec(meta["robots"])
            meta_rows["noindex"].append(ni)
            meta_rows["nofollow"].append(nf)
        meta_rows["error"].append(None)

    def emit(url: str, text, spans, error) -> None:
        text_rows["url"].append(url)
        text_rows["text"].append(text)
        text_rows["error"].append(error)
        for s in spans or []:
            span_rows["url"].append(url)
            for k, v in zip(
                ("region_id", "ro_index", "byte_start", "byte_end",
                 "char_start", "char_end"), s,
            ):
                span_rows[k].append(v)

    for i in range(n_docs):
        row, kind, spec = datagen.make_row_with_spec(i)
        url, html = row["url"], row["html"]
        emit_meta(url, row["warc_ts"], spec["meta"] if kind == "html" else None)
        if kind == "kant":
            text, spans = _expected_fixture_page(html)
            emit(url, text, spans, None)
        elif kind == "mets_fixture":
            emit(url, None, None, METS_ERROR)
            recs = tw.mets_files_expat(html, mimetype="application/alto+xml")
            assert [r["file_id"] for r in recs] == METS_FIXTURE_ALTO_IDS
            assert recs[0]["flocat_url"] == METS_FIXTURE_0020_URL
            for rec in recs:
                mets_rows["url"].append(url)
                for k in ("file_id", "mimetype", "flocat_type", "flocat_url"):
                    mets_rows[k].append(rec[k])
        elif kind == "garbage":
            res = extract_document_fast(html)
            assert res["error"] is not None
            emit(url, None, None, res["error"])
        elif kind == "mets":
            emit(url, None, None, METS_ERROR)
            for use, n_files in spec["group_files"]:
                for j in range(n_files):
                    mets_rows["url"].append(url)
                    mets_rows["file_id"].append(f"{use}_{j:04d}")
                    mets_rows["mimetype"].append("application/alto+xml")
                    mets_rows["flocat_type"].append("URL")
                    mets_rows["flocat_url"].append(
                        f"https://files.test/{use}/{j:04d}.xml"
                    )
        elif kind == "html":
            # boilerplate-strip contract: kept blocks are the <h1> and the
            # <p>s; block ordinals follow the parser's block stream for
            # this template (stray '\n' between </head> and <body> = 0,
            # body=1, article=2, h1=3, inter-paragraph '\n' divs at even
            # ordinals) -> h1 is b3, paragraph j is b{5+2j}
            blocks = [("b3", 3, spec["title"])] + [
                (f"b{5 + 2 * j}", 5 + 2 * j, p) for j, p in enumerate(spec["paras"])
            ]
            text, spans = _spans_from_blocks(blocks)
            emit(url, text, spans, None)
        else:  # page
            entries = sorted(spec["ref_entries"], key=lambda e: e[0])
            blocks = [
                (rid, idx, spec["region_texts"][rid])
                for idx, rid in entries
                if rid in spec["region_texts"]  # dangling regionRef skipped
            ]
            text, spans = _spans_from_blocks(blocks)
            emit(url, text, spans, None)

    return {
        "extract_text": pa.table(text_rows),
        "extract_spans": pa.table(
            {k: pa.array(v, type=pa.int64() if "start" in k or "end" in k or k == "ro_index" else None)
             for k, v in span_rows.items()}
        ),
        "mets_files_alto": pa.table(mets_rows),
        "page_metadata": pa.table(
            {k: pa.array(
                v,
                type=pa.int64()
                if k in ("warc_ts_epoch", "noindex", "nofollow")
                else pa.string(),
            ) for k, v in meta_rows.items()}
        ),
    }


def _load_documents(sf_dir: str = TESTDATA_SF001) -> list[tuple[int, str]]:
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return sorted(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def _load_documents_src(sf_dir: str = TESTDATA_SF001) -> list[tuple[int, str, str]]:
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "source"]
    )
    return sorted(
        zip(t["doc_id"].to_pylist(), t["text"].to_pylist(), t["source"].to_pylist())
    )


def build_operator_tables(
    docs: list[tuple[int, str]] | None = None,
    sf: float = DEFAULT_SF,
) -> dict[str, pa.Table]:
    """Operator goldens from the pure-Python twins (oracle_twins) over
    the given scale's documents table — shaped exactly like the
    corresponding __spark_entry__ query outputs."""
    import oracle_twins as tw

    docs = docs if docs is not None else _load_documents(testdata_dir(sf))
    sh = tw.simhash_near_dups(docs, n=2, max_hamming=3)
    sh_exact = tw.simhash_exact_pairs(docs, n=2, max_hamming=3)
    # the recall certification golden: every exact pair must be FOUND
    # by the banded operator (pigeonhole guarantee) — found=1 is the
    # twin's independent assertion of that claim
    sh_recall = [(a, b, h, 1) for a, b, h in sh_exact]
    winnow = []
    for doc_id, text in docs:
        fps = tw.winnowing_fingerprints(text)
        winnow.append((doc_id, len(fps), fps[0]))

    # PDF extraction golden: expected text/blocks come from the PDF
    # GENERATOR's template spec (pdfgen.make_pdf_row), not the parser;
    # the corrupt-row error string is the parser's pinned contract.
    from gocrd_spark import pdfgen

    PDF_CORRUPT_ERROR = "ValueError: no PDF objects found"
    pdf_rows = []
    for i in range(max(int(sf * 10_000), 10)):  # matches _q_pdf_extract
        _, expected = pdfgen.make_pdf_row(i)
        if i % 19 == 18:
            pdf_rows.append((i, None, None, PDF_CORRUPT_ERROR))
        else:
            pdf_rows.append(
                (i, "\n".join(b["text"] for b in expected), len(expected), None)
            )

    # perceptual-hash goldens: input table shared with the query
    # (multimodal.synth_ppm_media_pdf — the datagen, not the operator);
    # expected hashes/pairs from the zero-numpy loop twins
    from gocrd_spark.operators import multimodal as _mm

    n_media = max(int(sf * 10_000), 10)
    ppm_rows = [
        (int(r.id), bytes(r.payload))
        for r in _mm.synth_ppm_media_pdf(n_media).itertuples(index=False)
    ]
    phashes = tw.image_phashes(ppm_rows)
    ph_pairs = tw.phash_near_dups_exact(ppm_rows, max_hamming=6)
    if not ph_pairs:
        raise RuntimeError("phash golden degenerate: no planted pairs found")

    emb = tw.load_embeddings(os.path.join(testdata_dir(sf), "embeddings.parquet"))
    qids = [0, 1, 2, 3, 4]
    nd = tw.embedding_near_dups_lsh(emb, threshold=0.42)
    lsh = tw.topk_lsh(emb, qids, k=10)
    ivf = tw.topk_ivf(emb, qids, k=10, n_cells=64, n_probe=16)
    sem = tw.semdedup_keep(emb, n_cells=16, n_iters=2, threshold=0.42)
    pqc = tw.pq_codes(emb, m=8, n_codes=16, n_iters=2)
    pqt = tw.pq_topk(emb, qids, k=10, m=8, n_codes=16, n_iters=2)
    ivfpq = tw.topk_ivfpq(emb, qids, k=10)
    ivfpq_rec = tw.ivfpq_recall(emb, qids, k=10)
    hdocs = tw.hashed_doc_embeddings(docs, dim=64)
    tsem = tw.semdedup_keep(hdocs, n_cells=16, n_iters=2, threshold=0.9)

    i64 = pa.int64()

    def _t(rows: list[tuple], names: list[str]) -> pa.Table:
        return pa.table(
            {n: pa.array([r[i] for r in rows], i64) for i, n in enumerate(names)}
        )

    hll_rows = tw.hll_distinct_terms(_load_documents_src(testdata_dir(sf)))
    cms_rows = tw.cms_heavy_hitters(docs)

    bpe_merges = tw.bpe_train(docs, n_merges=24, min_pair_count=2)
    bpe_enc = tw.bpe_encode(docs, bpe_merges)
    bpe_voc = tw.bpe_vocab(docs, bpe_merges)
    comp = tw.compression_stats(docs)

    # the compressed sizes are pinned to THIS zlib build's exact output
    # (a different implementation, e.g. zlib-ng, compresses differently
    # at the same level despite identical semantics) — record the
    # runtime version in the golden's parquet metadata so a check on a
    # different runtime fails LOUDLY instead of diverging silently
    # (ADVICE r04); asserted by tests/test_operators.py
    import zlib as _zlib

    comp_table = _t(comp, ["doc_id", "n_bytes", "n_bytes_zlib"])
    comp_table = comp_table.replace_schema_metadata(
        {b"zlib_runtime": _zlib.ZLIB_RUNTIME_VERSION.encode()}
    )

    return {
        "compression_stats": comp_table,
        "bpe_vocab": pa.table(
            {
                "token_id": pa.array([r[0] for r in bpe_voc], pa.int64()),
                "token": pa.array([r[1] for r in bpe_voc], pa.string()),
            }
        ),
        "bpe_merges": pa.table(
            {
                "rank": pa.array([r[0] for r in bpe_merges], pa.int64()),
                "left_sym": pa.array([r[1] for r in bpe_merges], pa.string()),
                "right_sym": pa.array([r[2] for r in bpe_merges], pa.string()),
            }
        ),
        "bpe_encode": pa.table(
            {
                "doc_id": pa.array([r[0] for r in bpe_enc], pa.int64()),
                "n_tokens": pa.array([r[1] for r in bpe_enc], pa.int64()),
                "n_unique_tokens": pa.array([r[2] for r in bpe_enc], pa.int64()),
            }
        ),
        "pdf_extract_text": pa.table(
            {
                "doc_id": pa.array([r[0] for r in pdf_rows], i64),
                "text": pa.array([r[1] for r in pdf_rows], pa.string()),
                "n_blocks": pa.array([r[2] for r in pdf_rows], i64),
                "error": pa.array([r[3] for r in pdf_rows], pa.string()),
            }
        ),
        "simhash_near_dups": _t(sh, ["doc_a", "doc_b", "hamming"]),
        "simhash_recall": _t(sh_recall, ["doc_a", "doc_b", "hamming", "found"]),
        "winnowing_fingerprints": _t(
            winnow, ["doc_id", "n_fingerprints", "min_fingerprint"]
        ),
        "image_phash": pa.table(
            {
                "id": pa.array([r[0] for r in phashes], i64),
                "phash": pa.array([r[1] for r in phashes], i64),
            }
        ),
        "phash_near_dups": _t(ph_pairs, ["id_a", "id_b", "hamming"]),
        "embedding_near_dups": _t(nd, ["id_a", "id_b", "cos_e6"]),
        "ann_topk_lsh": _t(lsh, ["query_id", "neighbor_id", "rank"]),
        "ann_topk_ivf": _t(ivf, ["query_id", "neighbor_id", "rank"]),
        "semdedup": _t(sem, ["vec_id", "cell", "canonical_id", "keep"]),
        "pq_codes": _t(pqc, ["vec_id", "sub", "code"]),
        "pq_topk": _t(pqt, ["query_id", "neighbor_id", "adc_e6", "rank"]),
        "ann_topk_ivfpq": _t(ivfpq, ["query_id", "neighbor_id", "adc_e6", "rank"]),
        "ivfpq_recall": _t(ivfpq_rec, ["query_id", "k", "n_found"]),
        "text_semdedup": _t(tsem, ["vec_id", "cell", "canonical_id", "keep"]),
        "hll_distinct_terms": pa.table(
            {
                "group": pa.array([r[0] for r in hll_rows], pa.string()),
                "est_distinct": pa.array([r[1] for r in hll_rows], i64),
                "n_zero": pa.array([r[2] for r in hll_rows], i64),
                "exact_distinct": pa.array([r[3] for r in hll_rows], i64),
                "err_permille": pa.array([r[4] for r in hll_rows], i64),
            }
        ),
        "cms_heavy_hitters": pa.table(
            {
                "term": pa.array([r[0] for r in cms_rows], pa.string()),
                "est_count": pa.array([r[1] for r in cms_rows], i64),
                "exact_count": pa.array([r[2] for r in cms_rows], i64),
                "rank": pa.array([r[3] for r in cms_rows], i64),
            }
        ),
    }


def golden_path(name: str, sf: float | None = None) -> str:
    return os.path.join(
        REPO, "goldens",
        f"{name}_v{datagen.DATAGEN_VERSION}_{sf_tag(sf)}.parquet",
    )


def ops_golden_path(name: str, sf: float | None = None) -> str:
    return os.path.join(
        REPO, "goldens", f"{name}_v{OPS_GOLDEN_VERSION}_{sf_tag(sf)}.parquet"
    )


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=DEFAULT_SF)
    args = ap.parse_args()
    sf = args.sf
    os.makedirs(os.path.join(REPO, "goldens"), exist_ok=True)
    for name, table in build_tables(n_docs_for(sf)).items():
        path = golden_path(name, sf)
        pq.write_table(table, path, compression="zstd")
        print(f"{path}: {table.num_rows} rows")
    for name, table in build_operator_tables(sf=sf).items():
        path = ops_golden_path(name, sf)
        pq.write_table(table, path, compression="zstd")
        print(f"{path}: {table.num_rows} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
