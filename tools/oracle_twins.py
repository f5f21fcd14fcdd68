"""Pure-Python twins of the hash-based operators — independent
implementations used ONLY to generate driver-oracle goldens
(tools/gen_goldens.py), so the driver's hash-compare pits the Spark
operators against a second implementation of the same public semantics
(xxHash64 from gocrd_spark.pyxxh, itself parity-pinned against the JVM
by tests/test_pyxxh.py).

Scope note: the twins assume ASCII corpora (the driver testdata is
ASCII; generation asserts it) because Java's ``\\s``/``toLowerCase`` and
Python's differ outside ASCII.
"""

from __future__ import annotations

import re
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The banding *plan* (block widths/combos) is deliberately shared config,
# not re-derived: a plan bug would reproduce in both twin and operator, so
# the plan's recall property is INDEPENDENTLY gated by
# tests/test_scale_plans.py::test_pigeonhole_recall_guarantee (pure
# itertools check that every <=h-bit corruption leaves >=1 clean band).
from gocrd_spark.operators.dedup import simhash_bands  # noqa: E402
from gocrd_spark.pyxxh import spark_xxhash64  # noqa: E402

_WS = re.compile(r"[ \t\n\x0b\f\r]+")  # Java \s (ASCII), not Python unicode \s
_MASK = (1 << 64) - 1


def _check_ascii(text: str) -> str:
    if not text.isascii():
        raise ValueError("oracle twins support ASCII corpora only")
    return text


def norm_text(text: str) -> str:
    """Twin of dedup._norm_text: lower + whitespace-collapse + trim."""
    return _WS.sub(" ", _check_ascii(text).lower()).strip(" ")


def shingles(text: str, n: int) -> list[str]:
    """Twin of dedup.shingle_docs: distinct word n-grams (first-occurrence
    order, matching array_distinct)."""
    toks = [t for t in norm_text(text).split(" ") if t]
    if len(toks) >= n:
        sh = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    else:
        sh = [" ".join(toks)]
    return list(dict.fromkeys(sh))


def simhash64(text: str, n: int = 2) -> int:
    """Twin of dedup.simhash64: per-bit majority vote over xxhash64 of
    the shingle set. Returns the signed 64-bit value Spark emits."""
    hashes = [spark_xxhash64(s) & _MASK for s in shingles(text, n)]
    total = len(hashes)
    sim = 0
    for b in range(64):
        cnt = sum((h >> b) & 1 for h in hashes)
        if cnt * 2 > total:
            sim |= 1 << b
    return sim - (1 << 64) if sim >= (1 << 63) else sim


def simhash_near_dups(
    docs: list[tuple[int, str]],
    n: int = 2,
    max_hamming: int = 3,
    max_bucket: int | None = 10_000,
) -> list[tuple[int, int, int]]:
    """Twin of dedup.simhash_near_dups over (doc_id, text) rows.
    Returns sorted (doc_a, doc_b, hamming) with hamming <= max_hamming."""
    widths, offsets, combos = simhash_bands(max_hamming)
    sigs = {doc_id: simhash64(text, n) & _MASK for doc_id, text in docs}
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, sig in sigs.items():
        for band, combo in enumerate(combos):
            key = 0
            for b in combo:
                key = (key << widths[b]) | ((sig >> offsets[b]) & ((1 << widths[b]) - 1))
            buckets.setdefault((band, key), []).append(doc_id)
    pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        if max_bucket is not None and len(members) > max_bucket:
            continue
        members.sort()
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                pairs.add((a, b))
    out = []
    for a, b in pairs:
        ham = bin(sigs[a] ^ sigs[b]).count("1")
        if ham <= max_hamming:
            out.append((a, b, ham))
    return sorted(out)


def simhash_exact_pairs(
    docs: list[tuple[int, str]],
    n: int = 2,
    max_hamming: int = 3,
) -> list[tuple[int, int, int]]:
    """Brute-force ALL-PAIRS hamming over the twin's simhash — the
    banding-free exact answer the recall certification compares the
    banded operator against (no simhash_bands involvement at all)."""
    sigs = sorted((doc_id, simhash64(text, n) & _MASK) for doc_id, text in docs)
    out = []
    for i in range(len(sigs)):
        a_id, a_sig = sigs[i]
        for j in range(i + 1, len(sigs)):
            b_id, b_sig = sigs[j]
            ham = bin(a_sig ^ b_sig).count("1")
            if ham <= max_hamming:
                out.append((a_id, b_id, ham))
    return sorted(out)


def winnowing_fingerprints(
    text: str, k: int = 8, w: int = 4
) -> list[int]:
    """Twin of textstats.winnowing_fingerprints: xxhash64 over every
    k-char gram of the normalized text, min of each w-window, distinct
    sorted. Character-based slicing matches Spark's Column.substr."""
    norm = norm_text(text)
    if len(norm) >= k:
        grams = [spark_xxhash64(norm[i : i + k]) for i in range(len(norm) - k + 1)]
    else:
        grams = [spark_xxhash64(norm)]
    if len(grams) >= w:
        minima = {min(grams[i : i + w]) for i in range(len(grams) - w + 1)}
    else:
        minima = {min(grams)}
    return sorted(minima)


# NOTE: no MinHash twin lives here on purpose — minhash_near_dups is
# oracle-checked against the exact all-pairs Jaccard SQL instead (a
# stronger, semantically independent check that also certifies recall).


# ---------------------------------------------------------------------------
# independent METS walker (expat) — golden generator for the reference
# mets.xml fixture row, distinct from gocrd_spark.mets (ElementTree walk)
# ---------------------------------------------------------------------------


def mets_files_expat(data: bytes, mimetype: str = "") -> list[dict[str, str]]:
    """Twin of extract.mets_records for the driver's mimetype query:
    /mets/fileSec/fileGrp/file with local-name matching, first direct
    FLocat child, attributes matched by local name in document order.
    Returns [] for unparseable or non-METS payloads."""
    from xml.parsers import expat

    def local(name: str) -> str:
        return name.rsplit(":", 1)[-1]

    def attr(attrs: dict, want: str):
        for key, value in attrs.items():
            if key.rsplit(":", 1)[-1] == want:
                return value
        return None

    stack: list[str] = []
    rows: list[dict[str, str]] = []
    state = {"cur": None, "root_ok": False}

    def start(name, attrs):
        ln = local(name)
        if not stack:
            state["root_ok"] = ln == "mets"
        if state["root_ok"]:
            if (
                len(stack) == 3
                and ln == "file"
                and stack == ["mets", "fileSec", "fileGrp"]
            ):
                state["cur"] = {
                    "file_id": attr(attrs, "ID") or "",
                    "mimetype": attr(attrs, "MIMETYPE") or "",
                    "flocat_type": "",
                    "flocat_url": "",
                    "_flocat_seen": False,
                }
            elif (
                len(stack) == 4
                and state["cur"] is not None
                and ln == "FLocat"
                and not state["cur"]["_flocat_seen"]
            ):
                state["cur"]["_flocat_seen"] = True
                state["cur"]["flocat_type"] = attr(attrs, "LOCTYPE") or ""
                state["cur"]["flocat_url"] = attr(attrs, "href") or ""
        stack.append(ln)

    def end(name):
        stack.pop()
        if len(stack) == 3 and local(name) == "file" and state["cur"] is not None:
            cur = state["cur"]
            state["cur"] = None
            if not mimetype or cur["mimetype"] == mimetype:
                rows.append(
                    {k: cur[k] for k in ("file_id", "mimetype", "flocat_type", "flocat_url")}
                )

    parser = expat.ParserCreate(namespace_separator=None)
    parser.StartElementHandler = start
    parser.EndElementHandler = end
    try:
        parser.Parse(data, True)
    except expat.ExpatError:
        return []
    return rows if state["root_ok"] else []


# ---------------------------------------------------------------------------
# embedding similarity twins
#
# Bit-exactness contract: Spark evaluates the vector folds (dot, norm,
# squared distance) as SEQUENTIAL left folds over the array (aggregate /
# zip_with), in IEEE double. The twins reproduce the identical operation
# order, so candidate buckets, cosines and rankings match bit for bit.
# Spark's round(x, s) is shortest-decimal-repr + HALF_UP (BigDecimal
# .valueOf semantics) — mirrored with Decimal(repr(x)).
# ---------------------------------------------------------------------------

from decimal import ROUND_HALF_UP, Decimal  # noqa: E402

import numpy as np  # noqa: E402


def spark_round(x: float, scale: int) -> float:
    q = Decimal(1).scaleb(-scale)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _norm(a) -> float:
    acc = 0.0
    for x in a:
        acc += x * x
    return acc ** 0.5


def cosine(a, b) -> float:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _dist2(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += (x - y) * (x - y)
    return acc


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return [[float(v) for v in row] for row in rng.standard_normal((n_planes, dim))]


def _bucket(vec, planes) -> int:
    b = 0
    for i, plane in enumerate(planes):
        if _dot(vec, plane) > 0:
            b += 1 << i
    return b


def _lsh_tables(
    emb: dict[int, list[float]], dim: int, n_planes: int, n_tables: int, seed: int
) -> list[dict[int, list[int]]]:
    """Per table: bucket -> sorted member vec_ids."""
    tables = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        buckets: dict[int, list[int]] = {}
        for vid in sorted(emb):
            buckets.setdefault(_bucket(emb[vid], planes), []).append(vid)
        tables.append(buckets)
    return tables


def embedding_near_dups_lsh(
    emb: dict[int, list[float]],
    threshold: float = 0.42,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
) -> list[tuple[int, int, int]]:
    """Twin of similarity.embedding_near_dups_lsh. Returns sorted
    (id_a, id_b, cos_e6)."""
    cand: set[tuple[int, int]] = set()
    for buckets in _lsh_tables(emb, dim, n_planes, n_tables, seed):
        for members in buckets.values():
            for i, a in enumerate(members):
                for b in members[i + 1 :]:
                    cand.add((a, b))
    out = []
    thr = int(threshold * 1_000_000)
    for a, b in cand:
        cos6 = spark_round(cosine(emb[a], emb[b]), 6)
        cos_e6 = int(spark_round(cos6 * 1_000_000, 0))
        if cos_e6 >= thr:
            out.append((a, b, cos_e6))
    return sorted(out)


def _rank_topk(
    scored: dict[int, dict[int, float]], k: int
) -> list[tuple[int, int, int]]:
    """(query -> neighbor -> cos9) -> (query_id, neighbor_id, rank) rows
    with the (cos desc, neighbor asc) tie-break."""
    out = []
    for q in sorted(scored):
        ranked = sorted(scored[q].items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for r, (nid, _) in enumerate(ranked, start=1):
            out.append((q, nid, r))
    return out


def topk_lsh(
    emb: dict[int, list[float]],
    query_ids: list[int],
    k: int = 10,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
) -> list[tuple[int, int, int]]:
    """Twin of similarity.topk_lsh."""
    tables = _lsh_tables(emb, dim, n_planes, n_tables, seed)
    scored: dict[int, dict[int, float]] = {}
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        for q in query_ids:
            for nid in tables[t].get(_bucket(emb[q], planes), []):
                if nid != q:
                    scored.setdefault(q, {}).setdefault(
                        nid, spark_round(cosine(emb[q], emb[nid]), 9)
                    )
    return _rank_topk(scored, k)


def _kmeans_centroids(
    emb: dict[int, list[float]], n_cells: int, n_iters: int
) -> dict[int, list[float]]:
    """Twin of similarity.kmeans_centroids_df (rounded-mean Lloyd).
    Returned as cell -> centroid: a cell that loses all members vanishes
    WITHOUT renumbering the others (matching the groupBy semantics)."""
    seeds = sorted(emb)[:n_cells]
    cent = {i: [spark_round(x, 6) for x in emb[v]] for i, v in enumerate(seeds)}

    def nearest(vec, cent) -> int:
        return min(cent, key=lambda c: (_dist2(vec, cent[c]), c))

    for _ in range(n_iters):
        members: dict[int, list[int]] = {}
        for vid in sorted(emb):
            members.setdefault(nearest(emb[vid], cent), []).append(vid)
        new = {}
        for c, vids in members.items():
            vecs = [emb[v] for v in vids]
            dim = len(vecs[0])
            new[c] = [
                spark_round(sum(v[d] for v in vecs) / len(vecs), 6)
                for d in range(dim)
            ]
        cent = new
    return cent


def topk_ivf(
    emb: dict[int, list[float]],
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    n_iters: int = 2,
) -> list[tuple[int, int, int]]:
    """Twin of similarity.topk_ivf (over the rounded-mean quantizer)."""
    cent = _kmeans_centroids(emb, n_cells, n_iters)
    assign: dict[int, int] = {
        vid: min(cent, key=lambda c: (_dist2(v, cent[c]), c))
        for vid, v in emb.items()
    }
    cells: dict[int, list[int]] = {}
    for vid, c in sorted(assign.items()):
        cells.setdefault(c, []).append(vid)
    scored: dict[int, dict[int, float]] = {}
    for q in query_ids:
        probes = sorted(cent, key=lambda c: (_dist2(emb[q], cent[c]), c))[:n_probe]
        for c in probes:
            for nid in cells.get(c, []):
                if nid != q:
                    scored.setdefault(q, {})[nid] = spark_round(
                        cosine(emb[q], emb[nid]), 9
                    )
    return _rank_topk(scored, k)


def semdedup_keep(
    emb: dict[int, list[float]],
    n_cells: int = 16,
    n_iters: int = 2,
    threshold: float = 0.42,
) -> list[tuple[int, int, int, int]]:
    """Twin of similarity.semdedup: k-means cells (rounded-mean Lloyd
    twin), EXACT within-cell cosine pairs at 6dp fixed point,
    union-find components (vs the engine's min-label propagation),
    min-id canonical. Returns sorted (vec_id, cell, canonical_id,
    keep)."""
    cent = _kmeans_centroids(emb, n_cells, n_iters)
    assign: dict[int, int] = {
        vid: min(cent, key=lambda c: (_dist2(v, cent[c]), c))
        for vid, v in emb.items()
    }
    cells: dict[int, list[int]] = {}
    for vid in sorted(assign):
        cells.setdefault(assign[vid], []).append(vid)
    parent = {vid: vid for vid in emb}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    thr = int(round(threshold * 1_000_000))
    for members in cells.values():
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                cos6 = spark_round(cosine(emb[a], emb[b]), 6)
                if int(spark_round(cos6 * 1_000_000, 0)) >= thr:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        if ra < rb:
                            parent[rb] = ra
                        else:
                            parent[ra] = rb
    return sorted(
        (vid, assign[vid], find(vid), int(find(vid) == vid)) for vid in emb
    )


def _pq_sub(vec: list[float], sub: int, m: int) -> list[float]:
    w = len(vec) // m
    return vec[sub * w : (sub + 1) * w]


def _pq_codebooks(
    emb: dict[int, list[float]], m: int, n_codes: int, n_iters: int
) -> dict[int, dict[int, list[float]]]:
    """Twin of similarity.pq_codebooks: an independent rounded-mean
    Lloyd per contiguous subspace, seeds = the n_codes lowest vec_ids'
    subvectors, (d2, code) assignment tie-break, empty codes vanish
    without renumbering. Returns sub -> {code -> centroid}."""
    seeds = sorted(emb)[:n_codes]
    cent: dict[int, dict[int, list[float]]] = {
        s: {
            i: [spark_round(x, 6) for x in _pq_sub(emb[v], s, m)]
            for i, v in enumerate(seeds)
        }
        for s in range(m)
    }
    for _ in range(n_iters):
        new: dict[int, dict[int, list[float]]] = {}
        for s in range(m):
            members: dict[int, list[int]] = {}
            for vid in sorted(emb):
                sv = _pq_sub(emb[vid], s, m)
                code = min(cent[s], key=lambda c: (_dist2(sv, cent[s][c]), c))
                members.setdefault(code, []).append(vid)
            new[s] = {}
            for c, vids in members.items():
                vecs = [_pq_sub(emb[v], s, m) for v in vids]
                dim = len(vecs[0])
                new[s][c] = [
                    spark_round(sum(v[d] for v in vecs) / len(vecs), 6)
                    for d in range(dim)
                ]
        cent = new
    return cent


def pq_codes(
    emb: dict[int, list[float]],
    m: int = 8,
    n_codes: int = 16,
    n_iters: int = 2,
) -> list[tuple[int, int, int]]:
    """Twin of similarity.pq_encode: (vec_id, sub, code) rows."""
    cent = _pq_codebooks(emb, m, n_codes, n_iters)
    out = []
    for vid in sorted(emb):
        for s in range(m):
            sv = _pq_sub(emb[vid], s, m)
            code = min(cent[s], key=lambda c: (_dist2(sv, cent[s][c]), c))
            out.append((vid, s, code))
    return out


def pq_topk(
    emb: dict[int, list[float]],
    query_ids: list[int],
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    n_iters: int = 2,
) -> list[tuple[int, int, int, int]]:
    """Twin of similarity.pq_topk: ADC distances as exact BIGINT sums
    of per-subspace 6dp-fixed-point LUT entries; (adc_e6, neighbor_id)
    ranking. Returns (query_id, neighbor_id, adc_e6, rank) rows."""
    cent = _pq_codebooks(emb, m, n_codes, n_iters)
    codes = {}
    for vid in sorted(emb):
        codes[vid] = [
            min(
                cent[s],
                key=lambda c: (_dist2(_pq_sub(emb[vid], s, m), cent[s][c]), c),
            )
            for s in range(m)
        ]
    out = []
    for q in query_ids:
        lut = {
            (s, c): int(spark_round(_dist2(_pq_sub(emb[q], s, m), cent[s][c]) * 1_000_000, 0))
            for s in range(m)
            for c in cent[s]
        }
        scored = [
            (sum(lut[(s, codes[nid][s])] for s in range(m)), nid)
            for nid in sorted(emb)
            if nid != q
        ]
        scored.sort()
        for rank, (adc, nid) in enumerate(scored[:k], start=1):
            out.append((q, nid, adc, rank))
    return out


def topk_ivfpq(
    emb: dict[int, list[float]],
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    coarse_iters: int = 2,
    m: int = 8,
    n_codes: int = 16,
    pq_iters: int = 2,
) -> list[tuple[int, int, int, int]]:
    """Twin of similarity.ivfpq_topk: coarse rounded-mean k-means,
    residual PQ codebooks, per-(query, probed-cell) 6dp fixed-point
    LUTs, exact BIGINT ADC sums, (adc_e6, neighbor_id) ranking."""
    cent = _kmeans_centroids(emb, n_cells, coarse_iters)
    assign = {
        vid: min(cent, key=lambda c: (_dist2(v, cent[c]), c))
        for vid, v in emb.items()
    }
    residuals = {
        vid: [x - y for x, y in zip(emb[vid], cent[assign[vid]])] for vid in emb
    }
    cb = _pq_codebooks(residuals, m, n_codes, pq_iters)
    codes = {
        vid: [
            min(
                cb[s],
                key=lambda c: (_dist2(_pq_sub(residuals[vid], s, m), cb[s][c]), c),
            )
            for s in range(m)
        ]
        for vid in sorted(emb)
    }
    out = []
    for q in query_ids:
        probes = sorted(cent, key=lambda c: (_dist2(emb[q], cent[c]), c))[:n_probe]
        lut = {}
        for cell in probes:
            q_res = [x - y for x, y in zip(emb[q], cent[cell])]
            for s in range(m):
                for c in cb[s]:
                    lut[(cell, s, c)] = int(
                        spark_round(
                            _dist2(_pq_sub(q_res, s, m), cb[s][c]) * 1_000_000, 0
                        )
                    )
        scored = [
            (
                sum(lut[(assign[nid], s, codes[nid][s])] for s in range(m)),
                nid,
            )
            for nid in sorted(emb)
            if nid != q and assign[nid] in probes
        ]
        scored.sort()
        for rank, (adc, nid) in enumerate(scored[:k], start=1):
            out.append((q, nid, adc, rank))
    return out


def load_embeddings(path: str) -> dict[int, list[float]]:
    """vec_id -> vector as exact doubles (float32 -> double is exact)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["vec_id", "embedding"])
    return {
        int(v): [float(x) for x in e]
        for v, e in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())
    }


# --- BPE twins (independent single-node trainer/encoder) --------------------

BPE_END = "</w>"


def _bpe_split_words(text: str, lowercase: bool = True) -> list[str]:
    """ASCII-\\s split matching the JVM side's Java \\s semantics."""
    import re

    if lowercase:
        text = text.lower()
    return [w for w in re.split(r"\s+", text, flags=re.ASCII) if w]


def _bpe_merge(sym: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    for x in sym:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def bpe_train(
    docs: list[tuple[int, str]],
    n_merges: int = 24,
    min_pair_count: int = 2,
    lowercase: bool = True,
) -> list[tuple[int, str, str]]:
    """Single-node Sennrich-style trainer over dict counters — the
    independent twin of operators.bpe.bpe_train (distinct-word table,
    greedy left-to-right merge, ties to the lexicographically smallest
    pair)."""
    from collections import Counter

    freqs: Counter = Counter()
    for _, text in docs:
        for w in _bpe_split_words(text, lowercase):
            freqs[w] += 1
    words: dict[str, list[str]] = {
        w: list(w[:-1]) + [w[-1] + BPE_END] for w in freqs
    }
    merges: list[tuple[int, str, str]] = []
    for rank in range(n_merges):
        stats: Counter = Counter()
        for w, sym in words.items():
            f = freqs[w]
            for i in range(len(sym) - 1):
                stats[(sym[i], sym[i + 1])] += f
        if not stats:
            break
        (a, b), n = sorted(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        if n < min_pair_count:
            break
        merges.append((rank, a, b))
        words = {w: _bpe_merge(sym, a, b) for w, sym in words.items()}
    return merges


def bpe_encode(
    docs: list[tuple[int, str]],
    merges: list[tuple[int, str, str]],
    lowercase: bool = True,
) -> list[tuple[int, int, int]]:
    """Twin of operators.bpe.bpe_encode: GPT-2-style lowest-rank-first
    apply. Returns (doc_id, n_tokens, n_unique_tokens) rows."""
    ranks = {(a, b): r for r, a, b in merges}

    def encode_word(word: str) -> list[str]:
        sym = list(word[:-1]) + [word[-1] + BPE_END]
        while len(sym) >= 2:
            best = None
            best_rank = None
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = (sym[i], sym[i + 1]), r
            if best is None:
                break
            sym = _bpe_merge(sym, *best)
        return sym

    cache: dict[str, list[str]] = {}
    out = []
    for doc_id, text in docs:
        n_tokens = 0
        uniq: set[str] = set()
        for w in _bpe_split_words(text, lowercase):
            toks = cache.get(w)
            if toks is None:
                toks = encode_word(w)
                cache[w] = toks
            n_tokens += len(toks)
            uniq.update(toks)
        out.append((doc_id, n_tokens, len(uniq)))
    return out


def bpe_vocab(
    docs: list[tuple[int, str]],
    merges: list[tuple[int, str, str]],
    lowercase: bool = True,
) -> list[tuple[int, str]]:
    """Twin of operators.bpe.bpe_vocab: base alphabet (initial symbols
    of the distinct-word table) lexicographically id'd, merged tokens
    appended at alphabet_size + rank."""
    words = set()
    for _, text in docs:
        words.update(_bpe_split_words(text, lowercase))
    alphabet = set()
    for w in words:
        alphabet.update(list(w[:-1]) + [w[-1] + BPE_END])
    out = [(i, tok) for i, tok in enumerate(sorted(alphabet))]
    base = len(out)
    out.extend((base + r, a + b) for r, a, b in merges)
    return out


def compression_stats(docs: list[tuple[int, str]], level: int = 6):
    """Twin of textstats.compression_stats: same zlib, independent
    plumbing (a plumbing-parity twin like the cosine folds — zlib IS
    the spec here)."""
    import zlib

    return [
        (
            doc_id,
            len(text.encode("utf-8")),
            len(zlib.compress(text.encode("utf-8"), level)),
        )
        for doc_id, text in docs
    ]


# ---------------------------------------------------------------------------
# perceptual image hash (PPM + dHash-64) — zero-numpy, loop-based
# ---------------------------------------------------------------------------

def _ppm_pixels(payload: bytes) -> tuple[int, int, bytes] | None:
    """Independent binary-PPM (P6) parse: (width, height, raster) or
    None on any malformation — byte-scanning loops, no numpy, no import
    of the operator module's decoder."""
    if payload[:2] != b"P6":
        return None
    i, vals = 2, []
    n = len(payload)
    while len(vals) < 3:
        while i < n and payload[i] in b" \t\r\n\x0b\x0c":
            i += 1
        if i < n and payload[i] == ord("#"):
            while i < n and payload[i] != ord("\n"):
                i += 1
            continue
        j = i
        while j < n and ord("0") <= payload[j] <= ord("9"):
            j += 1
        if j == i:
            return None
        vals.append(int(payload[i:j]))
        i = j
    w, h, maxval = vals
    if w <= 0 or h <= 0 or not 0 < maxval <= 255:
        return None
    if i >= n or payload[i] not in b" \t\r\n\x0b\x0c":
        return None
    i += 1
    raster = payload[i : i + w * h * 3]
    if len(raster) < w * h * 3:
        return None
    return w, h, raster


def ppm_phash64(payload: bytes) -> int | None:
    """Twin of multimodal.phash64 over a PPM payload: integer luma,
    8x8 floor-mean blocks, row-gradient dHash with wraparound. Pure
    Python accumulation (the operator vectorizes with numpy); all
    arithmetic is exact integers, so the two agree bit-for-bit.
    Returns a SIGNED int64, None when the payload fails to decode."""
    parsed = _ppm_pixels(payload)
    if parsed is None:
        return None
    w, h, raster = parsed
    gray = [
        (299 * raster[3 * p] + 587 * raster[3 * p + 1] + 114 * raster[3 * p + 2])
        // 1000
        for p in range(w * h)
    ]
    rb = [r * h // 8 for r in range(9)]
    cb = [c * w // 8 for c in range(9)]
    means = [[0] * 8 for _ in range(8)]
    for r in range(8):
        for c in range(8):
            s = cnt = 0
            for y in range(rb[r], max(rb[r + 1], rb[r] + 1)):
                for x in range(cb[c], max(cb[c + 1], cb[c] + 1)):
                    s += gray[y * w + x]
                    cnt += 1
            means[r][c] = s // cnt
    val = 0
    for r in range(8):
        for c in range(8):
            if means[r][(c + 1) % 8] > means[r][c]:
                val |= 1 << (r * 8 + c)
    return val - (1 << 64) if val >= 1 << 63 else val


def image_phashes(media: list[tuple[int, bytes]]) -> list[tuple[int, int | None]]:
    """(id, phash-or-None) per media row, id-sorted."""
    return sorted((mid, ppm_phash64(payload)) for mid, payload in media)


def phash_near_dups_exact(
    media: list[tuple[int, bytes]], max_hamming: int = 6
) -> list[tuple[int, int, int]]:
    """Brute-force all-pairs hamming over the decodable images — the
    EXACT answer the banded operator must reproduce in full (banding
    recall is guaranteed by pigeonhole; the exact filter guarantees
    precision). Returns sorted (id_a, id_b, hamming <= max_hamming)."""
    hashes = [(mid, ph) for mid, ph in image_phashes(media) if ph is not None]
    out = []
    for i in range(len(hashes)):
        ida, pa_ = hashes[i]
        for j in range(i + 1, len(hashes)):
            idb, pb = hashes[j]
            ham = bin((pa_ ^ pb) & _MASK).count("1")
            if ham <= max_hamming:
                out.append((min(ida, idb), max(ida, idb), ham))
    return sorted(out)


# --- mergeable sketches (operators/sketch.py twins) -------------------

HLL_M = 1024
HLL_RHO_CAP = 32
HLL_ALPHA_E6 = 720_541
_HLL_W_MASK = (1 << 54) - 1


def _sketch_tokens(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"\s+", text.lower(), flags=re.ASCII) if t]


def hll_distinct_terms(
    docs: list[tuple[int, str, str]],
) -> list[tuple[str, int, int, int, int]]:
    """Twin of sketch.hll_distinct_terms over (doc_id, text, source)
    rows: per-source HLL token-distinct estimate (p=10, rho capped 32,
    integer-divmod estimator, linear-counting small range) next to the
    exact distinct count. Returns sorted
    (source, est_distinct, n_zero, exact_distinct, err_permille)."""
    import math
    from collections import defaultdict

    regs: dict[str, list[int]] = defaultdict(lambda: [0] * HLL_M)
    exact: dict[str, set[str]] = defaultdict(set)
    memo: dict[str, tuple[int, int]] = {}  # token -> (bucket, rho)
    for _doc_id, text, source in docs:
        for tok in _sketch_tokens(text):
            exact[source].add(tok)
            if tok not in memo:
                h = spark_xxhash64(tok)  # signed, Spark semantics
                bucket = (h >> 54) & (HLL_M - 1)
                w = h & _HLL_W_MASK
                rho = 55 if w == 0 else 55 - w.bit_length()
                memo[tok] = (bucket, min(rho, HLL_RHO_CAP))
            bucket, rho = memo[tok]
            if rho > regs[source][bucket]:
                regs[source][bucket] = rho
    out = []
    for source in sorted(regs):
        m = regs[source]
        s = sum(1 << (HLL_RHO_CAP - x) for x in m)
        v = sum(1 for x in m if x == 0)
        q, r = divmod(1 << 52, s)
        est = (HLL_ALPHA_E6 * q + (HLL_ALPHA_E6 * r) // s) // 1_000_000
        if est <= 5 * HLL_M // 2 and v > 0:
            lc_e6 = round(round(math.log(HLL_M / v), 6) * 1_000_000)
            est = (HLL_M * lc_e6) // 1_000_000
        ex = len(exact[source])
        out.append((source, est, v, ex, abs(est - ex) * 1000 // ex))
    return out


CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_heavy_hitters(
    docs: list[tuple[int, str]], k: int = 8
) -> list[tuple[str, int, int, int]]:
    """Twin of sketch.cms_heavy_hitters: 4x1024 count-min counters on
    xxhash64(row_index, term) (Spark's multi-column fold, int32 row
    index), estimate = min over rows, top-k by (est DESC, term ASC).
    Returns (term, est_count, exact_count, rank)."""
    from collections import Counter, defaultdict

    exact: Counter = Counter()
    counters: list[dict[int, int]] = [defaultdict(int) for _ in range(CMS_DEPTH)]
    memo: dict[str, list[int]] = {}  # token -> bucket per row
    for _doc_id, text in docs:
        for tok in _sketch_tokens(text):
            exact[tok] += 1
            if tok not in memo:  # pmod: Python % is already nonneg
                memo[tok] = [
                    spark_xxhash64(i, tok) % CMS_WIDTH for i in range(CMS_DEPTH)
                ]
            for i, b in enumerate(memo[tok]):
                counters[i][b] += 1
    ests = []
    for term, ex in exact.items():
        est = min(counters[i][b] for i, b in enumerate(memo[term]))
        ests.append((term, est, ex))
    ests.sort(key=lambda t: (-t[1], t[0]))
    return [(term, est, ex, rank) for rank, (term, est, ex) in enumerate(ests[:k], 1)]


def l2_topk_exact(
    emb: dict[int, list[float]], query_ids: list[int], k: int = 10
) -> dict[int, list[int]]:
    """Twin of similarity.l2_topk_exact: 6dp fixed-point squared L2,
    (d2_e6, neighbor_id) ranking. Returns query_id -> neighbor list."""
    out = {}
    for q in query_ids:
        scored = sorted(
            (int(spark_round(_dist2(emb[q], emb[n]) * 1_000_000, 0)), n)
            for n in sorted(emb)
            if n != q
        )
        out[q] = [n for _, n in scored[:k]]
    return out


def ivfpq_recall(
    emb: dict[int, list[float]],
    query_ids: list[int],
    k: int = 10,
    **kw,
) -> list[tuple[int, int, int]]:
    """Twin of similarity.ivfpq_recall: |exact top-k ∩ ivfpq top-k|
    per query. Returns (query_id, k, n_found) rows."""
    exact = l2_topk_exact(emb, query_ids, k)
    approx: dict[int, set] = {}
    for q, nid, _adc, _rank in topk_ivfpq(emb, query_ids, k, **kw):
        approx.setdefault(q, set()).add(nid)
    return [
        (q, min(k, len(exact[q])), len(set(exact[q]) & approx.get(q, set())))
        for q in query_ids
    ]


def hashed_doc_embeddings(
    docs: list[tuple[int, str]], dim: int = 64
) -> dict[int, list[float]]:
    """Twin of textstats.embed_documents (dense face, as vectors):
    md5-bucket feature hashing with a sign bit, summed over token
    occurrences — exact small ints, so float32 holds them exactly."""
    import hashlib

    out: dict[int, list[float]] = {}
    for doc_id, text in docs:
        v = [0] * dim
        for t in norm_text(text).split(" "):
            if not t:
                continue
            h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            v[(h >> 1) % dim] += 1 if h & 1 else -1
        out[doc_id] = [float(x) for x in v]
    return out
