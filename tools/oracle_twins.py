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

from gocrd_spark.operators.dedup import simhash_bands  # noqa: E402  (banding *plan* is shared config)
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
    """Twin of dedup._shingles: distinct word n-grams (first-occurrence
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


def minhash_signature(text: str, n: int = 3, num_hashes: int = 32) -> list[int]:
    """Twin of dedup.minhash_signature: per permutation i, the min of
    xxhash64(shingle, i) over the shingle set (signed values, matching
    Spark's array_min over signed longs)."""
    sh = shingles(text, n)
    return [min(spark_xxhash64(s, i) for s in sh) for i in range(num_hashes)]


def minhash_lsh(
    docs: list[tuple[int, str]],
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> list[tuple[int, int, float]]:
    """Twin of dedup.minhash_lsh: banded-LSH candidates + exact Jaccard
    verification. Returns sorted (doc_a, doc_b, round(jaccard, 6))."""
    rows_per_band = num_hashes // bands
    sigs = {d: minhash_signature(t, n, num_hashes) for d, t in docs}
    sets = {d: set(shingles(t, n)) for d, t in docs}
    buckets: dict[tuple[int, int], list[int]] = {}
    for d, sig in sigs.items():
        for b in range(bands):
            body = ",".join(
                str(sig[b * rows_per_band + r]) for r in range(rows_per_band)
            )
            buckets.setdefault((b, spark_xxhash64(body)), []).append(d)
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        members.sort()
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                cand.add((a, b))
    out = []
    for a, b in cand:
        inter = len(sets[a] & sets[b])
        jac = round(inter / (len(sets[a]) + len(sets[b]) - inter), 6)
        if jac >= threshold:
            out.append((a, b, jac))
    return sorted(out)
