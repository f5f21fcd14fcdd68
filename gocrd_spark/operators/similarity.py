"""Similarity search over embedding columns (``array<float>``).

- ``topk_bruteforce`` — exact cosine top-k: broadcast the (small) query
  set against all vectors; dot products via built-in ``zip_with`` +
  ``aggregate`` in double precision (JVM-side, no Python); top-k via a
  per-query window. The correctness baseline.
- ``lsh_buckets`` / ``topk_lsh`` — random-hyperplane LSH: H deterministic
  hyperplanes (seeded numpy, shipped as literal arrays), bucket = sign
  bits; candidates share a bucket in >=1 of B tables. The scale path:
  at 10^12 vectors the bucket join shuffles only (bucket, id) pairs and
  the exact rerank touches ~N/2^bits of the corpus per query.

100 TB notes: queries are broadcast (small side), corpus is scanned once
per table; no N×Q cross shuffle ever materializes for the LSH path.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def topk_bruteforce(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Exact cosine top-k for each query vector (excluding self).

    Returns (query_id, neighbor_id, rank) — integer columns only, with a
    deterministic neighbor_id tie-break so results are engine-portable.
    """
    queries = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    corpus = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 9).alias("cos"),
        )
    )
    return _rank_topk(scored, k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_buckets(
    embeddings: DataFrame, dim: int = 64, n_planes: int = 8, seed: int = 42
) -> DataFrame:
    """Random-hyperplane signature: bucket = sum over planes of
    (dot(v, plane_i) > 0) << i. Planes are deterministic literals —
    every executor computes identical buckets with zero coordination."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = None
    for i in range(n_planes):
        plane_lit = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = F.when(_dot(F.col("embedding"), plane_lit) > 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        term = F.shiftleft(bit.cast("long"), i)
        bucket = term if bucket is None else bucket + term
    return embeddings.select("vec_id", "embedding", bucket.alias("bucket"))



def _union_lsh_tables(
    embeddings: DataFrame, dim: int, n_planes: int, n_tables: int, seed: int
) -> DataFrame:
    """Multi-table LSH bucketing: union of n_tables independent
    lsh_buckets (distinct plane seeds), tagged with a table id."""
    tables = [
        lsh_buckets(embeddings, dim, n_planes, seed + 1000 * t).withColumn(
            "table", F.lit(t)
        )
        for t in range(n_tables)
    ]
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k with a deterministic neighbor_id tie-break."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def topk_lsh(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH.

    ``n_tables`` independent hash tables (different plane seeds); a
    corpus vector is a candidate if it shares the query's bucket in ANY
    table; candidates are exact-cosine reranked. Recall grows as
    1-(1-p^n_planes)^n_tables; candidate volume ~ n_tables * N / 2^n_planes
    per query. Measured against topk_bruteforce in tests.
    """
    bucketed = _union_lsh_tables(embeddings, dim, n_planes, n_tables, seed)
    queries = bucketed.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("table"),
        F.col("bucket"),
    )
    cand = (
        F.broadcast(queries)
        .join(
            bucketed.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("c_emb"),
                "table",
                "bucket",
            ),
            ["table", "bucket"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "q_emb", "neighbor_id", "c_emb")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("q_emb"), F.col("c_emb")), 9).alias("cos"),
    )
    return _rank_topk(scored, k)


def embedding_near_dups_exact(
    embeddings: DataFrame, threshold: float = 0.42
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: all (a < b) with
    cosine >= threshold. O(N²) — the verification baseline; at corpus
    scale use :func:`embedding_near_dups_lsh`. Returns
    (id_a, id_b, cos_e6 fixed-point)."""
    a = embeddings.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = embeddings.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    cos = F.round(cosine(F.col("va"), F.col("vb")), 6)
    return (
        pairs.select(
            "id_a", "id_b", F.round(cos * 1_000_000).cast("long").alias("cos_e6")
        )
        .filter(F.col("cos_e6") >= int(threshold * 1_000_000))
    )


def embedding_near_dups_lsh(
    embeddings: DataFrame,
    threshold: float = 0.42,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup at scale: multi-table hyperplane LSH
    candidate pairs (same bucket in any table), exact-cosine verified.
    Shuffles only (table, bucket, id, vector) tuples — never N² pairs."""
    bucketed = _union_lsh_tables(embeddings, dim, n_planes, n_tables, seed)
    x = bucketed.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), "table", "bucket"
    )
    y = bucketed.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"), "table", "bucket"
    )
    cand = (
        x.join(y, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = F.round(cosine(F.col("va"), F.col("vb")), 6)
    return cand.select(
        "id_a", "id_b", F.round(cos * 1_000_000).cast("long").alias("cos_e6")
    ).filter(F.col("cos_e6") >= int(threshold * 1_000_000))


def _nearest_cell(vec_col: Column, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid (L2) as a column expression — the
    centroid table is tiny, so it ships as literals inside the plan and
    assignment is a narrow map (no join, no shuffle)."""
    dists = []
    for centroid in centroids:
        lit_c = F.array(*[F.lit(float(x)) for x in centroid])
        diff = F.zip_with(vec_col, lit_c, lambda a, b: a.cast("double") - b)
        dists.append(F.aggregate(diff, F.lit(0.0), lambda acc, d: acc + d * d))
    arr = F.array(*dists)
    return F.array_position(arr, F.array_min(arr)).cast("int") - 1


def kmeans_centroids(
    embeddings: DataFrame, n_cells: int = 16, n_iters: int = 2
) -> list[list[float]]:
    """Coarse k-means for the IVF quantizer: deterministic seeding (the
    n_cells lowest vec_ids), Lloyd iterations as Spark jobs (assignment
    is a narrow map; the per-cell mean is one groupBy over
    posexploded dims). Driver holds only n_cells x dim floats."""
    seeds = (
        embeddings.orderBy("vec_id")
        .limit(n_cells)
        .select("embedding")
        .collect()
    )
    centroids = [[float(x) for x in r.embedding] for r in seeds]
    for _ in range(n_iters):
        assigned = embeddings.select(
            _nearest_cell(F.col("embedding"), centroids).alias("cell"),
            F.posexplode("embedding").alias("pos", "val"),
        )
        rows = (
            assigned.groupBy("cell", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .collect()
        )
        new = {c: list(cent) for c, cent in enumerate(centroids)}
        for r in rows:
            new[r.cell][r.pos] = r.m
        centroids = [new[c] for c in range(n_cells)]
    return centroids


def topk_ivf(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    n_iters: int = 2,
) -> DataFrame:
    """IVF approximate top-k: assign the corpus to coarse cells, probe
    each query's n_probe nearest cells, exact-cosine rerank inside them.

    At 10^12 vectors: the corpus scan touches ~n_probe/n_cells of the
    data per query batch; cell assignment is computed once and is
    naturally persisted as a partition column of the vector table.
    """
    centroids = kmeans_centroids(embeddings, n_cells, n_iters)
    corpus = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        _nearest_cell(F.col("embedding"), centroids).alias("cell"),
    )
    # per-query probe list: distances to all cells, keep n_probe nearest
    queries = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    dists = []
    for i, centroid in enumerate(centroids):
        lit_c = F.array(*[F.lit(float(x)) for x in centroid])
        diff = F.zip_with(F.col("q_emb"), lit_c, lambda a, b: a.cast("double") - b)
        d2 = F.aggregate(diff, F.lit(0.0), lambda acc, d: acc + d * d)
        dists.append(F.struct(d2.alias("d"), F.lit(i).alias("cell")))
    probe = F.slice(F.array_sort(F.array(*dists)), 1, n_probe)
    q_probed = queries.select(
        "query_id", "q_emb", F.explode(probe).alias("p")
    ).select("query_id", "q_emb", F.col("p.cell").alias("cell"))
    scored = (
        F.broadcast(q_probed)
        .join(corpus, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 9).alias("cos"),
        )
    )
    return _rank_topk(scored, k)


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label centroid of embeddings — a grouped array aggregation
    (posexplode + groupBy position), demonstrating vector aggregation
    without UDFs. Returns (label, centroid array<double>, n)."""
    exploded = embeddings.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    )
    per_dim = exploded.groupBy("label", "pos").agg(
        F.avg(F.col("val").cast("double")).alias("avg_val"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "avg_val"))
            ).alias("pairs"),
            F.first("n").alias("n"),
        )
        .select(
            "label",
            F.transform(F.col("pairs"), lambda p: F.round(p["avg_val"], 6)).alias(
                "centroid"
            ),
            "n",
        )
    )
