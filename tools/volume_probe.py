"""Dedup-suite volume probe: run the dedup/fingerprint operators over a
synthetic 100k-document corpus (20x the sf0.1 bench table) and report
wall times plus a 2-core/8-core scaling sample for the MinHash path.

The corpus mirrors the driver documents-table shape (doc_id, text,
lang, source, n_chars) with planted near-duplicates (~6% of docs are a
lightly-mutated copy of their predecessor), generated deterministically
in Spark (narrow map over spark.range — no driver materialization).
This is a BENCH exercise only; driver queries/oracles always run over
the read-only /root/testdata tables.

Usage: python tools/volume_probe.py [n_docs]   (default 100_000)
Prints one JSON line; results recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time
from typing import Iterator

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def synth_docs(spark, n_docs: int, num_partitions: int = 128, mega: int = 0):
    # everything the executors need lives INSIDE this closure so
    # cloudpickle ships it by value (tools/ is not on executor paths)
    words = (
        "key agg row scan slow fast table value part hash merge batch spark "
        "the line sort window join filter shuffle codegen broadcast salt "
        "skew plan column prune limit order group count distinct union map "
        "reduce stage"
    ).split()
    # mega > 0 plants a boilerplate page CLASS: docs [n//2, n//2+mega)
    # are one 160-word template with a single doc-specific word — the
    # 10k-member near-dup mega-cluster of VERDICT r04 #5
    mega_lo = n_docs // 2
    mega_hi = mega_lo + mega
    tmpl = " ".join(words[i % len(words)] + str(i) for i in range(160))

    def doc_text(doc_id: int) -> str:
        rng = random.Random(0x5EED ^ doc_id)
        if mega and mega_lo <= doc_id < mega_hi:
            return tmpl + f" only{doc_id}"
        if doc_id % 17 == 16 and doc_id > 0:
            # planted near-dup: predecessor's text with one word appended
            return doc_text(doc_id - 1) + " " + rng.choice(words)
        n = rng.randint(60, 220)
        return " ".join(rng.choice(words) for _ in range(n))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for i in batch["id"]:
                text = doc_text(int(i))
                rows.append(
                    {
                        "doc_id": int(i),
                        "text": text,
                        "lang": ("en", "de", "la")[int(i) % 3],
                        "source": f"src_{int(i) % 20:02d}",
                        "n_chars": len(text),
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n_docs, 1, num_partitions).mapInPandas(
        gen, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _probe(master: str, path: str, ops: list[str]) -> dict[str, float]:
    from gocrd_spark.operators.dedup import (
        dedup_clusters,
        duplicate_spans,
        exact_dedup,
        minhash_candidates,
        ngram_jaccard_pairs,
        paragraph_dedup,
        simhash_near_dups,
    )
    from gocrd_spark.operators.textstats import winnowing_fingerprints
    from gocrd_spark.session import get_spark

    spark = get_spark(master=master, app_name="volume-probe")
    docs = spark.read.parquet(path)
    out: dict[str, float] = {}

    def timed(name: str, make):
        if name not in ops:
            return
        t0 = time.time()
        _noop(make())
        out[name] = round(time.time() - t0, 2)

    timed("exact_dedup", lambda: exact_dedup(docs))
    timed(
        "minhash_verified_pairs",
        lambda: ngram_jaccard_pairs(
            docs, n=3, threshold=0.5, candidates=minhash_candidates(docs, n=3)
        ),
    )
    timed("simhash_near_dups", lambda: simhash_near_dups(docs, n=2, max_hamming=3))
    timed(
        "dedup_clusters",
        lambda: dedup_clusters(
            docs,
            ngram_jaccard_pairs(
                docs, n=3, threshold=0.5, candidates=minhash_candidates(docs, n=3)
            ),
        ),
    )
    timed("winnowing", lambda: winnowing_fingerprints(docs))
    timed("paragraph_dedup", lambda: paragraph_dedup(docs, chunk_words=8))
    timed("duplicate_spans", lambda: duplicate_spans(docs, n=13))

    if "dsir_weights" in ops:
        from pyspark.sql import functions as F

        from gocrd_spark.operators.textstats import dsir_weights

        t0 = time.time()
        _noop(dsir_weights(docs, target=F.col("lang") == "en"))
        out["dsir_weights"] = round(time.time() - t0, 2)
    if "bloom_unprocessed" in ops:
        from pyspark.sql import functions as F

        from gocrd_spark.pipeline import bloom_filter_unprocessed

        urls = docs.select(
            "doc_id",
            F.concat(F.lit("https://crawl.test/"), F.col("doc_id")).alias("url"),
        )
        done = urls.filter(F.col("doc_id") % 3 == 0).select("url")
        t0 = time.time()
        _noop(bloom_filter_unprocessed(urls, done, num_bits=1 << 22))
        out["bloom_unprocessed"] = round(time.time() - t0, 2)
    if "bpe_train" in ops:
        # iterative trainer: report wall for 8 merges over the corpus
        from gocrd_spark.operators.bpe import bpe_train

        t0 = time.time()
        merges = bpe_train(docs, n_merges=8, min_pair_count=2)
        out["bpe_train_8_merges"] = round(time.time() - t0, 2)
        out["bpe_merges_learned"] = float(len(merges))
    if "host_pagerank" in ops:
        # synthetic host graph at corpus scale: one page per doc over
        # n_docs/50 hosts, formula links (same shape as synth_linked_html
        # but generated in Spark — no driver materialization)
        from pyspark.sql import functions as F

        from gocrd_spark.operators.linkgraph import host_pagerank

        n_hosts = 2000
        base = docs.select(
            (F.col("doc_id") % n_hosts).alias("s"),
            ((F.col("doc_id") * 7 + 1) % n_hosts).alias("d1"),
            ((F.col("doc_id") * 13 + 3) % n_hosts).alias("d2"),
        )
        edges = (
            base.select("s", F.explode(F.array("d1", "d2")).alias("d"))
            .select(
                F.concat(F.lit("h"), F.col("s")).alias("src_host"),
                F.concat(F.lit("h"), F.col("d")).alias("dst_host"),
            )
            .groupBy("src_host", "dst_host")
            .agg(F.count(F.lit(1)).alias("n_links"))
        )
        t0 = time.time()
        _noop(host_pagerank(edges, n_iters=5))
        out["host_pagerank_5_iters"] = round(time.time() - t0, 2)
    spark.stop()
    return out


def mega_probe(n_docs: int, mega: int, star_bucket: int = 512) -> dict:
    """VERDICT r04 #5 probe: a planted ``mega``-member boilerplate page
    class inside an ``n_docs`` corpus, pushed through the MinHash
    candidate -> verify -> connected-components chain. Reports the
    quadratic candidate volume the valve AVOIDS (count only — nothing
    downstream consumes it), the star-valve candidate volume, per-stage
    walls, component-loop rounds, and the recovered cluster sizes."""
    from pyspark.sql import functions as F

    from gocrd_spark.operators.dedup import (
        connected_components,
        minhash_candidates,
        ngram_jaccard_pairs,
    )
    from gocrd_spark.session import get_spark

    path = f"/tmp/gocrd_volume_docs_{n_docs}_mega{mega}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        spark = get_spark(master="local[32]", app_name="volume-prep-mega")
        synth_docs(spark, n_docs, mega=mega).write.mode("overwrite").parquet(path)
        spark.stop()
    spark = get_spark(master="local[32]", app_name="volume-mega")
    docs = spark.read.parquet(path)
    out: dict = {"n_docs": n_docs, "mega": mega, "star_bucket": star_bucket}

    t0 = time.time()
    out["candidates_no_valve"] = minhash_candidates(
        docs, n=3, allow_quadratic=True
    ).count()
    out["candidates_no_valve_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    cand = minhash_candidates(docs, n=3, star_bucket=star_bucket)
    out["candidates_star"] = cand.count()
    out["candidates_star_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    verified = ngram_jaccard_pairs(
        docs, n=3, threshold=0.5, candidates=cand
    ).localCheckpoint()
    out["verified_pairs"] = verified.count()
    out["verify_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    stats: dict = {}
    labels = connected_components(verified, stats=stats).localCheckpoint()
    out["components_sec"] = round(time.time() - t0, 2)
    out["component_rounds"] = stats.get("rounds")
    top = (
        labels.groupBy("canonical_id")
        .agg(F.count(F.lit(1)).alias("sz"))
        .orderBy(F.col("sz").desc())
        .limit(3)
        .collect()
    )
    out["top_cluster_sizes"] = [int(r["sz"]) for r in top]
    out["labelled_vertices"] = labels.count()

    # adversarial-diameter probe: a 1M-vertex PATH graph (snapshot-drift
    # chain v1~v2~...~v1M). Plain min-label propagation needs 1M rounds;
    # pointer jumping must land in ~log2(1e6) ~ 20, inside the default
    # 25-round cap.
    t0 = time.time()
    chain = spark.range(0, 1_000_000).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    cstats: dict = {}
    clabels = connected_components(chain, stats=cstats)
    n_roots = clabels.select("canonical_id").distinct().count()
    out["chain_1m_rounds"] = cstats.get("rounds")
    out["chain_1m_sec"] = round(time.time() - t0, 2)
    out["chain_1m_components"] = n_roots  # must be 1
    spark.stop()
    return out


def meta_probe(n_docs: int) -> dict:
    """Volume + scaling probe for the head-metadata tier: page_metadata
    throughput over a datagen pages table at local[32], the
    canonical_dedup chain on top, and the 2->8 core pair on a 1/5
    corpus (north-rule scaling evidence for the new tier)."""
    from gocrd_spark import datagen
    from gocrd_spark.session import get_spark

    def pages_path(n: int) -> str:
        path = f"/tmp/gocrd_volume_pages_v{datagen.DATAGEN_VERSION}_{n}"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            spark = get_spark(master="local[32]", app_name="volume-prep-pages")
            datagen.write_pages(spark, n, path)
            spark.stop()
        return path

    def run(master: str, path: str, chain: bool) -> dict[str, float]:
        from gocrd_spark.operators.urls import canonical_dedup
        from gocrd_spark.pipeline import page_metadata

        spark = get_spark(master=master, app_name="volume-meta")
        pages = spark.read.parquet(path)
        # Warm codegen/Arrow paths so the timed run measures kernel
        # throughput, not first-job compilation (same regime as bench.py).
        _noop(page_metadata(pages.limit(256)))
        res: dict[str, float] = {}
        t0 = time.time()
        _noop(page_metadata(pages))
        res["page_metadata"] = round(time.time() - t0, 2)
        if chain:
            t0 = time.time()
            _noop(canonical_dedup(page_metadata(pages)))
            res["canonical_dedup_chain"] = round(time.time() - t0, 2)
        spark.stop()
        return res

    big = pages_path(n_docs)
    full = run("local[32]", big, chain=True)
    # Pair corpus = the full table: the kernel is light (~2 ms/doc-core),
    # so the per-job scan+Arrow setup (~2-3 s, constant in core count)
    # must be amortized by job length or it dominates the ratio.
    n_pair = n_docs
    small = pages_path(n_pair)
    lo = run("local[2]", small, chain=False)
    hi = run("local[8]", small, chain=False)
    eff = round((lo["page_metadata"] / hi["page_metadata"]) / 4, 3)
    return {
        "n_docs": n_docs,
        "wall_sec_local32": full,
        "docs_per_sec_local32": round(n_docs / full["page_metadata"], 0),
        "scale_pair_n_docs": n_pair,
        "meta_sec_local2": lo["page_metadata"],
        "meta_sec_local8": hi["page_metadata"],
        "scaling_efficiency_2_to_8": eff,
    }


def search_probe(n_docs: int, pair_docs: int | None = None) -> dict:
    """Search + sketch tier at volume: inverted index, BM25 (inline and
    from the durable bucket-partitioned index), phrase search, and the
    three sketches over the synthetic corpus, plus a 2->8 core scaling
    pair for the inline BM25 path (its shuffles carry only query-term
    postings, so width should track cores until the scan dominates)."""
    import shutil

    from pyspark.sql import functions as F

    from gocrd_spark.session import get_spark

    pair_docs = pair_docs or 3 * n_docs  # pair job long enough that
    # fixed per-job costs (~1 s) don't masquerade as poor scaling
    paths = {}
    for nd in {n_docs, pair_docs}:
        p = f"/tmp/gocrd_volume_docs_{nd}"
        if not os.path.exists(os.path.join(p, "_SUCCESS")):
            spark = get_spark(master="local[32]", app_name="volume-prep")
            synth_docs(spark, nd).write.mode("overwrite").parquet(p)
            spark.stop()
        paths[nd] = p
    path = paths[n_docs]

    def run(master: str, ops: list[str], path: str = path) -> dict[str, float]:
        from gocrd_spark.operators import sketch
        from gocrd_spark.operators.search import (
            bm25_topk,
            bm25_topk_from,
            corpus_phrases,
            corpus_queries,
            phrase_search,
            postings_flat,
            search_index,
        )

        spark = get_spark(master=master, app_name="search-probe")
        docs = spark.read.parquet(path)
        out: dict[str, float] = {}

        def timed(name: str, make):
            if name not in ops:
                return
            t0 = time.time()
            _noop(make())
            out[name] = round(time.time() - t0, 2)

        # materialize the workload first: serving-shape BM25 gets its
        # queries handed to it — the timed run must measure retrieval,
        # not the one-off workload derivation's second corpus scan
        queries = spark.createDataFrame(
            corpus_queries(docs).collect(), "query_id long, term string"
        )
        timed("postings_flat", lambda: postings_flat(docs))
        timed("bm25_topk", lambda: bm25_topk(docs, queries, k=10))
        timed("phrase_search", lambda: phrase_search(docs, corpus_phrases(docs)))
        timed("hll_distinct_terms", lambda: sketch.hll_distinct_terms(docs))
        timed("cms_heavy_hitters", lambda: sketch.cms_heavy_hitters(docs))
        timed(
            "hdr_quantiles",
            lambda: sketch.hdr_quantiles(
                docs.select(F.col("source").alias("group"), F.col("n_chars").alias("v"))
            ),
        )
        if "search_index" in ops:
            idx = f"/tmp/gocrd_volume_searchidx_{n_docs}"
            shutil.rmtree(idx, ignore_errors=True)
            t0 = time.time()
            search_index(docs, idx)
            out["search_index_build"] = round(time.time() - t0, 2)
            t0 = time.time()
            _noop(bm25_topk_from(spark, idx, queries, k=10))
            out["bm25_from_index"] = round(time.time() - t0, 2)
        spark.stop()
        return out

    all_ops = [
        "postings_flat", "bm25_topk", "phrase_search", "hll_distinct_terms",
        "cms_heavy_hitters", "hdr_quantiles", "search_index",
    ]
    full = run("local[32]", all_ops)
    # scaling pair on the THROUGHPUT-bound job (index construction —
    # the corpus-sized scan+shuffle); the top-k queries themselves are
    # latency-floor-bound at this corpus size (~2 s of fixed per-job
    # cost at 8 cores), which measures scheduling, not width
    lo = run("local[2]", ["postings_flat"], paths[pair_docs])
    hi = run("local[8]", ["postings_flat"], paths[pair_docs])
    eff = (
        (lo["postings_flat"] / hi["postings_flat"]) / 4
        if hi.get("postings_flat")
        else None
    )
    return {
        "n_docs": n_docs,
        "wall_sec_local32": full,
        "pair_docs": pair_docs,
        "postings_sec_local2": lo.get("postings_flat"),
        "postings_sec_local8": hi.get("postings_flat"),
        "postings_scaling_efficiency_2to8": round(eff, 3) if eff else None,
    }


def synth_vectors(spark, n_vecs: int, dim: int = 64, num_partitions: int = 128):
    """Deterministic float32 vectors (the tests' modular formula at
    volume): clustered enough that quantizers have structure, no RNG."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for batch in batches:
            ids = batch["id"].to_numpy()
            vecs = [
                [
                    float(np.float32(((int(i) * 31 + d * 7) % 97 - 48) / 16.0))
                    for d in range(dim)
                ]
                for i in ids
            ]
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    return (
        spark.range(n_vecs)
        .repartition(num_partitions)
        .mapInPandas(gen, "vec_id long, embedding array<float>")
    )


def vectors_probe(n_vecs: int, pair_vecs: int | None = None) -> dict:
    """Vector-compression tier at volume: PQ codebook training + corpus
    encode (the build — corpus-sized), ADC top-k, and IVF-PQ e2e, plus
    a 2->8 scaling pair on pq_encode over a larger corpus (encode is
    the throughput-bound stage: one broadcast join + partial agg over
    every subvector)."""
    from gocrd_spark.session import get_spark

    pair_vecs = pair_vecs or 3 * n_vecs
    paths = {}
    for nv in {n_vecs, pair_vecs}:
        p = f"/tmp/gocrd_volume_vecs_{nv}"
        if not os.path.exists(os.path.join(p, "_SUCCESS")):
            spark = get_spark(master="local[32]", app_name="volume-prep")
            synth_vectors(spark, nv).write.mode("overwrite").parquet(p)
            spark.stop()
        paths[nv] = p

    def run(master: str, ops: list[str], path: str) -> dict[str, float]:
        from gocrd_spark.operators.similarity import (
            ivfpq_topk,
            pq_codebooks,
            pq_encode,
            pq_topk,
        )

        spark = get_spark(master=master, app_name="vectors-probe")
        emb = spark.read.parquet(path)
        out: dict[str, float] = {}

        def timed(name: str, make):
            if name not in ops:
                return
            t0 = time.time()
            _noop(make())
            out[name] = round(time.time() - t0, 2)

        cb = None
        if "pq_build" in ops:
            t0 = time.time()
            cb = pq_codebooks(emb, m=8, n_codes=16, n_iters=2).localCheckpoint(
                eager=True
            )
            out["pq_train"] = round(time.time() - t0, 2)
            timed("pq_build", lambda: pq_encode(emb, cb, m=8))
        timed("pq_topk", lambda: pq_topk(emb, [0, 1, 2, 3, 4], k=10))
        timed("ivfpq_topk", lambda: ivfpq_topk(emb, [0, 1, 2, 3, 4], k=10))
        if "pq_encode_pair" in ops:
            cbp = pq_codebooks(emb, m=8, n_codes=16, n_iters=2).localCheckpoint(
                eager=True
            )
            t0 = time.time()
            _noop(pq_encode(emb, cbp, m=8))
            out["pq_encode_pair"] = round(time.time() - t0, 2)
        spark.stop()
        return out

    full = run("local[32]", ["pq_build", "pq_topk", "ivfpq_topk"], paths[n_vecs])
    lo = run("local[2]", ["pq_encode_pair"], paths[pair_vecs])
    hi = run("local[8]", ["pq_encode_pair"], paths[pair_vecs])
    eff = (
        (lo["pq_encode_pair"] / hi["pq_encode_pair"]) / 4
        if hi.get("pq_encode_pair")
        else None
    )
    return {
        "n_vecs": n_vecs,
        "wall_sec_local32": full,
        "pair_vecs": pair_vecs,
        "pq_encode_sec_local2": lo.get("pq_encode_pair"),
        "pq_encode_sec_local8": hi.get("pq_encode_pair"),
        "pq_encode_scaling_efficiency_2to8": round(eff, 3) if eff else None,
    }


def perceptron_probe(n_docs: int) -> dict:
    """Classifier training at volume: 3 perceptron rounds over the
    synthetic corpus (labels from a deterministic doc_id rule so both
    classes exist), timed at local[32], plus the 2->8 pair on the SAME
    job — training is throughput-bound (every round rescans the
    checkpointed counts table: corpus-sized work, no latency floor)."""
    from pyspark.sql import functions as F

    from gocrd_spark.session import get_spark

    path = f"/tmp/gocrd_volume_docs_{n_docs}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        spark = get_spark(master="local[32]", app_name="volume-prep")
        synth_docs(spark, n_docs).write.mode("overwrite").parquet(path)
        spark.stop()

    def run(master: str) -> float:
        from gocrd_spark.operators.textstats import perceptron_quality

        spark = get_spark(master=master, app_name="perceptron-probe")
        docs = spark.read.parquet(path).select(
            "doc_id",
            "text",
            F.when(F.col("doc_id") % 3 == 0, F.lit(1)).otherwise(F.lit(-1)).alias("y"),
        )
        t0 = time.time()
        _noop(perceptron_quality(docs, n_rounds=3))
        dt = round(time.time() - t0, 2)
        spark.stop()
        return dt

    t32 = run("local[32]")
    t2 = run("local[2]")
    t8 = run("local[8]")
    return {
        "n_docs": n_docs,
        "train_sec_local32": t32,
        "train_sec_local2": t2,
        "train_sec_local8": t8,
        "scaling_efficiency_2to8": round((t2 / t8) / 4, 3),
    }


def verdict5_probe(n_docs: int) -> dict:
    """Volume + scaling probe for the three operators that had never
    seen a 100k-docs run (VERDICT r05 #5): hard_negatives,
    host_trustrank, mirror_hosts. Walls at local[32] on the full size;
    2->8 matched pair on the corpus-sized single-job piece of each
    (hard_negatives' broadcast scan and mirror_hosts' digest pair join;
    host_trustrank is an iterative DRIVER loop — its pair is reported
    but floored by the per-round latency S, the perceptron regime)."""
    from pyspark.sql import functions as F

    from gocrd_spark.session import get_spark

    def mk_obs(docs):
        # ~n_docs/50 hosts; hosts 2h and 2h+1 mirror each other on 80%
        # of their content (shared digest group), the rest is unique
        d = F.col("doc_id")
        host_pair = (d % 2000).cast("long")
        mirrored = (d % 10) < 8
        return docs.select(
            F.concat(
                F.lit("https://h"),
                ((host_pair * 2) + (d % 2)).cast("string"),
                F.lit(".test/p/"),
                d.cast("string"),
            ).alias("url"),
            F.when(
                mirrored,
                F.concat(F.lit("dg"), host_pair.cast("string"),
                         F.lit("_"), (d % 40).cast("string")),
            ).otherwise(F.concat(F.lit("uniq"), d.cast("string"))).alias("digest"),
        )

    def mk_edges(docs):
        n_hosts = 2000
        base = docs.select(
            (F.col("doc_id") % n_hosts).alias("s"),
            ((F.col("doc_id") * 7 + 1) % n_hosts).alias("d1"),
            ((F.col("doc_id") * 13 + 3) % n_hosts).alias("d2"),
        )
        return (
            base.select("s", F.explode(F.array("d1", "d2")).alias("d"))
            .select(
                F.concat(F.lit("h"), F.col("s")).alias("src_host"),
                F.concat(F.lit("h"), F.col("d")).alias("dst_host"),
            )
            .groupBy("src_host", "dst_host")
            .agg(F.count(F.lit(1)).alias("n_links"))
        )

    def run(master: str, n: int, ops: list[str]) -> dict[str, float]:
        from gocrd_spark.operators.linkgraph import host_trustrank
        from gocrd_spark.operators.similarity import hard_negatives
        from gocrd_spark.operators.urls import mirror_hosts

        spark = get_spark(master=master, app_name="verdict5-probe")
        out: dict[str, float] = {}
        path = f"/tmp/gocrd_volume_docs_{n}"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            synth_docs(spark, n).write.mode("overwrite").parquet(path)
        docs = spark.read.parquet(path)
        if "hard_negatives" in ops:
            vecs = synth_vectors(spark, n).withColumn(
                "label", (F.col("vec_id") % 8).cast("long")
            ).localCheckpoint(eager=True)
            t0 = time.time()
            _noop(hard_negatives(vecs, query_ids=[0, 1, 2, 3, 4], k=10))
            out["hard_negatives"] = round(time.time() - t0, 2)
        if "mirror_hosts" in ops:
            t0 = time.time()
            _noop(mirror_hosts(mk_obs(docs)))
            out["mirror_hosts"] = round(time.time() - t0, 2)
        if "host_trustrank" in ops:
            seeds = spark.range(50).select(
                F.concat(F.lit("h"), (F.col("id") * 40).cast("string")).alias("host")
            )
            t0 = time.time()
            _noop(host_trustrank(mk_edges(docs), seeds, n_iters=5))
            out["host_trustrank_5_iters"] = round(time.time() - t0, 2)
        spark.stop()
        return out

    full = run("local[32]", n_docs, ["hard_negatives", "mirror_hosts", "host_trustrank"])
    n_pair = max(n_docs // 5, 1000)
    pair_ops = ["hard_negatives", "mirror_hosts", "host_trustrank"]
    lo = run("local[2]", n_pair, pair_ops)
    hi = run("local[8]", n_pair, pair_ops)
    pairs = {
        k: round((lo[k] / hi[k]) / 4, 3)
        for k in lo
        if hi.get(k)
    }
    return {
        "n_docs": n_docs,
        "wall_sec_local32": full,
        "scale_pair_n_docs": n_pair,
        "pair_sec_local2": lo,
        "pair_sec_local8": hi,
        "scaling_efficiency_2to8": pairs,
    }


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "vectors":
        n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
        print(json.dumps(vectors_probe(n_vecs)))
        return 0
    if len(sys.argv) > 1 and sys.argv[1] == "perceptron":
        n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
        print(json.dumps(perceptron_probe(n_docs)))
        return 0
    if len(sys.argv) > 1 and sys.argv[1] == "search":
        n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
        print(json.dumps(search_probe(n_docs)))
        return 0
    if len(sys.argv) > 1 and sys.argv[1] == "meta":
        n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
        print(json.dumps(meta_probe(n_docs)))
        return 0
    if len(sys.argv) > 1 and sys.argv[1] == "verdict5":
        n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
        print(json.dumps(verdict5_probe(n_docs)))
        return 0
    if len(sys.argv) > 1 and sys.argv[1] == "mega":
        n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
        mega = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
        print(json.dumps(mega_probe(n_docs, mega)))
        return 0
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    path = f"/tmp/gocrd_volume_docs_{n_docs}"
    from gocrd_spark.session import get_spark

    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        spark = get_spark(master="local[32]", app_name="volume-prep")
        synth_docs(spark, n_docs).write.mode("overwrite").parquet(path)
        spark.stop()

    full = _probe("local[32]", path, [
        "exact_dedup", "minhash_verified_pairs", "simhash_near_dups",
        "dedup_clusters", "winnowing", "paragraph_dedup", "duplicate_spans",
        "bpe_train", "host_pagerank", "dsir_weights", "bloom_unprocessed",
    ])
    # scale pair on a 1/5 corpus so the 2-core sample stays in minutes
    n_pair = max(n_docs // 5, 1000)
    pair_path = f"/tmp/gocrd_volume_docs_{n_pair}"
    if not os.path.exists(os.path.join(pair_path, "_SUCCESS")):
        spark = get_spark(master="local[32]", app_name="volume-prep-pair")
        synth_docs(spark, n_pair).write.mode("overwrite").parquet(pair_path)
        spark.stop()
    lo = _probe("local[2]", pair_path, ["minhash_verified_pairs"])
    hi = _probe("local[8]", pair_path, ["minhash_verified_pairs"])
    eff = (
        (lo["minhash_verified_pairs"] / hi["minhash_verified_pairs"]) / 4
        if hi.get("minhash_verified_pairs")
        else None
    )
    print(json.dumps({
        "n_docs": n_docs,
        "wall_sec_local32": full,
        "scale_pair_n_docs": n_pair,
        "minhash_sec_local2": lo.get("minhash_verified_pairs"),
        "minhash_sec_local8": hi.get("minhash_verified_pairs"),
        "minhash_scaling_efficiency_2to8": round(eff, 3) if eff else None,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
