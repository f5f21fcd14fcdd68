"""Streaming dedup: stream-vs-batch keep-set parity, watermark-bounded
state semantics (drop within horizon, evict past it), and checkpointed
exactly-once drain."""

import datetime

import pytest


def _append_docs(spark, path: str, rows):
    df = spark.createDataFrame(rows, "doc_id long, ts timestamp, text string")
    df.coalesce(1).write.mode("append").parquet(path)


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2026, 1, 1, 12, minute)


@pytest.fixture()
def batch1():
    return [
        (0, _ts(0), "alpha beta gamma"),
        (1, _ts(1), "Alpha  Beta GAMMA"),  # dup of 0 after normalization
        (2, _ts(2), "delta epsilon"),
        (3, _ts(3), "zeta eta theta"),
        (4, _ts(4), "delta  EPSILON"),  # dup of 2
        (5, _ts(5), "unique text five"),
    ]


class TestStreamDedup:
    def test_exact_stream_matches_batch_keepset(self, spark, tmp_path, batch1):
        """Unbounded-state streaming dedup keeps exactly one row per
        hash — same hash set as the batch exact_dedup."""
        from gocrd_spark.operators.dedup import exact_dedup
        from gocrd_spark.streaming.dedup_stream import (
            dedup_stream_exact,
            run_available_now,
        )

        inp = str(tmp_path / "docs_in")
        _append_docs(spark, inp, batch1)
        name = run_available_now(
            dedup_stream_exact(spark, inp), str(tmp_path / "ckpt"), "dedup_exact_s"
        )
        got = spark.sql(f"SELECT * FROM {name}").collect()
        batch = exact_dedup(
            spark.createDataFrame(
                [(r[0], r[2]) for r in batch1], "doc_id long, text string"
            )
        ).collect()
        assert {r.text_hash for r in got} == {r.text_hash for r in batch}
        # one kept row per hash
        assert len(got) == len({r.text_hash for r in got}) == 4

    def test_watermark_drop_then_evict(self, spark, tmp_path, batch1):
        """The bounded-state contract, drained batch by batch against one
        checkpoint:
        - batch 2: a dup arriving while its key's state is live (inside
          the horizon) is dropped;
        - batch 2 also advances the watermark past every batch-1 key's
          expiry (ts + 10 min), so
        - batch 3: the same text reappearing later is KEPT — state was
          evicted, memory stays bounded by the horizon."""
        from gocrd_spark.streaming.dedup_stream import (
            dedup_stream,
            run_available_now_to_dir,
        )

        inp = str(tmp_path / "docs_in2")
        ckpt = str(tmp_path / "ckpt2")
        out = str(tmp_path / "out2")
        _append_docs(spark, inp, batch1)

        def drain():
            run_available_now_to_dir(
                dedup_stream(spark, inp, watermark="10 minutes"), out, ckpt
            )
            return {r.doc_id for r in spark.read.parquet(out).collect()}

        kept1 = drain()
        assert len(kept1) == 4  # one per distinct hash

        # batch 2: in-horizon dup (state live) + a fresh text that moves
        # the watermark to 12:30-10m = 12:20 > every batch-1 expiry
        _append_docs(
            spark,
            inp,
            [
                (6, _ts(7), "ALPHA beta gamma"),  # dup while state live -> drop
                (7, _ts(30), "fresh text seven"),
            ],
        )
        kept2 = drain()
        assert kept2 - kept1 == {7}  # the dup was dropped

        # batch 3: a batch-1 text reappears after eviction -> kept
        _append_docs(spark, inp, [(8, _ts(35), "delta epsilon")])
        kept3 = drain()
        assert kept3 - kept2 == {8}

    def test_checkpoint_drain_is_exactly_once(self, spark, tmp_path, batch1):
        """A second availableNow drain over the same checkpoint emits
        nothing new (no reprocessing of committed input)."""
        from gocrd_spark.streaming.dedup_stream import (
            dedup_stream_exact,
            run_available_now_to_dir,
        )

        inp = str(tmp_path / "docs_in3")
        _append_docs(spark, inp, batch1)
        ckpt = str(tmp_path / "ckpt3")
        out = str(tmp_path / "out3")
        run_available_now_to_dir(dedup_stream_exact(spark, inp), out, ckpt)
        n1 = spark.read.parquet(out).count()
        run_available_now_to_dir(dedup_stream_exact(spark, inp), out, ckpt)
        n2 = spark.read.parquet(out).count()
        assert n1 == 4 and n2 == 4  # second drain appends nothing


class TestUrlDedupStream:
    def test_canonical_collapse_and_malformed_survival(self, spark, tmp_path):
        """Streaming URL dedup keeps the FIRST fetch per canonical URL
        (spelling variants collapse at ingest) while every malformed URL
        survives (NULL canon must not become one shared state key); the
        keep-set matches the batch url_dedup canonical grouping."""
        from gocrd_spark.streaming.dedup_stream import (
            run_available_now,
            url_dedup_stream,
        )

        rows = [
            (0, _ts(0), "HTTP://WWW.Example.COM:80/a?b=2&a=1#frag"),
            (1, _ts(1), "http://www.example.com/a?a=1&b=2"),   # dup of 0
            (2, _ts(2), "https://www.example.com/a?a=1&b=2"),  # scheme differs
            (3, _ts(3), "not a url"),                           # malformed
            (4, _ts(4), "also not a url"),                      # malformed
            (5, _ts(5), "http://www.example.com/a?a=1&b=2"),   # dup of 0
        ]
        inp = str(tmp_path / "urls_in")
        spark.createDataFrame(
            rows, "doc_id long, ts timestamp, url string"
        ).coalesce(1).write.mode("append").parquet(inp)
        name = run_available_now(
            url_dedup_stream(spark, inp), str(tmp_path / "ckpt_u"), "url_dedup_s"
        )
        got = {r.doc_id for r in spark.sql(f"SELECT * FROM {name}").collect()}
        # one of {0,1,5} (same canon — micro-batch order within one file
        # is not time-ordered, so WHICH one is not pinned), plus 2, 3, 4
        assert got & {0, 1, 5} and len(got & {0, 1, 5}) == 1
        assert {2, 3, 4} <= got and len(got) == 4

    def test_stream_keepset_parity_with_batch_url_dedup(self, spark, tmp_path):
        """VERDICT r03 #7: the drained stream keep-set must equal batch
        url_dedup at the CANONICAL-GROUP level on the same data — the
        stream collapses exactly the groups the batch operator
        collapses, one representative per group, every malformed row
        surviving in both. (Which representative differs BY DESIGN:
        batch keeps latest-ts/lowest-id, the stream keeps
        first-processed — so parity is group membership + group count,
        the invariant both share.)"""
        from gocrd_spark.operators.urls import canonical_url, url_dedup
        from gocrd_spark.streaming.dedup_stream import (
            run_available_now,
            url_dedup_stream,
        )
        from pyspark.sql import functions as F

        # 40 rows over 12 canonical groups (spelling variants: case,
        # default port, query order, fragment) + 6 malformed
        variants = [
            "HTTP://Site{k}.com:80/p?b=2&a=1#f",
            "http://site{k}.com/p?a=1&b=2",
            "http://SITE{k}.COM/p?b=2&a=1",
        ]
        rows = []
        doc_id = 0
        for k in range(12):
            for i in range(1 + (k % 3)):
                rows.append(
                    (doc_id, _ts(doc_id % 60), variants[i].format(k=k))
                )
                doc_id += 1
        for j in range(6):
            rows.append((doc_id, _ts(doc_id % 60), f"::malformed {j} :::"))
            doc_id += 1

        inp = str(tmp_path / "urls_parity")
        df = spark.createDataFrame(rows, "doc_id long, ts timestamp, url string")
        df.coalesce(1).write.mode("append").parquet(inp)

        name = run_available_now(
            url_dedup_stream(spark, inp), str(tmp_path / "ckpt_p"), "url_parity_s"
        )
        stream_rows = spark.sql(f"SELECT * FROM {name}").collect()

        batch = url_dedup(df, ts_col="ts").collect()
        batch_kept = [r for r in batch if r.keep == 1]

        # group-level parity: same canonical key set on the kept rows
        s_groups = {r.canonical_url for r in stream_rows if r.canonical_url}
        b_groups = {r.canonical_url for r in batch_kept if r.canonical_url}
        assert s_groups == b_groups and len(s_groups) == 12

        # exactly one stream representative per canonical group
        from collections import Counter

        counts = Counter(r.canonical_url for r in stream_rows if r.canonical_url)
        assert set(counts.values()) == {1}

        # each stream representative belongs to the batch group it
        # claims: its own canonicalization equals its group key
        canon_of = {
            r.doc_id: r.canonical_url
            for r in df.select(
                "doc_id", canonical_url(F.col("url")).alias("canonical_url")
            ).collect()
        }
        for r in stream_rows:
            assert canon_of[r.doc_id] == r.canonical_url

        # malformed rows all survive in BOTH
        s_bad = {r.doc_id for r in stream_rows if r.canonical_url is None}
        b_bad = {r.doc_id for r in batch_kept if r.canonical_url is None}
        assert s_bad == b_bad and len(s_bad) == 6
        # and total keep-set sizes agree
        assert len(stream_rows) == len(batch_kept) == 18

    def test_e2e_multibatch_late_and_out_of_watermark(self, spark, tmp_path):
        """VERDICT r04 #4 — true streaming e2e: drive url_dedup_stream
        with a real file-source availableNow run whose first drain spans
        MULTIPLE micro-batches (3 files at maxFilesPerTrigger=2, so the
        watermark advances mid-drain), then a second drain carrying
        late/out-of-watermark arrivals. Pins, empirically verified
        against Spark 4.1:
        - an in-horizon duplicate (event time >= watermark, key state
          live) is dropped;
        - an OUT-OF-WATERMARK row (event time < the committed watermark)
          is discarded entirely — even for a never-seen URL. The crawl
          meaning: an hour-late fetch log can't resurrect evicted state,
          which is exactly what keeps state bounded; a genuinely late
          backfill belongs to the batch anti-join path
          (pipeline.filter_unprocessed), not the stream;
        - on-time keeps still match batch url_dedup at the
          canonical-group level."""
        from pyspark.sql import functions as F

        from gocrd_spark.operators.urls import canonical_url, url_dedup
        from gocrd_spark.streaming.dedup_stream import (
            run_available_now_to_dir,
            url_dedup_stream,
        )

        inp = str(tmp_path / "urls_late")
        out = str(tmp_path / "out_late")
        ckpt = str(tmp_path / "ckpt_late")

        def app(rows):
            spark.createDataFrame(
                rows, "doc_id long, ts timestamp, url string"
            ).coalesce(1).write.mode("append").parquet(inp)

        # drain 1: three FILES -> two micro-batches (maxFilesPerTrigger=2)
        app([(0, _ts(0), "http://a.com/x"), (1, _ts(1), "HTTP://A.COM:80/x")])
        app([(2, _ts(2), "http://b.com/y")])
        app([(3, _ts(30), "http://c.com/z")])  # advances watermark to 12:20
        run_available_now_to_dir(
            url_dedup_stream(spark, inp, watermark="10 minutes"), out, ckpt
        )
        kept1 = {r.doc_id for r in spark.read.parquet(out).collect()}
        # one of the a.com variants + b + c (which variant depends on
        # file processing order across micro-batches — group-level pin)
        assert len(kept1 & {0, 1}) == 1 and {2, 3} <= kept1 and len(kept1) == 3

        # drain 2 against the SAME checkpoint (committed watermark 12:20):
        app([
            (4, _ts(25), "http://C.com/z?"),          # in-horizon dup -> drop
            (5, _ts(10), "http://late-new.com/q"),    # out-of-watermark NEW url -> discarded
            (6, _ts(40), "http://e.com/f"),           # fresh -> keep
        ])
        run_available_now_to_dir(
            url_dedup_stream(spark, inp, watermark="10 minutes"), out, ckpt
        )
        kept2 = {r.doc_id for r in spark.read.parquet(out).collect()}
        assert kept2 - kept1 == {6}

        # batch parity on the ON-TIME subset: same canonical groups kept
        on_time = spark.createDataFrame(
            [
                (0, _ts(0), "http://a.com/x"),
                (1, _ts(1), "HTTP://A.COM:80/x"),
                (2, _ts(2), "http://b.com/y"),
                (3, _ts(30), "http://c.com/z"),
                (4, _ts(25), "http://C.com/z?"),
                (6, _ts(40), "http://e.com/f"),
            ],
            "doc_id long, ts timestamp, url string",
        )
        b_groups = {
            r.canonical_url
            for r in url_dedup(on_time, ts_col="ts").collect()
            if r.keep == 1
        }
        s_groups = {
            r[0]
            for r in spark.read.parquet(out)
            .select(canonical_url(F.col("url")))
            .collect()
        }
        assert s_groups == b_groups and len(s_groups) == 4


class TestStreamingIngestDedup:
    """Streaming ingestion maintaining the durable MinHash index: each
    micro-batch is near-dup-checked against everything before it, then
    folded in; retries are idempotent."""

    def _doc(self, i, text):
        return (i, _ts(i % 60), text)

    def test_ingest_maintains_index_and_emits_incremental_pairs(
        self, spark, tmp_path
    ):
        import os

        from pyspark.sql import functions as F

        from gocrd_spark.operators.dedup import minhash_signatures
        from gocrd_spark.streaming.ingest_dedup import (
            ingest_dedup_batch,
            ingested_pairs,
            run_ingest_dedup,
        )

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        other = "one two three four five six seven eight nine ten"
        seed_rows = [
            (0, base),
            (1, other),
            (2, "solar wind plasma field magnet flux loop corona arc spot"),
            (3, base + " lambda"),          # near-dup target for a streamed doc
            (5, other + " eleven"),         # seed-internal near-dup pair...
            (6, other + " twelve"),         # ...must NEVER be re-emitted
        ]
        seed = spark.createDataFrame(seed_rows, "doc_id long, text string")
        table = str(tmp_path / "mh_table")
        minhash_signatures(seed, table, n=3)

        in_dir = str(tmp_path / "stream_in")
        os.makedirs(in_dir)

        def app_flat(rows):
            spark.createDataFrame(
                [self._doc(i, t) for i, t in rows],
                "doc_id long, ts timestamp, text string",
            ).coalesce(1).write.mode("append").parquet(in_dir)

        app_flat([
            (100, base + " mu"),            # near-dup of seed 0/3
            (101, "red green blue cyan magenta yellow black white gray pink"),
            (103, "cat dog fox owl bat elk hen pig ram yak stork"),
            (104, "cat dog fox owl bat elk hen pig ram yak crane"),  # ~103
        ])
        app_flat([
            (200, "red green blue cyan magenta yellow black white gray teal"),  # ~101
            (201, "totally unrelated words appear precisely here once only now"),
        ])

        store = str(tmp_path / "store")
        pairs_dir = str(tmp_path / "pairs")
        # setup contract: the store carries the text of every table doc
        seed.write.parquet(os.path.join(store, "batch=seed"))
        run_ingest_dedup(
            spark, in_dir, table, store, pairs_dir,
            str(tmp_path / "ckpt"), threshold=0.5,
        )

        pairs = {
            (r.doc_a, r.doc_b)
            for r in ingested_pairs(spark, pairs_dir).collect()
        }
        # new-vs-corpus and new-vs-new pairs found...
        assert (0, 100) in pairs and (3, 100) in pairs
        assert (103, 104) in pairs
        assert (101, 200) in pairs
        # ...old-old pairs never re-emitted
        assert (5, 6) not in pairs and (0, 3) not in pairs
        # every pair involves at least one streamed doc
        streamed = {100, 101, 103, 104, 200, 201}
        assert all(a in streamed or b in streamed for a, b in pairs)

        # the durable table now covers seed + streamed docs (committed
        # batches live under _batches/, so read via the table reader)
        from gocrd_spark.operators.dedup import _read_sig_table

        table_ids = {
            r.doc_id
            for r in _read_sig_table(spark, table)
            .select("doc_id")
            .distinct()
            .collect()
        }
        assert table_ids == {0, 1, 2, 3, 5, 6} | streamed

        # RETRY idempotence (out-of-band, AFTER later batches committed
        # — harsher than Structured Streaming's in-order retry): the
        # table gains nothing, and the PAIR SET is unchanged (the
        # retried batch may re-emit pairs against later docs into its
        # own output dir; consumers key pairs by (doc_a, doc_b))
        n_table_rows = _read_sig_table(spark, table).count()
        retry = spark.createDataFrame(
            [self._doc(i, t) for i, t in [
                (100, base + " mu"),
                (101, "red green blue cyan magenta yellow black white gray pink"),
                (103, "cat dog fox owl bat elk hen pig ram yak stork"),
                (104, "cat dog fox owl bat elk hen pig ram yak crane"),
            ]],
            "doc_id long, ts timestamp, text string",
        )
        ingest_dedup_batch(retry, 0, table, store, pairs_dir, threshold=0.5)
        assert _read_sig_table(spark, table).count() == n_table_rows
        pairs2 = {
            (r.doc_a, r.doc_b)
            for r in ingested_pairs(spark, pairs_dir).collect()
        }
        assert pairs2 == pairs


class TestIngestJobCli:
    def test_cold_start_then_resume(self, spark, tmp_path):
        """The CLI builds the table+store from --seed-docs on first run,
        drains the stream, and a SECOND run with new files only
        processes the increment (checkpoint resume)."""
        import os

        from gocrd_spark.jobs.ingest_job import main as ingest_main
        from gocrd_spark.streaming.ingest_dedup import ingested_pairs

        # 30-word base so a one-word change keeps j ~ 0.93 — inside the
        # default 8x4 banding's near-certain recall band (the j ~ 0.7
        # regime deterministically misses some pairs at this banding)
        base = " ".join(f"w{i:02d}" for i in range(30))
        seed_path = str(tmp_path / "seed.parquet")
        spark.createDataFrame(
            [(0, base + " theta")], "doc_id long, text string"
        ).write.parquet(seed_path)

        in_dir = str(tmp_path / "in")
        os.makedirs(in_dir)

        def app(rows):
            spark.createDataFrame(
                rows, "doc_id long, ts timestamp, text string"
            ).coalesce(1).write.mode("append").parquet(in_dir)

        app([(100, _ts(1), base + " iota")])
        argv = [
            "--input", in_dir,
            "--table", str(tmp_path / "table"),
            "--store", str(tmp_path / "store"),
            "--pairs", str(tmp_path / "pairs"),
            "--checkpoint", str(tmp_path / "ckpt"),
            "--seed-docs", seed_path,
        ]
        assert ingest_main(argv) == 0
        pairs = {
            (r.doc_a, r.doc_b)
            for r in ingested_pairs(spark, str(tmp_path / "pairs")).collect()
        }
        assert pairs == {(0, 100)}

        # resume: new file, near-dup of the STREAMED doc 100
        app([(200, _ts(2), base + " kappa")])
        assert ingest_main(argv) == 0
        pairs2 = {
            (r.doc_a, r.doc_b)
            for r in ingested_pairs(spark, str(tmp_path / "pairs")).collect()
        }
        assert (100, 200) in pairs2 and (0, 200) in pairs2
