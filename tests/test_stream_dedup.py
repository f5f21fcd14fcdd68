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
