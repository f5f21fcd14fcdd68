"""Custom stateful streaming (applyInPandasWithState sessionization) and
the golden-compare audit harness."""

import os
import shutil


class TestStatefulSessionize:
    def test_stream_matches_batch_sessionization(self, spark, tmp_path):
        from gocrd_spark.streaming.sessions import (
            run_sessionize_available_now,
            sessionize_stream,
        )

        src = "/root/testdata/sf0.001/events.parquet"
        in_dir = str(tmp_path / "sess_in")
        os.makedirs(in_dir)
        shutil.copy(src, os.path.join(in_dir, "c1.parquet"))

        from gocrd_spark.streaming.sessions import read_latest_sessions

        df = sessionize_stream(spark, in_dir, gap_seconds=1800)
        assert df.isStreaming
        out = str(tmp_path / "sess_out")
        run_sessionize_available_now(df, str(tmp_path / "ckpt"), out)
        got = {
            r.user_id: (r.n_sessions, r.n_events)
            for r in read_latest_sessions(spark, out).collect()
        }

        # batch reference: the oracle-checked user_sessions query
        import __spark_entry__ as entry

        batch = {
            r.user_id: (r.n_sessions, r.n_events)
            for r in entry.queries()["user_sessions"](
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        assert got == batch
        assert len(got) > 10


class TestGoldenCompare:
    def test_audit_join(self, spark):
        from gocrd_spark import datagen
        from gocrd_spark.extract import extract_any_document
        from gocrd_spark.pipeline import extract_pages, golden_compare

        pages = spark.createDataFrame(
            datagen.pages_pdf(50), schema=datagen.PAGES_SCHEMA
        )
        extracted = extract_pages(pages)
        golden_rows = []
        for i in range(50):
            row = datagen.make_row(i)
            golden_rows.append(
                {"url": row["url"], "text": extract_any_document(row["html"])["text"]}
            )
        golden = spark.createDataFrame(golden_rows, schema="url string, text string")
        audit = golden_compare(extracted, golden)
        assert audit.filter("NOT match").count() == 0
        assert audit.count() == 50
        plan = audit._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_mismatch_detected(self, spark):
        from gocrd_spark.pipeline import golden_compare

        extracted = spark.createDataFrame(
            [("u1", "right"), ("u2", "WRONG"), ("u3", None)],
            "url string, text string",
        )
        golden = spark.createDataFrame(
            [("u1", "right"), ("u2", "expected"), ("u3", None)],
            "url string, text string",
        )
        got = {r.url: r.match for r in golden_compare(extracted, golden).collect()}
        assert got == {"u1": True, "u2": False, "u3": True}
