"""CDX index support: SURT key subset, line round trip, malformed-line
tolerance, fetch-plan selection semantics, per-file summary."""

import pytest

from pyspark.sql import functions as F


class TestSurtKey:
    def test_surt_shapes(self, spark):
        from gocrd_spark.cdx import surt_key

        cases = {
            "https://WWW.Example.COM/Path/X?b=2": "com,example)/path/x?b=2",
            "http://sub.host.org:80/a": "org,host,sub)/a",
            "https://host.net:443/": "net,host)/",
            "http://host.net": "net,host)/",
            "https://a.b.c.d.test/p": "test,d,c,b,a)/p",
            # fragment dropped, query kept
            "http://x.io/p?q=1#frag": "io,x)/p?q=1",
            # non-default port survives (distinct origin)
            "http://x.io:8080/p": "io,x:8080)/p",
            # path-less query url still gets the '/' (cc-index shape;
            # prefix scans on 'host)/' must find it)
            "https://example.com?q=1": "com,example)/?q=1",
        }
        df = spark.createDataFrame(
            [(u,) for u in cases], "url string"
        ).select("url", surt_key(F.col("url")).alias("k"))
        got = {r.url: r.k for r in df.collect()}
        assert got == cases


class TestCdxRoundTrip:
    def test_format_parse_identity(self, spark):
        from gocrd_spark.cdx import format_cdx_line, parse_cdx

        rows = spark.createDataFrame(
            [
                (0, "https://A.test/x", "2026-03-01 10:00:00", 200, 1000, 900),
                (1, "https://b.test/y?q=1", "2026-03-02 11:30:45", 404, 2000, 50),
            ],
            "doc_id long, url string, ts_s string, status int, off long, length long",
        )
        lines = rows.select(
            format_cdx_line(
                url=F.col("url"),
                ts=F.col("ts_s").cast("timestamp"),
                status=F.col("status"),
                digest=F.concat(F.lit("sha1:"), F.col("doc_id").cast("string")),
                length=F.col("length"),
                offset=F.col("off"),
                filename=F.lit("warc/f.warc.gz"),
            ).alias("value")
        )
        # the line is the real 3-field format
        (l0,) = lines.limit(1).collect()
        assert l0.value.count(" ") >= 2 and l0.value.split(" ", 2)[2].startswith("{")

        got = {r.url: r for r in parse_cdx(lines).collect()}
        a = got["https://A.test/x"]
        assert a.urlkey == "test,a)/x" and a.status == 200
        assert a.offset == 1000 and a.length == 900
        assert str(a.ts) == "2026-03-01 10:00:00"
        assert a.filename == "warc/f.warc.gz" and a.digest == "sha1:0"

    def test_malformed_lines_cost_one_row(self, spark):
        from gocrd_spark.cdx import parse_cdx

        lines = spark.createDataFrame(
            [
                ("com,ok)/p 20260101000000 "
                 '{"url":"http://ok.com/p","status":"200","length":"1","offset":"2","filename":"f"}',),
                ("garbage-no-spaces",),
                ("key only-two-fields",),
                ("com,bad)/p 20260101000000 not-json",),
                ("com,badts)/p NOTATIME "
                 '{"url":"http://badts.com/p","status":"200","length":"1","offset":"2","filename":"f"}',),
            ],
            "value string",
        )
        rows = parse_cdx(lines).collect()
        assert len(rows) == 5  # tolerance: every line yields one row
        ok = [r for r in rows if r.url == "http://ok.com/p"]
        assert len(ok) == 1 and ok[0].status == 200
        # bad lines -> NULL fields, never exceptions
        assert sum(1 for r in rows if r.url is None) == 3
        # garbage + two-field line + NOTATIME all fail the ts parse
        assert sum(1 for r in rows if r.ts is None) == 3


class TestFetchPlannedPages:
    def test_index_driven_selective_extraction(self, spark, tmp_path):
        """End to end: write gzip-member WARC shards + a CDX index for
        them, plan latest-only fetches, read ONLY the planned byte
        ranges, and get byte-identical page bodies — plus one-error-row
        tolerance for a corrupt range and a missing file."""
        import os

        from gocrd_spark.cdx import (
            cdx_fetch_plan,
            fetch_planned_pages,
            format_cdx_line,
            parse_cdx,
        )
        from gocrd_spark.warc import write_warc

        warc_dir = tmp_path / "warc"
        os.makedirs(warc_dir)
        shards: dict[str, bytearray] = {}
        index_rows = []  # (doc_id, url, ts_s, status, filename, offset, length)

        def add_record(doc_id: int, snap: int):
            url = f"http://site{doc_id % 4}.test/p/{doc_id}"
            body = f"<html>doc {doc_id} snap {snap}</html>".encode()
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
            )
            member = write_warc(
                [
                    {
                        "headers": {
                            "WARC-Type": "response",
                            "WARC-Target-URI": url,
                            "WARC-Date": f"2026-01-0{1 + snap}T00:00:00Z",
                        },
                        "payload": payload,
                    }
                ],
                gzip_members=True,
            )
            fname = f"seg-{doc_id % 2}.warc.gz"
            buf = shards.setdefault(fname, bytearray())
            index_rows.append(
                (
                    doc_id,
                    url,
                    f"2026-01-0{1 + snap} 00:00:00",
                    200,
                    fname,
                    len(buf),
                    len(member),
                )
            )
            buf.extend(member)
            return body

        expected = {}
        for i in range(12):
            body = add_record(i, 0)
            expected[f"http://site{i % 4}.test/p/{i}"] = body
        for i in range(0, 12, 3):  # later snapshots win latest-only
            body = add_record(i, 1)
            expected[f"http://site{i % 4}.test/p/{i}"] = body
        for fname, buf in shards.items():
            (warc_dir / fname).write_bytes(bytes(buf))

        # two poison index rows: a range past EOF, and a missing file
        index_rows.append(
            (90, "http://bad.test/eof", "2026-01-01 00:00:00", 200,
             "seg-0.warc.gz", 10_000_000, 50)
        )
        index_rows.append(
            (91, "http://bad.test/missing", "2026-01-01 00:00:00", 200,
             "nope.warc.gz", 0, 50)
        )

        meta = spark.createDataFrame(
            index_rows,
            "doc_id long, url string, ts_s string, status int, "
            "filename string, off long, length long",
        )
        lines = meta.select(
            format_cdx_line(
                url=F.col("url"),
                ts=F.col("ts_s").cast("timestamp"),
                status=F.col("status"),
                digest=F.lit("sha1:x"),
                length=F.col("length"),
                offset=F.col("off"),
                filename=F.col("filename"),
            ).alias("value")
        )
        plan = cdx_fetch_plan(parse_cdx(lines))
        pages = fetch_planned_pages(plan, str(warc_dir)).collect()

        got = {r.url: r for r in pages}
        assert len(got) == 14  # 12 urls + 2 poison rows
        for url, body in expected.items():
            assert got[url].error is None
            assert bytes(got[url].html) == body
        # latest-only actually picked snapshot 1 for the re-crawled urls
        assert b"snap 1" in bytes(got["http://site0.test/p/0"].html)
        assert b"snap 0" in bytes(got["http://site1.test/p/1"].html)
        # poison rows degrade to error rows, never task failures
        assert got["http://bad.test/eof"].error is not None
        assert got["http://bad.test/missing"].error is not None
        assert got["http://bad.test/eof"].html is None


class TestCdxFetchPlan:
    @pytest.fixture()
    def cdx(self, spark):
        from gocrd_spark.cdx import format_cdx_line, parse_cdx

        rows = []
        # url 0: two snapshots (second later, different offset)
        rows.append((0, "http://h0.test/p", "2026-01-01 00:00:00", 200, 0))
        rows.append((0, "http://h0.test/p", "2026-01-05 00:00:00", 200, 100))
        # url 1: 404 only -> excluded by ok_only
        rows.append((1, "http://h1.test/p", "2026-01-02 00:00:00", 404, 200))
        # url 2: one good capture
        rows.append((2, "http://h2.test/p", "2026-01-03 00:00:00", 200, 300))
        df = spark.createDataFrame(
            rows, "doc_id long, url string, ts_s string, status int, off long"
        )
        lines = df.select(
            format_cdx_line(
                url=F.col("url"),
                ts=F.col("ts_s").cast("timestamp"),
                status=F.col("status"),
                digest=F.lit("sha1:x"),
                length=F.lit(10),
                offset=F.col("off"),
                filename=F.concat(
                    F.lit("warc/seg-"),
                    (F.col("doc_id") % 2).cast("string"),
                    F.lit(".warc.gz"),
                ),
            ).alias("value")
        )
        return parse_cdx(lines)

    def test_latest_only_ok_only(self, spark, cdx):
        from gocrd_spark.cdx import cdx_fetch_plan

        got = {r.urlkey: r for r in cdx_fetch_plan(cdx).collect()}
        assert set(got) == {"test,h0)/p", "test,h2)/p"}
        assert got["test,h0)/p"].offset == 100  # the later snapshot
        assert str(got["test,h0)/p"].ts) == "2026-01-05 00:00:00"

    def test_prefix_and_time_filters(self, spark, cdx):
        from gocrd_spark.cdx import cdx_fetch_plan

        only_h2 = cdx_fetch_plan(cdx, urlkey_prefix="test,h2").collect()
        assert [r.urlkey for r in only_h2] == ["test,h2)/p"]
        # time range excluding the late h0 snapshot -> early one wins
        windowed = {
            r.urlkey: r.offset
            for r in cdx_fetch_plan(
                cdx, start_ts="2026-01-01", end_ts="2026-01-04"
            ).collect()
        }
        assert windowed == {"test,h0)/p": 0, "test,h2)/p": 300}

    def test_file_summary(self, spark, cdx):
        from gocrd_spark.cdx import cdx_fetch_plan, cdx_file_summary

        s = {
            r.filename: (r.n_records, r.total_bytes)
            for r in cdx_file_summary(cdx_fetch_plan(cdx)).collect()
        }
        assert s == {"warc/seg-0.warc.gz": (2, 20)}
