"""RSS/Atom feed parsing — pure-Python kernel semantics plus the Spark
pipeline tier (fan-out, error rows, narrow no-shuffle plan)."""

from gocrd_spark.feed import parse_feed


RSS = (
    b'<?xml version="1.0"?><rss version="2.0"><channel>'
    b"<title>Feed &amp; Chan</title>"
    b"<item><title>T0</title><link>https://f.test/0</link>"
    b"<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>"
    b"<item><title>T1</title><link>https://f.test/1</link>"
    b"<description>D1</description></item>"
    b"</channel></rss>"
)

ATOM = (
    b'<feed xmlns="http://www.w3.org/2005/Atom"><title>A</title>'
    b'<entry><title>E0</title><link href="https://a.test/0"/>'
    b"<published>2024-01-01T00:00:00Z</published><summary>S0</summary></entry>"
    b'<entry><title>E1</title><link href="https://a.test/1"/>'
    b"<updated>2024-02-01T00:00:00Z</updated></entry>"
    b"</feed>"
)


class TestParseFeed:
    def test_rss_items_in_order_with_missing_fields(self):
        out = parse_feed(RSS)
        assert out["feed_type"] == "rss" and out["error"] is None
        assert out["feed_title"] == "Feed & Chan"  # entity decoded
        assert [i["title"] for i in out["items"]] == ["T0", "T1"]
        assert out["items"][0]["summary"] is None        # no <description>
        assert out["items"][1]["published"] is None      # no <pubDate>
        assert out["items"][1]["summary"] == "D1"

    def test_atom_namespace_blind_and_published_fallback(self):
        out = parse_feed(ATOM)
        assert out["feed_type"] == "atom" and out["feed_title"] == "A"
        assert out["items"][0]["link"] == "https://a.test/0"
        assert out["items"][0]["published"] == "2024-01-01T00:00:00Z"
        # entry 1 has no <published>: falls back to <updated>
        assert out["items"][1]["published"] == "2024-02-01T00:00:00Z"
        assert out["items"][1]["summary"] is None

    def test_non_feed_and_garbage(self):
        assert parse_feed(b"<html><body>x</body></html>")["error"] == (
            "not a feed (root 'html')"
        )
        assert parse_feed(b"no xml at all")["error"] == "feed parse: ParseError"
        assert parse_feed(b"<rss version='2.0'></rss>")["error"] == (
            "rss without channel"
        )


class TestFeedItemsTier:
    def test_fanout_and_error_rows(self, spark):
        from gocrd_spark.pipeline import feed_items

        df = spark.createDataFrame(
            [("u1", bytearray(RSS)), ("u2", bytearray(ATOM)), ("u3", bytearray(b"junk"))],
            "url string, html binary",
        )
        rows = feed_items(df).collect()
        by_url: dict = {}
        for r in rows:
            by_url.setdefault(r.url, []).append(r)
        assert len(by_url["u1"]) == 2 and len(by_url["u2"]) == 2
        assert {r.feed_type for r in by_url["u1"]} == {"rss"}
        err = by_url["u3"]
        assert len(err) == 1 and err[0].error == "feed parse: ParseError"
        assert err[0].item_idx is None and err[0].item_title is None

    def test_plan_is_narrow(self, spark):
        from gocrd_spark.pipeline import feed_items

        df = spark.createDataFrame(
            [("u", bytearray(RSS))], "url string, html binary"
        )
        plan = feed_items(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # rides the scan's own splits


SITEMAP = (
    b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    b"<url><loc>https://s.test/a</loc><lastmod>2024-03-01</lastmod>"
    b"<changefreq>daily</changefreq><priority>0.8</priority></url>"
    b"<url><loc>https://s.test/b</loc></url>"
    b"<url><lastmod>2024-03-02</lastmod></url>"
    b"</urlset>"
)

SITEMAP_INDEX = (
    b"<sitemapindex><sitemap><loc>https://s.test/s1.xml</loc>"
    b"<lastmod>2024-04-01</lastmod></sitemap></sitemapindex>"
)


class TestParseSitemap:
    def test_urlset_fields_and_absences(self):
        from gocrd_spark.feed import parse_sitemap

        out = parse_sitemap(SITEMAP)
        assert out["kind"] == "urlset" and out["error"] is None
        assert [e["loc"] for e in out["entries"]] == [
            "https://s.test/a", "https://s.test/b", None,  # loc-less row kept
        ]
        assert out["entries"][0]["priority"] == "0.8"
        assert out["entries"][1]["lastmod"] is None
        assert out["entries"][2]["lastmod"] == "2024-03-02"

    def test_index_and_errors(self):
        from gocrd_spark.feed import parse_sitemap

        out = parse_sitemap(SITEMAP_INDEX)
        assert out["kind"] == "sitemapindex"
        assert out["entries"][0]["loc"] == "https://s.test/s1.xml"
        assert out["entries"][0]["changefreq"] is None
        assert parse_sitemap(b"<rss/>")["error"] == "not a sitemap (root 'rss')"
        assert parse_sitemap(b"junk")["error"] == "sitemap parse: ParseError"


class TestSitemapUrlsTier:
    def test_fanout_and_narrow_plan(self, spark):
        from gocrd_spark.pipeline import sitemap_urls

        df = spark.createDataFrame(
            [("u1", bytearray(SITEMAP)), ("u2", bytearray(b"x"))],
            "url string, html binary",
        )
        q = sitemap_urls(df)
        rows = q.collect()
        assert sum(1 for r in rows if r.url == "u1") == 3
        err = [r for r in rows if r.url == "u2"]
        assert err[0].error == "sitemap parse: ParseError" and err[0].loc is None
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
