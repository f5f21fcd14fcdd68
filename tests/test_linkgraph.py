"""Link graph: DOM-walker outlink extraction (script-CDATA blindness,
relative-href resolution, malformed tolerance), weighted host edges,
and integer-exact PageRank (hand-computed planted graph, partitioning
independence, mass accounting)."""

import pytest

from pyspark.sql import functions as F

PAGE = """
<html><head><title>x</title>
<script>var s = '<a href="https://fake.example.com/">not a link</a>';</script>
</head><body>
<p><a href="https://a.example.com/1">one</a></p>
<p><a href="/rel/2">two</a></p>
<p><a href="../up/3">three</a></p>
<p><a name="anchor-without-href">none</a></p>
<p><a href="https://a.example.com/1">one again</a></p>
<!-- <a href="https://comment.example.com/">commented out</a> -->
</body></html>
"""


class TestParseOutlinks:
    def test_resolution_and_blind_spots(self):
        """Relative hrefs resolve against the page URL; anchors without
        href, script-string fakes and commented-out anchors are all
        invisible; duplicates are KEPT (multiplicity feeds the weighted
        graph)."""
        from gocrd_spark.operators.linkgraph import parse_outlinks

        got = parse_outlinks("https://b.example.com/dir/page.html", PAGE.encode())
        assert [dst for dst, _, _ in got] == [
            "https://a.example.com/1",
            "https://b.example.com/rel/2",
            "https://b.example.com/up/3",
            "https://a.example.com/1",
        ]
        # raw hrefs preserved alongside
        assert [href for _, href, _ in got] == [
            "https://a.example.com/1", "/rel/2", "../up/3",
            "https://a.example.com/1",
        ]

    def test_garbage_and_empty(self):
        from gocrd_spark.operators.linkgraph import parse_outlinks

        assert parse_outlinks("https://x.com/", b"\xff\xfe not html at all") == []
        assert parse_outlinks("https://x.com/", b"") == []
        # tag soup: parser is tolerant, collects what it can
        soup = b"<a href='https://y.com/1'><p><a href='https://y.com/2'"
        dsts = [d for d, _, _ in parse_outlinks("https://x.com/", soup)]
        assert "https://y.com/1" in dsts


class TestHostGraph:
    def test_edges_weighted_and_null_dropped(self, spark):
        from gocrd_spark.operators.linkgraph import host_edges

        links = spark.createDataFrame(
            [
                ("https://a.com/p1", "https://b.com/x", "x"),
                ("https://a.com/p2", "https://b.com/y", "y"),
                ("https://a.com/p1", "https://a.com/self", "self"),
                ("https://a.com/p1", "not a url", "bad"),
                ("garbage", "https://b.com/z", "bad-src"),
            ],
            "src_url string, dst_url string, href string",
        )
        got = {
            (r.src_host, r.dst_host): r.n_links for r in host_edges(links).collect()
        }
        assert got == {("a.com", "b.com"): 2, ("a.com", "a.com"): 1}

    def test_pagerank_planted_two_hosts(self, spark):
        """Hand-computed recurrence on a 2-host graph (a -> b only):
        N=2, scale=1e12. r0 = 5e11 each. Iter: a gets only base
        (no inlinks); b gets base + 85% of a's full rank (a's single
        outlink carries rank*1/1 = rank).

        base = 15e12 // 200 = 75_000_000_000.
        a1 = base. b1 = base + (85 * 5e11) // 100 = base + 425e9.
        a2 = base. b2 = base + (85 * a1) // 100 = base + (85*75e9)//100
           = 75e9 + 63_750_000_000 = 138_750_000_000.
        """
        from gocrd_spark.operators.linkgraph import host_pagerank

        edges = spark.createDataFrame(
            [("a.com", "b.com", 1)], "src_host string, dst_host string, n_links long"
        )
        got1 = {
            r.host: r.rank_e12 for r in host_pagerank(edges, n_iters=1).collect()
        }
        base = (15 * 10**12) // 200
        assert got1 == {
            "a.com": base,
            "b.com": base + (85 * (10**12 // 2)) // 100,
        }
        got2 = {
            r.host: r.rank_e12 for r in host_pagerank(edges, n_iters=2).collect()
        }
        assert got2 == {"a.com": base, "b.com": base + (85 * base) // 100}

    def test_pagerank_partitioning_independent(self, spark):
        """The integer recurrence must give IDENTICAL ranks regardless
        of input partitioning — the property that makes the DuckDB
        hash-compare sound (BIGINT sums are order-independent; double
        sums would not be)."""
        from gocrd_spark.operators.linkgraph import (
            extract_outlinks,
            host_edges,
            host_pagerank,
            synth_linked_html,
        )

        rows = [(r["url"], bytearray(r["html"])) for r in synth_linked_html(80)]
        pages = spark.createDataFrame(rows, "url string, html binary")
        edges = host_edges(extract_outlinks(pages))
        one = {
            r.host: r.rank_e12
            for r in host_pagerank(edges.coalesce(1), n_iters=5).collect()
        }
        many = {
            r.host: r.rank_e12
            for r in host_pagerank(edges.repartition(13), n_iters=5).collect()
        }
        assert one == many and len(one) == 20

    def test_pagerank_mass_bounded(self, spark):
        """Total rank never exceeds the scale (integer truncation and
        dropped dangling mass only LOSE mass) and stays positive."""
        from gocrd_spark.operators.linkgraph import (
            extract_outlinks,
            host_edges,
            host_pagerank,
            synth_linked_html,
        )

        rows = [(r["url"], bytearray(r["html"])) for r in synth_linked_html(60)]
        pages = spark.createDataFrame(rows, "url string, html binary")
        ranks = host_pagerank(host_edges(extract_outlinks(pages)), n_iters=5)
        agg = ranks.agg(
            F.sum("rank_e12").alias("total"), F.min("rank_e12").alias("mn")
        ).collect()[0]
        assert 0 < agg.total <= 10**12
        assert agg.mn >= (15 * 10**12) // (100 * 20)  # every host >= base


class TestSynthFormulaPin:
    def test_dom_walk_equals_formula(self, spark):
        """The Spark DOM-walk outlink set over synth_linked_html equals
        the generating formula — the same independence the driver
        oracle relies on, pinned here at a size the driver never runs."""
        from gocrd_spark.operators.linkgraph import (
            extract_outlinks,
            synth_linked_html,
        )

        n = 53
        rows = [(r["url"], bytearray(r["html"])) for r in synth_linked_html(n)]
        pages = spark.createDataFrame(rows, "url string, html binary")
        got = {
            (r.src_url, r.dst_url)
            for r in extract_outlinks(pages).collect()
        }
        want = set()
        for i in range(n):
            for j in range(i % 4):
                d = (i * 7 + j + 1) % n
                want.add(
                    (
                        f"https://host{i % 20}.example.com/page/{i}",
                        f"https://host{d % 20}.example.com/page/{d}",
                    )
                )
        assert got == want


class TestAnchorText:
    def test_anchor_capture_shapes(self):
        """Anchor text between <a> and </a>; nested <a> implicitly
        closes; unclosed trailing anchor keeps its text; cap at 512
        chars; markup inside the anchor contributes its text only."""
        from gocrd_spark.operators.linkgraph import parse_outlinks

        page = (
            b'<a href="/one">click <b>here</b> now</a>'
            b'<a href="/two">first <a href="/three">second</a>'
            b'<a href="/four">trailing text'
        )
        got = parse_outlinks("https://x.com/", page)
        anchors = {href: a for _, href, a in got}
        assert anchors["/one"] == "click here now"
        assert anchors["/two"] == "first"      # implicit close at next <a>
        assert anchors["/three"] == "second"
        assert anchors["/four"] == "trailing text"  # EOF finalize

        big = b'<a href="/big">' + b"x" * 5000 + b"</a>"
        (row,) = parse_outlinks("https://x.com/", big)
        assert len(row[2]) == 512

        # script/style bodies inside an open anchor are NOT anchor text
        js = b'<a href="/x"><script>var y=1;</script>click<style>.a{}</style> me</a>'
        (row,) = parse_outlinks("https://x.com/", js)
        assert row[2] == "click me"

    def test_inlink_summary(self, spark):
        """Counts, distinct source hosts, and the most frequent anchor
        (ties to the lexicographically smallest)."""
        from gocrd_spark.operators.linkgraph import inlink_summary

        links = spark.createDataFrame(
            [
                ("https://a.test/p", "https://t.test/x", "/x", "zebra"),
                ("https://a.test/q", "https://t.test/x", "/x", "apple"),
                ("https://b.test/r", "https://t.test/x", "/x", "apple"),
                ("https://b.test/r", "https://t.test/x", "/x", "zebra"),
                ("https://b.test/r", "https://t.test/y", "/y", "only"),
            ],
            "src_url string, dst_url string, href string, anchor string",
        )
        got = {r.dst_url: r for r in inlink_summary(links).collect()}
        x = got["https://t.test/x"]
        assert (x.n_inlinks, x.n_src_hosts) == (4, 2)
        assert x.top_anchor == "apple"  # 2-2 tie -> lexicographic min
        y = got["https://t.test/y"]
        assert (y.n_inlinks, y.n_src_hosts, y.top_anchor) == (1, 1, "only")


class TestRedirectResolve:
    def test_chains_cycles_and_flapping(self, spark):
        """Chains resolve to the tail with exact hop counts; a closed
        group never resolves (NULL final/hops); a src with two recorded
        targets collapses to the lexicographic min dst."""
        from gocrd_spark.operators.linkgraph import redirect_resolve

        rows = [(f"n{d}", f"n{d + 1}") for d in range(20) if d % 8 != 7]
        rows += [("n15", "n8")]                     # group 1 closes: cycle
        rows += [("flap", "b"), ("flap", "a")]      # min dst wins
        df = spark.createDataFrame(rows, "src string, dst string")
        got = {r.src: (r.final_url, r.hops, r.resolved)
               for r in redirect_resolve(df, max_hops=32).collect()}
        assert got["n0"] == ("n7", 7, 1)
        assert got["n6"] == ("n7", 1, 1)
        assert got["n16"] == ("n20", 4, 1)
        for d in range(8, 16):
            assert got[f"n{d}"] == (None, None, 0)
        assert got["flap"] == ("a", 1, 1)
        # srcs: n0-n6, n8-n15 (cycle group incl. the closing edge),
        # n16-n19, flap — n7 has no out-edge and emits no row
        assert len(got) == 20

    def test_max_hops_cap(self, spark):
        """A 10-hop chain resolves at max_hops=16 but NOT at max_hops=8
        (chains past the cap are unresolved, not truncated)."""
        from gocrd_spark.operators.linkgraph import redirect_resolve

        df = spark.createDataFrame(
            [(f"c{d}", f"c{d + 1}") for d in range(10)], "src string, dst string"
        )
        hi = {r.src: r for r in redirect_resolve(df, max_hops=16).collect()}
        assert hi["c0"].final_url == "c10" and hi["c0"].hops == 10
        lo = {r.src: r for r in redirect_resolve(df, max_hops=8).collect()}
        assert lo["c0"].resolved == 0 and lo["c0"].final_url is None
        assert lo["c2"].final_url == "c10" and lo["c2"].hops == 8

    def test_self_redirect_is_cycle(self, spark):
        from gocrd_spark.operators.linkgraph import redirect_resolve

        df = spark.createDataFrame(
            [("s", "s"), ("a", "b")], "src string, dst string"
        )
        got = {r.src: (r.final_url, r.resolved)
               for r in redirect_resolve(df).collect()}
        assert got == {"s": (None, 0), "a": ("b", 1)}


class TestHostTrustrank:
    def test_trust_decays_from_seeds(self, spark):
        """A 4-host chain seeded at one end: trust strictly decreases
        with hop distance; a host unreachable from the seed scores 0;
        PageRank would rank the popular spam host highest but TrustRank
        must not."""
        from gocrd_spark.operators.linkgraph import host_pagerank, host_trustrank

        # seed -> a -> b; spam heavily linked from everywhere EXCEPT
        # the trust neighborhood never sees teleport or inflow
        edges = spark.createDataFrame(
            [("seed", "a", 2), ("a", "b", 1),
             ("x1", "spam", 9), ("x2", "spam", 9), ("x3", "spam", 9)],
            "src_host string, dst_host string, n_links long",
        )
        seeds = spark.createDataFrame([("seed",)], "host string")
        trust = {r.host: r.trust_e12 for r in host_trustrank(edges, seeds).collect()}
        assert trust["seed"] > trust["a"] > trust["b"] > 0
        assert trust["spam"] == 0 and trust["x1"] == 0
        rank = {r.host: r.rank_e12 for r in host_pagerank(edges).collect()}
        assert rank["spam"] > rank["b"]  # raw popularity, the signal trust corrects

    def test_missing_seed_ignored_and_plan_checkpointed(self, spark):
        from gocrd_spark.operators.linkgraph import host_trustrank

        edges = spark.createDataFrame(
            [("s", "t", 1)], "src_host string, dst_host string, n_links long"
        )
        seeds = spark.createDataFrame(
            [("s",), ("ghost.example",)], "host string"
        )
        out = host_trustrank(edges, seeds, n_iters=2)
        got = {r.host: r.trust_e12 for r in out.collect()}
        # |S ∩ graph| = 1: seed keeps full teleport share
        assert got["s"] == 15 * 10**10  # (15*1e12) div (100*1)
        assert got["t"] > 0 and "ghost.example" not in got
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" in plan


class TestFrontierExpand:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(
            [(a, b, 1) for a, b in pairs],
            "src_host string, dst_host string, n_links long",
        )

    def test_shortest_hop_wins(self, spark):
        from gocrd_spark.operators.linkgraph import frontier_expand

        # a -> b -> c and a -> c: c must be hop 1, not 2
        edges = self._edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
        seeds = spark.createDataFrame([("a",)], "host string")
        got = {r.host: r.hop for r in frontier_expand(edges, seeds).collect()}
        assert got == {"a": 0, "b": 1, "c": 1}

    def test_hop_budget_cuts_discovery(self, spark):
        from gocrd_spark.operators.linkgraph import frontier_expand

        chain = [(f"n{i}", f"n{i+1}") for i in range(6)]
        seeds = spark.createDataFrame([("n0",)], "host string")
        got = {r.host: r.hop for r in
               frontier_expand(self._edges(spark, chain), seeds, max_hops=2).collect()}
        assert got == {"n0": 0, "n1": 1, "n2": 2}  # n3+ out of budget

    def test_cycles_terminate_and_keep_min(self, spark):
        from gocrd_spark.operators.linkgraph import frontier_expand

        edges = self._edges(spark, [("a", "b"), ("b", "a"), ("b", "c")])
        seeds = spark.createDataFrame([("a",)], "host string")
        got = {r.host: r.hop for r in
               frontier_expand(edges, seeds, max_hops=4).collect()}
        assert got == {"a": 0, "b": 1, "c": 2}

    def test_unreached_and_disconnected_seeds(self, spark):
        from gocrd_spark.operators.linkgraph import frontier_expand

        edges = self._edges(spark, [("x", "y")])
        seeds = spark.createDataFrame([("a",)], "host string")
        got = {r.host: r.hop for r in frontier_expand(edges, seeds).collect()}
        assert got == {"a": 0}  # seed kept even with no edges; x/y unreached
