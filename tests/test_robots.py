"""robots.txt (RFC 9309): parser group selection, wildcard/$ matching,
longest-match + allow-tie decisions, and the Spark filter surface."""

import pytest

RFC_EXAMPLE = b"""
# comment line
User-agent: googlebot
Disallow: /private/

User-agent: *
Disallow: /blocked/
Allow: /blocked/except/
Disallow: /*.gif$

Sitemap: https://x.com/sitemap.xml
"""


class TestParse:
    def test_group_selection(self):
        from gocrd_spark.operators.robots import parse_robots

        star = parse_robots(RFC_EXAMPLE, "*")
        assert star == [
            (False, "/blocked/"),
            (True, "/blocked/except/"),
            (False, "/*.gif$"),
        ]
        goog = parse_robots(RFC_EXAMPLE, "GoogleBot")  # case-insensitive
        assert goog == [(False, "/private/")]
        # unknown agent falls back to *
        assert parse_robots(RFC_EXAMPLE, "otherbot") == star

    def test_merged_groups_and_empty_disallow(self):
        from gocrd_spark.operators.robots import parse_robots

        data = (
            b"User-agent: *\nDisallow: /a/\n\n"
            b"User-agent: *\nDisallow: /b/\nDisallow:\n"
        )
        assert parse_robots(data, "*") == [(False, "/a/"), (False, "/b/")]

    def test_shared_group_header(self):
        """Two User-agent lines before one rule block: both agents get
        the rules (RFC 9309 group formation)."""
        from gocrd_spark.operators.robots import parse_robots

        data = b"User-agent: a\nUser-agent: b\nDisallow: /x/\n"
        assert parse_robots(data, "a") == [(False, "/x/")]
        assert parse_robots(data, "b") == [(False, "/x/")]

    def test_empty_allow_skipped_and_duplicate_ua_deduped(self):
        """Empty Allow: is skipped like empty Disallow (a '' pattern
        would match every path at length 0 and leak matched_rule='');
        repeated identical User-agent header lines must not
        double-append rules."""
        from gocrd_spark.operators.robots import evaluate, parse_robots

        data = b"User-agent: *\nAllow:\nDisallow: /x/\n"
        rules = parse_robots(data, "*")
        assert rules == [(False, "/x/")]
        assert evaluate(rules, "/free") == (True, None)

        dup = b"User-agent: *\nUser-agent: *\nDisallow: /a\n"
        assert parse_robots(dup, "*") == [(False, "/a")]

    def test_octet_length_specificity(self):
        """RFC 9309 measures specificity in OCTETS: '/café' is 5 chars
        but 6 UTF-8 octets — it must outrank a 5-octet ASCII pattern."""
        from gocrd_spark.operators.robots import evaluate

        rules = [(True, "/café"), (False, "/caf")]  # 6 vs 4 octets
        assert evaluate(rules, "/café-menu") == (True, "/café")
        # and a 5-char/6-octet disallow beats a 5-octet allow
        rules2 = [(False, "/café"), (True, "/caf9x")]  # 6 vs 6: tie -> allow
        assert evaluate(rules2, "/café")[0] is False  # only one matches
        rules3 = [(False, "/aé"), (True, "/ab")]  # 3 octets vs 2
        assert evaluate(rules3, "/aéb") == (False, "/aé")

    def test_compiled_rules_equivalent(self):
        from gocrd_spark.operators.robots import (
            compile_rules,
            evaluate,
            parse_robots,
        )

        rules = parse_robots(RFC_EXAMPLE, "*")
        for path in ("/page", "/blocked/x", "/blocked/except/y", "/a.gif"):
            assert evaluate(rules, path) == evaluate(compile_rules(rules), path)

    def test_garbage_tolerance(self):
        from gocrd_spark.operators.robots import parse_robots

        data = b"\xff\xfe not utf8 \n no colon line \n Disallow: /early/\nUser-agent: *\nDisallow: /ok/\n"
        # rule before any User-agent is ignored; the rest parses
        assert parse_robots(data, "*") == [(False, "/ok/")]


class TestEvaluate:
    def test_longest_match_and_allow_tie(self):
        from gocrd_spark.operators.robots import evaluate

        rules = [
            (False, "/blocked/"),
            (True, "/blocked/except/"),
            (False, "/*.gif$"),
        ]
        assert evaluate(rules, "/page/1") == (True, None)
        assert evaluate(rules, "/blocked/secret") == (False, "/blocked/")
        assert evaluate(rules, "/blocked/except/ok") == (True, "/blocked/except/")
        assert evaluate(rules, "/img/cat.gif") == (False, "/*.gif$")
        assert evaluate(rules, "/img/cat.gif.html") == (True, None)  # $ anchors
        # allow wins an exact length tie
        tie = [(False, "/p/"), (True, "/p*")]
        assert evaluate(tie, "/p/x")[0] is True

    def test_wildcard_positions(self):
        from gocrd_spark.operators.robots import evaluate

        rules = [(False, "/a/*/c")]
        assert evaluate(rules, "/a/b/c")[0] is False
        assert evaluate(rules, "/a/b/cd")[0] is False  # prefix, no anchor
        assert evaluate(rules, "/a/c")[0] is True


class TestSparkSurface:
    def test_filter_labels_and_missing_robots(self, spark):
        from gocrd_spark.operators.robots import robots_filter

        urls = spark.createDataFrame(
            [
                (0, "https://a.com/page"),
                (1, "https://a.com/blocked/x"),
                (2, "https://a.com/blocked/except/y"),
                (3, "https://norobots.com/anything"),
                (4, "https://A.COM/blocked/case"),   # host case-folds
            ],
            "doc_id long, url string",
        )
        robots = spark.createDataFrame(
            [
                (
                    "a.com",
                    bytearray(
                        b"User-agent: *\nDisallow: /blocked/\n"
                        b"Allow: /blocked/except/\n"
                    ),
                )
            ],
            "host string, robots binary",
        )
        got = {r.id: (r.allowed, r.matched_rule) for r in robots_filter(urls, robots).collect()}
        assert got == {
            0: (1, None),
            1: (0, "/blocked/"),
            2: (1, "/blocked/except/"),
            3: (1, None),       # no robots row -> allowed
            4: (0, "/blocked/"),
        }


class TestRobotsSitemaps:
    def test_extraction_shapes(self, spark):
        """Case-insensitive key, flexible spacing, document order via
        sitemap_idx; bodies without Sitemap lines (or NULL) yield no
        rows; a Disallow line never matches."""
        from gocrd_spark.operators.robots import robots_sitemaps

        rows = [
            ("a.test", b"User-agent: *\nSitemap: https://a.test/s1.xml\n"
                       b"sitemap:https://a.test/s2.xml\nDisallow: /x\n"),
            ("b.test", b"  SITEMAP :  nope\nSITEMAP: https://b.test/m.xml \n"),
            ("c.test", b"Disallow: /"),
            ("d.test", None),
        ]
        df = spark.createDataFrame(rows, "host string, robots binary")
        got = sorted(
            (r.host, r.sitemap_idx, r.sitemap_url)
            for r in robots_sitemaps(df).collect()
        )
        assert got == [
            ("a.test", 0, "https://a.test/s1.xml"),
            ("a.test", 1, "https://a.test/s2.xml"),
            # whitespace before the colon is tolerated (real-world
            # robots parsers are lenient); the VALUE is verbatim —
            # URL validation belongs to the consumer
            ("b.test", 0, "nope"),
            ("b.test", 1, "https://b.test/m.xml"),
        ]


class TestCrawlDelay:
    def test_group_scoping_and_tolerance(self):
        from gocrd_spark.operators.robots import crawl_delay

        body = (b"User-agent: googlebot\nCrawl-delay: 2\nDisallow: /p\n\n"
                b"User-agent: *\nCrawl-delay: 1.5\nDisallow: /x\n")
        assert crawl_delay(body) == 1500
        assert crawl_delay(body, "GoogleBot") == 2000
        # group-scoped: a delay in another agent's group is invisible
        assert crawl_delay(b"User-agent: bot\nCrawl-delay: 3\n") is None
        # first-in-group wins; malformed/negative ignored
        assert crawl_delay(
            b"User-agent: *\nCrawl-delay: 1\nCrawl-delay: 7\n"
        ) == 1000
        assert crawl_delay(b"User-agent: *\nCrawl-delay: fast\n") is None
        assert crawl_delay(b"User-agent: *\nCrawl-delay: -2\n") is None
        # shared group header: delay applies to every listed agent
        assert crawl_delay(
            b"User-agent: a\nUser-agent: *\nCrawl-delay: 4\n", "zzz"
        ) == 4000

    def test_dataframe_surface_and_null_robots(self, spark):
        from gocrd_spark.operators.robots import robots_crawl_delays

        df = spark.createDataFrame(
            [
                ("h0", bytearray(b"User-agent: *\nCrawl-delay: 0.25\n")),
                ("h1", bytearray(b"User-agent: *\nDisallow: /\n")),
                ("h2", None),
            ],
            "host string, robots binary",
        )
        got = {r.host: r.crawl_delay_ms for r in robots_crawl_delays(df).collect()}
        assert got == {"h0": 250, "h1": None, "h2": None}
