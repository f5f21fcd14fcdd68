"""Charset sniffing ladder: BOMs, declarations, meta tags, UTF-8
validation, cp1252 fallback — pure-Python core + the Spark surface."""

import pytest


class TestSniff:
    def test_ladder(self):
        from gocrd_spark.charset import sniff_charset

        cases = [
            (b"\xef\xbb\xbfhello", ("utf-8", "bom")),
            (b"\xff\xfeh\x00i\x00", ("utf-16-le", "bom")),
            (b"\xfe\xff\x00h\x00i", ("utf-16-be", "bom")),
            (b"\xff\xfe\x00\x00abcd", ("utf-32-le", "bom")),  # not utf-16-le!
            # labels fire only for NON-utf-8-valid payloads (the \xe9)
            (b'<?xml version="1.0" encoding="ISO-8859-1"?><a>caf\xe9</a>',
             ("iso8859-1", "xml-decl")),
            (b'<meta charset="windows-1252">caf\xe9', ("cp1252", "meta")),
            (b'<META HTTP-EQUIV="Content-Type" CONTENT="text/html; '
             b'CHARSET=koi8-r">\xe9', ("koi8-r", "meta")),
            # a pure-ASCII payload with a label is charset-agnostic —
            # utf-8 validation outranks the label
            (b'<meta charset="windows-1252">', ("utf-8", "utf8-valid")),
            (b"plain ascii", ("utf-8", "utf8-valid")),
            ("unicode café".encode("utf-8"), ("utf-8", "utf8-valid")),
            (b"caf\xe9 latin bytes", ("cp1252", "fallback")),
        ]
        for data, want in cases:
            assert sniff_charset(data) == want, data

    def test_valid_utf8_beats_stale_labels(self):
        """The transcoded-page trap: UTF-8 bytes still carrying a stale
        latin-1 meta label must decode as UTF-8 (honoring the label
        turns every é into Ã© — the mojibake this module exists to
        prevent)."""
        from gocrd_spark.charset import decode_bytes, sniff_charset

        page = '<meta charset="iso-8859-1"><p>café résumé</p>'.encode("utf-8")
        assert sniff_charset(page) == ("utf-8", "utf8-valid")
        text, enc, src = decode_bytes(page)
        assert "café" in text and "Ã©" not in text

    def test_utf16_labels_never_honored(self):
        """A UTF-16 label READABLE from ASCII-compatible bytes disproves
        itself (WHATWG remap rule) — with invalid-utf-8 bytes it falls
        through to cp1252 rather than decoding byte pairs as UTF-16."""
        from gocrd_spark.charset import sniff_charset

        assert sniff_charset(b'<meta charset="utf-16le">caf\xe9') == (
            "cp1252",
            "fallback",
        )

    def test_unknown_label_falls_through(self):
        from gocrd_spark.charset import sniff_charset

        # a lying/unknown meta label must not error; valid utf-8 wins
        assert sniff_charset(b'<meta charset="not-a-charset">ok') == (
            "utf-8",
            "utf8-valid",
        )
        # unknown label + invalid utf-8 -> cp1252 fallback
        assert sniff_charset(b'<meta charset="nope">\xe9') == (
            "cp1252",
            "fallback",
        )

    def test_decl_only_scanned_in_window(self):
        from gocrd_spark.charset import sniff_charset

        late = b"x" * 2000 + b'<meta charset="iso-8859-1">'
        assert sniff_charset(late) == ("utf-8", "utf8-valid")


class TestDecode:
    def test_round_trips_and_bom_strip(self):
        from gocrd_spark.charset import decode_bytes

        assert decode_bytes("café".encode("utf-8")) == (
            "café", "utf-8", "utf8-valid",
        )
        text, enc, src = decode_bytes(b"\xef\xbb\xbfabc")
        assert (text, enc, src) == ("abc", "utf-8", "bom")
        text, enc, src = decode_bytes(b"\xff\xfe" + "héllo".encode("utf-16-le"))
        assert (text, enc, src) == ("héllo", "utf-16-le", "bom")
        # cp1252 fallback maps every byte (never fails)
        text, enc, src = decode_bytes(b"caf\xe9 \x93quoted\x94")
        assert enc == "cp1252" and text == "café “quoted”"

    def test_lying_meta_degrades_with_replacement(self):
        from gocrd_spark.charset import decode_bytes

        # claims utf-8 but carries a latin-1 byte: decoded with replace,
        # never an exception
        text, enc, src = decode_bytes(b'<meta charset="utf-8">caf\xe9')
        assert (enc, src) == ("utf-8", "meta") and "�" in text


class TestSparkSurface:
    def test_decode_pages_kernel(self, spark):
        from pyspark.sql import functions as F

        from gocrd_spark.charset import decode_pages

        rows = [
            (0, "plain ascii doc".encode("utf-8")),
            (1, b"\xef\xbb\xbf" + "bom café".encode("utf-8")),
            (2, b"\xff\xfe" + "utf16 text".encode("utf-16-le")),
            (3, '<meta charset="iso-8859-1">café'.encode("iso-8859-1")),
            (4, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, html binary")
        got = {r.doc_id: r for r in decode_pages(df).collect()}
        assert got[0].charset == "utf-8" and got[0].text == "plain ascii doc"
        assert got[1].charset_source == "bom" and got[1].text == "bom café"
        assert got[2].charset == "utf-16-le" and got[2].text == "utf16 text"
        assert got[3].charset == "iso8859-1" and got[3].text.endswith("café")
        assert got[4].text == "" and got[4].n_chars == 0


# --- mojibake repair (charset.fix_mojibake / mojibake_repair) ---------


class TestFixMojibake:
    def test_single_latin1_round_trip(self):
        from gocrd_spark.charset import fix_mojibake

        clean = "café à la ümlaut"
        moji = clean.encode("utf-8").decode("latin-1")
        assert fix_mojibake(moji) == (clean, 1)

    def test_double_latin1_round_trip(self):
        from gocrd_spark.charset import fix_mojibake

        clean = "déjà vu"
        moji2 = (
            clean.encode("utf-8").decode("latin-1").encode("utf-8").decode("latin-1")
        )
        assert fix_mojibake(moji2) == (clean, 2)

    def test_ascii_untouched(self):
        from gocrd_spark.charset import fix_mojibake

        assert fix_mojibake("plain ascii text") == ("plain ascii text", 0)

    def test_genuine_latin1_text_untouched(self):
        from gocrd_spark.charset import fix_mojibake

        # stray accented chars followed by ASCII are invalid UTF-8:
        # the decode guard rejects, text survives unmodified
        s = "café au lait, naïve, über"
        assert fix_mojibake(s) == (s, 0)

    def test_non_latin1_chars_untouched(self):
        from gocrd_spark.charset import fix_mojibake

        s = "日本語テキスト"  # encode('latin-1') raises -> untouched
        assert fix_mojibake(s) == (s, 0)

    def test_cp1252_smart_quote(self):
        from gocrd_spark.charset import fix_mojibake

        clean = "it’s fine — really…"
        moji = clean.encode("utf-8").decode("cp1252")
        assert fix_mojibake(moji, codec="cp1252") == (clean, 1)

    def test_cp1252_never_corrupts_on_gap_bytes(self):
        from gocrd_spark.charset import fix_mojibake

        # U+0081 is a cp1252 encode gap: repair must leave the text
        # alone rather than raise or mangle
        s = "prefix \x81 suffix"
        assert fix_mojibake(s, codec="cp1252") == (s, 0)


def test_mojibake_repair_spark(spark):
    from gocrd_spark.charset import mojibake_repair

    clean = "café à la ümlaut"
    moji = clean.encode("utf-8").decode("latin-1")
    df = spark.createDataFrame(
        [(0, f"doc {moji}"), (1, "plain"), (2, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in mojibake_repair(df).collect()}
    assert rows[0].text == f"doc {clean}" and rows[0].changed == 1
    assert rows[1].text == "plain" and rows[1].changed == 0
    assert rows[2].text == "" and rows[2].n_rounds == 0


def test_mojibake_repair_plan_no_shuffle(spark):
    from gocrd_spark.charset import mojibake_repair

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = mojibake_repair(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow Scan -> MapInPandas
