"""The from-scratch PDF parser: generator-spec roundtrip over every
content variant, targeted token/edge cases, error tolerance, and the
Spark extraction surface."""

import random
import zlib

import pytest

from gocrd_spark.pdfgen import make_pdf_row, synth_pdf
from gocrd_spark.pdfparse import parse_value, pdf_text_blocks, Ref


class TestValueParser:
    def test_scalars_and_containers(self):
        data = b" << /A 12 /B -3.5 /C (hi) /D <414243> /E [1 2 0 R /N] /F true >>"
        d, _ = parse_value(data, 0)
        assert d["A"] == 12 and d["B"] == -3.5
        assert d["C"] == b"hi" and d["D"] == b"ABC"
        assert d["E"][0] == 1 and isinstance(d["E"][1], Ref) and d["E"][1].num == 2
        assert d["E"][2] == "N" and d["F"] is True

    def test_string_escapes(self):
        cases = [
            (rb"(a\(b\)c)", b"a(b)c"),
            (rb"(back\\slash)", b"back\\slash"),
            (rb"(\101\102)", b"AB"),
            (rb"(nest(ed)ok)", b"nest(ed)ok"),
            (b"(line\\\ncont)", b"linecont"),
            (rb"(\n\t)", b"\n\t"),
        ]
        for raw, want in cases:
            got, _ = parse_value(raw, 0)
            assert got == want, raw

    def test_odd_hex_padded(self):
        got, _ = parse_value(b"<4142 4>", 0)
        assert got == b"AB@"


class TestRoundtrip:
    def test_generator_spec_roundtrip(self):
        """Every synthetic PDF parses back to exactly the blocks its
        template emitted (all five content variants, raw + Flate)."""
        for i in range(120):
            row, expected = make_pdf_row(i)
            if i % 19 == 18:
                with pytest.raises(ValueError):
                    pdf_text_blocks(row["pdf"])
                continue
            got = [
                (b["page"], b["x"], b["y"], b["text"])
                for b in pdf_text_blocks(row["pdf"])
            ]
            want = [(b["page"], b["x"], b["y"], b["text"]) for b in expected]
            assert got == want, f"doc {i}"

    def test_multipage_order(self):
        rng = random.Random(5)
        for _ in range(20):
            data, expected = synth_pdf(rng)
            pages = [b["page"] for b in pdf_text_blocks(data)]
            assert pages == sorted(pages)

    def test_not_a_pdf(self):
        with pytest.raises(ValueError):
            pdf_text_blocks(b"<html>nope</html>")

    def test_stream_payload_cannot_fake_objects(self):
        """Compressed bytes that happen to contain 'N 0 obj' must not be
        scanned as objects (streams are skipped via /Length)."""
        rng = random.Random(11)
        data, expected = synth_pdf(rng)
        # craft a PDF whose content text literally contains an obj header
        evil = data.replace(b"spark", b"7 0 obj")  # only safe on raw streams
        # regardless of replacement success, parse must not crash and
        # the original must still roundtrip
        blocks = pdf_text_blocks(data)
        assert len(blocks) == len(expected)
        try:
            pdf_text_blocks(evil)
        except ValueError:
            pass  # corrupting a compressed stream is allowed to error


class TestXrefStreamLayout:
    def test_xref_stream_roundtrip_both_predictors(self):
        """The modern layout (ObjStm-packed dicts + /Type /XRef stream
        trailer, no trailer keyword) parses to the same spec blocks;
        seeds cover both the predictor-12 and plain-Flate xref data."""
        for seed in range(60):
            rng = random.Random(1000 + seed)
            data, expected = synth_pdf(rng, layout="xref_stream")
            assert b"trailer" not in data and b"/ObjStm" in data
            got = [(b["page"], b["text"]) for b in pdf_text_blocks(data)]
            assert got == [(b["page"], b["text"]) for b in expected]

    def test_xref_zero_width_field_defaults(self):
        """PDF 1.5 §7.5.8.2: a W entry of 0 means the field is absent
        and DEFAULTS — field 1 (type) to 1, fields 2/3 to 0. W=[1,3,0]
        must yield f3=0 (not 1 — the ADVICE r03 latent trap: f3 is the
        ObjStm index for type-2 entries, so defaulting it to 1 would
        shift every packed object by one); W=[0,3,1] must default the
        type to 1 (at-offset)."""
        from gocrd_spark.pdfparse import _xref_stream_entries

        data = b"\x01" + (300).to_bytes(3, "big") + b"\x02" + (12).to_bytes(3, "big")
        objects = {5: ({"Type": "XRef", "W": [1, 3, 0], "Size": 2}, data)}
        entries = _xref_stream_entries(objects)
        assert entries == {0: (1, 300, 0), 1: (2, 12, 0)}

        data2 = (300).to_bytes(3, "big") + b"\x07" + (12).to_bytes(3, "big") + b"\x00"
        objects2 = {5: ({"Type": "XRef", "W": [0, 3, 1], "Size": 2}, data2)}
        entries2 = _xref_stream_entries(objects2)
        assert entries2 == {0: (1, 300, 7), 1: (1, 12, 0)}

    def test_png_unpredict_all_filters(self):
        """Property: predict-then-unpredict is identity for every PNG
        filter type over random rows."""
        import os as _os

        from gocrd_spark.pdfparse import _png_unpredict

        raw = bytes(random.Random(7).randrange(256) for _ in range(6 * 40))
        cols = 6
        for ftype in range(5):
            enc = bytearray()
            prev = bytes(cols)
            for i in range(0, len(raw), cols):
                row = raw[i : i + cols]
                if ftype == 0:
                    filt = row
                elif ftype == 1:
                    filt = bytes((row[j] - (row[j - 1] if j else 0)) & 0xFF for j in range(cols))
                elif ftype == 2:
                    filt = bytes((row[j] - prev[j]) & 0xFF for j in range(cols))
                elif ftype == 3:
                    filt = bytes(
                        (row[j] - ((row[j - 1] if j else 0) + prev[j]) // 2) & 0xFF
                        for j in range(cols)
                    )
                else:  # Paeth
                    filt = bytearray()
                    for j in range(cols):
                        a = row[j - 1] if j else 0
                        b, c = prev[j], (prev[j - 1] if j else 0)
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                        filt.append((row[j] - pred) & 0xFF)
                enc += bytes([ftype]) + bytes(filt)
                prev = row
            assert _png_unpredict(bytes(enc), cols) == raw, f"filter {ftype}"


class TestToUnicode:
    def test_cmap_parser_bfchar_and_both_bfrange_forms(self):
        from gocrd_spark.pdfparse import parse_tounicode_cmap

        cmap = parse_tounicode_cmap(
            b"2 beginbfchar\n<01> <0041>\n<02> <00e9>\nendbfchar\n"
            b"1 beginbfrange\n<10> <12> [<0058> <0059> <005a>]\nendbfrange\n"
            b"1 beginbfrange\n<20> <22> <0061>\nendbfrange\n"
        )
        assert cmap == {
            1: "A", 2: "é",
            0x10: "X", 0x11: "Y", 0x12: "Z",
            0x20: "a", 0x21: "b", 0x22: "c",
        }

    def test_cid_text_roundtrips_both_layouts(self):
        """Composite-font (Type0 + ToUnicode) blocks must decode to the
        spec text in both the classic and xref-stream layouts; fonts
        without a cmap keep Latin-1 behavior within the same page."""
        seen_cid_show = 0
        for seed in range(40):
            rng = random.Random(7000 + seed)
            layout = "xref_stream" if seed % 2 else "classic"
            data, expected = synth_pdf(rng, layout=layout)
            got = [(b["page"], b["text"]) for b in pdf_text_blocks(data)]
            assert got == [(b["page"], b["text"]) for b in expected]
            if b"/F2 12 Tf <01" in data:  # visible only in RAW streams
                seen_cid_show += 1
        assert seen_cid_show > 5  # the corpus actually exercises CID shows

    def test_unmapped_code_is_replacement_char(self):
        doc = (
            b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Resources "
            b"<< /Font << /F9 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
            b"4 0 obj\n<< /Length 34 >>\nstream\n"
            b"BT /F9 12 Tf <012100ff0122> Tj ET\nendstream\nendobj\n"
            b"5 0 obj\n<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>\nendobj\n"
            b"6 0 obj\n<< /Length 58 >>\nstream\n"
            b"1 beginbfrange\n<0120> <017e> <0020>\nendbfrange\nendstream\nendobj\n"
            b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
        )
        blocks = pdf_text_blocks(doc)
        assert [b["text"] for b in blocks] == ["!�\""]


class TestHostileInputs:
    """Crawl bytes are untrusted: a hostile document must become an
    error row in bounded time/memory, never an executor OOM or hang
    (the advisor's round-2 medium finding)."""

    def test_flate_bomb_is_bounded(self):
        """A ~1MB zlib payload inflating to 2x the cap must raise (and
        allocate at most ~cap), not OOM."""
        import zlib as _z

        import gocrd_spark.pdfparse as pp

        old = pp.MAX_DECOMPRESSED_BYTES
        pp.MAX_DECOMPRESSED_BYTES = 1 << 20  # 1 MiB cap for the test
        try:
            bomb = _z.compress(b"\x00" * (2 << 20))
            with pytest.raises(ValueError, match="exceeds"):
                pp._inflate_capped(bomb, pp.MAX_DECOMPRESSED_BYTES)
            # and through the full document path -> error row, not crash
            doc = (
                b"%PDF-1.4\n"
                b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
                b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
                b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
                b"4 0 obj\n<< /Length " + str(len(bomb)).encode()
                + b" /Filter /FlateDecode >>\nstream\n" + bomb + b"\nendstream\nendobj\n"
                b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
            )
            from gocrd_spark.pdfextract import extract_pdf

            res = extract_pdf(doc)
            assert res["error"] is not None and "exceeds" in res["error"]
        finally:
            pp.MAX_DECOMPRESSED_BYTES = old

    def test_cyclic_page_tree_terminates(self):
        """A /Pages node listing ITSELF (and its parent) as kids would
        explode exponentially under a depth-only cap; the visited set
        must terminate it quickly with the one real page extracted."""
        doc = (
            b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [2 0 R 3 0 R 2 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
            b"4 0 obj\n<< /Length 26 >>\nstream\n"
            b"BT (cycle safe) Tj ET\nendstream\nendobj\n"
            b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
        )
        blocks = pdf_text_blocks(doc)
        assert [b["text"] for b in blocks] == ["cycle safe"]


class TestSparkSurface:
    def test_extract_pdfs_matches_spec(self, spark):
        from gocrd_spark.pdfextract import extract_pdfs
        from gocrd_spark.pdfgen import ensure_pdf_parquet

        pdfs = spark.read.parquet(ensure_pdf_parquet(60))
        rows = {r.doc_id: r for r in extract_pdfs(pdfs).collect()}
        assert len(rows) == 60
        for i in range(60):
            _, expected = make_pdf_row(i)
            if i % 19 == 18:
                assert rows[i].error is not None and rows[i].text is None
            else:
                assert rows[i].error is None
                assert rows[i].text == "\n".join(b["text"] for b in expected)
                assert rows[i].n_blocks == len(expected)

    def test_fake_layout_still_deterministic(self):
        from gocrd_spark.pdfextract import extract_pdf

        a = extract_pdf(b"payload-bytes", fake=True)
        b = extract_pdf(b"payload-bytes", fake=True)
        assert a == b and a["error"] is None and a["text"]


class TestRouting:
    def test_any_document_routes_pdf(self):
        from gocrd_spark.extract import extract_any_document
        from gocrd_spark.pdfgen import make_pdf_row

        row, expected = make_pdf_row(0)
        res = extract_any_document(row["pdf"])
        assert res["error"] is None
        assert res["text"] == "\n".join(b["text"] for b in expected)
        assert res["spans"][0]["region_id"] == "p0_b0"


class TestReviewRegressions:
    """Pins for the round-2 review findings."""

    def test_indirect_length_stream_ending_in_newline_byte(self):
        """Indirect /Length falls back to delimiter search; at most ONE
        EOL before 'endstream' may be stripped — a Flate payload whose
        compressed bytes end in 0x0A must survive."""
        payload = None
        rng = random.Random(3)
        for _ in range(5000):
            filler = "".join(rng.choice("abcdefgh ") for _ in range(rng.randint(4, 60)))
            cand = zlib.compress(f"BT 10 20 Td (hello {filler}) Tj ET".encode())
            if cand.endswith(b"\n"):
                payload = cand
                break
        assert payload is not None, "no newline-ending zlib payload found"
        doc = (
            b"%PDF-1.4\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
            b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
            b"4 0 obj << /Length 5 0 R /Filter /FlateDecode >>\nstream\n"
            + payload
            + b"\nendstream endobj\n"
            + f"5 0 obj {len(payload)} endobj\n".encode()
            + b"trailer << /Root 1 0 R >>\n%%EOF\n"
        )
        blocks = pdf_text_blocks(doc)
        assert "hello" in blocks[0]["text"]

    def test_bt_without_td_has_zero_origin(self):
        content = b"BT 100 700 Td (first) Tj ET BT (second) Tj ET"
        doc = _raw_doc(content)
        blocks = pdf_text_blocks(doc)
        assert (blocks[0]["x"], blocks[0]["y"]) == (100.0, 700.0)
        assert (blocks[1]["x"], blocks[1]["y"]) == (0.0, 0.0)

    def test_malformed_td_operand_is_skipped(self):
        blocks = pdf_text_blocks(_raw_doc(b"BT (x) 5 Td (y) Tj ET"))
        assert blocks and "y" in blocks[0]["text"]

    def test_name_hex_escape_tolerance(self):
        d, _ = parse_value(b"<< /A#42 1 /B#4 2 /C#zz 3 >>", 0)
        assert d == {"AB": 1, "B#4": 2, "C#zz": 3}

    def test_incremental_update_last_definition_wins(self):
        doc = _raw_doc(b"BT 1 1 Td (old text) Tj ET")
        updated = doc + _content_obj(4, b"BT 1 1 Td (new text) Tj ET")
        blocks = pdf_text_blocks(updated)
        assert blocks[0]["text"] == "new text"

    def test_null_pdf_is_error_row(self, spark):
        from gocrd_spark.pdfextract import extract_pdfs

        df = spark.createDataFrame([(1, None)], "doc_id long, pdf binary")
        row = extract_pdfs(df).collect()[0]
        assert row.error is not None and row.text is None


def _content_obj(num: int, content: bytes) -> bytes:
    return (
        f"{num} 0 obj << /Length {len(content)} >>\nstream\n".encode()
        + content
        + b"\nendstream endobj\n"
    )


def _raw_doc(content: bytes) -> bytes:
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        + _content_obj(4, content)
        + b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )


class TestMixedCorpusKernel:
    def test_pdf_rows_flow_through_the_flagship_kernel(self, spark):
        """A crawl table mixing PAGE-XML/HTML/METS pages with PDF payloads
        extracts through the SAME salted mapInPandas kernel — one plan,
        one output contract for every document kind."""
        from gocrd_spark import datagen
        from gocrd_spark.pipeline import extract_pages

        pages = [datagen.make_row(i) for i in range(20)]
        pdf_rows = []
        for i in range(3):
            row, expected = make_pdf_row(i)
            pdf_rows.append(
                {
                    "url": f"https://crawl.test/pdf-{i:04d}",
                    "warc_ts": pages[0]["warc_ts"],
                    "html": row["pdf"],  # binary payload column
                    "text": "",
                    "lang": "en",
                }
            )
        df = spark.createDataFrame(pages + pdf_rows, datagen.PAGES_SCHEMA)
        out = {r.url: r for r in extract_pages(df, num_partitions=4).collect()}
        for i in range(3):
            _, expected = make_pdf_row(i)
            row = out[f"https://crawl.test/pdf-{i:04d}"]
            assert row.error is None
            assert row.text == "\n".join(b["text"] for b in expected)
            assert row.spans[0].region_id == "p0_b0"
        # the XML/HTML rows are untouched by the PDF routing
        kant = out[datagen.KANT_URL]
        assert kant.error is None and len(kant.spans) == 4
