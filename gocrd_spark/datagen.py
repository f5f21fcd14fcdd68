"""Deterministic synthesis of the ``pages`` input table (FIXTURES.md §1).

The input contract (BASELINE.json ``input_hint``) is an Iceberg table of
Common-Crawl-style pages: ``(url string, warc_ts timestamp, html binary,
text string, lang string)``. No such table ships with the sandbox, so we
synthesize it deterministically (seed=42, keyed per ``doc_id`` so any
subset/ordering/partitioning yields identical rows — generation is an
embarrassingly-parallel narrow map, done *in Spark* for bench scale).

Row mix (per FIXTURES.md §1, extended):
- two reserved rows carry the reference fixtures verbatim
  (``.../kant-0020`` = kant PAGE-XML, ``.../mets-0001`` = METS manifest);
- ``doc_id % 10 == 7`` -> a synthetic METS manifest (METS query volume);
- ``doc_id % 101 == 100`` -> truncated/garbage bytes (error-row path);
- otherwise a synthetic PAGE-XML document: k regions under a
  shuffled-index ReadingOrder, one unreferenced SeparatorRegion (must
  stay invisible, page/page_test.go:23), an occasional malformed
  RegionRefIndexed missing @index (silent-skip path, page/page.go:144-146),
  namespaced pc: prefixes on the ReadingOrder (namespace-blindness),
  and text drawn from a seeded word list incl. ``ſ``/``aͤ``/``ü``.
"""

from __future__ import annotations

import datetime
import os
import random
from typing import Iterator, Optional

import pandas as pd

SEED = 42
EPOCH = datetime.datetime(2026, 1, 1)

WORDS = [
    "gewiegelt", "worden", "ſo", "ſchaͤdlich", "iſt", "Vorurtheile",
    "Aufklaͤrung", "Unmuͤndigkeit", "Verſtandes", "räſonnirt", "Freiheit",
    "öffentlichen", "Gebrauch", "Vernunft", "über", "büßen", "dieſer",
    "zuletzt", "raͤchen", "Menſchen", "ſelbſt", "und", "der", "die", "das",
    "zu", "von", "nicht", "aber", "wird", "erfordert", "als", "eben",
]

KANT_URL = "https://crawl.test/kant-0020"
METS_URL = "https://crawl.test/mets-0001"

_FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def _fixture(name: str) -> bytes:
    with open(os.path.join(_FIXTURE_DIR, name), "rb") as fh:
        return fh.read()


def synth_page_xml(rng: random.Random) -> bytes:
    """One synthetic PAGE-XML document exercising every kernel path."""
    n_regions = rng.randint(1, 6)
    indices = list(range(n_regions))
    rng.shuffle(indices)  # ReadingOrder must be sorted by the kernel
    refs = []
    for i, idx in enumerate(indices):
        if rng.random() < 0.05:  # malformed: missing @index -> silently skipped
            refs.append(f'        <pc:RegionRefIndexed regionRef="r_{i}"/>')
        else:
            refs.append(f'        <pc:RegionRefIndexed index="{idx}" regionRef="r_{i}"/>')
    if rng.random() < 0.10:  # dangling ref: no TextRegion with this id
        refs.append(
            f'        <pc:RegionRefIndexed index="{n_regions}" regionRef="r_missing"/>'
        )
    regions = []
    for i in range(n_regions):
        n_lines = rng.randint(1, 4)
        lines = []
        line_texts = []
        for j in range(n_lines):
            n_words = rng.randint(2, 8)
            words = [rng.choice(WORDS) for _ in range(n_words)]
            line_text = " ".join(words)
            line_texts.append(line_text)
            x0, y0 = rng.randint(0, 1200), rng.randint(0, 1800)
            word_xml = "".join(
                f'\n          <Word id="w_{i}_{j}_{k}">'
                f'<Coords points="{x0+k*40},{y0} {x0+k*40+35},{y0+30}"/>'
                f"<TextEquiv><Unicode>{w}</Unicode></TextEquiv></Word>"
                for k, w in enumerate(words)
            )
            lines.append(
                f'        <TextLine id="tl_{i}_{j}">'
                f'<Coords points="{x0},{y0} {x0+800},{y0+40}"/>'
                f"{word_xml}\n          <TextEquiv><Unicode>{line_text}</Unicode>"
                f"</TextEquiv></TextLine>"
            )
        region_text = "\n\t\t\t\t".join(line_texts)  # kant-style embedded whitespace
        x0, y0 = rng.randint(0, 1000), rng.randint(0, 1500)
        regions.append(
            f'      <TextRegion type="paragraph" id="r_{i}">\n'
            f'        <Coords points="{x0},{y0} {x0+850},{y0} {x0+850},{y0+500} {x0},{y0+500}"/>\n'
            + "\n".join(lines)
            + f"\n        <TextEquiv><Unicode>{region_text}</Unicode></TextEquiv>\n"
            f"      </TextRegion>"
        )
    # unreferenced SeparatorRegion: must not appear in output
    separator = (
        '      <SeparatorRegion id="sep_1">'
        '<Coords points="0,0 10,10"/></SeparatorRegion>'
    )
    doc = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<PcGts xmlns:pc="http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15">\n'
        "  <Page>\n"
        "    <pc:ReadingOrder>\n"
        '      <pc:OrderedGroup id="ro_1">\n'
        + "\n".join(refs)
        + "\n      </pc:OrderedGroup>\n"
        "    </pc:ReadingOrder>\n"
        + "\n".join(regions)
        + "\n"
        + separator
        + "\n  </Page>\n</PcGts>\n"
    )
    return doc.encode("utf-8")


def synth_html_doc(rng: random.Random) -> bytes:
    """Synthetic HTML page: nav/header/footer boilerplate around a main
    article — exercises the boilerplate-strip path (htmlextract)."""
    nav_links = " ".join(
        f'<a href="/{w}">{w}</a>' for w in rng.sample(WORDS, 6)
    )
    paras = []
    for _ in range(rng.randint(2, 6)):
        words = [rng.choice(WORDS) for _ in range(rng.randint(15, 40))]
        paras.append(f"<p>{' '.join(words)}</p>")
    title_words = " ".join(rng.choice(WORDS) for _ in range(4))
    doc = (
        "<!DOCTYPE html>\n<html><head><title>t</title>"
        "<script>var x = 'never extracted';</script>"
        "<style>.a{color:red}</style></head>\n<body>"
        f'<header><nav>{nav_links}</nav></header>'
        f"<article><h1>{title_words}</h1>\n" + "\n".join(paras) + "</article>"
        f'<aside>{" ".join(rng.sample(WORDS, 8))}</aside>'
        f"<footer>{nav_links}</footer>"
        "</body></html>\n"
    )
    return doc.encode("utf-8")


def synth_mets_xml(rng: random.Random) -> bytes:
    """Synthetic METS manifest with namespaced elements + a commented file."""
    groups = []
    for use in ("OCR-D-IMG", "OCR-D-GT-PAGE", "OCR-D-GT-ALTO"):
        n_files = rng.randint(0, 3)
        files = "".join(
            f'\n      <mets:file ID="{use}_{i:04d}" MIMETYPE="application/alto+xml">'
            f'\n        <mets:FLocat LOCTYPE="URL" xlink:href="https://files.test/{use}/{i:04d}.xml"/>'
            f"\n      </mets:file>"
            for i in range(n_files)
        )
        comment = (
            '\n      <!-- <mets:file ID="GHOST" MIMETYPE="image/tiff"/> -->'
            if rng.random() < 0.3
            else ""
        )
        groups.append(f'    <mets:fileGrp USE="{use}">{comment}{files}\n    </mets:fileGrp>')
    doc = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<mets:mets xmlns:mets="http://www.loc.gov/METS/"'
        ' xmlns:xlink="http://www.w3.org/1999/xlink">\n  <mets:fileSec>\n'
        + "\n".join(groups)
        + "\n  </mets:fileSec>\n</mets:mets>\n"
    )
    return doc.encode("utf-8")


def make_row(doc_id: int) -> dict:
    """Deterministic row for a doc_id — independent of generation order."""
    rng = random.Random(SEED * 0x9E3779B9 + doc_id)  # per-doc seed: order-independent
    url = f"https://crawl.test/{doc_id:08d}"
    warc_ts = EPOCH + datetime.timedelta(days=doc_id % 30)
    if doc_id == 0:
        return {
            "url": KANT_URL,
            "warc_ts": warc_ts,
            "html": _fixture("kant_aufklaerung_1784_0020.xml"),
            "text": "",
            "lang": "de",
        }
    if doc_id == 1:
        return {
            "url": METS_URL,
            "warc_ts": warc_ts,
            "html": _fixture("mets.xml"),
            "text": "",
            "lang": "de",
        }
    if doc_id % 101 == 100:  # malformed payload -> error row
        html = b"<PcGts><Page><broken " + bytes([rng.randint(32, 126) for _ in range(64)])
        lang = "xx"
    elif doc_id % 10 == 7:  # METS manifest
        html = synth_mets_xml(rng)
        lang = "la"
    elif doc_id % 10 == 3:  # plain HTML page (boilerplate-strip path)
        html = synth_html_doc(rng)
        lang = ("de", "en", "la")[doc_id % 3]
    else:
        html = synth_page_xml(rng)
        lang = ("de", "en", "la")[doc_id % 3]
    return {"url": url, "warc_ts": warc_ts, "html": html, "text": "", "lang": lang}


def pages_pdf(n_docs: int) -> pd.DataFrame:
    """Small-scale pandas synthesis (tests)."""
    return pd.DataFrame([make_row(i) for i in range(n_docs)])


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def pages_df(spark, n_docs: int, num_partitions: Optional[int] = None):
    """Spark-parallel synthesis: a narrow map over spark.range — scales to
    bench sizes on all cores with no driver-side materialization."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame([make_row(int(i)) for i in batch["id"]])

    rng_df = spark.range(0, n_docs, 1, num_partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, PAGES_SCHEMA)


def write_pages(spark, n_docs: int, path: str, num_partitions: Optional[int] = None) -> str:
    """Materialize the synthetic table as parquet (bench cache)."""
    pages_df(spark, n_docs, num_partitions).write.mode("overwrite").parquet(path)
    return path


def write_pages_partitioned(
    spark, n_docs: int, path: str, num_partitions: Optional[int] = None
) -> str:
    """Materialize with day-level directory partitioning — the sandbox
    stand-in for Iceberg's hidden ``days(warc_ts)`` partitioning (no
    Iceberg runtime jar ships in this container; SURVEY.md §7 step 6
    'parquet fallback'). A ``warc_ts`` range scan prunes whole
    directories at planning time (PartitionFilters in .explain)."""
    from pyspark.sql import functions as F

    df = pages_df(spark, n_docs, num_partitions).withColumn(
        "warc_day", F.date_format("warc_ts", "yyyy-MM-dd")
    )
    df.write.mode("overwrite").partitionBy("warc_day").parquet(path)
    return path
