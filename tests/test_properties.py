"""Property-based tests (hypothesis) for the extraction kernel: for ANY
generated PAGE-XML document, span offsets must exactly reconstruct the
joined text, indices must be sorted, and invisible regions must stay
invisible."""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from gocrd_spark.extract import extract_document

# text fragments incl. historic glyphs, combining chars, multi-byte
TEXT = st.lists(
    st.sampled_from(
        list("abc XYZ 123 .,;!?ſüöäßẞ") + ["aͤ", "oͤ", "uͤ", "€", "中", "\t"]
    ),
    max_size=40,
).map("".join)
IDS = st.from_regex(r"r_[a-z0-9]{1,8}", fullmatch=True)


def esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


@st.composite
def page_doc(draw):
    n = draw(st.integers(min_value=0, max_value=6))
    ids = draw(
        st.lists(IDS, min_size=n, max_size=n, unique=True)
    )
    indices = draw(st.permutations(list(range(n))))
    texts = draw(st.lists(TEXT, min_size=n, max_size=n))
    dangling = draw(st.booleans())
    malformed = draw(st.booleans())
    missing_text_equiv = draw(st.sets(st.integers(0, max(n - 1, 0)), max_size=2))
    refs = [
        f'<pc:RegionRefIndexed index="{idx}" regionRef="{rid}"/>'
        for idx, rid in zip(indices, ids)
    ]
    if dangling:
        refs.append(f'<pc:RegionRefIndexed index="{n}" regionRef="nope"/>')
    if malformed:
        refs.append('<pc:RegionRefIndexed regionRef="no-index"/>')
        refs.append('<pc:RegionRefIndexed index="1.5" regionRef="float-index"/>')
    regions = []
    for i, rid in enumerate(ids):
        te = (
            ""
            if i in missing_text_equiv
            else f"<TextEquiv><Unicode>{esc(texts[i])}</Unicode></TextEquiv>"
        )
        regions.append(
            f'<TextRegion id="{rid}"><Coords points="1,2 3,4"/>{te}</TextRegion>'
        )
    regions.append('<SeparatorRegion id="sep"><Coords points="0,0 1,1"/></SeparatorRegion>')
    doc = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<PcGts xmlns:pc="http://x/pc"><Page>'
        "<pc:ReadingOrder><pc:OrderedGroup>"
        + "".join(refs)
        + "</pc:OrderedGroup></pc:ReadingOrder>"
        + "".join(regions)
        + "</Page></PcGts>"
    )
    visible = {
        rid: texts[i]
        for i, rid in enumerate(ids)
        if i not in missing_text_equiv
    }
    order = sorted(zip(indices, ids))  # (index, id) sorted
    expected = [
        (rid, idx) for idx, rid in order if rid in visible
    ]
    return doc.encode("utf-8"), visible, expected


@settings(max_examples=120, deadline=None)
@given(page_doc())
def test_spans_reconstruct_text(case):
    data, visible, expected = case
    result = extract_document(data)
    assert result["error"] is None, result["error"]
    text, spans = result["text"], result["spans"]
    raw = text.encode("utf-8")
    # region order and identity
    assert [(s["region_id"], s["index"]) for s in spans] == expected
    # offsets reconstruct both byte- and char-slices exactly
    parts = []
    for s in spans:
        chunk_b = raw[s["byte_start"] : s["byte_end"]]
        chunk_c = text[s["char_start"] : s["char_end"]]
        assert chunk_b.decode("utf-8") == chunk_c
        assert chunk_c == visible[s["region_id"]]
        parts.append(chunk_c)
    assert text == "\n".join(parts)
    # invisible regions never leak
    assert all(s["region_id"] != "sep" for s in spans)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=200))
def test_never_raises_on_garbage(data):
    result = extract_document(data)
    assert (result["text"] is None) == (result["error"] is not None)


@settings(max_examples=60, deadline=None)
@given(page_doc())
def test_deterministic(case):
    data, _, _ = case
    a, b = extract_document(data), extract_document(data)
    assert a == b
    if a["text"] is not None:
        assert hashlib.sha256(a["text"].encode()).hexdigest() == hashlib.sha256(
            b["text"].encode()
        ).hexdigest()
