"""HTML main-content extraction: boilerplate strip via DOM heuristics.

The north rule's general tier ("HTML boilerplate strip, PDF/layout
parse, DOM heuristics") applied to Common-Crawl-style payloads that are
plain HTML rather than PAGE-XML. Pure Python (stdlib ``html.parser`` —
tolerant of real-world malformed HTML), same shape as the PAGE-XML
kernel: ``extract_html(data) -> {text, spans, error}`` with byte/char
span offsets per kept block, so one output schema serves both document
kinds (routing in extract.extract_any_document).

Heuristics (classic text-density boilerplate stripping):
- pruned subtrees: script/style/noscript/template/head/nav/footer/
  header/aside/form/iframe/svg/button/select — never contribute text;
- block segmentation on block-level tags (p, div, h1-h6, li, td, ...);
- a block is CONTENT if its text is long enough (>= min_len chars after
  whitespace collapse) and its link density (chars inside <a> / total
  chars) is <= max_link_density; headings get a lower length bar;
- kept blocks joined by '\n' in document order; spans carry the block
  tag, offsets and link density (fixed-point e6).

Determinism: pure function of the bytes; no models, no randomness.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Any, Optional

from .spans import assemble, stable_error

PRUNE_TAGS = frozenset(
    "script style noscript template head nav footer header aside form "
    "iframe svg button select option".split()
)
BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li td th blockquote pre article section "
    "main figcaption dd dt table tr ul ol body".split()
)
HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6".split())
VOID_BLOCK_TAGS = frozenset(("br", "hr"))

DEFAULT_MIN_LEN = 25
DEFAULT_HEADING_MIN_LEN = 8
DEFAULT_MAX_LINK_DENSITY = 0.4


class _Block:
    __slots__ = ("tag", "chars", "link_chars")

    def __init__(self, tag: str) -> None:
        self.tag = tag
        self.chars: list[str] = []
        self.link_chars = 0


class _MainContentParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._current: Optional[_Block] = None
        self._prune_stack: list[str] = []
        self._link_depth = 0

    # -- structure ----------------------------------------------------------

    def _open_block(self, tag: str) -> None:
        self._current = _Block(tag)
        self.blocks.append(self._current)

    def _close_block(self) -> None:
        self._current = None

    def _implied_head_close(self, tag: str) -> None:
        """HTML5 allows omitting </head> (and </body>): <body> or any
        block-level start implies the head is closed. Without this, a
        real-world page that never closes <head> (common: minifiers drop
        it) would keep the prune on and extract to empty text."""
        if "head" in self._prune_stack and (tag == "body" or tag in BLOCK_TAGS):
            self._prune_stack = [t for t in self._prune_stack if t != "head"]

    def handle_starttag(self, tag: str, attrs) -> None:
        self._implied_head_close(tag)
        if tag in PRUNE_TAGS:
            self._prune_stack.append(tag)
            return
        if self._prune_stack:
            return
        if tag == "a":
            self._link_depth += 1
        if tag in VOID_BLOCK_TAGS:
            self._close_block()
        elif tag in BLOCK_TAGS:
            self._open_block(tag)

    def handle_startendtag(self, tag: str, attrs) -> None:
        if self._prune_stack:
            return
        if tag in VOID_BLOCK_TAGS:
            self._close_block()

    def handle_endtag(self, tag: str) -> None:
        if tag in PRUNE_TAGS:
            if tag in self._prune_stack:
                # pop the most recent matching entry (tolerates interleaving)
                for i in range(len(self._prune_stack) - 1, -1, -1):
                    if self._prune_stack[i] == tag:
                        del self._prune_stack[i]
                        break
            return
        if self._prune_stack:
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in BLOCK_TAGS:
            self._close_block()

    def handle_data(self, data: str) -> None:
        if self._prune_stack or not data:
            return
        if self._current is None:
            self._open_block("div")  # top-level stray text
        self._current.chars.append(data)
        if self._link_depth:
            self._current.link_chars += len(data)


def _normalize(text: str) -> str:
    return " ".join(text.split())


def extract_html(
    data: bytes,
    min_len: int = DEFAULT_MIN_LEN,
    heading_min_len: int = DEFAULT_HEADING_MIN_LEN,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> dict[str, Any]:
    """bytes -> {'text', 'spans', 'error'} — same contract as
    extract_document; span region_id is 'b<i>' (document-order block
    ordinal of kept blocks' source position)."""
    try:
        # charset sniffing ladder (charset.py): BOM -> utf-8 validation
        # -> declaration/meta -> cp1252. Unlabeled valid UTF-8 (the old
        # fast path) behaves identically; BOMs are now stripped instead
        # of leaking U+FEFF into the text, and Latin-1/UTF-16 pages get
        # real text instead of utf-8-with-replacement mojibake.
        from .charset import decode_bytes

        raw, _enc, _src = decode_bytes(data)
        parser = _MainContentParser()
        parser.feed(raw)
        parser.close()

        def blocks():
            for i, block in enumerate(parser.blocks):
                total = sum(len(c) for c in block.chars)
                if total == 0:
                    continue
                text = _normalize("".join(block.chars))
                if not text:
                    continue
                bar = heading_min_len if block.tag in HEADING_TAGS else min_len
                if len(text) < bar:
                    continue
                if block.link_chars / total > max_link_density:
                    continue
                yield f"b{i}", i, text, None  # HTML has no layout geometry

        return assemble(blocks())
    except Exception as exc:
        return {"text": None, "spans": None, "error": stable_error(exc)}


# ---------------------------------------------------------------------------
# page metadata (head extraction tier)
# ---------------------------------------------------------------------------

class _MetaParser(HTMLParser):
    """First-wins head-metadata collector: html@lang, <title> text,
    meta[name=description], meta[name=robots] (raw directive string),
    link[rel~=canonical]/@href, meta[property=og:title]. Tolerant of
    malformed HTML the same way _MainContentParser is; non-HTML payloads
    (PAGE-XML, METS, garbage) simply collect nothing."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.lang: Optional[str] = None
        self.title: Optional[str] = None
        self.description: Optional[str] = None
        self.robots: Optional[str] = None
        self.canonical: Optional[str] = None
        self.og_title: Optional[str] = None
        self._title_chars: Optional[list[str]] = None
        self._title_done = False
        self._html_seen = False

    @staticmethod
    def _first_attrs(attrs) -> dict[str, str]:
        out: dict[str, str] = {}
        for k, v in attrs:
            if k not in out and v is not None:
                out[k] = v
        return out

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "html" and not self._html_seen:
            self._html_seen = True
            lang = self._first_attrs(attrs).get("lang", "").strip()
            self.lang = lang or None
        elif tag == "title" and not self._title_done:
            self._title_chars = []
        elif tag == "meta":
            a = self._first_attrs(attrs)
            content = a.get("content")
            if content is None:
                return
            name = a.get("name", "").lower()
            prop = a.get("property", "").lower()
            if name == "description" and self.description is None:
                self.description = _normalize(content) or None
            elif name == "robots" and self.robots is None:
                self.robots = content
            elif prop == "og:title" and self.og_title is None:
                self.og_title = _normalize(content) or None
        elif tag == "link" and self.canonical is None:
            a = self._first_attrs(attrs)
            if "canonical" in a.get("rel", "").lower().split():
                href = a.get("href", "").strip()
                if href:
                    self.canonical = href

    def handle_data(self, data: str) -> None:
        if self._title_chars is not None and not self._title_done:
            self._title_chars.append(data)

    def handle_endtag(self, tag: str) -> None:
        if tag == "title" and self._title_chars is not None and not self._title_done:
            self._title_done = True  # first <title> element wins, even if empty
            self.title = _normalize("".join(self._title_chars)) or None
            self._title_chars = None


def robots_meta_flags(raw: Optional[str]) -> tuple[int, int]:
    """(noindex, nofollow) from a robots meta directive string: tokens
    are comma-separated, case-insensitive; ``none`` implies both
    (Google/Bing robots-meta semantics)."""
    toks = [t.strip().lower() for t in raw.split(",")] if raw else []
    noindex = int("noindex" in toks or "none" in toks)
    nofollow = int("nofollow" in toks or "none" in toks)
    return noindex, nofollow


def page_meta(data: bytes) -> dict[str, Any]:
    """bytes -> head metadata dict: {title, description, canonical_url,
    og_title, lang_attr, robots, noindex 0/1, nofollow 0/1, error}.
    Non-HTML payloads yield all-null metadata with error=None — metadata
    absence is data, not failure."""
    try:
        from .charset import decode_bytes

        raw, _enc, _src = decode_bytes(data)
        p = _MetaParser()
        p.feed(raw)
        p.close()
        noindex, nofollow = robots_meta_flags(p.robots)
        return {
            "title": p.title,
            "description": p.description,
            "canonical_url": p.canonical,
            "og_title": p.og_title,
            "lang_attr": p.lang,
            "robots": p.robots,
            "noindex": noindex,
            "nofollow": nofollow,
            "error": None,
        }
    except Exception as exc:
        return {
            "title": None, "description": None, "canonical_url": None,
            "og_title": None, "lang_attr": None, "robots": None,
            "noindex": 0, "nofollow": 0, "error": stable_error(exc),
        }
