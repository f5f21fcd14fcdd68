"""RSS 2.0 / Atom feed parsing — the syndication leg of the web
extraction tier.

Pure Python over :mod:`gocrd_spark.xmlwalk` (the same namespace-blind
walker the METS/PAGE extractors use — Atom's default ``xmlns`` is
matched by local name, reference semantics SURVEY.md §1.3), so the same
code runs inside Arrow batch kernels on executors with zero Spark
dependencies and is unit-testable without a session.

Semantics (first-match, tolerant):

- root local-name ``rss``  -> channel = first ``channel`` child;
  items are the channel's ``item`` children in document order.
- root local-name ``feed`` -> Atom; items are the root's ``entry``
  children in document order.
- anything else (or unparseable bytes) -> ``error`` set, no items.
- item fields: first matching child's string value — RSS
  ``title``/``link``/``pubDate``/``description``; Atom ``title``/
  ``link/@href``/(``published`` falling back to ``updated``)/
  ``summary``. Missing fields are None (absence is data).
- timestamps stay RAW STRINGS — crawl feeds carry every date format
  ever minted; parsing belongs downstream (``try_to_timestamp``).
"""

from __future__ import annotations

from typing import Any, Optional
from xml.etree import ElementTree as ET

from .xmlwalk import attr, children, first_child, local_name, parse_bytes, string_value


def _text(parent: ET.Element, name: str) -> Optional[str]:
    node = first_child(parent, name)
    return string_value(node) if node is not None else None


def parse_feed(data: bytes) -> dict[str, Any]:
    """bytes -> {feed_type, feed_title, items: [...], error}; items are
    {idx, title, link, published, summary} dicts in document order."""
    out: dict[str, Any] = {
        "feed_type": None, "feed_title": None, "items": [], "error": None,
    }
    try:
        root = parse_bytes(data)
    except ET.ParseError as exc:
        out["error"] = f"feed parse: {exc.__class__.__name__}"
        return out
    kind = local_name(root.tag)
    if kind == "rss":
        chan = first_child(root, "channel")
        if chan is None:
            out["error"] = "rss without channel"
            return out
        out["feed_type"] = "rss"
        out["feed_title"] = _text(chan, "title")
        for idx, item in enumerate(children(chan, "item")):
            out["items"].append({
                "idx": idx,
                "title": _text(item, "title"),
                "link": _text(item, "link"),
                "published": _text(item, "pubDate"),
                "summary": _text(item, "description"),
            })
    elif kind == "feed":
        out["feed_type"] = "atom"
        out["feed_title"] = _text(root, "title")
        for idx, entry in enumerate(children(root, "entry")):
            link_node = first_child(entry, "link")
            published = _text(entry, "published")
            if published is None:
                published = _text(entry, "updated")
            out["items"].append({
                "idx": idx,
                "title": _text(entry, "title"),
                "link": attr(link_node, "href") if link_node is not None else None,
                "published": published,
                "summary": _text(entry, "summary"),
            })
    else:
        out["error"] = f"not a feed (root {kind!r})"
    return out


def parse_sitemap(data: bytes) -> dict[str, Any]:
    """bytes -> {kind: 'urlset'|'sitemapindex'|None, entries: [...],
    error}; entries are {idx, loc, lastmod, changefreq, priority} dicts
    in document order (changefreq/priority None for index entries —
    the protocol defines them for <url> only). Values stay raw strings;
    a <url> without <loc> still emits its row (absence is data)."""
    out: dict[str, Any] = {"kind": None, "entries": [], "error": None}
    try:
        root = parse_bytes(data)
    except ET.ParseError as exc:
        out["error"] = f"sitemap parse: {exc.__class__.__name__}"
        return out
    kind = local_name(root.tag)
    if kind == "urlset":
        out["kind"] = "urlset"
        for idx, u in enumerate(children(root, "url")):
            out["entries"].append({
                "idx": idx,
                "loc": _text(u, "loc"),
                "lastmod": _text(u, "lastmod"),
                "changefreq": _text(u, "changefreq"),
                "priority": _text(u, "priority"),
            })
    elif kind == "sitemapindex":
        out["kind"] = "sitemapindex"
        for idx, s in enumerate(children(root, "sitemap")):
            out["entries"].append({
                "idx": idx,
                "loc": _text(s, "loc"),
                "lastmod": _text(s, "lastmod"),
                "changefreq": None,
                "priority": None,
            })
    else:
        out["error"] = f"not a sitemap (root {kind!r})"
    return out
