"""CDX(J) index support — the Common-Crawl INDEX format next to the
WARC shards (`warc.py`): one line per capture,

    <SURT urlkey> <14-digit timestamp> <JSON blob>

where the JSON carries url/mime/status/digest/length/offset/filename
(the byte range of the record inside its WARC file). Public format
(pywb CDXJ / Common Crawl cc-index); implemented from the spec, no
external libs, all columnar — the parse is split-limit-3 + from_json,
the SURT key is regexp/array ops, and the fetch planner is the
operator a 100 TB pipeline actually needs the index FOR: answer "which
byte ranges of which WARC files do I fetch for this url subset /
time range" WITHOUT touching the payload data.

Scale notes: cc-index shards are sorted by urlkey, so a urlkey-prefix
predicate is a pushed-down range scan (PushedFilters on a sorted
parquet materialization; partition pruning if the index is
urlkey-range-partitioned). The latest-only dedup is the same
max(struct(ts, tiebreak)) partial-agg shape as urls.url_dedup — the
shuffle carries (urlkey, struct) only. The per-file grouping bounds
its collect by records-per-WARC-file (a Common Crawl shard holds
~30-60k records), never corpus size.

SURT subset (documented like the xmlpath §1.3 subset): lowercase;
scheme dropped; a single leading ``www.`` label dropped; host labels
reversed and comma-joined; default ports dropped; path kept verbatim
(lowercased), query kept verbatim behind ``?``; no per-param sorting.
That matches cc-index keys for the overwhelming host/path case; the
full SURT spec's param canonicalization is out of scope and would
only change key EQUALITY for querystring captures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CDX_JSON_SCHEMA = (
    "url string, mime string, status string, digest string, "
    "length string, offset string, filename string"
)

PARSED_SCHEMA_COLS = (
    "urlkey",
    "ts",
    "url",
    "mime",
    "status",
    "digest",
    "length",
    "offset",
    "filename",
)


def surt_key(url: Column) -> Column:
    """SURT canonical key for a url (subset above): reversed comma-host
    + ')' + lowercased path[?query]."""
    u = F.lower(url)
    # strip scheme, then a single leading www.
    rest = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, r"^www\.", "")
    hostport = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    path = F.regexp_extract(rest, r"^[^/?#]*([^#]*)", 1)  # /path?query
    host = F.regexp_extract(hostport, r"^([^:]*)", 1)
    port = F.regexp_extract(hostport, r"(:\d+)$", 1)
    port = F.when(port.isin(":80", ":443"), F.lit("")).otherwise(port)
    rev = F.concat_ws(",", F.reverse(F.split(host, r"\.")))
    return F.concat(
        rev, port, F.lit(")"), F.when(path == "", F.lit("/")).otherwise(path)
    )


def format_cdx_line(
    url: Column,
    ts: Column,
    status: Column,
    digest: Column,
    length: Column,
    offset: Column,
    filename: Column,
    mime: Column | None = None,
) -> Column:
    """One CDX line from typed columns (the writer half of the round
    trip; tests and the driver query build synthetic indexes with it)."""
    blob = F.to_json(
        F.struct(
            url.alias("url"),
            (mime if mime is not None else F.lit("text/html")).alias("mime"),
            status.cast("string").alias("status"),
            digest.alias("digest"),
            length.cast("string").alias("length"),
            offset.cast("string").alias("offset"),
            filename.alias("filename"),
        )
    )
    return F.concat_ws(
        " ", surt_key(url), F.date_format(ts, "yyyyMMddHHmmss"), blob
    )


def parse_cdx(lines: DataFrame, col: str = "value") -> DataFrame:
    """Parse CDX lines (one per row in ``col``) into typed columns.
    Malformed lines (fewer than 3 fields / bad JSON / bad timestamp)
    yield NULL fields rather than failures — index shards are
    crawler-written and a bad line must cost one row, never the scan
    (same tolerance contract as warc.parse_warc_salvage)."""
    parts = F.split(F.col(col), " ", 3)
    # try_* variants throughout: ANSI mode (Spark 4 default) makes
    # to_timestamp/cast THROW on malformed input, and a crawler-written
    # index line must never kill the scan
    j = F.from_json(F.try_element_at(parts, F.lit(3)), CDX_JSON_SCHEMA)
    return lines.select(
        F.try_element_at(parts, F.lit(1)).alias("urlkey"),
        F.try_to_timestamp(
            F.try_element_at(parts, F.lit(2)), F.lit("yyyyMMddHHmmss")
        ).alias("ts"),
        j["url"].alias("url"),
        j["mime"].alias("mime"),
        j["status"].try_cast("int").alias("status"),
        j["digest"].alias("digest"),
        j["length"].try_cast("long").alias("length"),
        j["offset"].try_cast("long").alias("offset"),
        j["filename"].alias("filename"),
    )


def cdx_fetch_plan(
    cdx: DataFrame,
    urlkey_prefix: str | None = None,
    start_ts: str | None = None,
    end_ts: str | None = None,
    ok_only: bool = True,
    latest_only: bool = True,
) -> DataFrame:
    """The index's reason to exist: select captures (urlkey prefix,
    time range, HTTP 200, latest snapshot per urlkey) and emit the
    byte-range fetch rows (urlkey, ts, url, filename, offset, length)
    a range-GET fetcher consumes. Prefix/time predicates are plain
    pushed-down filters; latest-only is one (urlkey)-keyed partial agg
    carrying max(struct(ts, offset, ...)) — never the line text."""
    df = cdx.filter(F.col("urlkey").isNotNull() & F.col("ts").isNotNull())
    if urlkey_prefix is not None:
        df = df.filter(F.col("urlkey").startswith(urlkey_prefix))
    if start_ts is not None:
        df = df.filter(F.col("ts") >= F.lit(start_ts).cast("timestamp"))
    if end_ts is not None:
        df = df.filter(F.col("ts") < F.lit(end_ts).cast("timestamp"))
    if ok_only:
        df = df.filter(F.col("status") == 200)
    if latest_only:
        picked = df.groupBy("urlkey").agg(
            F.max(
                F.struct("ts", "offset", "url", "filename", "length")
            ).alias("w")
        )
        df = picked.select(
            "urlkey",
            F.col("w.ts").alias("ts"),
            F.col("w.url").alias("url"),
            F.col("w.filename").alias("filename"),
            F.col("w.offset").alias("offset"),
            F.col("w.length").alias("length"),
        )
    else:
        df = df.select("urlkey", "ts", "url", "filename", "offset", "length")
    return df


def cdx_file_summary(plan: DataFrame) -> DataFrame:
    """Per-WARC-file fetch totals for scheduling: how many records and
    bytes each file contributes (one partial-agg groupBy on filename —
    at most one group per WARC shard)."""
    return plan.groupBy("filename").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum("length").alias("total_bytes"),
        F.min("offset").alias("min_offset"),
        F.max("offset").alias("max_offset"),
    )
