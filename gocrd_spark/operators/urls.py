"""URL canonicalization and URL-level deduplication.

The first dedup a crawl pipeline runs is not on content but on the URL:
the same page is fetched many times under trivially different spellings
(scheme/host case, explicit default ports, fragment anchors, query-param
order). ``canonical_url`` normalizes those away; ``url_dedup`` keeps one
fetch per canonical URL (latest ``warc_ts`` wins — the freshest capture
— with the lowest id as the deterministic tiebreak).

Canonicalization rules (deliberately conservative — nothing lossy like
query-param stripping or www-folding, which change page identity):

1. scheme and host lowercased;
2. explicit default port dropped (``http:80``, ``https:443``) — other
   ports kept;
3. empty path becomes ``/``;
4. query parameters sorted bytewise (``b=2&a=1`` == ``a=1&b=2``); an
   absent/empty query keeps no ``?``;
5. fragment dropped (never sent to the server).

All JVM expressions (``parse_url`` + array ops) — no Python in the row
path. Scale shape of ``url_dedup``: one shuffle on the canonical-URL
string key (the decision needs only (canonical_url, warc_ts, id) —
payload columns join back by id afterwards if the caller carries any).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canonical_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (rules in the module
    docstring). Malformed URLs (no ``scheme://host``) come back NULL —
    callers route those to error handling rather than silently grouping
    them under one empty key."""
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    # HOST excludes the port; AUTHORITY carries host[:port]. try_ variant:
    # malformed URLs yield NULL instead of failing the task (Spark 4)
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    authority = F.try_parse_url(url, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path = F.try_parse_url(url, F.lit("PATH"))
    path = F.when((path.isNull()) | (path == ""), F.lit("/")).otherwise(path)
    query = F.try_parse_url(url, F.lit("QUERY"))
    sorted_query = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.when(
        scheme.isNotNull() & host.isNotNull() & (host != ""),
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            path,
            F.when(
                query.isNotNull() & (query != ""),
                F.concat(F.lit("?"), sorted_query),
            ).otherwise(F.lit("")),
        ),
    )


def url_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Keep one row per canonical URL: the latest ``ts_col`` capture,
    lowest ``id_col`` on ties. Returns every input row labeled —
    (id, url, canonical_url, keep BIGINT 0/1) — the same
    whole-corpus-labeled shape as dedup_clusters, so downstream filters
    compose identically. Rows with NULL canonical_url (malformed URLs)
    are each their own group (keep=1): never silently dropped.

    The groupBy shuffles only (canonical_url, ts, id) — the winner is a
    map-side-combinable max of a (ts, -id) struct, not a window sort.
    """
    ids = F.col(id_col)
    keyed = df.select(
        ids.alias("_id"),
        F.col(url_col).alias("_url"),
        F.col(ts_col).alias("_ts"),
        canonical_url(F.col(url_col)).alias("canonical_url"),
    )
    winners = (
        keyed.filter(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.max(
                F.struct(F.col("_ts").alias("ts"), (-F.col("_id")).alias("neg_id"))
            ).alias("w")
        )
        .select("canonical_url", (-F.col("w.neg_id")).alias("_win_id"))
    )
    return (
        keyed.join(winners, "canonical_url", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("_url").alias(url_col),
            "canonical_url",
            F.when(
                F.col("canonical_url").isNull() | (F.col("_id") == F.col("_win_id")),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("keep"),
        )
    )
