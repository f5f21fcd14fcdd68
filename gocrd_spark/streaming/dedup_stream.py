"""Streaming deduplication — the ingest-time guard of a crawl pipeline:
drop exact re-fetches of a document as the stream arrives, with state
bounded by an event-time watermark.

Two operators:

- ``dedup_stream`` — ``dropDuplicatesWithinWatermark`` on the
  normalized-text hash: a duplicate arriving within the watermark
  horizon of its first occurrence is dropped; state (one row per hash)
  is evicted once the watermark passes, so memory is bounded by the
  horizon's unique-hash volume, not the stream's history. This is the
  crawl-scale contract: re-fetches cluster in time (snapshots, retries),
  so a horizon covers them; a year-later re-crawl is handled by the
  batch ``filter_unprocessed`` anti-join instead.
- ``dedup_stream_exact`` — plain ``dropDuplicates`` on the hash:
  exact global dedup with UNBOUNDED state; kept for bounded backfills
  (availableNow over a finite directory) where exactness beats the
  memory bound.

Both emit (doc_id, ts, text_hash) for the kept (first-seen) rows.
Parity with batch ``exact_dedup``'s keep-set, the drop-then-evict
lifecycle, and exactly-once re-drain are pinned by
tests/test_stream_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_STREAM_SCHEMA = "doc_id long, ts timestamp, text string"


def _hashed(stream: DataFrame) -> DataFrame:
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return stream.select(
        "doc_id", "ts", F.md5(F.encode(norm, "utf-8")).alias("text_hash")
    )


def docs_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(input_dir)
    )


def dedup_stream(
    spark: SparkSession, input_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """First-seen documents per text hash within the watermark horizon
    (bounded state — the production shape)."""
    hashed = _hashed(docs_stream(spark, input_dir)).withWatermark("ts", watermark)
    return hashed.dropDuplicatesWithinWatermark(["text_hash"])


URLS_STREAM_SCHEMA = "doc_id long, ts timestamp, url string"


def url_dedup_stream(
    spark: SparkSession, input_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Ingest-time URL dedup: first fetch per CANONICAL url within the
    watermark horizon — the streaming twin of operators.urls.url_dedup
    (same canonicalizer, so 'HTTP://X.COM:80/p?b=2&a=1#f' and
    'http://x.com/p?a=1&b=2' collapse at ingest). Malformed URLs
    canonicalize to NULL and are kept (one NULL key would otherwise
    swallow them all) by routing them past the dedup with a
    disambiguating per-row key. State bounded like dedup_stream."""
    from gocrd_spark.operators.urls import canonical_url

    stream = (
        spark.readStream.schema(URLS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(input_dir)
    )
    keyed = stream.select(
        "doc_id",
        "ts",
        "url",
        canonical_url(F.col("url")).alias("canonical_url"),
    ).withColumn(
        # NULL canon (malformed) must not collapse into one state row:
        # give each its own key so dropDuplicates keeps every one
        "_key",
        F.coalesce(
            F.col("canonical_url"), F.concat(F.lit("\x00bad:"), F.col("doc_id"))
        ),
    )
    return (
        keyed.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["_key"])
        .drop("_key")
    )


def dedup_stream_exact(spark: SparkSession, input_dir: str) -> DataFrame:
    """First-seen documents per text hash over the whole stream
    (unbounded state — bounded-backfill use only)."""
    return _hashed(docs_stream(spark, input_dir)).dropDuplicates(["text_hash"])


def run_available_now(
    df: DataFrame, checkpoint_dir: str, query_name: str = "dedup_stream"
):
    """Memory-sink drain (single-drain use); see streaming.runners."""
    from .runners import drain_available_now

    return drain_available_now(df, checkpoint_dir, query_name, "append")


def run_available_now_to_dir(df: DataFrame, out_dir: str, checkpoint_dir: str) -> str:
    """Recoverable parquet-sink drain; see streaming.runners."""
    from .runners import drain_available_now_to_dir

    return drain_available_now_to_dir(df, out_dir, checkpoint_dir)
