"""Structured Streaming surface of the events analytics.

The batch pipeline's windowed aggregation (``__spark_entry__._q_events_window``)
re-expressed as a stream: file source -> watermark -> tumbling window ->
sink. The reference has no streaming (batch library, SURVEY.md §2.2);
this exists so the engine covers the streaming checklist row for event
tables at scale: late rows beyond the watermark are dropped, state is
bounded by (watermark horizon / window size) per event_type.

Run modes:
- ``trigger=availableNow`` (tests, backfill): drains everything present,
  exactly-once per checkpoint;
- continuous micro-batches in production (same code, different trigger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_counts_stream(
    spark: SparkSession,
    input_dir: str,
    watermark: str = "10 minutes",
    window: str = "5 minutes",
    fixed_per_event: bool = False,
) -> DataFrame:
    """Streaming tumbling-window counts per event_type.

    ``fixed_per_event=True`` fixed-points each value BEFORE summing
    (sum of per-event round(value*1e6) BIGINTs) instead of rounding the
    double sum once at the end: the result is then independent of
    partial-aggregation and micro-batch state-merge ORDER — the form an
    external engine can reproduce exactly, used by the oracle-checked
    ``events_window_stream`` driver query. Default False keeps the
    batch ``events_window`` emission shape."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    if fixed_per_event:
        sum_e6 = F.sum(
            F.round(F.col("value") * 1_000_000).cast("long")
        ).alias("sum_value_e6")
    else:
        sum_e6 = (
            F.round(F.sum("value") * 1_000_000).cast("long").alias("sum_value_e6")
        )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), sum_e6)
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_e6",
        )
    )


def run_available_now(
    df: DataFrame, checkpoint_dir: str, query_name: str = "events_window"
):
    """Complete-mode memory-sink drain; see streaming.runners."""
    from .runners import drain_available_now

    return drain_available_now(df, checkpoint_dir, query_name, "complete")
