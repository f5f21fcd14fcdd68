"""Shared availableNow drain helpers for the streaming surfaces
(windowed aggregation, stateful sessions, streaming dedup) — one
implementation of the trigger/checkpoint/sink plumbing so drain
semantics can't silently diverge between modules."""

from __future__ import annotations

from pyspark.sql import DataFrame


def drain_available_now(
    df: DataFrame,
    checkpoint_dir: str,
    query_name: str,
    output_mode: str = "append",
) -> str:
    """Drain all currently-available input into an in-memory sink and
    block until done. Single-drain use only — the memory sink cannot
    RESUME from a checkpoint. Returns the sink table name."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return query_name


def drain_available_now_to_dir(
    df: DataFrame, out_dir: str, checkpoint_dir: str
) -> str:
    """Drain into a parquet sink — the recoverable shape: repeated drains
    against the same checkpoint resume state (watermark, dedup keys) and
    append only new output. Returns the output dir."""
    q = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out_dir
