"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState`` — the escape hatch for semantics built-in
streaming aggregations can't express (arbitrary per-key state machines).

State per user: (last event ts epoch, sessions so far, events so far).
A new session starts when the gap to the previous event exceeds
``gap_seconds``. Output mode 'update': one row per user per micro-batch
with the running totals.

Scale note: state size is O(distinct users) x 24 bytes; the groupBy
shuffles on user_id once and the state store is partition-local
thereafter — the standard Structured Streaming stateful layout.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from .windowed import EVENTS_SCHEMA

STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _sessionize_factory(gap_seconds: int):
    def update(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        # A group's micro-batch rows arrive as MULTIPLE Arrow chunks in
        # shuffle order — sorting per chunk is not enough (a later chunk
        # can hold earlier events and regress last_ts). Concatenate and
        # sort ONCE per group before folding.
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts in pdf["ts"].astype("int64") // 10**9:
            ts = int(ts)
            if last_ts is None or ts - last_ts > gap_seconds:
                n_sessions += 1
            last_ts = ts
            n_events += 1
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return update


def sessionize_stream(
    spark: SparkSession, input_dir: str, gap_seconds: int = 1800
) -> DataFrame:
    """Streaming per-user session counts over a parquet file source."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    return (
        stream.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_factory(gap_seconds),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_sessionize_available_now(
    df: DataFrame, checkpoint_dir: str, output_dir: str
) -> None:
    """Drain available input through a foreachBatch parquet sink (the
    memory sink cannot recover from a checkpoint; foreachBatch can, so
    repeated drains resume the state store). Each micro-batch appends
    update rows stamped with its batch_id; the latest batch per user is
    the current state (see :func:`read_latest_sessions`)."""
    from pyspark.sql import functions as F

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(output_dir)
        )

    q = (
        df.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_latest_sessions(spark: SparkSession, output_dir: str) -> DataFrame:
    """Current per-user totals: the row from the highest batch_id per user."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.read.parquet(output_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("batch_id").desc())
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "n_sessions", "n_events")
    )
