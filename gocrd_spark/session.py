"""SparkSession construction with the engine's scale defaults.

Tuned for the document-extraction workload (SURVEY.md §4.2-§4.3):
rows are megabyte-scale XML payloads, so Arrow batches are capped low;
AQE handles post-shuffle coalescing and skew splits.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    master: Optional[str] = None,
    app_name: str = "gocrd-spark",
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    arrow_batch_rows: int = 64,
    extra: Optional[dict[str, str]] = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    - ``arrow_batch_rows`` caps ``maxRecordsPerBatch``: extraction rows
      carry whole documents, so a 10k-row default Arrow batch would hold
      gigabytes at crawl scale (SURVEY.md §4.2 "tuned down because rows
      are megabyte-scale documents").
    - AQE on: coalesces small post-shuffle partitions and splits skewed
      ones at runtime — the salted url-hash shuffle benefits directly.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # shuffle/spill to tmpfs when available: this VM's root disk is slow and
    # the salted-repartition shuffle is I/O-bound through it (a real cluster
    # would use local NVMe); /dev/shm holds the whole working set here
    local_dir = "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else None
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # pin UTC so timestamp truncation/casts match the DuckDB oracles'
        # naive-UTC semantics on any host timezone (engine-parity contract)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        # parquet source tuning for the fat-binary-column layout
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for key, value in (extra or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


def stop_spark() -> None:
    session = SparkSession.getActiveSession()
    if session is not None:
        session.stop()
