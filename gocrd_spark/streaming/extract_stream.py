"""Incremental extraction over a landing directory of crawl shards —
the Structured-Streaming face of the batch extraction pipeline.

A recurring crawl drops new page shards (parquet; the sandbox stand-in
for Iceberg snapshot appends) into a directory. ``extract_pages_stream``
runs the SAME Arrow batch kernel plan as ``pipeline.extract_pages`` —
the extraction map is stateless and narrow, so it lifts unchanged onto
a streaming DataFrame: each micro-batch is a column-pruned scan of the
newly-arrived files followed by ``mapInPandas``, no state store, no
watermark needed. The parquet sink + checkpoint give end-to-end
exactly-once file processing: a file is extracted once per checkpoint
lineage, a re-drain after failure resumes from the manifest instead of
re-extracting (the streaming twin of the batch job's per-partition
commit log, SURVEY.md §4.4).

Scale: identical to batch — the kernel cost dominates, per-micro-batch
parallelism is the file-split count; ``maxFilesPerTrigger`` bounds
micro-batch size so a backlog burst cannot OOM a small cluster.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from gocrd_spark.datagen import PAGES_SCHEMA


def extract_pages_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Streaming (url, text, spans, error) over a pages landing dir."""
    from gocrd_spark.pipeline import extract_pages

    reader = spark.readStream.schema(PAGES_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.load(input_dir)
    # shuffle-free narrow plan (num_partitions=None): streaming batches
    # are already file-granular; a blanket repartition would force a
    # per-micro-batch payload shuffle
    return extract_pages(pages)


def run_extract_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: Optional[int] = None,
) -> str:
    """Drain all currently-available shards into a parquet sink and
    block; repeated calls with the same checkpoint extract only files
    not yet in the checkpoint manifest (incremental catch-up run)."""
    from gocrd_spark.streaming.runners import drain_available_now_to_dir

    return drain_available_now_to_dir(
        extract_pages_stream(spark, input_dir, max_files_per_trigger),
        out_dir,
        checkpoint_dir,
    )
