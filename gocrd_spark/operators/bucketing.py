"""Bucketed co-located joins — shuffle elimination for repeated
fact-fact joins.

At crawl scale the orders ⋈ lineitem (or pages ⋈ extracted) join key is
fixed; writing both sides bucketed by that key lets every subsequent
join read co-located buckets with NO exchange on either side (the scan
reports the bucket spec as its output partitioning and Catalyst drops
the shuffle). This is the standard amortization: pay one shuffle at
write time, join for free forever after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by the join key
    via the session catalog (saveAsTable — bucketing metadata lives in
    the catalog, plain parquet paths cannot carry it)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket
    count — planned as SortMergeJoin with ZERO Exchange operators."""
    return spark.table(left_table).join(spark.table(right_table), on)
