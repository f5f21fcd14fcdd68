"""Scale-behavior tests: salted repartition balances skewed input,
two-tier oversize routing preserves output, Arrow batching contract."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from gocrd_spark import datagen
from gocrd_spark.pipeline import extract_pages


class TestSaltedBalance:
    def test_skewed_host_urls_balance(self, spark):
        """All urls share one host + sorted input (worst-case clustered
        layout): salted url-hash repartition must spread rows evenly."""
        n, parts = 4000, 16
        df = spark.range(n).select(
            F.concat(F.lit("https://one-big-host.test/page/"), F.col("id")).alias("url")
        )
        counts = (
            df.repartition(parts, F.xxhash64(F.col("url"), F.lit(42)))
            .withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .count()
            .collect()
        )
        sizes = [r["count"] for r in counts]
        assert len(sizes) == parts
        mean = n / parts
        assert max(sizes) < 1.4 * mean
        assert min(sizes) > 0.6 * mean

    def test_salt_changes_assignment(self, spark):
        df = spark.range(100).select(F.concat(F.lit("u"), F.col("id")).alias("url"))
        a = df.select("url", F.pmod(F.xxhash64("url", F.lit(1)), F.lit(16)).alias("g"))
        b = df.select("url", F.pmod(F.xxhash64("url", F.lit(2)), F.lit(16)).alias("g"))
        moved = a.join(b, "url").filter(a["g"] != b["g"]).count()
        assert moved > 50  # different salt -> different layout


class TestTwoTierRouting:
    @pytest.fixture(scope="class")
    def pages(self, spark):
        pdf = datagen.pages_pdf(80)
        df = spark.createDataFrame(pdf, schema=datagen.PAGES_SCHEMA)
        df.cache().count()
        return df

    def test_output_identical_to_single_tier(self, spark, pages):
        single = {
            r.url: (r.text, r.error)
            for r in extract_pages(pages, num_partitions=8).collect()
        }
        two_tier = {
            r.url: (r.text, r.error)
            for r in extract_pages(
                pages, num_partitions=8, oversize_bytes=10_000
            ).collect()
        }
        assert single == two_tier
        assert len(two_tier) == 80

    def test_null_html_survives_routing(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"url": ["a", "b"], "html": [None, b"<PcGts><Page/></PcGts>"]}),
            schema="url string, html binary",
        )
        rows = extract_pages(df, num_partitions=4, oversize_bytes=10).collect()
        assert len(rows) == 2  # null-payload row routed to small tier, not dropped

    def test_oversize_docs_route_to_their_own_exchange(self, spark, pages):
        plan = (
            extract_pages(pages, num_partitions=8, oversize_bytes=10_000)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # two kernel invocations, two exchanges, one union
        assert plan.count("MapInPandas") == 2
        assert "Union" in plan
