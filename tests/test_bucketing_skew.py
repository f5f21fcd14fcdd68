"""Bucketed co-located joins (zero-Exchange plan) and explicit
skew-join salting (row-identical output)."""

from pyspark.sql import functions as F


class TestBucketedJoin:
    def test_no_exchange_in_bucketed_join(self, spark, tmp_path):
        from gocrd_spark.operators.bucketing import bucketed_join, write_bucketed

        # spark.sql.warehouse.dir is static config — tables land in the
        # default ./spark-warehouse (gitignored); clear any leftovers from
        # a previously crashed run (dir existing without a catalog entry
        # fails saveAsTable with LOCATION_ALREADY_EXISTS)
        import shutil

        for table in ("orders_b", "lineitem_b"):
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            shutil.rmtree(f"spark-warehouse/{table}", ignore_errors=True)
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        write_bucketed(
            orders.withColumnRenamed("o_orderkey", "orderkey"),
            "orders_b", "orderkey", n_buckets=8,
        )
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "orderkey"),
            "lineitem_b", "orderkey", n_buckets=8,
        )
        # force a sort-merge plan (tiny test tables would broadcast, which
        # has its own BroadcastExchange — the claim is about SHUFFLE)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_join(spark, "orders_b", "lineitem_b", "orderkey")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange hashpartitioning" not in plan  # no shuffle either side
            assert "SortMergeJoin" in plan
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        # correctness vs the plain (shuffled) join
        plain = orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        ).count()
        assert joined.count() == plain
        spark.sql("DROP TABLE orders_b")
        spark.sql("DROP TABLE lineitem_b")


class TestSaltedJoin:
    def test_row_identical_to_plain_join(self, spark):
        from gocrd_spark.operators.skew import salted_join

        # heavily skewed big side: 90% of rows share one key
        big = spark.range(2000).select(
            F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        small = spark.range(50).select(
            F.col("id").alias("k"), (F.col("id") * 100).alias("v")
        )
        plain = big.join(small, "k").select("k", "payload", "v")
        salted = salted_join(big, small, "k", salt_buckets=8).select(
            "k", "payload", "v"
        )
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        )

    def test_left_join_keeps_unmatched(self, spark):
        from gocrd_spark.operators.skew import salted_join

        big = spark.range(100).select(F.col("id").alias("k"))
        small = spark.range(10).select(F.col("id").alias("k"), F.lit("x").alias("v"))
        out = salted_join(big, small, "k", salt_buckets=4, how="left")
        assert out.count() == 100
        assert out.filter("v IS NULL").count() == 90
