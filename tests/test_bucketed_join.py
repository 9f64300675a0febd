"""Bucketed-table sink + co-located join: the 100 TB claim behind
write_bucketed_table is that joins on the bucket key need NO shuffle —
this test proves it on the physical plan, not just by running."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from magmapandas_spark.parse_io.writers import write_bucketed_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed_table(li, "bt_lineitem", ["l_orderkey"], n_buckets=8)
    write_bucketed_table(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "bt_orders", ["l_orderkey"], n_buckets=8,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bt_orders")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("bt_lineitem")
        b = spark.table("bt_orders")
        joined = a.join(b, on="l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both sides read bucketed files already hash-distributed on the
        # join key: EnsureRequirements must not insert any Exchange
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan

        # and values equal the plain (shuffled) join
        li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
            "l_orderkey", "l_quantity", "l_extendedprice"
        )
        orders = (
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .withColumnRenamed("o_orderkey", "l_orderkey")
        )
        exp = (
            li.join(orders, on="l_orderkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("q"),
            )
            .collect()[0]
        )
        got = (
            joined.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("q"),
            ).collect()[0]
        )
        assert got["n"] == exp["n"] > 0
        assert got["q"] == exp["q"]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregate_has_no_exchange(spark, bucketed_tables):
    """groupBy on the bucket key also rides the bucketing — no shuffle
    before the aggregate."""
    a = spark.table("bt_lineitem")
    agg = a.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
