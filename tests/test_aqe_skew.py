"""AQE skew-join: the session claims AQE handles skewed join keys
(README scale posture). This test plants a hot key and proves the
runtime re-plan actually splits it — ``SortMergeJoin(skew=true)`` with
an ``AQEShuffleRead … skewed`` child in the executed adaptive plan —
rather than trusting the config flag."""

import pytest
from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark):
    conf = spark.conf
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    )
    saved = {k: conf.get(k) for k in keys}
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # local-scale thresholds: the planted hot partition must clear both
    # the absolute floor and the factor-over-median test on COMPRESSED
    # shuffle sizes (md5 payload so compression can't hide the skew)
    conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "256k",
    )
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
    try:
        # 90% of 1M rows on one hot key, joined to a dim that must not
        # broadcast (skew handling applies to the sort-merge join)
        fact = spark.range(0, 1_000_000).select(
            F.when(F.col("id") % 10 > 0, F.lit(7))
            .otherwise(F.col("id") % 5000)
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("v"),
        )
        dim = spark.range(0, 5000).select(
            F.col("id").alias("k"), (F.col("id") + 100).alias("w")
        )
        joined = fact.join(dim, on="k").select(
            F.substring("v", 1, 4).alias("s"), "w"
        )
        rows = joined.collect()
        assert len(rows) == 1_000_000  # each key matches one dim row
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert "skewed" in plan, plan  # the AQEShuffleRead annotation
    finally:
        for k, v in saved.items():
            conf.set(k, v)
