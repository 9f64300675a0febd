"""Skew operators: salted plans must be byte-identical to their plain
equivalents (the whole point — only the shuffle fan-out changes)."""

import pytest
from pyspark.sql import functions as F

from magmapandas_spark.operators.skew import (
    salted_count_distinct,
    salted_join,
)

SF_DIR = "/root/testdata/sf0.01"


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain_inner(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        (F.col("l_partkey") % 5).alias("k"), "l_orderkey"
    )
    dim = (
        spark.range(4)
        .select(F.col("id").alias("k"))
        .withColumn("w", F.col("k") * 10)
    )
    plain = li.join(dim, on=["k"], how="inner")
    salted = salted_join(li, dim, on=["k"], how="inner", n_salt=4)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_matches_plain_left(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        (F.col("l_partkey") % 5).alias("k"), "l_orderkey"
    )
    # dim misses key 4 → left join must preserve unmatched left rows
    dim = spark.range(4).select(F.col("id").alias("k"), F.lit(1).alias("w"))
    plain = li.join(dim, on=["k"], how="left")
    salted = salted_join(li, dim, on=["k"], how="left", n_salt=4)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_rejects_right_outer(spark):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        salted_join(df, df, on=["k"], how="full")


def test_salted_count_distinct_exact(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    hot = li.select((F.col("l_partkey") % 3).alias("k"), "l_orderkey")
    plain = (
        hot.groupBy("k")
        .agg(F.count_distinct("l_orderkey").alias("n_distinct"))
    )
    salted = salted_count_distinct(hot, ["k"], "l_orderkey", n_salt=7)
    assert _sorted_rows(salted) == _sorted_rows(plain)
