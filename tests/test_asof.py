"""asof_join / range_join_binned semantics vs naive plans."""

import datetime as dt

from pyspark.sql import functions as F

from magmapandas_spark.operators.asof import asof_join, range_join_binned

BASE = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return BASE + dt.timedelta(minutes=minutes)


def test_asof_backward_and_forward(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(30)), (3, 2, _ts(5))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 1.0), (1, _ts(20), 2.0), (2, _ts(50), 9.0)],
        "user_id long, ts timestamp, v double",
    )
    back = {
        r["event_id"]: r["v_right"]
        for r in asof_join(left, right).collect()
    }
    # equal timestamps match (>=); user 2 has no prior row
    assert back == {1: 1.0, 2: 2.0, 3: None}
    fwd = {
        r["event_id"]: r["v_right"]
        for r in asof_join(left, right, direction="forward").collect()
    }
    assert fwd == {1: 1.0, 2: None, 3: 9.0}


def test_range_join_binned_matches_naive(spark):
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id", "user_id", "ts", "value")
    )
    left = events.limit(200)
    right = events.select("user_id", "ts", "value")
    w_us = 600_000_000  # 10 min
    binned = range_join_binned(left, right, window_us=w_us)
    l_us = F.unix_micros(F.col("l.ts").cast("timestamp"))
    r_us = F.unix_micros(F.col("r.ts").cast("timestamp"))
    naive = left.alias("l").join(
        right.alias("r"),
        (F.col("l.user_id") == F.col("r.user_id"))
        & (r_us >= l_us - F.lit(w_us))
        & (r_us < l_us),
    )
    got = {
        (r["event_id"], r["r_ts"]) for r in binned.collect()
    }
    want = {
        (r["event_id"], r["ts"])
        for r in naive.select("l.event_id", "r.ts").collect()
    }
    assert got == want and len(got) > 0
