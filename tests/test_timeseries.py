"""Gap-fill semantics: observed hours keep their decimal-exact sums,
gaps interpolate linearly between the surrounding observations, span
edges are observed by construction."""

import datetime as dt

from magmapandas_spark.operators.timeseries import gap_fill


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_gap_fill_interpolates_linearly(spark):
    rows = [
        (1, _ts(0), 10.0),
        (1, _ts(0, 30), 2.0),   # hour 0 sum = 12
        (1, _ts(3), 24.0),      # hours 1,2 are gaps
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = (
        gap_fill(df)
        .orderBy("hour_id")
        .toPandas()
    )
    assert list(out["value"]) == [12.0, 16.0, 20.0, 24.0]
    assert list(out["filled"]) == [False, True, True, False]


def test_gap_fill_span_is_per_entity(spark):
    rows = [
        (1, _ts(0), 1.0), (1, _ts(2), 3.0),
        (2, _ts(5), 7.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = gap_fill(df).toPandas()
    assert len(out[out["user_id"] == 1]) == 3   # hours 0..2
    assert len(out[out["user_id"] == 2]) == 1   # single observed hour
    assert not out[out["user_id"] == 2]["filled"].iloc[0]


def test_gap_fill_null_values_are_not_observations(spark):
    """An hour whose only events carry NULL values must be a GAP (or
    outside the span), never a NULL 'observation' — a NULL at a span
    edge would leave interpolation without a neighbor and emit NULL
    rows into the regularized series."""
    rows = [
        (1, _ts(0), None),     # NULL at would-be span edge
        (1, _ts(1), 10.0),
        (1, _ts(2), None),     # interior all-NULL hour
        (1, _ts(3), 30.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = gap_fill(df).orderBy("hour_id").toPandas()
    # span starts at the first NON-NULL observation (hour 1)
    assert list(out["hour_id"] % 24) == [1, 2, 3]
    assert list(out["value"]) == [10.0, 20.0, 30.0]
    assert not out["value"].isna().any()
