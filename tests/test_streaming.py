"""Structured Streaming tests: streaming results == batch results for
the same operators (parity strategy, SURVEY §2.9)."""

import numpy as np
import pandas as pd
import pytest

from magmapandas_spark.streaming import streams

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch_events(spark):
    return streams.read_events_batch(spark, SF_DIR)


def normalize(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def test_tumbling_stream_matches_batch(spark, batch_events):
    stream = streams.read_events_stream(spark, SF_DIR)
    got = streams.run_stream_to_memory(
        streams.tumbling_counts(stream), "tumbling_test", "complete"
    ).toPandas()
    exp = streams.tumbling_counts(batch_events).toPandas()
    a, b = normalize(got), normalize(exp)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_session_windows_stream(spark, batch_events):
    stream = streams.read_events_stream(spark, SF_DIR)
    got = streams.run_stream_to_memory(
        streams.user_sessions(stream), "sessions_test", "complete"
    ).toPandas()
    exp = streams.user_sessions(batch_events).toPandas()
    a, b = normalize(got), normalize(exp)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # sessions are non-empty and bounded
    assert (a["n_events"] > 0).all()


def test_sliding_window_stream(spark, batch_events):
    stream = streams.read_events_stream(spark, SF_DIR)
    got = streams.run_stream_to_memory(
        streams.sliding_value_avg(stream), "sliding_test", "complete"
    ).toPandas()
    exp = streams.sliding_value_avg(batch_events).toPandas()
    assert len(got) == len(exp)
    a, b = normalize(got), normalize(exp)
    assert np.allclose(
        a["n_events"].to_numpy(float), b["n_events"].to_numpy(float)
    )


def test_dedup_within_watermark_stream(spark, batch_events):
    stream = streams.read_events_stream(spark, SF_DIR)
    got = streams.run_stream_to_memory(
        streams.dedup_within_watermark(stream), "dedup_test", "append"
    ).toPandas()
    exp_n = batch_events.dropDuplicates(["event_id"]).count()
    assert len(got) == exp_n
    assert got["event_id"].is_unique


def test_stateful_running_totals(spark, batch_events):
    stream = streams.read_events_stream(spark, SF_DIR)
    got = streams.run_stream_to_memory(
        streams.running_user_totals(stream), "state_test", "update"
    ).toPandas()
    # final state per user (last update) == batch per-user totals
    final = got.groupby("user_id").last().reset_index()
    exp = (
        batch_events.groupBy("user_id")
        .agg({"event_id": "count", "value": "sum"})
        .toPandas()
        .rename(
            columns={"count(event_id)": "n_events", "sum(value)": "total_value"}
        )
    )
    merged = final.merge(exp, on="user_id", suffixes=("_got", "_exp"))
    assert len(merged) == len(exp)
    assert (merged["n_events_got"] == merged["n_events_exp"]).all()
    assert np.allclose(
        merged["total_value_got"], merged["total_value_exp"], rtol=1e-9
    )
