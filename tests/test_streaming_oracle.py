"""Streaming-oracle parity (round-4 hardening): every streaming
operator in streams.py runs via ``foreachBatch`` into PARQUET over the
sf0.01 events table and must equal its batch twin EXACTLY.

This is stronger than the memory-sink tests in test_streaming.py in
two ways: (a) the sink is the production-shaped path (foreachBatch →
parquet), and (b) the scale is the same sf0.01 slice the DuckDB
correctness gate verifies the batch twins against — so streaming
output is transitively oracle-checked: stream == batch == DuckDB.

Equality discipline: counts, event ids, window bounds and decimal-sum
columns compare EXACTLY (the operators are written so state-store
merge order cannot perturb them); nothing here needs a tolerance.
"""

import os
import shutil
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from magmapandas_spark.streaming import streams

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def batch_events(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return streams.read_events_batch(spark, SF_DIR)


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def run_foreach_batch_parquet(
    stream_df, output_mode: str, spark, mode_per_batch: str
):
    """Drive a stream to completion (availableNow) writing every
    micro-batch to parquet via foreachBatch; returns the final table.

    ``mode_per_batch``: 'overwrite' for complete-mode aggregations
    (each batch re-emits the full state), 'append' for append/update
    streams. A ``__batch_id`` column records micro-batch provenance so
    update-mode consumers can select the latest state per key."""
    out_dir = tempfile.mkdtemp(prefix="stream_oracle_")
    path = os.path.join(out_dir, "out.parquet")

    def sink(batch_df, batch_id):
        import pyspark.sql.functions as F

        batch_df.withColumn("__batch_id", F.lit(batch_id)).write.mode(
            mode_per_batch
        ).parquet(path)

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    result = spark.read.parquet(path).toPandas()
    shutil.rmtree(out_dir, ignore_errors=True)
    return result


def test_tumbling_counts_foreachbatch_exact(spark, batch_events):
    stream = streams.read_events_stream(spark, SF_DIR)
    got = run_foreach_batch_parquet(
        streams.tumbling_counts(stream), "complete", spark, "overwrite"
    ).drop(columns="__batch_id")
    exp = streams.tumbling_counts(batch_events).toPandas()
    pd.testing.assert_frame_equal(
        normalize(got), normalize(exp), check_dtype=False
    )


def test_sliding_value_avg_foreachbatch_exact(spark, batch_events):
    stream = streams.read_events_stream(spark, SF_DIR)
    got = run_foreach_batch_parquet(
        streams.sliding_value_avg(stream), "complete", spark, "overwrite"
    ).drop(columns="__batch_id")
    exp = streams.sliding_value_avg(batch_events).toPandas()
    # decimal-sum/count avg: bit-exact regardless of state merge order
    pd.testing.assert_frame_equal(
        normalize(got), normalize(exp), check_dtype=False
    )


def test_user_sessions_foreachbatch_exact(spark, batch_events):
    stream = streams.read_events_stream(spark, SF_DIR)
    got = run_foreach_batch_parquet(
        streams.user_sessions(stream), "complete", spark, "overwrite"
    ).drop(columns="__batch_id")
    exp = streams.user_sessions(batch_events).toPandas()
    pd.testing.assert_frame_equal(
        normalize(got), normalize(exp), check_dtype=False
    )


def test_dedup_within_watermark_foreachbatch_exact(spark, batch_events):
    stream = streams.read_events_stream(spark, SF_DIR)
    got = run_foreach_batch_parquet(
        streams.dedup_within_watermark(stream), "append", spark, "append"
    ).drop(columns="__batch_id")
    exp = streams.dedup_within_watermark(batch_events).toPandas()
    assert len(got) == len(exp)
    assert got["event_id"].is_unique
    assert set(got["event_id"]) == set(exp["event_id"])


def test_running_user_totals_foreachbatch_exact(spark, batch_events):
    import pyspark.sql.functions as F

    stream = streams.read_events_stream(spark, SF_DIR)
    got = run_foreach_batch_parquet(
        streams.running_user_totals(stream), "update", spark, "append"
    )
    # latest state per user across micro-batches
    final = (
        got.sort_values("__batch_id")
        .groupby("user_id")
        .last()
        .reset_index()
        .drop(columns="__batch_id")
    )
    exp = (
        batch_events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .toPandas()
    )
    merged = final.merge(exp, on="user_id", suffixes=("_got", "_exp"))
    assert len(merged) == len(exp) == len(final)
    assert (merged["n_events_got"] == merged["n_events_exp"]).all()
    # the stateful UDF accumulates floats per batch; with availableNow
    # over one parquet file there is a single batch, so the per-user
    # sum is the same left-to-right pandas sum the batch decimal total
    # rounds to — compare at full float64 resolution
    assert (
        (merged["total_value_got"] - merged["total_value_exp"]).abs()
        < 1e-9
    ).all()


def test_scrub_documents_stream_matches_batch(spark):
    """Round-5 streaming twin: the PII/quality scrub projection over a
    document stream equals the batch scrub exactly (stateless map —
    micro-batch boundaries cannot perturb it)."""
    stream_docs = streams.read_documents_stream(spark, SF_DIR)
    got = run_foreach_batch_parquet(
        streams.scrub_documents(stream_docs), "append", spark, "append"
    ).drop(columns=["__batch_id"], errors="ignore")
    batch_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    exp = streams.scrub_documents(batch_docs).toPandas()
    pd.testing.assert_frame_equal(normalize(got), normalize(exp))


def test_scrub_documents_is_stateless(spark):
    """The scrub must stay a single projection: a self-join of two
    stream projections would plan a StreamingSymmetricHashJoin that
    (with no watermark) buffers every input row in the state store
    forever. Guard the plan, not just the results."""
    plan = (
        streams.scrub_documents(
            streams.read_documents_stream(spark, SF_DIR)
        )
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "Join" not in plan


# ---------------------------------------------------------------------
# Round 6: streaming mergeable sketches — the final merged state must
# equal the batch sketch over the union EXACTLY (register max / counter
# sum are order-independent), across REAL multiple micro-batches
# (maxFilesPerTrigger=1 over a multi-file stage).
# ---------------------------------------------------------------------


def _multi_file_stage(spark, df, n_files: int):
    """Write df as n_files parquet files; return the directory (each
    file becomes one micro-batch under maxFilesPerTrigger=1)."""
    d = tempfile.mkdtemp(prefix="stream_sketch_src_")
    df.repartition(n_files).write.mode("overwrite").parquet(d)
    return d


def test_streaming_hll_registers_match_batch(spark):
    from magmapandas_spark.operators.sketches import (
        hll_estimate_from_registers,
        hll_register_relation,
    )
    from magmapandas_spark.streaming.streams import streaming_hll_ingest

    batch = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type", "user_id"
    )
    src = _multi_file_stage(spark, batch, 3)
    out_dir = tempfile.mkdtemp(prefix="stream_hll_")
    state = os.path.join(out_dir, "state.parquet")
    stream = spark.readStream.schema(
        "event_type string, user_id long"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    streaming_hll_ingest(
        stream, state, os.path.join(out_dir, "ckpt"),
    )
    got_regs = normalize(spark.read.parquet(state).toPandas())
    exp_regs = normalize(
        hll_register_relation(batch, "event_type", "user_id").toPandas()
    )
    pd.testing.assert_frame_equal(got_regs, exp_regs, check_dtype=False)
    # and the finalized estimates agree bit-for-bit with the batch twin
    got_est = normalize(
        hll_estimate_from_registers(
            spark.read.parquet(state), "event_type"
        ).toPandas()
    )
    exp_est = normalize(
        hll_estimate_from_registers(
            hll_register_relation(batch, "event_type", "user_id"),
            "event_type",
        ).toPandas()
    )
    pd.testing.assert_frame_equal(got_est, exp_est, check_dtype=False)
    for d in (src, out_dir):
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_cms_counters_match_batch(spark):
    from magmapandas_spark.operators.sketches import cms_counter_relation
    from magmapandas_spark.streaming.streams import streaming_cms_ingest

    batch = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    src = _multi_file_stage(spark, batch, 3)
    out_dir = tempfile.mkdtemp(prefix="stream_cms_")
    state = os.path.join(out_dir, "state.parquet")
    stream = spark.readStream.schema(
        "doc_id long, text string"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    streaming_cms_ingest(
        stream, state, os.path.join(out_dir, "ckpt"),
    )
    got = normalize(spark.read.parquet(state).toPandas())
    exp = normalize(cms_counter_relation(batch).toPandas())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the counter table is the sketch: d·w rows max, regardless of
    # how many batches fed it
    assert len(got) <= 4 * 8
    for d in (src, out_dir):
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_histogram_matches_batch(spark):
    from magmapandas_spark.operators.quantiles import (
        fixed_histogram_relation,
    )
    from magmapandas_spark.streaming.streams import (
        streaming_histogram_ingest,
    )

    batch = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type", "value"
    )
    src = _multi_file_stage(spark, batch, 3)
    out_dir = tempfile.mkdtemp(prefix="stream_hist_")
    state = os.path.join(out_dir, "state.parquet")
    stream = spark.readStream.schema(
        "event_type string, value double"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    streaming_histogram_ingest(
        stream, state, os.path.join(out_dir, "ckpt"),
        lo=0.0, hi=100.0, n_bins=64,
    )
    got = normalize(spark.read.parquet(state).toPandas())
    exp = normalize(
        fixed_histogram_relation(
            batch, "event_type", "value", 0.0, 100.0, 64
        ).toPandas()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # total mass is exact: every non-null value lands in exactly one bin
    assert got["cnt"].sum() == batch.filter("value IS NOT NULL").count()
    for d in (src, out_dir):
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_stats_match_batch(spark):
    """Incremental ANALYZE: the folded per-column stats state after N
    micro-batches equals one batch pass over the union exactly —
    counts by integer sum, extrema by min/max, so batch boundaries
    cannot perturb anything. Cross-checked against table_stats too
    (null counts and extrema must agree with the one-scan ANALYZE)."""
    from magmapandas_spark.operators.stats import (
        mergeable_stats_relation,
        table_stats,
    )
    from magmapandas_spark.streaming.streams import (
        streaming_stats_ingest,
    )

    batch = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"
    )
    src = _multi_file_stage(spark, batch, 3)
    out_dir = tempfile.mkdtemp(prefix="stream_stats_")
    state = os.path.join(out_dir, "state.parquet")
    stream = spark.readStream.schema(batch.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    streaming_stats_ingest(stream, state, os.path.join(out_dir, "ckpt"))
    got = normalize(spark.read.parquet(state).toPandas())
    exp = normalize(mergeable_stats_relation(batch).toPandas())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # transitivity with the gate-checked one-scan ANALYZE: null
    # counts and rounded extrema agree per column
    ts = {r["col"]: r for r in table_stats(batch).collect()}
    for r in spark.read.parquet(state).collect():
        assert r["null_count"] == ts[r["col"]]["null_count"]
        if r["min_num"] is not None:
            assert round(r["min_num"], 4) == ts[r["col"]]["min_num"]
            assert round(r["max_num"], 4) == ts[r["col"]]["max_num"]
        if r["min_str"] is not None:
            assert r["min_str"] == ts[r["col"]]["min_str"]
            assert r["max_str"] == ts[r["col"]]["max_str"]
    for d in (src, out_dir):
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_index_matches_batch(spark):
    """Incremental inverted index: after N micro-batches of disjoint
    documents, the folded state equals the one-pass batch build over
    the union EXACTLY — counts by sum, bottom-k posting arrays by the
    exact bottom-k merge law."""
    from magmapandas_spark.operators.indexing import (
        inverted_index_relation,
        serialize_postings,
    )
    from magmapandas_spark.streaming.streams import (
        streaming_index_ingest,
    )

    batch = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    src = _multi_file_stage(spark, batch, 4)
    out_dir = tempfile.mkdtemp(prefix="stream_idx_")
    state = os.path.join(out_dir, "state.parquet")
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    streaming_index_ingest(stream, state, os.path.join(out_dir, "ckpt"),
                           max_postings=50)
    got = normalize(
        serialize_postings(spark.read.parquet(state)).toPandas()
    )
    exp = normalize(
        serialize_postings(
            inverted_index_relation(batch, max_postings=50)
        ).toPandas()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    for d in (src, out_dir):
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_reservoir_matches_batch(spark):
    """Incremental A-ES reservoir: after N micro-batches the folded
    ≤k-row state equals the batch weighted_sample over the union
    exactly (the merge law: global top-k == re-truncated union of
    per-part top-ks; priorities are stateless md5-uniforms)."""
    from magmapandas_spark.operators.curation import weighted_sample
    from magmapandas_spark.streaming.streams import (
        streaming_reservoir_ingest,
    )

    batch = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    src = _multi_file_stage(spark, batch, 4)
    out_dir = tempfile.mkdtemp(prefix="stream_res_")
    state = os.path.join(out_dir, "state.parquet")
    stream = spark.readStream.schema("doc_id long, n_chars long").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    streaming_reservoir_ingest(
        stream, state, os.path.join(out_dir, "ckpt"), k=50
    )
    got = normalize(spark.read.parquet(state).toPandas())
    exp = normalize(weighted_sample(batch, "n_chars", 50).toPandas())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    for d in (src, out_dir):
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_validation_matches_batch(spark):
    """Ingest-time expectations: per-batch row-level violation counts
    folded by integer sum equal one batch validation over the union
    exactly."""
    from magmapandas_spark.operators.validation import (
        accepted_values,
        in_range,
        not_null,
        validate,
    )
    from magmapandas_spark.streaming.streams import (
        streaming_validation_ingest,
    )

    rules = [
        not_null("l_shipdate"),
        in_range("l_tax", 0.0, 0.05),
        accepted_values("l_returnflag", ["A", "N", "R"]),
    ]
    batch = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_shipdate", "l_tax", "l_returnflag"
    )
    src = _multi_file_stage(spark, batch, 3)
    out_dir = tempfile.mkdtemp(prefix="stream_val_")
    state = os.path.join(out_dir, "state.parquet")
    stream = spark.readStream.schema(batch.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    streaming_validation_ingest(
        stream, state, os.path.join(out_dir, "ckpt"), rules
    )
    got = normalize(spark.read.parquet(state).toPandas())
    exp = normalize(
        validate(batch, rules).select("rule", "n_violations").toPandas()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    for d in (src, out_dir):
        shutil.rmtree(d, ignore_errors=True)


def _time_ordered_stage(spark, df, n_files: int, order_cols):
    """Write df as n_files parquet files in event-time order (one
    slice per file, written sequentially so the file source replays
    them in order) — the in-order-ingest regime the transitions fold
    contracts for."""
    import time as _time

    d = tempfile.mkdtemp(prefix="stream_ordered_src_")
    pdf = df.toPandas().sort_values(order_cols).reset_index(drop=True)
    bounds = [round(i * len(pdf) / n_files) for i in range(n_files + 1)]
    for i in range(n_files):
        sl = pdf.iloc[bounds[i]:bounds[i + 1]]
        spark.createDataFrame(sl).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        _time.sleep(1.1)  # distinct mtimes -> deterministic replay order
    return d


def test_streaming_transitions_match_batch(spark):
    from magmapandas_spark.operators.analytics import event_transitions
    from magmapandas_spark.streaming.streams import (
        finalize_streaming_transitions,
        streaming_transitions_ingest,
    )

    batch = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", "event_type", "ts", "event_id"
    )
    src = _time_ordered_stage(spark, batch, 3, ["ts", "event_id"])
    out_dir = tempfile.mkdtemp(prefix="stream_trans_")
    stream = spark.readStream.schema(
        "user_id long, event_type string, ts timestamp, event_id long"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    streaming_transitions_ingest(
        stream, out_dir, os.path.join(out_dir, "ckpt"),
    )
    got = normalize(
        finalize_streaming_transitions(spark, out_dir).toPandas()
    )
    exp = normalize(event_transitions(batch).toPandas())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    for d in (src, out_dir):
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_cdc_merge_matches_sequential_batch(spark):
    """CDC apply over a stream: the final state table equals the
    sequential batch fold of the same compacted deltas — including
    within-batch duplicate keys (last-writer-wins by seq), cross-batch
    overwrites, deletes, and inserts."""
    import time as _time

    from magmapandas_spark.operators.maintenance import merge_upsert
    from magmapandas_spark.streaming.streams import (
        compact_cdc_batch,
        streaming_merge_ingest,
    )

    base = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .filter(F.col("o_orderkey") < 2000)
    )
    # three ordered CDC slices with: updates overlapping across
    # batches (k%3 keys touched in every batch), a within-batch
    # duplicate (seq decides), deletes in batch 1, re-inserts of a
    # deleted key in batch 2, and brand-new keys per batch
    def slice_df(b):
        upd = (
            base.filter(F.col("o_orderkey") % 3 == 0)
            .select(
                "o_orderkey",
                F.lit(f"B{b}").alias("o_orderstatus"),
                (F.col("o_totalprice") + b * 1000).alias("o_totalprice"),
                F.lit(False).alias("_delete"),
                F.lit(2 * b).alias("seq"),
            )
        )
        dup = upd.filter(F.col("o_orderkey") % 9 == 0).select(
            "o_orderkey",
            F.lit(f"D{b}").alias("o_orderstatus"),
            (F.col("o_totalprice") + 7).alias("o_totalprice"),
            F.lit(False).alias("_delete"),
            F.lit(2 * b + 1).alias("seq"),  # wins within the batch
        )
        dele = (
            base.filter(F.col("o_orderkey") % 5 == (1 if b == 1 else 99))
            .select(
                "o_orderkey",
                F.lit("X").alias("o_orderstatus"),
                F.lit(0.0).alias("o_totalprice"),
                F.lit(True).alias("_delete"),
                F.lit(2 * b).alias("seq"),
            )
        )
        ins = spark.range(5).select(
            (F.col("id") + 10_000 + 100 * b).alias("o_orderkey"),
            F.lit("I").alias("o_orderstatus"),
            (F.col("id") + b).cast("double").alias("o_totalprice"),
            F.lit(False).alias("_delete"),
            F.lit(2 * b).alias("seq"),
        )
        return upd.unionByName(dup).unionByName(dele).unionByName(ins)

    slices = [slice_df(b) for b in range(3)]

    src = tempfile.mkdtemp(prefix="stream_cdc_src_")
    for s in slices:
        s.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)  # distinct mtimes -> in-order replay

    out = tempfile.mkdtemp(prefix="stream_cdc_state_")
    state_path = os.path.join(out, "state.parquet")
    stream = (
        spark.readStream.schema(
            "o_orderkey long, o_orderstatus string, o_totalprice double,"
            " _delete boolean, seq int"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    streaming_merge_ingest(
        stream, base, state_path, os.path.join(out, "ckpt"),
        key_col="o_orderkey", delete_col="_delete", order_col="seq",
    )
    got = normalize(spark.read.parquet(state_path).toPandas())

    exp_state = base
    for s in slices:
        delta = compact_cdc_batch(s, "o_orderkey", "seq").drop("seq")
        exp_state = merge_upsert(
            exp_state, delta, "o_orderkey", delete_col="_delete"
        )
    exp = normalize(exp_state.toPandas())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the within-batch duplicate keys must carry the seq-winner row
    winners = {
        r["o_orderkey"]: r["o_orderstatus"]
        for r in spark.read.parquet(state_path)
        .filter((F.col("o_orderkey") % 9 == 0) & (F.col("o_orderkey") % 5 != 1))
        .filter(F.col("o_orderkey") < 2000)
        .collect()
    }
    assert winners and all(s == "D2" for s in winners.values())
    for d in (src, out):
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_ewma_bit_equal_to_batch(spark):
    """Streamed EWMA doubles are bit-identical to the batch window's
    (same literals, same fold order), across micro-batch boundaries
    that split user series."""
    from magmapandas_spark.operators.robust import ewma_smooth
    from magmapandas_spark.streaming.streams import (
        run_stream_to_memory,
        streaming_ewma,
    )

    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter("user_id % 97 = 0")
        .select("user_id", "ts", "event_id", "value")
    )
    src = _time_ordered_stage(spark, batch, 3, ["ts", "event_id"])
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, event_id long, value double"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    got = (
        run_stream_to_memory(
            streaming_ewma(stream), "ewma_stream", output_mode="update"
        )
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    exp = (
        ewma_smooth(batch)
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["event_id"] == exp["event_id"]).all()
    # BIT equality, not approx
    assert (
        got["ewma"].to_numpy() == exp["ewma"].to_numpy()
    ).all()
    shutil.rmtree(src, ignore_errors=True)


def test_streaming_cusum_matches_batch(spark):
    """Merged hourly-count state finalizes to EXACTLY the batch CUSUM
    report, across micro-batch boundaries that split hours."""
    from magmapandas_spark.operators.timeseries import cusum_hourly
    from magmapandas_spark.streaming.streams import (
        finalize_streaming_cusum,
        streaming_cusum_ingest,
    )

    batch = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type", "ts"
    )
    src = _multi_file_stage(spark, batch, 3)
    out_dir = tempfile.mkdtemp(prefix="stream_cusum_")
    state = os.path.join(out_dir, "state.parquet")
    stream = spark.readStream.schema(
        "event_type string, ts timestamp"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    streaming_cusum_ingest(
        stream, state, os.path.join(out_dir, "ckpt")
    )
    got = normalize(finalize_streaming_cusum(spark, state).toPandas())
    exp = normalize(
        cusum_hourly(
            spark.read.parquet(f"{SF_DIR}/events.parquet")
        ).toPandas()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    for d in (src, out_dir):
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_seasonal_matches_batch(spark):
    """Merged dow×hour cell state finalizes to EXACTLY the batch
    seasonal profile, across micro-batch boundaries that split
    cells."""
    from magmapandas_spark.operators.timeseries import q_seasonal_profile
    from magmapandas_spark.streaming.streams import (
        finalize_streaming_seasonal,
        streaming_seasonal_ingest,
    )

    batch = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "ts", "value"
    )
    src = _multi_file_stage(spark, batch, 3)
    out_dir = tempfile.mkdtemp(prefix="stream_seasonal_")
    state = os.path.join(out_dir, "state.parquet")
    stream = spark.readStream.schema(
        "ts timestamp, value double"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    streaming_seasonal_ingest(
        stream, state, os.path.join(out_dir, "ckpt")
    )
    got = normalize(finalize_streaming_seasonal(spark, state).toPandas())
    exp = normalize(q_seasonal_profile(spark, SF_DIR).toPandas())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    for d in (src, out_dir):
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_psi_matches_batch(spark):
    """B-side bin counts folded across micro-batches finalize to
    EXACTLY the batch PSI report (same doubles, same rounding)."""
    from pyspark.sql import functions as F

    from magmapandas_spark.operators.stats import q_psi_drift
    from magmapandas_spark.streaming.streams import (
        finalize_streaming_psi,
        streaming_psi_ingest,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    mn, mx = docs.agg(F.min("n_chars"), F.max("n_chars")).first()
    b = docs.filter(
        ~((F.col("doc_id") % 3 == 0) & (F.col("n_chars") >= 800))
    )
    src = _multi_file_stage(spark, b, 3)
    out_dir = tempfile.mkdtemp(prefix="stream_psi_")
    state = os.path.join(out_dir, "state.parquet")
    stream = spark.readStream.schema(
        "doc_id bigint, n_chars bigint"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    streaming_psi_ingest(
        stream, state, os.path.join(out_dir, "ckpt"), int(mn), int(mx)
    )
    if mx == mn:
        bin_c = F.lit(0)
    else:
        bin_c = F.least(
            F.expr(f"(n_chars - {mn}) * 10 div ({mx} - {mn})"), F.lit(9)
        )
    baseline = docs.groupBy(bin_c.cast("long").alias("bin")).agg(
        F.count(F.lit(1)).alias("c_a")
    )
    got = normalize(
        finalize_streaming_psi(spark, state, baseline).toPandas()
    )
    exp = normalize(q_psi_drift(spark, SF_DIR).toPandas())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    for d in (src, out_dir):
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_funnel_matches_batch(spark):
    """The streaming corpus-build funnel (cross-batch prefix-hash
    keep-first + fixed packed Bloom filter + additive counters)
    finalizes to EXACTLY the batch funnel's five stage rows. Batches
    are doc_id-contiguous and processed in ascending order (staggered
    mtimes pin the FileStreamSource order), matching the batch
    keep-first's min-doc_id semantics."""
    import time as _time

    from pyspark.sql import functions as F

    from magmapandas_spark.operators.bloom import build_bloom_bits
    from magmapandas_spark.operators.curation import (
        corpus_build_funnel,
    )
    from magmapandas_spark.streaming.streams import (
        finalize_streaming_funnel,
        streaming_funnel_ingest,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    mx = docs.agg(F.max("doc_id")).first()[0]
    cut1, cut2 = mx // 3, 2 * mx // 3
    src = tempfile.mkdtemp(prefix="stream_funnel_src_")
    for k, pred in enumerate(
        (
            F.col("doc_id") <= cut1,
            (F.col("doc_id") > cut1) & (F.col("doc_id") <= cut2),
            F.col("doc_id") > cut2,
        )
    ):
        part = os.path.join(src, f"part_{k}.parquet")
        docs.filter(pred).coalesce(1).write.mode(
            "overwrite"
        ).parquet(part + ".dir")
        # single data file out of the dir, mtime ascending with k
        data = [
            f
            for f in os.listdir(part + ".dir")
            if f.endswith(".parquet")
        ][0]
        os.rename(os.path.join(part + ".dir", data), part)
        t = _time.time() + k * 10
        os.utime(part, (t, t))
    bench_words = build_bloom_bits(
        docs.filter(F.col("doc_id") % 11 == 0)
    )
    out_dir = tempfile.mkdtemp(prefix="stream_funnel_")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    streaming_funnel_ingest(
        stream,
        bench_words,
        os.path.join(out_dir, "state"),
        os.path.join(out_dir, "ckpt"),
    )
    got = normalize(
        finalize_streaming_funnel(
            spark, os.path.join(out_dir, "state")
        ).toPandas()
    )
    exp = normalize(corpus_build_funnel(docs).toPandas())
    pd.testing.assert_frame_equal(got, exp)
