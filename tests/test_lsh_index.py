"""Persisted LSH index + incremental batch dedup: the production
ingestion shape. Proves (a) the incremental probe finds exactly the
cross-set candidates the full-corpus batch join finds, and (b) the
stored index side joins without an exchange."""

import pytest
from pyspark.sql import functions as F

from magmapandas_spark.operators.dedup import (
    incremental_lsh_candidates,
    minhash_lsh_candidates,
    write_lsh_index,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def corpus_index(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    old = docs.filter(F.col("doc_id") < 400)
    write_lsh_index(old, "lsh_idx_old", hash_strategy="md5")
    yield docs
    spark.sql("DROP TABLE IF EXISTS lsh_idx_old")


def test_incremental_matches_batch_cross_pairs(spark, corpus_index):
    docs = corpus_index
    new = docs.filter(
        (F.col("doc_id") >= 400) & (F.col("doc_id") < 500)
    )
    got = set(
        (r["new_id"], r["old_id"])
        for r in incremental_lsh_candidates(
            new, "lsh_idx_old", hash_strategy="md5"
        ).collect()
    )
    # ground truth: full-corpus batch candidates restricted to pairs
    # crossing the old/new boundary (batch emits id1 < id2, so old is
    # always id1 here)
    full = minhash_lsh_candidates(
        docs.filter(F.col("doc_id") < 500), hash_strategy="md5"
    ).collect()
    exp = set(
        (r["id2"], r["id1"])
        for r in full
        if r["id1"] < 400 <= r["id2"]
    )
    assert got == exp
    assert len(got) > 0  # the synthetic corpus plants near-dups


def test_index_side_reads_bucketed_without_exchange(spark, corpus_index):
    docs = corpus_index
    new = docs.filter(F.col("doc_id") >= 400)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            incremental_lsh_candidates(new, "lsh_idx_old",
                                       hash_strategy="md5")
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # index side must come straight from its buckets into the join
    scan_line = next(
        ln for ln in plan.splitlines() if "lsh_idx_old" in ln
    )
    assert "Bucketed: true" in scan_line, scan_line
    # every Exchange in the plan belongs to the probe side / the final
    # distinct: fan_out round-robin, shingle agg, band-sig alignment,
    # distinct — exactly 4. A 5th would mean the stored side re-shuffled.
    n_exchanges = sum(
        1 for ln in plan.splitlines() if ln.strip().startswith(
            ("+- Exchange", ":- Exchange")
        ) or "+- Exchange" in ln
    )
    assert n_exchanges == 4, plan


def test_fp_index_side_reads_bucketed_without_exchange(spark, tmp_path):
    """The fingerprint index (write_lsh_index pattern on the
    multimodal dedup tier): stored side reads its buckets straight
    into the join; only the arriving batch shuffles."""
    from magmapandas_spark.operators.png import (
        incremental_fp_duplicates,
        make_synthetic_png,
        synthetic_png_media,
        write_fp_index,
    )

    import shutil

    spark.sql("DROP TABLE IF EXISTS fp_idx_test")
    shutil.rmtree("spark-warehouse/fp_idx_test", ignore_errors=True)
    base = synthetic_png_media(spark, 20)
    write_fp_index(base, "fp_idx_test")
    # batch: two dups of indexed images + one fresh image
    batch = spark.createDataFrame(
        [
            (100, make_synthetic_png(3)),
            (101, make_synthetic_png(7)),
            (102, make_synthetic_png(25)),
        ],
        "media_id long, payload binary",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = incremental_fp_duplicates(batch, "fp_idx_test")
        plan = out._jdf.queryExecution().executedPlan().toString()
        rows = {(r.media_id, r.idx_media_id) for r in out.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert rows == {(100, 3), (101, 7)}  # dups found, fresh image not
    scan_line = next(
        ln for ln in plan.splitlines() if "fp_idx_test" in ln
    )
    assert "Bucketed: true" in scan_line, scan_line
    # the only exchange aligns the BATCH side's fingerprints to the
    # index buckets — the stored side never re-shuffles
    n_exchanges = sum(
        1 for ln in plan.splitlines()
        if "+- Exchange" in ln or ":- Exchange" in ln
    )
    assert n_exchanges == 1, plan


def test_fp_index_gate_reaps_aged_scratch(spark):
    """r12: ensure_fp_index removes OTHER apps' fp_index_gate_* scratch
    dirs once they age past a day (per-app names otherwise accumulate
    one dir per session forever), never the current app's table, and
    repeated calls skip the build entirely (the set memo)."""
    import os
    import time
    from urllib.parse import urlparse

    from magmapandas_spark.operators import png as P

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    os.makedirs(wh, exist_ok=True)
    aged = os.path.join(wh, "fp_index_gate_fakeapp_aged")
    young = os.path.join(wh, "fp_index_gate_fakeapp_young")
    for d in (aged, young):
        os.makedirs(d, exist_ok=True)
    os.utime(aged, (time.time() - 90000, time.time() - 90000))
    table = P.ensure_fp_index(spark, 4)
    try:
        assert not os.path.exists(aged)      # past the 24 h cutoff
        assert os.path.exists(young)         # possibly a live session
        assert P._FP_INDEX_BUILT.get(table) == 4
        # memoized: second call does not rebuild (table object count
        # in the catalog is stable and the call is instant)
        assert P.ensure_fp_index(spark, 4) == table
        # r13 ADVICE fix: a DIFFERENT corpus size must rebuild and
        # replace the memo entry, not return the stale 4-image index
        assert P.ensure_fp_index(spark, 6) == table
        assert P._FP_INDEX_BUILT.get(table) == 6
        n6 = spark.table(table).count()
        assert n6 == 6
    finally:
        import shutil

        shutil.rmtree(young, ignore_errors=True)
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        P._FP_INDEX_BUILT.pop(table, None)
        shutil.rmtree(os.path.join(wh, table), ignore_errors=True)
