"""Unit tests for the round-6 indexing / ANALYZE / k-means operators
(their cross-engine gate checks live in test_oracle.py; these pin the
operator semantics on small controlled inputs)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_group_topk_ranks_and_boundaries(spark):
    from magmapandas_spark.operators.indexing import group_topk

    rows = [
        Row(doc_id=i, g="a" if i < 6 else "b", score=float(i % 4))
        for i in range(10)
    ]
    df = spark.createDataFrame(rows)
    out = group_topk(
        df, "g", "score", 3, payload_cols=[], id_col="doc_id"
    ).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append((r["rank"], r["score"], r["doc_id"]))
    # group a: scores 0,1,2,3,0,1 for ids 0..5 → top3 = (3,id3),(2,id2),(1,id1)
    assert sorted(by_g["a"]) == [(1, 3.0, 3), (2, 2.0, 2), (3, 1.0, 1)]
    # group b: ids 6..9 scores 2,3,0,1 → (3,id7),(2,id6),(1,id9)
    assert sorted(by_g["b"]) == [(1, 3.0, 7), (2, 2.0, 6), (3, 1.0, 9)]


def test_group_topk_tie_breaks_on_id(spark):
    from magmapandas_spark.operators.indexing import group_topk

    df = spark.createDataFrame(
        [Row(doc_id=i, g="x", score=1.0) for i in range(5)]
    )
    out = group_topk(df, "g", "score", 2, payload_cols=[]).collect()
    assert [(r["rank"], r["doc_id"]) for r in sorted(out, key=lambda r: r["rank"])] == [
        (1, 0),
        (2, 1),
    ]


def test_inverted_index_postings_roundtrip(spark):
    from magmapandas_spark.operators.indexing import inverted_index

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="red blue red"),
            Row(doc_id=2, text="blue green"),
            Row(doc_id=3, text="red"),
        ]
    )
    out = {r["term"]: r for r in inverted_index(df).collect()}
    assert out["red"]["df"] == 2 and out["red"]["tf_total"] == 3
    assert out["red"]["postings"] == "1:2,3:1"
    assert out["blue"]["postings"] == "1:1,2:1"
    assert out["green"]["df"] == 1


def test_table_stats_nulls_and_types(spark):
    from magmapandas_spark.operators.stats import table_stats

    df = spark.createDataFrame(
        [
            Row(k=1, v=2.5, s="b"),
            Row(k=2, v=None, s="a"),
            Row(k=2, v=7.5, s=None),
        ]
    )
    out = {r["col"]: r for r in table_stats(df).collect()}
    assert out["k"]["null_count"] == 0 and out["k"]["ndv"] == 2
    assert out["k"]["min_num"] == 1.0 and out["k"]["max_num"] == 2.0
    assert out["v"]["null_count"] == 1 and out["v"]["ndv"] == 2
    assert out["v"]["min_num"] == 2.5 and out["v"]["max_num"] == 7.5
    assert out["s"]["null_count"] == 1
    assert out["s"]["min_str"] == "a" and out["s"]["max_str"] == "b"
    assert out["s"]["min_num"] is None


def test_lloyd_refine_monotone_inertia(spark):
    """Lloyd's algorithm never increases total inertia — refining the
    sample-fit codebook against the full corpus must shrink (or hold)
    the decimal-exact inertia every iteration."""
    from magmapandas_spark.operators.kmeans import lloyd_refine
    from magmapandas_spark.operators.similarity import (
        ivf_fit_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    init = ivf_fit_centroids(SF)

    def inertia(iters: int) -> float:
        _, assigned = lloyd_refine(emb, init, iters=iters)
        return float(
            assigned.agg(F.sum("d2").cast("double")).collect()[0][0]
        )

    i0, i1, i2 = inertia(0), inertia(1), inertia(2)
    assert i1 <= i0 + 1e-9
    assert i2 <= i1 + 1e-9


def test_lloyd_refine_raises_on_empty_cell(spark):
    from magmapandas_spark.operators.kmeans import lloyd_refine

    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i), 0.0]) for i in range(4)]
    )
    # a far-away centroid no point will pick → must fail loudly
    init = [[0.0, 0.0], [1e6, 1e6]]
    with pytest.raises(ValueError, match="emptied"):
        lloyd_refine(emb, init, iters=1)


def test_ann_recall_floor(spark):
    """The 8-cell / 4-probe IVF search must keep recall@5 well above
    degenerate — probing half the cells of a balanced codebook should
    find most true neighbors (the gate hash pins the exact values;
    this pins the QUALITY floor so a silently broken index cannot
    re-baseline itself)."""
    from magmapandas_spark.operators.evaluation import q_ann_recall

    out = q_ann_recall(spark, SF).toPandas()
    assert len(out) == 20
    assert out["recall"].mean() >= 0.5


def test_bm25_from_index_matches_direct(spark):
    """Query-side BM25 over the persisted index must agree with the
    direct corpus-scan bm25_scores on every positive-scoring doc
    (the index path omits 0-score docs by definition). Tolerance
    1e-6: the index path sums per-term contributions in decimal
    (order-independent), the direct path as a fixed-order double
    chain — equal to within an ulp at the 6th decimal."""
    from magmapandas_spark.operators.indexing import (
        bm25_from_index,
        write_search_index,
    )
    from magmapandas_spark.operators.tfidf import (
        DEFAULT_QUERY,
        bm25_scores,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for t in ["si_postings", "si_doclen", "si_stats"]:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_search_index(docs, "si")
    try:
        got = {
            r["doc"]: (r["n_matched"], r["score"])
            for r in bm25_from_index(
                spark, "si", DEFAULT_QUERY, top_k=10000
            ).collect()
        }
        exp = {
            r["doc_id"]: (r["n_matched"], r["score"])
            for r in bm25_scores(
                docs, DEFAULT_QUERY, top_k=10000
            ).collect()
            if r["n_matched"] > 0
        }
        assert set(got) == set(exp)
        for doc, (nm, sc) in exp.items():
            gnm, gsc = got[doc]
            assert gnm == nm, doc
            assert abs(gsc - sc) <= 2e-6, (doc, gsc, sc)
    finally:
        for t in ["si_postings", "si_doclen", "si_stats"]:
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bm25_from_index_never_scans_corpus(spark):
    """The query plan must read ONLY the three index tables — no
    documents.parquet scan, the postings lookup bucket-pruned, the
    doclen side streamed (no SortMergeJoin, exploded side broadcast)."""
    from magmapandas_spark.operators.indexing import (
        bm25_from_index,
        write_search_index,
    )
    from tests.test_plan_invariants import plan_of

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    for t in ["si2_postings", "si2_doclen", "si2_stats"]:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_search_index(docs, "si2", n_buckets=8)
    try:
        df = bm25_from_index(spark, "si2", ["the", "and"])
        plan = plan_of(df)
        assert "documents.parquet" not in plan
        assert "SortMergeJoin" not in plan
        assert "BroadcastHashJoin" in plan
        assert df.count() >= 0
    finally:
        for t in ["si2_postings", "si2_doclen", "si2_stats"]:
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_validation_rules_on_crafted_data(spark):
    from magmapandas_spark.operators.validation import (
        accepted_values,
        foreign_key,
        in_range,
        matches_regex,
        not_null,
        unique,
        validate,
    )

    df = spark.createDataFrame(
        [
            Row(k=1, v=5.0, s="ok", fk=10),
            Row(k=1, v=-1.0, s="bad!", fk=10),   # dup k, range, regex
            Row(k=2, v=None, s="ok", fk=99),     # null v, orphan fk
            Row(k=3, v=7.0, s="zz", fk=10),      # not accepted
        ]
    )
    ref = spark.createDataFrame([Row(r=10), Row(r=20)])
    out = {
        r["rule"]: (r["n_violations"], r["passed"])
        for r in validate(
            df,
            [
                not_null("v"),
                in_range("v", 0, 10),
                accepted_values("s", ["ok", "bad!"]),
                matches_regex("s", "^[a-z!]+$"),
                unique("k"),
                foreign_key("fk", ref, "r"),
            ],
        ).collect()
    }
    assert out["not_null(v)"] == (1, False)
    # null counts as a range violation too
    assert out["in_range(v,0,10)"] == (2, False)
    assert out["accepted_values(s)"] == (1, False)
    assert out["matches_regex(s)"] == (0, True)
    assert out["unique(k)"] == (1, False)
    assert out["foreign_key(fk)"] == (1, False)
