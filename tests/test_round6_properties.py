"""Property tests for the round-6 operators — the algebraic laws that
make them safe at scale, checked on hypothesis-generated batches
(examples are collected into ONE DataFrame per law; the expressions
are the unit under test)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _collect_examples(strategy, n):
    out = []

    @settings(max_examples=n, deadline=None, database=None)
    @given(x=strategy)
    def collect(x):
        out.append(x)

    collect()
    return out


_row = st.tuples(
    st.integers(0, 9999),              # id
    st.sampled_from(list("abcd")),     # group
    st.integers(-1000, 1000),          # score (ints: no float-tie fog)
)


def test_group_topk_equals_window_ranking(spark):
    """group_topk must select and rank EXACTLY the rows
    row_number() OVER (PARTITION BY g ORDER BY score DESC, id) would —
    the aggregation form is a plan optimization, never a semantics
    change."""
    rows = {r[0]: r for r in _collect_examples(_row, 300)}
    df = spark.createDataFrame(
        [Row(doc_id=i, g=g, score=float(s)) for i, g, s in rows.values()]
    )
    from magmapandas_spark.operators.indexing import group_topk

    k = 4
    got = {
        (r["g"], r["rank"], r["doc_id"])
        for r in group_topk(df, "g", "score", k, payload_cols=[]).collect()
    }
    w = Window.partitionBy("g").orderBy(F.desc("score"), "doc_id")
    exp = {
        (r["g"], r["rn"], r["doc_id"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .collect()
    }
    assert got == exp


def test_weighted_sample_merge_law(spark):
    """A-ES mergeability: the global top-k of priorities equals the
    re-truncated union of per-part top-ks for ANY split of the input —
    the property that lets per-executor (or per-day) reservoirs merge
    without revisiting data."""
    rows = {r[0]: r for r in _collect_examples(_row, 300)}
    data = [
        Row(doc_id=i, w=abs(s) + 1) for i, _g, s in rows.values()
    ]
    df = spark.createDataFrame(data)
    from magmapandas_spark.operators.curation import weighted_sample

    k = 25
    whole = [
        (r["priority"], r["doc_id"])
        for r in weighted_sample(df, "w", k).collect()
    ]
    parts = [df.filter(F.col("doc_id") % 3 == m) for m in range(3)]
    cand = []
    for p in parts:
        cand.extend(
            (r["priority"], r["doc_id"])
            for r in weighted_sample(p, "w", k).collect()
        )
    merged = sorted(cand, key=lambda t: (-t[0], t[1]))[:k]
    assert merged == whole


def test_line_dedup_identity_when_all_lines_unique(spark):
    """With every line globally unique, line_dedup must be the
    identity on text (n_dropped == 0, clean_text == text) — the
    operator only ever removes provably repeated boilerplate."""
    texts = _collect_examples(
        st.lists(st.integers(0, 10**9), min_size=1, max_size=5), 80
    )
    rows = []
    seen = set()
    for i, ls in enumerate(texts):
        # make lines globally unique by construction
        lines = []
        for j, v in enumerate(ls):
            t = f"line-{i}-{j}-{v}"
            assert t not in seen
            seen.add(t)
            lines.append(t)
        rows.append(Row(doc_id=i, text="\n".join(lines)))
    df = spark.createDataFrame(rows)
    from magmapandas_spark.operators.webcorpus import line_dedup

    out = line_dedup(df).collect()
    by_id = {r["doc_id"]: r for r in out}
    for r in rows:
        assert by_id[r.doc_id]["clean_text"] == r.text
        assert by_id[r.doc_id]["n_dropped"] == 0


def test_merge_stats_relations_associative_commutative(spark):
    """Incremental ANALYZE folds must not care about batch order or
    grouping: fold(fold(a,b),c) == fold(a,fold(b,c)) == fold over any
    permutation == one batch pass over the union."""
    from magmapandas_spark.operators.stats import (
        merge_stats_relations,
        mergeable_stats_relation,
    )

    rows = {r[0]: r for r in _collect_examples(_row, 200)}
    df = spark.createDataFrame(
        [
            Row(k=i, v=float(s), s=g if s % 3 else None)
            for i, g, s in rows.values()
        ]
    )
    parts = [df.filter(F.col("k") % 3 == m) for m in range(3)]
    rels = [mergeable_stats_relation(p) for p in parts]

    def as_set(rel):
        return {
            (
                r["col"], r["n_rows"], r["null_count"], r["min_num"],
                r["max_num"], r["min_str"], r["max_str"],
            )
            for r in rel.collect()
        }

    left = merge_stats_relations(merge_stats_relations(rels[0], rels[1]), rels[2])
    right = merge_stats_relations(rels[0], merge_stats_relations(rels[1], rels[2]))
    rev = merge_stats_relations(merge_stats_relations(rels[2], rels[1]), rels[0])
    whole = mergeable_stats_relation(df)
    assert as_set(left) == as_set(right) == as_set(rev) == as_set(whole)


def test_bm25_zero_when_no_term_matches(spark):
    """Documents containing none of the query terms score exactly 0
    (every per-term tf is 0 → every term score is 0); documents with
    matches never score below them in the ranking."""
    from magmapandas_spark.operators.tfidf import bm25_scores

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="volcano basalt magma"),
            Row(doc_id=2, text="completely unrelated words here"),
            Row(doc_id=3, text="basalt basalt basalt"),
        ]
    )
    out = {
        r["doc_id"]: r
        for r in bm25_scores(df, ["basalt", "magma"], top_k=3).collect()
    }
    assert out[2]["score"] == 0.0 and out[2]["n_matched"] == 0
    assert out[1]["n_matched"] == 2 and out[1]["score"] > 0
    assert out[3]["n_matched"] == 1 and out[3]["score"] > 0


def test_hybrid_rrf_fuses_both_lists_exactly(spark):
    """A doc's rrf must equal 1/(60+rank_sparse) + 1/(60+rank_dense)
    with absent-list ranks contributing nothing, and a doc leading
    BOTH lists must lead the fused ranking (RRF dominance)."""
    from magmapandas_spark.operators.tfidf import hybrid_search

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="spark table merge window hash spark"),
            Row(doc_id=1, text="spark spark spark table table hash"),
            Row(doc_id=2, text="granite pluton xenolith"),
            Row(doc_id=3, text="table"),
        ]
    )
    # vec 1 is nearly parallel to the query (vec 0); vec 2 orthogonal,
    # vec 3 anti-parallel → dense ranks: 1, 2, 3 for docs 1, 2, 3
    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0]),
            Row(vec_id=1, embedding=[0.99, 0.1]),
            Row(vec_id=2, embedding=[0.0, 1.0]),
            Row(vec_id=3, embedding=[-1.0, 0.05]),
        ]
    )
    out = hybrid_search(
        docs, emb,
        ["spark", "table", "merge", "window", "hash"],
        query_vec_id=0, pool_k=3, top_k=10,
    ).collect()
    rows = {r["doc_id"]: r for r in out}
    # doc 1 leads: dense rank 1 + sparse rank 2 beats doc 0's
    # sparse-only rank 1 (doc 0 IS the query vector, which the dense
    # list excludes — the self-match never pads its own retrieval)
    assert out[0]["doc_id"] == 1
    assert rows[0]["rank_dense"] == 0 and rows[0]["rank_sparse"] == 1
    for r in out:
        want = 0.0
        if r["rank_sparse"] > 0:
            want += 1.0 / (60 + r["rank_sparse"])
        if r["rank_dense"] > 0:
            want += 1.0 / (60 + r["rank_dense"])
        assert r["rrf"] == pytest.approx(want, abs=5e-9)
    # doc 2 matched no query term: sparse rank 0, dense-only entry
    assert rows[2]["rank_sparse"] == 0 and rows[2]["rank_dense"] > 0


def test_fuzzy_blocking_recall_equals_bruteforce(spark):
    """SymSpell recall law: deletion-neighborhood blocking + verify
    finds EXACTLY the pairs the brute-force levenshtein<=1 cross join
    finds — on adversarial short strings where spurious shared
    deletions (ab/ba) are densest."""
    import itertools

    from magmapandas_spark.operators.fuzzy import fuzzy_join_d1

    # every string of length 2-3 over {a,b,c}: 36 strings, all edge
    # cases of insertion/deletion/substitution adjacency in one pool
    pool = ["".join(p) for n in (2, 3)
            for p in itertools.product("abc", repeat=n)]
    probes = spark.createDataFrame([(s,) for s in pool], ["probe"])
    words = spark.createDataFrame([(s,) for s in pool], ["word"])
    got = {
        (r["probe"], r["word"])
        for r in fuzzy_join_d1(probes, words).collect()
    }

    def lev(a, b):
        d = {(i, 0): i for i in range(len(a) + 1)}
        d.update({(0, j): j for j in range(len(b) + 1)})
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                d[i, j] = min(
                    d[i - 1, j] + 1, d[i, j - 1] + 1,
                    d[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
                )
        return d[len(a), len(b)]

    want = {
        (p, w) for p in pool for w in pool if lev(p, w) <= 1
    }
    assert got == want
