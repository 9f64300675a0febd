"""Property tests for the r11 window→aggregate argmin/argmax rewrites.

The rewrites claim EXACT equivalence — winner and tie-break — between
the old `row_number()` window and the new map-side-combined
`min/max(struct(...))` aggregates in `ivf_topk_fitted`, `ivf_seeded`
and `pq_seeded`. The suite's oracle hashes pin this on the real
embeddings, where exact float ties are absent; these tests pin it on
ADVERSARIAL inputs — engineered duplicate seeds (exact score ties),
zero vectors (clamped-norm cosines), and hypothesis-driven random
small integer grids (tie-rich by construction) — where a wrong
tie-break direction or NaN ordering difference would actually fire.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F


def _window_argmin_cells(df, seeds, dist):
    scored = df.crossJoin(F.broadcast(seeds)).select(
        "cid", "cell", dist.alias("sd")
    )
    w = Window.partitionBy("cid").orderBy(F.col("sd").asc(), F.col("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cid", "cell")
    )


def _agg_argmin_cells(df, seeds, dist):
    scored = df.crossJoin(F.broadcast(seeds)).select(
        "cid", "cell", dist.alias("sd")
    )
    return (
        scored.groupBy("cid")
        .agg(F.min(F.struct("sd", "cell")).alias("m"))
        .select("cid", F.col("m.cell").alias("cell"))
    )


def _window_argmax_cells(df, seeds, score):
    scored = df.crossJoin(F.broadcast(seeds)).select(
        "cid", "seed_id", score.alias("scos")
    )
    w = Window.partitionBy("cid").orderBy(
        F.col("scos").desc(), F.col("seed_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cid", F.col("seed_id").alias("cell"))
    )


def _agg_argmax_cells(df, seeds, score):
    scored = df.crossJoin(F.broadcast(seeds)).select(
        "cid", "seed_id", score.alias("scos")
    )
    return (
        scored.groupBy("cid")
        .agg(
            F.max(
                F.struct(F.col("scos"), (-F.col("seed_id")).alias("ns"))
            ).alias("m")
        )
        .select("cid", (-F.col("m.ns")).alias("cell"))
    )


def _dist2(a, b):
    sq = F.zip_with(
        a, b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v)


def _cos(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    nrm = lambda v: F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda acc, x: acc + x,
        )
    )
    return dot / (nrm(a) * nrm(b))


def _assign_maps_one(spark, vec_rows, seed_rows, mode, form):
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vec_rows)],
        "cid long, cvec array<double>",
    )
    if mode == "argmin":
        seeds = spark.createDataFrame(
            [(j, [float(x) for x in s]) for j, s in enumerate(seed_rows)],
            "cell int, svec array<double>",
        )
        dist = _dist2(F.col("cvec"), F.col("svec"))
        df = (
            _window_argmin_cells(corpus, seeds, dist)
            if form == "window"
            else _agg_argmin_cells(corpus, seeds, dist)
        )
    else:
        seeds = spark.createDataFrame(
            [(j, [float(x) for x in s]) for j, s in enumerate(seed_rows)],
            "seed_id long, svec array<double>",
        )
        score = _cos(F.col("cvec"), F.col("svec"))
        df = (
            _window_argmax_cells(corpus, seeds, score)
            if form == "window"
            else _agg_argmax_cells(corpus, seeds, score)
        )
    return {r["cid"]: r["cell"] for r in df.collect()}


def _assign_maps(spark, vec_rows, seed_rows, mode):
    return (
        _assign_maps_one(spark, vec_rows, seed_rows, mode, "window"),
        _assign_maps_one(spark, vec_rows, seed_rows, mode, "agg"),
    )


@pytest.mark.parametrize("mode", ["argmin", "argmax"])
def test_engineered_exact_ties(spark, mode):
    """Duplicate seeds produce EXACT score ties for every vector; both
    forms must pick the lowest cell/seed id."""
    seeds = [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, 1.0]]
    vecs = [[1.0, 0.0], [0.0, 1.0], [0.5, 0.5], [2.0, 0.0]]
    w, a = _assign_maps(spark, vecs, seeds, mode)
    assert w == a
    # and the tie-break is the LOW id: vectors nearest the duplicated
    # seed pair must land on the first copy
    if mode == "argmin":
        assert w[0] == 0 and w[1] == 2
    else:
        assert w[0] == 0 and w[1] == 2


def test_zero_vector_argmin_agrees(spark):
    """Squared distance is total-defined — a zero vector is a valid
    argmin input and both forms must agree on it."""
    seeds = [[1.0, 0.0], [0.0, 1.0]]
    vecs = [[0.0, 0.0], [1.0, 1.0]]
    w, a = _assign_maps(spark, vecs, seeds, "argmin")
    assert w == a


def test_zero_vector_argmax_fails_loud_in_both_forms(spark):
    """The expression-tier cosine divides by the unclamped norm, so a
    zero vector raises DIVIDE_BY_ZERO under ANSI mode — in BOTH forms
    (fail-loud parity; the Arrow-tier paths clamp the norm instead,
    similarity.py `np.maximum(..., 1e-30)`, which is their documented
    semantics for degenerate vectors). A rewrite that silently
    swallowed the degenerate row in one form only would break this."""
    from pyspark.errors.exceptions.captured import ArithmeticException

    seeds = [[1.0, 0.0], [0.0, 1.0]]
    vecs = [[0.0, 0.0], [1.0, 1.0]]
    if spark.conf.get("spark.sql.ansi.enabled", "true") != "true":
        pytest.skip("non-ANSI session: zero norm yields NULL, not error")
    for form in ("window", "agg"):
        with pytest.raises(ArithmeticException, match="DIVIDE_BY_ZERO"):
            _assign_maps_one(spark, vecs, seeds, "argmax", form)


def _nonzero_vec(data, comp):
    v = [float(data.draw(comp)), float(data.draw(comp))]
    if v == [0.0, 0.0]:
        v[0] = 1.0  # cosine is undefined at zero norm (fail-loud above)
    return v


@settings(max_examples=15, deadline=None)
@given(
    data=st.data(),
    n_seeds=st.integers(min_value=1, max_value=5),
    n_vecs=st.integers(min_value=1, max_value=8),
)
@pytest.mark.parametrize("mode", ["argmin", "argmax"])
def test_random_tie_rich_grids(spark, mode, data, n_seeds, n_vecs):
    """Random small-integer 2-d grids (components in {-1,0,1,2}) are
    tie-rich: distinct seeds frequently sit at identical distances
    (and identical cosines) from a vector. The window and aggregate
    forms must agree on every assignment. Zero vectors are nudged
    non-zero for argmax (cosine undefined; fail-loud parity is pinned
    separately)."""
    comp = st.integers(min_value=-1, max_value=2)
    if mode == "argmin":
        seeds = [
            [float(data.draw(comp)), float(data.draw(comp))]
            for _ in range(n_seeds)
        ]
        vecs = [
            [float(data.draw(comp)), float(data.draw(comp))]
            for _ in range(n_vecs)
        ]
    else:
        seeds = [_nonzero_vec(data, comp) for _ in range(n_seeds)]
        vecs = [_nonzero_vec(data, comp) for _ in range(n_vecs)]
    w, a = _assign_maps(spark, vecs, seeds, mode)
    assert w == a


# ======================================================================
# r12 collapses: hard_negatives (per-(qid, polarity) argmax-with-payload),
# er_golden_multipass (argmax + member count + string payload), and
# geo_nearest (argmin + count with the left-join null group)
# ======================================================================


def _hn_window(scored):
    w = Window.partitionBy("qid", "is_pos").orderBy(
        F.col("cos").desc(), F.col("cid")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("qid", "is_pos", "cid", "cos")
    )


def _hn_agg(scored):
    return (
        scored.groupBy("qid", "is_pos")
        .agg(
            F.max(
                F.struct(F.col("cos"), (-F.col("cid")).alias("nc"))
            ).alias("m")
        )
        .select(
            "qid", "is_pos",
            (-F.col("m.nc")).alias("cid"),
            F.col("m.cos").alias("cos"),
        )
    )


@settings(max_examples=15, deadline=None)
@given(data=st.data(), n=st.integers(min_value=1, max_value=12))
def test_hard_negatives_argmax_equivalence(spark, data, n):
    """Tie-rich (qid, is_pos, cid, cos) relations: small-integer
    cosines force exact score ties; the map-side max(struct(cos, -cid))
    must match the window on winner id AND carried score."""
    rows = [
        (
            data.draw(st.integers(0, 2)),
            bool(data.draw(st.integers(0, 1))),
            i,
            float(data.draw(st.integers(-1, 1))),
        )
        for i in range(n)
    ]
    scored = spark.createDataFrame(
        rows, "qid long, is_pos boolean, cid long, cos double"
    )
    key = lambda r: (r["qid"], r["is_pos"])
    w = {key(r): (r["cid"], r["cos"]) for r in _hn_window(scored).collect()}
    a = {key(r): (r["cid"], r["cos"]) for r in _hn_agg(scored).collect()}
    assert w == a


def _golden_window(members):
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("p_size"), "node"
    )
    return (
        members.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_members",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")),
        )
        .filter(F.col("rn") == 1)
        .select("cluster_id", "n_members",
                F.col("node").alias("golden_key"),
                F.col("p_name").alias("golden_name"),
                F.col("p_size").alias("golden_size"))
    )


def _golden_agg(members):
    return (
        members.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max(
                F.struct(F.col("p_size"), (-F.col("node")).alias("nn"),
                         F.col("node"), F.col("p_name"))
            ).alias("m"),
        )
        .select("cluster_id", "n_members",
                F.col("m.node").alias("golden_key"),
                F.col("m.p_name").alias("golden_name"),
                F.col("m.p_size").alias("golden_size"))
    )


@settings(max_examples=15, deadline=None)
@given(data=st.data(), n=st.integers(min_value=1, max_value=12))
def test_golden_record_argmax_equivalence(spark, data, n):
    """Survivorship: duplicate p_size values force the node tie-break;
    the string payload must ride the same winning row."""
    rows = [
        (
            data.draw(st.integers(0, 2)),
            i,
            f"part_{i}",
            data.draw(st.integers(1, 3)),
        )
        for i in range(n)
    ]
    members = spark.createDataFrame(
        rows, "cluster_id long, node long, p_name string, p_size int"
    )
    w = {r["cluster_id"]: tuple(r)[1:]
         for r in _golden_window(members).collect()}
    a = {r["cluster_id"]: tuple(r)[1:]
         for r in _golden_agg(members).collect()}
    assert w == a


def _nearest_window(joined):
    w = Window.partitionBy("pk").orderBy(
        F.col("d2").asc_nulls_last(), F.col("ck").asc_nulls_last()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_candidates",
            F.count("ck").over(Window.partitionBy("pk")),
        )
        .filter(F.col("rn") == 1)
        .select(F.col("pk").alias("probe_key"),
                F.col("ck").alias("nearest_key"),
                "d2", "n_candidates")
    )


def _nearest_agg(joined):
    return (
        joined.groupBy("pk")
        .agg(
            F.count("ck").alias("n_candidates"),
            F.min(F.struct(F.col("d2"), F.col("ck"))).alias("m"),
        )
        .select(F.col("pk").alias("probe_key"),
                F.col("m.ck").alias("nearest_key"),
                F.col("m.d2").alias("d2"), "n_candidates")
    )


@settings(max_examples=15, deadline=None)
@given(data=st.data(), n=st.integers(min_value=0, max_value=10))
def test_geo_nearest_argmin_equivalence(spark, data, n):
    """Probe groups are either all-real candidates (tie-rich integer
    d2) or the single all-null left-join row — the two reachable
    shapes of a left equi-join. Both forms must agree on winner,
    distance, and candidate count for each."""
    rows = [
        (
            data.draw(st.integers(0, 2)),
            i,
            float(data.draw(st.integers(0, 2))),
        )
        for i in range(n)
    ]
    # the no-candidate probe: one row, null candidate + null distance
    rows.append((99, None, None))
    joined = spark.createDataFrame(
        rows, "pk long, ck long, d2 double"
    )
    w = {r["probe_key"]: tuple(r)[1:]
         for r in _nearest_window(joined).collect()}
    a = {r["probe_key"]: tuple(r)[1:]
         for r in _nearest_agg(joined).collect()}
    assert w == a


def _keepfirst_window(base):
    surv = base.withColumn(
        "keep",
        F.row_number().over(
            Window.partitionBy("h").orderBy("doc_id")
        )
        == 1,
    )
    return surv.filter(F.col("keep")).select("h", "doc_id", "bench", "text")


def _keepfirst_agg(base):
    return (
        base.groupBy("h")
        .agg(F.min(F.struct("doc_id", "bench", "text")).alias("m"))
        .select("h", "m.doc_id", "m.bench", "m.text")
    )


@settings(max_examples=15, deadline=None)
@given(data=st.data(), n=st.integers(min_value=1, max_value=12))
def test_keepfirst_min_struct_equivalence(spark, data, n):
    """corpus_build_funnel's stage-4 rewrite: keep-first per prefix
    hash as min(struct(doc_id, payload)) must match the row_number
    window on the surviving row AND its payload (doc_id unique, so
    payload fields are never compared)."""
    rows = [
        (
            f"h{data.draw(st.integers(0, 2))}",
            i,
            bool(data.draw(st.integers(0, 1))),
            f"text_{i}",
        )
        for i in range(n)
    ]
    base = spark.createDataFrame(
        rows, "h string, doc_id long, bench boolean, text string"
    )
    w = {r["h"]: tuple(r)[1:] for r in _keepfirst_window(base).collect()}
    a = {r["h"]: tuple(r)[1:] for r in _keepfirst_agg(base).collect()}
    assert w == a


def _keepbest_window(j):
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("q"), "doc_id"
    )
    ranked = j.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("cluster_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("kept_doc"),
        F.max(F.when(F.col("rn") == 1, F.col("q"))).alias("kept_quality"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def _keepbest_agg(j):
    return (
        j.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max(
                F.struct(F.col("q"), (-F.col("doc_id")).alias("nid"),
                         F.col("doc_id").alias("kid"),
                         F.col("q").alias("kq"))
            ).alias("m"),
        )
        .select("cluster_id", F.col("m.kid").alias("kept_doc"),
                F.col("m.kq").alias("kept_quality"), "n_docs")
    )


@settings(max_examples=15, deadline=None)
@given(data=st.data(), n=st.integers(min_value=1, max_value=12))
def test_keep_best_per_cluster_argmax_equivalence(spark, data, n):
    """dedup keep-policy rewrite: duplicate quality values force the
    doc-id tie-break; winner id, carried quality, and member count
    must match the former window+conditional-agg pair exactly."""
    rows = [
        (
            data.draw(st.integers(0, 2)),
            i,
            data.draw(st.integers(1, 3)),
        )
        for i in range(n)
    ]
    j = spark.createDataFrame(rows, "cluster_id long, doc_id long, q int")
    w = {r["cluster_id"]: tuple(r)[1:] for r in _keepbest_window(j).collect()}
    a = {r["cluster_id"]: tuple(r)[1:] for r in _keepbest_agg(j).collect()}
    assert w == a
