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
