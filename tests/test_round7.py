"""Round-7 operator properties: association rules, robust stats,
spatial grid join, DP randomized response, JL projection, min-label
propagation, zone maps. Exact cross-engine equality for every gate
query is covered by tests/test_oracle.py; these pin the semantic
invariants the oracles can't express."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- assoc


def test_copurchase_lift_bounds(spark):
    from magmapandas_spark.operators.assoc import q_copurchase_lift

    pdf = q_copurchase_lift(spark, SF).toPandas()
    assert (pdf["n_ab"] <= pdf[["n_a", "n_b"]].min(axis=1)).all()
    assert (pdf["conf_ppm"] <= 1_000_000).all()
    assert (pdf["a"] < pdf["b"]).all()
    # ranks are dense 1..k
    assert list(pdf["rank"]) == list(range(1, len(pdf) + 1))


# ---------------------------------------------------------------- robust


def test_ewma_weights_are_dyadic_exact():
    from magmapandas_spark.operators.robust import _ewma_weights

    ws = _ewma_weights()
    for j, w in enumerate(ws):
        num, den = 3**j, 4 ** (j + 1)
        assert w == num / den  # exact dyadic rational in binary64
        assert float(repr(w)) == w  # shortest-repr round-trips


def test_ewma_matches_numpy(spark):
    from magmapandas_spark.operators.robust import (
        _EWMA_LAGS,
        _ewma_weights,
        ewma_smooth,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet").filter(
        F.expr("user_id % 97 = 0")
    )
    pdf = ewma_smooth(ev).toPandas()
    src = (
        ev.select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    ws = _ewma_weights()
    got = dict(zip(pdf["event_id"], pdf["ewma"]))
    for uid, grp in src.groupby("user_id"):
        vals = grp["value"].tolist()
        for t in range(len(vals)):
            num = den = 0.0
            for j in range(min(t + 1, _EWMA_LAGS)):
                num += vals[t - j] * ws[j]
                den += ws[j]
            eid = grp["event_id"].iloc[t]
            assert got[eid] == pytest.approx(num / den, rel=1e-12)


def test_mad_outliers_sane(spark):
    from magmapandas_spark.operators.robust import q_mad_outliers

    pdf = q_mad_outliers(spark, SF).toPandas()
    assert (pdf["mad"] >= 0).all()
    assert (pdf["n_outliers"] <= pdf["n"]).all()
    assert (pdf["outlier_ppm"] <= 1_000_000).all()


# ---------------------------------------------------------------- spatial


def test_grid_nearest_is_locally_optimal(spark):
    """The reported neighbor is the true nearest among ALL candidates
    within the 3x3 neighborhood (spot-check via brute force)."""
    from magmapandas_spark.operators.spatial import (
        _with_coords,
        q_geo_nearest,
    )

    got = q_geo_nearest(spark, SF).toPandas()
    cust = _with_coords(
        spark.read.parquet(f"{SF}/customer.parquet").filter(
            F.expr("c_custkey % 11 = 0")
        ),
        "c_custkey",
    ).toPandas()
    supp = _with_coords(
        spark.read.parquet(f"{SF}/supplier.parquet"), "s_suppkey"
    ).toPandas()
    cell = 10_000_000
    for _, row in got.head(20).iterrows():
        p = cust[cust["k"] == row["probe_key"]].iloc[0]
        px, py = p["lon"] // cell, p["lat"] // cell
        cand = supp[
            (abs(supp["lon"] // cell - px) <= 1)
            & (abs(supp["lat"] // cell - py) <= 1)
        ]
        assert len(cand) == row["n_candidates"]
        if len(cand) == 0:
            assert row["nearest_key"] is None or np.isnan(row["nearest_key"])
            continue
        d2 = (cand["lat"] - p["lat"]) ** 2 + (cand["lon"] - p["lon"]) ** 2
        assert row["d2"] == d2.min()


# ---------------------------------------------------------------- privacy


def test_randomized_response_debias(spark):
    """est_ppm is the debiased estimator: 2*obs - 0.5 in ppm, and the
    mechanism flips ~1/4 of users."""
    from magmapandas_spark.operators.privacy import q_randomized_response

    pdf = q_randomized_response(spark, SF).toPandas()
    assert (
        pdf["est_ppm"]
        == 2 * pdf["n_reported"] * 1_000_000 // pdf["n"] - 500_000
    ).all()
    # estimate should be in a plausible band around the truth for the
    # aggregate over all segments
    n = pdf["n"].sum()
    est = (pdf["est_ppm"] * pdf["n"]).sum() / n
    true = (pdf["true_ppm"] * pdf["n"]).sum() / n
    # std of the estimator is ~ 2*sqrt(3/16/n) in rate units
    assert abs(est - true) < 4 * 2 * np.sqrt(3.0 / 16.0 / n) * 1_000_000


# ------------------------------------------------------------- projection


def test_projection_matches_numpy(spark):
    from magmapandas_spark.operators.projection import (
        _D_OUT,
        _signs,
        project_embeddings,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(5)
    pdf = project_embeddings(emb).toPandas()
    signs = np.array(_signs(), dtype=np.float64)
    for _, row in pdf.iterrows():
        v = np.array(row["embedding"], dtype=np.float64)
        for j in range(_D_OUT):
            # same left-to-right order as the generated expression
            acc = 0.0
            for i, x in enumerate(v):
                acc = acc + x * signs[j][i]
            assert row[f"p{j}"] == acc


def test_signs_are_seeded_and_balanced():
    from magmapandas_spark.operators.projection import _signs

    s = np.array(_signs())
    assert set(np.unique(s)) == {-1, 1}
    # md5-seeded: deterministic across processes
    h = hashlib.md5(str(s.tolist()).encode()).hexdigest()
    assert h == hashlib.md5(str(_signs()).encode()).hexdigest()
    # roughly balanced (binomial bound)
    assert abs(int(s.sum())) < 4 * np.sqrt(s.size)


# ------------------------------------------------------------------ graph


def test_label_propagation_refines_toward_cc(spark):
    """After k rounds every label is >= the component minimum, and
    labels only decrease with more rounds."""
    from magmapandas_spark.operators.graph import (
        min_label_propagation,
        synthetic_tri_graph,
    )

    g = synthetic_tri_graph(spark)
    l2 = min_label_propagation(g, rounds=2).toPandas()
    l4 = min_label_propagation(g, rounds=4).toPandas()
    m2 = dict(zip(l2["node"], l2["community"]))
    m4 = dict(zip(l4["node"], l4["community"]))
    assert set(m2) == set(m4)
    assert all(m4[n] <= m2[n] for n in m2)
    assert all(m4[n] <= n for n in m4)


# ------------------------------------------------------------------ stats


def test_zonemap_clustered_prunes_more(spark):
    from magmapandas_spark.operators.stats import q_zonemap_prune

    pdf = q_zonemap_prune(spark, SF).toPandas().set_index("layout")
    assert (
        pdf.loc["clustered", "files_pruned"]
        >= pdf.loc["insertion", "files_pruned"]
    )
    # both layouts agree on the ground truth
    assert (
        pdf.loc["clustered", "rows_matched"]
        == pdf.loc["insertion", "rows_matched"]
    )
    assert (
        pdf.loc["clustered", "rows_total"]
        == pdf.loc["insertion", "rows_total"]
    )
    # scanning never misses a match
    assert (pdf["rows_scanned"] >= pdf["rows_matched"]).all()


# ------------------------------------------------------------- evaluation


def test_retrieval_eval_invariants(spark):
    from magmapandas_spark.operators.evaluation import q_retrieval_eval

    pdf = q_retrieval_eval(spark, SF).toPandas()
    assert (pdf["p_at_10_ppm"] <= 1_000_000).all()
    has_rel = pdf["n_relevant"] > 0
    assert pdf.loc[has_rel, "first_rel_rank"].notna().all()
    assert (
        pdf.loc[has_rel, "mrr_ppm"]
        == 1_000_000 // pdf.loc[has_rel, "first_rel_rank"]
    ).all()
