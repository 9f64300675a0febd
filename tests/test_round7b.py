"""Round-7 second-wave properties: skyline vs brute force, SNM recall
semantics, k-fold leakage, RFM bin structure, bigram LM bounds."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_skyline_equals_brute_force(spark):
    """The linear level-window pass computes EXACTLY the textbook
    NOT-EXISTS skyline (strict-in-one dominance)."""
    from magmapandas_spark.operators.skyline import skyline

    parts = spark.read.parquet(f"{SF}/part.parquet")
    got = set(
        skyline(parts, "p_retailprice", "p_size", "p_partkey")
        .toPandas()["p_partkey"]
    )
    pdf = parts.select("p_partkey", "p_retailprice", "p_size").toPandas()
    price = pdf["p_retailprice"].to_numpy()
    size = pdf["p_size"].to_numpy()
    exp = set()
    for i in range(len(pdf)):
        dominated = (
            (price <= price[i])
            & (size >= size[i])
            & ((price < price[i]) | (size > size[i]))
        ).any()
        if not dominated:
            exp.add(int(pdf["p_partkey"].iloc[i]))
    assert got == exp


def test_snm_pairs_verified_and_canonical(spark):
    from magmapandas_spark.operators.fuzzy import q_snm_pairs

    pdf = q_snm_pairs(spark, SF).toPandas()
    assert (pdf["dist"] >= 1).all() and (pdf["dist"] <= 3).all()
    # canonical orientation: no pair appears twice
    keys = set(map(tuple, pdf[["id_a", "id_b"]].to_numpy()))
    assert len(keys) == len(pdf)
    assert all((a, b) not in keys or (b, a) not in keys for a, b in keys)
    # every reported pair shares the 2-char prefix block
    assert (
        pdf["key_a"].str[:2] == pdf["key_b"].str[:2]
    ).all()


def test_kfold_no_leakage_and_covers(spark):
    from magmapandas_spark.operators.curation import q_kfold_split

    pdf = q_kfold_split(spark, SF).toPandas()
    assert (pdf["leaked_groups"] == 0).all()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert pdf["n_rows"].sum() == ev.count()
    assert (
        pdf["n_groups"].sum()
        == ev.select("user_id").distinct().count()
    )


def test_rfm_bins_partition_customers(spark):
    from magmapandas_spark.operators.analytics import q_rfm_segments

    pdf = q_rfm_segments(spark, SF).toPandas()
    segs = pdf["segment"].to_numpy()
    assert ((segs >= 111) & (segs <= 555)).all()
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    assert (
        pdf["n_customers"].sum()
        == orders.select("o_custkey").distinct().count()
    )


def test_bigram_lm_scores_bounded(spark):
    from magmapandas_spark.operators.curation import q_bigram_lm

    pdf = q_bigram_lm(spark, SF).toPandas()
    assert (pdf["score_ppm"] <= 1_000_000).all()
    assert (pdf["score_ppm"] >= 0).all()
    assert (pdf["n_bigrams"] >= 1).all()
    # descending by score
    s = pdf["score_ppm"].to_numpy()
    assert (s[:-1] >= s[1:]).all()


def test_setsim_join_equals_brute_force(spark):
    """Prefix filtering loses NO pair with Jaccard >= 3/5 (the
    AllPairs pigeonhole guarantee), and reports exact intersections —
    checked against brute force over all document pairs."""
    from itertools import combinations

    import re as _re

    from magmapandas_spark.operators.setjoin import q_setsim_join

    got = q_setsim_join(spark, SF).toPandas()
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    sets = {}
    for _, r in docs.iterrows():
        t = [
            x
            for x in _re.split("[^a-z0-9]+", str(r["text"]).lower())
            if x != ""
        ]
        sets[int(r["doc_id"])] = {
            " ".join(t[i : i + 3]) for i in range(len(t) - 2)
        }
    exp = {}
    for a, b in combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        i = len(sa & sb)
        u = len(sa) + len(sb) - i
        if u and i * 1_000_000 // u >= 600_000:
            exp[(a, b)] = (i, len(sa), len(sb))
    gotmap = {
        (int(r["doc_a"]), int(r["doc_b"])): (
            int(r["n_inter"]),
            int(r["s_a"]),
            int(r["s_b"]),
        )
        for _, r in got.iterrows()
    }
    assert gotmap == exp


def test_winsorized_stats_invariants(spark):
    from magmapandas_spark.operators.analytics import q_winsorized_stats

    pdf = q_winsorized_stats(spark, SF).toPandas()
    assert (pdf["lo"] <= pdf["hi"]).all()
    assert (pdf["wins_mean"] >= pdf["lo"]).all()
    assert (pdf["wins_mean"] <= pdf["hi"]).all()
    # ~5% clipped each side (integer-rank rounding tolerance)
    frac_lo = pdf["n_clip_lo"] / pdf["n"]
    frac_hi = pdf["n_clip_hi"] / pdf["n"]
    assert (frac_lo <= 0.06).all() and (frac_hi <= 0.06).all()


def test_dominant_suppliers_shares_verified(spark):
    from magmapandas_spark.operators.analytics import q_dominant_suppliers

    pdf = q_dominant_suppliers(spark, SF).toPandas()
    assert (pdf["n_dominant_parts"] >= 1).all()
    # keys resolve to real suppliers
    supp = set(
        spark.read.parquet(f"{SF}/supplier.parquet")
        .toPandas()["s_suppkey"]
    )
    assert set(pdf["s_suppkey"]) <= supp


def test_cusum_identity_matches_recursion(spark):
    """The window identity S = P - min(0, running-min P) equals the
    textbook recursion S_i = max(0, S_{i-1} + y_i) — re-derived in
    plain Python per group."""
    from magmapandas_spark.operators.timeseries import cusum_hourly

    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = cusum_hourly(ev).toPandas().set_index("event_type")
    pdf = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .count()
        .toPandas()
    )
    for g, grp in pdf.groupby("event_type"):
        grp = grp.sort_values("h")
        n_hours, total = len(grp), int(grp["count"].sum())
        s = 0
        max_s = 0
        alarms = 0
        for c in grp["count"]:
            s = max(0, s + int(c) * n_hours - total)
            max_s = max(max_s, s)
            if s > 10 * total:
                alarms += 1
        assert int(got.loc[g, "max_s"]) == max_s
        assert int(got.loc[g, "n_alarms"]) == alarms


def test_kcore_is_fixpoint_consistent(spark):
    """Every survivor of the 3-round peel has core_degree >= k within
    the surviving set, and peeling is monotone (rounds only shrink)."""
    from magmapandas_spark.operators.graph import (
        kcore_peel,
        synthetic_tri_graph,
    )

    g = synthetic_tri_graph(spark)
    r2 = set(kcore_peel(g, k=10, rounds=2).toPandas()["node"])
    r3 = set(kcore_peel(g, k=10, rounds=3).toPandas()["node"])
    r4 = set(kcore_peel(g, k=10, rounds=4).toPandas()["node"])
    assert r3 <= r2
    assert r4 <= r3

    edges = g.toPandas()
    und = {
        (min(s, d), max(s, d))
        for s, d in zip(edges["src"], edges["dst"])
        if s != d
    }

    def induced_degrees(alive: set) -> dict:
        deg = {}
        for u, v in und:
            if u in alive and v in alive:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
        return deg

    # Round-4 survivors are EXACTLY the round-3 nodes whose round-3
    # induced degree is >= k — verify both directions against
    # independently recomputed pandas degrees. For k=10 this graph's
    # core empties at round 4 (all 56 r3 survivors sit below 10), so
    # also verify the invariant at k=8, where the 200-node core is a
    # genuine fixpoint.
    deg3 = induced_degrees(r3)
    assert r4 == {n for n in r3 if deg3.get(n, 0) >= 10}

    r3_8 = set(kcore_peel(g, k=8, rounds=3).toPandas()["node"])
    r4_8 = set(kcore_peel(g, k=8, rounds=4).toPandas()["node"])
    assert r4_8, "k=8 core unexpectedly empty"
    deg3_8 = induced_degrees(r3_8)
    assert r4_8 == {n for n in r3_8 if deg3_8.get(n, 0) >= 8}
    for node in r4_8:
        assert deg3_8[node] >= 8


def test_triangle_downsample_structure(spark):
    from magmapandas_spark.operators.timeseries import triangle_downsample

    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = triangle_downsample(ev).toPandas()
    src = ev.toPandas()
    for g, grp in src.groupby("event_type"):
        sel = got[got["event_type"] == g]
        # at most n_buckets middles + 2 endpoints, at least endpoints
        assert 2 <= len(sel) <= 34
        grp = grp.sort_values(["ts", "event_id"])
        first, last = grp["event_id"].iloc[0], grp["event_id"].iloc[-1]
        assert first in set(sel["event_id"])
        assert last in set(sel["event_id"])


def test_lsh_recall_eval_bounds(spark):
    from magmapandas_spark.operators.evaluation import q_lsh_recall_eval

    pdf = q_lsh_recall_eval(spark, SF).toPandas()
    r = pdf.iloc[0]
    assert r["n_hits"] <= min(r["n_truth"], r["n_candidates"])
    assert 0 <= r["recall_ppm"] <= 1_000_000
    assert r["candidate_excess"] == r["n_candidates"] - r["n_hits"]


def test_er_golden_members_cover_pairs(spark):
    from magmapandas_spark.operators.fuzzy import (
        q_er_golden,
        sorted_neighborhood_pairs,
    )

    got = q_er_golden(spark, SF).toPandas()
    parts = spark.read.parquet(f"{SF}/part.parquet")
    pairs = sorted_neighborhood_pairs(
        parts, "p_name", "p_partkey"
    ).toPandas()
    nodes = set(pairs["id_a"]) | set(pairs["id_b"])
    assert got["n_members"].sum() == len(nodes)
    assert (got["n_members"] >= 1).all()
    assert set(got["golden_key"]) <= nodes


def test_benford_audit_structure(spark):
    from magmapandas_spark.operators.validation import (
        BENFORD_PPM,
        q_benford_audit,
    )

    pdf = q_benford_audit(spark, SF).toPandas()
    assert list(pdf["digit"]) == list(range(1, 10))
    assert list(pdf["exp_ppm"]) == BENFORD_PPM
    assert abs(sum(BENFORD_PPM) - 1_000_000) <= 10
    assert (pdf["obs_ppm"] <= 1_000_000).all()


def test_bootstrap_ci_brackets_estimate(spark):
    from magmapandas_spark.operators.stats import q_bootstrap_ci

    pdf = q_bootstrap_ci(spark, SF).toPandas()
    assert (pdf["ci_lo"] <= pdf["ci_hi"]).all()
    # the point estimate should lie inside (or extremely near) the CI
    assert (pdf["mean_est"] >= pdf["ci_lo"] - 1e-9).all()
    assert (pdf["mean_est"] <= pdf["ci_hi"] + 1e-9).all()
    # interval width shrinks with n at the usual 1/sqrt(n) order:
    # crude sanity — width below half the estimate for n >= 100
    big = pdf[pdf["n"] >= 100]
    assert (
        (big["ci_hi"] - big["ci_lo"]) < big["mean_est"].abs() * 0.5 + 1.0
    ).all()
