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
