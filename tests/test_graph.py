"""Integer PageRank: mass conservation, determinism, dangling
semantics, and ranking sanity."""

import pytest

from magmapandas_spark.operators.graph import (
    SCALE,
    pagerank,
    synthetic_link_graph,
)


def test_mass_bounded_and_deterministic(spark):
    edges = synthetic_link_graph(spark)
    a = pagerank(edges, iterations=5).orderBy("node").toPandas()
    b = pagerank(edges, iterations=5).orderBy("node").toPandas()
    assert a.equals(b)
    # total mass ≤ S and within truncation slack of S (no dangling
    # nodes in this graph; each round loses < 3 units per node)
    tot = int(a["rank"].sum())
    assert tot <= SCALE
    assert SCALE - tot < 500 * 3 * 5 + 500


def test_hub_outranks_orphan(spark):
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 0), (0, 1), (5, 6), (6, 5)],
        "src long, dst long",
    )
    pr = pagerank(edges, iterations=10).toPandas().set_index("node")
    # node 0 receives 4 in-links — must outrank the 2-cycle nodes
    assert pr.loc[0, "rank"] > pr.loc[5, "rank"]
    assert pr.loc[0, "rank"] > pr.loc[6, "rank"]


def test_dangling_node_keeps_teleport_only(spark):
    # 0 -> 1; 1 has no out-links (dangling): after round 1, node 1's
    # inflow comes only from 0's damped rank; node 0 gets teleport only
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    pr = pagerank(edges, iterations=1).toPandas().set_index("node")
    teleport = (15 * SCALE) // (100 * 2)
    assert pr.loc[0, "rank"] == teleport
    assert pr.loc[1, "rank"] == teleport + (85 * (SCALE // 2)) // 100


def test_personalized_pagerank_mass_concentrates_on_seeds(spark):
    """PPR sanity: seeds hold strictly more rank than the uniform
    variant gives them, and non-seed rank is pure inflow (no teleport
    leakage to non-seeds)."""
    from pyspark.sql import functions as F

    from magmapandas_spark.operators.graph import (
        _N,
        pagerank,
        personalized_pagerank,
        synthetic_link_graph,
    )

    g = synthetic_link_graph(spark)
    seeds = spark.range(0, _N, 50).select(F.col("id").alias("node"))
    ppr = personalized_pagerank(g, seeds, iterations=10, n_partitions=2)
    pr = pagerank(g, iterations=10, n_partitions=2)
    j = (
        ppr.withColumnRenamed("rank", "ppr")
        .join(pr.withColumnRenamed("rank", "pr"), "node")
        .join(seeds.withColumn("is_seed", F.lit(1)), "node", "left")
    )
    seed_mass = j.filter("is_seed = 1").agg(
        F.sum("ppr").alias("p"), F.sum("pr").alias("u")
    ).first()
    assert seed_mass.p > seed_mass.u  # teleport concentrates on seeds
    # an unreachable-from-seeds node with no inflow has rank exactly 0
    zero = j.filter("is_seed IS NULL AND ppr = 0").count()
    nonzero_nonseed = j.filter("is_seed IS NULL AND ppr > 0").count()
    assert nonzero_nonseed > 0  # mass genuinely propagates off-seed
    assert zero >= 0


def test_two_hop_supernode_cap_bounds_a_one_hub_graph(spark):
    """The max_degree guard truncates a star hub's middle-role
    adjacency: exactly max_degree spokes keep their 2-hop reach, the
    rest fall back to their (uncapped) 1-hop reach, and the hub is
    the only node flagged capped."""
    from magmapandas_spark.operators.graph import two_hop_reach

    n_spokes, k = 200, 10
    edges = spark.range(1, n_spokes + 1).selectExpr(
        "CAST(0 AS BIGINT) AS src", "id AS dst"
    )
    out = (
        two_hop_reach(edges, top_k=n_spokes + 1, max_degree=k)
        .toPandas()
        .set_index("node")
    )
    # hub: degree n_spokes, reach unaffected (1-hop side is uncapped)
    assert bool(out.loc[0, "capped"]) is True
    assert int(out.loc[0, "reach_2hop"]) == n_spokes
    spokes = out.drop(index=0)
    assert not spokes["capped"].any()
    # kept spokes reach hub + (k-1) surviving siblings; dropped
    # spokes reach only the hub — the deg² fan-out is gone
    counts = spokes["reach_2hop"].value_counts().to_dict()
    assert counts == {k: k, 1: n_spokes - k}
    # determinism of the hash-truncated adjacency
    again = (
        two_hop_reach(edges, top_k=n_spokes + 1, max_degree=k)
        .toPandas()
        .set_index("node")
    )
    assert out.equals(again)


def test_two_hop_cap_above_max_degree_is_exact(spark):
    """A bound above the graph's max degree keeps results identical
    to the uncapped run (gate posture: max_degree=1000)."""
    from magmapandas_spark.operators.graph import (
        synthetic_tri_graph,
        two_hop_reach,
    )

    edges = synthetic_tri_graph(spark)
    exact = two_hop_reach(edges).drop("capped").toPandas()
    capped = two_hop_reach(edges, max_degree=1000).toPandas()
    assert not capped["capped"].any()
    assert exact.equals(capped.drop(columns=["capped"]))
