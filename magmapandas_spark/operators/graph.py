"""Iterative graph analytics beyond connected components: PageRank
(beyond-reference surface — the canonical web-graph computation over a
crawl, and the second Pregel-shaped loop in the engine).

Determinism design: textbook PageRank sums float contributions, whose
partition-order summation can never be exactly oracle-checked. This
implementation therefore runs in SCALED INTEGER arithmetic — ranks are
bigints at scale ``S`` (default 1e12), the damping step is
``(85 · r) div (100 · outdeg)`` and the teleport term
``(15 · S) div (100 · N)`` — every operation an exact integer multiply
/ floored divide / bigint sum, so any engine reproduces every
iteration bit-for-bit and the gate can hash iteration 10 directly.
Truncation loses < outdeg ulps of S per node per round (≪ 1e-9
relative at the default scale) — far below float PageRank's own
iteration tolerance.

Plan shape per round (the GraphX/Pregel shape, same family as
``connected_components``): edges ⋈ ranks on src (both partitioned on
the join key, partitioned once and reused), bigint-sum aggregation on
dst, plus the teleport constant. The loop is a fixed iteration count —
no convergence probe, so rounds run with zero driver synchronization
beyond job submission; lineage is truncated per round with a lazy
localCheckpoint exactly as in the CC loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: rank scale: 1.0 of probability mass == S
SCALE = 1_000_000_000_000


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    src: str = "src",
    dst: str = "dst",
    n_partitions: int | None = None,
) -> DataFrame:
    """Scaled-integer PageRank over a directed edge list.

    Dangling nodes (outdeg 0) keep only their teleport share — their
    damped mass leaks, the standard simplification when the graph is
    crawl-shaped (sinks are rare and the ranking order is what's
    consumed). Returns (node, rank) with Σrank ≤ S.
    """
    spark = edges.sparkSession
    npart = n_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .repartition(npart, "node")
        .persist()
    )
    n_nodes = nodes.count()
    outdeg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("outdeg"))
    # (src, dst, outdeg) partitioned once on src and reused every round
    e = (
        edges.join(outdeg, on=src)
        .select(F.col(src).alias("u"), F.col(dst).alias("v"), "outdeg")
        .repartition(npart, "u")
        .persist()
    )
    e.count()
    teleport = (15 * SCALE) // (100 * n_nodes)
    ranks = nodes.select(
        "node", F.lit(SCALE // n_nodes).cast("long").alias("rank")
    )
    for _ in range(iterations):
        contribs = (
            e.join(
                ranks.select(F.col("node").alias("u"), "rank"), on="u"
            )
            .select(
                F.col("v").alias("node"),
                F.expr("(85 * rank) div (100 * outdeg)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, on="node", how="left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.coalesce(F.col("inflow"), F.lit(0))
                ).cast("long").alias("rank"),
            )
            .repartition(npart, "node")
            .localCheckpoint(eager=False)
        )
    out = ranks
    # materialize the lazy localCheckpoint chain BEFORE releasing the
    # co-partitioned edge/node caches — otherwise the caller's first
    # action replays the whole edge-prep lineage uncached, defeating
    # the partitioned-once-and-reused plan
    out.count()
    nodes.unpersist()
    e.unpersist()
    return out


# ---------------------------------------------------------------------
# Gate query: formula-generated 500-node crawl graph, 3 out-links per
# node — the oracle unrolls the identical integer recurrence in SQL.
# ---------------------------------------------------------------------

_N = 500
#: dst = (src² · a + src · b + c) % N — QUADRATIC maps, deliberately
#: non-bijective: in-degrees vary from 0 to ~10, so the stationary
#: ranks spread (an affine map is a permutation → flat PageRank →
#: a vacuous gate hash).
_LINKS = [(17, 13, 5), (3, 101, 7), (7, 29, 257)]


def synthetic_link_graph(spark: SparkSession) -> DataFrame:
    i = F.col("id")
    rows = spark.range(_N).select(
        F.explode(
            F.array(*[
                F.struct(
                    i.alias("src"),
                    ((i * i * a + i * b + c) % _N).alias("dst"),
                )
                for a, b, c in _LINKS
            ])
        ).alias("e")
    )
    return rows.select("e.src", "e.dst")


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: 10 integer-PageRank iterations over the synthetic
    500-node link graph — iteration 10's exact bigint ranks are under
    the hash (every engine must reproduce the whole trajectory).
    ``n_partitions=2`` sizes the loop's per-round shuffles to the
    1500-edge gate graph (the dedup-cluster gates' convention); at
    crawl scale size it to the edge-relation width instead."""
    pr = pagerank(
        synthetic_link_graph(spark), iterations=10, n_partitions=2
    )
    return pr.orderBy("node").coalesce(1)


def sql_pagerank(iterations: int = 10) -> str:
    links = " UNION ALL ".join(
        f"SELECT i AS src, (i * i * {a} + i * {b} + {c}) % {_N} AS dst "
        f"FROM range({_N}) t(i)"
        for a, b, c in _LINKS
    )
    s = SCALE
    rounds = []
    prev = "r0"
    for k in range(1, iterations + 1):
        rounds.append(f"""r{k} AS (
  SELECT n.node,
         CAST({15 * s} // (100 * {_N}) + COALESCE(SUM(
           (85 * p.rank) // (100 * e.outdeg)
         ), 0) AS BIGINT) AS rank
  FROM nodes n
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN {prev} p ON p.node = e.src
  GROUP BY n.node
)""")
        prev = f"r{k}"
    rounds_sql = ",\n".join(rounds)
    return f"""
WITH edges AS ({links}),
nodes AS (
  SELECT DISTINCT src AS node FROM edges
  UNION SELECT DISTINCT dst FROM edges
),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
e AS (
  SELECT edges.src, edges.dst, deg.outdeg
  FROM edges JOIN deg ON edges.src = deg.src
),
r0 AS (
  SELECT node, CAST({s} // {_N} AS BIGINT) AS rank FROM nodes
),
{rounds_sql}
SELECT node, rank FROM {prev}
ORDER BY node
"""
