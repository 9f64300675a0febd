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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: rank scale: 1.0 of probability mass == S
SCALE = 1_000_000_000_000


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    src: str = "src",
    dst: str = "dst",
    n_partitions: int | None = None,
    checkpoint_interval: int = 5,
) -> DataFrame:
    """Scaled-integer PageRank over a directed edge list.

    Dangling nodes (outdeg 0) keep only their teleport share — their
    damped mass leaks, the standard simplification when the graph is
    crawl-shaped (sinks are rare and the ranking order is what's
    consumed). Returns (node, rank) with Σrank ≤ S.

    ``checkpoint_interval``: lineage is cut (lazy localCheckpoint)
    every k-th round instead of every round — the GraphX
    ``checkpointInterval`` convention. Each cut costs a full
    analyze/optimize/plan pass on the driver (measured ~0.3 s per
    round at gate scale: the loop was 75 % driver-side planning,
    3.1 s build vs 0.06 s execution), while the cut's benefit —
    bounded recovery/lineage depth — needs only PERIODIC cuts.
    Ranks are identical for any interval (the integer recurrence
    does not depend on where lineage is truncated; A/B-verified for
    k ∈ {1, 2, 5, 10}).
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
    for i in range(iterations):
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
        ranks = nodes.join(contribs, on="node", how="left").select(
            "node",
            (
                F.lit(teleport)
                + F.coalesce(F.col("inflow"), F.lit(0))
            ).cast("long").alias("rank"),
        )
        if (i + 1) % checkpoint_interval == 0 or i == iterations - 1:
            ranks = ranks.repartition(npart, "node").localCheckpoint(
                eager=False
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


# ---------------------------------------------------------------------
# Triangle counting (degree-ordered orientation) — the clustering /
# community-structure primitive over a crawl link graph.
# ---------------------------------------------------------------------


def triangle_count(edges: DataFrame, top_k: int = 20) -> DataFrame:
    """Exact triangle counting via degree-ordered edge orientation.

    Canonicalizes to undirected simple edges, orients every edge from
    its lower-(degree, id) endpoint to the higher one, then counts
    directed wedges closed by a third oriented edge. Orientation is
    the scale lever: each oriented out-adjacency is bounded by
    O(sqrt(m)) (the arboricity argument behind the classic MapReduce
    formulation), so the wedge join emits O(m^1.5) candidate rows
    worst-case instead of Sum(deg^2) — on a power-law crawl graph the
    difference between feasible and not. All three joins are
    equi-joins shuffled on their keys; nothing is quadratic in nodes.

    Returns the ``top_k`` nodes by triangle participation
    (ties broken on node id) with the global edge / wedge / triangle
    counts and the transitivity ratio ``3·T·10⁶ div wedges`` repeated
    per row — every value an exact integer, so the whole result sits
    under a cross-engine hash.
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # total-order orientation key: degree first, node id tie-break
    key = (F.col("d") * F.lit(1_000_000) + F.col("node")).alias("k")
    dk = deg.select("node", key)
    ork = (
        und.join(dk.withColumnsRenamed({"node": "u", "k": "ku"}), on="u")
        .join(dk.withColumnsRenamed({"node": "v", "k": "kv"}), on="v")
    )
    o = ork.select(
        F.when(F.col("ku") < F.col("kv"), F.col("u"))
        .otherwise(F.col("v"))
        .alias("s"),
        F.when(F.col("ku") < F.col("kv"), F.col("v"))
        .otherwise(F.col("u"))
        .alias("t"),
    )
    e1 = o.select(F.col("s").alias("x"), F.col("t").alias("y"))
    e2 = o.select(F.col("s").alias("y"), F.col("t").alias("z"))
    e3 = o.select(F.col("s").alias("x"), F.col("t").alias("z"))
    tri = e1.join(e2, on="y").join(e3, on=["x", "z"])
    # global stats as one-row relations broadcast-crossed onto the
    # top-k — zero driver actions, no caching: the tri subtree
    # appears twice in the final plan and ReuseExchange dedups its
    # shuffles, so the wedge join still runs once per query
    # (deg-side stats: Σd = 2m recovers the edge count, so und is
    # only scanned once through the deg aggregation)
    gdeg = deg.agg(
        F.expr("sum(d) div 2").cast("long").alias("n_edges"),
        F.expr("sum((d * (d - 1)) div 2)").cast("long").alias(
            "_wedges"
        ),
    )
    gtri = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    per_node = (
        tri.select(
            F.explode(F.array("x", "y", "z")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri_count"))
        .orderBy(F.desc("tri_count"), "node")
        .limit(top_k)
    )
    return (
        per_node.crossJoin(F.broadcast(gtri))
        .crossJoin(F.broadcast(gdeg))
        .select(
            "node",
            "tri_count",
            "n_edges",
            "n_triangles",
            F.when(
                F.col("_wedges") > 0,
                F.expr(
                    "(3 * n_triangles * 1000000) div _wedges"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("transitivity_ppm"),
        )
    )


#: triangle gate graph: denser than the PageRank one (six quadratic
#: maps over 400 nodes → 2348 undirected edges, 564 triangles) so the
#: count exercises real wedge-closure volume
_TRI_N = 400
_TRI_LINKS = [
    (17, 13, 5), (3, 101, 7), (7, 29, 257),
    (11, 53, 19), (23, 71, 3), (5, 91, 127),
]


def synthetic_tri_graph(spark: SparkSession) -> DataFrame:
    i = F.col("id")
    rows = spark.range(_TRI_N).select(
        F.explode(
            F.array(*[
                F.struct(
                    i.alias("src"),
                    ((i * i * a + i * b + c) % _TRI_N).alias("dst"),
                )
                for a, b, c in _TRI_LINKS
            ])
        ).alias("e")
    )
    return rows.select("e.src", "e.dst")


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: exact degree-ordered triangle count over the
    400-node synthetic link graph — top-20 nodes by triangle
    participation plus global triangle / wedge statistics, all exact
    integers under the cross-engine hash."""
    return triangle_count(synthetic_tri_graph(spark), top_k=20).orderBy(
        F.desc("tri_count"), "node"
    )


def _tri_links_sql() -> str:
    return " UNION ALL ".join(
        f"SELECT i AS src, (i * i * {a} + i * {b} + {c}) % {_TRI_N}"
        f" AS dst FROM range({_TRI_N}) t(i)"
        for a, b, c in _TRI_LINKS
    )


SQL_TRIANGLE_COUNT = f"""
WITH raw AS ({_tri_links_sql()}),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM raw WHERE src <> dst
),
deg AS (
  SELECT node, COUNT(*) AS d
  FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
  GROUP BY node
),
ork AS (
  SELECT e.u, e.v,
         du.d * 1000000 + e.u AS ku, dv.d * 1000000 + e.v AS kv
  FROM und e
  JOIN deg du ON du.node = e.u
  JOIN deg dv ON dv.node = e.v
),
o AS (
  SELECT CASE WHEN ku < kv THEN u ELSE v END AS s,
         CASE WHEN ku < kv THEN v ELSE u END AS t
  FROM ork
),
tri AS (
  SELECT e1.s AS x, e1.t AS y, e2.t AS z
  FROM o e1
  JOIN o e2 ON e2.s = e1.t
  JOIN o e3 ON e3.s = e1.s AND e3.t = e2.t
),
globals AS (
  SELECT
    (SELECT COUNT(*) FROM und) AS n_edges,
    (SELECT COUNT(*) FROM tri) AS n_triangles,
    (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) FROM deg) AS wedges
),
per_node AS (
  SELECT node, COUNT(*) AS tri_count
  FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  )
  GROUP BY node
  ORDER BY tri_count DESC, node
  LIMIT 20
)
SELECT p.node, p.tri_count, g.n_edges, g.n_triangles,
       CASE WHEN g.wedges > 0
            THEN 3 * g.n_triangles * 1000000 // g.wedges
            ELSE 0 END AS transitivity_ppm
FROM per_node p CROSS JOIN globals g
ORDER BY p.tri_count DESC, p.node
"""


# ---------------------------------------------------------------------
# Synchronous min-label propagation (fixed-round community detection)
# ---------------------------------------------------------------------


def min_label_propagation(
    edges: DataFrame, rounds: int = 4
) -> DataFrame:
    """Fixed-round synchronous min-label propagation over an
    undirected graph: every node starts labeled with its own id and
    each round takes the min of its label and its neighbors' labels.

    Fixed ``rounds`` (not run-to-convergence) keeps the computation
    exactly replayable by an unrolled SQL oracle; the converged
    variant is the existing distributed connected-components loop
    (operators/dedup.py) — this operator is its bounded-round,
    hash-checkable twin.

    Scale posture: per round, one join of the label relation against
    the symmetrized edge list (both keyed on node — AQE co-partitions
    the repeat joins) and one min-aggregation. Label state is one row
    per node; round count is the graph-diameter bound the caller
    chooses. Returns (node, community).
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )
    # Materialize the edge cache once and the label state once per
    # round — the same fix as kcore_peel (r14): left lazy, round r's
    # plan references labels_{r-1} TWICE (the neighbor-min join and
    # the label update join), so the edge/label subtree count grows
    # as 2^rounds (31 copies of the distinct+union pipeline at the
    # default rounds=4), re-planned and re-executed wherever exchange
    # reuse misses. Label state is one row per node (bounded);
    # values unchanged (least/min see the same inputs).
    sym = (
        und.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionByName(und.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .localCheckpoint(eager=True)
    )
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("lbl"))
    for _ in range(rounds):
        nmin = (
            sym.join(
                labels.select(
                    F.col("node").alias("b"), F.col("lbl").alias("blbl")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("blbl").alias("nmin"))
        )
        labels = (
            labels.join(
                nmin.withColumnRenamed("a", "node"), "node", "left"
            )
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nmin"), F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("lbl").alias("community"))


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: 2-round min-label communities over the synthetic
    400-node link graph — top-20 communities by size, exact integers.
    Two rounds leave 14 mid-merge communities (4 rounds fully collapse
    this dense graph to one label — no gate signal)."""
    labels = min_label_propagation(synthetic_tri_graph(spark), rounds=2)
    sizes = labels.groupBy("community").agg(
        F.count(F.lit(1)).alias("size")
    )
    # distributed top-k (orderBy+limit), then rank the 20 survivors
    top = sizes.orderBy(F.desc("size"), "community").limit(20)
    w = Window.orderBy(F.desc("size"), "community")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", "community", "size")
        .orderBy("rank")
    )


def _sql_label_propagation(rounds: int = 4) -> str:
    ctes = [
        f"raw AS ({_tri_links_sql()})",
        """und AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM raw WHERE src <> dst
)""",
        """sym AS (
  SELECT u AS a, v AS b FROM und
  UNION ALL SELECT v AS a, u AS b FROM und
)""",
        "nodes AS (SELECT DISTINCT a AS node FROM sym)",
        "l0 AS (SELECT node, node AS lbl FROM nodes)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""l{r} AS (
  SELECT n.node,
         LEAST(n.lbl, COALESCE(MIN(p.lbl), n.lbl)) AS lbl
  FROM l{r - 1} n
  LEFT JOIN sym s ON s.a = n.node
  LEFT JOIN l{r - 1} p ON p.node = s.b
  GROUP BY n.node, n.lbl
)"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body},
sizes AS (
  SELECT lbl AS community, COUNT(*) AS size FROM l{rounds} GROUP BY lbl
)
SELECT ROW_NUMBER() OVER (ORDER BY size DESC, community) AS rank,
       community, size
FROM sizes
QUALIFY rank <= 20
ORDER BY rank
"""


SQL_LABEL_PROPAGATION = _sql_label_propagation(rounds=2)


# ---------------------------------------------------------------------
# Bounded-round k-core peeling
# ---------------------------------------------------------------------


def kcore_peel(edges: DataFrame, k: int = 10, rounds: int = 3) -> DataFrame:
    """Fixed-round k-core peeling: each round recomputes degrees over
    the surviving induced subgraph and drops nodes with degree < k.

    Fixed ``rounds`` (not peel-to-fixpoint) keeps the oracle an
    unrolled CTE chain — the same bounded-round discipline as
    min-label propagation; the fixpoint variant is a Pregel loop of
    the identical round body. Returns the surviving nodes with their
    within-subgraph degree after the last round.

    Scale posture: each round is one join of the symmetrized edge
    list against the surviving-node set (semi-join shape, keyed on
    node) and one count aggregation — no state beyond the node set.
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )
    # Materialize the symmetrized edge list ONCE (the loop's edge
    # cache — same posture as pagerank's persisted `e`), and the
    # surviving-node set once per round. Left lazy, round r's plan
    # contained round r-1's subtree TWICE (both semi-join sides), so
    # the `sym` subtree appeared 2 + 2·(previous) times — 14 copies
    # of the distinct+union pipeline by round 3, re-planned and
    # re-executed wherever exchange reuse missed. With the cuts the
    # per-round plan is one join pair over two ExistingRDD scans;
    # `alive` is node-grain (bounded by |V|), `sym` is the edge
    # relation every round consumes anyway. Values unchanged
    # (A/B-verified: identical survivor/degree output).
    sym = (
        und.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionByName(und.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .localCheckpoint(eager=True)
    )
    alive = sym.select(F.col("a").alias("node")).distinct()
    for _ in range(rounds):
        alive = (
            sym.join(
                alive.select(F.col("node").alias("a")), "a"
            )
            .join(alive.select(F.col("node").alias("b")), "b")
            .groupBy("a")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select(F.col("a").alias("node"))
            .localCheckpoint(eager=True)
        )
    # LEFT join the degree report onto the surviving node set: a
    # survivor whose within-core neighbors were all peeled this round
    # has core_degree 0 and must still appear (an inner join silently
    # dropped such nodes — caught by the r8 fixpoint test, where the
    # k=10 round-4 core is exactly four mutually-disconnected nodes)
    deg = (
        sym.join(alive.select(F.col("node").alias("a")), "a")
        .join(alive.select(F.col("node").alias("b")), "b")
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .select(F.col("a").alias("node"), "core_degree")
    )
    return (
        alive.join(deg, "node", "left")
        .select(
            "node",
            F.coalesce("core_degree", F.lit(0)).cast("long").alias(
                "core_degree"
            ),
        )
        .orderBy("node")
    )


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: 3-round 10-core peel of the synthetic 400-node
    link graph (400 -> 200 -> 128 -> 56 survivors) with final
    within-core degrees, all exact integers."""
    return kcore_peel(synthetic_tri_graph(spark), k=10, rounds=3)


def _sql_kcore(k: int = 10, rounds: int = 3) -> str:
    ctes = [
        f"raw AS ({_tri_links_sql()})",
        """und AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM raw WHERE src <> dst
)""",
        """sym AS (
  SELECT u AS a, v AS b FROM und
  UNION ALL SELECT v AS a, u AS b FROM und
)""",
        "n0 AS (SELECT DISTINCT a AS node FROM sym)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""n{r} AS (
  SELECT s.a AS node FROM sym s
  JOIN n{r - 1} x ON x.node = s.a
  JOIN n{r - 1} y ON y.node = s.b
  GROUP BY s.a HAVING COUNT(*) >= {k}
)"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT x.node, CAST(COALESCE(d.core_degree, 0) AS BIGINT) AS core_degree
FROM n{rounds} x
LEFT JOIN (
  SELECT s.a AS node, COUNT(*) AS core_degree
  FROM sym s
  JOIN n{rounds} p ON p.node = s.a
  JOIN n{rounds} q ON q.node = s.b
  GROUP BY s.a
) d ON d.node = x.node
ORDER BY x.node
"""


SQL_KCORE = _sql_kcore()


# ---------------------------------------------------------------------
# Two-hop neighborhood reach (round 8)
# ---------------------------------------------------------------------


def two_hop_reach(
    edges: DataFrame, top_k: int = 30, max_degree: int | None = None
) -> DataFrame:
    """Per-node count of distinct nodes within ≤ 2 undirected hops
    (friend-of-friend reach, excluding the node itself), with the
    one-hop degree and a ``capped`` flag beside it; top-k by reach.

    Scale posture: the 2-hop pair generation is ONE equi-join of the
    symmetrized edge list with itself keyed on the middle node — its
    raw fan-out is Σ deg(v)², which a single power-law hub turns
    quadratic (the classic skewed shuffle-key killer). ``max_degree``
    is the supernode guard (the SemDeDup ``max_cell_rows``
    discipline): a middle node's adjacency is deterministically
    truncated to its ``max_degree`` lowest-``xxhash64`` neighbors
    before the join, bounding per-key fan-out at max_degree² — a
    documented approximation that can only MISS 2-hop reach routed
    through a capped hub, never invent it. The per-key truncation is
    a row_number window PARTITIONED BY the middle node (per-key sort
    is deg·log deg, output ≤ max_degree — not the deg² pair blow-up).
    ``capped`` marks nodes whose own adjacency was truncated in the
    middle role (deg > max_degree); with ``max_degree=None`` (or a
    bound above the graph's max degree) results are exact and every
    flag is false. The distinct + count aggregate is keyed on the
    source node, and the top-k is orderBy().limit()
    (TakeOrderedAndProject), never a global rank window.
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )
    sym = und.select(
        F.col("u").alias("a"), F.col("v").alias("b")
    ).unionByName(und.select(F.col("v").alias("a"), F.col("u").alias("b")))
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    if max_degree is None:
        mid = sym
    else:
        # supernode guard: keep each middle node's max_degree
        # lowest-hash neighbors (deterministic, order-free)
        w = Window.partitionBy("b").orderBy(F.xxhash64("a"), "a")
        mid = (
            sym.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_degree)
            .drop("_rn")
        )
    # mid rows are (a = neighbor, b = middle) with the MIDDLE node's
    # adjacency capped; e2 swaps the same relation to (b = middle,
    # c = neighbor) so both sides of a middle draw from the identical
    # capped neighbor set — per-key fan-out ≤ max_degree² by
    # construction (renaming a→b instead would key e2 on the UNCAPPED
    # per-source adjacency and reopen the hub blow-up)
    hop2 = (
        mid.alias("e1")
        .join(
            mid.select(
                F.col("b"), F.col("a").alias("c")
            ).alias("e2"),
            "b",
        )
        .select(F.col("a"), F.col("c").alias("r"))
        .filter(F.col("a") != F.col("r"))
    )
    reach = (
        sym.select("a", F.col("b").alias("r"))
        .unionByName(hop2)
        .distinct()
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("reach_2hop"))
    )
    capped = (
        F.lit(False)
        if max_degree is None
        else (F.col("deg") > F.lit(max_degree))
    )
    return (
        reach.join(deg, "a")
        .select(
            F.col("a").alias("node"),
            "deg",
            "reach_2hop",
            capped.alias("capped"),
        )
        .orderBy(F.desc("reach_2hop"), "node")
        .limit(top_k)
    )


def q_two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: top-30 nodes of the 400-node synthetic link graph
    by distinct ≤ 2-hop reach, exact integers. max_degree=1000 sits
    above the graph's max degree, so the supernode guard is engaged
    (the capped plan shape runs) while every reach stays exact and
    every ``capped`` flag is provably false under the oracle hash."""
    return two_hop_reach(synthetic_tri_graph(spark), max_degree=1000)


SQL_TWO_HOP_REACH = f"""
WITH raw AS ({_tri_links_sql()}),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM raw WHERE src <> dst
),
sym AS (
  SELECT u AS a, v AS b FROM und
  UNION ALL SELECT v AS a, u AS b FROM und
),
deg AS (SELECT a, COUNT(*) AS deg FROM sym GROUP BY a),
hop2 AS (
  SELECT e1.a, e2.b AS r
  FROM sym e1 JOIN sym e2 ON e1.b = e2.a
  WHERE e1.a <> e2.b
),
reach AS (
  SELECT a, COUNT(*) AS reach_2hop FROM (
    SELECT a, b AS r FROM sym
    UNION
    SELECT a, r FROM hop2
  ) GROUP BY a
)
SELECT r.a AS node, d.deg, r.reach_2hop, d.deg > 1000 AS capped
FROM reach r JOIN deg d ON d.a = r.a
ORDER BY reach_2hop DESC, node
LIMIT 30
"""


# ---------------------------------------------------------------------
# Personalized PageRank (round 8)
# ---------------------------------------------------------------------


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 10,
    src: str = "src",
    dst: str = "dst",
    n_partitions: int | None = None,
    checkpoint_interval: int = 5,
) -> DataFrame:
    """Scaled-integer PERSONALIZED PageRank: the 15% teleport mass
    returns only to the ``seeds`` node set (one ``node`` column), so
    ranks measure proximity to the seeds — the recommendation /
    related-items primitive. Same damped integer recurrence,
    per-round plan, dangling-node convention and
    ``checkpoint_interval`` lineage-cut cadence as :func:`pagerank`;
    the per-node teleport share is precomputed into the persisted
    node relation (one broadcast semi-join before the loop, zero
    extra per-round work)."""
    spark = edges.sparkSession
    npart = n_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    n_seeds = seeds.count()
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .join(
            F.broadcast(
                seeds.select(F.col("node"), F.lit(1).alias("is_seed"))
            ),
            "node",
            "left",
        )
        .select(
            "node",
            F.when(
                F.col("is_seed").isNotNull(),
                F.lit((15 * SCALE) // (100 * n_seeds)),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("tp"),
            F.when(
                F.col("is_seed").isNotNull(),
                F.lit(SCALE // n_seeds),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("r0"),
        )
        .repartition(npart, "node")
        .persist()
    )
    nodes.count()
    outdeg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("outdeg"))
    e = (
        edges.join(outdeg, on=src)
        .select(F.col(src).alias("u"), F.col(dst).alias("v"), "outdeg")
        .repartition(npart, "u")
        .persist()
    )
    e.count()
    ranks = nodes.select("node", F.col("r0").alias("rank"))
    for i in range(iterations):
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
        ranks = nodes.join(contribs, on="node", how="left").select(
            "node",
            (
                F.col("tp") + F.coalesce(F.col("inflow"), F.lit(0))
            ).cast("long").alias("rank"),
        )
        if (i + 1) % checkpoint_interval == 0 or i == iterations - 1:
            ranks = ranks.repartition(npart, "node").localCheckpoint(
                eager=False
            )
    out = ranks
    out.count()
    nodes.unpersist()
    e.unpersist()
    return out


def q_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: 10 personalized-PageRank iterations over the
    synthetic link graph with teleport restricted to the 10 seed
    nodes (node % 50 = 0) — iteration 10's exact bigint
    proximity-to-seeds ranks under the hash."""
    seeds = spark.range(0, _N, 50).select(F.col("id").alias("node"))
    pr = personalized_pagerank(
        synthetic_link_graph(spark), seeds, iterations=10, n_partitions=2
    )
    return pr.orderBy("node").coalesce(1)


def sql_personalized_pagerank(iterations: int = 10) -> str:
    links = " UNION ALL ".join(
        f"SELECT i AS src, (i * i * {a} + i * {b} + {c}) % {_N} AS dst "
        f"FROM range({_N}) t(i)"
        for a, b, c in _LINKS
    )
    s = SCALE
    n_seeds = _N // 50
    tp = (15 * s) // (100 * n_seeds)
    rounds = []
    prev = "r0"
    for k in range(1, iterations + 1):
        rounds.append(f"""r{k} AS (
  SELECT n.node,
         CAST(CASE WHEN n.node % 50 = 0 THEN {tp} ELSE 0 END
              + COALESCE(SUM(
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
  SELECT node,
         CAST(CASE WHEN node % 50 = 0 THEN {s // n_seeds} ELSE 0 END
              AS BIGINT) AS rank
  FROM nodes
),
{rounds_sql}
SELECT node, rank FROM {prev}
ORDER BY node
"""


SQL_PERSONALIZED_PAGERANK = sql_personalized_pagerank()


def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: IN-degree assortativity of the synthetic link
    graph — the Pearson correlation of (in-degree of source,
    in-degree of destination) over edges, the classic mixing-pattern
    summary (assortative crawl graphs behave differently under
    sampling and PageRank than disassortative ones). Out-degree is
    constant by construction (3 links per node), so the in-degree
    pairing is the one with signal. Degrees are exact integers; the
    correlation comes from DECIMAL-exact power sums with one shared
    closed form (the corr_matrix discipline).

    Plan: one in-degree aggregation, two keyed joins back to edges
    (left on the source side — in-degree-0 sources count as 0), one
    1-row power-sum aggregate — no window."""
    edges = synthetic_link_graph(spark)
    ind = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("d"))
    e = (
        edges.join(
            ind.select(F.col("dst").alias("src"), F.col("d").alias("du")),
            "src",
            "left",
        )
        .join(
            ind.select("dst", F.col("d").alias("dv")),
            "dst",
        )
        .select(
            F.coalesce("du", F.lit(0)).alias("du"), F.col("dv")
        )
    )

    def ps(expr):
        return F.sum(expr.cast("decimal(28,6)")).cast("double")

    g = e.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        ps(F.col("du")).alias("su"),
        ps(F.col("dv")).alias("sv"),
        ps(F.col("du") * F.col("du")).alias("suu"),
        ps(F.col("dv") * F.col("dv")).alias("svv"),
        ps(F.col("du") * F.col("dv")).alias("suv"),
    )
    n, su, sv = F.col("n"), F.col("su"), F.col("sv")
    num = n * F.col("suv") - su * sv
    den = F.sqrt(n * F.col("suu") - su * su) * F.sqrt(
        n * F.col("svv") - sv * sv
    )
    return g.select(
        F.col("n").cast("long").alias("n_edges"),
        F.round(su / n, 6).alias("mean_src_indeg"),
        F.round(sv / n, 6).alias("mean_dst_indeg"),
        F.round(num / den, 6).alias("assortativity"),
    )


SQL_DEGREE_ASSORTATIVITY = f"""
WITH edges AS ({' UNION ALL '.join(
    f"SELECT i AS src, (i * i * {a} + i * {b} + {c}) % {_N} AS dst "
    f"FROM range({_N}) t(i)" for a, b, c in _LINKS)}),
ind AS (SELECT dst, COUNT(*) AS d FROM edges GROUP BY dst),
e AS (
  SELECT COALESCE(iu.d, 0) AS du, iv.d AS dv
  FROM edges
  LEFT JOIN ind iu ON iu.dst = edges.src
  JOIN ind iv ON iv.dst = edges.dst
),
g AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(du AS DECIMAL(28,6))) AS DOUBLE) AS su,
         CAST(SUM(CAST(dv AS DECIMAL(28,6))) AS DOUBLE) AS sv,
         CAST(SUM(CAST(du * du AS DECIMAL(28,6))) AS DOUBLE) AS suu,
         CAST(SUM(CAST(dv * dv AS DECIMAL(28,6))) AS DOUBLE) AS svv,
         CAST(SUM(CAST(du * dv AS DECIMAL(28,6))) AS DOUBLE) AS suv
  FROM e
)
SELECT CAST(n AS BIGINT) AS n_edges,
       ROUND(su / n, 6) AS mean_src_indeg,
       ROUND(sv / n, 6) AS mean_dst_indeg,
       ROUND((n * suv - su * sv)
             / (SQRT(n * suu - su * su) * SQRT(n * svv - sv * sv)), 6)
         AS assortativity
FROM g
"""
