"""Typo-tolerant dictionary join via deletion-neighborhood blocking
(SymSpell-style; beyond-reference surface — the fuzzy-matching tier a
curation pipeline needs for entity normalization and spell-mapping
dirty tokens onto a reference vocabulary).

The scale problem: edit-distance joins are quadratic if written as
``probes × dictionary WHERE levenshtein ≤ 1``. The SymSpell identity
makes them an equi-join: two strings are within Levenshtein distance 1
**iff** their deletion neighborhoods ``{s} ∪ D1(s)`` intersect (D1 =
all single-character deletions) — deletions cover deletion edits
directly, substitutions via deleting the differing position from both
sides, insertions symmetrically. So:

- each side explodes into ``len+1`` variant rows (scan-local,
  whole-stage codegen — ``transform(sequence(...))``, no UDF),
- candidates come from ONE equi-join on the variant key (the
  dictionary side is broadcast: ``|vocab| · (len+1)`` rows),
- candidates are verified with the exact ``levenshtein`` built-in
  (JVM-side), bounding false positives like ``ab``/``ba`` that share
  a deletion but sit at distance 2.

Nothing is quadratic: the probe side streams through the scan, the
candidate count is bounded by bucket collisions on short variant
strings, and the verify touches candidates only. The gate query's
oracle is the BRUTE-FORCE cross join in DuckDB — hash equality against
it is an executable proof that blocking loses no distance-≤1 pair
(SymSpell's recall guarantee), not just that both engines agree.

Determinism: probes are derived from part attributes with the edit
position/type keyed on ``p_partkey`` (delete / substitute 'z' /
insert 'q'), so both engines synthesize the identical dirty tokens;
all outputs are integers and strings — no float fog anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: minimum token length admitted to the dictionary / probe base
MIN_WORD_LEN = 4


def _variants(col_name: str):
    """``{s} ∪ D1(s)`` as a scan-local array column (self first, then
    each single-character deletion, deduped by array_union)."""
    return F.array_union(
        F.array(F.col(col_name)),
        F.expr(
            f"transform(sequence(1, length({col_name})), i -> "
            f"concat(substring({col_name}, 1, i-1), "
            f"substring({col_name}, i+1, 100000)))"
        ),
    )


def fuzzy_join_d1(
    probes: DataFrame,
    dictionary: DataFrame,
    probe_col: str = "probe",
    word_col: str = "word",
    broadcast_dict: bool = True,
) -> DataFrame:
    """All (probe, word) pairs with ``levenshtein(probe, word) <= 1``,
    computed by deletion-neighborhood blocking + exact verify — never
    a cross join.

    ``probes`` and ``dictionary`` should be distinct on their key
    column (dedupe upstream where multiplicities exist; the candidate
    generation cost is per DISTINCT string). With ``broadcast_dict``
    the dictionary's variant relation rides a broadcast — the
    dictionary-correction shape where a bounded vocabulary meets an
    unbounded probe stream."""
    pv = probes.select(
        F.col(probe_col), F.explode(_variants(probe_col)).alias("_var")
    )
    dv = dictionary.select(
        F.col(word_col), F.explode(_variants(word_col)).alias("_var")
    )
    if broadcast_dict:
        dv = F.broadcast(dv)
    cand = (
        pv.join(dv, "_var")
        .select(probe_col, word_col)
        .distinct()
    )
    return cand.filter(
        F.levenshtein(F.col(probe_col), F.col(word_col)) <= 1
    )


# ---------------------------------------------------------------------
# Gate query: deterministic dirty tokens from part attributes, mapped
# back onto the part-attribute vocabulary
# ---------------------------------------------------------------------


def _part_vocab(parts: DataFrame) -> DataFrame:
    """(tok, n) dictionary from p_name words + p_type, length ≥ 4."""
    words = (
        parts.select(
            F.explode(F.split(F.lower("p_name"), " ")).alias("tok")
        )
        .unionByName(parts.select(F.lower("p_type").alias("tok")))
        .filter(F.length("tok") >= MIN_WORD_LEN)
    )
    return words.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))


def _part_probes(parts: DataFrame) -> DataFrame:
    """One dirty token per part row: pick a word by ``k % 3`` (name
    word 1 / name word 2 / p_type), then apply the edit class keyed on
    ``k div 3`` at position ``(k div 9) % len`` — delete, substitute
    'z', or insert 'q'. Returns (probe, n_probe) grouped."""
    k = F.col("p_partkey")
    arr = F.concat(
        F.split(F.lower("p_name"), " "), F.array(F.lower("p_type"))
    )
    w = F.element_at(arr, (k % 3 + 1).cast("int"))
    chosen = parts.select(k.alias("k"), w.alias("w")).filter(
        F.length("w") >= MIN_WORD_LEN
    )
    pos = (F.expr("k div 9") % F.length("w") + 1).cast("int")
    mode = (F.expr("k div 3") % 3).cast("int")
    pre = F.expr("substring(w, 1, pos - 1)")
    post = F.expr("substring(w, pos + 1, 100000)")
    probe = (
        F.when(F.col("mode") == 0, F.concat(pre, post))
        .when(F.col("mode") == 1, F.concat(pre, F.lit("z"), post))
        .otherwise(
            F.concat(F.expr("substring(w, 1, pos)"), F.lit("q"), post)
        )
    )
    return (
        chosen.withColumn("pos", pos)
        .withColumn("mode", mode)
        .select(probe.alias("probe"))
        .groupBy("probe")
        .agg(F.count(F.lit(1)).alias("n_probe"))
    )


def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: blocked edit-distance-≤1 join of the synthesized
    dirty tokens against the part vocabulary; the DuckDB oracle does
    the brute-force cross join, so the hash certifies SymSpell recall,
    not just engine agreement."""
    parts = spark.read.parquet(f"{sf_dir}/part.parquet")
    vocab = _part_vocab(parts)
    probes = _part_probes(parts)
    matched = fuzzy_join_d1(
        probes.select("probe"), vocab.select("tok"),
        probe_col="probe", word_col="tok",
    )
    return (
        matched.join(probes, "probe")
        .join(vocab, "tok")
        .select(
            "probe",
            F.col("tok").alias("match"),
            "n_probe",
            F.col("n").alias("n_dict"),
            F.levenshtein("probe", "tok").cast("int").alias("dist"),
        )
        .orderBy(F.desc("n_probe"), "probe", "match")
    )


SQL_FUZZY_JOIN = f"""
WITH words AS (
  SELECT tok FROM (
    SELECT unnest(str_split(lower(p_name), ' ')) AS tok FROM part) t1
  UNION ALL
  SELECT lower(p_type) AS tok FROM part
),
vocab AS (
  SELECT tok, COUNT(*) AS n FROM words
  WHERE len(tok) >= {MIN_WORD_LEN} GROUP BY tok
),
chosen AS (
  SELECT p_partkey AS k,
         (str_split(lower(p_name), ' ') || [lower(p_type)])
           [(p_partkey % 3) + 1] AS w
  FROM part
),
probes0 AS (
  SELECT k, w,
         CAST(((k // 9) % len(w)) + 1 AS INT) AS pos,
         CAST((k // 3) % 3 AS INT) AS mode
  FROM chosen WHERE len(w) >= {MIN_WORD_LEN}
),
probes AS (
  SELECT CASE mode
           WHEN 0 THEN concat(substr(w, 1, pos - 1),
                              substr(w, pos + 1, 100000))
           WHEN 1 THEN concat(substr(w, 1, pos - 1), 'z',
                              substr(w, pos + 1, 100000))
           ELSE concat(substr(w, 1, pos), 'q',
                       substr(w, pos + 1, 100000))
         END AS probe
  FROM probes0
),
pg AS (SELECT probe, COUNT(*) AS n_probe FROM probes GROUP BY probe)
SELECT pg.probe,
       v.tok AS match,
       pg.n_probe,
       v.n AS n_dict,
       CAST(levenshtein(pg.probe, v.tok) AS INT) AS dist
FROM pg JOIN vocab v ON levenshtein(pg.probe, v.tok) <= 1
ORDER BY n_probe DESC, probe, match
"""


# ---------------------------------------------------------------------
# Sorted-neighborhood entity resolution (SNM blocking)
# ---------------------------------------------------------------------


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    window: int = 3,
    max_dist: int = 3,
) -> DataFrame:
    """Sorted-neighborhood-method candidate pairs with exact
    Levenshtein verify — the other classic blocking scheme beside
    SymSpell deletion neighborhoods: sort records by a blocking key,
    slide a fixed window, verify only in-window pairs.

    Spark-first shape: the sort key is PREFIX-BLOCKED (first two
    characters), so the rank window partitions by block and the pair
    generation is ``window`` co-partitioned equi-joins on
    ``(block, rank = rank - k)`` — no global sort, no single-partition
    window, no self-cross. Pairs that straddle a prefix block are the
    documented recall loss (multi-pass SNM with a second key closes
    it), mirroring LSH banding's false-negative contract.

    Output: verified pairs (distance ≤ ``max_dist``) with exact
    integer distances.
    """
    base = df.select(
        F.col(id_col).alias("rid"), F.col(key_col).alias("key")
    ).distinct()
    blocked = base.select(
        "rid", "key", F.substring("key", 1, 2).alias("blk")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("blk").orderBy("key", "rid")
    ranked = blocked.select(
        "rid", "key", "blk", F.row_number().over(w).alias("rn")
    )
    left = ranked.select(
        F.col("blk"),
        F.col("rid").alias("id_a"),
        F.col("key").alias("key_a"),
        F.col("rn").alias("rn_a"),
    )
    # one strict 1:1 equi-join per window offset (linear in n; a
    # blk-only join with a range filter would be quadratic per block)
    shifted = None
    for k in range(1, window + 1):
        right_k = ranked.select(
            F.col("blk"),
            F.col("rid").alias("id_b"),
            F.col("key").alias("key_b"),
            (F.col("rn") - k).alias("rn_a"),
        )
        part = left.join(right_k, ["blk", "rn_a"])
        shifted = part if shifted is None else shifted.unionByName(part)
    pairs = shifted
    return (
        pairs.select(
            "id_a",
            "id_b",
            "key_a",
            "key_b",
            F.levenshtein("key_a", "key_b").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
        .filter(F.col("dist") > 0)
        .orderBy("id_a", "id_b")
    )


def q_snm_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: sorted-neighborhood near-duplicate part names
    (window 3, Levenshtein <= 3), exact integer distances."""
    parts = spark.read.parquet(f"{sf_dir}/part.parquet")
    return sorted_neighborhood_pairs(parts, "p_name", "p_partkey")


SQL_SNM_PAIRS = """
WITH base AS (
  SELECT DISTINCT p_partkey AS rid, p_name AS key FROM part
),
ranked AS (
  SELECT rid, key, substr(key, 1, 2) AS blk,
         ROW_NUMBER() OVER (PARTITION BY substr(key, 1, 2)
                            ORDER BY key, rid) AS rn
  FROM base
)
SELECT a.rid AS id_a, b.rid AS id_b, a.key AS key_a, b.key AS key_b,
       CAST(levenshtein(a.key, b.key) AS INTEGER) AS dist
FROM ranked a
JOIN ranked b ON b.blk = a.blk AND b.rn > a.rn AND b.rn <= a.rn + 3
WHERE levenshtein(a.key, b.key) <= 3 AND levenshtein(a.key, b.key) > 0
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------
# End-to-end entity resolution: SNM pairs -> clusters -> golden records
# ---------------------------------------------------------------------


def q_er_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: the full MDM entity-resolution pipeline composed
    from existing verified operators — sorted-neighborhood candidate
    pairs (blocked, Levenshtein-verified), connected components over
    the match graph, and a survivorship rule that elects one golden
    record per cluster (max p_size, then min key — the deterministic
    'most complete record wins' policy). Output: one row per
    multi-member cluster with its golden record and member count.

    The oracle replays the identical pair pipeline and labels
    components by recursive-CTE transitive closure (exact: min-label
    CC is iteration-order independent), then applies the same
    survivorship window.
    """
    from pyspark.sql import Window as W

    from magmapandas_spark.operators.dedup import connected_components

    parts = spark.read.parquet(f"{sf_dir}/part.parquet")
    pairs = sorted_neighborhood_pairs(
        parts, "p_name", "p_partkey"
    ).select(F.col("id_a").alias("id1"), F.col("id_b").alias("id2"))
    cc = connected_components(pairs, n_partitions=2)
    members = cc.join(
        parts.select(
            F.col("p_partkey").alias("node"), "p_name", "p_size"
        ),
        "node",
    )
    w = W.partitionBy("cluster_id").orderBy(
        F.desc("p_size"), "node"
    )
    return (
        members.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_members",
            F.count(F.lit(1)).over(W.partitionBy("cluster_id")),
        )
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            "n_members",
            F.col("node").alias("golden_key"),
            F.col("p_name").alias("golden_name"),
            F.col("p_size").alias("golden_size"),
        )
        .orderBy("cluster_id")
    )


SQL_ER_GOLDEN = """
WITH RECURSIVE base AS (
  SELECT DISTINCT p_partkey AS rid, p_name AS key FROM part
),
ranked AS (
  SELECT rid, key, substr(key, 1, 2) AS blk,
         ROW_NUMBER() OVER (PARTITION BY substr(key, 1, 2)
                            ORDER BY key, rid) AS rn
  FROM base
),
pairs AS (
  SELECT a.rid AS id1, b.rid AS id2
  FROM ranked a
  JOIN ranked b ON b.blk = a.blk AND b.rn > a.rn AND b.rn <= a.rn + 3
  WHERE levenshtein(a.key, b.key) <= 3 AND levenshtein(a.key, b.key) > 0
),
sym AS (
  SELECT id1 AS node, id2 AS nb FROM pairs
  UNION
  SELECT id2, id1 FROM pairs
),
reach(node, lbl) AS (
  SELECT DISTINCT node, node FROM sym
  UNION
  SELECT s.node, r.lbl FROM sym s JOIN reach r ON s.nb = r.node
),
cc AS (
  SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node
),
members AS (
  SELECT c.cluster_id, c.node, p.p_name, p.p_size
  FROM cc c JOIN part p ON p.p_partkey = c.node
),
survivor AS (
  SELECT cluster_id, node, p_name, p_size,
         ROW_NUMBER() OVER (PARTITION BY cluster_id
                            ORDER BY p_size DESC, node) AS rn,
         COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM members
)
SELECT cluster_id, n_members, node AS golden_key,
       p_name AS golden_name, p_size AS golden_size
FROM survivor WHERE rn = 1
ORDER BY cluster_id
"""
