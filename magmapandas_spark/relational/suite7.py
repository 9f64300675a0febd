"""Correctness-suite part 7 (round 6, second wave): warehouse /
graph / ML analytics operators.

Six additions a production lakehouse runs beside the curation tier,
each with a full exact oracle:

- ``linreg_normal`` — per-group closed-form OLS via normal equations:
  six decimal-exact sufficient statistics per group (the one-pass
  distributed-training shape), fixed-order IEEE solve, R² under the
  hash. Surfaced two cross-engine determinism rules on the way in:
  decimal-domain products (not decimal casts of double products) and
  VARCHAR-bridged decimal→double oracle casts (DuckDB's direct cast
  double-rounds at ≥1e13 magnitudes).
- ``triangle_count`` — degree-ordered exact triangle counting over a
  synthetic 400-node link graph: orientation bounds the wedge join at
  O(m^1.5); top-20 participation + transitivity, all exact integers.
- ``scd2_build`` — SCD type-2 dimension build from the events change
  log: lag-based no-op collapse, lead-closed validity intervals, one
  entity-keyed shuffle, epoch-microsecond integers.
- ``funnel_conversion`` — strictly-ordered signup→view→click→purchase
  funnel: chained conditional MINs in per-user windows, integer ppm
  conversions, mean end-to-end latency as an exact integer div.
- ``token_pmi`` — top-50 adjacent-bigram collocations by exact-integer
  PMI ratio (log omitted: it is monotone, and cross-engine ``ln``
  differs in the last ulp) — two word-count aggregations + two
  broadcast vocabulary joins.
- ``incremental_agg`` — incremental materialized-view maintenance:
  base-slice and delta-slice aggregation states merged (decimal sums
  of sums, min-of-mins), hashed against the oracle's direct full
  recompute — the merge==recompute contract made executable.

Third wave — product/experimentation analytics and the sketch-tier
set algebra:

- ``cohort_retention`` — weekly cohort × offset retention matrix in
  long form, exact integer ppm shares; user-keyed shuffles only.
- ``event_transitions`` — first-order Markov transition matrix over
  per-user (ts, event_id)-ordered events; integer row-normalized
  probabilities.
- ``ab_chi2`` — 2×2 chi-square independence test in DECIMAL(38,0)
  (micro-units, no sqrt/float); conversion is the scale-free
  "more purchases than errors" criterion so no margin degenerates as
  per-user activity grows; degenerate margins yield NULL, not a
  division error.
- ``kmv_setops`` — theta-sketch union AND intersection estimation
  over bottom-k md5 sketches of the viewer/purchaser user sets,
  estimators and exact ground truth under one hash (completes the
  sketch tier's set algebra beside hll_join_card's union-only path).
- ``ols_multi`` — the multi-feature generalization of
  ``linreg_normal``: ten Gram-matrix sufficient statistics, 3×3
  Cramer solve via SHARED SQL-text determinant expressions (both
  engines parse the identical string → identical IEEE tree).
- ``session_paths`` — top-k behavioral session paths (lag-gap
  sessionization, ordered path assembly, ppm shares).
- ``hybrid_search`` — reciprocal-rank fusion of BM25 top-k and
  dense cosine top-k (the canonical RAG retrieval shape): both lists
  truncated before fusion, so the fuse joins constant-size relations.
- ``fuzzy_join`` — typo-tolerant dictionary join via SymSpell
  deletion-neighborhood blocking + exact levenshtein verify; the
  oracle is the brute-force cross join, so the hash certifies the
  blocking's recall guarantee, not just engine agreement.
- ``table_diff`` — snapshot diff: (key, digest) scan-local
  reduction, one narrow full-outer join, added/removed/changed/
  unchanged classes; the oracle classifies via direct IS DISTINCT
  FROM compares, so the hash certifies digest fidelity.
- ``hard_negatives`` — contrastive pair mining: per anchor, the
  top same-label positive and top different-label hard negative with
  the margin; anchors broadcast, one corpus scan, window argmax.
- ``k_anonymity`` — quasi-identifier equivalence-class census
  (two partial-aggregatable groupBys); the aggregate complement of
  the PII detect/redact direct-identifier tier.
- ``blame_supplier`` (round 7) — the TPC-H Q21 nested
  EXISTS/NOT-EXISTS shape: one left-semi + one left-anti hash join
  against a shared late-flagged relation.
- ``balance_cume_dist`` (round 7) — exact integer-ppm cume_dist /
  percent_rank per segment decile (rank arithmetic; rn widened to
  BIGINT before the ppm scale-up).
- ``incremental_join`` — join-view maintenance via the delta-join
  identity (ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB): the base⋈base term is never
  recomputed; merged state hashes equal to the oracle's direct full
  recompute. Plus a streaming twin for ``event_transitions``
  (boundary-stitched incremental fold, streams.py) under the
  batch-equality oracle discipline.

Same cross-engine determinism rules as :mod:`suite`.
"""

from __future__ import annotations


def queries():
    from magmapandas_spark.operators.contrastive import q_hard_negatives
    from magmapandas_spark.operators.webcorpus import q_k_anonymity
    from magmapandas_spark.operators.fuzzy import q_fuzzy_join
    from magmapandas_spark.operators.maintenance import q_table_diff
    from magmapandas_spark.operators.tfidf import q_hybrid_search
    from magmapandas_spark.operators.analytics import (
        q_ab_chi2,
        q_cohort_retention,
        q_event_transitions,
        q_funnel_conversion,
        q_incremental_agg,
        q_incremental_join,
        q_scd2_build,
        q_token_pmi,
    )
    from magmapandas_spark.operators.analytics import q_session_paths
    from magmapandas_spark.operators.graph import q_triangle_count
    from magmapandas_spark.operators.regression import (
        q_linreg_normal,
        q_ols_multi,
    )
    from magmapandas_spark.operators.sketches import q_kmv_setops

    return {
        "linreg_normal": q_linreg_normal,
        "triangle_count": q_triangle_count,
        "scd2_build": q_scd2_build,
        "funnel_conversion": q_funnel_conversion,
        "token_pmi": q_token_pmi,
        "incremental_agg": q_incremental_agg,
        "cohort_retention": q_cohort_retention,
        "event_transitions": q_event_transitions,
        "ab_chi2": q_ab_chi2,
        "kmv_setops": q_kmv_setops,
        "ols_multi": q_ols_multi,
        "session_paths": q_session_paths,
        "incremental_join": q_incremental_join,
        "blame_supplier": q_blame_supplier,
        "balance_cume_dist": q_balance_cume_dist,
        "hybrid_search": q_hybrid_search,
        "fuzzy_join": q_fuzzy_join,
        "table_diff": q_table_diff,
        "hard_negatives": q_hard_negatives,
        "k_anonymity": q_k_anonymity,
    }


def oracle_sql():
    from magmapandas_spark.operators.contrastive import SQL_HARD_NEGATIVES
    from magmapandas_spark.operators.webcorpus import SQL_K_ANONYMITY
    from magmapandas_spark.operators.fuzzy import SQL_FUZZY_JOIN
    from magmapandas_spark.operators.maintenance import SQL_TABLE_DIFF
    from magmapandas_spark.operators.tfidf import _sql_hybrid_search
    from magmapandas_spark.operators.analytics import (
        SQL_AB_CHI2,
        SQL_COHORT_RETENTION,
        SQL_EVENT_TRANSITIONS,
        SQL_FUNNEL_CONVERSION,
        SQL_INCREMENTAL_AGG,
        SQL_INCREMENTAL_JOIN,
        SQL_SCD2_BUILD,
        SQL_TOKEN_PMI,
    )
    from magmapandas_spark.operators.analytics import SQL_SESSION_PATHS
    from magmapandas_spark.operators.graph import SQL_TRIANGLE_COUNT
    from magmapandas_spark.operators.regression import (
        SQL_LINREG_NORMAL,
        SQL_OLS_MULTI,
    )
    from magmapandas_spark.operators.sketches import SQL_KMV_SETOPS

    return {
        "linreg_normal": SQL_LINREG_NORMAL,
        "triangle_count": SQL_TRIANGLE_COUNT,
        "scd2_build": SQL_SCD2_BUILD,
        "funnel_conversion": SQL_FUNNEL_CONVERSION,
        "token_pmi": SQL_TOKEN_PMI,
        "incremental_agg": SQL_INCREMENTAL_AGG,
        "cohort_retention": SQL_COHORT_RETENTION,
        "event_transitions": SQL_EVENT_TRANSITIONS,
        "ab_chi2": SQL_AB_CHI2,
        "kmv_setops": SQL_KMV_SETOPS,
        "ols_multi": SQL_OLS_MULTI,
        "session_paths": SQL_SESSION_PATHS,
        "incremental_join": SQL_INCREMENTAL_JOIN,
        "blame_supplier": SQL_BLAME_SUPPLIER,
        "balance_cume_dist": SQL_BALANCE_CUME_DIST,
        "hybrid_search": _sql_hybrid_search(),
        "fuzzy_join": SQL_FUZZY_JOIN,
        "table_diff": SQL_TABLE_DIFF,
        "hard_negatives": SQL_HARD_NEGATIVES,
        "k_anonymity": SQL_K_ANONYMITY,
    }


# ---------------------------------------------------------------------
# Round 7: nested EXISTS / NOT EXISTS (the TPC-H Q21 shape) and
# cumulative-distribution windows
# ---------------------------------------------------------------------


def q_blame_supplier(spark, sf_dir):
    """Gate query: the TPC-H Q21 'suppliers who kept waiting' shape —
    for multi-supplier orders, blame the supplier whose line was the
    ONLY late line (shipdate > orderdate + 60 days). Exercises nested
    correlated EXISTS (a left-semi join on the order key) and NOT
    EXISTS (a left-anti join on (order, late)) back to back; both
    planned as hash joins against the one shared late-flagged line
    relation, never correlated re-execution.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    flagged = (
        li.join(
            o.select("o_orderkey", "o_orderdate"),
            li["l_orderkey"] == o["o_orderkey"],
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            F.expr(
                "CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY"
                " THEN 1 ELSE 0 END"
            ).alias("late"),
        )
        .localCheckpoint(eager=True)
    )
    s1 = flagged.filter(F.col("late") == 1).alias("s1")
    other = flagged.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    ).alias("s2")
    other_late = (
        flagged.filter(F.col("late") == 1)
        .select(
            F.col("l_orderkey").alias("ok3"),
            F.col("l_suppkey").alias("sk3"),
        )
        .alias("s3")
    )
    has_other = s1.join(
        other,
        (F.col("s1.l_orderkey") == F.col("ok2"))
        & (F.col("s1.l_suppkey") != F.col("sk2")),
        "left_semi",
    )
    blamed = has_other.join(
        other_late,
        (F.col("l_orderkey") == F.col("ok3"))
        & (F.col("l_suppkey") != F.col("sk3")),
        "left_anti",
    )
    top = (
        blamed.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.countDistinct("l_orderkey").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "suppkey")
        .limit(20)
    )
    return top.orderBy(F.desc("n_orders"), "suppkey")


SQL_BLAME_SUPPLIER = """
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
              THEN 1 ELSE 0 END AS late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT s1.l_suppkey AS suppkey,
       COUNT(DISTINCT s1.l_orderkey) AS n_orders
FROM li s1
WHERE s1.late = 1
  AND EXISTS (SELECT 1 FROM li s2 WHERE s2.l_orderkey = s1.l_orderkey
              AND s2.l_suppkey <> s1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM li s3 WHERE s3.l_orderkey = s1.l_orderkey
                  AND s3.l_suppkey <> s1.l_suppkey AND s3.late = 1)
GROUP BY 1
ORDER BY n_orders DESC, suppkey
LIMIT 20
"""


def q_balance_cume_dist(spark, sf_dir):
    """Gate query: cumulative-distribution window coverage — per
    market segment, each customer decile's exact cume_dist and
    percent_rank surfaced as integer ppm (rank arithmetic over the
    (acctbal, custkey) total order, so no float rank fractions under
    the hash). One segment-keyed window; deciles reduce the output to
    10 rows per segment.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    w = Window.partitionBy("c_mktsegment").orderBy(
        "c_acctbal", "c_custkey"
    )
    n = Window.partitionBy("c_mktsegment")
    ranked = cust.select(
        "c_mktsegment",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(n).alias("n"),
    ).select(
        "c_mktsegment",
        "rn",
        "n",
        # rn is INT (row_number); widen before the ppm scale-up —
        # rn * 1e6 overflows int32 past ~2147 rows per segment
        F.expr("(CAST(rn AS BIGINT) - 1) * 10 div n").alias("decile"),
        F.expr("CAST(rn AS BIGINT) * 1000000 div n").alias("cume_ppm"),
        F.expr(
            "CASE WHEN n > 1"
            " THEN (CAST(rn AS BIGINT) - 1) * 1000000 div (n - 1)"
            " ELSE 0 END"
        ).alias("prank_ppm"),
    )
    return (
        ranked.groupBy("c_mktsegment", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("cume_ppm").alias("max_cume_ppm"),
            F.min("prank_ppm").alias("min_prank_ppm"),
        )
        .orderBy("c_mktsegment", "decile")
    )


SQL_BALANCE_CUME_DIST = """
WITH ranked AS (
  SELECT c_mktsegment,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal, c_custkey) AS rn,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM customer
),
d AS (
  SELECT c_mktsegment,
         (rn - 1) * 10 // n AS decile,
         rn * 1000000 // n AS cume_ppm,
         CASE WHEN n > 1 THEN (rn - 1) * 1000000 // (n - 1)
              ELSE 0 END AS prank_ppm
  FROM ranked
)
SELECT c_mktsegment, CAST(decile AS BIGINT) AS decile,
       COUNT(*) AS n_rows,
       CAST(MAX(cume_ppm) AS BIGINT) AS max_cume_ppm,
       CAST(MIN(prank_ppm) AS BIGINT) AS min_prank_ppm
FROM d
GROUP BY c_mktsegment, decile
ORDER BY c_mktsegment, decile
"""
