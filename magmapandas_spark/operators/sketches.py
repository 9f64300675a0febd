"""Deterministic cardinality sketches (beyond-reference surface).

KMV (k-minimum-values) distinct-count estimation — the classic
bottom-k sketch (Bar-Yossef et al. 2002; the estimator HLL replaced
in practice but with two properties that matter here):

- it is EXACTLY reproducible cross-engine (the sketch is "the k
  smallest md5 hashes", pure order statistics — no engine-specific
  register layout like HLL), so the gate can hash-compare estimates;
- it is mergeable (union of bottom-k sets, re-truncated to k), the
  property that makes sketches work at 100 TB: per-partition bottom-k
  then a k-row-per-partition merge, which is exactly what the window/
  aggregate below compiles to under partial aggregation.

Estimator: with h normalized to [0,1) and h_(k) the k-th smallest
distinct hash, E[distinct] = (k-1)/h_(k); groups with fewer than k
distinct values report their exact count (the sketch degenerates to
an exact set).

``approx_count_distinct`` (HyperLogLog++) remains the right call when
cross-engine reproducibility doesn't matter; this module exists
because a correctness-gated pipeline needs the deterministic twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from magmapandas_spark.operators.dedup import _md5_60

#: 2^60 — _md5_60 yields uniform integers in [0, 2^60).
_H_SCALE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group KMV distinct-count estimate beside the exact count.

    Plan: distinct (group, value) — one shuffle, the same cost any
    exact distinct pays at gate scale; at 100 TB replace the exact
    branch with the sketch-only one (bottom-k per partition merges in
    the partial aggregate, so the shuffle carries ≤ k rows per
    partition per group, not the distinct set).

    Returns (group, n_exact, kmv_estimate, rel_error)."""
    if k < 2:
        raise ValueError("k must be ≥ 2")
    # NULL values are excluded (standard distinct-count semantics) —
    # also removes a cross-engine hazard: a null hash would sort first
    # in Spark's window but last in DuckDB's
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(group_col, value_col)
        .distinct()
    )
    h = (
        _md5_60(F.col(value_col).cast("string")).cast("double") / _H_SCALE
    )
    w = Window.partitionBy(group_col).orderBy("h")
    ranked = d.select(group_col, h.alias("h")).withColumn(
        "r", F.row_number().over(w)
    )
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.max(F.when(F.col("r") == k, F.col("h"))).alias("hk"),
    )
    est = F.when(
        F.col("n_exact") >= k, (F.lit(float(k - 1)) / F.col("hk"))
    ).otherwise(F.col("n_exact").cast("double"))
    return agg.select(
        group_col,
        "n_exact",
        F.round(est, 4).alias("kmv_estimate"),
        F.round(
            (est - F.col("n_exact")) / F.col("n_exact"), 6
        ).alias("rel_error"),
    )


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: KMV (k=256) distinct-user estimate per event type
    vs the exact count — estimate, exact, and relative error all under
    the hash (the estimator itself is what's being verified)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return kmv_distinct(events, "event_type", "user_id").orderBy(
        "event_type"
    )


SQL_KMV_DISTINCT = """
WITH d AS (
  SELECT DISTINCT event_type, user_id FROM events
),
ranked AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
           / 1152921504606846976.0 AS h,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                    ::BIGINT / 1152921504606846976.0
         ) AS r
  FROM d
),
agg AS (
  SELECT event_type,
         COUNT(*) AS n_exact,
         MAX(CASE WHEN r = 256 THEN h END) AS hk
  FROM ranked GROUP BY event_type
)
SELECT event_type,
       n_exact,
       ROUND(CASE WHEN n_exact >= 256 THEN 255.0 / hk
                  ELSE CAST(n_exact AS DOUBLE) END, 4) AS kmv_estimate,
       ROUND((CASE WHEN n_exact >= 256 THEN 255.0 / hk
                   ELSE CAST(n_exact AS DOUBLE) END - n_exact)
             / n_exact, 6) AS rel_error
FROM agg
ORDER BY event_type
"""
