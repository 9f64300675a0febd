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
        "hybrid_search": _sql_hybrid_search(),
        "fuzzy_join": SQL_FUZZY_JOIN,
        "table_diff": SQL_TABLE_DIFF,
        "hard_negatives": SQL_HARD_NEGATIVES,
        "k_anonymity": SQL_K_ANONYMITY,
    }
