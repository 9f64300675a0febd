"""Correctness-suite part 9 (round 7, second wave): multi-criteria
shortlisting, blocking-based entity resolution, LM fluency scoring,
ML split hygiene, and customer segmentation.

- ``skyline_parts`` — Pareto frontier via the sort-based linear level
  pass (no quadratic NOT EXISTS self-join); strict-in-one dominance
  property-tested against brute force.
- ``snm_pairs`` — sorted-neighborhood entity resolution: prefix-
  blocked rank windows + one strict 1:1 equi-join per window offset,
  exact Levenshtein verify (the second blocking family beside
  SymSpell deletion neighborhoods).
- ``bigram_lm`` — corpus bigram-LM fluency in exact integer ppm
  (rational conditional probabilities, no ln).
- ``kfold_split`` — group-hash k-fold assignment whose leakage audit
  is re-derived under the hash, not asserted.
- ``rfm_segments`` — recency/frequency/monetary quintile segmentation
  with NTILE's remainder rule spelled out as rank arithmetic.

Third wave:

- ``setsim_join`` — EXACT set-similarity join via prefix filtering
  (AllPairs/PPJoin family): rarity-ordered shingle prefixes make
  Jaccard >= 3/5 pairs share a prefix element (pigeonhole — zero
  false negatives, unlike LSH banding), candidates from one equi-join,
  exact intersection verify, all integer ppm.
- ``dominant_suppliers`` — the TPC-H Q20 nested semi-join-reduction
  shape (broadcast dim filter into the fact scan, two aggregation
  grains, BIGINT ratio predicate, enrichment join).
- ``winsorized_stats`` — p05/p95 winsorized summaries with exact
  order-statistic bounds and decimal-exact means.
- ``cusum_alarms`` — one-sided CUSUM rate-shift detection over hourly
  counts: the recursion rewritten as prefix-sum minus running-min
  windows, all BIGINT (no division anywhere).
- ``kcore`` — fixed-round k-core peeling (400 -> 200 -> 128 -> 56 on
  the gate graph), unrolled-CTE oracle; each round one semi-join +
  one count aggregation.
- ``er_golden`` — the composed MDM pipeline: SNM candidate pairs →
  connected components over the match graph → survivorship election
  of one golden record per cluster; recursive-CTE oracle.
- ``lsh_recall_eval`` — MinHash-LSH banding measured against the
  EXACT prefix-filter ground truth: recall under the gate hash
  instead of asserted.
- ``triangle_downsample`` — LTOB visual downsampling with exact
  BIGINT cross-product areas over integer coordinates; per-bucket
  argmax as a windowless struct-MAX.
"""

from __future__ import annotations


def queries():
    from magmapandas_spark.operators.analytics import q_rfm_segments
    from magmapandas_spark.operators.curation import (
        q_bigram_lm,
        q_kfold_split,
    )
    from magmapandas_spark.operators.analytics import (
        q_dominant_suppliers,
        q_winsorized_stats,
    )
    from magmapandas_spark.operators.fuzzy import q_er_golden, q_snm_pairs
    from magmapandas_spark.operators.graph import q_kcore
    from magmapandas_spark.operators.setjoin import q_setsim_join
    from magmapandas_spark.operators.skyline import q_skyline_parts
    from magmapandas_spark.operators.evaluation import (
        q_ivfpq_recall_bound,
        q_lsh_recall_eval,
        q_minhash_xxhash_recall_bound,
    )
    from magmapandas_spark.operators.timeseries import (
        q_cusum_alarms,
        q_triangle_downsample,
    )

    return {
        "skyline_parts": q_skyline_parts,
        "snm_pairs": q_snm_pairs,
        "bigram_lm": q_bigram_lm,
        "kfold_split": q_kfold_split,
        "rfm_segments": q_rfm_segments,
        "setsim_join": q_setsim_join,
        "dominant_suppliers": q_dominant_suppliers,
        "winsorized_stats": q_winsorized_stats,
        "cusum_alarms": q_cusum_alarms,
        "kcore": q_kcore,
        "er_golden": q_er_golden,
        "lsh_recall_eval": q_lsh_recall_eval,
        # r14 verdict item 6: hashed recall-bound twins for the two
        # rows-only production probes (minhash_lsh_xxhash, ivfpq_topk)
        "minhash_xxhash_recall_bound": q_minhash_xxhash_recall_bound,
        "ivfpq_recall_bound": q_ivfpq_recall_bound,
        "triangle_downsample": q_triangle_downsample,
    }


def oracle_sql():
    from magmapandas_spark.operators.analytics import SQL_RFM_SEGMENTS
    from magmapandas_spark.operators.curation import (
        SQL_BIGRAM_LM,
        SQL_KFOLD_SPLIT,
    )
    from magmapandas_spark.operators.analytics import (
        SQL_DOMINANT_SUPPLIERS,
        SQL_WINSORIZED_STATS,
    )
    from magmapandas_spark.operators.fuzzy import (
        SQL_ER_GOLDEN,
        SQL_SNM_PAIRS,
    )
    from magmapandas_spark.operators.graph import SQL_KCORE
    from magmapandas_spark.operators.setjoin import SQL_SETSIM_JOIN
    from magmapandas_spark.operators.skyline import SQL_SKYLINE_PARTS
    from magmapandas_spark.operators.evaluation import (
        SQL_IVFPQ_RECALL_BOUND,
        SQL_LSH_RECALL_EVAL,
        SQL_MINHASH_XXHASH_RECALL_BOUND,
    )
    from magmapandas_spark.operators.timeseries import (
        SQL_CUSUM_ALARMS,
        SQL_TRIANGLE_DOWNSAMPLE,
    )

    return {
        "skyline_parts": SQL_SKYLINE_PARTS,
        "snm_pairs": SQL_SNM_PAIRS,
        "bigram_lm": SQL_BIGRAM_LM,
        "kfold_split": SQL_KFOLD_SPLIT,
        "rfm_segments": SQL_RFM_SEGMENTS,
        "setsim_join": SQL_SETSIM_JOIN,
        "dominant_suppliers": SQL_DOMINANT_SUPPLIERS,
        "winsorized_stats": SQL_WINSORIZED_STATS,
        "cusum_alarms": SQL_CUSUM_ALARMS,
        "kcore": SQL_KCORE,
        "er_golden": SQL_ER_GOLDEN,
        "lsh_recall_eval": SQL_LSH_RECALL_EVAL,
        "minhash_xxhash_recall_bound": SQL_MINHASH_XXHASH_RECALL_BOUND,
        "ivfpq_recall_bound": SQL_IVFPQ_RECALL_BOUND,
        "triangle_downsample": SQL_TRIANGLE_DOWNSAMPLE,
    }
