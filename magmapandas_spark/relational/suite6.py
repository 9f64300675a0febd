"""Correctness-suite part 6 (round 6): scale-posture hardening gates.

Round 6 closes the two scale caveats the round-5 verdict flagged
(SemDeDup's fixed-codebook cell growth, KMV's sort-based sketch) and
finishes the multimodal tier (MJPEG video frame decode, GIF in the
magic-byte dispatch). The queries here put the HARDENED paths
themselves under the cross-engine hash:

- ``semdedup_sharded`` — the cell-population guard actively splitting
  overfull cells, oracle-replayed in DuckDB;
- ``video_frame_decode`` — real per-frame JPEG decode out of a real
  ISO BMFF sample table (stsd/stts/stsz/stco), coefficient statistics
  replayed arithmetically by the oracle.

Round 6 also widens the retrieval/curation tier with two operators a
training-data pipeline runs daily:

- ``bm25_search`` — BM25 top-k keyword retrieval (scan-local per-term
  tf, one global stats row broadcast back, TakeOrdered);
- ``line_dedup`` — CCNet-style line-level boilerplate removal (count
  lines corpus-wide, drop ≥-threshold lines, reassemble pages);
- ``quality_classifier`` — fastText-style hashed linear scoring,
  fully scan-local (integer feature folds, zero exchanges);
- ``dsir_importance`` — DSIR importance weights (target-vs-raw hashed
  unigram LMs, bounded bucket stats broadcast back);
- ``weighted_sample`` — Efraimidis–Spirakis weighted sampling via
  md5-uniform priorities (scan-local + TakeOrdered);
- ``jsonl_ingest`` — PERMISSIVE JSONL parsing with corrupt-record
  quarantine (from_json in the scan projection);
- ``domain_topk`` — per-stratum top-k WITHOUT a window (two-phase
  truncating aggregation, the kmv_distinct discipline);
- ``inverted_index`` — posting-list construction (per-term sorted
  (doc, tf) arrays assembled in an ObjectHashAggregate);
- ``table_stats`` — one-scan ANALYZE (null counts, exact NDVs,
  type-aware min/max) for every lineitem column;
- ``kmeans_refine`` — full-corpus distributed Lloyd iterations with
  decimal-exact order-independent sums (the oracle replays every
  iteration as unrolled CTEs);
- ``stratified_weighted_sample`` — per-stratum A-ES reservoirs riding
  the windowless group_topk aggregation;
- ``ann_recall`` — recall@5 of the probed IVF search vs exact brute
  force, per query, both sides deterministic so the measurement
  itself sits under the cross-engine hash;
- ``binary_topk`` — sign-bit binary-quantization ANN (two BIGINT
  halves per vector, xor+bit_count Hamming pre-rank, exact cosine
  rescore of the bounded candidate set);
- ``curated_sample`` — the COMPOSED curation pipeline
  (classifier-gate then A-ES sample) under one hash: operators
  compose deterministically, not just run alone;
- ``hll_join_card`` — sketch-only join-cardinality estimation
  (register-merge union + inclusion-exclusion), the CBO primitive:
  join sizes estimated without touching either table;
- ``validate_lineitem`` — declarative data-quality expectations
  (null/range/enum/regex in one scan, uniqueness, referential
  integrity), the Deequ/dbt-test shape with exact-integer verdicts;
- ``skew_report`` — pre-join key-skew diagnostics (heaviest keys,
  integer-exact per-mille shares and mean-load multiples).

Same cross-engine determinism rules as :mod:`suite`.
"""

from __future__ import annotations

from magmapandas_spark.operators.similarity import (
    _SEMDEDUP_GATE_MCR,
    q_semdedup_sharded,
    sql_semdedup,
)


def queries():
    from magmapandas_spark.operators.curation import (
        q_stratified_weighted_sample,
        q_weighted_sample,
    )
    from magmapandas_spark.operators.binary_ann import q_binary_topk
    from magmapandas_spark.operators.evaluation import q_ann_recall
    from magmapandas_spark.operators.indexing import (
        q_domain_topk,
        q_inverted_index,
    )
    from magmapandas_spark.operators.jsonl import q_jsonl_ingest
    from magmapandas_spark.operators.kmeans import q_kmeans_refine
    from magmapandas_spark.operators.mp4 import q_video_frame_decode
    from magmapandas_spark.operators.scoring import (
        q_curated_sample,
        q_dsir_importance,
        q_quality_classifier,
    )
    from magmapandas_spark.operators.sketches import q_hll_join_card
    from magmapandas_spark.operators.stats import q_table_stats
    from magmapandas_spark.operators.tfidf import q_bm25_search
    from magmapandas_spark.operators.validation import (
        q_skew_report,
        q_validate_lineitem,
    )
    from magmapandas_spark.operators.webcorpus import q_line_dedup

    return {
        "semdedup_sharded": q_semdedup_sharded,
        "video_frame_decode": q_video_frame_decode,
        "bm25_search": q_bm25_search,
        "line_dedup": q_line_dedup,
        "quality_classifier": q_quality_classifier,
        "dsir_importance": q_dsir_importance,
        "weighted_sample": q_weighted_sample,
        "jsonl_ingest": q_jsonl_ingest,
        "domain_topk": q_domain_topk,
        "inverted_index": q_inverted_index,
        "table_stats": q_table_stats,
        "kmeans_refine": q_kmeans_refine,
        "stratified_weighted_sample": q_stratified_weighted_sample,
        "ann_recall": q_ann_recall,
        "binary_topk": q_binary_topk,
        "curated_sample": q_curated_sample,
        "hll_join_card": q_hll_join_card,
        "validate_lineitem": q_validate_lineitem,
        "skew_report": q_skew_report,
    }


def oracle_sql():
    from magmapandas_spark.operators.curation import (
        SQL_STRATIFIED_WEIGHTED_SAMPLE,
        SQL_WEIGHTED_SAMPLE,
    )
    from magmapandas_spark.operators.binary_ann import sql_binary_topk
    from magmapandas_spark.operators.evaluation import sql_ann_recall
    from magmapandas_spark.operators.indexing import (
        SQL_DOMAIN_TOPK,
        SQL_INVERTED_INDEX,
    )
    from magmapandas_spark.operators.jsonl import SQL_JSONL_INGEST
    from magmapandas_spark.operators.kmeans import sql_kmeans_refine
    from magmapandas_spark.operators.mp4 import SQL_VIDEO_FRAME_DECODE
    from magmapandas_spark.operators.scoring import (
        _sql_curated_sample,
        _sql_dsir_importance,
        _sql_quality_classifier,
    )
    from magmapandas_spark.operators.sketches import SQL_HLL_JOIN_CARD
    from magmapandas_spark.operators.stats import SQL_TABLE_STATS
    from magmapandas_spark.operators.tfidf import _sql_bm25_search
    from magmapandas_spark.operators.validation import (
        SQL_SKEW_REPORT,
        SQL_VALIDATE_LINEITEM,
    )
    from magmapandas_spark.operators.webcorpus import SQL_LINE_DEDUP

    return {
        "semdedup_sharded": sql_semdedup(
            max_cell_rows=_SEMDEDUP_GATE_MCR
        ),
        "video_frame_decode": SQL_VIDEO_FRAME_DECODE,
        "bm25_search": _sql_bm25_search(),
        "line_dedup": SQL_LINE_DEDUP,
        "quality_classifier": _sql_quality_classifier(),
        "dsir_importance": _sql_dsir_importance(),
        "weighted_sample": SQL_WEIGHTED_SAMPLE,
        "jsonl_ingest": SQL_JSONL_INGEST,
        "domain_topk": SQL_DOMAIN_TOPK,
        "inverted_index": SQL_INVERTED_INDEX,
        "table_stats": SQL_TABLE_STATS,
        "kmeans_refine": sql_kmeans_refine(),
        "stratified_weighted_sample": SQL_STRATIFIED_WEIGHTED_SAMPLE,
        "ann_recall": sql_ann_recall(),
        "binary_topk": sql_binary_topk(),
        "curated_sample": _sql_curated_sample(),
        "hll_join_card": SQL_HLL_JOIN_CARD,
        "validate_lineitem": SQL_VALIDATE_LINEITEM,
        "skew_report": SQL_SKEW_REPORT,
    }
