"""Correctness-suite part 13 (round 9, continued): the H.264
P-slice inter-prediction notch.

- ``h264_p_decode`` — codec notch 13: single-reference P slices over
  a real I->P->P chain — quarter-sample luma motion compensation
  (spec 8.4.2.2.1: 6-tap half-pel filters, the center ``j`` through
  un-rounded intermediates, Table 8-12 quarter averages, Clip3 edge
  clamping on unrestricted vectors), eighth-sample bilinear chroma
  (8.4.2.2.2), median motion-vector prediction with the C -> D
  substitution and both special cases (8.4.1.3), P_Skip derivation
  via mb_skip_run (8.4.1.1), Table 9-4 INTER coded_block_pattern with
  4x4 residuals over motion-compensated prediction, and intra-in-P
  macroblocks (Table 7-13 offset) predicting from
  inter-reconstructed neighbors.
- ``h264_mp4_p_decode`` — the container x INTER capstone: the same
  corpus shipped as AVC-in-MP4 and decoded as a SEQUENTIAL track
  (``decode_avc_track``), so every P picture motion-compensates from
  the previously reconstructed sample out of the ISO BMFF sample
  table.
- ``h264_pparts_decode`` — codec notch 14: 16x8 / 8x16 macroblock
  PARTITIONS across TWO-slice P pictures — per-partition mvd pairs,
  partition-granular neighbor state (spec 6.4.11.7), the directional
  MVP shortcuts (8.4.1.3), slice-gated predictor derivation on row-2
  macroblocks, partition-sized quarter-pel motion compensation.
- ``h264_p8x8_decode`` — codec notch 15: P_8x8 / P_8x8ref0
  SUB-macroblock partitions (per-8x8 sub_mb_type, all four Table
  7-17 shapes mixed within one MB, per-sub-partition mvds, median
  MVP at sub-partition granularity, 8x4/4x8/4x4 MC) — the P-slice
  partition tree complete.
- ``h264_multiref_decode`` — codec notch 16: MULTIPLE reference
  frames — a real two-picture DPB (RefPicList0 in PicNum order),
  te(v) ref_idx_l0 per partition / per 8x8 block, the
  num_ref_idx_active_override path, refIdx-aware MV prediction.
- ``h264_weighted_decode`` — codec notch 17: EXPLICIT WEIGHTED
  prediction — pred_weight_table parsing with per-reference
  flags/defaults, spec-8.4.2.3.2 scaling on every MC partition and
  P_Skip macroblock, per-plane chroma weights, clipping and a
  negative-weight (inverted-fade) reference.
- ``h264_reorder_decode`` — codec notch 18: ref_pic_list_modification
  — the spec-7.3.3.1 command syntax and spec-8.2.4.3.1 reordering
  process (picNumLXPred chains, insertion/elision/truncation),
  placing the OLDEST picture at ref_idx 0.
"""

from __future__ import annotations


def queries():
    from magmapandas_spark.operators.h264p import (
        q_h264_multiref_decode,
        q_h264_p_decode,
        q_h264_reorder_decode,
        q_h264_weighted_decode,
        q_h264_p8x8_decode,
        q_h264_pparts_decode,
    )
    from magmapandas_spark.operators.mp4 import q_h264_mp4_p_decode

    return {
        "h264_p_decode": q_h264_p_decode,
        "h264_mp4_p_decode": q_h264_mp4_p_decode,
        "h264_pparts_decode": q_h264_pparts_decode,
        "h264_p8x8_decode": q_h264_p8x8_decode,
        "h264_multiref_decode": q_h264_multiref_decode,
        "h264_weighted_decode": q_h264_weighted_decode,
        "h264_reorder_decode": q_h264_reorder_decode,
    }


def oracle_sql():
    from magmapandas_spark.operators.h264p import (
        SQL_H264_MP4_P_DECODE,
        SQL_H264_MULTIREF_DECODE,
        SQL_H264_P_DECODE,
        SQL_H264_P8X8_DECODE,
        SQL_H264_PPARTS_DECODE,
        SQL_H264_REORDER_DECODE,
        SQL_H264_WEIGHTED_DECODE,
    )

    return {
        "h264_p_decode": SQL_H264_P_DECODE,
        "h264_mp4_p_decode": SQL_H264_MP4_P_DECODE,
        "h264_pparts_decode": SQL_H264_PPARTS_DECODE,
        "h264_p8x8_decode": SQL_H264_P8X8_DECODE,
        "h264_multiref_decode": SQL_H264_MULTIREF_DECODE,
        "h264_weighted_decode": SQL_H264_WEIGHTED_DECODE,
        "h264_reorder_decode": SQL_H264_REORDER_DECODE,
    }
