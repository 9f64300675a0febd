"""Correctness-suite part 12 (round 9): the verified-index closure,
the ABC sketch twin, and the H.264 AC/I_4x4 codec notch.

- ``fp_index_probe`` — replays the bucketed fingerprint index path
  (``write_fp_index`` build + ``incremental_fp_duplicates`` batch
  probe) under the oracle hash, completing the verified-index pattern
  (LSH and IVF probes already have hashed relational twins).
- ``abc_classification_sketch`` — Pareto ABC classes from the
  1000-bin revenue histogram beside the exact rank-window classes
  (the ``gini_sketch`` exact↔mergeable pairing); estimator error is a
  hashed column.

- ``h264_ac_decode`` — codec notch 10: I_16x16 macroblocks with FULL
  4x4 AC residuals (Intra16x16ACLevel under the scaled DC, chroma
  DC+AC, Table 9-7/9-10 total_zeros/run_before, spec-8.5.12 AC
  scaling + inverse core transform) across QP 20..31.
- ``h264_i4x4_decode`` — codec notch 11: Intra_4x4 macroblocks (all
  nine spec-8.3.1.2 modes, sequential most-probable-mode inference,
  Table 9-4 me(v) CBP, LumaLevel4x4 in the real per-4x4 nC context)
  — the last structure between the ladder and real baseline-encoder
  I-frame output.
- ``h264_ladder_decode`` — codec notch 12: the REGENERATED
  composition corpus (GOP x multi-PPS x multi-slice x AC x I_4x4 in
  one stream, with slice-gated availability on row-2 predicted MBs).

- ``h264_mp4_ac_decode`` — the container x AC capstone: the notch-12
  corpus shipped as AVC-in-MP4 (multi-parameter-set avcC, two-slice
  access units) through the ISO BMFF walk + full AC/I_4x4 decode.
- ``corpus_build_funnel`` — the pipeline legs COMPOSED: one
  five-stage corpus snapshot report (quality -> langid -> prefix
  dedup -> Bloom decontamination) with per-stage doc/token survival.
- ``crossmodal_dedup`` — the multimodal quad COMPOSED: one
  per-asset verdict joining the text/video/audio/image fingerprint
  collision sets (each leg aggregated to the 12-asset grain before a
  broadcast-sized join; every decode still one narrow Arrow stage).
"""

from __future__ import annotations


def queries():
    from magmapandas_spark.operators.analytics import (
        q_abc_classification_sketch,
    )
    from magmapandas_spark.operators.h264 import (
        q_h264_ac_decode,
        q_h264_i4x4_decode,
        q_h264_ladder_decode,
    )
    from magmapandas_spark.operators.curation import (
        q_corpus_build_funnel,
    )
    from magmapandas_spark.operators.mp4 import q_h264_mp4_ac_decode
    from magmapandas_spark.operators.multimodal import q_crossmodal_dedup
    from magmapandas_spark.operators.png import q_fp_index_probe

    return {
        "fp_index_probe": q_fp_index_probe,
        "abc_classification_sketch": q_abc_classification_sketch,
        "h264_ac_decode": q_h264_ac_decode,
        "h264_i4x4_decode": q_h264_i4x4_decode,
        "h264_ladder_decode": q_h264_ladder_decode,
        "crossmodal_dedup": q_crossmodal_dedup,
        "h264_mp4_ac_decode": q_h264_mp4_ac_decode,
        "corpus_build_funnel": q_corpus_build_funnel,
    }


def oracle_sql():
    from magmapandas_spark.operators.analytics import (
        SQL_ABC_CLASSIFICATION_SKETCH,
    )
    from magmapandas_spark.operators.h264 import (
        SQL_H264_AC_DECODE,
        SQL_H264_I4X4_DECODE,
        SQL_H264_LADDER_DECODE,
        SQL_H264_MP4_AC_DECODE,
    )
    from magmapandas_spark.operators.curation import (
        SQL_CORPUS_BUILD_FUNNEL,
    )
    from magmapandas_spark.operators.multimodal import _sql_crossmodal
    from magmapandas_spark.operators.png import SQL_FP_INDEX_PROBE

    return {
        "fp_index_probe": SQL_FP_INDEX_PROBE,
        "abc_classification_sketch": SQL_ABC_CLASSIFICATION_SKETCH,
        "h264_ac_decode": SQL_H264_AC_DECODE,
        "h264_i4x4_decode": SQL_H264_I4X4_DECODE,
        "h264_ladder_decode": SQL_H264_LADDER_DECODE,
        "crossmodal_dedup": _sql_crossmodal(),
        "h264_mp4_ac_decode": SQL_H264_MP4_AC_DECODE,
        "corpus_build_funnel": SQL_CORPUS_BUILD_FUNNEL,
    }
