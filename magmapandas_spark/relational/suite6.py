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

Same cross-engine determinism rules as :mod:`suite`.
"""

from __future__ import annotations

from magmapandas_spark.operators.similarity import (
    _SEMDEDUP_GATE_MCR,
    q_semdedup_sharded,
    sql_semdedup,
)


def queries():
    from magmapandas_spark.operators.mp4 import q_video_frame_decode

    return {
        "semdedup_sharded": q_semdedup_sharded,
        "video_frame_decode": q_video_frame_decode,
    }


def oracle_sql():
    from magmapandas_spark.operators.mp4 import SQL_VIDEO_FRAME_DECODE

    return {
        "semdedup_sharded": sql_semdedup(
            max_cell_rows=_SEMDEDUP_GATE_MCR
        ),
        "video_frame_decode": SQL_VIDEO_FRAME_DECODE,
    }
