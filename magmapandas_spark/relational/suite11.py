"""Correctness-suite part 11 (round 8): scale-path twins and
entity-resolution recall closure.

- ``rfm_segments_sketch`` — RFM segmentation with quintile edges from
  the 1000-bin histogram sketch (operators/quantiles.py formula) and
  scan-local binning: the no-global-sort scale twin of the exact
  ``rfm_segments`` (the established exact↔mergeable pairing).
- ``er_golden_multipass`` — multi-pass sorted-neighborhood entity
  resolution: a second SNM pass on an independent sort key (reversed
  name) unioned with the first before connected components, closing
  the single-pass cross-block recall loss; recall vs brute-force
  truth pairs is measured UNDER the gate hash.
"""

from __future__ import annotations


def queries():
    from magmapandas_spark.operators.analytics import q_rfm_segments_sketch
    from magmapandas_spark.operators.fuzzy import q_er_golden_multipass

    return {
        "rfm_segments_sketch": q_rfm_segments_sketch,
        "er_golden_multipass": q_er_golden_multipass,
    }


def oracle_sql():
    from magmapandas_spark.operators.analytics import SQL_RFM_SEGMENTS_SKETCH
    from magmapandas_spark.operators.fuzzy import SQL_ER_GOLDEN_MULTIPASS

    return {
        "rfm_segments_sketch": SQL_RFM_SEGMENTS_SKETCH,
        "er_golden_multipass": SQL_ER_GOLDEN_MULTIPASS,
    }
