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

Round-9 codec notches and the cross-modal dedup report register here
as they land.
"""

from __future__ import annotations


def queries():
    from magmapandas_spark.operators.analytics import (
        q_abc_classification_sketch,
    )
    from magmapandas_spark.operators.png import q_fp_index_probe

    return {
        "fp_index_probe": q_fp_index_probe,
        "abc_classification_sketch": q_abc_classification_sketch,
    }


def oracle_sql():
    from magmapandas_spark.operators.analytics import (
        SQL_ABC_CLASSIFICATION_SKETCH,
    )
    from magmapandas_spark.operators.png import SQL_FP_INDEX_PROBE

    return {
        "fp_index_probe": SQL_FP_INDEX_PROBE,
        "abc_classification_sketch": SQL_ABC_CLASSIFICATION_SKETCH,
    }
