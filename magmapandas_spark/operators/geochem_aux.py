"""Auxiliary geochemistry operators backing the reference's ``geoplot``
surface (``src/geoplot/``) — the data-producing parts re-expressed as
Spark plans; rendering stays driver-side on collected (tiny) results.

- :func:`rhodes_isopleth_grid` — ``geoplot/rhodes.py:5-19``: the Kd
  isopleth grid is a cross join of two literal ranges + one expression
  (SURVEY §2.8 marks it expr-able).
- :func:`reservoir_normalize` — spider-diagram normalization
  (``geoplot/trace_elements.py:79-121``): divide trace-element columns
  by a reservoir composition — per-column literal division, broadcast-
  free. C1-chondrite values of McDonough & Sun (1995) ship as the
  default reservoir (published data).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# C1 chondrite, McDonough & Sun (1995), ppm — published reference values
C1_CHONDRITE = {
    "La": 0.237, "Ce": 0.613, "Pr": 0.0928, "Nd": 0.457, "Sm": 0.148,
    "Eu": 0.0563, "Gd": 0.199, "Tb": 0.0361, "Dy": 0.246, "Ho": 0.0546,
    "Er": 0.160, "Tm": 0.0247, "Yb": 0.161, "Lu": 0.0246,
    "Rb": 2.3, "Ba": 2.41, "Th": 0.029, "U": 0.0074, "Nb": 0.24,
    "Sr": 7.25, "Zr": 3.82, "Hf": 0.103, "Y": 1.57,
}


def rhodes_isopleth_grid(
    spark: SparkSession,
    kd_min: float = 0.1,
    kd_max: float = 0.4,
    stepsize: float = 0.1,
    mg_no_melt=(0.2, 1.0, 0.01),
) -> DataFrame:
    """Olivine-melt equilibrium isopleths for a Rhodes diagram
    (``rhodes.py:5-19``): Fo(mg#_melt, Kd) = 100/(1 + Kd·Fe2Mg_melt),
    as crossJoin(Kd levels × mg# range) + one expression."""
    kds = [
        round(v, 2)
        for v in np.arange(kd_min, kd_max + 0.01, stepsize)
    ]
    lo, hi, step = mg_no_melt
    n = int(round((hi - lo) / step))
    mg = spark.range(n).select(
        (F.lit(float(lo)) + F.col("id") * F.lit(float(step))).alias(
            "mg_no_melt"
        )
    )
    kd_df = spark.createDataFrame(
        pd.DataFrame({"Kd": [float(k) for k in kds]})
    )
    fe2mg = (F.lit(1.0) - F.col("mg_no_melt")) / F.col("mg_no_melt")
    return mg.crossJoin(F.broadcast(kd_df)).select(
        "mg_no_melt",
        "Kd",
        (F.lit(100.0) / (F.lit(1.0) + F.col("Kd") * fe2mg)).alias(
            "forsterite"
        ),
    )


def reservoir_normalize(
    df: DataFrame,
    elements: list[str] | None = None,
    reservoir: dict[str, float] | None = None,
    suffix: str = "_N",
) -> DataFrame:
    """Normalize trace-element columns to a reservoir composition
    (chondrite/primitive-mantle spider diagrams). Division by literals
    — fully codegen'd, no join."""
    if reservoir is None:
        reservoir = C1_CHONDRITE
    if elements is None:
        elements = [c for c in df.columns if c in reservoir]
    missing = [e for e in elements if e not in reservoir]
    if missing:
        raise ValueError(f"no reservoir value for {missing}")
    return df.withColumns(
        {
            f"{e}{suffix}": F.col(e) / F.lit(float(reservoir[e]))
            for e in elements
        }
    )


# ---- suite entries ----------------------------------------------------

_TRACE_SYNTH = ["La", "Ce", "Nd", "Yb"]


def q_chondrite_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chondrite-normalized trace elements (spider-diagram input,
    ``geoplot/trace_elements.py:79-121``): synthetic ppm columns derived
    from lineitem keys, divided by the McDonough & Sun (1995) C1
    literals. Narrow, zero-shuffle."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("name"),
        (
            F.lit(1.0) + (F.col("l_partkey") % 50).cast("double") * F.lit(0.1)
        ).alias("La"),
        (
            F.lit(2.0) + (F.col("l_suppkey") % 40).cast("double") * F.lit(0.15)
        ).alias("Ce"),
        (
            F.lit(0.5) + (F.col("l_orderkey") % 30).cast("double") * F.lit(0.05)
        ).alias("Nd"),
        (
            F.lit(0.1) + (F.col("l_partkey") % 20).cast("double") * F.lit(0.02)
        ).alias("Yb"),
    )
    out = reservoir_normalize(base, elements=_TRACE_SYNTH)
    return out.select(
        "name",
        *[
            F.round(F.col(f"{e}_N"), 6).alias(f"{e}_N")
            for e in _TRACE_SYNTH
        ],
    ).orderBy("name")


def sql_chondrite_normalize() -> str:
    synth = {
        "La": "(1.0 + (l_partkey % 50) * 0.1)",
        "Ce": "(2.0 + (l_suppkey % 40) * 0.15)",
        "Nd": "(0.5 + (l_orderkey % 30) * 0.05)",
        "Yb": "(0.1 + (l_partkey % 20) * 0.02)",
    }
    cols = ",\n  ".join(
        f"ROUND({synth[e]} / {float(C1_CHONDRITE[e])!r}, 6) AS {e}_N"
        for e in _TRACE_SYNTH
    )
    return f"""
SELECT l_orderkey * 10 + l_linenumber AS name,
  {cols}
FROM lineitem
ORDER BY name
"""


def q_rhodes_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rhodes-diagram equilibrium isopleths (``geoplot/rhodes.py:5-19``):
    broadcast crossJoin of Kd levels x mg# range + one expression."""
    out = rhodes_isopleth_grid(spark)
    return out.select(
        F.round("mg_no_melt", 6).alias("mg_no_melt"),
        "Kd",
        F.round("forsterite", 6).alias("forsterite"),
    ).orderBy("mg_no_melt", "Kd")


def sql_rhodes_grid() -> str:
    kds = ", ".join(repr(v) for v in (0.1, 0.2, 0.3, 0.4))
    return f"""
WITH mg AS (
  SELECT 0.2 + CAST(i.i AS DOUBLE) * 0.01 AS mg_no_melt
  FROM UNNEST(range(80)) i(i)
),
kd AS (SELECT u.kd AS Kd FROM UNNEST([{kds}]) u(kd))
SELECT ROUND(mg_no_melt, 6) AS mg_no_melt, Kd,
       ROUND(100.0 / (1.0 + Kd * ((1.0 - mg_no_melt) / mg_no_melt)), 6)
         AS forsterite
FROM mg, kd
ORDER BY mg_no_melt, Kd
"""
