"""TAS classification (Le Bas et al. 1986): the reference's label
anchor coordinates (``geoplot/TAS_diagram.py:25-45``, one point inside
each field) must classify to their own rock name, and the chain must
partition the diagram frame with no gaps."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from magmapandas_spark.operators.geochem_aux import (
    tas_classify_col,
    tas_classify_sql,
)

# (SiO2, Na2O+K2O) label anchors from the reference's rock_labels
ANCHORS = {
    "Picro-basalt": (43.0, 1.5),
    "Basalt": (49.0, 2.5),
    "Basaltic andesite": (54.5, 2.5),
    "Andesite": (60.0, 2.5),
    "Dacite": (68.0, 4.0),
    "Trachy-basalt": (49.0, 5.5),
    "Basaltic trachy-andesite": (52.5, 6.5),
    "Trachy-andesite": (58.5, 8.0),
    "Trachyte": (64.0, 11.0),
    "Tephrite": (45.0, 7.0),
    "Phono-tephrite": (49.0, 9.0),
    "Tephri-phonolite": (53.0, 11.0),
    "Phonolite": (57.0, 15.0),
    "Foidite": (45.0, 14.0),
    "Rhyolite": (75.0, 8.5),
}


def test_anchor_points_classify_to_their_field(spark):
    pdf = pd.DataFrame(
        [(n, x, y) for n, (x, y) in ANCHORS.items()],
        columns=["expected", "x", "y"],
    )
    df = spark.createDataFrame(pdf).withColumn(
        "rock", tas_classify_col(F.col("x"), F.col("y"))
    )
    rows = df.select("expected", "rock").collect()
    mism = [(r.expected, r.rock) for r in rows if r.expected != r.rock]
    assert not mism, f"misclassified anchors: {mism}"


def test_sql_case_agrees_on_anchors():
    con = duckdb.connect()
    vals = ", ".join(
        f"('{n}', {x!r}, {y!r})" for n, (x, y) in ANCHORS.items()
    )
    case = tas_classify_sql("CAST(x AS DOUBLE)", "CAST(y AS DOUBLE)")
    got = con.execute(
        f"SELECT expected, {case} AS rock "
        f"FROM (VALUES {vals}) t(expected, x, y)"
    ).fetchall()
    mism = [(e, r) for e, r in got if e != r]
    assert not mism, f"SQL CASE misclassified: {mism}"


def test_frame_partition_has_no_gaps(spark):
    """Every grid point inside the classified frame (x in [41, 77.2],
    y in [0, 16]) lands in a named field — the half-plane chain tiles
    the diagram without holes."""
    pts = spark.range(0, 3700).select(
        (F.lit(41.05) + (F.col("id") % 362).cast("double") * F.lit(0.1))
        .alias("x"),
        (F.lit(0.05) + (F.col("id") / 362).cast("int").cast("double")
         * F.lit(1.6)).alias("y"),
    )
    unclassified = (
        pts.withColumn("rock", tas_classify_col(F.col("x"), F.col("y")))
        .filter(F.col("rock") == "unclassified")
        .count()
    )
    assert unclassified == 0
