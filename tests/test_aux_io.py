"""Sinks + geochem auxiliary operators (rhodes grid, reservoir
normalization)."""

import numpy as np
import pandas as pd

from magmapandas_spark.operators.geochem_aux import (
    C1_CHONDRITE,
    reservoir_normalize,
    rhodes_isopleth_grid,
)
from magmapandas_spark.parse_io.writers import write_csv, write_parquet


def test_rhodes_isopleth_grid(spark):
    out = rhodes_isopleth_grid(spark).toPandas()
    # 4 Kd levels x 80 mg# steps
    assert len(out) == 4 * 80
    # reference formula: Fo = 100 / (1 + Kd*(1-mg)/mg)
    row = out[(out.Kd == 0.3)].sort_values("mg_no_melt").iloc[10]
    mg = row["mg_no_melt"]
    exp = 100.0 / (1.0 + 0.3 * (1 - mg) / mg)
    assert abs(row["forsterite"] - exp) < 1e-9
    # monotonic in mg# for fixed Kd
    fo = out[out.Kd == 0.2].sort_values("mg_no_melt")["forsterite"]
    assert (np.diff(fo) > 0).all()


def test_reservoir_normalize(spark):
    pdf = pd.DataFrame(
        {"name": ["s1"], "La": [23.7], "Yb": [1.61], "SiO2": [50.0]}
    )
    out = reservoir_normalize(spark.createDataFrame(pdf)).toPandas()
    assert abs(out["La_N"][0] - 23.7 / C1_CHONDRITE["La"]) < 1e-9
    assert abs(out["Yb_N"][0] - 10.0) < 1e-9
    assert "SiO2_N" not in out.columns  # not a trace element


def test_parquet_csv_round_trip(spark, tmp_path):
    pdf = pd.DataFrame(
        {"name": ["a", "b"], "SiO2": [50.0, 52.0], "MgO": [7.0, 6.0]}
    )
    df = spark.createDataFrame(pdf)
    pq = str(tmp_path / "t.parquet")
    write_parquet(df, pq, partition_by=["name"])
    back = spark.read.parquet(pq)
    assert back.count() == 2
    assert set(back.columns) == {"name", "SiO2", "MgO"}

    csv = str(tmp_path / "t.csv")
    write_csv(df, csv)
    back_csv = spark.read.option("header", True).csv(csv)
    assert back_csv.count() == 2
