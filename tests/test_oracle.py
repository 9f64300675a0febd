"""Local mirror of the driver's t2 correctness gate: run every suite
query on Spark and its oracle SQL on DuckDB over the same sf0.01 parquet,
then demand EXACT value equality (the driver hash-compares values, so
close-but-not-equal is a failure here too)."""

import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

# Override with SPARK_GRAFT_SF_DIR (same knob bench.py honors) to run
# the identical exact-equality sweep at another scale factor, e.g.
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 pytest tests/test_oracle.py
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_connection():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return pdf


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    spark_df = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        assert len(spark_df) >= 0
        return
    con = duck_connection()
    duck_df = con.execute(ORACLES[name]).fetchdf()
    con.close()

    assert len(spark_df) == len(duck_df), (
        f"{name}: row count {len(spark_df)} vs oracle {len(duck_df)}"
    )
    a, b = normalize(spark_df), normalize(duck_df)
    assert list(a.columns) == list(b.columns), (
        f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
    )
    for col in a.columns:
        av, bv = a[col], b[col]
        # the driver hashes rendered values, so int-vs-float column types
        # (e.g. DuckDB HUGEINT -> float64 vs Spark BIGINT) are a real
        # mismatch even when values are numerically equal
        ak, bk = av.dtype.kind, bv.dtype.kind
        assert ak == bk or {ak, bk} <= {"i", "u"}, (
            f"{name}.{col}: dtype kind {ak} (spark) vs {bk} (oracle)"
        )
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float)
            bv = bv.astype(float)
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
        else:
            # both-null counts as equal (NaT/None render identically in
            # the driver's value hash, but NaT != NaT under .eq)
            eq = av.astype(object).eq(bv.astype(object)) | (
                av.isna() & bv.isna()
            )
        if not eq.all():
            bad = np.where(~eq)[0][:5]
            raise AssertionError(
                f"{name}.{col}: {int((~eq).sum())} mismatches, e.g. rows "
                f"{bad.tolist()}: spark={av.iloc[bad].tolist()} "
                f"oracle={bv.iloc[bad].tolist()}"
            )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
