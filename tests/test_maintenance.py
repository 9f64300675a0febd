"""Table-maintenance operators: compaction and Z-order clustering."""

import glob
import os
import shutil
import tempfile

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from magmapandas_spark.operators.maintenance import (
    compact_parquet,
    write_zordered,
    zvalue,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="maint_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_compact_parquet(spark, workdir):
    path = f"{workdir}/frag"
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    li.repartition(40).write.parquet(path)  # fragment into 40 files
    before = len(glob.glob(f"{path}/*.parquet"))
    assert before == 40
    n_rows = spark.read.parquet(path).count()

    stats = compact_parquet(spark, path, target_file_mb=128)
    assert stats["files_before"] == 40
    after = len(glob.glob(f"{path}/*.parquet"))
    # the whole table is << 128 MB -> one output file
    assert after == stats["files_after"] == 1
    # values survive the swap
    assert spark.read.parquet(path).count() == n_rows
    # no leftover temp/old dirs
    assert not glob.glob(f"{path}__*")


def test_zvalue_locality(spark):
    """Morton property: known bit interleavings on a tiny frame."""
    from magmapandas_spark.operators.maintenance import _interleave_bits

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 2)], "x long, y long"
    )
    out = df.select(
        "x", "y", _interleave_bits([F.col("x"), F.col("y")], 2).alias("z")
    ).collect()
    z = {(r["x"], r["y"]): r["z"] for r in out}
    # interleave x into even bits, y into odd: z(1,0)=1, z(0,1)=2,
    # z(1,1)=3, z(2,2)=12
    assert z[(0, 0)] == 0
    assert z[(1, 0)] == 1
    assert z[(0, 1)] == 2
    assert z[(1, 1)] == 3
    assert z[(2, 2)] == 12


def _file_spans(path: str, col: str) -> list[tuple]:
    """(min, max) of ``col`` per parquet file, from footer statistics —
    exactly what a reader's row-group pruning consults."""
    spans = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        pf = pq.ParquetFile(f)
        mn, mx = None, None
        for rg in range(pf.num_row_groups):
            meta = pf.metadata.row_group(rg)
            for ci in range(meta.num_columns):
                c = meta.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    mn = s.min if mn is None else min(mn, s.min)
                    mx = s.max if mx is None else max(mx, s.max)
        if mn is not None:
            spans.append((mn, mx))
    return spans


def test_zorder_improves_second_column_pruning(spark, workdir):
    """Z-order's payoff: per-file min/max spans are narrow for BOTH
    cluster columns, so a point/range predicate on the second column
    prunes most files — with a linear sort it prunes none."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    n_files = 16

    lin_path = f"{workdir}/linear"
    (
        li.repartitionByRange(n_files, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.parquet(lin_path)
    )
    z_path = f"{workdir}/zorder"
    write_zordered(li, z_path, ["l_partkey", "l_suppkey"],
                   n_files=n_files)

    # same data
    assert (
        spark.read.parquet(z_path).count()
        == spark.read.parquet(lin_path).count()
    )

    lo, hi = li.agg(
        F.min("l_suppkey"), F.max("l_suppkey")
    ).collect()[0]
    full_span = hi - lo

    def prunable_fraction(path: str) -> float:
        """Fraction of files a mid-range point predicate on l_suppkey
        can skip, per footer min/max."""
        probe = (lo + hi) // 2
        spans = _file_spans(path, "l_suppkey")
        assert len(spans) >= n_files // 2  # actually split into files
        skipped = sum(1 for mn, mx in spans if not (mn <= probe <= mx))
        return skipped / len(spans)

    lin_frac = prunable_fraction(lin_path)
    z_frac = prunable_fraction(z_path)
    # linear sort on l_partkey leaves every file spanning ~all of
    # l_suppkey (no pruning); z-order must let the reader skip most
    assert lin_frac <= 0.2
    assert z_frac >= 0.5
    assert z_frac > lin_frac


def test_merge_upsert_semantics(spark):
    from magmapandas_spark.operators.maintenance import merge_upsert
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    cdc = spark.createDataFrame(
        [(2, "B", False), (3, None, True), (4, "d", False)],
        "k long, v string, _delete boolean",
    )
    out = (
        merge_upsert(base, cdc, "k", delete_col="_delete")
        .orderBy("k")
        .toPandas()
    )
    assert list(zip(out["k"], out["v"])) == [(1, "a"), (2, "B"), (4, "d")]


def test_merge_upsert_null_delete_flag_is_upsert(spark):
    """A NULL delete flag (nullable CDC feeds) must mean not-deleted:
    the update row survives, instead of the key silently vanishing
    (anti-joined out of base, then dropped by a ~NULL filter)."""
    from magmapandas_spark.operators.maintenance import merge_upsert

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    cdc = spark.createDataFrame(
        [(1, "A", None)], "k long, v string, _delete boolean"
    )
    out = (
        merge_upsert(base, cdc, "k", delete_col="_delete")
        .orderBy("k")
        .toPandas()
    )
    assert list(zip(out["k"], out["v"])) == [(1, "A"), (2, "b")]


def test_merge_upsert_no_delete_col(spark):
    from magmapandas_spark.operators.maintenance import merge_upsert

    base = spark.createDataFrame([(1, "a")], "k long, v string")
    cdc = spark.createDataFrame([(1, "A")], "k long, v string")
    out = merge_upsert(base, cdc, "k").toPandas()
    assert list(zip(out["k"], out["v"])) == [(1, "A")]
