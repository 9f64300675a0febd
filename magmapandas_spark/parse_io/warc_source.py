"""WARC as a first-class Spark data source — ``spark.read.format("warc")``.

PySpark 4's Python Data Source API is the idiomatic way to teach
Spark a format it lacks: the source plans one InputPartition per WARC
file (WARC is not splittable mid-file without an external index — the
standard crawl posture; Common Crawl files are ~1 GB by convention),
executors parse their files with the SAME validated record walk the
mapInPandas path uses (`operators/warc.py::warc_parse`), and rows
arrive as Arrow-friendly tuples. Column pruning and filtering happen
in Spark above the source; the payload bytes never touch the driver.

Scale posture: partition planning is a driver-side file listing (one
cheap ls, no data IO); record parsing is embarrassingly parallel per
file; a 100k-file crawl segment becomes 100k partitions that AQE and
the scheduler pack onto executors. Gzipped members (``.warc.gz``) are
gunzipped in-executor first — same contract as
`operators/warc.py::parse_warc_gz_records`.

Registration is explicit and per-session::

    from magmapandas_spark.parse_io.warc_source import register_warc_source
    register_warc_source(spark)
    df = spark.read.format("warc").load("/path/to/segment")  # dir or file

The schema is fixed: (file, rec_no, warc_type, target_uri,
content_length, payload).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("file", StringType()),
        StructField("rec_no", IntegerType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("content_length", LongType()),
        StructField("payload", BinaryType()),
    ]
)


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("warc source requires a path — .load(path)")

    def partitions(self):
        import os

        p = self._path
        if os.path.isdir(p):
            files = sorted(
                os.path.join(p, f)
                for f in os.listdir(p)
                if f.endswith((".warc", ".warc.gz"))
            )
        else:
            files = [p]
        if not files:
            raise ValueError(f"no .warc/.warc.gz files under {p}")
        return [_WarcFilePartition(f) for f in files]

    def read(self, partition: _WarcFilePartition):
        # executor-side: imports must be local (the reader object is
        # pickled to the worker)
        import gzip

        from magmapandas_spark.operators.warc import warc_parse

        path = partition.path
        with open(path, "rb") as fh:
            raw = fh.read()
        if path.endswith(".gz"):
            raw = gzip.decompress(raw)
        for rec_no, rec in enumerate(warc_parse(raw)):
            yield (
                path,
                rec_no,
                rec["warc_type"],
                rec["target_uri"],
                rec["content_length"],
                rec["payload"],
            )


class WarcDataSource(DataSource):
    """``format("warc")`` — one partition per (non-splittable) WARC
    file, records parsed executor-side by the validated walk."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self):
        return WARC_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _WarcReader(self.options)


def register_warc_source(spark) -> None:
    """Idempotent per-session registration of ``format("warc")``."""
    spark.dataSource.register(WarcDataSource)
