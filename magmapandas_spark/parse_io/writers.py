"""Sinks (SURVEY §2.1): the reference has none (in-memory pandas);
the engine writes any GeoFrame/DataFrame result as parquet or CSV,
with the partitioning/bucketing options that matter at scale."""

from __future__ import annotations

from pyspark.sql import DataFrame

from magmapandas_spark.core.geoframe import GeoFrame


def _df(data) -> DataFrame:
    return data.df if isinstance(data, GeoFrame) else data


def write_parquet(
    data,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Parquet sink. ``partition_by`` creates hive-style directory
    partitions (partition pruning on read); ``max_records_per_file``
    bounds file sizes so downstream scans parallelize evenly."""
    w = _df(data).write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    data, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    """CSV sink (round-trips with ``parse_io.readers.read_file``)."""
    _df(data).write.mode(mode).option("header", str(header).lower()).csv(
        path
    )


def write_bucketed_table(
    data,
    table: str,
    bucket_by: list[str],
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: co-locates future joins/aggregations on
    the bucket key without a shuffle — the 100 TB answer to repeated
    sample-key joins (SURVEY §2.3)."""
    (
        _df(data)
        .write.mode(mode)
        .bucketBy(n_buckets, *bucket_by)
        .sortBy(*bucket_by)
        .saveAsTable(table, format="parquet")
    )
