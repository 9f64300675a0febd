"""WARC codec tests: round trip, length-delimited payloads with
embedded CRLFs, malformed-input rejection, permissive quarantine."""

import numpy as np
import pytest

from magmapandas_spark.operators.warc import (
    MEDIA_WARC_SCHEMA,
    make_synthetic_warc,
    parse_warc_records,
    synthetic_warc_dims,
    synthetic_warc_media,
    warc_encode_record,
    warc_parse,
)


def test_roundtrip_single_record():
    body = b"hello \r\n\r\n world"  # embedded separators must not split
    data = warc_encode_record("response", "http://x/y", body, "id-1")
    recs = warc_parse(data)
    assert len(recs) == 1
    assert recs[0]["warc_type"] == "response"
    assert recs[0]["target_uri"] == "http://x/y"
    assert recs[0]["content_length"] == len(body)
    assert recs[0]["payload"] == body


def test_multi_record_and_formula():
    for i in (0, 3, 7):
        recs = warc_parse(make_synthetic_warc(i))
        assert len(recs) == synthetic_warc_dims(i)
        for r, rec in enumerate(recs):
            ln = 20 + (i * 7 + r) % 50
            j = np.arange(ln, dtype=np.int64)
            exp = ((i * 31 + r * 17 + j * j) % 256).astype(np.uint8)
            assert rec["payload"] == exp.tobytes()


def test_rejects_bad_version():
    with pytest.raises(ValueError, match="version"):
        warc_parse(b"HTTP/1.1 200\r\n\r\n")


def test_rejects_missing_content_length():
    data = b"WARC/1.0\r\nWARC-Type: x\r\n\r\n"
    with pytest.raises(ValueError, match="Content-Length"):
        warc_parse(data)


def test_rejects_truncated_payload():
    data = b"WARC/1.0\r\nContent-Length: 100\r\n\r\nshort"
    with pytest.raises(ValueError, match="past end"):
        warc_parse(data)


def test_rejects_missing_separator():
    data = b"WARC/1.0\r\nContent-Length: 2\r\n\r\nab"
    with pytest.raises(ValueError, match="separator"):
        warc_parse(data)


def test_spark_parse_and_permissive(spark):
    out = parse_warc_records(synthetic_warc_media(spark, 8)).toPandas()
    assert len(out) == sum(synthetic_warc_dims(i) for i in range(8))
    rows = [(0, make_synthetic_warc(0)), (1, b"garbage")]
    media = spark.createDataFrame(rows, MEDIA_WARC_SCHEMA)
    perm = parse_warc_records(media, permissive=True).toPandas()
    bad = perm[perm["error"].notna()]
    assert set(bad["file_id"]) == {1}
    assert len(perm[perm["error"].isna()]) == synthetic_warc_dims(0)


def test_gzip_roundtrip_and_spark_parse(spark):
    from magmapandas_spark.operators.warc import (
        gunzip_payload,
        gzip_payload,
        make_synthetic_warc_gz,
        parse_warc_records,
        parse_warc_gz_records,
        synthetic_warc_gz_media,
        synthetic_warc_media,
    )

    raw = make_synthetic_warc(5)
    assert gunzip_payload(gzip_payload(raw)) == raw
    assert gunzip_payload(make_synthetic_warc_gz(5)) == raw
    a = (
        parse_warc_gz_records(synthetic_warc_gz_media(spark, 10))
        .orderBy("file_id", "rec_idx")
        .toPandas()
    )
    b = (
        parse_warc_records(synthetic_warc_media(spark, 10))
        .orderBy("file_id", "rec_idx")
        .toPandas()
    )
    assert a.equals(b)


def test_gz_permissive_quarantines_bad_gzip(spark):
    from magmapandas_spark.operators.warc import (
        MEDIA_WARC_SCHEMA,
        make_synthetic_warc_gz,
        parse_warc_gz_records,
    )

    rows = [(0, make_synthetic_warc_gz(0)), (1, b"not gzip at all")]
    media = spark.createDataFrame(rows, MEDIA_WARC_SCHEMA)
    out = parse_warc_gz_records(media, permissive=True).toPandas()
    assert set(out[out["error"].notna()]["file_id"]) == {1}


# ---------------------------------------------------------------------
# Python Data Source: spark.read.format("warc")
# ---------------------------------------------------------------------

def test_warc_datasource_reads_files(spark, tmp_path):
    """format('warc') plans one partition per file and yields the
    same records the mapInPandas path parses — same walk, same
    payload bytes (checksummed)."""
    import gzip

    from pyspark.sql import functions as F

    from magmapandas_spark.operators.warc import make_synthetic_warc
    from magmapandas_spark.parse_io.warc_source import (
        register_warc_source,
    )

    d = tmp_path / "segment"
    d.mkdir()
    for i in range(4):
        (d / f"f{i}.warc").write_bytes(make_synthetic_warc(i))
    # one gzipped member too
    (d / "f4.warc.gz").write_bytes(gzip.compress(make_synthetic_warc(4)))

    register_warc_source(spark)
    df = spark.read.format("warc").load(str(d))
    assert df.rdd.getNumPartitions() == 5  # one per file
    got = df.select(
        "file", "rec_no", "warc_type", "target_uri", "content_length",
        F.md5(F.col("payload")).alias("md5"),
    ).toPandas()
    # expected via the validated local parser
    import hashlib

    from magmapandas_spark.operators.warc import warc_parse

    exp_rows = []
    for i in range(5):
        raw = make_synthetic_warc(i)
        for rec_no, rec in enumerate(warc_parse(raw)):
            exp_rows.append(
                (
                    rec_no,
                    rec["warc_type"],
                    rec["target_uri"],
                    rec["content_length"],
                    hashlib.md5(rec["payload"]).hexdigest(),
                )
            )
    got_rows = sorted(
        got[["rec_no", "warc_type", "target_uri", "content_length", "md5"]]
        .itertuples(index=False, name=None)
    )
    assert got_rows == sorted(exp_rows)


def test_warc_datasource_filter_and_prune(spark, tmp_path):
    """Relational ops compose above the source: a type filter +
    payload-free projection runs without touching payload bytes in
    the result."""
    from magmapandas_spark.operators.warc import make_synthetic_warc
    from magmapandas_spark.parse_io.warc_source import (
        register_warc_source,
    )

    f = tmp_path / "one.warc"
    f.write_bytes(make_synthetic_warc(7))
    register_warc_source(spark)
    df = (
        spark.read.format("warc")
        .load(str(f))
        .filter("warc_type = 'response'")
        .select("target_uri", "content_length")
    )
    rows = df.collect()
    assert rows and all(r["content_length"] > 0 for r in rows)
