"""Permissive decode mode: corrupt payloads become quarantined error
rows instead of failing the stage — the posture a 100 TB media run
needs. Strict mode (the gate default) must still raise."""

import pytest
from pyspark.sql import functions as F

from magmapandas_spark.operators.jpeg import (
    decode_jpegs,
    make_synthetic_jpeg,
    MEDIA_JPEG_SCHEMA,
)
from magmapandas_spark.operators.mp4 import (
    make_synthetic_mp4,
    parse_mp4_metadata,
)
from magmapandas_spark.operators.png import decode_pngs, make_synthetic_png
from magmapandas_spark.operators.wav import chunk_wav_audio, make_synthetic_wav


def _media(spark, rows):
    return spark.createDataFrame(rows, MEDIA_JPEG_SCHEMA).coalesce(2)


def test_jpeg_permissive_quarantines(spark):
    rows = [
        (0, make_synthetic_jpeg(0)),
        (1, b"\xff\xd8garbage-not-a-jpeg"),
        (2, make_synthetic_jpeg(2)),
        (3, b"not even a jpeg"),
    ]
    out = decode_jpegs(_media(spark, rows), permissive=True).orderBy(
        "media_id").toPandas()
    assert len(out) == 4
    ok = out[out["error"].isna()]
    bad = out[out["error"].notna()]
    assert sorted(ok["media_id"]) == [0, 2]
    assert sorted(bad["media_id"]) == [1, 3]
    assert bad["width"].isna().all()
    assert (ok["n_blocks"] > 0).all()
    # strict mode still fails the job
    with pytest.raises(Exception):
        decode_jpegs(_media(spark, rows)).toPandas()


def test_png_permissive_quarantines(spark):
    corrupt = bytearray(make_synthetic_png(1))
    corrupt[40] ^= 0xFF  # CRC break
    rows = [(0, make_synthetic_png(0)), (1, bytes(corrupt))]
    out = decode_pngs(_media(spark, rows), permissive=True).orderBy(
        "media_id").toPandas()
    assert out.loc[0, "error"] is None or out.loc[0, "error"] != out.loc[0, "error"]
    assert "CRC" in out.loc[1, "error"]
    with pytest.raises(Exception):
        decode_pngs(_media(spark, rows)).toPandas()


def test_wav_permissive_quarantines(spark):
    rows = [(0, make_synthetic_wav(0)), (1, b"RIFFxxxxNOPE")]
    out = chunk_wav_audio(_media(spark, rows), permissive=True).toPandas()
    bad = out[out["error"].notna()]
    assert list(bad["media_id"]) == [1]
    good_chunks = out[out["error"].isna()]
    assert (good_chunks["media_id"] == 0).all()
    assert len(good_chunks) == 2  # 400 frames / 256 -> 2 chunks
    with pytest.raises(Exception):
        chunk_wav_audio(_media(spark, rows)).toPandas()


def test_mp4_permissive_quarantines(spark):
    rows = [
        (0, make_synthetic_mp4(0)),
        (1, make_synthetic_mp4(1)[:-6]),  # truncated inside mdat
    ]
    out = parse_mp4_metadata(_media(spark, rows), permissive=True).orderBy(
        "media_id").toPandas()
    assert out.loc[0, "brand"] == "isom"
    assert "malformed" in out.loc[1, "error"]
    with pytest.raises(Exception):
        parse_mp4_metadata(_media(spark, rows)).toPandas()


def test_permissive_error_rate_aggregation(spark):
    """The operational query: corrupt-rate per batch."""
    rows = [(i, make_synthetic_jpeg(i)) for i in range(6)] + [
        (100, b"junk1"), (101, b"junk2")
    ]
    out = decode_jpegs(_media(spark, rows), permissive=True)
    rate = out.agg(
        (F.count(F.col("error")) / F.count(F.lit(1))).alias("err_rate")
    ).collect()[0]["err_rate"]
    assert abs(rate - 2 / 8) < 1e-9


def test_decode_any_routes_and_quarantines(spark):
    """Mixed unlabeled payloads route by magic bytes; corrupt members
    of a known format fail ok=False without killing the task."""
    from magmapandas_spark.operators.jpeg import make_synthetic_jpeg
    from magmapandas_spark.operators.multimodal import decode_any
    from magmapandas_spark.operators.png import make_synthetic_png

    corrupt_png = bytearray(make_synthetic_png(0))
    corrupt_png[40] ^= 0xFF
    rows = [
        (0, make_synthetic_jpeg(0)),
        (1, bytes(corrupt_png)),       # sniffs as png, fails CRC
        (2, b"\x00garbage\x00"),       # unknown
        (3, make_synthetic_png(3)),
    ]
    out = {
        r["media_id"]: r
        for r in decode_any(
            spark.createDataFrame(rows, "media_id long, payload binary")
        ).collect()
    }
    assert out[0]["fmt"] == "jpeg" and out[0]["ok"]
    assert out[1]["fmt"] == "png" and not out[1]["ok"]
    assert "CRC" in out[1]["error"]
    assert out[2]["fmt"] == "unknown" and not out[2]["ok"]
    assert out[3]["fmt"] == "png" and out[3]["ok"]
