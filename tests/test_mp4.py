"""ISO BMFF (MP4) container parse tests."""

import struct

import duckdb
import numpy as np
import pandas as pd
import pytest

from magmapandas_spark.operators.mp4 import (
    SQL_MP4_METADATA,
    make_synthetic_mp4,
    mp4_encode,
    mp4_parse,
    parse_mp4_metadata,
    sample_video_frames_mp4,
    synthetic_mp4_media,
)


def test_roundtrip_metadata():
    mdat = bytes(range(200))
    data = mp4_encode(4321, ["video", "audio"], mdat, timescale=600)
    m = mp4_parse(data)
    assert m["brand"] == "isom"
    assert m["timescale"] == 600
    # duration survives the ms -> timescale -> ms roundtrip within 1ms
    assert abs(m["duration_ms"] - 4321) <= 1
    assert m["n_tracks"] == 2
    assert m["track_kinds"] == ["soun", "vide"]
    assert m["mdat_bytes"] == 200
    assert m["mdat_sum"] == sum(range(200))


def test_unknown_boxes_skipped():
    """Extensibility property: unknown boxes must be skipped by size."""
    data = make_synthetic_mp4(3)
    free = struct.pack(">I", 16) + b"free" + b"\xde\xad\xbe\xef" * 2
    # splice an unknown box between ftyp and moov
    ftyp_end = struct.unpack(">I", data[:4])[0]
    spliced = data[:ftyp_end] + free + data[ftyp_end:]
    assert mp4_parse(spliced) == mp4_parse(data)


def test_largesize_box():
    """64-bit largesize header variant parses."""
    mdat = b"\x01\x02\x03\x04"
    data = mp4_encode(1000, ["video"], mdat)
    # rewrite the mdat box with size=1 + 64-bit largesize
    idx = data.index(b"mdat") - 4
    old_size = struct.unpack(">I", data[idx : idx + 4])[0]
    big = (
        struct.pack(">I", 1)
        + b"mdat"
        + struct.pack(">Q", old_size + 8)
        + data[idx + 8 : idx + old_size]
    )
    rewritten = data[:idx] + big
    m = mp4_parse(rewritten)
    assert m["mdat_bytes"] == 4
    assert m["mdat_sum"] == 1 + 2 + 3 + 4


def test_rejects_non_bmff():
    with pytest.raises(ValueError, match="ftyp"):
        mp4_parse(b"\x00\x00\x00\x08xxxx")


def test_rejects_truncated_box():
    data = make_synthetic_mp4(0)[:-10]  # truncate inside mdat
    with pytest.raises(ValueError, match="malformed"):
        mp4_parse(data)


def test_oracle_matches():
    rows = []
    for i in range(40):
        m = mp4_parse(make_synthetic_mp4(i))
        rows.append(
            (i, m["brand"], m["duration_ms"], m["n_tracks"],
             ",".join(m["track_kinds"]), m["mdat_bytes"], m["mdat_sum"])
        )
    got = pd.DataFrame(
        rows,
        columns=["media_id", "brand", "duration_ms", "n_tracks",
                 "track_kinds", "mdat_bytes", "mdat_sum"],
    )
    exp = duckdb.sql(SQL_MP4_METADATA).df()
    for c in got.columns:
        exp[c] = exp[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, exp)


def test_parse_mp4_metadata_spark(spark):
    out = parse_mp4_metadata(synthetic_mp4_media(spark, 8)).orderBy(
        "media_id").toPandas()
    assert len(out) == 8
    assert (out["brand"] == "isom").all()
    assert list(out["duration_ms"]) == [1000 + i * 37 for i in range(8)]


def test_sample_video_frames_mp4_spark(spark):
    frames = sample_video_frames_mp4(
        synthetic_mp4_media(spark, 4), every_ms=500
    ).toPandas()
    # clip i: duration 1000+37i -> ceil(d/500) frame timestamps
    exp = sum(-(-(1000 + 37 * i) // 500) for i in range(4))
    assert len(frames) == exp


def test_sample_video_frames_zero_duration(spark):
    """Advice fix: a valid container with mvhd duration 0 (fragmented
    MP4 shape) yields zero frame rows instead of a runtime error from
    sequence(0, -1, step)."""
    from magmapandas_spark.operators.mp4 import MEDIA_MP4_SCHEMA

    rows = [
        (0, mp4_encode(0, ["video"], b"x")),
        (1, mp4_encode(2500, ["video"], b"y")),
    ]
    media = spark.createDataFrame(rows, MEDIA_MP4_SCHEMA)
    out = sample_video_frames_mp4(media, every_ms=1000).toPandas()
    assert set(out["media_id"]) == {1}
    assert sorted(out["frame_ts_ms"]) == [0, 1000, 2000]
