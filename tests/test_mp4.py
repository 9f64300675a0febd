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


# ---------------------------------------------------------------------
# MJPEG frame decode (round 6): real per-frame JPEG decode from a real
# sample table
# ---------------------------------------------------------------------


def test_mjpeg_roundtrip_sample_table():
    from magmapandas_spark.operators.jpeg import make_synthetic_jpeg
    from magmapandas_spark.operators.mp4 import mp4_encode_mjpeg

    frames = [make_synthetic_jpeg(i) for i in range(3)]
    data = mp4_encode_mjpeg(frames, frame_duration_ms=40, timescale=600)
    m = mp4_parse(data)
    assert m["codec"] == "jpeg"
    assert m["sample_sizes"] == [len(f) for f in frames]
    # 40 ms at timescale 600 = 24 units per sample
    assert m["sample_deltas"] == [24, 24, 24]
    assert m["brand"] == "isom"
    # stco points exactly at frame 0: slicing by the sample table must
    # reproduce the original payload bytes
    off = m["chunk_offsets"][0]
    for f in frames:
        assert data[off : off + len(f)] == f
        off += len(f)


def test_decode_mjpeg_frames_matches_direct_jpeg_decode(spark):
    """Frame stats through the container path must equal decode_jpegs
    on the bare frame payloads — same decoder, real slicing."""
    from magmapandas_spark.operators.jpeg import (
        decode_jpegs,
        make_synthetic_jpeg,
    )
    from magmapandas_spark.operators.mp4 import (
        decode_mjpeg_frames,
        synthetic_mjpeg_media,
    )

    got = (
        decode_mjpeg_frames(synthetic_mjpeg_media(spark, 6))
        .toPandas()
        .sort_values(["media_id", "frame_idx"])
        .reset_index(drop=True)
    )
    # clip i frame f == synthetic jpeg seed 3i+f
    seeds = [
        (i, f, 3 * i + f) for i in range(6) for f in range(2 + i % 3)
    ]
    uniq = sorted({s for (_, _, s) in seeds})
    bare = spark.createDataFrame(
        [(s, make_synthetic_jpeg(s)) for s in uniq],
        "media_id long, payload binary",
    )
    ref = (
        decode_jpegs(bare)
        .toPandas()
        .set_index("media_id")
        .sort_index()
    )
    assert len(got) == len(seeds)
    for (i, f, s), (_, row) in zip(seeds, got.iterrows()):
        assert row["media_id"] == i and row["frame_idx"] == f
        assert row["frame_ts_ms"] == f * 100
        for col in ["width", "height", "n_blocks", "sum_dc",
                    "sum_abs_ac", "nnz_ac"]:
            assert row[col] == ref.loc[s, col], (i, f, col)


def test_decode_mjpeg_frames_permissive_quarantines_h264(spark):
    """A non-MJPEG video (no codec library) must become an error ROW
    in permissive mode, not a task failure — and strict mode raises."""
    from magmapandas_spark.operators.mp4 import (
        decode_mjpeg_frames,
        make_synthetic_mjpeg_mp4,
    )

    rows = [
        (0, make_synthetic_mjpeg_mp4(0)),
        (1, make_synthetic_mp4(1)),  # no sample table / codec
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = decode_mjpeg_frames(media, permissive=True).toPandas()
    ok = out[out["error"].isna()]
    bad = out[out["error"].notna()]
    assert set(ok["media_id"]) == {0} and len(ok) == 2
    assert set(bad["media_id"]) == {1}
    assert "NotImplementedError" in bad.iloc[0]["error"]
    with pytest.raises(Exception):
        decode_mjpeg_frames(media).toPandas()


def test_video_frame_decode_oracle_matches(spark):
    from magmapandas_spark.operators.mp4 import (
        SQL_VIDEO_FRAME_DECODE,
        q_video_frame_decode,
    )

    got = q_video_frame_decode(spark, "/root/testdata/sf0.001").toPandas()
    exp = duckdb.connect().execute(SQL_VIDEO_FRAME_DECODE).df()
    exp.columns = got.columns
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        exp.reset_index(drop=True),
        check_dtype=False,
    )


def test_avc_in_mp4_full_decode_round_trip():
    """The codec ladder meets the container: avcC parameter sets +
    AVCC access units decode to exactly the fixture frames."""
    import numpy as np

    from magmapandas_spark.operators.h264 import (
        _fixture_mode_frame,
        decode_h264_stream,
    )
    from magmapandas_spark.operators.mp4 import (
        _AVC_SEED_OFF,
        _avcc_sample_nals,
        make_synthetic_avc_mp4,
        mp4_parse,
        parse_avcc_config,
    )

    for i in (0, 5, 11):
        payload = make_synthetic_avc_mp4(i)
        m = mp4_parse(payload)
        assert m["codec"] == "avc1"
        sps_l, pps_l = parse_avcc_config(m["avcc"])
        assert len(sps_l) == 1 and len(pps_l) == 1
        header = b"".join(b"\x00\x00\x00\x01" + n for n in sps_l + pps_l)
        mbs_w, mbs_h = 2 + i % 3, 2 + i % 2
        pos = m["chunk_offsets"][0]
        for f, size in enumerate(m["sample_sizes"]):
            nals = _avcc_sample_nals(payload[pos : pos + size])
            pos += size
            pics, _ = decode_h264_stream(
                header + b"".join(b"\x00\x00\x00\x01" + n for n in nals)
            )
            y, cb, cr = pics[0]
            ye, cbe, cre, _, _ = _fixture_mode_frame(
                _AVC_SEED_OFF + 4 * i + f, mbs_w, mbs_h
            )
            assert np.array_equal(y, ye)
            assert np.array_equal(cb, cbe)
            assert np.array_equal(cr, cre)


def test_avcc_record_rejects_other_length_sizes():
    import pytest as _pytest

    from magmapandas_spark.operators.mp4 import parse_avcc_config

    bad = bytes([1, 66, 0, 10, 0xFC | 1, 0xE0])  # lengthSizeMinusOne 1
    with _pytest.raises(NotImplementedError, match="4-byte"):
        parse_avcc_config(bad)


def test_avc_permissive_quarantines_corrupt_payloads(spark):
    """A corrupt AVC payload (and a non-MP4 blob) become error rows
    instead of failing the stage; intact files still decode exactly."""
    from magmapandas_spark.operators.mp4 import (
        decode_avc_frames,
        make_synthetic_avc_mp4,
    )

    good = make_synthetic_avc_mp4(0)
    bad = bytearray(make_synthetic_avc_mp4(1))
    bad[len(bad) // 2 :] = b"\x00" * (len(bad) - len(bad) // 2)  # truncate mdat
    media = spark.createDataFrame(
        [(0, bytearray(good)), (1, bad), (2, bytearray(b"not an mp4"))],
        "media_id long, payload binary",
    )
    rows = decode_avc_frames(media, permissive=True).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    assert all(r.error is None for r in by_media[0])
    assert any(r.error is not None for r in by_media[1])
    assert all(r.error is not None for r in by_media[2])
    # strict mode still raises
    import pytest as _pytest

    with _pytest.raises(Exception):
        decode_avc_frames(media, permissive=False).collect()


# ---------------------------------------------------------------------
# Round-11: accept/reject matrix for the two MP4 scope guards
# (mp4.py codec gate + avcC NAL-length gate), with REAL near-miss
# payloads — the same both-sides pinning the H.264 deblocking gate
# uses, so a refactor can't silently widen either boundary.
# ---------------------------------------------------------------------

def test_mjpeg_codec_gate_accept_reject_matrix(spark):
    """The MJPEG frame decoder's codec gate, pinned from both sides
    with the SAME payload: a fully valid AVC-in-MP4 that the AVC
    decoder ACCEPTS (frames decode, no error rows) must be REJECTED
    by the MJPEG path with the codec NotImplementedError — a true
    near-miss (well-formed container, real sample table, wrong
    codec), not a malformed blob."""
    from magmapandas_spark.operators.mp4 import (
        decode_avc_frames,
        decode_mjpeg_frames,
        make_synthetic_avc_mp4,
    )

    avc = make_synthetic_avc_mp4(0)
    media = spark.createDataFrame(
        [(0, bytearray(avc))], "media_id long, payload binary"
    )
    # accept side: the AVC decoder decodes it cleanly
    avc_rows = decode_avc_frames(media, permissive=True).collect()
    assert avc_rows and all(r.error is None for r in avc_rows)
    # reject side: the MJPEG path quarantines it on the codec gate
    out = decode_mjpeg_frames(media, permissive=True).toPandas()
    assert out["error"].notna().all()
    msg = out.iloc[0]["error"]
    assert "NotImplementedError" in msg and "MJPEG" in msg
    # strict mode fails the stage instead of silently mis-decoding
    with pytest.raises(Exception):
        decode_mjpeg_frames(media).toPandas()


def test_avcc_length_size_gate_accept_reject_matrix(spark):
    """The avcC 4-byte-NAL-length gate, pinned with a REAL record: the
    avcC box from a valid synthetic AVC MP4 parses as-is (accept), and
    the SAME record with only lengthSizeMinusOne flipped from 3 to 1
    (2-byte prefixes — the one byte that changes how the sample data
    must be walked) raises NotImplementedError; routed through the
    full permissive decoder the flipped file becomes error rows, never
    frames decoded under the wrong length convention."""
    from magmapandas_spark.operators.mp4 import (
        decode_avc_frames,
        make_synthetic_avc_mp4,
        parse_avcc_config,
    )

    payload = make_synthetic_avc_mp4(0)
    idx = payload.find(b"avcC") + 4  # avcC box payload start
    assert idx > 3 and payload[idx] == 1  # configurationVersion
    avcc = payload[idx:]
    # accept side: the genuine record parses (1 SPS + 1 PPS)
    sps, pps = parse_avcc_config(avcc)
    assert len(sps) == 1 and len(pps) == 1
    # reject side: same bytes, lengthSizeMinusOne 3 -> 1
    flipped = bytearray(avcc)
    assert (flipped[4] & 3) == 3
    flipped[4] = (flipped[4] & ~3) | 1
    with pytest.raises(NotImplementedError, match="4-byte"):
        parse_avcc_config(bytes(flipped))
    # and through the full decoder: quarantined, not mis-walked
    bad_file = bytearray(payload)
    bad_file[idx + 4] = (bad_file[idx + 4] & ~3) | 1
    media = spark.createDataFrame(
        [(0, bad_file)], "media_id long, payload binary"
    )
    rows = decode_avc_frames(media, permissive=True).collect()
    assert rows and all(r.error is not None for r in rows)
    assert any("NotImplementedError" in r.error for r in rows)
    with pytest.raises(Exception):
        decode_avc_frames(media).collect()
