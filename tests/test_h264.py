"""H.264 I_PCM decode ladder: bitstream round trips, escape handling,
and the honest failure boundary."""

import numpy as np
import pytest

from magmapandas_spark.operators.h264 import (
    _BitReader,
    _BitWriter,
    _escape_ebsp,
    _fixture_planes,
    _split_annexb,
    _unescape_ebsp,
    decode_h264_iframe,
    encode_ipcm_annexb,
)


def test_exp_golomb_round_trip():
    w = _BitWriter()
    vals = [0, 1, 2, 3, 7, 25, 255, 1000]
    for v in vals:
        w.ue(v)
    svals = [0, 1, -1, 2, -2, 26, -26]
    for v in svals:
        w.se(v)
    w.rbsp_trailing()
    r = _BitReader(w.tobytes())
    assert [r.ue() for _ in vals] == vals
    assert [r.se() for _ in svals] == svals


def test_ebsp_escape_round_trip():
    # adversarial byte strings: zero runs, boundary values, an
    # existing 00 00 03 that must double-escape
    cases = [
        b"\x00\x00\x00\x00\x01",
        b"\x00\x00\x03\x00\x00\x02",
        b"\x00\x00\x00\x03\x03",
        bytes(range(256)) + b"\x00\x00\x01",
        b"\x00" * 32,
    ]
    for rbsp in cases:
        ebsp = _escape_ebsp(rbsp)
        # no unescaped start-code-prefix-like run survives
        assert b"\x00\x00\x00" not in ebsp
        assert b"\x00\x00\x01" not in ebsp
        assert b"\x00\x00\x02" not in ebsp
        assert _unescape_ebsp(ebsp) == rbsp


def test_annexb_split_handles_3_and_4_byte_codes():
    nals = [b"\x67\x42\x00\x0a", b"\x68\xce\x38\x80", b"\x65\x88\x80"]
    stream = (
        b"\x00\x00\x00\x01" + nals[0]
        + b"\x00\x00\x01" + nals[1]
        + b"\x00\x00\x00\x01" + nals[2]
    )
    assert _split_annexb(stream) == nals


def test_full_pixel_round_trip_all_fixture_shapes():
    for i in range(6):  # covers all (w, h) combinations
        y, cb, cr = _fixture_planes(i)
        data = encode_ipcm_annexb(y, cb, cr)
        yd, cbd, crd, sps = decode_h264_iframe(data)
        assert np.array_equal(y, yd)
        assert np.array_equal(cb, cbd)
        assert np.array_equal(cr, crd)
        assert sps["profile_idc"] == 66
        assert sps["mbs_w"] * 16 == y.shape[1]


def test_escapes_are_actually_exercised():
    total = sum(
        encode_ipcm_annexb(*_fixture_planes(i)).count(b"\x00\x00\x03")
        for i in range(24)
    )
    assert total > 0, "fixture no longer produces emulation escapes"


def test_cavlc_macroblock_is_honest_boundary():
    """A non-I_PCM mb_type must raise NotImplementedError — the next
    codec notch, not a silent wrong answer."""
    y, cb, cr = _fixture_planes(0)
    data = bytearray(encode_ipcm_annexb(y, cb, cr))
    # find the slice NAL (type 5) and corrupt the first mb_type:
    # ue(25) = 000011010...; flip to ue(0) = '1' by setting the first
    # slice-data bit. Easier: rebuild a stream whose slice says mb_type 0.
    from magmapandas_spark.operators.h264 import _BitWriter, _escape_ebsp

    sl = _BitWriter()
    sl.ue(0); sl.ue(7); sl.ue(0); sl.u(0, 4); sl.ue(0); sl.u(0, 4)
    sl.u(0, 1); sl.u(0, 1); sl.se(0)
    sl.ue(0)  # mb_type 0: I_4x4 — CAVLC territory
    sl.rbsp_trailing()
    idx = bytes(data).rfind(b"\x00\x00\x00\x01\x65")
    stream = bytes(data[:idx]) + b"\x00\x00\x00\x01\x65" + _escape_ebsp(
        sl.tobytes()
    )
    with pytest.raises(NotImplementedError, match="I_PCM"):
        decode_h264_iframe(stream)


def test_truncated_payload_raises():
    y, cb, cr = _fixture_planes(1)
    data = encode_ipcm_annexb(y, cb, cr)
    with pytest.raises(ValueError):
        decode_h264_iframe(data[: len(data) // 2])


def test_missing_sps_raises():
    y, cb, cr = _fixture_planes(0)
    data = encode_ipcm_annexb(y, cb, cr)
    idx = data.rfind(b"\x00\x00\x00\x01\x65")
    with pytest.raises(ValueError, match="SPS"):
        decode_h264_iframe(data[idx:])
