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


def test_truncated_i4x4_slice_is_clean_error():
    """Since notch 10, mb_type 0 (I_4x4) is a REAL decode path: a
    slice that announces it but carries no per-block mode / residual
    syntax must fail with a clean truncation ValueError, never an
    IndexError out of the bit reader."""
    y, cb, cr = _fixture_planes(0)
    data = bytearray(encode_ipcm_annexb(y, cb, cr))
    from magmapandas_spark.operators.h264 import _BitWriter, _escape_ebsp

    sl = _BitWriter()
    sl.ue(0); sl.ue(7); sl.ue(0); sl.u(0, 4); sl.ue(0); sl.u(0, 4)
    sl.u(0, 1); sl.u(0, 1); sl.se(0); sl.ue(1)
    sl.ue(0)  # mb_type 0: I_4x4 — now parsed for real
    sl.rbsp_trailing()
    idx = bytes(data).rfind(b"\x00\x00\x00\x01\x65")
    stream = bytes(data[:idx]) + b"\x00\x00\x00\x01\x65" + _escape_ebsp(
        sl.tobytes()
    )
    with pytest.raises(ValueError, match="truncated RBSP|undecoded"):
        decode_h264_iframe(stream)


def test_deblocking_defaulted_on_raises():
    """A stream whose PPS lacks deblocking_filter_control_present_flag
    leaves the in-loop filter ON (spec default idc 0); spec 8.7 is
    unimplemented, so the decoder must fail closed — its pixels would
    differ from a conformant decoder's otherwise."""
    from magmapandas_spark.operators.h264 import _BitWriter, _escape_ebsp

    y, cb, cr = _fixture_planes(0)
    data = encode_ipcm_annexb(y, cb, cr)
    # rebuild the PPS with the flag CLEAR (mirrors the encoder's PPS
    # field order; only the deblocking bit differs)
    pps = _BitWriter()
    pps.ue(0); pps.ue(0); pps.u(0, 1); pps.u(0, 1); pps.ue(0)
    pps.ue(0); pps.ue(0); pps.u(0, 1); pps.u(0, 2)
    pps.se(0); pps.se(0); pps.se(0)
    pps.u(0, 1); pps.u(0, 1); pps.u(0, 1)  # deblocking control OFF
    pps.rbsp_trailing()
    pps_nal = b"\x00\x00\x00\x01\x68" + _escape_ebsp(pps.tobytes())
    # slice without the idc field (old syntax, matching the PPS)
    sl = _BitWriter()
    sl.ue(0); sl.ue(7); sl.ue(0); sl.u(0, 4); sl.ue(0); sl.u(0, 4)
    sl.u(0, 1); sl.u(0, 1); sl.se(0)
    sl.ue(25)  # I_PCM (never reached)
    sl.rbsp_trailing()
    sps_end = data.find(b"\x00\x00\x00\x01\x68")
    stream = (
        data[:sps_end] + pps_nal + b"\x00\x00\x00\x01\x65"
        + _escape_ebsp(sl.tobytes())
    )
    with pytest.raises(NotImplementedError, match="deblocking"):
        decode_h264_iframe(stream)


@pytest.mark.parametrize("idc,accepts", [(0, False), (1, True), (2, False)])
def test_deblocking_idc_accept_matrix(idc, accepts):
    """With deblocking control signaled, only idc=1 (filter fully
    disabled) decodes; idc=0 (filter on) and idc=2 (on except slice
    edges) both leave spec-8.7 filtering active and must fail closed."""
    from magmapandas_spark.operators.h264 import _BitWriter, _escape_ebsp

    y, cb, cr = _fixture_planes(0)
    data = encode_ipcm_annexb(y, cb, cr)
    sl = _BitWriter()
    sl.ue(0); sl.ue(7); sl.ue(0); sl.u(0, 4); sl.ue(0); sl.u(0, 4)
    sl.u(0, 1); sl.u(0, 1); sl.se(0)
    sl.ue(idc)  # disable_deblocking_filter_idc
    if idc != 1:
        sl.se(0); sl.se(0)  # alpha/beta offsets present when idc != 1
    mbs_w, mbs_h = y.shape[1] // 16, y.shape[0] // 16
    for mby in range(mbs_h):
        for mbx in range(mbs_w):
            sl.ue(25)  # I_PCM
            sl.align_zero()
            sl.raw_bytes(y[mby*16:mby*16+16, mbx*16:mbx*16+16].tobytes())
            sl.raw_bytes(cb[mby*8:mby*8+8, mbx*8:mbx*8+8].tobytes())
            sl.raw_bytes(cr[mby*8:mby*8+8, mbx*8:mbx*8+8].tobytes())
    sl.rbsp_trailing()
    idx = data.rfind(b"\x00\x00\x00\x01\x65")
    stream = data[:idx] + b"\x00\x00\x00\x01\x65" + _escape_ebsp(
        sl.tobytes()
    )
    if accepts:
        yd, cbd, crd, _ = decode_h264_iframe(stream)
        assert np.array_equal(y, yd)
    else:
        with pytest.raises(NotImplementedError, match="deblocking"):
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


# -- notch 2: intra-predicted I_16x16 --------------------------------


def test_mixed_round_trip_and_prediction_values():
    from magmapandas_spark.operators.h264 import (
        _fixture_mixed,
        encode_mixed_annexb,
    )

    for i in (5, 11, 23):  # clips with predicted MBs
        y, cb, cr, cls = _fixture_mixed(i)
        assert cls.sum() > 0
        data = encode_mixed_annexb(y, cb, cr, cls)
        yd, cbd, crd, _ = decode_h264_iframe(data)
        assert np.array_equal(y, yd)
        assert np.array_equal(cb, cbd)
        assert np.array_equal(cr, crd)
        # a predicted MB's columns replicate the row above it
        mbs_w = y.shape[1] // 16
        mb = int(np.nonzero(cls)[0][0])
        mbx, mby = mb % mbs_w, mb // mbs_w
        top = yd[mby * 16 - 1, mbx * 16 : mbx * 16 + 16]
        assert np.array_equal(
            yd[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16],
            np.tile(top, (16, 1)),
        )


def test_dc_and_horizontal_prediction_helpers():
    from magmapandas_spark.operators.h264 import (
        _predict_16x16,
        _predict_chroma8x8,
    )

    y = np.zeros((32, 32), np.uint8)
    y[15, 16:32] = 100  # top edge of MB (1,1)
    y[16:32, 15] = 50  # left edge of MB (1,1)
    _predict_16x16(y, 1, 1, 2)  # DC
    assert int(y[20, 20]) == (100 * 16 + 50 * 16 + 16) >> 5
    y[16:32, 15] = 50
    _predict_16x16(y, 1, 1, 1)  # Horizontal
    assert (y[16:32, 16:32] == 50).all()
    c = np.zeros((16, 16), np.uint8)
    c[7, 8:16] = 200
    c[8:16, 7] = 40
    _predict_chroma8x8(c, 1, 1, 0)  # DC: per-4x4 corner rule
    assert int(c[8, 8]) == (200 * 4 + 40 * 4 + 4) >> 3  # (0,0) both
    assert int(c[8, 14]) == (200 * 4 + 2) >> 2  # (4,0) top only
    assert int(c[14, 8]) == (40 * 4 + 2) >> 2  # (0,4) left only
    assert int(c[14, 14]) == (200 * 4 + 40 * 4 + 4) >> 3  # (4,4) both


def test_truncated_i16x16_ac_slice_is_clean_error():
    """Since notch 10, a nonzero I_16x16 coded_block_pattern (mb_type
    13: cbp_luma 15) is a REAL decode path: a slice that announces it
    but carries no residual bits must fail with a clean truncation
    ValueError, never an IndexError out of the bit reader."""
    from magmapandas_spark.operators.h264 import (
        _escape_ebsp,
        _fixture_mixed,
        encode_mixed_annexb,
    )

    y, cb, cr, cls = _fixture_mixed(0)
    data = encode_mixed_annexb(y, cb, cr, cls)
    sl = _BitWriter()
    sl.ue(0); sl.ue(7); sl.ue(0); sl.u(0, 4); sl.ue(0); sl.u(0, 4)
    sl.u(0, 1); sl.u(0, 1); sl.se(0); sl.ue(1)
    sl.ue(13)  # I_16x16, pred 0, cbp_luma 15 — AC residuals follow
    sl.rbsp_trailing()
    idx = data.rfind(b"\x00\x00\x00\x01\x65")
    stream = data[:idx] + b"\x00\x00\x00\x01\x65" + _escape_ebsp(
        sl.tobytes()
    )
    with pytest.raises(ValueError, match="truncated RBSP|undecoded"):
        decode_h264_iframe(stream)


# -- notch 3: chroma-DC CAVLC residuals ------------------------------


def test_cavlc_chroma_dc_block_parse_paths():
    """Round-trip every encoder path of the 2x2 chroma DC block:
    zero, trailing-one +-1, and level-prefix-coded |L| >= 2."""
    from magmapandas_spark.operators.h264 import (
        _parse_cavlc_chroma_dc,
        encode_mixed_annexb,  # noqa: F401  (module import side)
    )
    from magmapandas_spark.operators.h264 import _BitWriter as BW

    def encode_one(level):
        w = BW()
        if level == 0:
            w.u(1, 2)
        elif abs(level) == 1:
            w.u(1, 1)
            w.u(0 if level > 0 else 1, 1)
            w.u(1, 1)
        else:
            w.u(7, 6)
            code = (2 * level - 2 if level > 0 else -2 * level - 1) - 2
            w.u(0, code)
            w.u(1, 1)
            w.u(1, 1)
        w.rbsp_trailing()
        return w.tobytes()

    for lvl in (0, 1, -1, 2, -2, 3, -3, 7, -5):
        coeffs = _parse_cavlc_chroma_dc(_BitReader(encode_one(lvl)))
        assert coeffs == [lvl, 0, 0, 0], (lvl, coeffs)


def test_chroma_dc_dequant_and_hadamard():
    from magmapandas_spark.operators.h264 import (
        _chroma_dc_residuals,
        _qpc_of,
    )

    assert _qpc_of(40) == 36
    assert _qpc_of(26) == 26
    assert _qpc_of(30) == 29
    # QPc 36: dcC = 20 * f; residual = (20f + 32) >> 6
    assert _chroma_dc_residuals([2, 0, 0, 0], 36) == [1, 1, 1, 1]
    assert _chroma_dc_residuals([-2, 0, 0, 0], 36) == [-1, -1, -1, -1]
    assert _chroma_dc_residuals([8, 0, 0, 0], 36) == [3, 3, 3, 3]
    # a non-DC 2x2 pattern exercises the Hadamard cross terms
    res = _chroma_dc_residuals([4, 2, 0, 0], 36)
    # f = [6, 2, 6, 2] -> dc = [120, 40, 120, 40] -> r = [2, 1, 2, 1]
    assert res == [2, 1, 2, 1]


def test_notch3_full_round_trip():
    from magmapandas_spark.operators.h264 import (
        _N3_QP,
        _fixture_notch3,
        encode_mixed_annexb,
    )

    for i in (5, 11, 23):
        y, cb, cr, cls, cdc = _fixture_notch3(i)
        data = encode_mixed_annexb(y, cb, cr, cls, chroma_dc=cdc, qp=_N3_QP)
        yd, cbd, crd, _ = decode_h264_iframe(data)
        assert np.array_equal(cb, cbd)
        assert np.array_equal(cr, crd)
        # the residual genuinely shifted the predicted chroma blocks
        y2, cb2, cr2, cls2 = __import__(
            "magmapandas_spark.operators.h264", fromlist=["_fixture_mixed"]
        )._fixture_mixed(i)
        assert not np.array_equal(cb, cb2)


def test_notch4_full_round_trip():
    from magmapandas_spark.operators.h264 import (
        _N3_QP,
        _fixture_mixed,
        _fixture_notch4,
        encode_mixed_annexb,
    )

    for i in (0, 5, 11, 23):
        y, cb, cr, cls, cdc, ldc = _fixture_notch4(i)
        data = encode_mixed_annexb(
            y, cb, cr, cls, chroma_dc=cdc, qp=_N3_QP, luma_dc=ldc
        )
        yd, cbd, crd, _ = decode_h264_iframe(data)
        assert np.array_equal(y, yd)
        assert np.array_equal(cb, cbd)
        assert np.array_equal(cr, crd)
        if cls.any():
            # the DC residuals genuinely shifted predicted luma
            ym, _, _, _ = _fixture_mixed(i)
            assert not np.array_equal(y, ym)


def test_cavlc_level_machinery_round_trip():
    """_write_levels is the bit-exact inverse of _read_levels across
    TrailingOnes counts, the first-coefficient +2 rule, the TC>10
    initial suffixLength rule, and suffix growth."""
    from magmapandas_spark.operators.h264 import (
        _BitReader,
        _BitWriter,
        _read_levels,
        _write_levels,
    )

    cases = [
        ([1, -1, 1, 3, -2, 4, -4, 2], 8, 3),      # t1s=3, growth to 2
        ([-1, 5, -3, 2], 4, 1),                   # t1s<3: +2 rule
        ([2, -2, 3], 3, 0),                       # no trailing ones
        ([1, -1, -1] + [4, -4] * 6 + [2], 16, 3), # dense DC shape
        ([-1, 2] + [3] * 10, 12, 1),              # TC>10, t1s<3: init 1
    ]
    for levels, tc, t1s in cases:
        w = _BitWriter()
        _write_levels(w, levels, tc, t1s)
        w.rbsp_trailing()
        r = _BitReader(w.tobytes())
        assert _read_levels(r, tc, t1s) == levels, (levels, tc, t1s)


def test_luma_dc_hadamard_and_scaling():
    from magmapandas_spark.operators.h264 import _luma_dc_residuals

    # DC-only block at QP 40: f = c00 everywhere, dcY = 16*c00,
    # residual = (16*c00 + 32) >> 6
    res = _luma_dc_residuals([4] + [0] * 15, 40)
    assert (res == ((16 * 4 + 32) >> 6)).all()
    res = _luma_dc_residuals([-4] + [0] * 15, 40)
    assert (res == ((16 * -4 + 32) >> 6)).all()
    # zig-zag position 1 is DC-array (0, 1): modulates block columns
    # via the Hadamard column pattern [1, 1, -1, -1]
    res = _luma_dc_residuals([0, 2] + [0] * 14, 40)
    assert (res[:, :2] == ((32 + 32) >> 6)).all()
    assert (res[:, 2:] == ((-32 + 32) >> 6)).all()
    # low-QP branch: qP 28 -> (f * LS + 2) >> 2, LS[28 % 6] = 16
    res = _luma_dc_residuals([3] + [0] * 15, 28)
    assert (res == (((3 * 16 + 2) >> 2) + 32 >> 6)).all()


def test_partial_dc_blocks_decode_in_every_nc_class():
    """Round 9 closed the former boundary: partial 4x4 blocks and the
    Table 9-5 VLC0/1/2 nonzero tokens now decode in full."""
    from magmapandas_spark.operators.h264 import (
        _BitReader,
        _BitWriter,
        _parse_cavlc_luma_dc,
        _write_residual_4x4,
    )

    # zero tokens decode in all four nC classes
    for n_c, bits, width in ((0, 1, 1), (2, 3, 2), (4, 15, 4), (8, 3, 6)):
        w = _BitWriter()
        w.u(bits, width)
        w.rbsp_trailing()
        assert _parse_cavlc_luma_dc(_BitReader(w.tobytes()), n_c) == [0] * 16
    # partial blocks (TotalCoeff < 16) round-trip through every
    # coeff_token class incl. total_zeros + run_before
    coeffs = [0, 3, 0, 0, -1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0]
    for n_c in (0, 2, 4, 8):
        w = _BitWriter()
        _write_residual_4x4(w, coeffs, n_c, 16)
        w.rbsp_trailing()
        assert _parse_cavlc_luma_dc(_BitReader(w.tobytes()), n_c) == coeffs


def test_notch5_mode_matrix_round_trip():
    from magmapandas_spark.operators.h264 import (
        _fixture_notch5,
        encode_mixed_annexb,
    )

    lm_seen, cm_seen = set(), set()
    for i in (0, 3, 7, 10, 14, 21):
        y, cb, cr, cls, modes = _fixture_notch5(i)
        data = encode_mixed_annexb(y, cb, cr, cls, modes=modes)
        yd, cbd, crd, _ = decode_h264_iframe(data)
        assert np.array_equal(y, yd)
        assert np.array_equal(cb, cbd)
        assert np.array_equal(cr, crd)
        for mb in range(len(cls)):
            if cls[mb]:
                lm_seen.add(int(modes[mb][0]))
                cm_seen.add(int(modes[mb][1]))
    # the sampled clips exercise Plane in both planes
    assert 3 in lm_seen and 3 in cm_seen


def test_plane_prediction_is_exact_on_a_linear_ramp():
    """A perfectly linear edge field must reproduce its own gradient:
    with top = 100 + 2x and left = 100 + 3y (corner 95... consistent
    corner 100-2 = 98? use exact ramp incl. corner), the fitted plane
    passes through every edge sample and the prediction extends it."""
    from magmapandas_spark.operators.h264 import _predict_16x16

    y = np.zeros((32, 32), np.uint8)
    # top edge of MB (1,1): row 15, cols 16..31 = 100 + 2x; left edge
    # col 15, rows 16..31 = 100 + 2y; corner (15,15) = 98 continues
    # BOTH ramps exactly (one corner sample can't continue two
    # different slopes, so both edges use slope 2)
    for x in range(16):
        y[15, 16 + x] = 100 + 2 * x
    for yy in range(16):
        y[16 + yy, 15] = 100 + 2 * yy
    y[15, 15] = 98
    _predict_16x16(y, 1, 1, 3)
    blk = y[16:32, 16:32].astype(int)
    # On an exact ramp the gradient registers carry 32x the slope
    # (absorbed by the final >> 5): slope 2 -> H = V =
    # 2 * 2 * sum(k^2, k=1..8) = 816, b = c = (5*816+32) >> 6 = 64.
    b, c = 64, 64
    a = 16 * (100 + 2 * 15 + 100 + 2 * 15)
    for yy in range(16):
        for x in range(16):
            exp = (a + b * (x - 7) + c * (yy - 7) + 16) >> 5
            assert blk[yy, x] == min(255, max(0, exp)), (x, yy)


def test_notch6_gop_multislice_round_trip():
    from magmapandas_spark.operators.h264 import (
        _fixture_notch6,
        _gop_slice_bounds,
        decode_h264_stream,
        encode_gop_annexb,
    )

    multislice_seen = frames_seen = 0
    for i in (0, 1, 5, 11, 23):
        frames = _fixture_notch6(i)
        pics, sps = decode_h264_stream(encode_gop_annexb(frames))
        assert len(pics) == len(frames)
        frames_seen += len(pics)
        if len(_gop_slice_bounds(sps["mbs_w"], sps["mbs_h"])) == 2:
            multislice_seen += 1
        for (y, cb, cr), (ye, cbe, cre, _, _) in zip(pics, frames):
            assert np.array_equal(y, ye)
            assert np.array_equal(cb, cbe)
            assert np.array_equal(cr, cre)
    assert frames_seen > len(list((0, 1, 5, 11, 23)))  # real GOPs
    assert multislice_seen > 0  # the two-slice path is exercised


def test_single_picture_wrapper_rejects_gop():
    from magmapandas_spark.operators.h264 import (
        _fixture_notch6,
        encode_gop_annexb,
    )

    frames = _fixture_notch6(1)  # 1 + 1%3 = 2 frames
    assert len(frames) == 2
    with pytest.raises(ValueError, match="one picture"):
        decode_h264_iframe(encode_gop_annexb(frames))


def test_more_rbsp_data_stop_bit_positions():
    from magmapandas_spark.operators.h264 import _last_set_bit_pos

    # stop bit as the only content of the last byte's MSB
    assert _last_set_bit_pos(bytes([0xFF, 0x80])) == 8
    # stop bit mid-byte: 0b00010000 -> bit index 3 within byte 1
    assert _last_set_bit_pos(bytes([0x00, 0x10])) == 11
    # trailing zero PAD bytes after the stop bit
    assert _last_set_bit_pos(bytes([0xA5, 0x01, 0x00])) == 15
    with pytest.raises(ValueError):
        _last_set_bit_pos(bytes([0, 0, 0]))


def test_notch7_composition_round_trip():
    """Every ladder feature in one stream: GOP, slices, all prediction
    modes, dense luma-DC, chroma-DC — bit-exact reconstruction."""
    from magmapandas_spark.operators.h264 import (
        _fixture_mode_frame,
        _fixture_notch7,
        _N7_SEED_OFF,
        decode_h264_stream,
        encode_full_annexb,
    )

    for i in (0, 5, 11, 23):
        frames, cdcs, ldcs = _fixture_notch7(i)
        pics, sps = decode_h264_stream(encode_full_annexb(i))
        assert len(pics) == len(frames)
        for f, ((y, cb, cr), (ye, cbe, cre, cls, _)) in enumerate(
            zip(pics, frames)
        ):
            assert np.array_equal(y, ye)
            assert np.array_equal(cb, cbe)
            assert np.array_equal(cr, cre)
            if cls.any():
                # residuals genuinely shifted the predicted MBs vs the
                # residual-free mode frame
                mbs_w, mbs_h = sps["mbs_w"], sps["mbs_h"]
                base, _, _, _, _ = _fixture_mode_frame(
                    _N7_SEED_OFF + 4 * i + f, mbs_w, mbs_h
                )
                assert not np.array_equal(y, base)


def test_notch8_multiqp_round_trip_and_branches():
    """Two PPS at QP 40/28 selected per slice: the same levels
    reconstruct through both 8.5.10 dequant branches — and the two
    branches genuinely differ (a QP-28 frame's planes are not the
    QP-40 reconstruction of the same levels)."""
    from magmapandas_spark.operators.h264 import (
        _fixture_notch8,
        _n4_block_residuals,
        decode_h264_stream,
        encode_multiqp_annexb,
    )

    both_qps_seen = set()
    for i in (1, 5, 11, 23):
        frames, cdcs, ldcs, qps = _fixture_notch8(i)
        both_qps_seen.update(qps)
        pics, _ = decode_h264_stream(encode_multiqp_annexb(i))
        assert len(pics) == len(frames)
        for (y, cb, cr), (ye, cbe, cre, _, _) in zip(pics, frames):
            assert np.array_equal(y, ye)
            assert np.array_equal(cb, cbe)
            assert np.array_equal(cr, cre)
    assert both_qps_seen == {40, 28}
    # the dequant branches differ for the same levels
    sd = 288 + 4 * 1 + 0
    assert _n4_block_residuals(sd, 40) != _n4_block_residuals(sd, 28)


def test_unknown_pps_id_raises():
    from magmapandas_spark.operators.h264 import (
        _fixture_notch6,
        encode_gop_annexb,
    )

    data = bytearray(encode_gop_annexb(_fixture_notch6(0)))
    # strip the PPS NAL (id 0): slices then reference an unknown PPS
    idx = bytes(data).find(b"\x00\x00\x00\x01\x68")
    end = bytes(data).find(b"\x00\x00\x00\x01", idx + 4)
    stripped = bytes(data[:idx]) + bytes(data[end:])
    with pytest.raises(ValueError, match="SPS/PPS|unknown PPS"):
        decode_h264_iframe(stripped)


def test_notch9_qp_tracking_round_trip():
    """mb_qp_delta accumulation: QP flips 36/34 across a slice's
    predicted MBs and the two dequant branches genuinely differ."""
    from magmapandas_spark.operators.h264 import (
        _fixture_notch9,
        _n4_block_residuals,
        _N9_SEED_OFF,
        decode_h264_stream,
        encode_qptrack_annexb,
    )

    deltas_seen = set()
    for i in (2, 5, 11, 23):
        frames, cdcs, ldcs, deltas = _fixture_notch9(i)
        for dq in deltas:
            deltas_seen.update(int(v) for v in dq if v != 0)
        pics, _ = decode_h264_stream(encode_qptrack_annexb(i))
        for (y, cb, cr), (ye, cbe, cre, _, _) in zip(pics, frames):
            assert np.array_equal(y, ye)
            assert np.array_equal(cb, cbe)
            assert np.array_equal(cr, cre)
    assert deltas_seen == {2, -2}  # both signs of mb_qp_delta decoded
    sd = _N9_SEED_OFF + 4 * 5
    assert _n4_block_residuals(sd, 36) != _n4_block_residuals(sd, 34)


def test_ladder_corpora_seed_ranges_are_disjoint():
    """The four GOP-shaped corpora must keep disjoint value-seed
    ranges (0.. / 96.. / 192.. / 288..) — an overlap would silently
    alias gate-row content across notches."""
    from magmapandas_spark.operators.h264 import (
        _N8_SEED_OFF,
        _N9_SEED_OFF,
        _N_CLIPS,
        _N7_SEED_OFF,
    )
    from magmapandas_spark.operators.mp4 import _AVC_SEED_OFF

    span = 4 * (_N_CLIPS - 1) + 3  # max sd offset within a corpus
    offs = [0, _AVC_SEED_OFF, _N7_SEED_OFF, _N9_SEED_OFF, _N8_SEED_OFF]
    ranges = sorted((o, o + span) for o in offs)
    for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
        assert a1 < b0, (a0, a1, b0, b1)
