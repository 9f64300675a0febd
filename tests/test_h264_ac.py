"""Notch 10/11 (4x4 AC residuals + Intra_4x4) — table structure,
codec round trips, and the decode == explicit-twin plane equality
that backs the ``h264_ac_decode`` / ``h264_i4x4_decode`` gate rows.

Spark-free: everything here runs at the byte/bit level.
"""

from __future__ import annotations

import numpy as np
import pytest

from magmapandas_spark.operators.h264 import (
    _BitReader,
    _BitWriter,
    _CBP_INTRA,
    _CBP_INTRA_INV,
    _CHROMA_DC_TOKENS,
    _RUN_BEFORE_FULL,
    _TOTAL_ZEROS_4X4,
    _coeff_token_table,
    _n10_frame,
    _parse_cavlc_chroma_dc,
    _parse_residual_4x4,
    _write_chroma_dc_block,
    _write_residual_4x4,
    decode_h264_iframe,
    encode_ac_annexb,
)


def _assert_prefix_free(table: dict, what: str) -> None:
    codes = sorted(table, key=len)
    for i, a in enumerate(codes):
        for b in codes[i + 1 :]:
            assert not b.startswith(a), f"{what}: {a!r} prefixes {b!r}"


def _kraft(table: dict) -> float:
    return sum(2.0 ** -len(c) for c in table)


def test_chroma_dc_token_table_structure():
    _assert_prefix_free(_CHROMA_DC_TOKENS, "chroma-DC coeff_token")
    # complete: all (t1s <= min(tc, 3), tc <= 4) symbols, Kraft sum 1
    syms = set(_CHROMA_DC_TOKENS.values())
    assert syms == {
        (t, c) for c in range(5) for t in range(min(c, 3) + 1)
    } - {(1, 0), (2, 0), (3, 0)} | {(0, 0)}
    assert _kraft(_CHROMA_DC_TOKENS) == 1.0


@pytest.mark.parametrize("n_c", [0, 2, 4])
def test_coeff_token_tables_structure(n_c):
    table = _coeff_token_table(n_c)
    _assert_prefix_free(table, f"coeff_token nC={n_c}")
    syms = set(table.values())
    expected = {(0, 0)} | {
        (t, c) for c in range(1, 17) for t in range(min(c, 3) + 1)
    }
    assert syms == expected, f"nC={n_c}: symbol set incomplete"
    # the published Table 9-5 codes are prefix-free but NOT complete
    # (a few codewords are reserved) — Kraft sum < 1, never > 1
    assert 0.999 <= _kraft(table) <= 1.0


def test_total_zeros_and_run_before_structure():
    for tc, table in _TOTAL_ZEROS_4X4.items():
        _assert_prefix_free(table, f"total_zeros tc={tc}")
        assert set(table.values()) == set(range(16 - tc + 1))
        assert 0.99 <= _kraft(table) <= 1.0
    for zl, table in _RUN_BEFORE_FULL.items():
        _assert_prefix_free(table, f"run_before zl={zl}")
        if zl < 7:
            assert set(table.values()) == set(range(zl + 1))
            assert _kraft(table) == 1.0
        else:
            assert set(table.values()) == set(range(15))


def test_cbp_intra_table_is_permutation():
    assert sorted(_CBP_INTRA) == list(range(48))
    for cbp, code in _CBP_INTRA_INV.items():
        assert _CBP_INTRA[code] == cbp


def _roundtrip_residual(coeffs, n_c, max_coeff):
    w = _BitWriter()
    _write_residual_4x4(w, coeffs, n_c, max_coeff)
    w.rbsp_trailing()
    r = _BitReader(w.tobytes())
    return _parse_residual_4x4(r, n_c, max_coeff)


def test_residual_roundtrip_sweeps_every_nc_class():
    rng = np.random.default_rng(109)
    for trial in range(400):
        max_coeff = 16 if trial % 2 == 0 else 15
        n_c = int(rng.integers(0, 12))
        n = int(rng.integers(0, max_coeff + 1))
        pos = rng.choice(max_coeff, size=n, replace=False)
        coeffs = [0] * max_coeff
        for p in pos:
            v = int(rng.integers(1, 40)) * (1 if rng.random() < 0.5 else -1)
            coeffs[p] = v
        assert _roundtrip_residual(coeffs, n_c, max_coeff) == coeffs


def test_residual_roundtrip_escape_levels():
    # prefix == 15 escapes at low suffix length
    coeffs = [0] * 16
    coeffs[0] = -300
    coeffs[3] = 250
    coeffs[7] = 1
    assert _roundtrip_residual(coeffs, 0, 16) == coeffs


def test_residual_roundtrip_extended_escape_range():
    """level_prefix >= 16 (the 2005+ extended escape range): exact
    round trips across the prefix-15/16 band boundary and far beyond,
    at several suffix lengths (driven by preceding level magnitudes)."""
    # suffix_len 0 path: band boundary at level_code 4125/4126
    for mag in (2063, 2064, 8000, 50000, 1_000_000):
        for sign in (1, -1):
            coeffs = [sign * mag] + [0] * 15
            assert _roundtrip_residual(coeffs, 0, 16) == coeffs
    # growing suffix lengths: a run of large levels walks suffixLength
    # up while later levels still need prefix >= 16
    coeffs = [123456, -654321, 99999, -4096, 777, -5, 1, 0, 0, 0,
              0, 0, 0, 0, 0, 0]
    assert _roundtrip_residual(coeffs, 0, 16) == coeffs
    # dense block (TotalCoeff > 10 initial suffixLength rule) with
    # extended escapes inside
    coeffs = [(-1) ** k * (40000 + 1000 * k) for k in range(12)] + [0] * 4
    assert _roundtrip_residual(coeffs, 4, 16) == coeffs


def test_chroma_dc_block_roundtrip_all_shapes():
    # every TotalCoeff 0..4 at every position/sign layout over -2..2
    for a in range(-2, 3):
        for b in range(-2, 3):
            for c in range(-2, 3):
                for d in range(-2, 3):
                    coeffs = [a, b, c, d]
                    w = _BitWriter()
                    _write_chroma_dc_block(w, coeffs)
                    w.rbsp_trailing()
                    r = _BitReader(w.tobytes())
                    assert _parse_cavlc_chroma_dc(r) == coeffs


@pytest.mark.parametrize("with_i4x4", [False, True])
@pytest.mark.parametrize("i", [0, 3, 7, 11, 17, 23])
def test_decode_matches_explicit_twin(with_i4x4, i):
    """decode(encode(clip)) must reproduce the explicit-loop twin's
    planes sample-exactly — three independent implementations
    (closed-form syntax -> CAVLC writer, the numpy decoder, the
    explicit-loop reconstruction) agreeing bit-for-bit."""
    y, cb, cr, kinds = _n10_frame(i, with_i4x4)
    dy, dcb, dcr, sps = decode_h264_iframe(encode_ac_annexb(i, with_i4x4))
    assert np.array_equal(y, dy)
    assert np.array_equal(cb, dcb)
    assert np.array_equal(cr, dcr)
    if with_i4x4:
        assert 2 in kinds, "i4x4 corpus must contain I_4x4 MBs"
    assert 1 in kinds and 0 in kinds


def test_i4x4_corpus_exercises_all_nine_modes_and_cbp_range():
    from magmapandas_spark.operators.h264 import (
        _n10_i4_mode,
        _n10_i4_params,
        _n10_kind,
    )

    modes = set()
    cbps = set()
    for i in range(24):
        mbs_w = 3 + i % 2
        for mbx in range(1, mbs_w):
            if _n10_kind(i, mbx, True) != 2:
                continue
            mb = mbs_w + mbx
            for blk in range(16):
                modes.add(_n10_i4_mode(i, mb, blk))
            cbps.add(_n10_i4_params(i, mbx)[0])
    assert modes == set(range(9))
    assert 0 in cbps and 15 in cbps


@pytest.mark.parametrize("i", [0, 1, 5, 10])
def test_ladder_composition_roundtrip(i):
    """Notch 12: the composition stream (GOP x multi-PPS x
    multi-slice x AC x I_4x4) decodes to the explicit twin's planes,
    with the parsed slice structure pinned (2 slices per picture) —
    incl. row-2 predicted MBs whose top edge is slice-gated away."""
    from magmapandas_spark.operators.h264 import (
        _n12_frame,
        _n12_geom,
        decode_h264_stream_info,
        encode_ladder_annexb,
    )

    mbs_w, mbs_h, n_f = _n12_geom(i)
    pics, sps, slice_counts = decode_h264_stream_info(
        encode_ladder_annexb(i)
    )
    assert len(pics) == n_f
    assert slice_counts == [2] * n_f
    assert sps["mbs_w"] == mbs_w and sps["mbs_h"] == mbs_h
    for f, (dy, dcb, dcr) in enumerate(pics):
        y, cb, cr, kinds = _n12_frame(i, f)
        assert np.array_equal(y, dy), f"frame {f} luma"
        assert np.array_equal(cb, dcb) and np.array_equal(cr, dcr)
        # composition really mixes the kinds
        assert 0 in kinds and (1 in kinds or 2 in kinds)


def test_ladder_oracle_matches_decoder_stats():
    import duckdb
    import pandas as pd

    from magmapandas_spark.operators.h264 import (
        _CK_MOD,
        SQL_H264_LADDER_DECODE,
        decode_h264_stream_info,
        encode_ladder_annexb,
    )

    rows = []
    for i in range(12):
        pics, sps, slice_counts = decode_h264_stream_info(
            encode_ladder_annexb(i)
        )
        mbs_w, mbs_h = sps["mbs_w"], sps["mbs_h"]
        for f, (y, cb, cr) in enumerate(pics):
            ck = 0
            ky = 0
            for mb in range(mbs_w * mbs_h):
                mbx, mby = mb % mbs_w, mb // mbs_w
                blk = (
                    y[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16]
                    .reshape(-1)
                    .astype(np.int64)
                )
                ks = np.arange(ky + 1, ky + 257, dtype=np.int64)
                ck = (ck + int((ks * blk).sum())) % _CK_MOD
                ky += 256
            rows.append(
                (
                    i, f, slice_counts[f], y.shape[1], y.shape[0],
                    mbs_w * mbs_h, int(y.sum()), int(cb.sum()),
                    int(cr.sum()), ck,
                )
            )
    got = pd.DataFrame(
        rows,
        columns=[
            "media_id", "frame_idx", "n_slices", "width", "height",
            "n_mbs", "sum_y", "sum_cb", "sum_cr", "ck_y",
        ],
    ).astype("int64")
    want = duckdb.sql(SQL_H264_LADDER_DECODE).df().astype("int64")
    assert got.equals(want)


def test_oracles_match_decoder_stats():
    """DuckDB oracle rows == decoder-derived stats for both corpora
    (the same comparison the driver gate performs, minus Spark)."""
    import duckdb
    import pandas as pd

    from magmapandas_spark.operators.h264 import (
        _CK_MOD,
        SQL_H264_AC_DECODE,
        SQL_H264_I4X4_DECODE,
    )

    for with4, sql in (
        (False, SQL_H264_AC_DECODE),
        (True, SQL_H264_I4X4_DECODE),
    ):
        rows = []
        for i in range(24):
            y, cb, cr, sps = decode_h264_iframe(encode_ac_annexb(i, with4))
            mbs_w = sps["mbs_w"]
            ck = 0
            ky = 0
            for mb in range(mbs_w * sps["mbs_h"]):
                mbx, mby = mb % mbs_w, mb // mbs_w
                blk = (
                    y[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16]
                    .reshape(-1)
                    .astype(np.int64)
                )
                ks = np.arange(ky + 1, ky + 257, dtype=np.int64)
                ck = (ck + int((ks * blk).sum())) % _CK_MOD
                ky += 256
            rows.append(
                (
                    i, y.shape[1], y.shape[0], mbs_w * sps["mbs_h"],
                    int(y.sum()), int(cb.sum()), int(cr.sum()), ck,
                )
            )
        got = pd.DataFrame(
            rows,
            columns=[
                "media_id", "width", "height", "n_mbs",
                "sum_y", "sum_cb", "sum_cr", "ck_y",
            ],
        ).astype("int64")
        want = duckdb.sql(sql).df().astype("int64")
        assert got.equals(want), f"oracle mismatch (i4x4={with4})"


def test_twin_and_decoder_4x4_prediction_agree_on_random_context():
    """Property: the explicit-loop twin (_x_pred4) and the decoder's
    numpy kernel (_predict_4x4_block) — two independent derivations
    of spec 8.3.1.2 — agree on every mode over random neighbor
    contexts and every availability combination each mode permits."""
    from magmapandas_spark.operators.h264 import (
        _predict_4x4_block,
        _x_pred4,
    )

    rng = np.random.default_rng(911)
    for trial in range(300):
        y = rng.integers(0, 256, size=(12, 12), dtype=np.uint8).copy()
        r4, c4 = 1, 1  # block at (4, 4) with a full neighbor ring
        for mode in range(9):
            for a_tr in (True, False):
                # full neighbor ring; top-right toggles substitution
                tw = _x_pred4(y, r4, c4, mode, True, True, True, a_tr)
                dec = _predict_4x4_block(
                    y, r4, c4, mode, True, True, True, a_tr
                )
                assert (np.array(tw) == np.array(dec)).all(), (
                    trial, mode, a_tr,
                )
    # DC fallbacks: single-edge and no-edge
    y = rng.integers(0, 256, size=(12, 12), dtype=np.uint8).copy()
    for a_l, a_t in ((True, False), (False, True), (False, False)):
        tw = _x_pred4(y, 1, 1, 2, a_l, a_t, False, False)
        dec = _predict_4x4_block(y, 1, 1, 2, a_l, a_t, False, False)
        assert (np.array(tw) == np.array(dec)).all()


def test_corrupt_streams_fail_cleanly():
    """Quarantine contract for 100-TB ingest: a corrupted payload
    must either still decode or raise ValueError /
    NotImplementedError — never an IndexError/KeyError out of the bit
    machinery, a multi-GB allocation from corrupt SPS dimensions, or
    a hang. 600 deterministic single-byte corruptions over the AC,
    I_4x4, and composition corpora."""
    from magmapandas_spark.operators.h264 import (
        decode_h264_stream_info,
        encode_ladder_annexb,
    )

    rng = np.random.default_rng(42)
    streams = [
        encode_ac_annexb(3, False),
        encode_ac_annexb(8, True),
        encode_ladder_annexb(5),
    ]
    n_ok = n_err = 0
    for data in streams:
        for _ in range(200):
            pos = int(rng.integers(5, len(data)))
            val = int(rng.integers(0, 256))
            mutated = data[:pos] + bytes([val]) + data[pos + 1 :]
            try:
                decode_h264_stream_info(mutated)
                n_ok += 1
            except (ValueError, NotImplementedError):
                n_err += 1
    # the corruption harness must be non-vacuous in both directions
    assert n_err > 50, (n_ok, n_err)
    assert n_ok + n_err == 600


def test_mp4_ac_capstone_roundtrip():
    """Container x AC capstone: the notch-12 corpus wrapped in
    AVC-in-MP4 with a MULTI-parameter-set avcC (two PPSs) decodes
    through the container path to the explicit twin's planes; each
    sample carries exactly the picture's two slice NALs."""
    from magmapandas_spark.operators.h264 import (
        _n12_frame,
        _n12_geom,
        decode_h264_stream,
    )
    from magmapandas_spark.operators.mp4 import (
        _avcc_sample_nals,
        make_synthetic_avc_ac_mp4,
        mp4_parse,
        parse_avcc_config,
    )

    for i in (0, 4, 11):
        payload = make_synthetic_avc_ac_mp4(i)
        m = mp4_parse(payload)
        assert m["codec"] == "avc1"
        sps_l, pps_l = parse_avcc_config(m["avcc"])
        assert len(sps_l) == 1 and len(pps_l) == 2
        header = b"".join(b"\x00\x00\x00\x01" + n for n in sps_l + pps_l)
        _, _, n_f = _n12_geom(i)
        assert len(m["sample_sizes"]) == n_f
        pos = m["chunk_offsets"][0]
        for f, size in enumerate(m["sample_sizes"]):
            nals = _avcc_sample_nals(payload[pos : pos + size])
            assert len(nals) == 2
            pics, _ = decode_h264_stream(
                header
                + b"".join(b"\x00\x00\x00\x01" + n for n in nals)
            )
            assert len(pics) == 1
            y, cb, cr = pics[0]
            ty, tcb, tcr, _ = _n12_frame(i, f)
            assert np.array_equal(y, ty)
            assert np.array_equal(cb, tcb) and np.array_equal(cr, tcr)
            pos += size


def test_run_before_overshoot_raises():
    """spec 9.2.3: run_before > zerosLeft must raise — the corrupt
    pattern that would otherwise wrap ``pos`` into Python negative
    indexing and emit plausible garbage (found by review probe)."""
    from magmapandas_spark.operators.h264 import (
        _TOTAL_ZEROS_4X4,
        _write_levels,
    )

    def put_code(w, code: str) -> None:
        w.u(int(code, 2) if set(code) != {"0"} else 0, len(code))

    # TC=8, T1s=0 (nC >= 8 FLC class), eight levels, total_zeros=8
    # (legal: 8 <= 16 - 8), then run_before = 14 from the
    # zerosLeft >= 7 table while only 8 zeros remain
    w = _BitWriter()
    w.u(4 * 7 + 0, 6)
    _write_levels(w, [2] * 8, 8, 0)
    put_code(w, {v: k for k, v in _TOTAL_ZEROS_4X4[8].items()}[8])
    put_code(w, {v: k for k, v in _RUN_BEFORE_FULL[7].items()}[14])
    w.rbsp_trailing()
    r = _BitReader(w.tobytes())
    with pytest.raises(ValueError, match="run_before"):
        _parse_residual_4x4(r, 8, 16)


def test_chroma_mode_out_of_range_raises():
    """intra_chroma_pred_mode > 3 must raise, not silently decode as
    DC (the cbp codeNum discipline)."""
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
    sl.ue(1)   # I_16x16, pred 0, cbp 0
    sl.ue(7)   # intra_chroma_pred_mode = 7: out of range
    sl.rbsp_trailing()
    idx = data.rfind(b"\x00\x00\x00\x01\x65")
    stream = data[:idx] + b"\x00\x00\x00\x01\x65" + _escape_ebsp(
        sl.tobytes()
    )
    with pytest.raises(ValueError, match="intra_chroma_pred_mode"):
        decode_h264_iframe(stream)
