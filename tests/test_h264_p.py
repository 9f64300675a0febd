"""Notches 13-17 — P-slice inter prediction: decoder-vs-twin bit
equality over five corpora (16x16 / partitioned / sub-partitioned /
multi-reference / weighted), kernel equivalence on randomized
motion, MV-prediction and skip rule cases, corpus coverage pins,
the sequential AVC-in-MP4 track path, a 600-mutation quarantine
fuzz, and the honest boundaries (B slices, ref-list modification,
CABAC)."""

import numpy as np
import pytest

from magmapandas_spark.operators import h264, h264p
from magmapandas_spark.operators.h264 import (
    _CBP_INTER,
    _CBP_INTRA,
    _mc_chroma_block,
    _mc_luma_block,
    _mvp_part,
    _skip_mv_part,
    _BitWriter,
    _escape_ebsp,
    decode_h264_stream_info,
)
from magmapandas_spark.operators.h264p import (
    _n13_clip,
    _n13_cbp,
    _n13_geom,
    _n13_intra,
    _n13_kind,
    _n13_mv,
    _N13_CLIPS,
    _x_fill4,
    _x_mc_chroma,
    _x_mc_luma,
    _x_new_mvstate,
    _x_skip_part,
    encode_p_annexb,
)


# ------------------------------------------------------------------
# Table 9-4 inter column
# ------------------------------------------------------------------


def test_cbp_inter_is_permutation():
    assert sorted(_CBP_INTER) == list(range(48))


def test_cbp_inter_agrees_with_intra_on_shared_tail():
    # spec Table 9-4: codeNum 46/47 map to cbp 38/41 in BOTH columns
    assert _CBP_INTER[46] == _CBP_INTRA[46] == 38
    assert _CBP_INTER[47] == _CBP_INTRA[47] == 41


def test_cbp_inter_low_codenums_are_cheap_patterns():
    # the inter column fronts the common inter patterns: no residual,
    # chroma-DC-only, single luma 8x8s, chroma AC
    assert _CBP_INTER[:7] == [0, 16, 1, 2, 4, 8, 32]


# ------------------------------------------------------------------
# interpolation kernels: vectorized decoder vs explicit twin
# ------------------------------------------------------------------


def test_luma_quarter_pel_decoder_equals_twin():
    rng = np.random.RandomState(7)
    ref = rng.randint(0, 256, (48, 64), np.uint8)
    # every fractional phase pair, plus far out-of-picture vectors
    cases = [(4 * ix + qx, 4 * iy + qy)
             for qx in range(4) for qy in range(4)
             for ix, iy in [(-2, 1), (3, -3)]]
    cases += [(-200, -180), (250, 210), (-199, 207)]
    for mvx, mvy in cases:
        for x0, y0 in [(0, 0), (16, 16), (48, 32)]:
            a = np.asarray(
                _mc_luma_block(ref, x0, y0, mvx, mvy), np.int64
            )
            b = np.asarray(
                _x_mc_luma(ref, x0, y0, 16, 16, mvx, mvy), np.int64
            )
            assert np.array_equal(a, b), (mvx, mvy, x0, y0)


def test_chroma_eighth_pel_decoder_equals_twin():
    rng = np.random.RandomState(11)
    ref = rng.randint(0, 256, (24, 32), np.uint8)
    for mvx in (-37, -8, 0, 5, 29, 200):
        for mvy in (-41, -3, 0, 7, 31, -160):
            for x0, y0 in [(0, 0), (8, 8), (24, 16)]:
                a = np.asarray(
                    _mc_chroma_block(ref, x0, y0, mvx, mvy), np.int64
                )
                b = np.asarray(
                    _x_mc_chroma(ref, x0, y0, 8, 8, mvx, mvy), np.int64
                )
                assert np.array_equal(a, b), (mvx, mvy, x0, y0)


def test_luma_integer_motion_is_edge_replicated_copy():
    rng = np.random.RandomState(3)
    ref = rng.randint(0, 256, (32, 48), np.uint8)
    # integer vector pointing fully outside the left/top corner:
    # every tap clamps to ref[0, 0]'s row/col replication
    out = np.asarray(
        _mc_luma_block(ref, 0, 0, -400, -400), np.int64
    )
    assert np.array_equal(out, np.full((16, 16), int(ref[0, 0])))
    # in-picture integer motion is an exact block copy
    out = np.asarray(_mc_luma_block(ref, 16, 0, 4 * 7, 4 * 9))
    assert np.array_equal(out, ref[9 : 9 + 16, 23 : 23 + 16])


# ------------------------------------------------------------------
# MV prediction + skip rules (spec 8.4.1)
# ------------------------------------------------------------------


def _grid_state(mbs_w, mbs_h, mb_state):
    """Build 4x4-block grids from per-MB (mvx, mvy, ref) specs; ref
    -2 marks an undecoded MB (its avail is False)."""
    mv4x = np.zeros((4 * mbs_h, 4 * mbs_w), np.int32)
    mv4y = np.zeros((4 * mbs_h, 4 * mbs_w), np.int32)
    ref4 = np.full((4 * mbs_h, 4 * mbs_w), -2, np.int32)
    avail = []
    for mb, (mx, my, rf) in enumerate(mb_state):
        x, yv = mb % mbs_w, mb // mbs_w
        sl = np.s_[4 * yv : 4 * yv + 4, 4 * x : 4 * x + 4]
        mv4x[sl], mv4y[sl], ref4[sl] = mx, my, rf
        avail.append(rf != -2)
    return mv4x, mv4y, ref4, (lambda o: avail[o])


def _mvp16(mb, mbs_w, grids):
    mv4x, mv4y, ref4, avail = grids
    x, yv = mb % mbs_w, mb // mbs_w
    return _mvp_part(
        4 * x, 4 * yv, 4, 4, "16x16", 0,
        mv4x, mv4y, ref4, avail, mbs_w,
    )


def _skip16(mb, mbs_w, grids):
    mv4x, mv4y, ref4, avail = grids
    x, yv = mb % mbs_w, mb // mbs_w
    return _skip_mv_part(
        4 * x, 4 * yv, mv4x, mv4y, ref4, avail, mbs_w
    )


_U = (0, 0, -2)  # undecoded MB
_I = (0, 0, -1)  # intra MB


def test_mvp_b_and_c_unavailable_takes_a():
    # row 0 of a 4-wide picture: mb 1 with only A decoded
    g = _grid_state(4, 2, [(12, -8, 0), _U, _U, _U,
                           _U, _U, _U, _U])
    assert _mvp16(1, 4, g) == (12, -8)


def test_mvp_exactly_one_matching_ref_takes_it():
    # mb 5 (middle of row 1): A intra, B inter, C intra
    st = [_I] * 8
    st[1] = (20, 4, 0)  # B
    g = _grid_state(4, 2, st)
    assert _mvp16(5, 4, g) == (20, 4)


def test_mvp_median_of_three_inter_neighbors():
    st = [_I] * 8
    st[4], st[1], st[2] = (10, -2, 0), (30, 6, 0), (20, 50, 0)
    g = _grid_state(4, 2, st)
    # A=(10,-2) B=(30,6) C=(20,50) -> median (20, 6)
    assert _mvp16(5, 4, g) == (20, 6)


def test_mvp_c_unavailable_substitutes_d():
    st = [_I] * 8
    # mb 7 (last col of row 1): C out of picture -> D (mb 2)
    st[6], st[3], st[2] = (8, 8, 0), (16, 16, 0), (24, 24, 0)
    g = _grid_state(4, 2, st)
    assert _mvp16(7, 4, g) == (16, 16)


def test_mvp_directional_16x8_8x16_shortcuts():
    # partitioned neighbors: top 16x8 partition takes B when B is
    # inter; bottom takes A; 8x16 left takes A, right takes C
    st = [_I] * 8
    st[1] = (40, 8, 0)   # B of mb 5
    st[4] = (-12, 4, 0)  # A of mb 5
    st[2] = (24, -4, 0)  # C of mb 5
    mv4x, mv4y, ref4, avail = _grid_state(4, 2, st)
    args = (mv4x, mv4y, ref4, avail, 4)
    # mb 5 -> top-left block (4, 4)
    assert _mvp_part(4, 4, 4, 2, "16x8", 0, *args) == (40, 8)
    assert _mvp_part(4, 6, 4, 2, "16x8", 1, *args) == (-12, 4)
    assert _mvp_part(4, 4, 2, 4, "8x16", 0, *args) == (-12, 4)
    assert _mvp_part(6, 4, 2, 4, "8x16", 1, *args) == (24, -4)
    # when the directional neighbor is intra, fall through to median:
    # A=(-12,4) B=intra(0,0) C=(24,-4) -> (0, 0)
    st2 = list(st)
    st2[1] = _I
    g2 = _grid_state(4, 2, st2)
    assert _mvp_part(
        4, 4, 4, 2, "16x8", 0, g2[0], g2[1], g2[2], g2[3], 4
    ) == (0, 0)


def test_skip_mv_zero_when_top_missing_or_zero_neighbor():
    st = [_I] * 8
    g = _grid_state(4, 2, st)
    # top row: no B neighbor -> zero
    assert _skip16(1, 4, g) == (0, 0)
    # interior with a zero-mv ref-0 left neighbor -> zero
    st[4], st[1], st[2] = (0, 0, 0), (12, 4, 0), (6, 2, 0)
    g = _grid_state(4, 2, st)
    assert _skip16(5, 4, g) == (0, 0)
    # non-zero neighbors -> the median predictor over
    # A=(10,-2) B=(12,4) C=(6,2): (10, 2)
    st[4] = (10, -2, 0)
    g = _grid_state(4, 2, st)
    assert _skip16(5, 4, g) == (10, 2)


# ------------------------------------------------------------------
# corpus: decoder == explicit twin, bit for bit
# ------------------------------------------------------------------


@pytest.mark.parametrize("i", range(_N13_CLIPS))
def test_corpus_decoder_equals_twin(i):
    pics, sps, slice_counts = decode_h264_stream_info(
        encode_p_annexb(i)
    )
    twin = _n13_clip(i)
    assert len(pics) == 3 and slice_counts == [1, 1, 1]
    for f in range(3):
        for pi in range(3):
            assert np.array_equal(pics[f][pi], twin[f][pi]), (i, f, pi)


def test_corpus_coverage_is_complete():
    phases, cbps, ccs, pms, cms = set(), set(), set(), set(), set()
    skip_pos, clamped = set(), 0
    nonzero_skip = 0
    for i in range(_N13_CLIPS):
        mbs_w, mbs_h = _n13_geom(i)
        n_mbs = mbs_w * mbs_h
        w, h = 16 * mbs_w, 16 * mbs_h
        for f in (1, 2):
            done = [False] * n_mbs
            st = _x_new_mvstate(mbs_w, mbs_h, lambda o: done[o])
            for mb in range(n_mbs):
                k = _n13_kind(i, f, mb, mbs_w)
                mbx, mby = mb % mbs_w, mb // mbs_w
                if k == 3:
                    pm, cm, cc = _n13_intra(i, f, mb)
                    pms.add(pm)
                    cms.add(cm)
                    ccs.add(cc)
                    _x_fill4(st, 4 * mbx, 4 * mby, 4, 4, 0, 0, -1)
                    done[mb] = True
                    continue
                if k == 0:
                    mv = _x_skip_part(4 * mbx, 4 * mby, st)
                    if mv != (0, 0):
                        nonzero_skip += 1
                    skip_pos.add(
                        "lead" if mb == 0
                        else ("trail" if mb == n_mbs - 1 else "mid")
                    )
                else:
                    mv = _n13_mv(i, f, mb)
                    phases.add((mv[0] & 3, mv[1] & 3))
                    xi = 16 * mbx + (mv[0] >> 2)
                    yi = 16 * mby + (mv[1] >> 2)
                    if xi < 2 or yi < 2 or xi + 19 >= w or yi + 19 >= h:
                        clamped += 1
                    if k == 2:
                        cl, cc = _n13_cbp(i, f, mb)
                        cbps.add(cl)
                        ccs.add(cc)
                _x_fill4(st, 4 * mbx, 4 * mby, 4, 4, mv[0], mv[1], 0)
                done[mb] = True
    assert len(phases) == 16, phases  # every quarter-pel phase pair
    assert cbps == set(range(16))  # every Table 9-4 luma pattern
    assert ccs == {0, 1, 2}
    assert pms == {0, 1, 2, 3} and cms == {0, 1, 2, 3}
    assert skip_pos == {"lead", "mid", "trail"}
    assert clamped > 0  # out-of-picture windows really occur
    assert nonzero_skip > 0  # P_Skip motion is not vacuously zero


def test_p_pictures_differ_from_reference():
    # non-vacuous: motion + residuals actually change the pictures
    for i in (0, 5):
        twin = _n13_clip(i)
        assert not np.array_equal(twin[0][0], twin[1][0])
        assert not np.array_equal(twin[1][0], twin[2][0])


# ------------------------------------------------------------------
# honest boundaries
# ------------------------------------------------------------------


def _nal(ref_idc, nal_type, w_):
    return (
        b"\x00\x00\x00\x01"
        + bytes([(ref_idc << 5) | nal_type])
        + _escape_ebsp(w_.tobytes())
    )


def _base_stream(i=0):
    """SPS + PPS + IDR PCM picture of corpus clip 0 (valid prefix)."""
    data = encode_p_annexb(i)
    # first three NALs: SPS, PPS, IDR slice
    parts = data.split(b"\x00\x00\x00\x01")[1:]
    return b"\x00\x00\x00\x01" + (
        b"\x00\x00\x00\x01".join(parts[:3])
    )


def _p_header(sl, slice_type=5):
    sl.ue(0)  # first_mb
    sl.ue(slice_type)
    sl.ue(0)  # pps id
    sl.u(1, 4)  # frame_num
    sl.u(2, 4)  # poc lsb


def test_b_slice_raises():
    sl = _BitWriter()
    _p_header(sl, slice_type=6)  # B
    sl.rbsp_trailing()
    with pytest.raises(NotImplementedError, match="B slices"):
        decode_h264_stream_info(_base_stream() + _nal(2, 1, sl))


def test_p_mb_type_out_of_range_raises():
    # every P partition type 0..4 now decodes; an mb_type past the
    # intra range must still hit the explicit boundary error
    sl = _BitWriter()
    _p_header(sl)
    sl.u(0, 1)  # no override
    sl.u(0, 1)  # no reordering
    sl.u(0, 1)  # no adaptive marking
    sl.se(0)  # qp delta
    sl.ue(1)  # disable_deblocking_filter_idc
    sl.ue(0)  # mb_skip_run = 0
    sl.ue(31)  # mb_type 31 -> intra offset 26: out of Table 7-11
    sl.rbsp_trailing()
    with pytest.raises(NotImplementedError, match="mb_type"):
        decode_h264_stream_info(_base_stream() + _nal(2, 1, sl))


def test_more_active_refs_than_decoded_raises():
    # the override path itself decodes now (notch 16); overriding to
    # two references with only one decoded picture is the error
    sl = _BitWriter()
    _p_header(sl)
    sl.u(1, 1)  # num_ref_idx_active_override_flag
    sl.ue(1)  # num_ref_idx_l0_active_minus1 = 1 -> two refs
    sl.u(0, 1)
    sl.u(0, 1)
    sl.se(0)
    sl.ue(1)
    sl.rbsp_trailing()
    with pytest.raises(ValueError, match="reference pictures"):
        decode_h264_stream_info(_base_stream() + _nal(2, 1, sl))


def test_p_slice_in_idr_raises():
    sl = _BitWriter()
    _p_header(sl)
    sl.rbsp_trailing()
    with pytest.raises(ValueError, match="IDR"):
        decode_h264_stream_info(_base_stream() + _nal(3, 5, sl))


def test_p_slice_without_reference_raises():
    # SPS + PPS then directly a P slice: no decoded picture to
    # reference
    full = encode_p_annexb(0)
    parts = full.split(b"\x00\x00\x00\x01")[1:]
    stream = b"\x00\x00\x00\x01" + b"\x00\x00\x00\x01".join(
        parts[:2] + [parts[3]]
    )
    with pytest.raises(ValueError, match="reference pictures"):
        decode_h264_stream_info(stream)


def test_frame_num_gap_raises():
    # IDR has frame_num 0; a P slice jumping to frame_num 2 skips a
    # reference frame — spec 8.2.5.2 gap inference is unimplemented,
    # so the decoder must fail closed rather than mis-number the DPB
    sl = _BitWriter()
    sl.ue(0)  # first_mb
    sl.ue(5)  # P slice
    sl.ue(0)  # pps id
    sl.u(2, 4)  # frame_num = 2 (gap: previous reference was 0)
    sl.u(4, 4)  # poc lsb
    sl.u(0, 1)  # no override
    sl.u(0, 1)  # no reordering
    sl.u(0, 1)  # no adaptive marking
    sl.se(0)  # qp delta
    sl.ue(1)  # disable_deblocking_filter_idc
    sl.rbsp_trailing()
    with pytest.raises(NotImplementedError, match="frame_num gap"):
        decode_h264_stream_info(_base_stream() + _nal(2, 1, sl))


# ------------------------------------------------------------------
# AVC-in-MP4 sequential track decode (the container x INTER capstone)
# ------------------------------------------------------------------


def test_mp4_track_decode_matches_twin():
    from magmapandas_spark.operators import mp4

    for i in (0, 7):
        payload = mp4.make_synthetic_avc_p_mp4(i)
        m = mp4.mp4_parse(payload)
        assert m["codec"] == "avc1" and len(m["sample_sizes"]) == 3
        sps_l, pps_l = mp4.parse_avcc_config(m["avcc"])
        pos = m["chunk_offsets"][0]
        nals = []
        for size in m["sample_sizes"]:
            nals.extend(
                mp4._avcc_sample_nals(payload[pos : pos + size])
            )
            pos += size
        annexb = b"".join(
            b"\x00\x00\x00\x01" + n for n in sps_l + pps_l + nals
        )
        pics, _, _ = decode_h264_stream_info(annexb)
        twin = _n13_clip(i)
        for f in range(3):
            for pi in range(3):
                assert np.array_equal(pics[f][pi], twin[f][pi])


def test_mp4_per_sample_decode_rejects_p_samples():
    # the isolation path must NOT silently mis-decode inter samples:
    # a P access unit decoded alone has no reference picture
    from magmapandas_spark.operators import mp4
    from magmapandas_spark.operators.h264 import decode_h264_stream

    payload = mp4.make_synthetic_avc_p_mp4(0)
    m = mp4.mp4_parse(payload)
    sps_l, pps_l = mp4.parse_avcc_config(m["avcc"])
    pos = m["chunk_offsets"][0] + m["sample_sizes"][0]
    p_sample = mp4._avcc_sample_nals(
        payload[pos : pos + m["sample_sizes"][1]]
    )
    annexb = b"".join(
        b"\x00\x00\x00\x01" + n for n in sps_l + pps_l + p_sample
    )
    with pytest.raises(ValueError, match="reference pictures"):
        decode_h264_stream(annexb)


def test_mp4_track_permissive_quarantines_whole_payload(spark):
    # a poisoned reference chain must not report later frames as
    # decoded: the permissive track path quarantines the whole file
    from magmapandas_spark.operators import mp4

    good = mp4.make_synthetic_avc_p_mp4(1)
    bad = mp4.make_synthetic_avc_p_mp4(0)[:-100]  # truncated mdat
    media = spark.createDataFrame(
        [(0, bad), (1, good)],
        "media_id long, payload binary",
    )
    rows = (
        mp4.decode_avc_track(media, permissive=True)
        .toPandas()
        .sort_values(["media_id", "frame_idx"])
    )
    bad_rows = rows[rows.media_id == 0]
    good_rows = rows[rows.media_id == 1]
    assert len(good_rows) == 3 and good_rows.error.isna().all()
    # the truncated payload yields exactly one quarantine row —
    # decode-or-error, never partially-decoded garbage frames
    assert len(bad_rows) == 1 and bad_rows.error.notna().all()


# ------------------------------------------------------------------
# notch 14: 16x8 / 8x16 partitions x two-slice P pictures
# ------------------------------------------------------------------


@pytest.mark.parametrize("i", range(h264p._N14_CLIPS))
def test_pparts_corpus_decoder_equals_twin(i):
    pics, sps, slice_counts = decode_h264_stream_info(
        h264p.encode_pparts_annexb(i)
    )
    twin = h264p._n14_clip(i)
    # P pictures really decode through TWO slice NALs each
    assert len(pics) == 3 and slice_counts == [1, 2, 2]
    for f in range(3):
        for pi in range(3):
            assert np.array_equal(pics[f][pi], twin[f][pi]), (i, f, pi)


def test_pparts_corpus_coverage():
    shapes, shapes_row2 = set(), set()
    shortcut_fired = 0
    gating_changed = 0
    for i in range(h264p._N14_CLIPS):
        mbs_w, mbs_h = h264p._n14_geom(i)
        n_mbs = mbs_w * mbs_h
        for f in (1, 2):
            done = [False] * n_mbs
            slice_of = [-1] * n_mbs
            cur_sl, cur_mb = [0], [-1]
            st = _x_new_mvstate(
                mbs_w, mbs_h,
                lambda o: o == cur_mb[0]
                or (done[o] and slice_of[o] == cur_sl[0]),
            )
            stu = dict(st)  # ungated comparison view (same grids)
            stu["avail"] = lambda o: o == cur_mb[0] or done[o]
            for mb in range(n_mbs):
                mbx, mby = mb % mbs_w, mb // mbs_w
                cur_sl[0] = 0 if mby < 2 else 1
                cur_mb[0] = mb
                kind = h264p._n14_kind(i, f, mb, mbs_w)
                if kind == 4:
                    _x_fill4(st, 4 * mbx, 4 * mby, 4, 4, 0, 0, -1)
                elif kind == 0:
                    mv = _x_skip_part(4 * mbx, 4 * mby, st)
                    _x_fill4(
                        st, 4 * mbx, 4 * mby, 4, 4, mv[0], mv[1], 0
                    )
                else:
                    for shp, pidx, ox, oy, pw, ph in h264p._n14_parts(
                        kind
                    ):
                        bx = 4 * mbx + ox // 4
                        by = 4 * mby + oy // 4
                        pm = h264p._x_mvp_part(
                            bx, by, pw // 4, ph // 4, shp, pidx, st
                        )
                        pmu = h264p._x_mvp_part(
                            bx, by, pw // 4, ph // 4, shp, pidx, stu
                        )
                        if pm != pmu:
                            gating_changed += 1
                        if shp in ("16x8", "8x16"):
                            shapes.add((shp, pidx))
                            if mby == 2:
                                shapes_row2.add((shp, pidx))
                            a = h264p._x_nbr4(bx - 1, by, st)
                            b = h264p._x_nbr4(bx, by - 1, st)
                            c = h264p._x_nbr4(bx + pw // 4, by - 1, st)
                            if not c[3]:
                                c = h264p._x_nbr4(bx - 1, by - 1, st)
                            key = {
                                ("16x8", 0): b,
                                ("16x8", 1): a,
                                ("8x16", 0): a,
                                ("8x16", 1): c,
                            }[(shp, pidx)]
                            if key[2] == 0:
                                shortcut_fired += 1
                        mv = h264p._n14_mv(i, f, mb, pidx)
                        _x_fill4(
                            st, bx, by, pw // 4, ph // 4,
                            mv[0], mv[1], 0,
                        )
                slice_of[mb] = cur_sl[0]
                done[mb] = True
    # all four (shape, partIdx) combos occur, including in the
    # slice-gated bottom row; the directional shortcuts really fire;
    # slice gating really changes predictors vs a single-slice read
    assert shapes == {("16x8", 0), ("16x8", 1),
                      ("8x16", 0), ("8x16", 1)}
    assert shapes_row2 == shapes
    assert shortcut_fired > 50
    assert gating_changed > 20


def test_partition_sized_mc_kernels_match_twin():
    rng = np.random.RandomState(17)
    ref = rng.randint(0, 256, (48, 64), np.uint8)
    for bw, bh in ((16, 8), (8, 16)):
        for mvx, mvy in ((-9, 13), (6, -11), (121, -130), (2, 3)):
            a = np.asarray(
                _mc_luma_block(ref, 16, 8, mvx, mvy, bw, bh), np.int64
            )
            b = np.asarray(
                h264p._x_mc_luma(ref, 16, 8, bw, bh, mvx, mvy),
                np.int64,
            )
            assert np.array_equal(a, b), (bw, bh, mvx, mvy)
    cref = rng.randint(0, 256, (24, 32), np.uint8)
    for bw, bh in ((8, 4), (4, 8)):
        for mvx, mvy in ((-9, 13), (6, -11), (121, -130)):
            a = np.asarray(
                _mc_chroma_block(cref, 8, 4, mvx, mvy, bw, bh),
                np.int64,
            )
            b = np.asarray(
                h264p._x_mc_chroma(cref, 8, 4, bw, bh, mvx, mvy),
                np.int64,
            )
            assert np.array_equal(a, b), (bw, bh, mvx, mvy)


# ------------------------------------------------------------------
# notch 15: P_8x8 / P_8x8ref0 sub-macroblock partitions
# ------------------------------------------------------------------


@pytest.mark.parametrize("i", range(h264p._N15_CLIPS))
def test_p8x8_corpus_decoder_equals_twin(i):
    pics, sps, slice_counts = decode_h264_stream_info(
        h264p.encode_p8x8_annexb(i)
    )
    twin = h264p._n15_clip(i)
    assert len(pics) == 3 and slice_counts == [1, 1, 1]
    for f in range(3):
        for pi in range(3):
            assert np.array_equal(pics[f][pi], twin[f][pi]), (i, f, pi)


def test_p8x8_corpus_coverage():
    smts, sizes, phases = set(), set(), set()
    mb_types, mixed_mbs = set(), 0
    for i in range(h264p._N15_CLIPS):
        mbs_w, mbs_h = h264p._n15_geom(i)
        for f in (1, 2):
            for mb in range(mbs_w * mbs_h):
                kind = h264p._n15_kind(i, f, mb, mbs_w)
                if kind not in (1, 2):
                    continue
                mb_types.add(3 + ((i + mb) % 2))
                block_smts = {
                    h264p._n15_smt(i, f, mb, b8) for b8 in range(4)
                }
                smts |= block_smts
                if len(block_smts) > 1:
                    mixed_mbs += 1
                for ox, oy, pw, ph, mvx, mvy in h264p._n15_plan(
                    i, f, mb
                ):
                    sizes.add((pw, ph))
                    phases.add((mvx & 3, mvy & 3))
    assert smts == {0, 1, 2, 3}  # every Table 7-17 sub_mb_type
    assert sizes == {(8, 8), (8, 4), (4, 8), (4, 4)}
    assert mb_types == {3, 4}  # P_8x8 AND P_8x8ref0 both parsed
    assert mixed_mbs > 40  # shapes genuinely mix within one MB
    assert len(phases) == 16


def test_sub_partition_mvp_uses_decoded_same_mb_neighbors():
    # a 4x4 sub-partition's A neighbor is the previously decoded
    # sub-partition of the SAME 8x8; its C above-right inside the
    # not-yet-decoded right 8x8 must substitute D
    st = _x_new_mvstate(2, 2, lambda o: True)
    # above MB row fully decoded inter with distinct mvs
    _x_fill4(st, 0, 0, 8, 4, 7, 3, 0)
    # current MB (mb 2, at block row 4): left 8x8's first 4x4 decoded
    _x_fill4(st, 0, 4, 1, 1, 20, -8, 0)
    # sub-partition at (1, 4): A = (0,4) decoded same-MB block;
    # C at (2, 3)? no — C = (1+1, 4-1) = (2, 3) above MB (decoded).
    mv = h264p._x_mvp_part(1, 4, 1, 1, "8x8", 0, st)
    # A=(20,-8) B=(7,3) C=(7,3): median = (7, 3)
    assert mv == (7, 3)
    # block at (1, 5): B = (1, 4) undecoded (-2) -> unavailable;
    # C = (2, 4) undecoded -> D = (0, 4) decoded
    mv = h264p._x_mvp_part(1, 5, 1, 1, "8x8", 0, st)
    # A undecoded(-2 at (0,5)) -> unavail; B unavail; D=(20,-8)
    # exactly one matching refIdx (D as C) -> (20, -8)
    assert mv == (20, -8)


def test_corrupt_sub_mb_type_raises():
    sl = _BitWriter()
    _p_header(sl)
    sl.u(0, 1); sl.u(0, 1); sl.u(0, 1)
    sl.se(0)
    sl.ue(1)
    sl.ue(0)  # mb_skip_run
    sl.ue(3)  # P_8x8
    sl.ue(4)  # sub_mb_type out of P range (B-slice value)
    sl.rbsp_trailing()
    with pytest.raises(ValueError, match="sub_mb_type"):
        decode_h264_stream_info(_base_stream() + _nal(2, 1, sl))


# ------------------------------------------------------------------
# notch 16: multiple reference frames
# ------------------------------------------------------------------


@pytest.mark.parametrize("i", range(h264p._N16_CLIPS))
def test_multiref_corpus_decoder_equals_twin(i):
    pics, sps, slice_counts = decode_h264_stream_info(
        h264p.encode_multiref_annexb(i)
    )
    twin = h264p._n16_clip(i)
    assert len(pics) == 4 and slice_counts == [1, 1, 1, 1]
    for f in range(4):
        for pi in range(3):
            assert np.array_equal(pics[f][pi], twin[f][pi]), (i, f, pi)


def test_multiref_corpus_really_uses_the_older_reference():
    ref1 = 0
    for i in range(h264p._N16_CLIPS):
        mbs_w, mbs_h = h264p._n16_geom(i)
        for f in (2, 3):
            for mb in range(mbs_w * mbs_h):
                kind = h264p._n16_kind(i, f, mb, mbs_w)
                if kind not in (1, 2, 3):
                    continue
                mbt = (
                    h264p._n16_mbtype(i, mb) if kind == 3 else kind - 1
                )
                units = 4 if mbt == 3 else (2 if kind == 2 else 1)
                ref1 += sum(
                    h264p._n16_ref(i, f, mb, u, mbt) == 1
                    for u in range(units)
                )
    assert ref1 > 50
    # and the candidate reference pictures are genuinely distinct, so
    # a wrong-reference decode could not have matched the twin
    tw = h264p._n16_clip(3)
    assert not np.array_equal(tw[1][0], tw[2][0])


def test_mvp_exactly_one_rule_is_refidx_aware():
    # neighbors: A inter ref 1, B inter ref 0, C intra. For a
    # partition with refIdx 0 the exactly-one rule picks B; with
    # refIdx 1 it picks A; different-ref neighbors still feed the
    # median when no rule fires.
    st = [_I] * 8
    g = _grid_state(4, 2, st)
    mv4x, mv4y, ref4, avail = g
    sl = np.s_[4:8, 0:4]  # mb 4 (A of mb 5)
    mv4x[sl], mv4y[sl], ref4[sl] = 11, -7, 1
    sl = np.s_[0:4, 4:8]  # mb 1 (B of mb 5)
    mv4x[sl], mv4y[sl], ref4[sl] = -3, 9, 0
    args = (mv4x, mv4y, ref4, avail, 4)
    assert _mvp_part(4, 4, 4, 4, "16x16", 0, *args, cur_ref=0) == (-3, 9)
    assert _mvp_part(4, 4, 4, 4, "16x16", 0, *args, cur_ref=1) == (11, -7)
    # make C inter ref 0 too: with refIdx 0 TWO neighbors match ->
    # median over A=(11,-7) B=(-3,9) C=(5,2) -> (5, 2)
    sl = np.s_[0:4, 8:12]  # mb 2 (C of mb 5)
    mv4x[sl], mv4y[sl], ref4[sl] = 5, 2, 0
    assert _mvp_part(4, 4, 4, 4, "16x16", 0, *args, cur_ref=0) == (5, 2)


def test_ref_idx_out_of_range_raises():
    # three active references would make ref_idx a ue(v); craft a
    # stream claiming 3 refs with only 1 decoded -> explicit error
    sl = _BitWriter()
    _p_header(sl)
    sl.u(1, 1)  # override
    sl.ue(2)  # num_ref_idx_l0_active_minus1 = 2 -> three refs
    sl.u(0, 1)
    sl.u(0, 1)
    sl.se(0)
    sl.ue(1)
    sl.rbsp_trailing()
    with pytest.raises(ValueError, match="reference pictures"):
        decode_h264_stream_info(_base_stream() + _nal(2, 1, sl))


# ------------------------------------------------------------------
# notch 17: explicit weighted prediction
# ------------------------------------------------------------------


@pytest.mark.parametrize("i", range(h264p._N17_CLIPS))
def test_weighted_corpus_decoder_equals_twin(i):
    pics, sps, slice_counts = decode_h264_stream_info(
        h264p.encode_weighted_annexb(i)
    )
    twin = h264p._n17_clip(i)
    assert len(pics) == 3 and slice_counts == [1, 1, 1]
    for f in range(3):
        for pi in range(3):
            assert np.array_equal(pics[f][pi], twin[f][pi]), (i, f, pi)


def test_weighted_corpus_coverage():
    logys, logcs = set(), set()
    defaults = negw = bigoff = 0
    for i in range(h264p._N17_CLIPS):
        for n_ref in (1, 2):
            wt = h264p._n17_weights(i, n_ref)
            logys.add(wt["logy"])
            logcs.add(wt["logc"])
            for k in range(n_ref):
                if not wt["lflag"][k]:
                    defaults += 1
                if wt["wy"][k] < 0:
                    negw += 1
                if wt["oy"][k] >= 40:
                    bigoff += 1
                assert all(
                    -128 <= wt[key][k] <= 127
                    for key in ("oy", "wcb", "ocb", "wcr", "ocr")
                )
                if wt["lflag"][k]:
                    assert -128 <= wt["wy"][k] <= 127
    assert logys == {5, 6, 7} and logcs == {4, 5, 6}
    assert defaults > 3  # unset flags exercise the 1<<logWD default
    assert negw >= 2  # inverted-fade reference occurs
    assert bigoff >= 3  # large offsets force Clip1


def test_weighting_applies_to_skip_macroblocks():
    # clip 0 codes luma offset +40 on flagged references: some skip
    # macroblock must brighten well past any plain reference copy
    i = 0
    twin = h264p._n17_clip(i)
    mbs_w, _ = h264p._n17_geom(i)
    found = False
    for f in (1, 2):
        for mb in range(mbs_w * 2):
            if h264p._n17_kind(i, f, mb, mbs_w) == 0:
                mbx, mby = mb % mbs_w, mb // mbs_w
                cur = twin[f][0][
                    16 * mby : 16 * mby + 16, 16 * mbx : 16 * mbx + 16
                ]
                ref = twin[f - 1][0][
                    16 * mby : 16 * mby + 16, 16 * mbx : 16 * mbx + 16
                ]
                if cur.astype(int).mean() > ref.astype(int).mean() + 10:
                    found = True
    assert found


def test_weight_scaling_formula_decoder_equals_twin():
    from magmapandas_spark.operators.h264 import _apply_weight

    rng = np.random.RandomState(5)
    block = rng.randint(0, 256, (8, 8), np.int64)
    for w, o, logwd in [(64, 0, 6), (56, -10, 6), (-128, 127, 7),
                        (3, 5, 0), (120, 40, 5), (24, -8, 5)]:
        a = _apply_weight(block, w, o, logwd)
        b = np.array(
            [
                [
                    h264p._x_weight(int(block[r, c]), w, o, logwd)
                    for c in range(8)
                ]
                for r in range(8)
            ],
            np.int64,
        )
        assert np.array_equal(a, b), (w, o, logwd)


def test_out_of_range_coded_weight_raises():
    from magmapandas_spark.operators import h264p as P

    sps_nal, pps_nal, pics = P._p17_nals(0)
    base = (
        b"\x00\x00\x00\x01" + sps_nal
        + b"\x00\x00\x00\x01" + pps_nal
        + b"\x00\x00\x00\x01" + pics[0][0]  # the IDR reference
    )
    sl = _BitWriter()
    _p_header(sl)
    sl.u(1, 1); sl.ue(0)  # override to one reference
    sl.u(0, 1)  # no reordering
    sl.ue(6)  # luma_log2_weight_denom
    sl.ue(5)  # chroma_log2_weight_denom
    sl.u(1, 1)  # luma_weight_l0_flag
    sl.se(130)  # out of -128..127
    sl.rbsp_trailing()
    with pytest.raises(ValueError, match="-128..127"):
        decode_h264_stream_info(base + _nal(2, 1, sl))


def test_corrupt_inter_streams_fail_cleanly():
    """Quarantine contract over the INTER corpora: 600 deterministic
    single-byte corruptions across the P-partition, multi-reference
    and weighted-prediction streams must decode or raise ValueError /
    NotImplementedError — never an IndexError/KeyError out of the MV
    prediction grids, the DPB, the te(v) reader, or the weight
    tables."""
    rng = np.random.default_rng(43)
    streams = [
        h264p.encode_p8x8_annexb(4),
        h264p.encode_multiref_annexb(7),
        h264p.encode_weighted_annexb(3),
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
    assert n_err > 50, (n_ok, n_err)
    assert n_ok + n_err == 600


# ------------------------------------------------------------------
# notch 18: ref_pic_list_modification
# ------------------------------------------------------------------


@pytest.mark.parametrize("i", range(h264p._N18_CLIPS))
def test_reorder_corpus_decoder_equals_twin(i):
    pics, sps, slice_counts = decode_h264_stream_info(
        h264p.encode_reorder_annexb(i)
    )
    twin = h264p._n18_clip(i)
    assert len(pics) == 4 and slice_counts == [1, 1, 1, 1]
    for f in range(4):
        for pi in range(3):
            assert np.array_equal(pics[f][pi], twin[f][pi]), (i, f, pi)


def test_reorder_process_unit_cases():
    from magmapandas_spark.operators.h264 import _reorder_l0

    dpb = [(0, "p0"), (1, "p1"), (2, "p2")]
    # no modifications: descending PicNum (recency)
    assert [e[1] for e in _reorder_l0(dpb, [], 2, 3, 16)] == [
        "p2", "p1",
    ]
    # the corpus P3 chain: idc-0 to PicNum 0, then idc-1 back to 1
    assert [
        e[1] for e in _reorder_l0(dpb, [(0, 2), (1, 0)], 2, 3, 16)
    ] == ["p0", "p1"]
    # frame_num WRAP: current fn 1 with refs fn 15 (wraps to -1) and
    # fn 0 — initial order [p0, p15]; an idc-0 jump of 2 from pred 1
    # names picNum -1 = fn 15
    dpbw = [(15, "p15"), (0, "p0")]
    assert [e[1] for e in _reorder_l0(dpbw, [], 2, 1, 16)] == [
        "p0", "p15",
    ]
    assert [e[1] for e in _reorder_l0(dpbw, [(0, 1)], 2, 1, 16)] == [
        "p15", "p0",
    ]
    # naming an absent PicNum raises
    with pytest.raises(ValueError, match="absent"):
        _reorder_l0(dpb, [(0, 4)], 2, 3, 16)


def test_reorder_syntax_boundaries():
    # long-term command (idc 2) is the honest boundary
    sl = _BitWriter()
    _p_header(sl)
    sl.u(0, 1)  # no override
    sl.u(1, 1)  # ref_pic_list_modification_flag_l0
    sl.ue(2)  # modification_of_pic_nums_idc = 2 (long-term)
    sl.rbsp_trailing()
    with pytest.raises(NotImplementedError, match="long-term"):
        decode_h264_stream_info(_base_stream() + _nal(2, 1, sl))
    # a command loop that never terminates with idc 3 must error out
    sl = _BitWriter()
    _p_header(sl)
    sl.u(0, 1)
    sl.u(1, 1)
    for _ in range(40):
        sl.ue(0)
        sl.ue(0)
    sl.ue(3)
    sl.rbsp_trailing()
    with pytest.raises(ValueError, match="conformant list size"):
        decode_h264_stream_info(_base_stream() + _nal(2, 1, sl))


def test_reorder_really_changes_the_prediction():
    # decoding clip 0's P2 with the modification stripped from the
    # twin's expectation would mismatch: ref 0 is the OLDEST picture
    twin = h264p._n18_clip(0)
    assert not np.array_equal(twin[1][0], twin[0][0])
    # the two candidate references for P2 are distinct, so the
    # reordered choice is observable
    assert not np.array_equal(twin[0][0], twin[1][0])


# ------------------------------------------------------------------
# review-pass guards: slice_type range, constrained intra, sliding
# window eviction
# ------------------------------------------------------------------


def test_nonconformant_slice_type_raises():
    sl = _BitWriter()
    sl.ue(0)
    sl.ue(10)  # slice_type past the spec range 0..9
    sl.rbsp_trailing()
    with pytest.raises(ValueError, match="slice_type"):
        decode_h264_stream_info(_base_stream() + _nal(2, 1, sl))


def test_constrained_intra_pred_p_slice_raises():
    # a PPS with constrained_intra_pred_flag = 1: intra-in-P would
    # need inter neighbors masked off — honest boundary, not wrong
    # pixels
    sps = _BitWriter()
    sps.u(66, 8); sps.u(0, 8); sps.u(10, 8)
    sps.ue(0); sps.ue(0); sps.ue(0); sps.ue(0); sps.ue(1)
    sps.u(0, 1); sps.ue(2); sps.ue(1)
    sps.u(1, 1); sps.u(0, 1); sps.u(0, 1); sps.u(0, 1)
    sps.rbsp_trailing()
    pps = _BitWriter()
    pps.ue(0); pps.ue(0); pps.u(0, 1); pps.u(0, 1); pps.ue(0)
    pps.ue(0); pps.ue(0); pps.u(0, 1); pps.u(0, 2)
    pps.se(0); pps.se(0); pps.se(0)
    pps.u(0, 1)
    pps.u(1, 1)  # constrained_intra_pred_flag = 1
    pps.u(0, 1)
    pps.rbsp_trailing()
    sl = _BitWriter()
    _p_header(sl)
    sl.rbsp_trailing()
    stream = _nal(3, 7, sps) + _nal(3, 8, pps) + _nal(2, 1, sl)
    with pytest.raises(NotImplementedError, match="constrained"):
        decode_h264_stream_info(stream)


def test_sliding_window_evicts_past_max_num_ref_frames():
    # notch-13 SPS declares max_num_ref_frames = 1: after the I and
    # P1 pictures decode, only P1 remains in the DPB — a slice
    # claiming two active references must fail with ONE decoded
    # reference, proving the window really evicted the IDR picture
    full = h264p.encode_p_annexb(0)
    parts = full.split(b"\x00\x00\x00\x01")[1:]
    base = b"\x00\x00\x00\x01" + b"\x00\x00\x00\x01".join(parts[:4])
    sl = _BitWriter()
    sl.ue(0)
    sl.ue(5)
    sl.ue(0)
    sl.u(2, 4)  # frame_num
    sl.u(4, 4)  # poc
    sl.u(1, 1)  # override
    sl.ue(1)  # two active references
    sl.u(0, 1)
    sl.u(0, 1)
    sl.se(0)
    sl.ue(1)
    sl.rbsp_trailing()
    with pytest.raises(ValueError, match="only 1 decoded"):
        decode_h264_stream_info(base + _nal(2, 1, sl))


# ------------------------------------------------------------------
# property tests: randomized kernel equivalence (decoder vs twin)
# ------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    mvx=st.integers(-300, 300),
    mvy=st.integers(-300, 300),
    x0=st.integers(0, 48),
    y0=st.integers(0, 32),
    bw=st.sampled_from([4, 8, 16]),
    bh=st.sampled_from([4, 8, 16]),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_luma_mc_decoder_equals_twin(
    mvx, mvy, x0, y0, bw, bh, seed
):
    ref = np.random.RandomState(seed).randint(
        0, 256, (48, 64), np.uint8
    )
    a = np.asarray(
        _mc_luma_block(ref, x0, y0, mvx, mvy, bw, bh), np.int64
    )
    b = np.asarray(
        h264p._x_mc_luma(ref, x0, y0, bw, bh, mvx, mvy), np.int64
    )
    assert np.array_equal(a, b)


@settings(max_examples=60, deadline=None)
@given(
    mvx=st.integers(-300, 300),
    mvy=st.integers(-300, 300),
    x0=st.integers(0, 24),
    y0=st.integers(0, 16),
    bw=st.sampled_from([2, 4, 8]),
    bh=st.sampled_from([2, 4, 8]),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_chroma_mc_decoder_equals_twin(
    mvx, mvy, x0, y0, bw, bh, seed
):
    ref = np.random.RandomState(seed).randint(
        0, 256, (24, 32), np.uint8
    )
    a = np.asarray(
        _mc_chroma_block(ref, x0, y0, mvx, mvy, bw, bh), np.int64
    )
    b = np.asarray(
        h264p._x_mc_chroma(ref, x0, y0, bw, bh, mvx, mvy), np.int64
    )
    assert np.array_equal(a, b)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(-128, 127),
    o=st.integers(-128, 127),
    logwd=st.integers(0, 7),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_weight_scaling_decoder_equals_twin(w, o, logwd, seed):
    from magmapandas_spark.operators.h264 import _apply_weight

    block = np.random.RandomState(seed).randint(0, 256, (4, 4), np.int64)
    a = _apply_weight(block, w, o, logwd)
    b = np.array(
        [
            [
                h264p._x_weight(int(block[r, c]), w, o, logwd)
                for c in range(4)
            ]
            for r in range(4)
        ],
        np.int64,
    )
    assert np.array_equal(a, b)
