"""Notch 13 — P-slice inter prediction: decoder-vs-twin bit
equality over the corpus, kernel equivalence on randomized motion,
MV-prediction/skip rule cases, corpus coverage pins, and the honest
boundaries (B slices, P partitions, weighted / multi-reference
prediction)."""

import numpy as np
import pytest

from magmapandas_spark.operators import h264, h264p
from magmapandas_spark.operators.h264 import (
    _CBP_INTER,
    _CBP_INTRA,
    _mc_chroma_block,
    _mc_luma_block,
    _mvp_16x16,
    _skip_mv_16x16,
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
    _x_mc_chroma8,
    _x_mc_luma16,
    _x_mvp,
    _x_skip_mv,
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
                _x_mc_luma16(ref, x0, y0, mvx, mvy), np.int64
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
                    _x_mc_chroma8(ref, x0, y0, mvx, mvy), np.int64
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


def _state(mbs, mvs, refs, done):
    mvxa = np.array([m[0] for m in mvs], np.int32)
    mvya = np.array([m[1] for m in mvs], np.int32)
    refa = np.array(refs, np.int32)
    return mvxa, mvya, refa, (lambda n: done[n])


def test_mvp_b_and_c_unavailable_takes_a():
    # 1x? row: mb 1 with only A decoded (row 0 of a 4-wide picture)
    mvxa, mvya, refa, avail = _state(
        4, [(12, -8), (0, 0), (0, 0), (0, 0)],
        [0, -1, -1, -1], [True, False, False, False],
    )
    assert _mvp_16x16(1, 4, mvxa, mvya, refa, avail) == (12, -8)
    assert _x_mvp(1, 4, list(mvxa), list(mvya), list(refa),
                  [True, False, False, False]) == (12, -8)


def test_mvp_exactly_one_matching_ref_takes_it():
    # 4-wide, mb 5 (middle): A intra, B inter, C inter-intra mix
    done = [True] * 8
    mvxa, mvya, refa, avail = _state(
        8,
        [(0, 0)] * 4 + [(0, 0), (0, 0), (0, 0), (0, 0)],
        [-1] * 8, done,
    )
    mvxa[1], mvya[1], refa[1] = 20, 4, 0  # B = mb 1
    # A (mb 4) intra, C (mb 2) intra -> exactly one inter ref: B
    assert _mvp_16x16(5, 4, mvxa, mvya, refa, avail) == (20, 4)


def test_mvp_median_of_three_inter_neighbors():
    done = [True] * 8
    mvxa, mvya, refa, avail = _state(8, [(0, 0)] * 8, [-1] * 8, done)
    for n, (mx, my) in zip((4, 1, 2), [(10, -2), (30, 6), (20, 50)]):
        mvxa[n], mvya[n], refa[n] = mx, my, 0
    # A=(10,-2) B=(30,6) C=(20,50) -> median (20, 6)
    assert _mvp_16x16(5, 4, mvxa, mvya, refa, avail) == (20, 6)


def test_mvp_c_unavailable_substitutes_d():
    done = [True] * 8
    mvxa, mvya, refa, avail = _state(8, [(0, 0)] * 8, [-1] * 8, done)
    # mb 7 (last col of row 1, 4-wide): C out of picture -> D (mb 2)
    for n, (mx, my) in zip((6, 3, 2), [(8, 8), (16, 16), (24, 24)]):
        mvxa[n], mvya[n], refa[n] = mx, my, 0
    assert _mvp_16x16(7, 4, mvxa, mvya, refa, avail) == (16, 16)


def test_skip_mv_zero_when_top_missing_or_zero_neighbor():
    done = [True] * 8
    mvxa, mvya, refa, avail = _state(8, [(0, 0)] * 8, [-1] * 8, done)
    # top row: no B neighbor -> zero
    assert _skip_mv_16x16(1, 4, mvxa, mvya, refa, avail) == (0, 0)
    # interior with a zero-mv ref-0 left neighbor -> zero
    for n, (mx, my) in zip((4, 1, 2), [(0, 0), (12, 4), (6, 2)]):
        mvxa[n], mvya[n], refa[n] = mx, my, 0
    assert _skip_mv_16x16(5, 4, mvxa, mvya, refa, avail) == (0, 0)
    # non-zero neighbors -> the median predictor over
    # A=(10,-2) B=(12,4) C=(6,2): (10, 2)
    mvxa[4], mvya[4] = 10, -2
    assert _skip_mv_16x16(5, 4, mvxa, mvya, refa, avail) == (10, 2)


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
            mvxa = [0] * n_mbs
            mvya = [0] * n_mbs
            refa = [-1] * n_mbs
            done = [False] * n_mbs
            for mb in range(n_mbs):
                k = _n13_kind(i, f, mb, mbs_w)
                mbx, mby = mb % mbs_w, mb // mbs_w
                if k == 3:
                    pm, cm, cc = _n13_intra(i, f, mb)
                    pms.add(pm)
                    cms.add(cm)
                    ccs.add(cc)
                    done[mb] = True
                    continue
                if k == 0:
                    mv = _x_skip_mv(mb, mbs_w, mvxa, mvya, refa, done)
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
                mvxa[mb], mvya[mb], refa[mb] = mv[0], mv[1], 0
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


def test_p_partition_types_raise():
    sl = _BitWriter()
    _p_header(sl)
    sl.u(0, 1)  # no override
    sl.u(0, 1)  # no reordering
    sl.u(0, 1)  # no adaptive marking
    sl.se(0)  # qp delta
    sl.ue(0)  # mb_skip_run = 0
    sl.ue(1)  # mb_type P_L0_L0_16x8
    sl.rbsp_trailing()
    with pytest.raises(NotImplementedError, match="16x8"):
        decode_h264_stream_info(_base_stream() + _nal(2, 1, sl))


def test_multi_reference_override_raises():
    sl = _BitWriter()
    _p_header(sl)
    sl.u(1, 1)  # num_ref_idx_active_override_flag
    sl.ue(1)  # num_ref_idx_l0_active_minus1 = 1 -> two refs
    sl.rbsp_trailing()
    with pytest.raises(NotImplementedError, match="reference"):
        decode_h264_stream_info(_base_stream() + _nal(2, 1, sl))


def test_ref_list_modification_raises():
    sl = _BitWriter()
    _p_header(sl)
    sl.u(0, 1)
    sl.u(1, 1)  # ref_pic_list_modification_flag_l0
    sl.rbsp_trailing()
    with pytest.raises(NotImplementedError, match="modification"):
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
    with pytest.raises(ValueError, match="no prior decoded picture"):
        decode_h264_stream_info(stream)


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
    with pytest.raises(ValueError, match="no prior decoded picture"):
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


def test_weighted_pred_pps_raises_for_p():
    sps = _BitWriter()
    sps.u(66, 8); sps.u(0, 8); sps.u(10, 8)
    sps.ue(0); sps.ue(0); sps.ue(0); sps.ue(0); sps.ue(1)
    sps.u(0, 1); sps.ue(2); sps.ue(1)
    sps.u(1, 1); sps.u(0, 1); sps.u(0, 1); sps.u(0, 1)
    sps.rbsp_trailing()
    pps = _BitWriter()
    pps.ue(0); pps.ue(0); pps.u(0, 1); pps.u(0, 1); pps.ue(0)
    pps.ue(0); pps.ue(0)
    pps.u(1, 1)  # weighted_pred_flag = 1
    pps.u(0, 2)
    pps.se(0); pps.se(0); pps.se(0)
    pps.u(0, 1); pps.u(0, 1); pps.u(0, 1)
    pps.rbsp_trailing()
    sl = _BitWriter()
    _p_header(sl)
    sl.rbsp_trailing()
    stream = _nal(3, 7, sps) + _nal(3, 8, pps) + _nal(2, 1, sl)
    with pytest.raises(NotImplementedError, match="weighted"):
        decode_h264_stream_info(stream)

