"""H.264/AVC Annex-B I-frame decode — first notch of the video-codec
boundary (round 8; see PLANS §22).

The reference video path stops at container parsing + MJPEG
(operators/mp4.py); inter-frame codecs were the honest stub. This
module starts the from-scratch H.264 baseline ladder with the pieces
every later notch reuses, all real:

- Annex-B byte-stream framing (start-code scan, 3- and 4-byte codes),
- emulation-prevention removal (EBSP → RBSP, the 00 00 03 escape),
- Exp-Golomb bitstream reader (ue(v)/se(v)) and bit-level writer,
- SPS/PPS parsing (profile/level, frame dimensions in macroblocks,
  frame_num bit-width, entropy mode, QP offsets),
- IDR slice-header parsing (slice_type, frame_num, dec_ref_pic
  marking),
- the macroblock loop with **I_PCM reconstruction** (mb_type 25 in
  I slices: byte-aligned raw 4:2:0 samples — the one macroblock class
  whose reconstruction needs no prediction or transform, so the
  decoded pixels are exactly checkable under the gate hash).

CAVLC residual macroblocks (intra prediction + IDCT) remain the
honest ``NotImplementedError`` — that is the NEXT notch, and the
boundary is now a parsed-bitstream boundary, not a container one.

Scale posture: identical to every codec in this engine — one narrow
Arrow ``mapInPandas`` stage per payload; bytes never leave the
executor; output is a fixed handful of integer statistics per frame.

Cross-engine checkability: the synthetic fixture's PCM samples are
closed-form functions of (media_id, plane, write-index), so the
DuckDB oracle recomputes the expected plane sums AND an
order-sensitive checksum (Σ (k+1)·sample mod 1e9+7) without decoding
— hash equality proves the decoder recovered every byte in the right
spatial position, through real NAL/SPS/PPS/slice/MB parsing with
emulation-prevention escapes exercised (sample value 0 runs occur).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "encode_ipcm_annexb",
    "decode_h264_iframe",
    "synthetic_h264_media",
    "h264_frame_stats",
    "q_h264_ipcm_decode",
    "SQL_H264_IPCM_DECODE",
]

_CK_MOD = 1_000_000_007


# ---------------------------------------------------------------------
# bit-level I/O
# ---------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self._bits: list[int] = []

    def u(self, val: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self._bits.append((val >> i) & 1)

    def ue(self, v: int) -> None:
        code = v + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def align_zero(self) -> None:
        while len(self._bits) % 8:
            self._bits.append(0)

    def raw_bytes(self, data: bytes) -> None:
        assert len(self._bits) % 8 == 0, "raw bytes must be byte-aligned"
        for b in data:
            self.u(b, 8)

    def rbsp_trailing(self) -> None:
        self._bits.append(1)
        self.align_zero()

    def tobytes(self) -> bytes:
        assert len(self._bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self._bits), 8):
            byte = 0
            for b in self._bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
        return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._d = data
        self._pos = 0  # bit position

    def u(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte = self._d[self._pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self._pos & 7))) & 1)
            self._pos += 1
        return out

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("malformed Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def byte_align(self) -> None:
        while self._pos & 7:
            if self.u(1) != 0:
                raise ValueError("nonzero pcm_alignment bit")

    def raw_bytes(self, n: int) -> bytes:
        assert (self._pos & 7) == 0
        start = self._pos >> 3
        self._pos += 8 * n
        out = self._d[start : start + n]
        if len(out) != n:
            raise ValueError("truncated PCM payload")
        return out


# ---------------------------------------------------------------------
# EBSP escapes + Annex-B framing
# ---------------------------------------------------------------------


def _escape_ebsp(rbsp: bytes) -> bytes:
    """Insert emulation-prevention 0x03 after any 00 00 preceding a
    byte <= 0x03 (spec 7.4.1.1)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _unescape_ebsp(ebsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(ebsp):
        b = ebsp[i]
        if zeros >= 2 and b == 3:
            zeros = 0
            i += 1
            continue  # drop the escape byte
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def _split_annexb(data: bytes) -> list[bytes]:
    """NAL units between 00 00 01 / 00 00 00 01 start codes."""
    nals = []
    i = 0
    n = len(data)
    start = None
    while i + 2 < n:
        if data[i] == 0 and data[i + 1] == 0 and data[i + 2] == 1:
            if start is not None:
                end = i
                while end > start and data[end - 1] == 0:
                    end -= 1
                nals.append(data[start:end])
            i += 3
            start = i
        else:
            i += 1
    if start is not None:
        nals.append(data[start:])
    if not nals:
        raise ValueError("no Annex-B start codes found")
    return nals


# ---------------------------------------------------------------------
# fixture encoder (real conformant bytes for the I_PCM subset)
# ---------------------------------------------------------------------


def encode_ipcm_annexb(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray
) -> bytes:
    """Annex-B H.264 baseline stream: SPS + PPS + one IDR slice whose
    macroblocks are all I_PCM (4:2:0, 8-bit). ``y`` is (H, W) with
    W, H multiples of 16; ``cb``/``cr`` are (H/2, W/2)."""
    h, w = y.shape
    if w % 16 or h % 16:
        raise ValueError("I_PCM fixture needs multiple-of-16 dims")
    mbs_w, mbs_h = w // 16, h // 16

    sps = _BitWriter()
    sps.u(66, 8)  # profile_idc: baseline
    sps.u(0, 8)  # constraint flags + reserved
    sps.u(10, 8)  # level_idc
    sps.ue(0)  # seq_parameter_set_id
    sps.ue(0)  # log2_max_frame_num_minus4
    sps.ue(0)  # pic_order_cnt_type
    sps.ue(0)  # log2_max_pic_order_cnt_lsb_minus4
    sps.ue(0)  # max_num_ref_frames
    sps.u(0, 1)  # gaps_in_frame_num_value_allowed_flag
    sps.ue(mbs_w - 1)  # pic_width_in_mbs_minus1
    sps.ue(mbs_h - 1)  # pic_height_in_map_units_minus1
    sps.u(1, 1)  # frame_mbs_only_flag
    sps.u(0, 1)  # direct_8x8_inference_flag
    sps.u(0, 1)  # frame_cropping_flag
    sps.u(0, 1)  # vui_parameters_present_flag
    sps.rbsp_trailing()

    pps = _BitWriter()
    pps.ue(0)  # pic_parameter_set_id
    pps.ue(0)  # seq_parameter_set_id
    pps.u(0, 1)  # entropy_coding_mode_flag: CAVLC
    pps.u(0, 1)  # bottom_field_pic_order_in_frame_present_flag
    pps.ue(0)  # num_slice_groups_minus1
    pps.ue(0)  # num_ref_idx_l0_default_active_minus1
    pps.ue(0)  # num_ref_idx_l1_default_active_minus1
    pps.u(0, 1)  # weighted_pred_flag
    pps.u(0, 2)  # weighted_bipred_idc
    pps.se(0)  # pic_init_qp_minus26
    pps.se(0)  # pic_init_qs_minus26
    pps.se(0)  # chroma_qp_index_offset
    pps.u(0, 1)  # deblocking_filter_control_present_flag
    pps.u(0, 1)  # constrained_intra_pred_flag
    pps.u(0, 1)  # redundant_pic_cnt_present_flag
    pps.rbsp_trailing()

    sl = _BitWriter()
    sl.ue(0)  # first_mb_in_slice
    sl.ue(7)  # slice_type: I (all slices in picture)
    sl.ue(0)  # pic_parameter_set_id
    sl.u(0, 4)  # frame_num (log2_max_frame_num = 4)
    sl.ue(0)  # idr_pic_id
    sl.u(0, 4)  # pic_order_cnt_lsb
    sl.u(0, 1)  # no_output_of_prior_pics_flag
    sl.u(0, 1)  # long_term_reference_flag
    sl.se(0)  # slice_qp_delta
    for mby in range(mbs_h):
        for mbx in range(mbs_w):
            sl.ue(25)  # mb_type: I_PCM
            sl.align_zero()  # pcm_alignment_zero_bit
            yb = y[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16]
            cbb = cb[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8]
            crb = cr[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8]
            sl.raw_bytes(yb.astype(np.uint8).tobytes())
            sl.raw_bytes(cbb.astype(np.uint8).tobytes())
            sl.raw_bytes(crb.astype(np.uint8).tobytes())
    sl.rbsp_trailing()

    def nal(ref_idc: int, nal_type: int, w_: _BitWriter) -> bytes:
        header = bytes([(ref_idc << 5) | nal_type])
        return b"\x00\x00\x00\x01" + header + _escape_ebsp(w_.tobytes())

    return nal(3, 7, sps) + nal(3, 8, pps) + nal(3, 5, sl)


# ---------------------------------------------------------------------
# decoder (I_PCM subset of baseline; CAVLC residual MBs raise)
# ---------------------------------------------------------------------


def _parse_sps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    profile_idc = r.u(8)
    r.u(8)  # constraint flags + reserved
    level_idc = r.u(8)
    r.ue()  # seq_parameter_set_id
    if profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        raise NotImplementedError(
            f"high-profile SPS (profile_idc {profile_idc}) not supported"
        )
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    if poc_type == 0:
        log2_max_poc_lsb = r.ue() + 4
    elif poc_type == 1:
        raise NotImplementedError("pic_order_cnt_type 1 not supported")
    else:
        log2_max_poc_lsb = 0
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    mbs_w = r.ue() + 1
    mbs_h = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        raise NotImplementedError("interlaced streams not supported")
    r.u(1)  # direct_8x8_inference_flag
    if r.u(1):  # frame_cropping_flag
        raise NotImplementedError("frame cropping not supported")
    r.u(1)  # vui_parameters_present_flag (ignored)
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "mbs_w": mbs_w,
        "mbs_h": mbs_h,
        "log2_max_frame_num": log2_max_frame_num,
        "poc_type": poc_type,
        "log2_max_poc_lsb": log2_max_poc_lsb,
    }


def _parse_pps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    pps_id = r.ue()
    sps_id = r.ue()
    entropy_cabac = r.u(1)
    if entropy_cabac:
        raise NotImplementedError("CABAC entropy coding not supported")
    r.u(1)  # bottom_field_pic_order_in_frame_present_flag
    if r.ue() != 0:  # num_slice_groups_minus1
        raise NotImplementedError("slice groups (FMO) not supported")
    r.ue()  # num_ref_idx_l0_default_active_minus1
    r.ue()  # num_ref_idx_l1_default_active_minus1
    r.u(1)  # weighted_pred_flag
    r.u(2)  # weighted_bipred_idc
    init_qp = r.se() + 26
    r.se()  # pic_init_qs_minus26
    r.se()  # chroma_qp_index_offset
    r.u(1)  # deblocking_filter_control_present_flag
    r.u(1)  # constrained_intra_pred_flag
    r.u(1)  # redundant_pic_cnt_present_flag
    return {"pps_id": pps_id, "sps_id": sps_id, "init_qp": init_qp}


def decode_h264_iframe(
    data: bytes,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, dict]:
    """Decode one Annex-B IDR picture whose macroblocks are all I_PCM.
    Returns (Y, Cb, Cr, sps) planes as uint8 arrays.

    Any CAVLC-coded macroblock (mb_type != 25) raises
    ``NotImplementedError`` — intra prediction + IDCT are the next
    notch of the codec ladder, and the parse boundary is explicit."""
    sps = pps = None
    y = cb = cr = None
    for nal_bytes in _split_annexb(data):
        nal_type = nal_bytes[0] & 0x1F
        rbsp = _unescape_ebsp(nal_bytes[1:])
        if nal_type == 7:
            sps = _parse_sps(rbsp)
        elif nal_type == 8:
            pps = _parse_pps(rbsp)
        elif nal_type in (1, 5):
            if sps is None or pps is None:
                raise ValueError("slice before SPS/PPS")
            r = _BitReader(rbsp)
            first_mb = r.ue()
            slice_type = r.ue()
            if slice_type % 5 != 2:  # not an I slice
                raise NotImplementedError(
                    "P/B slices need inter prediction — not supported"
                )
            r.ue()  # pic_parameter_set_id
            r.u(sps["log2_max_frame_num"])  # frame_num
            if nal_type == 5:
                r.ue()  # idr_pic_id
            if sps["poc_type"] == 0:
                r.u(sps["log2_max_poc_lsb"])  # pic_order_cnt_lsb
            if (nal_bytes[0] >> 5) & 3:  # nal_ref_idc != 0
                if nal_type == 5:
                    r.u(1)  # no_output_of_prior_pics_flag
                    r.u(1)  # long_term_reference_flag
                else:
                    if r.u(1):  # adaptive_ref_pic_marking_mode_flag
                        raise NotImplementedError(
                            "adaptive ref-pic marking not supported"
                        )
            r.se()  # slice_qp_delta
            mbs_w, mbs_h = sps["mbs_w"], sps["mbs_h"]
            w, h = mbs_w * 16, mbs_h * 16
            y = np.zeros((h, w), np.uint8)
            cb = np.zeros((h // 2, w // 2), np.uint8)
            cr = np.zeros((h // 2, w // 2), np.uint8)
            for mb in range(first_mb, mbs_w * mbs_h):
                mb_type = r.ue()
                if mb_type != 25:
                    raise NotImplementedError(
                        f"mb_type {mb_type}: CAVLC residual macroblocks "
                        "(intra prediction + IDCT) are the next codec "
                        "notch — only I_PCM decodes"
                    )
                r.byte_align()
                mbx, mby = mb % mbs_w, mb // mbs_w
                yb = np.frombuffer(r.raw_bytes(256), np.uint8)
                cbb = np.frombuffer(r.raw_bytes(64), np.uint8)
                crb = np.frombuffer(r.raw_bytes(64), np.uint8)
                y[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16] = (
                    yb.reshape(16, 16)
                )
                cb[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8] = (
                    cbb.reshape(8, 8)
                )
                cr[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8] = (
                    crb.reshape(8, 8)
                )
            if r.u(1) != 1:
                raise ValueError("missing rbsp stop bit after slice data")
    if y is None:
        raise ValueError("no slice NAL in stream")
    return y, cb, cr, sps


# ---------------------------------------------------------------------
# synthetic fixture + gate query
# ---------------------------------------------------------------------

_N_CLIPS = 24


def _fixture_planes(i: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic 4:2:0 planes for media ``i`` — each plane's
    samples are a linear-congruential function of the MB-write index,
    so the oracle recomputes sums/checksums without decoding. Values
    hit 0 often enough (mod-256 cycles) that emulation-prevention
    escapes are genuinely exercised in the encoded stream."""
    w = 16 * (1 + i % 3)
    h = 16 * (1 + i % 2)
    mbs_w = w // 16
    y = np.zeros((h, w), np.uint8)
    cb = np.zeros((h // 2, w // 2), np.uint8)
    cr = np.zeros((h // 2, w // 2), np.uint8)
    ky = kc = 0
    for mb in range((w // 16) * (h // 16)):
        mbx, mby = mb % mbs_w, mb // mbs_w
        for r_ in range(16):
            for c_ in range(16):
                # 4-sample runs (k div 4) so a zero value yields
                # 00 00 00 00 in the payload — emulation-prevention
                # escapes are genuinely exercised
                y[mby * 16 + r_, mbx * 16 + c_] = (
                    7 * i + 13 * (ky // 4)
                ) % 256
                ky += 1
        for r_ in range(8):
            for c_ in range(8):
                cb[mby * 8 + r_, mbx * 8 + c_] = (11 * i + 17 * kc) % 256
                cr[mby * 8 + r_, mbx * 8 + c_] = (19 * i + 23 * kc) % 256
                kc += 1
    return y, cb, cr


def synthetic_h264_media(spark: SparkSession, n: int = _N_CLIPS) -> DataFrame:
    """(media_id, payload) — real Annex-B H.264 I_PCM streams."""
    rows = []
    for i in range(n):
        y, cb, cr = _fixture_planes(i)
        rows.append((i, bytearray(encode_ipcm_annexb(y, cb, cr))))
    return spark.createDataFrame(rows, "media_id long, payload binary")


_H264_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_mbs", T.LongType()),
        T.StructField("sum_y", T.LongType()),
        T.StructField("sum_cb", T.LongType()),
        T.StructField("sum_cr", T.LongType()),
        T.StructField("ck_y", T.LongType()),
    ]
)


def h264_frame_stats(media: DataFrame) -> DataFrame:
    """Decode each payload's I-frame and emit exact integer plane
    statistics + the order-sensitive MB-write-order luma checksum."""

    def fn(batches):
        for pdf in batches:
            out = {f.name: [] for f in _H264_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                y, cb, cr, sps = decode_h264_iframe(bytes(payload))
                h, w = y.shape
                mbs_w = sps["mbs_w"]
                ck = 0
                ky = 0
                for mb in range(mbs_w * sps["mbs_h"]):
                    mbx, mby = mb % mbs_w, mb // mbs_w
                    blk = y[
                        mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16
                    ].reshape(-1).astype(np.int64)
                    ks = np.arange(ky + 1, ky + 257, dtype=np.int64)
                    ck = (ck + int((ks * blk).sum())) % _CK_MOD
                    ky += 256
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_mbs"].append(mbs_w * sps["mbs_h"])
                out["sum_y"].append(int(y.sum()))
                out["sum_cb"].append(int(cb.sum()))
                out["sum_cr"].append(int(cr.sum()))
                out["ck_y"].append(ck)
            yield pd.DataFrame(out)

    return media.mapInPandas(fn, _H264_SCHEMA)


def q_h264_ipcm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: decode 24 real Annex-B H.264 I_PCM streams (NAL
    framing, emulation-prevention unescape, Exp-Golomb SPS/PPS/slice
    parse, macroblock reconstruction) — plane sums and the
    MB-write-order checksum under the cross-engine hash."""
    from magmapandas_spark.operators.multimodal import tiny_sorted

    return tiny_sorted(
        h264_frame_stats(synthetic_h264_media(spark)), "media_id"
    )


# The oracle recomputes the fixture's closed-form statistics: luma
# sample k (MB write order) of media i is (7i + 13·(k div 4)) % 256,
# chroma analogously — so sums and the order-sensitive checksum need
# only integer arithmetic over UNNEST(range(n)).
SQL_H264_IPCM_DECODE = f"""
WITH clip AS (
  SELECT i AS media_id,
         16 * (1 + i % 3) AS width,
         16 * (1 + i % 2) AS height
  FROM range({_N_CLIPS}) t(i)
),
luma AS (
  SELECT media_id,
         SUM((7 * media_id + 13 * (k.k // 4)) % 256) AS sum_y,
         SUM((k.k + 1) * ((7 * media_id + 13 * (k.k // 4)) % 256))
           % {_CK_MOD} AS ck_y
  FROM clip, LATERAL (
    SELECT UNNEST(range(width * height)) AS k) k
  GROUP BY media_id
),
chroma AS (
  SELECT media_id,
         SUM((11 * media_id + 17 * k.k) % 256) AS sum_cb,
         SUM((19 * media_id + 23 * k.k) % 256) AS sum_cr
  FROM clip, LATERAL (
    SELECT UNNEST(range(width * height // 4)) AS k) k
  GROUP BY media_id
)
SELECT c.media_id,
       CAST(c.width AS INT) AS width,
       CAST(c.height AS INT) AS height,
       CAST(c.width * c.height // 256 AS BIGINT) AS n_mbs,
       CAST(l.sum_y AS BIGINT) AS sum_y,
       CAST(ch.sum_cb AS BIGINT) AS sum_cb,
       CAST(ch.sum_cr AS BIGINT) AS sum_cr,
       CAST(l.ck_y AS BIGINT) AS ck_y
FROM clip c
JOIN luma l ON l.media_id = c.media_id
JOIN chroma ch ON ch.media_id = c.media_id
ORDER BY c.media_id
"""
