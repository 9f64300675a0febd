"""PNG codec tests: lossless round trips across every scanline filter
and color type, spec-conformant Paeth, CRC validation, exact oracle."""

import zlib

import duckdb
import numpy as np
import pandas as pd
import pytest

from magmapandas_spark.operators.png import (
    SQL_PNG_DECODE,
    _paeth,
    decode_pngs,
    make_synthetic_png,
    png_decode,
    png_encode,
    synthetic_png_dims,
    synthetic_png_media,
)


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_roundtrip_exact(channels, ftype):
    rng = np.random.default_rng(channels * 10 + ftype)
    px = rng.integers(0, 256, (9, 13, channels)).astype(np.uint8)
    data = png_encode(px, filter_for_row=lambda r: ftype)
    w, h, out = png_decode(data)
    assert (w, h) == (13, 9)
    assert np.array_equal(out, px)


def test_mixed_filters_roundtrip():
    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, (25, 17, 3)).astype(np.uint8)
    data = png_encode(px, filter_for_row=lambda r: r % 5)
    _, _, out = png_decode(data)
    assert np.array_equal(out, px)


def test_paeth_predictor_spec_tiebreaks():
    # a wins ties with b; b wins ties with c (RFC 2083 §6.6)
    assert _paeth(10, 10, 10) == 10
    assert _paeth(0, 0, 0) == 0
    assert _paeth(5, 9, 7) == 7   # p=7: pa=2, pb=2, pc=0 -> c
    assert _paeth(3, 5, 10) == 3  # p=-2: pa=5, pb=7, pc=12 -> a
    assert _paeth(1, 2, 0) == 2   # p=3: pa=2, pb=1, pc=3 -> b
    # direct spec transcription cross-check
    def spec(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c
    rng = np.random.default_rng(0)
    for _ in range(500):
        a, b, c = rng.integers(0, 256, 3)
        assert _paeth(int(a), int(b), int(c)) == spec(int(a), int(b), int(c))


def test_synthetic_formula_and_oracle():
    rows = []
    for i in range(40):
        w0, h0 = synthetic_png_dims(i)
        w, h, px = png_decode(make_synthetic_png(i))
        assert (w, h) == (w0, h0)
        j = np.arange(w * h * 3, dtype=np.int64)
        exp = ((i * 7 + j * j) % 256).astype(np.uint8).reshape(h, w, 3)
        assert np.array_equal(px, exp)
        s = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
        rows.append((i, w, h, w * h, int(s[0]), int(s[1]), int(s[2])))
    got = pd.DataFrame(
        rows,
        columns=["media_id", "width", "height", "n_px", "sum_r", "sum_g",
                 "sum_b"],
    )
    exp = duckdb.sql(SQL_PNG_DECODE).df()
    for c in got.columns:
        exp[c] = exp[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, exp)


def test_crc_corruption_rejected():
    data = bytearray(make_synthetic_png(3))
    data[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(data))


def test_bad_signature_rejected():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"NOTAPNG!" + b"\x00" * 32)


def test_truncated_stream_rejected():
    # valid chunks but IDAT shorter than height*(stride+1)
    import struct

    from magmapandas_spark.operators.png import _SIG, _chunk

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    short = zlib.compress(b"\x00" * 10)  # needs 4*(12+1)=52 bytes
    data = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", short) + _chunk(
        b"IEND", b"")
    with pytest.raises(ValueError, match="size mismatch"):
        png_decode(data)


def test_decode_pngs_spark(spark):
    out = decode_pngs(synthetic_png_media(spark, 12)).orderBy(
        "media_id").toPandas()
    assert len(out) == 12
    for i in range(12):
        w, h = synthetic_png_dims(i)
        assert out.loc[i, "width"] == w
        assert out.loc[i, "n_px"] == w * h


def test_extract_features_png_decoder(spark):
    from pyspark.sql import functions as F

    from magmapandas_spark.operators.multimodal import extract_features

    media = synthetic_png_media(spark, 5).withColumn("kind", F.lit("image"))
    feats = extract_features(media, decoder="png").toPandas()
    assert len(feats) == 5
    for f in feats["feature"]:
        v = np.array(f)
        assert v.shape == (16,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_decode_pngs_grayscale_and_rgba_channels(spark):
    """Advice fix: sums must key off the decoded raster's channel
    count — grayscale replicates into r=g=b, RGBA drops alpha."""
    import pandas as pd

    from magmapandas_spark.operators.png import MEDIA_PNG_SCHEMA

    gray = np.arange(48, dtype=np.uint8).reshape(6, 8)  # sum 1128
    rgba = np.arange(36, dtype=np.uint8).reshape(3, 3, 4)
    rows = [(0, png_encode(gray)), (1, png_encode(rgba))]
    media = spark.createDataFrame(rows, MEDIA_PNG_SCHEMA)
    out = (
        decode_pngs(media).orderBy("media_id").toPandas().set_index("media_id")
    )
    g = int(gray.astype(np.int64).sum())
    assert (out.loc[0, ["sum_r", "sum_g", "sum_b"]] == [g, g, g]).all()
    ch = rgba.reshape(-1, 4).astype(np.int64).sum(axis=0)
    assert (
        out.loc[1, ["sum_r", "sum_g", "sum_b"]]
        == [int(ch[0]), int(ch[1]), int(ch[2])]
    ).all()
    assert out.loc[1, "sum_r"] == 144  # the advice's reproduced case
