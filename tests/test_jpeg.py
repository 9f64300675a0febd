"""Pure-numpy baseline JPEG codec tests.

The entropy layer (Huffman/DPCM/zigzag/byte-stuffing) is lossless, so
encode-from-coefficients → decode-coefficients must be bit-exact; the
float IDCT stage is checked against an independent naive cosine-sum
IDCT, and the full pixel path via DC-only flat blocks (analytically
exact) and an encode→decode PSNR round trip.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from magmapandas_spark.operators.jpeg import (
    SQL_JPEG_DECODE,
    ZIGZAG,
    _coef_formula,
    decode_jpegs,
    dct_2d,
    idct_2d,
    jpeg_decode,
    jpeg_decode_coeffs,
    jpeg_encode_from_coeffs,
    jpeg_encode_rgb,
    make_synthetic_jpeg,
    synthetic_jpeg_dims,
    synthetic_jpeg_media,
    QUANT_LUMA,
    QUANT_CHROMA,
)


@pytest.mark.parametrize("i", range(8))
def test_entropy_roundtrip_exact(i):
    data = make_synthetic_jpeg(i)
    img = jpeg_decode_coeffs(data)
    w, h, samp = synthetic_jpeg_dims(i)
    assert (img.width, img.height, img.sampling) == (w, h, samp)
    nb_y = (w // 8) * (h // 8)
    nb_c = nb_y if samp == "444" else (w // 16) * (h // 16)
    for c, nb in ((0, nb_y), (1, nb_c), (2, nb_c)):
        got = img.coeffs[c]
        assert got.shape == (nb, 8, 8)
        b = np.repeat(np.arange(nb), 64)
        k = np.tile(np.arange(64), nb)
        zz = _coef_formula(i, c, b, k).reshape(nb, 64)
        nat = np.zeros((nb, 64), dtype=np.int64)
        nat[:, ZIGZAG] = zz
        assert np.array_equal(got.reshape(nb, 64), nat)


def test_random_coeff_roundtrip_with_long_runs():
    """Random sparse blocks exercise ZRL (runs >15) and EOB paths."""
    rng = np.random.default_rng(11)
    nb = 6
    comps = []
    for _ in range(3):
        blocks = np.zeros((nb, 64), dtype=np.int64)
        for bi in range(nb):
            nz = rng.integers(0, 8)
            pos = rng.choice(np.arange(1, 64), size=nz, replace=False)
            blocks[bi, pos] = rng.integers(-40, 41, size=nz)
            blocks[bi, 0] = rng.integers(-200, 201)
        nat = np.zeros((nb, 64), dtype=np.int64)
        nat[:, ZIGZAG] = blocks
        comps.append(nat.reshape(nb, 8, 8))
    data = jpeg_encode_from_coeffs(comps, 48, 8, "444")
    img = jpeg_decode_coeffs(data)
    for c in range(3):
        assert np.array_equal(img.coeffs[c], comps[c])


def _naive_idct(F):
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    au = 1 / np.sqrt(2) if u == 0 else 1.0
                    av = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        au * av / 4 * F[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s
    return out


def test_idct_matches_naive_cosine_sum():
    rng = np.random.default_rng(3)
    for _ in range(4):
        blk = rng.integers(-500, 500, (8, 8)).astype(float)
        np.testing.assert_allclose(idct_2d(blk), _naive_idct(blk),
                                   atol=1e-9)
        # and DCT is its inverse
        np.testing.assert_allclose(dct_2d(idct_2d(blk)), blk, atol=1e-9)


def test_dc_only_blocks_decode_to_flat_pixels():
    """DC-only blocks IDCT to a flat value dc*q/8 + 128 exactly."""
    nb = 4
    dc_y, dc_c = 16, -8
    comps = []
    for c, dc in ((0, dc_y), (1, dc_c), (2, dc_c)):
        blocks = np.zeros((nb, 8, 8), dtype=np.int64)
        blocks[:, 0, 0] = dc
        comps.append(blocks)
    data = jpeg_encode_from_coeffs(comps, 32, 8, "444")
    w, h, rgb = jpeg_decode(data)
    assert (w, h) == (32, 8)
    y = dc_y * int(QUANT_LUMA[0, 0]) / 8.0 + 128.0
    cb = cr = dc_c * int(QUANT_CHROMA[0, 0]) / 8.0 + 128.0
    exp_r = np.clip(round(y + 1.402 * (cr - 128.0)), 0, 255)
    exp_g = np.clip(
        round(y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)),
        0, 255)
    exp_b = np.clip(round(y + 1.772 * (cb - 128.0)), 0, 255)
    assert (rgb[..., 0] == exp_r).all()
    assert (rgb[..., 1] == exp_g).all()
    assert (rgb[..., 2] == exp_b).all()


def test_encode_rgb_decode_psnr():
    x = np.linspace(0, 4 * np.pi, 64)
    base = np.sin(x[None, :]) * np.cos(x[:, None] * 0.5) * 80 + 128
    px = np.stack(
        [base, np.roll(base, 5, 0), np.roll(base, 9, 1)], axis=-1
    )
    px = np.clip(px, 0, 255).astype(np.uint8)
    data = jpeg_encode_rgb(px)
    w, h, out = jpeg_decode(data)
    assert (w, h) == (64, 64)
    mse = np.mean((out.astype(float) - px.astype(float)) ** 2)
    psnr = 10 * np.log10(255**2 / mse)
    assert psnr > 30.0


def test_byte_stuffing_roundtrip():
    """Force entropy bytes that contain 0xFF (stuffing path)."""
    rng = np.random.default_rng(99)
    for seed in range(4):
        nb = 8
        comps = []
        for _ in range(3):
            blocks = rng.integers(-60, 61, (nb, 64)).astype(np.int64)
            blocks[:, 20:] = 0
            nat = np.zeros((nb, 64), dtype=np.int64)
            nat[:, ZIGZAG] = blocks
            comps.append(nat.reshape(nb, 8, 8))
        data = jpeg_encode_from_coeffs(comps, 64, 8, "444")
        img = jpeg_decode_coeffs(data)
        for c in range(3):
            assert np.array_equal(img.coeffs[c], comps[c])


def test_oracle_sql_matches_decoder():
    rows = []
    for i in range(32):
        img = jpeg_decode_coeffs(make_synthetic_jpeg(i))
        nb = sum_dc = sum_abs = nnz = 0
        for comp in img.coeffs:
            flat = comp.reshape(comp.shape[0], 64)
            nb += comp.shape[0]
            sum_dc += int(flat[:, 0].sum())
            sum_abs += int(np.abs(flat[:, 1:]).sum())
            nnz += int((flat[:, 1:] != 0).sum())
        rows.append((i, img.width, img.height, nb, sum_dc, sum_abs, nnz))
    got = pd.DataFrame(
        rows,
        columns=["media_id", "width", "height", "n_blocks", "sum_dc",
                 "sum_abs_ac", "nnz_ac"],
    )
    exp = duckdb.sql(SQL_JPEG_DECODE).df()
    for c in got.columns:
        exp[c] = exp[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, exp)


def test_decode_jpegs_spark(spark):
    media = synthetic_jpeg_media(spark, 8)
    out = decode_jpegs(media).orderBy("media_id").toPandas()
    assert len(out) == 8
    for i in range(8):
        w, h, _ = synthetic_jpeg_dims(i)
        assert out.loc[i, "width"] == w
        assert out.loc[i, "height"] == h
        assert out.loc[i, "sum_rgb"] > 0


def test_extract_features_jpeg_decoder(spark):
    from magmapandas_spark.operators.multimodal import extract_features

    media = synthetic_jpeg_media(spark, 6).withColumns(
        {"kind": __import__("pyspark.sql.functions", fromlist=["lit"]).lit(
            "image")}
    )
    feats = extract_features(media, decoder="jpeg").toPandas()
    assert len(feats) == 6
    for f in feats["feature"]:
        v = np.array(f)
        assert v.shape == (16,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_extract_features_unknown_decoder_raises(spark):
    from magmapandas_spark.operators.multimodal import (
        extract_features,
        synthetic_media,
    )

    with pytest.raises(NotImplementedError):
        extract_features(synthetic_media(spark, 4), decoder="mp4")
