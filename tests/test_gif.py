"""GIF87a codec tests: LZW dictionary reconstruction (incl. KwKwK and
table-full reset), container validation, exact oracle, permissive
quarantine."""

import numpy as np
import pytest

from magmapandas_spark.operators.gif import (
    MEDIA_GIF_SCHEMA,
    decode_gifs,
    gif_decode,
    gif_encode,
    lzw_decode,
    lzw_encode,
    make_synthetic_gif,
    synthetic_gif_dims,
    synthetic_gif_media,
)


def test_lzw_kwkwk_case():
    # "ababab..." forces code == next-slot (the KwKwK special case)
    idx = np.array([0, 1] * 50, dtype=np.uint8)
    enc = lzw_encode(idx, 2)
    assert np.array_equal(lzw_decode(enc, 2, len(idx)), idx)


def test_lzw_width_growth_and_reset():
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 256, 30000).astype(np.uint8)
    enc = lzw_encode(idx, 8)
    assert np.array_equal(lzw_decode(enc, 8, len(idx)), idx)


def test_lzw_truncation_rejected():
    idx = np.arange(16, dtype=np.uint8)
    enc = lzw_encode(idx, 4)
    with pytest.raises(ValueError, match="truncated|expected"):
        lzw_decode(enc[: len(enc) // 2], 4, len(idx))


def test_container_roundtrip_random():
    rng = np.random.default_rng(9)
    idx = rng.integers(0, 16, (11, 17)).astype(np.uint8)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    w, h, idx2, pal2 = gif_decode(gif_encode(idx, pal))
    assert (w, h) == (17, 11)
    assert np.array_equal(idx2, idx)
    assert np.array_equal(pal2[:16], pal)


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="magic"):
        gif_decode(b"NOTAGIF" + b"\x00" * 40)


def test_synthetic_formula():
    for i in (0, 5, 39):
        w0, h0 = synthetic_gif_dims(i)
        w, h, idx, pal = gif_decode(make_synthetic_gif(i))
        assert (w, h) == (w0, h0)
        j = np.arange(w * h, dtype=np.int64)
        exp = ((i * 5 + j * j) % 16).astype(np.uint8).reshape(h, w)
        assert np.array_equal(idx, exp)


def test_decode_gifs_spark_and_permissive(spark):
    out = decode_gifs(synthetic_gif_media(spark, 10)).orderBy(
        "media_id").toPandas()
    assert len(out) == 10
    rows = [(0, make_synthetic_gif(0)), (1, b"garbage bytes")]
    media = spark.createDataFrame(rows, MEDIA_GIF_SCHEMA)
    perm = decode_gifs(media, permissive=True).toPandas()
    assert set(perm[perm["error"].notna()]["media_id"]) == {1}
