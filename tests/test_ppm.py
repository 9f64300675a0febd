"""PPM (P6) decode: a real codec-free image decode path."""

import numpy as np
import pytest

from magmapandas_spark.operators.multimodal import (
    decode_images,
    decode_ppm,
    ppm_encode,
    synthetic_ppm_media,
)


def test_roundtrip():
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    w, h, out = decode_ppm(ppm_encode(px))
    assert (w, h) == (7, 5)
    assert np.array_equal(out, px)


def test_header_comments_and_whitespace():
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = b"P6\n# a comment\n 3  2\n# another\n255\n" + px.tobytes()
    w, h, out = decode_ppm(payload)
    assert (w, h) == (3, 2)
    assert np.array_equal(out, px)


def test_rejects_non_p6_and_deep_maxval():
    with pytest.raises(ValueError, match="P6"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")


def test_decode_images_matches_numpy(spark):
    media = synthetic_ppm_media(spark, 6)
    rows = {r.media_id: r for r in decode_images(media).collect()}
    for i in range(6):
        w, h = 64 + (i % 32), 48 + (i % 24)
        j = np.arange(w * h * 3, dtype=np.int64)
        px = (i * 7 + j) % 256
        r = rows[i]
        assert (r.width, r.height, r.n_px) == (w, h, w * h)
        assert r.sum_r == int(px[j % 3 == 0].sum())
        assert r.sum_g == int(px[j % 3 == 1].sum())
        assert r.sum_b == int(px[j % 3 == 2].sum())
