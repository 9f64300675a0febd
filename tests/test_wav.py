"""RIFF/WAVE PCM codec tests."""

import struct

import duckdb
import numpy as np
import pandas as pd
import pytest

from magmapandas_spark.operators.wav import (
    SQL_WAV_CHUNKS,
    chunk_wav_audio,
    make_synthetic_wav,
    synthetic_wav_frames,
    synthetic_wav_media,
    wav_decode,
    wav_encode,
)


def test_roundtrip_mono():
    rng = np.random.default_rng(1)
    m = rng.integers(-32768, 32768, 777).astype(np.int16)
    r, c, out = wav_decode(wav_encode(m, 44100))
    assert (r, c) == (44100, 1)
    assert np.array_equal(out[:, 0], m)


def test_roundtrip_stereo():
    rng = np.random.default_rng(2)
    st = rng.integers(-32768, 32768, (500, 2)).astype(np.int16)
    r, c, out = wav_decode(wav_encode(st, 16000))
    assert (r, c) == (16000, 2)
    assert np.array_equal(out, st)


def test_tolerates_extra_chunks():
    """Decoder walks the chunk list — a LIST chunk between fmt and data
    (common in real files) must not break it."""
    m = np.arange(100, dtype=np.int16)
    data = wav_encode(m, 8000)
    # splice a LIST chunk right before the data chunk
    di = data.index(b"data")
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = data[:di] + lst + data[di:]
    # fix the RIFF size
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    r, c, out = wav_decode(spliced)
    assert np.array_equal(out[:, 0], m)


def test_rejects_non_pcm():
    m = np.zeros(10, dtype=np.int16)
    data = bytearray(wav_encode(m, 8000))
    fi = bytes(data).index(b"fmt ") + 8
    data[fi] = 3  # IEEE float format tag
    with pytest.raises(ValueError, match="PCM"):
        wav_decode(bytes(data))


def test_rejects_bad_header():
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"NOTWAVE!" + b"\x00" * 64)


def test_oracle_matches():
    rows = []
    for i in range(48):
        rate, ch, frames = wav_decode(make_synthetic_wav(i))
        mono = frames[:, 0].astype(np.int64)
        n = len(mono)
        assert n == synthetic_wav_frames(i)
        nc = -(-n // 256)
        for k in range(nc):
            seg = mono[k * 256 : (k + 1) * 256]
            ss = int((seg * seg).sum())
            rows.append(
                (i, k, len(seg), rate, ss,
                 round(float(np.sqrt(ss / len(seg))), 6))
            )
    got = pd.DataFrame(
        rows,
        columns=["media_id", "chunk_idx", "n_frames", "sample_rate",
                 "sum_sq", "rms"],
    )
    exp = duckdb.sql(SQL_WAV_CHUNKS).df()
    for c in got.columns:
        exp[c] = exp[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, exp)


def test_chunk_wav_audio_spark(spark):
    out = chunk_wav_audio(synthetic_wav_media(spark, 6)).toPandas()
    # clip i has ceil(n/256) chunks
    exp_chunks = sum(-(-synthetic_wav_frames(i) // 256) for i in range(6))
    assert len(out) == exp_chunks
    assert (out["sample_rate"] == 8000).all()
    assert (out["sum_sq"] >= 0).all()


def test_chunk_wav_audio_stereo_energy(spark):
    """Advice fix: stereo chunks aggregate energy across BOTH
    channels (per-chunk sum_sq is the clip's energy, rms divides by
    frames x channels)."""
    import numpy as np

    from magmapandas_spark.operators.wav import MEDIA_WAV_SCHEMA

    left = np.array([3, -4, 5, 0], dtype=np.int16)
    right = np.array([1, 2, -2, 6], dtype=np.int16)
    payload = wav_encode(np.stack([left, right], axis=1))
    media = spark.createDataFrame([(0, payload)], MEDIA_WAV_SCHEMA)
    out = chunk_wav_audio(media, chunk_frames=4).toPandas()
    assert len(out) == 1
    expect = int((left.astype(np.int64) ** 2).sum()
                 + (right.astype(np.int64) ** 2).sum())
    assert out.loc[0, "sum_sq"] == expect
    assert abs(out.loc[0, "rms"] - float(np.sqrt(expect / 8))) < 1e-12
