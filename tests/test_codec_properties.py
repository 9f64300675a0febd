"""Property-based round-trip tests for the pure-Python codecs.

These are pure-kernel tests (no Spark): hypothesis drives arbitrary
inputs through encode→decode and demands bit-exact recovery — the
invariant every lossless layer must satisfy regardless of content.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from magmapandas_spark.operators.jpeg import (
    ZIGZAG,
    jpeg_decode_coeffs,
    jpeg_encode_from_coeffs,
)
from magmapandas_spark.operators.mp4 import mp4_encode, mp4_parse
from magmapandas_spark.operators.png import png_decode, png_encode
from magmapandas_spark.operators.wav import wav_decode, wav_encode


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    c=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
    base_filter=st.integers(0, 4),
)
def test_png_roundtrip_property(w, h, c, seed, base_filter):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, c)).astype(np.uint8)
    data = png_encode(
        px, filter_for_row=lambda r: (base_filter + r) % 5
    )
    w2, h2, out = png_decode(data)
    assert (w2, h2) == (w, h)
    assert np.array_equal(out, px)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 2000),
    stereo=st.booleans(),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, stereo, rate, seed):
    rng = np.random.default_rng(seed)
    shape = (n, 2) if stereo else (n,)
    samples = rng.integers(-32768, 32768, shape).astype(np.int16)
    r, c, out = wav_decode(wav_encode(samples, rate))
    assert r == rate
    assert c == (2 if stereo else 1)
    flat = out if stereo else out[:, 0]
    assert np.array_equal(flat, samples)


@settings(max_examples=20, deadline=None)
@given(
    nb=st.integers(1, 6),
    seed=st.integers(0, 2**31 - 1),
    sampling=st.sampled_from(["444", "420"]),
)
def test_jpeg_entropy_roundtrip_property(nb, seed, sampling):
    """Arbitrary sparse quantized blocks survive Huffman + DPCM +
    zigzag + byte stuffing bit-exactly (the lossless layer)."""
    rng = np.random.default_rng(seed)
    if sampling == "420":
        w, h = 16 * nb, 16
        nb_y, nb_c = 4 * nb, nb
    else:
        w, h = 8 * nb, 8
        nb_y = nb_c = nb
    comps = []
    for n_blocks in (nb_y, nb_c, nb_c):
        zz = np.zeros((n_blocks, 64), dtype=np.int64)
        for b in range(n_blocks):
            k = rng.integers(0, 12)
            pos = rng.choice(np.arange(1, 64), size=k, replace=False)
            zz[b, pos] = rng.integers(-255, 256, size=k)
            zz[b, 0] = rng.integers(-500, 501)
        nat = np.zeros((n_blocks, 64), dtype=np.int64)
        nat[:, ZIGZAG] = zz
        comps.append(nat.reshape(n_blocks, 8, 8))
    data = jpeg_encode_from_coeffs(comps, w, h, sampling)
    img = jpeg_decode_coeffs(data)
    for c in range(3):
        assert np.array_equal(img.coeffs[c], comps[c])


@settings(max_examples=25, deadline=None)
@given(
    duration=st.integers(1, 10_000_000),
    n_video=st.integers(1, 3),
    n_audio=st.integers(0, 3),
    payload=st.binary(min_size=0, max_size=4096),
)
def test_mp4_roundtrip_property(duration, n_video, n_audio, payload):
    tracks = ["video"] * n_video + ["audio"] * n_audio
    data = mp4_encode(duration, tracks, payload)
    m = mp4_parse(data)
    assert abs(m["duration_ms"] - duration) <= 1
    assert m["n_tracks"] == len(tracks)
    assert m["track_kinds"] == sorted(
        ["vide"] * n_video + ["soun"] * n_audio
    )
    assert m["mdat_bytes"] == len(payload)
    assert m["mdat_sum"] == int(
        np.frombuffer(payload, dtype=np.uint8).sum(dtype=np.int64)
    ) if payload else m["mdat_sum"] == 0


# ---- round-5 kernels ----

from magmapandas_spark.operators.warc import (  # noqa: E402
    gunzip_payload,
    gzip_payload,
    warc_encode_record,
    warc_parse,
)


@settings(max_examples=40, deadline=None)
@given(
    bodies=st.lists(st.binary(min_size=0, max_size=200), min_size=1,
                    max_size=6),
    uri_n=st.integers(0, 999),
)
def test_warc_roundtrip_property(bodies, uri_n):
    """Arbitrary payload bytes (CRLFs, WARC/ magic, anything) survive
    encode→parse bit-exact — length-delimited framing must not care."""
    blob = b"".join(
        warc_encode_record(
            "response" if i % 2 == 0 else "request",
            f"http://h{uri_n}.example/p{i}",
            body,
            f"{i:04d}",
        )
        for i, body in enumerate(bodies)
    )
    recs = warc_parse(blob)
    assert len(recs) == len(bodies)
    for rec, body in zip(recs, bodies):
        assert rec["payload"] == body
        assert rec["content_length"] == len(body)


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=5000),
       level=st.integers(1, 9))
def test_gzip_roundtrip_property(data, level):
    assert gunzip_payload(gzip_payload(data, level)) == data


def test_md5_prefix_fingerprint_convention_cross_engine():
    """The fingerprint legs hash hist strings with Python
    int(md5hex[:15], 16); the oracles use DuckDB
    ('0x' || substr(md5(s), 1, 15))::BIGINT — pin that the two
    conventions agree on representative and adversarial strings."""
    import hashlib

    import duckdb

    cases = [
        "0,1,2,3",
        "",
        "1024," * 15 + "1024",
        "999999999,0,0,0,0,0,0,0,0,0,0,0,0,0,0,1",
    ]
    con = duckdb.connect()
    for s in cases:
        py = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        duck = con.execute(
            "SELECT CAST(('0x' || substr(md5(?), 1, 15)) AS BIGINT)", [s]
        ).fetchone()[0]
        assert py == duck, s


def test_fingerprint_collision_paths_are_nonvacuous():
    """Each fingerprint leg's corpus must keep genuine duplicate
    content: if a fixture edit ever removes the byte-duplicate
    clips/images, the collision column degrades to all-1s and the
    dedup path goes vacuous — pin the expected dup row counts via
    the closed-form oracles (no Spark needed)."""
    import duckdb

    from magmapandas_spark.operators.h264 import SQL_VIDEO_FINGERPRINT
    from magmapandas_spark.operators.png import SQL_IMAGE_FINGERPRINT
    from magmapandas_spark.operators.wav import SQL_AUDIO_FINGERPRINT

    vid = duckdb.sql(SQL_VIDEO_FINGERPRINT).df()
    assert int((vid.n_frames_with_fp > 1).sum()) == 8  # clips 0<->24, 5<->25
    aud = duckdb.sql(SQL_AUDIO_FINGERPRINT).df()
    assert int((aud.n_clips_with_fp > 1).sum()) == 4  # 3<->48, 10<->49
    img = duckdb.sql(SQL_IMAGE_FINGERPRINT).df()
    assert int((img.n_images_with_fp > 1).sum()) == 4  # 2<->40, 7<->41


def test_cavlc_level_round_trip_property():
    """Property: _write_levels/_read_levels round-trip ANY legal
    level sequence within the no-escape envelope — randomized
    TrailingOnes counts, signs, magnitudes and TotalCoeff, including
    the TC>10 initial-suffixLength rule and every growth step the
    magnitudes can reach."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from magmapandas_spark.operators.h264 import (
        _BitReader,
        _BitWriter,
        _read_levels,
        _write_levels,
    )

    @st.composite
    def level_seqs(draw):
        tc = draw(st.integers(min_value=1, max_value=16))
        t1s = draw(st.integers(min_value=0, max_value=min(3, tc)))
        levels = [
            draw(st.sampled_from([1, -1])) for _ in range(t1s)
        ]
        for _ in range(tc - t1s):
            mag = draw(st.integers(min_value=2, max_value=7))
            sign = draw(st.sampled_from([1, -1]))
            levels.append(sign * mag)
        return levels, tc, t1s

    @given(level_seqs())
    @settings(max_examples=200, deadline=None)
    def check(case):
        levels, tc, t1s = case
        w = _BitWriter()
        try:
            _write_levels(w, levels, tc, t1s)
        except AssertionError:
            return  # outside the no-escape envelope: writer refuses
        w.rbsp_trailing()
        r = _BitReader(w.tobytes())
        assert _read_levels(r, tc, t1s) == levels

    check()
