"""Adversarial fixture zoo for the pure-Python BMP/WAV codecs
(operators/media_codec.py) + Spark end-to-end through the real decode path.

Mirrors the test strategy of test_avro_io.py: round-trips, structural
corruption rejected loudly, unsupported-profile boundaries declared, and the
distributed mapInPandas plumbing exercised on real bytes.
"""

import struct

import numpy as np
import pytest

from arthur_redshift_etl_spark.operators import media_codec as mc
from arthur_redshift_etl_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    probe_metadata,
)


def checker(w, h):
    """Deterministic (h, w, 3) test image with distinct channel stats."""
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 7) % 256, (y * 13) % 256, ((x + y) * 3) % 256], axis=2
    ).astype(np.uint8)


def tone(n=1600, rate=8000, ch=1):
    t = np.arange(n * ch).reshape(n, ch)
    return (10000 * np.sin(t / 10.0)).astype(np.int16)


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("w,h", [(4, 4), (3, 5), (1, 1), (7, 2)])
def test_bmp_roundtrip_including_odd_widths(w, h):
    # odd widths exercise the 4-byte row padding math
    img = checker(w, h)
    out = mc.decode_bmp(mc.encode_bmp(img))
    assert (out.width, out.height) == (w, h)
    np.testing.assert_array_equal(out.pixels, img)


def test_bmp_topdown_negative_height_matches_bottomup():
    img = checker(6, 3)
    down = mc.decode_bmp(mc.encode_bmp(img, top_down=True))
    up = mc.decode_bmp(mc.encode_bmp(img, top_down=False))
    np.testing.assert_array_equal(down.pixels, up.pixels)


def test_bmp_rejects_truncation_and_bad_magic():
    data = mc.encode_bmp(checker(5, 5))
    with pytest.raises(mc.MediaCodecError, match="truncated"):
        mc.decode_bmp(data[: len(data) - 10])
    with pytest.raises(mc.MediaCodecError, match="magic"):
        mc.decode_bmp(b"XX" + data[2:])
    with pytest.raises(mc.MediaCodecError):
        mc.decode_bmp(b"BM\x00\x01")  # shorter than the headers


def test_bmp_declares_unsupported_profiles():
    data = bytearray(mc.encode_bmp(checker(4, 4)))
    bad_bpp = data.copy()
    struct.pack_into("<H", bad_bpp, 14 + 14, 8)  # biBitCount=8
    with pytest.raises(mc.UnsupportedMediaError, match="8-bit"):
        mc.decode_bmp(bytes(bad_bpp))
    bad_comp = data.copy()
    struct.pack_into("<I", bad_comp, 14 + 16, 1)  # BI_RLE8
    with pytest.raises(mc.UnsupportedMediaError, match="compressed"):
        mc.decode_bmp(bytes(bad_comp))


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ch", [1, 2])
def test_wav_roundtrip(ch):
    samples = tone(ch=ch)
    out = mc.decode_wav(mc.encode_wav(samples, sample_rate=8000))
    assert out.sample_rate == 8000 and out.channels == ch
    np.testing.assert_array_equal(out.samples, samples)
    assert out.duration_ms == 200  # 1600 frames @ 8 kHz


def test_wav_skips_extra_chunks_with_odd_padding():
    # LIST chunk with odd payload length: reader must honour the pad byte
    samples = tone(n=100)
    data = mc.encode_wav(
        samples, extra_chunks=[(b"LIST", b"INFOabc"), (b"fact", b"\x64\x00\x00\x00")]
    )
    out = mc.decode_wav(data)
    np.testing.assert_array_equal(out.samples, samples)


def test_wav_rejects_corruption():
    data = mc.encode_wav(tone(n=50))
    with pytest.raises(mc.MediaCodecError, match="RIFF"):
        mc.decode_wav(b"JUNK" + data[4:])
    # chunk size pointing past EOF
    bad = bytearray(data)
    struct.pack_into("<I", bad, 16, 10**6)  # fmt chunk size
    with pytest.raises(mc.MediaCodecError, match="overruns"):
        mc.decode_wav(bytes(bad))
    with pytest.raises(mc.MediaCodecError, match="overruns|missing"):
        mc.decode_wav(data[:20])  # truncated mid-chunk
    with pytest.raises(mc.MediaCodecError, match="missing"):
        mc.decode_wav(data[:12])  # RIFF/WAVE header only — no chunks at all


def test_wav_declares_unsupported_profiles():
    data = bytearray(mc.encode_wav(tone(n=10)))
    float_fmt = data.copy()
    struct.pack_into("<H", float_fmt, 20, 3)  # IEEE float
    with pytest.raises(mc.UnsupportedMediaError, match="format tag"):
        mc.decode_wav(bytes(float_fmt))
    bad_bits = data.copy()
    struct.pack_into("<H", bad_bits, 34, 8)
    with pytest.raises(mc.UnsupportedMediaError, match="8-bit"):
        mc.decode_wav(bytes(bad_bits))


# ---------------------------------------------------------------------------
# Feature vectors are real functions of the decoded content
# ---------------------------------------------------------------------------

def test_image_features_track_pixels():
    dark = mc.image_features(mc.decode_bmp(mc.encode_bmp(np.zeros((4, 4, 3), np.uint8))))
    light = mc.image_features(
        mc.decode_bmp(mc.encode_bmp(np.full((4, 4, 3), 255, np.uint8)))
    )
    assert len(dark) == len(light) == mc.FEATURE_DIM
    assert dark[3:6] == [0.0, 0.0, 0.0] and light[3] > 0.99  # mean RGB
    assert dark[9] == 1.0 and light[12] == 1.0  # luminance ends up in opposite bins


def test_audio_features_track_samples():
    silent = mc.audio_features(mc.decode_wav(mc.encode_wav(np.zeros(800, np.int16))))
    loud = mc.audio_features(mc.decode_wav(mc.encode_wav(tone())))
    assert silent[3] == 0.0 and loud[3] > 0.1  # rms
    assert loud[5] > 0.0  # zero crossings on a sine


# ---------------------------------------------------------------------------
# Spark end-to-end: real decode through mapInPandas
# ---------------------------------------------------------------------------

def test_spark_real_decode_mixed_modalities(spark):
    payloads = [
        (0, None, bytes(mc.encode_bmp(checker(8, 6)))),
        (1, None, bytes(mc.encode_wav(tone(), sample_rate=16000))),
        (2, None, None),  # NULL payload → NULL feature
        (3, None, bytes(mc.encode_bmp(checker(3, 3), top_down=True))),
    ]
    df = spark.createDataFrame(payloads, "media_id long, uri string, payload binary")

    feats = {r["media_id"]: r["feature"] for r in extract_features(df).collect()}
    assert feats[2] is None
    assert len(feats[0]) == FEATURE_DIM and len(feats[1]) == FEATURE_DIM
    # matches a local (non-Spark) decode exactly
    local = mc.decode_features(payloads[0][2])
    assert feats[0] == pytest.approx(local)

    meta = {r["media_id"]: r for r in probe_metadata(df).collect()}
    assert (meta[0]["modality"], meta[0]["width"], meta[0]["height"]) == ("image", 8, 6)
    assert meta[1]["modality"] == "audio" and meta[1]["duration_ms"] == 100
    assert meta[2]["modality"] == "unknown" and meta[2]["n_bytes"] == 0
    assert meta[3]["width"] == 3


def test_spark_real_decode_fails_loudly_on_garbage(spark):
    df = spark.createDataFrame(
        [(0, None, b"not-a-media-file")], "media_id long, uri string, payload binary"
    )
    with pytest.raises(Exception) as exc_info:
        extract_features(df).collect()
    assert "UnsupportedMediaError" in str(exc_info.value)


# ---------------------------------------------------------------------------
# Property tests: arbitrary content round-trips bit-exactly
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 9),
        seed=st.integers(0, 2**31 - 1),
        top_down=st.booleans(),
    )
    def test_bmp_roundtrip_property(w, h, seed, top_down):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = mc.decode_bmp(mc.encode_bmp(img, top_down=top_down))
        assert (out.width, out.height) == (w, h)
        np.testing.assert_array_equal(out.pixels, img)

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(0, 500),
        ch=st.integers(1, 4),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_wav_roundtrip_property(n, ch, rate, seed):
        rng = np.random.default_rng(seed)
        samples = rng.integers(-(2**15), 2**15, size=(n, ch)).astype(np.int16)
        out = mc.decode_wav(mc.encode_wav(samples, sample_rate=rate))
        assert (out.sample_rate, out.channels) == (rate, ch)
        np.testing.assert_array_equal(out.samples, samples)


# ---- resize / decimate kernels ---------------------------------------------


def test_resize_nearest_identity_and_known_gather():
    # 4x2 gradient; upscale is a pure gather, identity target is a no-op copy
    px = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
    img = mc.DecodedImage(width=4, height=2, pixels=px)
    same = mc.resize_nearest(img, 4, 2)
    assert np.array_equal(same.pixels, px)
    # downscale 4x2 -> 2x1: NN picks x in {floor(0.5*4/2)=1, floor(1.5*4/2)=3},
    # y = floor(0.5*2/1) = 1
    small = mc.resize_nearest(img, 2, 1)
    assert small.pixels.shape == (1, 2, 3)
    assert np.array_equal(small.pixels[0, 0], px[1, 1])
    assert np.array_equal(small.pixels[0, 1], px[1, 3])


def test_resize_nearest_roundtrips_through_bmp():
    px = (np.arange(5 * 7 * 3, dtype=np.int64) % 256).astype(np.uint8).reshape(5, 7, 3)
    resized = mc.resize_nearest(mc.DecodedImage(7, 5, px), 3, 2)
    back = mc.decode_bmp(mc.encode_bmp(resized.pixels))
    assert (back.width, back.height) == (3, 2)
    assert np.array_equal(back.pixels, resized.pixels)


def test_resize_nearest_rejects_bad_target():
    img = mc.DecodedImage(2, 2, np.zeros((2, 2, 3), np.uint8))
    with pytest.raises(mc.MediaCodecError):
        mc.resize_nearest(img, 0, 2)


def test_decimate_audio_stride_and_rate():
    samp = (np.arange(100) % 7).astype(np.int16)
    aud = mc.DecodedAudio(sample_rate=8000, channels=1, samples=samp[:, None])
    out = mc.decimate_audio(aud, 4)
    assert out.sample_rate == 2000
    assert np.array_equal(out.samples[:, 0], samp[::4])
    # duration preserved (sample drop + rate drop cancel)
    assert out.duration_ms == aud.duration_ms


def test_decimate_audio_rejects_nondivisor_factor():
    aud = mc.DecodedAudio(8000, 1, np.zeros((10, 1), np.int16))
    with pytest.raises(mc.MediaCodecError):
        mc.decimate_audio(aud, 3)
