"""Minimal pure-Python media codecs: BMP (image) and WAV (audio).

This environment ships no image/audio libraries, so — in the same spirit as
``sources/avro_codec.py`` — the two simplest widely-used container formats
are implemented from their public specs:

- **BMP**: BITMAPFILEHEADER + BITMAPINFOHEADER, uncompressed (BI_RGB)
  24-bit pixels, 4-byte row padding, bottom-up or top-down row order
  (negative height).  Public layout: the Windows BMP file format docs.
- **WAV**: RIFF container with ``fmt `` + ``data`` chunks, PCM
  (wFormatTag=1) 16-bit samples, arbitrary extra chunks (LIST, fact, ...)
  skipped with the odd-size pad byte honoured.  Public layout: the RIFF/WAVE
  spec.

Anything outside those profiles (JPEG/PNG compression, 8/32-bit BMP, float
or ADPCM WAV) raises ``UnsupportedMediaError`` — a *declared* boundary, not
a silent fake.  Decoding is numpy-vectorized (``np.frombuffer`` over the
pixel/sample array), so per-payload cost is O(bytes) with C-speed inner
loops — fine for the mapInPandas batch path in ``multimodal.py``.

Encoders for both formats are included so tests can build adversarial
fixtures (odd widths exercising row padding, top-down images, multi-chunk
WAVs) without any external tooling.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import List, Tuple

import numpy as np


class MediaCodecError(ValueError):
    """Structurally invalid BMP/WAV bytes."""


class UnsupportedMediaError(NotImplementedError):
    """Valid container, but a profile outside the implemented subset."""


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

_BI_RGB = 0


@dataclass
class DecodedImage:
    width: int
    height: int
    pixels: "np.ndarray"  # (height, width, 3) uint8, rows top-down, RGB

    @property
    def mean_rgb(self) -> Tuple[float, float, float]:
        m = self.pixels.reshape(-1, 3).mean(axis=0)
        return (float(m[0]), float(m[1]), float(m[2]))


def encode_bmp(pixels: "np.ndarray", top_down: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BI_RGB BMP bytes."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise MediaCodecError("encode_bmp expects (h, w, 3) uint8")
    h, w, _ = arr.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # pixel rows are stored bottom-up unless the header height is negative
    rows = arr if top_down else arr[::-1]
    body = bytearray()
    zeros = b"\x00" * pad
    for row in rows:
        body += row[:, ::-1].tobytes()  # RGB → BGR storage order
        body += zeros
    header_size = 14 + 40
    file_size = header_size + len(body)
    out = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, header_size)
    out += struct.pack(
        "<IiiHHIIiiII",
        40,                       # biSize
        w,
        -h if top_down else h,    # negative = top-down
        1,                        # planes
        24,                       # bpp
        _BI_RGB,
        len(body),
        2835, 2835,               # 72 DPI
        0, 0,
    )
    return out + bytes(body)


def decode_bmp(data: bytes) -> DecodedImage:
    """24-bit BI_RGB BMP bytes → DecodedImage (rows normalized top-down)."""
    if len(data) < 54:
        raise MediaCodecError("BMP truncated: shorter than headers")
    magic, _file_size, _r1, _r2, pix_offset = struct.unpack_from("<2sIHHI", data, 0)
    if magic != b"BM":
        raise MediaCodecError(f"not a BMP: magic {magic!r}")
    (
        bi_size, width, height, planes, bpp, compression,
        _img_size, _xppm, _yppm, _clr_used, _clr_imp,
    ) = struct.unpack_from("<IiiHHIIiiII", data, 14)
    if bi_size < 40:
        raise UnsupportedMediaError(f"BITMAPCOREHEADER (size {bi_size}) not supported")
    if compression != _BI_RGB:
        raise UnsupportedMediaError(f"compressed BMP (method {compression}) not supported")
    if bpp != 24:
        raise UnsupportedMediaError(f"{bpp}-bit BMP not supported (24-bit only)")
    if planes != 1 or width <= 0 or height == 0:
        raise MediaCodecError(f"bad BMP dimensions {width}x{height}, planes={planes}")
    top_down = height < 0
    h = abs(height)
    row_bytes = width * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = pix_offset + stride * h
    if len(data) < need:
        raise MediaCodecError(f"BMP truncated: need {need} bytes, have {len(data)}")
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=pix_offset)
    rows = raw.reshape(h, stride)[:, :row_bytes].reshape(h, width, 3)
    rgb = rows[:, :, ::-1]  # BGR storage → RGB
    if not top_down:
        rgb = rgb[::-1]
    return DecodedImage(width=width, height=h, pixels=np.ascontiguousarray(rgb))


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


@dataclass
class DecodedAudio:
    sample_rate: int
    channels: int
    samples: "np.ndarray"  # (n_frames, channels) int16

    @property
    def duration_ms(self) -> int:
        return int(round(self.samples.shape[0] * 1000.0 / self.sample_rate))

    @property
    def rms(self) -> float:
        if self.samples.size == 0:
            return 0.0
        x = self.samples.astype(np.float64) / 32768.0
        return float(np.sqrt(np.mean(x * x)))


def encode_wav(
    samples: "np.ndarray",
    sample_rate: int = 16000,
    extra_chunks: List[Tuple[bytes, bytes]] = (),
) -> bytes:
    """(n, ch) or (n,) int16 → PCM WAV bytes.

    ``extra_chunks`` — list of (4-byte id, payload) inserted before ``data``
    to build adversarial fixtures (readers must skip unknown chunks and
    honour the odd-size pad byte).
    """
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    data = arr.tobytes()
    block_align = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * block_align, block_align, 16)
    chunks = bytearray()
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    for cid, payload in extra_chunks:
        if len(cid) != 4:
            raise MediaCodecError("chunk id must be 4 bytes")
        chunks += cid + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            chunks += b"\x00"  # RIFF pads odd chunks
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        chunks += b"\x00"
    riff_size = 4 + len(chunks)
    return b"RIFF" + struct.pack("<I", riff_size) + b"WAVE" + bytes(chunks)


def decode_wav(data: bytes) -> DecodedAudio:
    """PCM 16-bit WAV bytes → DecodedAudio."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise MediaCodecError("not a RIFF/WAVE file")
    pos = 12
    fmt_info = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body_start = pos + 8
        if body_start + size > len(data):
            raise MediaCodecError(f"WAV chunk {cid!r} overruns file")
        if cid == b"fmt ":
            if size < 16:
                raise MediaCodecError("fmt chunk too small")
            fmt_info = struct.unpack_from("<HHIIHH", data, body_start)
        elif cid == b"data":
            pcm = data[body_start:body_start + size]
        pos = body_start + size + (size % 2)  # odd chunks are padded
    if fmt_info is None or pcm is None:
        raise MediaCodecError("missing fmt or data chunk")
    wformat, channels, sample_rate, _byte_rate, _block_align, bits = fmt_info
    if wformat != 1:
        raise UnsupportedMediaError(f"WAV format tag {wformat} not supported (PCM only)")
    if bits != 16:
        raise UnsupportedMediaError(f"{bits}-bit WAV not supported (16-bit only)")
    if channels < 1 or sample_rate <= 0:
        raise MediaCodecError(f"bad WAV fmt: channels={channels} rate={sample_rate}")
    usable = len(pcm) - (len(pcm) % (2 * channels))
    arr = np.frombuffer(pcm, dtype="<i2", count=usable // 2).reshape(-1, channels)
    return DecodedAudio(sample_rate=sample_rate, channels=channels, samples=arr)


# ---------------------------------------------------------------------------
# Format sniffing + fixed-width feature vectors (the "embed" stand-in)
# ---------------------------------------------------------------------------

FEATURE_DIM = 16


def sniff_format(payload: bytes) -> str:
    """'bmp' | 'wav' | 'unknown' from magic bytes."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return "unknown"


def image_features(img: DecodedImage) -> List[float]:
    """Deterministic 16-dim image descriptor from real decoded pixels.

    [log1p(w), log1p(h), aspect, mean RGB (3, 0-1), std RGB (3, 0-1),
    4-bin luminance histogram (4, fractions), 0-pad (3)]
    """
    px = img.pixels.reshape(-1, 3).astype(np.float64)
    mean = px.mean(axis=0) / 255.0
    std = px.std(axis=0) / 255.0
    lum = px @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(lum, bins=4, range=(0.0, 255.0001))
    hist = hist / max(1, lum.size)
    feats = [
        float(np.log1p(img.width)),
        float(np.log1p(img.height)),
        float(img.width) / float(img.height),
        *[float(v) for v in mean],
        *[float(v) for v in std],
        *[float(v) for v in hist],
    ]
    return (feats + [0.0] * FEATURE_DIM)[:FEATURE_DIM]


def audio_features(aud: DecodedAudio) -> List[float]:
    """Deterministic 16-dim audio descriptor from real decoded samples.

    [log1p(rate), channels, log1p(duration_ms), rms, peak,
    zero-crossing rate, 8-segment RMS envelope (8), 0-pad (2)]
    """
    x = aud.samples.astype(np.float64) / 32768.0
    mono = x.mean(axis=1) if x.size else np.zeros(1)
    peak = float(np.abs(mono).max()) if mono.size else 0.0
    zc = float(np.mean(np.abs(np.diff(np.signbit(mono))))) if mono.size > 1 else 0.0
    segs = np.array_split(mono, 8)
    envelope = [float(np.sqrt(np.mean(s * s))) if s.size else 0.0 for s in segs]
    feats = [
        float(np.log1p(aud.sample_rate)),
        float(aud.channels),
        float(np.log1p(aud.duration_ms)),
        aud.rms,
        peak,
        zc,
        *envelope,
    ]
    return (feats + [0.0] * FEATURE_DIM)[:FEATURE_DIM]


def decode_features(payload: bytes) -> List[float]:
    """Sniff + decode + featurize one payload; raises on unknown formats."""
    kind = sniff_format(payload)
    if kind == "bmp":
        return image_features(decode_bmp(payload))
    if kind == "wav":
        return audio_features(decode_wav(payload))
    raise UnsupportedMediaError(
        "unrecognized payload (BMP and PCM WAV are the implemented codecs; "
        "JPEG/PNG/MP3 etc. need media libraries absent from this environment)"
    )


# ---------------------------------------------------------------------------
# Transforms: resize / decimate (the "resize" step of decode→resize→embed)
# ---------------------------------------------------------------------------


def resize_nearest(img: DecodedImage, width: int, height: int) -> DecodedImage:
    """Nearest-neighbor resample via numpy fancy indexing (no Python loops).

    Pixel-center mapping: output pixel (x, y) samples source pixel
    (floor((x+0.5)·w_src/w_dst), floor((y+0.5)·h_src/h_dst)) — the standard
    NN convention, deterministic and oracle-recomputable.  One gather per
    axis; O(w_dst·h_dst) with vectorized indexing.
    """
    if width <= 0 or height <= 0:
        raise MediaCodecError(f"bad resize target {width}x{height}")
    ys = np.minimum(
        ((np.arange(height) + 0.5) * img.height / height).astype(np.int64),
        img.height - 1,
    )
    xs = np.minimum(
        ((np.arange(width) + 0.5) * img.width / width).astype(np.int64),
        img.width - 1,
    )
    return DecodedImage(
        width=width, height=height,
        pixels=np.ascontiguousarray(img.pixels[ys][:, xs]),
    )


def decimate_audio(aud: DecodedAudio, factor: int) -> DecodedAudio:
    """Integer decimation: keep every ``factor``-th frame (strided view copy).

    Honest about what it is — sample dropping, not filtered resampling
    (an anti-alias filter needs scipy, absent here).  The new rate is
    ``sample_rate // factor``; factor must divide the rate so the declared
    rate stays exact.
    """
    if factor < 1:
        raise MediaCodecError(f"bad decimation factor {factor}")
    if aud.sample_rate % factor:
        raise MediaCodecError(
            f"factor {factor} does not divide sample rate {aud.sample_rate}"
        )
    return DecodedAudio(
        sample_rate=aud.sample_rate // factor,
        channels=aud.channels,
        samples=np.ascontiguousarray(aud.samples[::factor]),
    )
