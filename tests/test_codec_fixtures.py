"""Codec fixtures NOT produced by the repo's own encoders (r5 brief #6).

Every earlier codec test round-tripped payloads from `encode_bmp` /
`encode_wav`, so a matching encode/decode bug would cancel. Here the
decoders face independent bytes:

- BMP: the canonical 2×2 24-bit example published with the BMP file
  format spec (BITMAPINFOHEADER, bottom-up rows, 2-byte row padding) —
  a byte-for-byte public literal, pixels known a priori.
- WAV: bytes written by the Python STANDARD LIBRARY `wave` encoder —
  a third-party RIFF writer that shares no code with ours — plus a
  variant with a LIST chunk spliced before `data` to pin the chunk
  walk against non-minimal (yet valid) layouts.
"""

import io
import wave

import numpy as np

from pyarrowspace_spark.multimodal.codecs import (decode_bmp, decode_wav,
                                                  encode_bmp, encode_wav)

# 70-byte 2×2 24-bit BMP, verbatim from the public spec example:
# bottom-up pixel rows; bottom row = red, white; top row = blue, green.
SPEC_BMP_2X2 = bytes.fromhex(
    "424d46000000000000003600"
    "0000280000000200000002000000010018000000000010000000130b0000130b"
    "00000000000000000000"
    "0000ffffffff0000"      # bottom row: (B0,G0,R255)=red, white, pad
    "ff000000ff000000"      # top row: blue, green, pad
)


def test_decode_bmp_spec_fixture():
    px = decode_bmp(SPEC_BMP_2X2)
    assert px.shape == (2, 2, 3) and px.dtype == np.uint8
    # decode_bmp returns top-down BGR
    assert px[0, 0].tolist() == [255, 0, 0]      # blue
    assert px[0, 1].tolist() == [0, 255, 0]      # green
    assert px[1, 0].tolist() == [0, 0, 255]      # red
    assert px[1, 1].tolist() == [255, 255, 255]  # white


def test_encode_bmp_matches_spec_fixture_bytes():
    """Our encoder, fed the spec example's pixels, must reproduce the
    published bytes exactly (resolution fields included)."""
    px = decode_bmp(SPEC_BMP_2X2)
    assert encode_bmp(px) == SPEC_BMP_2X2


def test_decode_wav_from_stdlib_encoder():
    rng = np.random.default_rng(11)
    frames = (rng.integers(-30000, 30000, size=400)).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(frames.tobytes())
    data = buf.getvalue()
    assert data[:4] == b"RIFF"
    samples, meta = decode_wav(data)
    assert meta == {"sample_rate": 44100, "bits": 16, "channels": 2}
    np.testing.assert_array_equal(samples, frames)
    # and the reverse: stdlib `wave` must be able to read OUR encoder
    with wave.open(io.BytesIO(encode_wav(frames, 44100, bits=16,
                                         channels=2)), "rb") as r:
        assert (r.getnchannels(), r.getsampwidth(),
                r.getframerate()) == (2, 2, 44100)
        np.testing.assert_array_equal(
            np.frombuffer(r.readframes(r.getnframes()), dtype="<i2"), frames)


def test_decode_wav_with_extra_list_chunk():
    """A LIST metadata chunk between fmt and data (common in the wild)
    must be skipped by the chunk walk, not break decoding."""
    frames = np.arange(64, dtype=np.uint8)
    minimal = encode_wav(frames, 8000, bits=8, channels=1)
    fmt_chunk = minimal[12:36]
    data_chunk = minimal[36:]
    list_chunk = b"LIST" + (12).to_bytes(4, "little") + b"INFOIART" + b"\x00" * 4
    spliced = minimal[:12] + fmt_chunk + list_chunk + data_chunk
    samples, meta = decode_wav(spliced)
    assert meta["bits"] == 8 and meta["channels"] == 1
    np.testing.assert_array_equal(samples, frames)
