"""Real-codec decode tests for the multimodal stubs.

The container ships no media libraries, so ``decode_image`` /
``decode_audio`` normally take the NotImplementedError path (pinned in
``tests/test_extensions.py``). These tests carry a real 1×1 PNG and a
4-sample PCM WAV as checked-in bytes so the moment PIL / soundfile ARE
present the decode path is exercised against known pixels/samples —
env-gated with importorskip, exactly like the stub's own gating.

Container-independent: the byte fixtures themselves are structurally
validated (PNG signature + IHDR dims, RIFF/WAVE header fields) so the
vectors can't rot into garbage that a future codec test would then
"skip past".
"""

from __future__ import annotations

import base64
import struct

import pytest

from postgres_cdc_example_spark.operators import multimodal

# 1×1 transparent PNG (the canonical minimal vector, 67 bytes).
PNG_1X1 = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
    "AAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg=="
)


def _wav_bytes() -> bytes:
    """Minimal PCM WAV: mono, 8 kHz, 16-bit, 4 known samples."""
    samples = [0, 1000, -1000, 32767]
    data = struct.pack("<4h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


WAV_4SAMPLE = _wav_bytes()


def test_png_vector_is_structurally_valid():
    assert PNG_1X1[:8] == b"\x89PNG\r\n\x1a\n"
    # first chunk must be IHDR with width=height=1
    length, ctype = struct.unpack(">I4s", PNG_1X1[8:16])
    assert ctype == b"IHDR" and length == 13
    width, height = struct.unpack(">II", PNG_1X1[16:24])
    assert (width, height) == (1, 1)


def test_wav_vector_is_structurally_valid():
    assert WAV_4SAMPLE[:4] == b"RIFF" and WAV_4SAMPLE[8:12] == b"WAVE"
    channels, rate = struct.unpack("<HI", WAV_4SAMPLE[22:28])
    assert channels == 1 and rate == 8000


def test_decode_image_real_codec():
    pytest.importorskip("PIL")
    img = multimodal.decode_image(PNG_1X1)
    assert img.size == (1, 1)


def test_decode_audio_real_codec():
    pytest.importorskip("soundfile")
    data, rate = multimodal.decode_audio(WAV_4SAMPLE)
    assert rate == 8000
    assert len(data) == 4
