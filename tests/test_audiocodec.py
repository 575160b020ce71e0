"""Unit tests for the pure-numpy PCM WAV codec (audiocodec.py):
round-trip identity, header-only parse, RIFF chunk skipping, truncation,
and the unsupported-format plug-in contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from palletjack_spark.functions.audiocodec import (
    FORMAT_DECODERS,
    UnsupportedAudioError,
    decode_wav,
    encode_wav,
    synthetic_audio,
)


def test_roundtrip_identity_mono_and_stereo():
    for ch in (1, 2):
        s = synthetic_audio(seed=42, n_samples=301, channels=ch)  # odd n: pad
        d = decode_wav(encode_wav(s, sample_rate=8000, channels=ch))
        assert (d["sample_rate"], d["channels"], d["bits"]) == (8000, ch, 16)
        assert d["n_samples"] == 301
        assert np.array_equal(d["samples"], s)


def test_header_only_parse():
    s = synthetic_audio(seed=7, n_samples=100)
    meta = decode_wav(encode_wav(s), decode_samples=False)
    assert meta["samples"] is None and meta["n_samples"] == 100


def test_foreign_chunks_skipped():
    """LIST/INFO chunks between fmt and data are common in real WAVs and
    must be skipped per the RIFF spec."""
    s = synthetic_audio(seed=3, n_samples=50)
    payload = bytearray(encode_wav(s))
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    at = bytes(payload).index(b"data")
    payload[at:at] = extra
    payload[4:8] = struct.pack("<I", len(payload) - 8)
    d = decode_wav(bytes(payload))
    assert d["n_samples"] == 50 and np.array_equal(d["samples"], s)


def test_invalid_and_truncated_payloads_raise():
    s = synthetic_audio(seed=3, n_samples=50)
    payload = encode_wav(s)
    with pytest.raises(UnsupportedAudioError):
        decode_wav(payload[:20])
    with pytest.raises(UnsupportedAudioError):
        decode_wav(b"RIFF\x04\x00\x00\x00AVI ")
    with pytest.raises(NotImplementedError):  # plug-in contract
        decode_wav(b"")


def test_non_pcm_format_requires_registered_decoder():
    s = synthetic_audio(seed=9, n_samples=10)
    payload = bytearray(encode_wav(s))
    at = bytes(payload).index(b"fmt ") + 8
    payload[at : at + 2] = struct.pack("<H", 0x55)  # MP3 format tag
    with pytest.raises(UnsupportedAudioError, match="85"):
        decode_wav(bytes(payload))
    FORMAT_DECODERS[0x55] = lambda raw, ch, bits: np.zeros((1, ch), np.int16)
    try:
        assert decode_wav(bytes(payload))["samples"].shape == (1, 1)
    finally:
        del FORMAT_DECODERS[0x55]
