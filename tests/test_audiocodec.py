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
    encode_wav_mulaw,
    mulaw_decode_codewords,
    mulaw_encode,
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


def test_mulaw_known_vectors_and_bijectivity():
    """ITU-T G.711 anchor points, plus encode∘decode = identity on all 256
    codewords except 0x7F (µ-law's negative zero maps to +0 → 0xFF)."""
    assert mulaw_encode(np.array([0]))[0] == 0xFF
    assert mulaw_encode(np.array([-1]))[0] == 0x7F
    assert mulaw_encode(np.array([32767]))[0] == 0x80  # clips to 32635
    assert mulaw_decode_codewords(np.array([0x80]))[0] == 32124
    assert mulaw_decode_codewords(np.array([0xFF]))[0] == 0
    codes = np.arange(256, dtype=np.uint8)
    rt = mulaw_encode(mulaw_decode_codewords(codes))
    assert (rt == codes).sum() == 255
    assert rt[0x7F] == 0xFF  # the lone exception: -0 re-encodes as +0


def test_mulaw_quantization_error_bounded():
    """|dequant(s) - s| is bounded by the segment's step size (8 << e) —
    the defining property of the 8-segment companding curve."""
    s = np.arange(-32768, 32768, 7, dtype=np.int64)
    deq = mulaw_decode_codewords(mulaw_encode(s)).astype(np.int64)
    clipped = np.clip(s, -32635, 32635)
    e = np.clip(
        np.floor(np.log2(np.abs(clipped) + 132)).astype(np.int64) - 7, 0, 7
    )
    assert (np.abs(deq - clipped) <= (8 << e)).all()


def test_mulaw_wav_container_roundtrip():
    """µ-law WAV (tag 7, 8-bit, fact chunk) decodes through the
    FORMAT_DECODERS seam; container metadata is exact and samples equal
    the closed-form dequantization; 2:1 size vs PCM16."""
    for ch in (1, 2):
        s = synthetic_audio(seed=11, n_samples=251, channels=ch)
        payload = encode_wav_mulaw(s, sample_rate=16000, channels=ch)
        d = decode_wav(payload)
        assert (d["sample_rate"], d["channels"], d["bits"]) == (16000, ch, 8)
        assert d["n_samples"] == 251
        want = mulaw_decode_codewords(
            mulaw_encode(s.reshape(-1))
        ).reshape(251, ch)
        assert np.array_equal(d["samples"], want)
        pcm = encode_wav(s, sample_rate=16000, channels=ch)
        assert len(payload) < len(pcm) * 0.6  # genuinely compressed
    # header-only parse works for compressed payloads too
    meta = decode_wav(payload, decode_samples=False)
    assert meta["samples"] is None and meta["n_samples"] == 251


def test_mulaw_wrong_bits_rejected():
    s = synthetic_audio(seed=5, n_samples=16)
    payload = bytearray(encode_wav_mulaw(s))
    at = bytes(payload).index(b"fmt ") + 8
    # corrupt wBitsPerSample to 16: µ-law is defined as 8-bit only
    payload[at + 14 : at + 16] = struct.pack("<H", 16)
    with pytest.raises(UnsupportedAudioError, match="8-bit"):
        decode_wav(bytes(payload))


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
