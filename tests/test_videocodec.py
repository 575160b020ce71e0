"""Unit tests for the pure-numpy uncompressed-AVI codec (videocodec.py):
round-trip identity, RIFF-walk robustness (JUNK chunks, truncation),
selective frame decode, and the unsupported-codec plug-in contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from palletjack_spark.functions.videocodec import (
    FOURCC_DECODERS,
    UnsupportedVideoError,
    decode_avi,
    encode_avi,
    synthetic_video,
)


def test_roundtrip_identity():
    frames = synthetic_video(seed=42, w=13, h=9, n_frames=5)  # odd w: row pad
    payload = encode_avi(frames, fps=10)
    d = decode_avi(payload)
    assert (d["width"], d["height"], d["n_frames"]) == (13, 9, 5)
    assert d["declared_frames"] == 5 and d["fps"] == 10
    assert len(d["frames"]) == 5
    for got, want in zip(d["frames"], frames):
        assert np.array_equal(got, want)


def test_selective_frame_decode():
    frames = synthetic_video(seed=7, w=8, h=6, n_frames=8)
    payload = encode_avi(frames)
    d = decode_avi(payload, frame_indices=[0, 3, 7])
    assert len(d["frames"]) == 3
    assert np.array_equal(d["frames"][1], frames[3])
    # header-only parse decodes zero frames but full metadata
    meta = decode_avi(payload, frame_indices=[])
    assert meta["frames"] == [] and meta["n_frames"] == 8


def test_header_fields_match_spec_offsets():
    """Pin the binary layout: avih at the documented offsets."""
    payload = encode_avi(synthetic_video(seed=1, w=16, h=10, n_frames=3))
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    # RIFF size covers everything after the 8-byte header
    assert struct.unpack_from("<I", payload, 4)[0] == len(payload) - 8
    assert payload[12:16] == b"LIST" and payload[20:24] == b"hdrl"
    assert payload[24:28] == b"avih"
    w, h = struct.unpack_from("<II", payload, 32 + 32)
    assert (w, h) == (16, 10)


def test_junk_chunks_skipped():
    """Foreign top-level chunks (JUNK padding is ubiquitous in real AVIs)
    must be skipped per the RIFF spec."""
    frames = synthetic_video(seed=3, w=8, h=6, n_frames=2)
    payload = bytearray(encode_avi(frames))
    junk = b"JUNK" + struct.pack("<I", 6) + b"abcdef"
    # splice JUNK between hdrl and movi: find movi LIST start
    movi_at = bytes(payload).index(b"movi") - 8
    payload[movi_at:movi_at] = junk
    # patch the RIFF size
    payload[4:8] = struct.pack("<I", len(payload) - 8)
    d = decode_avi(bytes(payload))
    assert d["n_frames"] == 2
    assert np.array_equal(d["frames"][1], frames[1])


def test_truncated_and_invalid_payloads_raise():
    frames = synthetic_video(seed=3, w=8, h=6, n_frames=2)
    payload = encode_avi(frames)
    with pytest.raises(UnsupportedVideoError):
        decode_avi(payload[: len(payload) // 2])
    with pytest.raises(UnsupportedVideoError):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(UnsupportedVideoError):
        decode_avi(b"not a riff at all")
    with pytest.raises(NotImplementedError):  # plug-in contract
        decode_avi(b"")


def test_compressed_fourcc_requires_registered_decoder():
    frames = synthetic_video(seed=9, w=8, h=6, n_frames=2)
    payload = bytearray(encode_avi(frames))
    at = bytes(payload).index(b"vids") + 4
    assert payload[at : at + 4] == b"DIB "
    payload[at : at + 4] = b"MJPG"
    with pytest.raises(UnsupportedVideoError, match="MJPG"):
        decode_avi(bytes(payload))
    # registering a decoder makes the same payload readable
    FOURCC_DECODERS[b"MJPG"] = lambda body, w, h: np.zeros(
        (h, w, 3), dtype=np.uint8
    )
    try:
        d = decode_avi(bytes(payload))
        assert d["frames"][0].shape == (6, 8, 3)
    finally:
        del FOURCC_DECODERS[b"MJPG"]
