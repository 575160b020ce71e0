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
    _decode_rle8,
    decode_avi,
    encode_avi,
    encode_avi_rle8,
    rle8_palette,
    synthetic_video,
    synthetic_video_indexed,
)


def _strf_of(payload: bytes) -> bytes:
    at = payload.index(b"strf") + 8
    (sz,) = struct.unpack_from("<I", payload, at - 4)
    return payload[at : at + sz]


def test_rle8_roundtrip_through_plugin_seam():
    """MS-RLE8 AVI (BI_RLE8 spec): every frame decodes back to
    palette[index] exactly, dispatched via FOURCC_DECODERS['MRLE'] with
    the strf palette handed through the extended decoder protocol."""
    pal = rle8_palette()
    idx = synthetic_video_indexed(seed=42, w=13, h=9, n_frames=4)
    payload = encode_avi_rle8(idx, fps=10)
    d = decode_avi(payload)
    assert (d["width"], d["height"], d["n_frames"], d["fps"]) == (13, 9, 4, 10)
    for f, got in enumerate(d["frames"]):
        assert np.array_equal(got, pal[idx[f]]), f
    # selective decode touches only the wanted '00dc' chunks
    d2 = decode_avi(payload, frame_indices=[3])
    assert np.array_equal(d2["frames"][0], pal[idx[3]])
    # the RLE stream itself compresses the run-friendly pattern (the
    # container adds a fixed 1 KiB palette; compare stream vs DIB bits)
    row_dib = ((13 * 3 + 3) & ~3) * 9
    first = payload.index(b"00dc") + 8
    (stream_sz,) = struct.unpack_from("<I", payload, first - 4)
    assert stream_sz < row_dib / 2


def test_rle8_absolute_and_delta_modes():
    """Hand-crafted streams exercise the escape codes the synthetic
    encoder never emits: absolute mode (word-padded) and delta moves."""
    pal = rle8_palette()
    strf = _strf_of(encode_avi_rle8(np.zeros((1, 3, 2), np.uint8)))
    # 3x2: absolute run [5,6,7] on the bottom row, EOL, delta (1,0), run
    # of 2 nines, EOB.  Absolute run of 3 pads to 4 bytes.
    body = bytes([0, 3, 5, 6, 7, 0, 0, 0, 0, 2, 1, 0, 2, 9, 0, 1])
    f = _decode_rle8(body, 3, 2, strf)
    assert np.array_equal(f[1], pal[[5, 6, 7]])  # bottom row, top-down idx 1
    assert np.array_equal(f[0], pal[[0, 9, 9]])  # delta skipped x=0
    # undecoded pixels (early EOB) default to palette[0]
    g = _decode_rle8(bytes([2, 4, 0, 1]), 3, 2, strf)
    assert np.array_equal(g[1], pal[[4, 4, 0]])


def test_rle8_malformed_streams_raise():
    strf = _strf_of(encode_avi_rle8(np.zeros((1, 3, 2), np.uint8)))
    cases = [
        bytes([5, 1]),              # run overflows 3-wide row
        bytes([0, 3, 1, 2, 3]),     # absolute run missing its pad byte
        bytes([1, 1]),              # no end-of-bitmap
        bytes([0, 2, 9]),           # truncated delta
        bytes([0, 0] * 5 + [4, 1]), # EOLs walk above the frame, then a run
    ]
    for body in cases:
        with pytest.raises(UnsupportedVideoError):
            _decode_rle8(body, 3, 2, strf)
    # strf that is not 8bpp/BI_RLE8 is rejected
    with pytest.raises(UnsupportedVideoError):
        _decode_rle8(bytes([0, 1]), 3, 2, b"\x00" * 40)
    with pytest.raises(UnsupportedVideoError):
        _decode_rle8(bytes([0, 1]), 3, 2, None)


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
    FOURCC_DECODERS[b"MJPG"] = lambda body, w, h, strf: np.zeros(
        (h, w, 3), dtype=np.uint8
    )
    try:
        d = decode_avi(bytes(payload))
        assert d["frames"][0].shape == (6, 8, 3)
    finally:
        del FOURCC_DECODERS[b"MJPG"]


def test_rec_list_interleaved_frames():
    """Interleaved AVIs wrap frame chunks in LIST 'rec ' groups — the movi
    walk must recurse into them and find every frame."""
    import numpy as np

    frames = synthetic_video(seed=5, w=8, h=6, n_frames=4)
    payload = bytearray(encode_avi(frames))
    # rebuild the movi list with the 4 '00db' chunks wrapped 2-per-'rec '
    movi_at = bytes(payload).index(b"movi") - 8
    (movi_size,) = struct.unpack_from("<I", payload, movi_at + 4)
    movi_end = movi_at + 8 + movi_size
    chunks = []
    pos = movi_at + 12
    while pos + 8 <= movi_end:
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        if payload[pos : pos + 4][2:4] == b"db":
            chunks.append(bytes(payload[pos : pos + 8 + sz + (sz % 2)]))
        pos += 8 + sz + (sz % 2)
    assert len(chunks) == 4
    recs = b""
    for i in range(0, 4, 2):
        body = b"rec " + chunks[i] + chunks[i + 1]
        recs += b"LIST" + struct.pack("<I", len(body)) + body
    new_movi = b"LIST" + struct.pack("<I", 4 + len(recs)) + b"movi" + recs
    rebuilt = bytes(payload[:movi_at]) + new_movi + bytes(payload[movi_end:])
    rebuilt = rebuilt[:4] + struct.pack("<I", len(rebuilt) - 8) + rebuilt[8:]
    d = decode_avi(rebuilt)
    assert d["n_frames"] == 4
    for got, want in zip(d["frames"], frames):
        assert np.array_equal(got, want)


def test_corrupt_dib_chunk_raises_codec_error_only():
    """Header-valid payloads with a short frame chunk must raise the
    codec's own error (the skip contract callers rely on)."""
    frames = synthetic_video(seed=6, w=8, h=6, n_frames=2)
    payload = bytearray(encode_avi(frames))
    at = bytes(payload).index(b"00db")
    struct.pack_into("<I", payload, at + 4, 4)  # shrink chunk to 4 bytes
    with pytest.raises(UnsupportedVideoError):
        decode_avi(bytes(payload))


def test_implausible_avih_dimensions_fail_cleanly():
    """Round-15 codec sweep: the RLE8 decoder sizes its (h, w) index grid
    from the avih header BEFORE any body check, so a corrupt header with
    multi-GB dimensions must be a typed error, never an allocation."""
    payload = bytearray(encode_avi_rle8(synthetic_video_indexed(7, 8, 6, 2)))
    at = bytes(payload).index(b"avih") + 8
    struct.pack_into("<II", payload, at + 32, 1 << 30, 1 << 30)  # w, h
    with pytest.raises(UnsupportedVideoError, match="implausible"):
        decode_avi(bytes(payload))
    struct.pack_into("<II", payload, at + 32, 0, 6)  # zero width
    with pytest.raises(UnsupportedVideoError, match="implausible"):
        decode_avi(bytes(payload))


def test_truncated_rle8_palette_decodes_black_not_valueerror():
    """Round-15 codec sweep: a strf chunk cut mid-palette previously made
    np.frombuffer raise a raw ValueError (buffer smaller than requested);
    present entries must decode and missing ones come back black."""
    from palletjack_spark.functions.videocodec import _rle8_palette_from_strf

    payload = encode_avi_rle8(synthetic_video_indexed(8, 8, 6, 1))
    full_strf = _strf_of(payload)
    pal = _rle8_palette_from_strf(full_strf[: 40 + 10 * 4])  # 10 entries
    assert pal.shape == (256, 3)
    assert np.array_equal(pal[:10], rle8_palette()[:10])  # present entries
    assert (pal[10:] == 0).all()  # missing entries: black, not a crash
    # a strf with NO palette at all still yields an all-black palette
    assert (_rle8_palette_from_strf(full_strf[:40]) == 0).all()
    # and the truncated-strf payload decodes end-to-end without a raw
    # numpy error: frames come back palette-mapped through the zeros
    short = full_strf[: 40 + 10 * 4]
    got = _decode_rle8(
        payload[payload.index(b"00dc") + 8 :], 8, 6, short
    )
    assert got.shape == (6, 8, 3)
