"""Round-17: the PNG codec (functions/pngcodec.py) — the same
differential + fuzz discipline as the other media codecs, plus
independent anchors: a handcrafted byte-level PNG (built in the test
with raw struct/zlib, not via the encoder) must decode to known pixels,
and every scanline filter is checked against the RFC 2083 recurrences
written as literal per-byte loops."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from palletjack_spark.functions import pngcodec as P
from palletjack_spark.functions.imagecodec import (
    UnsupportedImageError,
    decode_image,
    synthetic_image,
)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _manual_png(
    w, h, color_type, raster_lines, depth=8, interlace=0, extra=b"",
    plte=b"",
):
    """Assemble a PNG byte-by-byte WITHOUT the encoder under test."""
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    out = bytearray(P.PNG_MAGIC) + _chunk(b"IHDR", ihdr)
    if plte:
        out += _chunk(b"PLTE", plte)
    out += extra
    out += _chunk(b"IDAT", zlib.compress(raster_lines))
    out += _chunk(b"IEND", b"")
    return bytes(out)


# --------------------------------------------------------------------
# anchors
# --------------------------------------------------------------------


def test_handcrafted_truecolor_png_decodes_to_known_pixels():
    """2x2 RGB, filter 0 both lines, assembled with raw struct+zlib."""
    lines = bytes([0, 10, 20, 30, 40, 50, 60, 0, 70, 80, 90, 100, 110, 120])
    w, h, px = P.decode_png(_manual_png(2, 2, 2, lines))
    assert (w, h) == (2, 2)
    assert px.tolist() == [
        [[10, 20, 30], [40, 50, 60]],
        [[70, 80, 90], [100, 110, 120]],
    ]


def test_handcrafted_sub_and_up_filters_reconstruct():
    """Filter 1 (Sub) on line 0, filter 2 (Up) on line 1 — deltas
    chosen so reconstruction is obvious by hand: Sub accumulates left
    by bpp=3, Up adds the line above."""
    lines = bytes([1, 10, 20, 30, 5, 5, 5]) + bytes([2, 1, 1, 1, 2, 2, 2])
    _, _, px = P.decode_png(_manual_png(2, 2, 2, lines))
    assert px.tolist() == [
        [[10, 20, 30], [15, 25, 35]],
        [[11, 21, 31], [17, 27, 37]],
    ]


def test_paeth_predictor_matches_rfc_tiebreaks():
    # RFC 2083: ties prefer a, then b, then c
    assert P._paeth(0, 0, 0) == 0
    assert P._paeth(1, 1, 0) == 1  # pa == pb -> a
    assert P._paeth(100, 50, 75) == 75  # c strictly closest to p=75
    assert P._paeth(10, 200, 100) == 100  # p=110: c closest (pc=10)
    assert P._paeth(9, 200, 150) == 9  # p=59: a closest (pa=50)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_each_filter_roundtrips_against_literal_recurrence(ftype):
    """_unfilter_line must invert _filter_line AND match the RFC
    recurrence written as a literal per-byte loop."""
    rng = np.random.default_rng(ftype)
    bpp = 3
    raw = rng.integers(0, 256, 30).astype(np.uint8)
    prev = rng.integers(0, 256, 30).astype(np.uint8)
    filt = P._filter_line(ftype, raw, prev, bpp)
    rec = P._unfilter_line(ftype, filt, prev, bpp)
    assert np.array_equal(rec, raw)
    # literal recurrence
    out = []
    for i in range(len(filt)):
        left = out[i - bpp] if i >= bpp else 0
        up = int(prev[i])
        upleft = int(prev[i - bpp]) if i >= bpp else 0
        pred = {
            0: 0,
            1: left,
            2: up,
            3: (left + up) // 2,
            4: P._paeth(left, up, upleft),
        }[ftype]
        out.append((int(filt[i]) + pred) & 0xFF)
    assert out == list(rec)


# --------------------------------------------------------------------
# roundtrips
# --------------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    w=st.integers(1, 33),
    h=st.integers(1, 33),
    mode=st.sampled_from(["none", "cycle"]),
)
def test_random_rgb_roundtrips_exact(seed, w, h, mode):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    w2, h2, out = P.decode_png(P.encode_png(px, filter_mode=mode))
    assert (w2, h2) == (w, h) and np.array_equal(out, px)


def test_grayscale_and_palette_roundtrip():
    g = np.arange(77, dtype=np.uint8).reshape(7, 11) * 3
    _, _, out = P.decode_png(P.encode_png(g))
    assert all(np.array_equal(out[:, :, c], g) for c in range(3))
    sp = synthetic_image(42, 23, 19)  # <= 256 distinct colors by design
    _, _, out = P.decode_png(P.encode_png(sp, palette=True))
    assert np.array_equal(out, sp)


def test_rgba_and_gray_alpha_drop_alpha():
    rng = np.random.default_rng(7)
    rgba = rng.integers(0, 256, (4, 5, 4)).astype(np.uint8)
    lines = b"".join(bytes([0]) + rgba[y].tobytes() for y in range(4))
    _, _, out = P.decode_png(_manual_png(5, 4, 6, lines))
    assert np.array_equal(out, rgba[:, :, :3])
    ga = rng.integers(0, 256, (3, 4, 2)).astype(np.uint8)
    lines = b"".join(bytes([0]) + ga[y].tobytes() for y in range(3))
    _, _, out = P.decode_png(_manual_png(4, 3, 4, lines))
    assert all(np.array_equal(out[:, :, c], ga[:, :, 0]) for c in range(3))


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    w=st.integers(1, 21),
    h=st.integers(1, 21),
)
def test_adam7_interlaced_roundtrips_exact(seed, w, h):
    """Interlaced emit/decode is pixel-exact for every geometry,
    including frames smaller than the 8x8 Adam7 macro-cell (where some
    passes are empty)."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    w2, h2, out = P.decode_png(P.encode_png(px, interlace=True))
    assert (w2, h2) == (w, h) and np.array_equal(out, px)
    # and interlaced bytes differ from sequential (same pixels)
    assert P.encode_png(px, interlace=True) != P.encode_png(px)


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_subbyte_palette_roundtrips(depth):
    rng = np.random.default_rng(depth)
    ncolors = 1 << depth
    colors = rng.integers(0, 256, (ncolors, 3)).astype(np.uint8)
    px = colors[rng.integers(0, ncolors, (11, 7))]
    for interlace in (False, True):
        _, _, out = P.decode_png(
            P.encode_png(px, palette=True, depth=depth, interlace=interlace)
        )
        assert np.array_equal(out, px), (depth, interlace)
    with pytest.raises(ValueError, match="do not fit"):
        too_many = np.arange(24, dtype=np.uint8).reshape(8, 1, 3)
        P.encode_png(too_many, palette=True, depth=1)


def test_16bit_samples_present_high_byte():
    rng = np.random.default_rng(9)
    g16 = rng.integers(0, 65536, (4, 5)).astype(">u2")
    lines = b"".join(bytes([0]) + g16[y].tobytes() for y in range(4))
    _, _, out = P.decode_png(_manual_png(5, 4, 0, lines, depth=16))
    assert np.array_equal(out[:, :, 0], (g16 >> 8).astype(np.uint8))
    rgb16 = rng.integers(0, 65536, (3, 4, 3)).astype(">u2")
    lines = b"".join(bytes([0]) + rgb16[y].tobytes() for y in range(3))
    _, _, out = P.decode_png(_manual_png(4, 3, 2, lines, depth=16))
    assert np.array_equal(out, (rgb16 >> 8).astype(np.uint8))


def test_subbyte_grayscale_scales_to_full_range():
    """2-bit gray codes 0..3 must present as 0/85/170/255 — the RFC's
    v * 255 / (2^d - 1) sample scaling, built by hand bit by bit."""
    vals = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    bits = np.packbits(
        ((vals[:, :, None] & np.array([2, 1], dtype=np.uint8)) > 0)
        .astype(np.uint8)
        .reshape(2, 8),
        axis=1,
    )
    lines = b"".join(bytes([0]) + bits[y].tobytes() for y in range(2))
    _, _, out = P.decode_png(_manual_png(4, 2, 0, lines, depth=2))
    assert out[:, :, 0].tolist() == [[0, 85, 170, 255], [255, 170, 85, 0]]


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_mutated_interlaced_png_never_crashes_with_foreign_exception(data):
    rng = np.random.default_rng(5)
    colors = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    img = colors[rng.integers(0, 16, (11, 13))]
    base = P.encode_png(img, palette=True, depth=4, interlace=True)
    buf = bytearray(base)
    for _ in range(data.draw(st.integers(1, 8))):
        i = data.draw(st.integers(0, len(buf) - 1))
        buf[i] = data.draw(st.integers(0, 255))
    cut = data.draw(st.integers(0, len(buf)))
    try:
        P.decode_png(bytes(buf[:cut]))
    except UnsupportedImageError:
        pass  # the only acceptable failure mode


def test_registry_dispatch():
    sp = synthetic_image(3, 9, 6)
    d = decode_image(P.encode_png(sp))
    assert (d["width"], d["height"]) == (9, 6)
    assert np.array_equal(d["pixels"], sp)


def test_ancillary_chunks_skipped_but_crc_checked():
    sp = synthetic_image(5, 6, 6)
    lines = b"".join(bytes([0]) + sp[y].tobytes() for y in range(6))
    good = _chunk(b"tEXt", b"Comment\x00hi")
    _, _, out = P.decode_png(_manual_png(6, 6, 2, lines, extra=good))
    assert np.array_equal(out, sp)
    bad = bytearray(good)
    bad[-1] ^= 0xFF
    with pytest.raises(UnsupportedImageError, match="CRC"):
        P.decode_png(_manual_png(6, 6, 2, lines, extra=bytes(bad)))


# --------------------------------------------------------------------
# corrupt / out-of-profile input
# --------------------------------------------------------------------


def test_unsupported_profiles_are_typed():
    sp = synthetic_image(1, 4, 4)
    lines = b"".join(bytes([0]) + sp[y].tobytes() for y in range(4))
    # illegal depth/color combinations (RFC 2083 §4.1.1 matrix)
    with pytest.raises(UnsupportedImageError, match="illegal"):
        P.decode_png(_manual_png(4, 4, 3, lines, depth=16))  # 16-bit palette
    with pytest.raises(UnsupportedImageError, match="illegal"):
        P.decode_png(_manual_png(4, 4, 2, lines, depth=2))  # 2-bit truecolor
    with pytest.raises(UnsupportedImageError, match="color type"):
        P.decode_png(_manual_png(4, 4, 5, lines))
    with pytest.raises(UnsupportedImageError, match="interlace"):
        P.decode_png(_manual_png(4, 4, 2, lines, interlace=2))
    with pytest.raises(UnsupportedImageError, match="PLTE"):
        idx_lines = b"".join(bytes([0, y, y, y, y]) for y in range(4))
        P.decode_png(_manual_png(4, 4, 3, idx_lines))


def test_dimension_bombs_rejected_before_allocation():
    """A ~100-byte payload declaring huge dims must be a typed error —
    PNG's zlib stream, like JPEG's entropy stream, can declare far more
    pixels than the payload carries bytes."""
    lines = bytes([0, 1, 2, 3])
    with pytest.raises(UnsupportedImageError, match="implausible"):
        P.decode_png(_manual_png(0, 4, 2, lines))
    with pytest.raises(UnsupportedImageError, match="pixel decode cap"):
        P.decode_png(_manual_png(8192, 8192, 2, lines))


def test_zlib_stream_size_mismatches_are_typed():
    sp = synthetic_image(9, 4, 4)
    lines = b"".join(bytes([0]) + sp[y].tobytes() for y in range(4))
    # short: raster for a 4x4 declared as 4x5
    with pytest.raises(UnsupportedImageError, match="short"):
        P.decode_png(_manual_png(4, 5, 2, lines))
    # long: raster for 4x4 declared as 4x3 (a bomb's shape — the
    # inflate is clamped at the declared size and the excess is typed)
    with pytest.raises(UnsupportedImageError, match="larger than declared"):
        P.decode_png(_manual_png(4, 3, 2, lines))


def test_bad_filter_byte_and_palette_overflow_are_typed():
    sp = synthetic_image(2, 3, 2)
    lines = bytes([7]) + sp[0].tobytes() + bytes([0]) + sp[1].tobytes()
    with pytest.raises(UnsupportedImageError, match="filter type"):
        P.decode_png(_manual_png(3, 2, 2, lines))
    # palette index past the PLTE
    plte = bytes([0, 0, 0, 255, 255, 255])  # 2 entries
    idx_lines = bytes([0, 0, 1, 5]) + bytes([0, 1, 0, 1])
    with pytest.raises(UnsupportedImageError, match="out of range"):
        P.decode_png(_manual_png(3, 2, 3, idx_lines, plte=plte))


def test_chunk_length_past_eof_is_typed():
    payload = P.encode_png(synthetic_image(0, 4, 4))
    buf = bytearray(payload)
    # inflate the IDAT chunk's declared length
    off = payload.index(b"IDAT") - 4
    struct.pack_into(">I", buf, off, 1 << 30)
    with pytest.raises(UnsupportedImageError, match="past EOF"):
        P.decode_png(bytes(buf))


@settings(max_examples=120, deadline=None)
@given(data=st.binary(max_size=512))
def test_garbage_never_crashes_with_foreign_exception(data):
    try:
        P.decode_png(P.PNG_MAGIC + data)
    except UnsupportedImageError:
        pass


@settings(max_examples=80, deadline=None)
@given(data=st.data())
def test_mutated_png_never_crashes_with_foreign_exception(data):
    base = P.encode_png(synthetic_image(11, 12, 9), palette=True)
    buf = bytearray(base)
    for _ in range(data.draw(st.integers(1, 8))):
        i = data.draw(st.integers(0, len(buf) - 1))
        buf[i] = data.draw(st.integers(0, 255))
    cut = data.draw(st.integers(0, len(buf)))
    try:
        P.decode_png(bytes(buf[:cut]))
    except UnsupportedImageError:
        pass  # the only acceptable failure mode
