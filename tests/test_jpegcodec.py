"""Round-16: the baseline JPEG codec (functions/jpegcodec.py) — the
same differential + fuzz discipline as the other media codecs, plus
independent math anchors: the DCT pair is checked against the textbook
double-loop definition (not just self-consistency), and the decoded
fixture values are checked against the closed form the q94g oracle
states in SQL."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from palletjack_spark.functions import jpegcodec as J
from palletjack_spark.functions.imagecodec import (
    UnsupportedImageError,
    decode_image,
)


def _find_marker(payload: bytes, marker: int) -> int:
    """Offset of the 0xFF byte of the first occurrence of a marker."""
    i = 2
    while i + 1 < len(payload):
        assert payload[i] == 0xFF
        if payload[i + 1] == marker:
            return i
        seg_len = struct.unpack_from(">H", payload, i + 2)[0]
        i += 2 + seg_len
    raise AssertionError(f"marker {marker:#x} not found")


# --------------------------------------------------------------------
# math anchors
# --------------------------------------------------------------------

def _reference_dct(block: np.ndarray) -> np.ndarray:
    """T.81 A.3.3 FDCT, written as the literal double loop."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / math.sqrt(2) if u == 0 else 1.0
            cv = 1 / math.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[u, v] = 0.25 * cu * cv * s
    return out


def test_dct_matrix_matches_textbook_definition():
    rng = np.random.default_rng(1)
    block = rng.uniform(-128, 127, (8, 8))
    fast = J._A @ block @ J._A.T
    assert np.allclose(fast, _reference_dct(block), atol=1e-9)
    # and the pair inverts
    assert np.allclose(J._A.T @ fast @ J._A, block, atol=1e-9)


def test_constant_block_dc_is_8c():
    c = 77.0
    coeffs = J._A @ np.full((8, 8), c - 128.0) @ J._A.T
    assert abs(coeffs[0, 0] - 8 * (c - 128)) < 1e-9
    assert np.abs(coeffs).sum() - abs(coeffs[0, 0]) < 1e-9


def test_zigzag_is_the_standard_order():
    zz = J.ZIGZAG
    assert len(zz) == 64 and len(set(zz)) == 64
    assert zz[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    assert zz[-4:] == [(6, 7), (7, 6), (7, 7)][-3:] or True
    assert zz[63] == (7, 7) and zz[62] == (7, 6) and zz[61] == (6, 7)


def test_single_ac_basis_block_roundtrips_exactly():
    """A block that is exactly one AC basis function times a quantizer
    multiple survives encode→decode bit-exactly (quantization is then
    lossless), proving the AC Huffman path, zigzag placement, and IDCT
    scale — not just the DC path the q94g fixture leans on."""
    u, v = 2, 1
    q = int(J.QUANT_LUMA[u, v])  # 13
    coeffs = np.zeros((8, 8))
    coeffs[u, v] = 3 * q
    coeffs[0, 0] = 8 * (140 - 128)  # DC offset keeps pixels in range
    spatial = J._A.T @ coeffs @ J._A + 128
    assert spatial.min() > 0 and spatial.max() < 255
    # use the nearest integer image; its DCT is within quantizer slack
    px = np.floor(spatial + 0.5).astype(np.uint8)
    gray = np.repeat(px[:, :, None], 3, axis=2)
    w, h, out = J.decode_jpeg(J.encode_jpeg(gray, subsampling="444"))
    # decode must recover the quantized surface: re-derive it exactly
    qc = np.floor((J._A @ (px - 128.0) @ J._A.T) / J.QUANT_LUMA + 0.5 + 1e-7)
    expect = np.clip(
        np.floor(J._A.T @ (qc * J.QUANT_LUMA) @ J._A + 128.5), 0, 255
    ).astype(np.uint8)
    assert qc[u, v] == 3  # the AC coefficient really was exercised
    assert np.array_equal(out[:, :, 0], expect)


# --------------------------------------------------------------------
# closed-form fixture (the q94g oracle contract)
# --------------------------------------------------------------------

@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 255),
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    sub=st.sampled_from(["444", "420"]),
    ri=st.sampled_from([0, 1, 3]),
)
def test_block_constant_fixture_decodes_to_closed_form(seed, w, h, sub, ri):
    px = J.synthetic_block_image(seed, w, h)
    W, H, out = J.decode_jpeg(
        J.encode_jpeg(px, subsampling=sub, restart_interval=ri)
    )
    assert (W, H) == (w, h)
    for y, x in [(0, 0), (h // 2, w // 2), (h - 1, w - 1)]:
        v = (seed + (y // 8) * 7 + (x // 8) * 3) % 256
        want = J.decoded_block_value(v)
        assert int(out[y, x, 0]) == want
        assert int(out[y, x, 1]) == want and int(out[y, x, 2]) == want


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), w=st.integers(1, 32), h=st.integers(1, 32))
def test_random_blockwise_constant_images_exact(seed, w, h):
    """ANY per-block-constant gray image — not just the fixture pattern —
    hits the closed form exactly (all three encode shapes)."""
    rng = np.random.default_rng(seed)
    by, bx = (h + 7) // 8, (w + 7) // 8
    vals = rng.integers(0, 256, (by, bx))
    ys, xs = np.mgrid[0:h, 0:w]
    gray = vals[ys // 8, xs // 8].astype(np.uint8)
    rgb = np.repeat(gray[:, :, None], 3, axis=2)
    want = np.vectorize(J.decoded_block_value)(gray)
    for payload in (
        J.encode_jpeg(rgb, "420"),
        J.encode_jpeg(rgb, "444"),
        J.encode_jpeg(gray),
    ):
        _, _, out = J.decode_jpeg(payload)
        assert np.array_equal(out[:, :, 0].astype(int), want)


def test_smooth_image_reconstructs_closely():
    yv, xv = np.mgrid[0:32, 0:48]
    smooth = np.stack([(yv * 2 + xv) % 200 + 20] * 3, -1).astype(np.uint8)
    _, _, out = J.decode_jpeg(J.encode_jpeg(smooth, subsampling="444"))
    assert np.abs(out.astype(int) - smooth.astype(int)).max() <= 4


def test_registry_dispatch_and_lazy_registration():
    payload = J.encode_jpeg(J.synthetic_block_image(9, 10, 10))
    d = decode_image(payload)
    assert (d["width"], d["height"]) == (10, 10)
    # the lazy path: even with the entry removed, decode_image re-imports
    from palletjack_spark.functions.imagecodec import REGISTRY

    REGISTRY.pop(b"\xff\xd8")
    try:
        assert decode_image(payload)["width"] == 10
    finally:
        REGISTRY[b"\xff\xd8"] = J.decode_jpeg
    assert b"\xff\xd8" in REGISTRY


# --------------------------------------------------------------------
# corrupt inputs / unsupported profiles
# --------------------------------------------------------------------

def _fixture_payload(**kw) -> bytes:
    return J.encode_jpeg(J.synthetic_block_image(7, 18, 13), **kw)


def test_unsupported_processes_rejected_with_named_profile():
    # lossless (SOF3) and arithmetic-coded (SOFA) stay typed rejections
    for sof in (0xC3, 0xCA):
        buf = bytearray(_fixture_payload())
        buf[_find_marker(bytes(buf), 0xC0) + 1] = sof
        with pytest.raises(UnsupportedImageError, match="unsupported"):
            J.decode_jpeg(bytes(buf))


# --------------------------------------------------------------------
# progressive (SOF2, round 17)
# --------------------------------------------------------------------


@pytest.mark.parametrize(
    "h,w,gray,sub",
    [
        (8, 8, True, "444"),
        (24, 18, True, "444"),
        (16, 16, False, "420"),
        (17, 23, False, "420"),
        (16, 24, False, "444"),
        (1, 1, True, "444"),
        (9, 50, False, "420"),
    ],
)
def test_progressive_decodes_bit_equal_to_baseline(h, w, gray, sub):
    """The progressive scan script encodes the SAME quantized
    coefficients as the baseline path, so decode must be bit-equal —
    and the baseline decode is independently anchored to the textbook
    DCT and the closed-form fixture values, so this pins the whole
    Annex-G entropy layer (DC first/refine, two AC spectral bands with
    EOBRUN, full AC refinement)."""
    rng = np.random.default_rng(h * 100 + w)
    img = rng.integers(0, 256, (h, w) if gray else (h, w, 3)).astype(np.uint8)
    base = J.decode_jpeg(J.encode_jpeg(img, subsampling=sub))
    prog = J.decode_jpeg(J.encode_jpeg(img, subsampling=sub, progressive=True))
    assert base[0] == prog[0] and base[1] == prog[1]
    assert np.array_equal(base[2], prog[2])


def test_progressive_block_constant_fixture_matches_closed_form():
    """The q94i oracle anchor: the per-block-constant gray fixture
    decodes from the PROGRESSIVE stream to exactly the same closed form
    the q94g oracle states for the baseline stream."""
    for seed, w, h in [(7, 18, 13), (0, 8, 8), (255, 23, 21)]:
        img = J.synthetic_block_image(seed, w, h)
        ww, hh, px = J.decode_jpeg(
            J.encode_jpeg(img, subsampling="420", progressive=True)
        )
        assert (ww, hh) == (w, h)
        for yy, xx in [(0, 0), (hh // 2, ww // 2), (hh - 1, ww - 1)]:
            v = (seed + (yy // 8) * 7 + (xx // 8) * 3) % 256
            assert int(px[yy, xx, 0]) == J.decoded_block_value(v)


def test_progressive_stream_is_sof2_multi_scan():
    payload = J.encode_jpeg(J.synthetic_block_image(3, 16, 16), progressive=True)
    assert b"\xff\xc2" in payload and b"\xff\xc0" not in payload
    # DC first + DC refine + 3 components x (2 AC bands + AC refine)
    assert payload.count(b"\xff\xda") == 11
    with pytest.raises(ValueError, match="baseline-scan option"):
        J.encode_jpeg(
            J.synthetic_block_image(3, 16, 16),
            progressive=True,
            restart_interval=2,
        )


def test_progressive_scan_header_validation():
    """Malformed progressive scan headers are typed errors."""
    payload = bytearray(
        J.encode_jpeg(J.synthetic_block_image(1, 8, 8), progressive=True)
    )
    sos = payload.index(b"\xff\xda")
    # first scan is DC (ns=1 here since grayscale): corrupt Ss/Se band
    # bytes — grayscale SOS body: [ns, cs, tt, Ss, Se, AhAl]
    bad = bytearray(payload)
    bad[sos + 7] = 70  # Se = 70 > 63
    with pytest.raises(UnsupportedImageError):
        J.decode_jpeg(bytes(bad))


def test_handbuilt_progressive_stream_decodes_like_handbuilt_baseline():
    """Spec anchor independent of our encoder: a progressive stream
    written bit-by-bit from T.81 Annex G (DC first Al=1 'diff 3', DC
    refinement bit 0, AC first Al=1 'coef +2 at k=1 then EOB', AC
    refinement 'EOB then correction bit 1') must yield coefficients
    DC=6, AC[1]=+5 — the same block a hand-built BASELINE stream codes
    directly.  If encoder and decoder shared a consistent
    misunderstanding of the scan bit layout, this hand-derivation
    would catch it."""

    def dqt_all_ones():
        return b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)

    def dht(tc, bits, vals):
        body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    def sos(ss, se, ahal):
        body = bytes([1, 1, 0x00, ss, se, ahal])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    def bits_to_bytes(s):
        s = s + "1" * (-len(s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))

    one_code = [1] + [0] * 15  # one 1-bit code: "0"
    two_codes = [0, 2] + [0] * 14  # two 2-bit codes: "00", "01"

    prog = bytearray(b"\xff\xd8")
    prog += dqt_all_ones()
    prog += b"\xff\xc2" + struct.pack(">H", 11) + struct.pack(
        ">BHHB", 8, 8, 8, 1
    ) + bytes([1, 0x11, 0])
    # scan 1 — DC first, Al=1: category 2 ("0"), magnitude 3 ("11")
    prog += dht(0, one_code, [2]) + sos(0, 0, 0x01)
    prog += bits_to_bytes("0" + "11")
    # scan 2 — DC refinement to Al=0: one raw bit, 0 (6 & 1 == 0)
    prog += sos(0, 0, 0x10)
    prog += bits_to_bytes("0")
    # scan 3 — AC first 1..63, Al=1: (run 0, size 2) -> +2 at k=1, EOB
    prog += dht(1, two_codes, [0x02, 0x00]) + sos(1, 63, 0x01)
    prog += bits_to_bytes("00" + "10" + "01")
    # scan 4 — AC refinement to Al=0: EOB(r=0), then the correction
    # bit for the nonzero-history coefficient at k=1 (4 -> 5)
    prog += dht(1, one_code, [0x00]) + sos(1, 63, 0x10)
    prog += bits_to_bytes("0" + "1")
    prog += b"\xff\xd9"

    base = bytearray(b"\xff\xd8")
    base += dqt_all_ones()
    base += b"\xff\xc0" + struct.pack(">H", 11) + struct.pack(
        ">BHHB", 8, 8, 8, 1
    ) + bytes([1, 0x11, 0])
    # DC category 3 ("0" + "110" = +6); AC (0,3) -> +5 ("101"); EOB
    base += dht(0, one_code, [3]) + dht(1, two_codes, [0x03, 0x00])
    base += sos(0, 63, 0x00)
    base += bits_to_bytes("0" + "110" + "00" + "101" + "01")
    base += b"\xff\xd9"

    wp, hp, px_prog = J.decode_jpeg(bytes(prog))
    wb, hb, px_base = J.decode_jpeg(bytes(base))
    assert (wp, hp) == (wb, hb) == (8, 8)
    assert np.array_equal(px_prog, px_base)
    # and the coefficients are what the derivation says: DC=6 shifts
    # the whole block by 6/8 of a level; AC[1] tilts it — distinct
    # from a DC-only block
    dc_only = bytearray(b"\xff\xd8") + dqt_all_ones()
    dc_only += b"\xff\xc0" + struct.pack(">H", 11) + struct.pack(
        ">BHHB", 8, 8, 8, 1
    ) + bytes([1, 0x11, 0])
    dc_only += dht(0, one_code, [3]) + dht(1, one_code, [0x00])
    dc_only += sos(0, 63, 0x00) + bits_to_bytes("0" + "110" + "0")
    dc_only += b"\xff\xd9"
    _, _, px_dc = J.decode_jpeg(bytes(dc_only))
    assert not np.array_equal(px_prog, px_dc)


@settings(max_examples=80, deadline=None)
@given(data=st.data())
def test_mutated_progressive_jpeg_never_crashes_with_foreign_exception(data):
    buf = bytearray(
        J.encode_jpeg(J.synthetic_block_image(9, 24, 16), progressive=True)
    )
    for _ in range(data.draw(st.integers(1, 8))):
        i = data.draw(st.integers(0, len(buf) - 1))
        buf[i] = data.draw(st.integers(0, 255))
    cut = data.draw(st.integers(0, len(buf)))
    try:
        J.decode_jpeg(bytes(buf[:cut]))
    except UnsupportedImageError:
        pass  # the only acceptable failure mode


def test_16bit_quant_table_rejected():
    buf = bytearray(_fixture_payload())
    off = _find_marker(bytes(buf), 0xDB)
    buf[off + 4] |= 0x10  # Pq=1
    with pytest.raises(UnsupportedImageError, match="16-bit"):
        J.decode_jpeg(bytes(buf))


def test_implausible_dimensions_rejected_before_allocation():
    buf = bytearray(_fixture_payload())
    off = _find_marker(bytes(buf), 0xC0)
    struct.pack_into(">HH", buf, off + 5, 65535, 65535)
    # 65535 <= MAX_DIM(65536): craft one past the cap via the zero side
    struct.pack_into(">HH", buf, off + 5, 0, 18)
    with pytest.raises(UnsupportedImageError, match="implausible"):
        J.decode_jpeg(bytes(buf))


def test_tiny_payload_huge_declared_dims_rejected_before_allocation():
    """Round-16 ADVICE: JPEG's entropy coding means payload size does
    not bound pixel count, so a ~100-byte payload declaring enormous
    dimensions must be a typed error BEFORE the coefficient buffers are
    sized from the header — never a multi-GB np.zeros."""
    import time

    buf = bytearray(_fixture_payload())
    off = _find_marker(bytes(buf), 0xC0)
    # 4096x4095 stays under MAX_PIXELS (so the area cap alone doesn't
    # catch it) but needs ~196k coefficient blocks from a ~200-byte
    # entropy stream: the one-bit-per-block payload bound must fire
    struct.pack_into(">HH", buf, off + 5, 4095, 4096)
    t0 = time.monotonic()
    with pytest.raises(UnsupportedImageError, match="one bit"):
        J.decode_jpeg(bytes(buf))
    assert time.monotonic() - t0 < 1.0  # rejected up front, not decoded


def test_declared_area_cap_rejected():
    buf = bytearray(_fixture_payload())
    off = _find_marker(bytes(buf), 0xC0)
    # both dims within MAX_DIM but the product exceeds MAX_PIXELS
    struct.pack_into(">HH", buf, off + 5, 8192, 8192)
    with pytest.raises(UnsupportedImageError, match="pixel decode cap"):
        J.decode_jpeg(bytes(buf))


def test_marker_pad_bits_are_bounded():
    """Round-16 ADVICE: at a real marker the bit reader feeds synthetic
    1-bits (the spec's pad) — uncapped, and with a crafted Huffman
    table where the all-ones pad IS a valid code, the scan 'decodes'
    every remaining declared block from the endless pad: unbounded CPU
    and a silent garbage success from a stream that physically ended.
    Craft exactly that (two 1-bit codes, so code '1' -> symbol 0 = DC
    cat 0 / AC EOB; entropy bytes all 0xFF via stuffing) with enough
    real bytes to pass the one-bit-per-block payload bound, and require
    a typed error when the scan runs past the terminating marker."""
    bits = bytes([2] + [0] * 15)
    vals = bytes([0, 0])
    dht = lambda tc: (  # noqa: E731
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + 2)
        + bytes([tc << 4])
        + bits
        + vals
    )
    payload = (
        b"\xff\xd8"
        + b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
        + b"\xff\xc0" + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, 128, 128, 1) + bytes([1, 0x11, 0])
        + dht(0) + dht(1)
        + b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
        + b"\xff\x00" * 40  # 40 real all-ones bytes: 320 bits = 160 blocks
        + b"\xff\xd9"
    )
    # the 128x128 grayscale frame declares 256 blocks; the payload bound
    # (>= 1 bit/block = 32 bytes) passes, so only the pad cap can stop
    # the remaining ~96 blocks from decoding out of synthetic pad
    with pytest.raises(UnsupportedImageError, match="marker boundary"):
        J.decode_jpeg(payload)


def test_zero_quant_entry_rejected():
    buf = bytearray(_fixture_payload())
    off = _find_marker(bytes(buf), 0xDB)
    buf[off + 5] = 0
    with pytest.raises(UnsupportedImageError, match="zero entry"):
        J.decode_jpeg(bytes(buf))


def test_truncated_entropy_stream_is_typed_error():
    payload = _fixture_payload()
    sos = _find_marker(payload, 0xDA)
    for cut in (sos + 14, len(payload) - 4):
        with pytest.raises(UnsupportedImageError):
            J.decode_jpeg(payload[:cut])


@settings(max_examples=120, deadline=None)
@given(data=st.binary(max_size=512))
def test_garbage_never_crashes_with_foreign_exception(data):
    try:
        J.decode_jpeg(data)
    except UnsupportedImageError:
        pass


@settings(max_examples=80, deadline=None)
@given(data=st.data())
def test_mutated_jpeg_never_crashes_with_foreign_exception(data):
    buf = bytearray(_fixture_payload(restart_interval=2))
    for _ in range(data.draw(st.integers(1, 8))):
        i = data.draw(st.integers(0, len(buf) - 1))
        buf[i] = data.draw(st.integers(0, 255))
    cut = data.draw(st.integers(0, len(buf)))
    try:
        J.decode_jpeg(bytes(buf[:cut]))
    except UnsupportedImageError:
        pass  # the only acceptable failure mode
