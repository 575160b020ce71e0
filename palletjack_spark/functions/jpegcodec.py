"""Baseline JPEG (ITU-T T.81 / JFIF) codec in pure numpy.

The single biggest real-user reach gain in the multimodal family: every
real image corpus is JPEG first.  This module implements the baseline
sequential DCT process from the PUBLIC specification — Huffman entropy
coding, zigzag ordering, quantization, the 8x8 type-II DCT pair, YCbCr
color conversion, and 4:2:0 / 4:2:2 chroma subsampling — with numpy
only (no imaging libraries exist in this container), and plugs into the
:data:`palletjack_spark.functions.imagecodec.REGISTRY` seam under the
``\\xff\\xd8`` magic like every other codec.

Scope (baseline plus progressive — the two DCT processes that cover
essentially every real-world JPEG):

* decode: SOF0/SOF1 sequential frames AND SOF2 progressive frames
  (round 17 — the format most web JPEGs actually use): spectral
  selection bands, successive approximation with DC and AC first +
  refinement scans, EOBRUN runs, multi-scan accumulation; 8-bit
  samples, 1 or 3 components, sampling factors 1-2, any DHT/DQT the
  file carries, restart intervals in both processes.  Lossless,
  hierarchical, arithmetic-coded, and 12-bit inputs raise a typed
  :class:`UnsupportedImageError` naming the profile.
* encode: grayscale or YCbCr 4:4:4 / 4:2:0, the Annex-K example
  quantization tables at their published values, and intentionally
  SIMPLE flat-length Huffman tables (12 DC symbols at 4 bits, 162 AC
  symbols at 8 bits — a valid canonical code; any conformant decoder,
  including this one, reads the tables from the DHT segment, so table
  choice affects only compression ratio, never correctness).
  ``progressive=True`` emits an SOF2 scan script covering every
  Annex-G scan kind with coefficients IDENTICAL to the baseline
  encoding, so the two forms decode bit-equal (pinned in tests).

Determinism contract (what makes the q94g oracle closed-form): the
quantizer rounds ``floor(x + 0.5 + 1e-7)`` — half-up with a bias that
swallows float-DCT noise around exact .5 boundaries — and the standard
luma table's DC step is 16, so a constant 8x8 block of value ``v``
decodes to exactly ``clamp(floor((v-128)/2 + 0.5)*2 + 128, 0, 255)``.

Corrupt-input posture mirrors the other codecs (the reference's Thrift
bounds discipline, palletjack.cc:82-83): dimension caps before any
allocation, segment-length bounds checks, truncated-stream errors.
Unlike BMP/PPM, a JPEG payload's SIZE does not bound its pixel count
(entropy coding compresses), so the coefficient allocation is bounded
two ways (round-16 ADVICE): total declared pixels are capped at
:data:`MAX_PIXELS` (well below ``MAX_DIM**2``), and the scan refuses
to allocate unless the remaining payload carries at least one bit per
declared coefficient block — a ~100-byte payload declaring 65535x65535
is a typed error, never a multi-GB ``np.zeros``.  The bit reader's
end-of-stream 1-bit padding is likewise capped (a crafted one-bit
Huffman table otherwise "decodes" every declared MCU from zero payload
bytes at a marker boundary — unbounded CPU from no input).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from palletjack_spark.functions.imagecodec import (
    MAX_DIM,
    MAX_PIXELS,
    UnsupportedImageError,
)


class JpegFormatError(UnsupportedImageError):
    """Payload is JPEG-framed but malformed or outside baseline."""


# --------------------------------------------------------------------------
# constant tables
# --------------------------------------------------------------------------

def _make_zigzag() -> list[tuple[int, int]]:
    """The T.81 Figure 5 zigzag order, generated (not transcribed) —
    anti-diagonals alternate direction, even sums walk bottom-up."""
    out = []
    for s in range(15):
        ys = range(s, -1, -1) if s % 2 == 0 else range(0, s + 1)
        for y in ys:
            x = s - y
            if y < 8 and x < 8:
                out.append((y, x))
    return out


ZIGZAG = _make_zigzag()
_ZZ_FLAT = np.array([y * 8 + x for y, x in ZIGZAG], dtype=np.int64)

#: Annex K.1/K.2 example quantization tables (published in T.81),
#: row-major.  Used by the encoder; the decoder reads DQT from the file.
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# Encoder Huffman tables: flat canonical codes (see module docstring).
# DC: symbols 0..11 (magnitude category), all 4 bits — Kraft 12/16 < 1.
# AC: the 162 baseline symbols (run<<4 | size for run 0-15 size 1-10,
# plus EOB 0x00 and ZRL 0xF0), all 8 bits — Kraft 162/256 < 1.
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_ENC_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]
# Progressive AC table: the baseline 162 plus the EOBn symbols
# (run << 4, run 1-14) progressive EOB runs need — 176 symbols, all 8
# bits (Kraft 176/256 < 1; the all-ones 8-bit code stays unassigned).
_ENC_ACP_VALS = sorted(
    _ENC_AC_VALS + [run << 4 for run in range(1, 15)]
)
_ENC_ACP_BITS = [0, 0, 0, 0, 0, 0, 0, len(_ENC_ACP_VALS), 0, 0, 0, 0, 0, 0, 0, 0]

#: orthonormal 8-point DCT-II basis: FDCT = A @ B @ A.T, IDCT = A.T @ C @ A
_A = np.array(
    [
        [
            0.5 * (1 / math.sqrt(2) if u == 0 else 1.0)
            * math.cos((2 * x + 1) * u * math.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

#: quantizer rounding bias — see the determinism contract in the
#: module docstring
_QUANT_EPS = 1e-7


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# --------------------------------------------------------------------------
# bit I/O
# --------------------------------------------------------------------------

class _BitWriter:
    """MSB-first bit packer with 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            b = (self._acc >> (self._n - 8)) & 0xFF
            self._n -= 8
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def pad_to_byte(self) -> None:
        if self._n:
            self.put((1 << (8 - self._n)) - 1, 8 - self._n)  # pad with 1s

    def put_marker(self, marker: int) -> None:
        """Emit a raw marker (byte-aligned, never stuffed)."""
        self.pad_to_byte()
        self.out += bytes([0xFF, marker])

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over an entropy-coded segment: un-stuffs
    0xFF00, stops at any other marker (restart markers are consumed by
    the caller between intervals)."""

    #: synthetic 1-bit pad budget at a marker boundary: a legitimate
    #: final block needs at most one ``peek16`` plus one magnitude
    #: receive past the last real byte (< 4 bytes); without a cap a
    #: crafted one-bit Huffman table would let the scan loop "decode"
    #: every declared MCU from the endless pad — unbounded CPU from
    #: zero payload bytes (round-16 ADVICE)
    _MAX_PAD_BITS = 64

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self._pad = 0

    def _fill(self, need: int) -> None:
        while self._n < need:
            if self.pos >= len(self.data):
                raise JpegFormatError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 2
                else:
                    # a real marker: feed 1-bits (the spec's pad) so a
                    # final partial block terminates; the scan walker
                    # validates the marker itself.  Bounded: past the
                    # budget this is a truncated stream, not padding.
                    self._pad += 8
                    if self._pad > self._MAX_PAD_BITS:
                        raise JpegFormatError(
                            "truncated JPEG entropy stream (scan continues "
                            "past a marker boundary)"
                        )
                    self._acc = (self._acc << 8) | 0xFF
                    self._n += 8
                    continue
            else:
                self.pos += 1
            self._acc = (self._acc << 8) | b
            self._n += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self._acc >> (self._n - 16)) & 0xFFFF

    def skip(self, length: int) -> None:
        self._fill(length)
        self._n -= length
        self._acc &= (1 << self._n) - 1

    def receive(self, length: int) -> int:
        if length == 0:
            return 0
        self._fill(length)
        v = (self._acc >> (self._n - length)) & ((1 << length) - 1)
        self._n -= length
        self._acc &= (1 << self._n) - 1
        return v

    def align(self) -> None:
        """Drop to a byte boundary (before a restart marker).  Resets
        the pad budget: it bounds the tail of ONE entropy interval, and
        every restart interval may legitimately overread a few pad bits
        into its own terminating RSTn marker."""
        self._acc = 0
        self._n = 0
        self._pad = 0


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map a ``size``-bit magnitude to its signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _bit_size(v: int) -> int:
    """Magnitude category: smallest ``size`` with |v| < 2^size."""
    return int(abs(v)).bit_length()


# --------------------------------------------------------------------------
# Huffman decode LUT (cached across calls — every block lookup is one
# 16-bit peek + one table index, not a bit-by-bit tree walk)
# --------------------------------------------------------------------------

_LUT_CACHE: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}


def _decode_lut(bits: tuple[int, ...], vals: tuple[int, ...]):
    key = (bits, vals)
    cached = _LUT_CACHE.get(key)
    if cached is not None:
        return cached
    sym = np.full(1 << 16, -1, dtype=np.int32)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        if code > (1 << length):
            raise JpegFormatError("oversubscribed Huffman table")
        code <<= 1
    if len(_LUT_CACHE) > 64:
        _LUT_CACHE.clear()  # unbounded distinct tables: keep it a cache
    _LUT_CACHE[key] = (sym, ln)
    return sym, ln


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Baseline or progressive JPEG bytes → (width, height, RGB uint8
    (h, w, 3)).

    Grayscale images are replicated into three channels (the standard
    RGB presentation).  Progressive frames (SOF2 — the format most web
    JPEGs actually use) decode through the full T.81 Annex G process:
    spectral-selection bands, successive approximation (DC and AC first
    + refinement scans, EOBRUN runs), multi-scan accumulation into one
    coefficient grid, then the shared dequant/IDCT tail.  Raises
    :class:`JpegFormatError` (a typed :class:`UnsupportedImageError`)
    on corrupt input or unsupported processes (lossless, arithmetic,
    hierarchical, 12-bit)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise JpegFormatError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}  # (class, id) -> (sym, ln)
    frame = None
    restart_interval = 0
    state: dict | None = None  # progressive accumulation
    pos = 2
    n = len(payload)
    while True:
        if pos + 2 > n:
            raise JpegFormatError("truncated JPEG (no EOI)")
        if payload[pos] != 0xFF:
            raise JpegFormatError(
                f"expected marker at offset {pos}, got {payload[pos]:#x}"
            )
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte before a marker
            pos += 1
            continue
        pos += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue  # TEM / stray SOI / RST: no segment body
        if marker == 0xD9:
            if state is not None and state["scans"]:
                return _finish_frame(frame, qt, state["grids"])
            raise JpegFormatError("EOI before any scan data")
        if pos + 2 > n:
            raise JpegFormatError("truncated JPEG (no SOS before EOF)")
        (seg_len,) = struct.unpack_from(">H", payload, pos)
        if seg_len < 2 or pos + seg_len > n:
            raise JpegFormatError(f"segment {marker:#x} overruns the payload")
        body = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            _parse_dqt(body, qt)
        elif marker == 0xC4:  # DHT
            _parse_dht(body, huff)
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext. sequential
            frame = _parse_sof(body)
        elif marker == 0xC2:  # progressive DCT
            frame = _parse_sof(body, progressive=True)
            state = {"grids": _alloc_grids(frame), "scans": 0}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegFormatError(
                f"unsupported JPEG process (SOF marker {marker:#x}); "
                "baseline and progressive DCT are supported"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise JpegFormatError("short DRI segment")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegFormatError("SOS before SOF")
            if state is None:
                return _decode_scan(
                    payload, pos + seg_len, frame, body, qt, huff,
                    restart_interval,
                )
            pos = _decode_progressive_scan(
                payload, pos + seg_len, frame, body, qt, huff,
                restart_interval, state,
            )
            state["scans"] += 1
            continue
        # APPn / COM / others: skipped
        pos += seg_len


def _parse_dqt(body: bytes, qt: dict[int, np.ndarray]) -> None:
    pos = 0
    while pos < len(body):
        pq, tq = body[pos] >> 4, body[pos] & 0x0F
        pos += 1
        if pq != 0:
            raise JpegFormatError("16-bit quantization tables unsupported")
        if pos + 64 > len(body):
            raise JpegFormatError("short DQT segment")
        tbl = np.zeros(64, dtype=np.int64)
        tbl[_ZZ_FLAT] = np.frombuffer(body, np.uint8, 64, pos)
        if (tbl == 0).any():
            raise JpegFormatError("zero entry in quantization table")
        qt[tq] = tbl.reshape(8, 8)
        pos += 64


def _parse_dht(body: bytes, huff: dict) -> None:
    pos = 0
    while pos < len(body):
        tc, th = body[pos] >> 4, body[pos] & 0x0F
        pos += 1
        if pos + 16 > len(body):
            raise JpegFormatError("short DHT segment")
        bits = tuple(body[pos : pos + 16])
        pos += 16
        count = sum(bits)
        if count > 256 or pos + count > len(body):
            raise JpegFormatError("short DHT segment (values)")
        vals = tuple(body[pos : pos + count])
        pos += count
        huff[(tc, th)] = _decode_lut(bits, vals)


def _parse_sof(body: bytes, progressive: bool = False) -> dict:
    if len(body) < 6:
        raise JpegFormatError("short SOF segment")
    precision, h, w, nc = struct.unpack_from(">BHHB", body, 0)
    if precision != 8:
        raise JpegFormatError(f"{precision}-bit samples unsupported (baseline is 8)")
    if not (0 < w <= MAX_DIM and 0 < h <= MAX_DIM):
        raise JpegFormatError(f"implausible JPEG dimensions {w}x{h}")
    if w * h > MAX_PIXELS:
        raise JpegFormatError(
            f"JPEG frame {w}x{h} exceeds the {MAX_PIXELS}-pixel decode cap"
        )
    if nc not in (1, 3):
        raise JpegFormatError(f"{nc}-component JPEG unsupported (1 or 3)")
    if len(body) < 6 + 3 * nc:
        raise JpegFormatError("short SOF segment (components)")
    comps = []
    for i in range(nc):
        cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
        hs, vs = hv >> 4, hv & 0x0F
        if not (1 <= hs <= 2 and 1 <= vs <= 2):
            raise JpegFormatError(f"sampling factors {hs}x{vs} unsupported")
        comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        # the component's OWN block grid (T.81 A.1.1): non-interleaved
        # scans iterate exactly these blocks, interleaved scans the
        # MCU-padded grid (mcus_x*h x mcus_y*v)
        cw = (w * c["h"] + hmax - 1) // hmax
        chh = (h * c["v"] + vmax - 1) // vmax
        c["bw"] = (cw + 7) // 8
        c["bh"] = (chh + 7) // 8
    return {
        "w": w, "h": h, "comps": comps, "progressive": progressive,
        "hmax": hmax, "vmax": vmax, "mcus_x": mcus_x, "mcus_y": mcus_y,
    }


def _alloc_grids(frame: dict) -> list[np.ndarray]:
    """One MCU-padded coefficient grid per component, (BY, BX, 64):
    progressive scans accumulate into these across the whole file."""
    return [
        np.zeros(
            (frame["mcus_y"] * c["v"], frame["mcus_x"] * c["h"], 64),
            dtype=np.int64,
        )
        for c in frame["comps"]
    ]


def _decode_scan(
    payload, pos, frame, sos_body, qt, huff, restart_interval
) -> tuple[int, int, np.ndarray]:
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    if len(sos_body) < 1 + 2 * len(comps):
        raise JpegFormatError("short SOS segment")
    if sos_body[0] != len(comps):
        raise JpegFormatError("SOS component count != SOF (multi-scan unsupported)")
    tables = {}
    for i in range(len(comps)):
        cs, tt = sos_body[1 + 2 * i], sos_body[2 + 2 * i]
        tables[cs] = (tt >> 4, tt & 0x0F)
    mcus_x, mcus_y = frame["mcus_x"], frame["mcus_y"]
    per_mcu = sum(c["h"] * c["v"] for c in comps)
    n_mcus = mcus_x * mcus_y
    # payload-vs-declaration bound BEFORE any allocation (round-16
    # ADVICE): every coefficient block costs at least one DC Huffman
    # code bit, so the remaining entropy payload must carry at least
    # one bit per declared block — a tiny payload with huge declared
    # dimensions is a typed error, not a proportional np.zeros
    if (len(payload) - pos) * 8 < n_mcus * per_mcu:
        raise JpegFormatError(
            "truncated JPEG entropy stream (payload shorter than one bit "
            f"per declared coefficient block: {n_mcus * per_mcu} blocks, "
            f"{max(0, len(payload) - pos)} bytes)"
        )
    for c in comps:
        if c["id"] not in tables:
            raise JpegFormatError(f"SOS missing component {c['id']}")
        if c["tq"] not in qt:
            raise JpegFormatError(f"missing quantization table {c['tq']}")
        td, ta = tables[c["id"]]
        if (0, td) not in huff or (1, ta) not in huff:
            raise JpegFormatError("missing Huffman table for scan")
        # all coefficient blocks for this component, decode order
        c["blocks"] = np.zeros((n_mcus * c["h"] * c["v"], 64), dtype=np.int64)
        c["nb"] = 0
        c["pred"] = 0

    reader = _BitReader(payload, pos)
    until_restart = restart_interval or -1
    rst = 0
    for _ in range(n_mcus):
        if until_restart == 0:
            reader.align()
            p = reader.pos
            if p + 2 > len(payload) or payload[p] != 0xFF or payload[p + 1] != (
                0xD0 + rst
            ):
                raise JpegFormatError("missing or out-of-order restart marker")
            reader.pos = p + 2
            rst = (rst + 1) & 7
            until_restart = restart_interval
            for c in comps:
                c["pred"] = 0
        for c in comps:
            td, ta = tables[c["id"]]
            dc_sym, dc_ln = huff[(0, td)]
            ac_sym, ac_ln = huff[(1, ta)]
            for _b in range(c["h"] * c["v"]):
                blk = c["blocks"][c["nb"]]
                c["nb"] += 1
                s = _huff_decode(reader, dc_sym, dc_ln)
                if s > 11:
                    raise JpegFormatError(f"invalid DC category {s}")
                diff = _extend(reader.receive(s), s)
                c["pred"] += diff
                blk[0] = c["pred"]
                k = 1
                while k < 64:
                    rs = _huff_decode(reader, ac_sym, ac_ln)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise JpegFormatError("AC run past end of block")
                    blk[_ZZ_FLAT[k]] = _extend(reader.receive(s), s)
                    k += 1
        if until_restart > 0:
            until_restart -= 1

    # MCU decode order -> per-component block grids, shared finish
    grids = []
    for c in comps:
        grids.append(
            c["blocks"]
            .reshape(mcus_y, mcus_x, c["v"], c["h"], 64)
            .transpose(0, 2, 1, 3, 4)
            .reshape(mcus_y * c["v"], mcus_x * c["h"], 64)
        )
    return _finish_frame(frame, qt, grids)


def _finish_frame(
    frame: dict, qt: dict, grids: list[np.ndarray]
) -> tuple[int, int, np.ndarray]:
    """Shared decode tail (baseline single-scan and progressive
    multi-scan): vectorized dequant + IDCT per component grid
    (BY, BX, 64), assemble, upsample, color-convert."""
    w, h = frame["w"], frame["h"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = []
    for c, grid in zip(frame["comps"], grids):
        if c["tq"] not in qt:
            raise JpegFormatError(f"missing quantization table {c['tq']}")
        by, bx = grid.shape[:2]
        coeffs = (grid.reshape(-1, 8, 8) * qt[c["tq"]]).astype(np.float64)
        spatial = np.einsum("ux,nuv,vy->nxy", _A, coeffs, _A)
        pix = np.clip(np.floor(spatial + 128.5), 0, 255).astype(np.uint8)
        plane = (
            pix.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        # upsample to full resolution by replication, crop to (h, w)
        plane = plane.repeat(vmax // c["v"], axis=0).repeat(hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        rgb = np.repeat(planes[0][:, :, None], 3, axis=2)
        return w, h, rgb
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.floor(np.stack([r, g, b], axis=-1) + 0.5), 0, 255)
    return w, h, rgb.astype(np.uint8)


def _huff_decode(reader: _BitReader, sym: np.ndarray, ln: np.ndarray) -> int:
    peek = reader.peek16()
    s = int(sym[peek])
    if s < 0:
        raise JpegFormatError("invalid Huffman code in entropy stream")
    reader.skip(int(ln[peek]))
    return s


# --------------------------------------------------------------------------
# progressive scans (T.81 Annex G.2: spectral selection + successive
# approximation).  Coefficients accumulate across scans into the
# per-component grids; the dequant/IDCT tail is shared with baseline.
# --------------------------------------------------------------------------


def _parse_scan_header(sos_body: bytes, frame: dict) -> tuple:
    """Progressive SOS header: scan components + (Ss, Se, Ah, Al)."""
    if len(sos_body) < 1:
        raise JpegFormatError("short SOS segment")
    ns = sos_body[0]
    if not 1 <= ns <= 4 or len(sos_body) < 4 + 2 * ns:
        raise JpegFormatError("short SOS segment")
    by_id = {c["id"]: i for i, c in enumerate(frame["comps"])}
    scomps = []
    for i in range(ns):
        cs, tt = sos_body[1 + 2 * i], sos_body[2 + 2 * i]
        if cs not in by_id:
            raise JpegFormatError(f"SOS references unknown component {cs}")
        scomps.append((by_id[cs], tt >> 4, tt & 0x0F))
    if len({ci for ci, *_t in scomps}) != ns:
        raise JpegFormatError("SOS repeats a component")
    ss, se, ahal = sos_body[1 + 2 * ns : 4 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0x0F
    if not (ss <= se <= 63):
        raise JpegFormatError(f"invalid spectral band {ss}..{se}")
    if ss == 0 and se != 0:
        raise JpegFormatError(
            "progressive DC scan must have Se=0 (Ss=0 implies DC-only)"
        )
    if ss > 0 and ns != 1:
        raise JpegFormatError("progressive AC scan must be single-component")
    if al > 13 or ah > 13:
        raise JpegFormatError(f"implausible successive approximation {ah}/{al}")
    if ah != 0 and ah != al + 1:
        raise JpegFormatError(
            f"successive approximation must refine one bit (Ah={ah}, Al={al})"
        )
    return scomps, ss, se, ah, al


def _decode_progressive_scan(
    payload, pos, frame, sos_body, qt, huff, restart_interval, state
) -> int:
    """Decode ONE progressive scan into ``state['grids']``; returns the
    payload offset where the entropy data ended (the next marker)."""
    scomps, ss, se, ah, al = _parse_scan_header(sos_body, frame)
    comps = frame["comps"]
    grids = state["grids"]
    reader = _BitReader(payload, pos)
    eobrun = [0]
    preds = [0] * len(comps)

    # resolve the Huffman tables this scan needs (DC refinement needs
    # none; AC scans need the AC table; DC first scans the DC table)
    luts = {}
    for ci, td, ta in scomps:
        if ss == 0 and ah == 0:
            if (0, td) not in huff:
                raise JpegFormatError("missing DC Huffman table for scan")
            luts[ci] = huff[(0, td)]
        elif ss > 0:
            if (1, ta) not in huff:
                raise JpegFormatError("missing AC Huffman table for scan")
            luts[ci] = huff[(1, ta)]

    def decode_block(ci: int, by: int, bx: int) -> None:
        blk = grids[ci][by, bx]
        if ss == 0:
            if ah == 0:
                dc_sym, dc_ln = luts[ci]
                s = _huff_decode(reader, dc_sym, dc_ln)
                if s > 11:
                    raise JpegFormatError(f"invalid DC category {s}")
                diff = _extend(reader.receive(s), s)
                preds[ci] += diff
                blk[0] = preds[ci] << al
            else:
                if reader.receive(1):
                    blk[0] |= 1 << al
        elif ah == 0:
            _ac_first(reader, blk, luts[ci], ss, se, al, eobrun)
        else:
            _ac_refine(reader, blk, luts[ci], ss, se, al, eobrun)

    def reset_state() -> None:
        nonlocal preds
        preds = [0] * len(comps)
        eobrun[0] = 0

    interleaved = len(scomps) > 1
    if interleaved:
        units = frame["mcus_x"] * frame["mcus_y"]
    else:
        ci0 = scomps[0][0]
        # non-interleaved scans cover the component's OWN block grid
        # (T.81 A.2.2), not the MCU-padded one
        units = comps[ci0]["bw"] * comps[ci0]["bh"]
    until_restart = restart_interval or -1
    rst = 0
    for u in range(units):
        if until_restart == 0:
            reader.align()
            p = reader.pos
            if p + 2 > len(payload) or payload[p] != 0xFF or payload[
                p + 1
            ] != (0xD0 + rst):
                raise JpegFormatError("missing or out-of-order restart marker")
            reader.pos = p + 2
            rst = (rst + 1) & 7
            until_restart = restart_interval
            reset_state()
        if interleaved:
            my, mx = divmod(u, frame["mcus_x"])
            for ci, _td, _ta in scomps:
                c = comps[ci]
                for vi in range(c["v"]):
                    for hi in range(c["h"]):
                        decode_block(
                            ci, my * c["v"] + vi, mx * c["h"] + hi
                        )
        else:
            c = comps[ci0]
            by, bx = divmod(u, c["bw"])
            decode_block(ci0, by, bx)
        if until_restart > 0:
            until_restart -= 1
    # the entropy segment ends here; skip forward to the next marker
    # (any pad bits / fill bytes between the data and the marker)
    p = reader.pos
    n = len(payload)
    while p < n and (
        payload[p] != 0xFF
        or (p + 1 < n and payload[p + 1] in (0x00,))
    ):
        p += 1
    return p


def _ac_first(reader, blk, lut, ss, se, al, eobrun) -> None:
    """AC first scan for one block (T.81 G.2.2): band-limited
    run/size coding plus EOBRUN (an EOBn symbol ends 2^r .. 2^r +
    extension blocks at once)."""
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    sym, ln = lut
    k = ss
    while k <= se:
        rs = _huff_decode(reader, sym, ln)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                eobrun[0] = (1 << r) - 1
                if r:
                    eobrun[0] += reader.receive(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise JpegFormatError("AC run past end of spectral band")
        blk[_ZZ_FLAT[k]] = _extend(reader.receive(s), s) << al
        k += 1


def _ac_refine(reader, blk, lut, ss, se, al, eobrun) -> None:
    """AC refinement scan for one block (T.81 G.2.2 / the libjpeg
    correction-bit algorithm): newly-nonzero coefficients arrive as
    ±1<<Al; every already-nonzero coefficient crossed on the way — and
    every one in the band once an EOB run starts — consumes one
    correction bit that may add 1<<Al toward its sign."""
    p1 = 1 << al
    m1 = -p1
    sym, ln = lut
    k = ss
    if eobrun[0] == 0:
        while k <= se:
            rs = _huff_decode(reader, sym, ln)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eobrun[0] = 1 << r
                    if r:
                        eobrun[0] += reader.receive(r)
                    break  # correction bits for k..se handled below
                sval = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise JpegFormatError(
                        "invalid AC refinement magnitude (must be 1)"
                    )
                sval = p1 if reader.receive(1) else m1
            while k <= se:
                z = _ZZ_FLAT[k]
                cur = int(blk[z])
                if cur != 0:
                    if reader.receive(1) and (cur & p1) == 0:
                        blk[z] = cur + (p1 if cur >= 0 else m1)
                else:
                    if r == 0:
                        if sval:
                            blk[z] = sval
                        break
                    r -= 1
                k += 1
            else:
                if sval:
                    # the newly-nonzero coefficient never found a zero
                    # slot inside the band: corrupt run
                    raise JpegFormatError("AC refinement run past band end")
            k += 1
    if eobrun[0] > 0:
        while k <= se:
            z = _ZZ_FLAT[k]
            cur = int(blk[z])
            if cur != 0:
                if reader.receive(1) and (cur & p1) == 0:
                    blk[z] = cur + (p1 if cur >= 0 else m1)
            k += 1
        eobrun[0] -= 1


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------

def encode_jpeg(
    pixels: np.ndarray,
    subsampling: str = "420",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """RGB uint8 (h, w, 3) or grayscale (h, w) → JFIF bytes.

    ``subsampling``: ``"444"`` or ``"420"`` (ignored for grayscale).
    ``restart_interval``: emit a DRI segment and RSTn markers every N
    MCUs (0 = none) — the error-resilience feature real camera JPEGs
    carry (baseline only).  ``progressive=True`` emits an SOF2
    progressive stream whose scan script exercises every Annex-G scan
    kind — interleaved DC first at Al=1, DC refinement, two
    spectral-selection AC bands per component at Al=1 (EOBRUN coding),
    and a full-band AC refinement — so decoding it drives all four
    progressive block decoders; the quantized coefficients are
    IDENTICAL to the baseline encoding of the same image, so both
    forms decode bit-equal.  Uses the Annex-K quantization tables
    verbatim; see the module docstring for the Huffman-table and
    rounding choices."""
    if subsampling not in ("444", "420"):
        raise ValueError(f"unknown subsampling {subsampling!r}")
    if progressive and restart_interval:
        raise ValueError(
            "restart_interval is a baseline-scan option (progressive "
            "scans here are emitted without restarts)"
        )
    gray = pixels.ndim == 2
    if not gray and (pixels.ndim != 3 or pixels.shape[2] != 3):
        raise ValueError("encode_jpeg expects (h, w, 3) RGB or (h, w) gray")
    h, w = pixels.shape[:2]
    if not (0 < w <= MAX_DIM and 0 < h <= MAX_DIM):
        raise ValueError(f"implausible dimensions {w}x{h}")
    px = pixels.astype(np.float64)
    if gray:
        comps = [(px, QUANT_LUMA, 1, 1)]
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsampling == "420":
            cb, cr = _box2(cb), _box2(cr)
            comps = [(y, QUANT_LUMA, 2, 2), (cb, QUANT_CHROMA, 1, 1),
                     (cr, QUANT_CHROMA, 1, 1)]
        else:
            comps = [(y, QUANT_LUMA, 1, 1), (cb, QUANT_CHROMA, 1, 1),
                     (cr, QUANT_CHROMA, 1, 1)]
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    # quantized coefficient blocks per component, in MCU scan order
    enc_blocks = []
    for plane, q, hs, vs in comps:
        bw, bh = mcus_x * hs * 8, mcus_y * vs * 8
        plane = _pad_edge(plane, bh, bw)
        blocks = (
            plane.reshape(mcus_y, vs, 8, mcus_x, hs, 8)
            .transpose(0, 3, 1, 4, 2, 5)
            .reshape(-1, 8, 8)
        )
        coeffs = np.einsum("ux,nxy,yv->nuv", _A, blocks - 128.0, _A.T)
        quant = np.floor(coeffs / q + 0.5 + _QUANT_EPS).astype(np.int64)
        enc_blocks.append(quant.reshape(-1, 64))

    if progressive:
        return _encode_progressive(
            w, h, comps, enc_blocks, mcus_x, mcus_y, hmax, vmax
        )
    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    writer = _BitWriter()
    preds = [0] * len(comps)
    rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            writer.put_marker(0xD0 + rst)
            rst = (rst + 1) & 7
            preds = [0] * len(comps)
        for ci, (_plane, _q, hs, vs) in enumerate(comps):
            for bi in range(hs * vs):
                blk = enc_blocks[ci][m * hs * vs + bi]
                _write_block(writer, blk, preds, ci, dc_codes, ac_codes)
    data = writer.flush()
    return _assemble(w, h, comps, data, restart_interval)


def _box2(plane: np.ndarray) -> np.ndarray:
    """2x2 box-mean downsample (edge-replicated to even dims first)."""
    h, w = plane.shape
    plane = _pad_edge(plane, h + h % 2, w + w % 2)
    return (
        plane.reshape(plane.shape[0] // 2, 2, plane.shape[1] // 2, 2)
        .mean(axis=(1, 3))
    )


def _pad_edge(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, bh - h), (0, bw - w)), mode="edge")


def _write_block(writer, blk, preds, ci, dc_codes, ac_codes) -> None:
    dc = int(blk[0])
    diff = dc - preds[ci]
    preds[ci] = dc
    s = _bit_size(diff)
    code, ln = dc_codes[s]
    writer.put(code, ln)
    if s:
        writer.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    zz = blk[_ZZ_FLAT]
    nz = np.nonzero(zz[1:])[0]
    k = 1
    for idx in nz:
        pos = int(idx) + 1
        run = pos - k
        while run >= 16:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.put(code, ln)
            run -= 16
        v = int(zz[pos])
        s = _bit_size(v)
        code, ln = ac_codes[(run << 4) | s]
        writer.put(code, ln)
        writer.put(v if v >= 0 else v + (1 << s) - 1, s)
        k = pos + 1
    if k < 64:
        code, ln = ac_codes[0x00]  # EOB
        writer.put(code, ln)


# --------------------------------------------------------------------------
# progressive encode (T.81 Annex G.1: spectral selection + successive
# approximation).  The scan script is fixed — DC first (Al=1,
# interleaved), DC refine, per-component AC bands 1-5 and 6-63 at Al=1,
# per-component full-band AC refine to Al=0 — chosen to exercise every
# progressive decode path while producing coefficients identical to the
# baseline encoding.
# --------------------------------------------------------------------------


class _ScanState:
    """Cross-block progressive AC state: the pending EOB run plus the
    correction bits that ride with it (libjpeg's EOBRUN/BE pair)."""

    def __init__(self, writer: _BitWriter, ac_codes: dict):
        self.writer = writer
        self.ac_codes = ac_codes
        self.eobrun = 0
        self.carry_bits: list[int] = []

    def flush_eobrun(self) -> None:
        """Emit the pending EOBn symbol (+ extension bits) and the
        correction bits buffered behind it."""
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, ln = self.ac_codes[r << 4]
            self.writer.put(code, ln)
            if r:
                self.writer.put(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for bit in self.carry_bits:
            self.writer.put(bit, 1)
        self.carry_bits = []

    def end_block(self, br: list[int], pending: bool) -> None:
        """Record one end-of-band occurrence (``pending``) carrying
        this block's leftover correction bits."""
        if pending or br:
            self.eobrun += 1
            self.carry_bits.extend(br)
            if self.eobrun == 0x7FFF or len(self.carry_bits) > 937:
                self.flush_eobrun()


def _emit_ac_first_block(
    st: _ScanState, zz: np.ndarray, ss: int, se: int, al: int
) -> None:
    run = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        a = abs(v) >> al
        if a == 0:
            run += 1
            continue
        st.flush_eobrun()
        while run >= 16:
            code, ln = st.ac_codes[0xF0]
            st.writer.put(code, ln)
            run -= 16
        s = a.bit_length()
        if s > 10:
            raise ValueError(f"AC magnitude {a} exceeds the size-10 table")
        code, ln = st.ac_codes[(run << 4) | s]
        st.writer.put(code, ln)
        sv = a if v >= 0 else -a
        st.writer.put(sv if sv >= 0 else sv + (1 << s) - 1, s)
        run = 0
    st.end_block([], pending=run > 0)


def _emit_ac_refine_block(
    st: _ScanState, zz: np.ndarray, ss: int, se: int, al: int
) -> None:
    temps = [(abs(int(zz[k])) >> al, int(zz[k])) for k in range(ss, se + 1)]
    eob_rel = -1  # relative index of the last NEWLY-nonzero coefficient
    for i, (t, _v) in enumerate(temps):
        if t == 1:
            eob_rel = i
    run = 0
    br: list[int] = []
    for i, (t, v) in enumerate(temps):
        if t == 0:
            run += 1
            continue
        # a run past 15 needs ZRLs — but only while a newly-nonzero
        # coefficient still lies ahead (otherwise the EOB run absorbs
        # it); checked BEFORE the correction-bit branch, because the
        # decoder consumes a history coefficient's correction bit
        # inside the walk that FOLLOWS the ZRL symbol
        while run > 15 and i <= eob_rel:
            st.flush_eobrun()
            code, ln = st.ac_codes[0xF0]
            st.writer.put(code, ln)
            run -= 16
            for bit in br:
                st.writer.put(bit, 1)
            br = []
        if t > 1:
            # already nonzero in an earlier scan: one correction bit,
            # emitted after the next symbol (or with the EOB run)
            br.append(t & 1)
            continue
        # t == 1: newly nonzero at this precision
        st.flush_eobrun()
        code, ln = st.ac_codes[(run << 4) | 1]
        st.writer.put(code, ln)
        st.writer.put(1 if v >= 0 else 0, 1)
        for bit in br:
            st.writer.put(bit, 1)
        br = []
        run = 0
    st.end_block(br, pending=run > 0)


def _encode_progressive(
    w, h, comps, enc_blocks, mcus_x, mcus_y, hmax, vmax
) -> bytes:
    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_ACP_BITS, _ENC_ACP_VALS)
    nc = len(comps)

    # per-component grids in block-raster order, clipped to the
    # component's OWN block count (non-interleaved scans never visit
    # the MCU padding blocks)
    grids = []
    for (plane, _q, hs, vs), blocks in zip(comps, enc_blocks):
        grid = (
            blocks.reshape(mcus_y, mcus_x, vs, hs, 64)
            .transpose(0, 2, 1, 3, 4)
            .reshape(mcus_y * vs, mcus_x * hs, 64)
        )
        cw = (w * hs + hmax - 1) // hmax
        chh = (h * vs + vmax - 1) // vmax
        grids.append(grid[: (chh + 7) // 8, : (cw + 7) // 8])

    def mcu_blocks():
        for m in range(mcus_x * mcus_y):
            for ci in range(nc):
                hs, vs = comps[ci][2], comps[ci][3]
                for bi in range(hs * vs):
                    yield ci, enc_blocks[ci][m * hs * vs + bi]

    scans: list[tuple[bytes, bytes]] = []

    def sos(comp_ids, ss, se, ah, al, ac_table=False):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            td = 0 if cid == 1 else 1
            body += bytes([cid, (td << 4) | td if ac_table else td << 4])
        return body + bytes([ss, se, (ah << 4) | al])

    # scan 1: DC first, interleaved, Al=1
    wr = _BitWriter()
    preds = [0] * nc
    for ci, blk in mcu_blocks():
        dc = int(blk[0]) >> 1  # arithmetic shift (T.81 G.1.2.1)
        diff = dc - preds[ci]
        preds[ci] = dc
        s = _bit_size(diff)
        code, ln = dc_codes[s]
        wr.put(code, ln)
        if s:
            wr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    scans.append((sos(list(range(1, nc + 1)), 0, 0, 0, 1), wr.flush()))

    # scan 2: DC refinement to Al=0 — one raw bit per block
    wr = _BitWriter()
    for _ci, blk in mcu_blocks():
        wr.put(int(blk[0]) & 1, 1)
    scans.append((sos(list(range(1, nc + 1)), 0, 0, 1, 0), wr.flush()))

    # per component: two AC spectral bands at Al=1, then full refine
    for bands, ah, al in (((1, 5), 0, 1), ((6, 63), 0, 1), ((1, 63), 1, 0)):
        ss, se = bands
        for ci in range(nc):
            wr = _BitWriter()
            st = _ScanState(wr, ac_codes)
            grid = grids[ci]
            for by in range(grid.shape[0]):
                for bx in range(grid.shape[1]):
                    zz = grid[by, bx][_ZZ_FLAT]
                    if ah == 0:
                        _emit_ac_first_block(st, zz, ss, se, al)
                    else:
                        _emit_ac_refine_block(st, zz, ss, se, al)
            st.flush_eobrun()
            scans.append(
                (sos([ci + 1], ss, se, ah, al, ac_table=True), wr.flush())
            )

    return _assemble_progressive(w, h, comps, scans)


def _assemble_progressive(w, h, comps, scans) -> bytes:
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HHBB", 1, 1, 0, 0
    )
    gray = len(comps) == 1

    def _dqt(tid: int, tbl: np.ndarray) -> bytes:
        zz = tbl.reshape(-1)[_ZZ_FLAT].astype(np.uint8).tobytes()
        return b"\xff\xdb" + struct.pack(">HB", 67, tid) + zz

    out += _dqt(0, QUANT_LUMA)
    if not gray:
        out += _dqt(1, QUANT_CHROMA)
    nc = len(comps)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, (_p, _q, hs, vs) in enumerate(comps):
        sof += struct.pack(">BBB", i + 1, (hs << 4) | vs, 0 if i == 0 else 1)
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof

    def _dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += _dht(0, 0, _ENC_DC_BITS, _ENC_DC_VALS)
    out += _dht(1, 0, _ENC_ACP_BITS, _ENC_ACP_VALS)
    if not gray:
        out += _dht(0, 1, _ENC_DC_BITS, _ENC_DC_VALS)
        out += _dht(1, 1, _ENC_ACP_BITS, _ENC_ACP_VALS)
    for sos_body, data in scans:
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos_body)) + sos_body
        out += data
    out += b"\xff\xd9"
    return bytes(out)


def _assemble(w, h, comps, data: bytes, restart_interval: int = 0) -> bytes:
    out = bytearray(b"\xff\xd8")
    # APP0 JFIF
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HHBB", 1, 1, 0, 0
    )
    gray = len(comps) == 1

    def _dqt(tid: int, tbl: np.ndarray) -> bytes:
        zz = tbl.reshape(-1)[_ZZ_FLAT].astype(np.uint8).tobytes()
        return b"\xff\xdb" + struct.pack(">HB", 67, tid) + zz

    out += _dqt(0, QUANT_LUMA)
    if not gray:
        out += _dqt(1, QUANT_CHROMA)
    # SOF0
    nc = len(comps)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, (_p, _q, hs, vs) in enumerate(comps):
        sof += struct.pack(">BBB", i + 1, (hs << 4) | vs, 0 if i == 0 else 1)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def _dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += _dht(0, 0, _ENC_DC_BITS, _ENC_DC_VALS)
    out += _dht(1, 0, _ENC_AC_BITS, _ENC_AC_VALS)
    if not gray:
        # same table content under the chroma ids (kept separate ids so
        # the decoder's multi-table path is exercised)
        out += _dht(0, 1, _ENC_DC_BITS, _ENC_DC_VALS)
        out += _dht(1, 1, _ENC_AC_BITS, _ENC_AC_VALS)
    # SOS
    sos = bytes([nc])
    for i in range(nc):
        sos += struct.pack(">BB", i + 1, 0 if i == 0 else 0x11)
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += data
    out += b"\xff\xd9"
    return bytes(out)


def synthetic_block_image(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic gray RGB pattern, CONSTANT per 8x8 DCT block:
    every pixel in block (by, bx) has value (seed + by*7 + bx*3) mod
    256 in all three channels.  Constant blocks put all the signal in
    the DC coefficient, and gray input pins both chroma planes at
    exactly 128 through the whole encode/decode pipeline, so the
    decoded value has the closed form in the module docstring — the
    q94g oracle recomputes it in SQL."""
    y, x = np.mgrid[0:h, 0:w]
    v = ((seed + (y // 8) * 7 + (x // 8) * 3) % 256).astype(np.uint8)
    return np.repeat(v[:, :, None], 3, axis=2)


def decoded_block_value(v: int) -> int:
    """The closed-form decode of a constant block of value ``v`` under
    the Annex-K luma table (DC step 16): quantize half-up, dequantize,
    IDCT, clamp.  The q94g oracle states this same form in SQL."""
    sq = math.floor((v - 128) / 2 + 0.5)
    return max(0, min(255, sq * 2 + 128))


# self-register with the image dispatch seam (imagecodec.decode_image
# also lazy-imports this module on a \xff\xd8 magic, so dispatch works
# whichever module is imported first)
from palletjack_spark.functions.imagecodec import REGISTRY as _REGISTRY  # noqa: E402

_REGISTRY[b"\xff\xd8"] = decode_jpeg
