"""PNG (RFC 2083 / ISO 15948) codec in pure numpy + stdlib zlib.

The second compressed image format through the
:data:`palletjack_spark.functions.imagecodec.REGISTRY` seam (baseline
JPEG landed in round 16): PNG is the web's dominant LOSSLESS format, so
together the two cover the overwhelming majority of real image corpora.
Everything here is implemented from the public specification — the
chunk layer (length/type/CRC-32), IHDR validation, IDAT zlib inflate
(stdlib ``zlib`` does the DEFLATE work), the five scanline filters
(None/Sub/Up/Average/Paeth), and the PLTE palette — with numpy only.

Scope:

* decode: bit depth 8; color types 0 (grayscale), 2 (truecolor RGB),
  3 (palette), 4 (gray+alpha) and 6 (RGBA — alpha is dropped, the RGB
  presentation every probe downstream expects); all five filter types;
  ancillary chunks skipped after CRC verification.  Interlaced
  (Adam7) images, 1/2/4/16-bit depths, and unknown CRITICAL chunks
  raise a typed :class:`PngFormatError` naming the feature.
* encode: RGB truecolor, grayscale, or palette output (palette
  requires <= 256 distinct colors and is exact); per-scanline filter
  choice cycles through ALL FIVE filter types by default
  (``filter_mode="cycle"``, y % 5), so one encoded fixture image
  taller than four rows exercises every filter decoder — the same
  differential posture jpegcodec's restart-interval fixtures take.

Corrupt-input posture (the reference codec's Thrift bounds discipline,
palletjack.cc:82-83, and this package's other codecs): chunk lengths
are bounded by the remaining payload BEFORE any read, every chunk CRC
is verified, dimensions are capped (``MAX_DIM`` per axis and the
compressed-format area cap ``MAX_PIXELS`` — like JPEG, a zlib stream
can declare far more pixels than the payload carries bytes), and the
inflate is run through ``zlib.decompressobj`` with ``max_length``
pinned to the declared raster size, so a crafted "zlib bomb" can never
expand past the (already-capped) declared size; over- and under-runs
are typed errors.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from palletjack_spark.functions.imagecodec import (
    MAX_DIM,
    MAX_PIXELS,
    UnsupportedImageError,
)


class PngFormatError(UnsupportedImageError):
    """Payload is PNG-framed but malformed or outside this profile."""


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: color type -> samples per pixel (bit depth 8 only)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


# --------------------------------------------------------------------------
# scanline filters (RFC 2083 §6)
# --------------------------------------------------------------------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter_line(
    ftype: int, line: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Reconstruct one scanline (uint8) from its filtered bytes.

    None and Up are whole-line vectorized; Sub is a strided cumsum
    (``recon[i] = filt[i] + recon[i-bpp]`` telescopes to a per-residue
    running sum mod 256); Average and Paeth depend on both the left and
    the up neighbor and stay per-byte — fixture images are tiny and
    even a large real PNG spends its time in zlib, not here."""
    if ftype == 0:  # None
        return line.copy()
    if ftype == 2:  # Up
        return (line + prev).astype(np.uint8)
    if ftype == 1:  # Sub
        out = line.reshape(-1, bpp) if line.size % bpp == 0 else None
        if out is not None:
            return (
                np.cumsum(out.astype(np.uint32), axis=0, dtype=np.uint32)
                .astype(np.uint8)
                .reshape(-1)
            )
        out = line.copy()
        for i in range(bpp, len(out)):
            out[i] = (int(out[i]) + int(out[i - bpp])) & 0xFF
        return out
    out = np.empty_like(line)
    if ftype == 3:  # Average
        for i in range(len(line)):
            left = int(out[i - bpp]) if i >= bpp else 0
            out[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        return out
    if ftype == 4:  # Paeth
        for i in range(len(line)):
            left = int(out[i - bpp]) if i >= bpp else 0
            upleft = int(prev[i - bpp]) if i >= bpp else 0
            out[i] = (int(line[i]) + _paeth(left, int(prev[i]), upleft)) & 0xFF
        return out
    raise PngFormatError(f"invalid PNG filter type {ftype}")


def _filter_line(
    ftype: int, raw: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Apply one scanline filter (encode side, the exact inverse of
    :func:`_unfilter_line`)."""
    if ftype == 0:
        return raw.copy()
    if ftype == 2:
        return (raw - prev).astype(np.uint8)
    left = np.zeros_like(raw)
    left[bpp:] = raw[:-bpp]
    if ftype == 1:
        return (raw - left).astype(np.uint8)
    if ftype == 3:
        avg = (left.astype(np.uint32) + prev.astype(np.uint32)) >> 1
        return (raw - avg.astype(np.uint8)).astype(np.uint8)
    if ftype == 4:
        upleft = np.zeros_like(prev)
        upleft[bpp:] = prev[:-bpp]
        pred = np.empty_like(raw)
        for i in range(len(raw)):
            pred[i] = _paeth(int(left[i]), int(prev[i]), int(upleft[i]))
        return (raw - pred).astype(np.uint8)
    raise ValueError(f"invalid filter type {ftype}")


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------


def decode_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """PNG bytes → (width, height, RGB uint8 (h, w, 3)).

    Grayscale replicates into three channels; alpha channels are
    dropped (RGB presentation).  Raises :class:`PngFormatError` (a
    typed :class:`UnsupportedImageError`) on corrupt input or features
    outside the supported profile."""
    if len(payload) < 8 or payload[:8] != PNG_MAGIC:
        raise PngFormatError("not a PNG payload (missing signature)")
    pos = 8
    n = len(payload)
    ihdr = None
    plte: np.ndarray | None = None
    idat = bytearray()
    seen_iend = False
    while pos < n:
        if pos + 8 > n:
            raise PngFormatError("truncated PNG (chunk header)")
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        # bound BEFORE reading the body: a crafted length must not
        # drive a huge slice or walk past the buffer
        if length > n - pos - 12:
            raise PngFormatError(
                f"PNG chunk {tag!r} declares {length} bytes past EOF"
            )
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise PngFormatError(f"PNG chunk {tag!r} fails CRC")
        pos += 12 + length
        if ihdr is None:
            if tag != b"IHDR":
                raise PngFormatError(f"first PNG chunk is {tag!r}, not IHDR")
            ihdr = _parse_ihdr(body)
            continue
        if tag == b"IHDR":
            raise PngFormatError("duplicate IHDR chunk")
        if tag == b"PLTE":
            if length % 3 or not 3 <= length <= 768:
                raise PngFormatError(f"PLTE length {length} invalid")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            seen_iend = True
            break
        elif not tag[0] & 0x20:  # critical bit: uppercase first letter
            raise PngFormatError(f"unsupported critical PNG chunk {tag!r}")
        # ancillary chunks: CRC-checked above, content ignored
    if ihdr is None:
        raise PngFormatError("PNG has no IHDR")
    if not seen_iend:
        raise PngFormatError("truncated PNG (no IEND)")
    if not idat:
        raise PngFormatError("PNG has no IDAT data")
    w, h, color_type = ihdr["w"], ihdr["h"], ihdr["color_type"]
    ch = _CHANNELS[color_type]
    if color_type == 3 and plte is None:
        raise PngFormatError("palette PNG (color type 3) has no PLTE")
    rowbytes = w * ch
    expected = h * (1 + rowbytes)
    d = zlib.decompressobj()
    try:
        raw = d.decompress(bytes(idat), expected)
    except zlib.error as e:
        raise PngFormatError(f"corrupt PNG zlib stream: {e}") from None
    if len(raw) < expected:
        raise PngFormatError(
            f"PNG raster short: {len(raw)} of {expected} filtered bytes"
        )
    if d.unconsumed_tail or (d.flush() and True):
        # more raster than the declared dimensions account for — a
        # dimension lie or a bomb; either way a typed error
        raise PngFormatError("PNG zlib stream larger than declared raster")
    buf = np.frombuffer(raw, dtype=np.uint8)
    out = np.empty((h, rowbytes), dtype=np.uint8)
    prev = np.zeros(rowbytes, dtype=np.uint8)
    bpp = ch  # bytes per complete pixel at depth 8
    for y in range(h):
        start = y * (1 + rowbytes)
        ftype = int(buf[start])
        if ftype > 4:
            raise PngFormatError(f"invalid PNG filter type {ftype}")
        prev = _unfilter_line(
            ftype, buf[start + 1 : start + 1 + rowbytes], prev, bpp
        )
        out[y] = prev
    px = out.reshape(h, w, ch)
    if color_type == 2:
        rgb = px
    elif color_type == 6:
        rgb = px[:, :, :3]
    elif color_type == 0:
        rgb = np.repeat(px, 3, axis=2)
    elif color_type == 4:
        rgb = np.repeat(px[:, :, :1], 3, axis=2)
    else:  # palette
        idx = px[:, :, 0]
        if int(idx.max()) >= len(plte):
            raise PngFormatError(
                f"palette index {int(idx.max())} out of range "
                f"({len(plte)} entries)"
            )
        rgb = plte[idx]
    return w, h, np.ascontiguousarray(rgb)


def _parse_ihdr(body: bytes) -> dict:
    if len(body) != 13:
        raise PngFormatError(f"IHDR length {len(body)} != 13")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", body
    )
    if not (0 < w <= MAX_DIM and 0 < h <= MAX_DIM):
        raise PngFormatError(f"implausible PNG dimensions {w}x{h}")
    if w * h > MAX_PIXELS:
        raise PngFormatError(
            f"PNG frame {w}x{h} exceeds the {MAX_PIXELS}-pixel decode cap"
        )
    if color_type not in _CHANNELS:
        raise PngFormatError(f"invalid PNG color type {color_type}")
    if depth != 8:
        raise PngFormatError(
            f"{depth}-bit PNG unsupported (this profile decodes depth 8)"
        )
    if comp != 0 or filt != 0:
        raise PngFormatError(
            f"PNG compression/filter method {comp}/{filt} invalid"
        )
    if interlace != 0:
        raise PngFormatError("interlaced (Adam7) PNG unsupported")
    return {"w": w, "h": h, "color_type": color_type}


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------


def encode_png(
    pixels: np.ndarray,
    palette: bool = False,
    filter_mode: str = "cycle",
    level: int = 6,
) -> bytes:
    """RGB uint8 (h, w, 3) or grayscale (h, w) → PNG bytes.

    ``palette=True`` emits color type 3 with a PLTE built from the
    image's distinct colors (requires <= 256; exact, not quantized).
    ``filter_mode``: ``"none"`` (filter 0 every line) or ``"cycle"``
    (line y uses filter y % 5 — deliberately exercises every filter
    decoder in one image; compression is not the fixture's goal)."""
    if filter_mode not in ("none", "cycle"):
        raise ValueError(f"unknown filter_mode {filter_mode!r}")
    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        color_type, ch = 0, 1
        raster = pixels[:, :, None]
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        color_type, ch = 2, 3
        raster = pixels
    else:
        raise ValueError("encode_png expects (h, w, 3) RGB or (h, w) gray")
    h, w = raster.shape[:2]
    plte_body = b""
    if palette:
        if color_type != 2:
            raise ValueError("palette encoding needs an RGB input")
        flat = raster.reshape(-1, 3)
        colors, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError(
                f"palette encoding needs <= 256 distinct colors, "
                f"got {len(colors)}"
            )
        color_type, ch = 3, 1
        plte_body = colors.astype(np.uint8).tobytes()
        raster = inverse.astype(np.uint8).reshape(h, w, 1)
    lines = raster.reshape(h, w * ch)
    prev = np.zeros(w * ch, dtype=np.uint8)
    raw = bytearray()
    for y in range(h):
        ftype = (y % 5) if filter_mode == "cycle" else 0
        raw.append(ftype)
        raw += _filter_line(ftype, lines[y], prev, ch).tobytes()
        prev = lines[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = bytearray(PNG_MAGIC)
    out += _chunk(b"IHDR", ihdr)
    if plte_body:
        out += _chunk(b"PLTE", plte_body)
    out += _chunk(b"IDAT", zlib.compress(bytes(raw), level))
    out += _chunk(b"IEND", b"")
    return bytes(out)
