"""Pure-Python image codecs for the multimodal pipeline.

Real decoders/encoders for the two classic uncompressed raster formats —
24-bit BI_RGB **BMP** and binary **PPM (P6)** — implemented from their
public specifications with numpy only.  This makes the multimodal decode
path genuinely executable in this container (no imaging libraries
available): payloads are real image files, widths/heights come from actual
header parsing, resize is a real nearest-neighbour resample over decoded
pixels.

The two dominant COMPRESSED formats plug into the same REGISTRY seam
with real pure-python/numpy decoders: baseline JPEG (round 16,
``jpegcodec.py`` — the T.81 process) and PNG (round 17, ``pngcodec.py``
— RFC 2083 with stdlib zlib inflating the IDAT stream).  Formats whose
decoding genuinely needs an external codec library (MP3, H.264, WebP,
…) remain documented non-goals; ``decode_image`` raises a clear
``UnsupportedImageError`` for unknown magics, and the REGISTRY is the
plug-in point where a Pillow/libjpeg-backed decoder would drop in
unchanged.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedImageError(NotImplementedError):
    """Payload is not in a format this build can decode."""


#: dimension sanity cap — corrupt headers must fail cleanly, not allocate
#: unbounded pixel buffers (the decode analogue of the reference's Thrift
#: string/container DoS limits, palletjack.cc:82-83)
MAX_DIM = 1 << 16

#: total declared pixels a COMPRESSED frame may carry (4096x4096).  For
#: the uncompressed formats (BMP/PPM) the payload length itself bounds
#: the pixel count, but a compressed payload (JPEG entropy coding, PNG
#: zlib) can declare arbitrarily more pixels than it carries bytes, so
#: their decoders need an explicit area cap before sizing any buffer
#: from the header; 16.7M pixels covers every real training image while
#: bounding the peak decode footprint to tens of MB
MAX_PIXELS = 1 << 24


# --------------------------------------------------------------------------
# BMP (Windows BITMAPINFOHEADER, 24bpp, BI_RGB)
# --------------------------------------------------------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (h, w, 3) → 24-bit uncompressed BMP bytes."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("encode_bmp expects (h, w, 3) RGB")
    row_size = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    image_size = row_size * h
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + image_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    rows = bytearray()
    bgr = pixels[:, :, ::-1]  # BMP stores BGR
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows += bgr[y].tobytes() + pad
    return header + bytes(rows)


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """24-bit BI_RGB BMP bytes → (width, height, RGB uint8 (h, w, 3))."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise UnsupportedImageError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise UnsupportedImageError(f"BMP header size {hdr_size} unsupported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise UnsupportedImageError(
            f"only 24bpp BI_RGB BMP supported (got bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    if not (0 < w <= MAX_DIM and 0 < h <= MAX_DIM):
        raise UnsupportedImageError(f"implausible BMP dimensions {w}x{h}")
    if data_offset < 14 + hdr_size:
        # the header claims pixel data starts inside itself — a corrupt
        # file that would otherwise decode header bytes as pixels
        # (round-15 codec sweep)
        raise UnsupportedImageError(
            f"BMP data offset {data_offset} overlaps the header"
        )
    row_size = (w * 3 + 3) & ~3
    if len(payload) < data_offset + row_size * h:
        raise UnsupportedImageError("truncated BMP payload")
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=data_offset
    ).reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    bgr = raw if top_down else raw[::-1]
    return w, h, bgr[:, :, ::-1].copy()


# --------------------------------------------------------------------------
# PPM (P6 binary)
# --------------------------------------------------------------------------

def encode_ppm(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (h, w, 3) → binary PPM (P6) bytes."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("encode_ppm expects (h, w, 3) RGB")
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Binary PPM (P6) bytes → (width, height, RGB uint8 (h, w, 3))."""
    if payload[:2] != b"P6":
        raise UnsupportedImageError("not a P6 PPM payload")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        # skip whitespace and '#' comments between header tokens
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise UnsupportedImageError("malformed PPM header")
        try:
            vals.append(int(payload[start:pos]))
        except ValueError:
            raise UnsupportedImageError(
                f"malformed PPM header token {payload[start:pos]!r}"
            ) from None
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise UnsupportedImageError(f"PPM maxval {maxval} unsupported")
    if not (0 < w <= MAX_DIM and 0 < h <= MAX_DIM):
        raise UnsupportedImageError(f"implausible PPM dimensions {w}x{h}")
    need = w * h * 3
    if len(payload) < pos + need:
        raise UnsupportedImageError("truncated PPM payload")
    raw = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    return w, h, raw.reshape(h, w, 3).copy()


# --------------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------------

#: magic-prefix → decoder; register a new codec by adding an entry.
#: Baseline JPEG registers itself below (jpegcodec.py — round 16); a
#: Pillow/libjpeg-backed decoder would drop into the same slot.
REGISTRY: dict[bytes, object] = {
    b"BM": decode_bmp,
    b"P6": decode_ppm,
}


def decode_image(payload: bytes) -> dict:
    """Decode an image payload → {width, height, mode, pixels}.

    Dispatches on the payload magic through :data:`REGISTRY`; raises
    :class:`UnsupportedImageError` for formats with no registered codec."""
    if payload[:2] == b"\xff\xd8" and b"\xff\xd8" not in REGISTRY:
        # lazy registration (jpegcodec imports THIS module for the
        # error hierarchy, so a top-level import here would be circular)
        from palletjack_spark.functions.jpegcodec import decode_jpeg

        REGISTRY[b"\xff\xd8"] = decode_jpeg
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[:8] not in REGISTRY:
        # same lazy-registration shape for the PNG codec (round 17)
        from palletjack_spark.functions.pngcodec import decode_png

        REGISTRY[payload[:8]] = decode_png
    for magic, dec in REGISTRY.items():
        if payload[: len(magic)] == magic:
            w, h, px = dec(payload)
            return {"width": w, "height": h, "mode": "RGB", "pixels": px}
    raise UnsupportedImageError(
        f"no codec registered for payload starting with "
        f"{bytes(payload[:4])!r}; register one in imagecodec.REGISTRY"
    )


def resize_nearest(pixels: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbour resample of an RGB array to (h, w, 3)."""
    sh, sw = pixels.shape[:2]
    ys = (np.arange(h) * sh // h).clip(0, sh - 1)
    xs = (np.arange(w) * sw // w).clip(0, sw - 1)
    return pixels[ys][:, xs]


def synthetic_image(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB test pattern: pixel (y, x) channel c =
    (seed + x*3 + y*7 + c*11) mod 256.  Pure closed form, so oracle SQL can
    recompute any derived statistic analytically."""
    y, x = np.mgrid[0:h, 0:w]
    base = (seed + x * 3 + y * 7) % 256
    return np.stack(
        [(base + c * 11) % 256 for c in range(3)], axis=-1
    ).astype(np.uint8)
