"""Pure-Python video codec for the multimodal pipeline.

A real encoder/decoder for the classic uncompressed video container —
**AVI** (RIFF 'AVI ' with a single 'vids' stream of uncompressed 24-bit
DIB frames) — implemented from the public RIFF/AVI and BITMAPINFOHEADER
specifications with numpy only, exactly the way ``imagecodec`` handles
BMP/PPM.  This makes the video decode path genuinely executable in this
container: payloads are real AVI files, widths/heights/frame counts come
from actual header parsing, and frame sampling decodes actual DIB pixel
data.

The reference has no media story at all (its surface is Parquet metadata
splicing — ``/root/reference/python/palletjack/palletjack.cc``); this
module serves the north-star multimodal mandate.  Compressed codecs
(MJPEG/H.264/...) stay out of scope by design: ``decode_avi`` raises a
clear ``UnsupportedVideoError`` for compressed streams, and
``FOURCC_DECODERS`` is the plug-in point where a library-backed frame
decoder would drop in unchanged.

Layout emitted by :func:`encode_avi` (all little-endian, chunk sizes
exclude the 8-byte chunk header, chunks pad to even length):

    RIFF <sz> 'AVI '
      LIST <sz> 'hdrl'
        'avih' 56   MainAVIHeader  (usec/frame, total frames, w, h, ...)
        LIST <sz> 'strl'
          'strh' 56 AVIStreamHeader (fccType 'vids', handler 'DIB ')
          'strf' 40 BITMAPINFOHEADER (24bpp, BI_RGB)
      LIST <sz> 'movi'
        '00db' <sz> bottom-up BGR rows, 4-byte-aligned   (x n_frames)
      'idx1' <sz> AVIINDEXENTRY x n_frames
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedVideoError(NotImplementedError):
    """Payload is not in a format this build can decode."""


#: dimension sanity cap, matching ``imagecodec.MAX_DIM`` — corrupt avih
#: headers must fail cleanly, not size multi-GB frame buffers (round-15
#: codec sweep: the RLE8 decoder allocates its (h, w) index grid from
#: header dimensions BEFORE any body-length check, so an implausible
#: header was an allocation DoS rather than a typed error)
MAX_DIM = 1 << 16


#: fourcc -> frame decoder ``(chunk_body, width, height, strf_bytes) ->
#: RGB (h, w, 3)``; ``b"DIB "``/``b"\0\0\0\0"`` (uncompressed) is built
#: in.  ``strf_bytes`` is the stream-format chunk (BITMAPINFOHEADER +
#: palette) — palettized codecs need it.  Register a compressed codec by
#: adding an entry (e.g. ``FOURCC_DECODERS[b"MJPG"] = jpeg_frame_decode``);
#: MS RLE8 (fourcc 'MRLE') registers below — a REAL compressed codec
#: (run-length, BI_RLE8) carried through this seam, proving the plug-in
#: point works end to end.
FOURCC_DECODERS: dict[bytes, object] = {}


def _dib_row_size(width: int) -> int:
    return (width * 3 + 3) & ~3


def _encode_dib(frame: np.ndarray) -> bytes:
    """RGB uint8 (h, w, 3) -> uncompressed DIB bits (bottom-up BGR,
    4-byte-aligned rows) — the '00db' chunk body."""
    h, w, c = frame.shape
    if c != 3:
        raise ValueError("encode expects (h, w, 3) RGB frames")
    pad = b"\x00" * (_dib_row_size(w) - w * 3)
    bgr = frame[:, :, ::-1]
    return b"".join(bgr[y].tobytes() + pad for y in range(h - 1, -1, -1))


def _decode_dib(body: bytes, w: int, h: int) -> np.ndarray:
    row_size = _dib_row_size(w)
    if len(body) < row_size * h:
        raise UnsupportedVideoError("truncated DIB frame chunk")
    raw = np.frombuffer(body, dtype=np.uint8, count=row_size * h).reshape(
        h, row_size
    )[:, : w * 3].reshape(h, w, 3)
    return raw[::-1, :, ::-1].copy()  # bottom-up BGR -> top-down RGB


# --------------------------------------------------------------------------
# MS RLE8 (public BI_RLE8 spec): 8-bit palettized run-length frames
# --------------------------------------------------------------------------

def rle8_palette() -> np.ndarray:
    """Deterministic 256-entry RGB palette — closed form (i*7, i*13, i*29)
    mod 256, so oracle SQL can recompute any palettized pixel probe."""
    i = np.arange(256)
    return np.stack([(i * 7) % 256, (i * 13) % 256, (i * 29) % 256],
                    axis=-1).astype(np.uint8)


def _encode_rle8_frame(idx_frame: np.ndarray) -> bytes:
    """(h, w) uint8 palette indices -> MS RLE8 stream (bottom-up rows;
    encoded runs capped at 255; EOL between rows, EOB at the end)."""
    h, w = idx_frame.shape
    out = bytearray()
    for y in range(h - 1, -1, -1):  # RLE8 data starts at the bottom row
        row = idx_frame[y]
        x = 0
        while x < w:
            v = row[x]
            run = 1
            while x + run < w and run < 255 and row[x + run] == v:
                run += 1
            out += bytes((run, int(v)))
            x += run
        if y != 0:
            out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    return bytes(out)


def _rle8_palette_from_strf(strf: bytes) -> np.ndarray:
    """BITMAPINFOHEADER (+RGBQUAD table) -> (256, 3) RGB palette."""
    if strf is None or len(strf) < 40:
        raise UnsupportedVideoError("RLE8 stream missing BITMAPINFOHEADER")
    bit_count, compression = struct.unpack_from("<HI", strf, 14)
    if bit_count != 8 or compression != 1:  # BI_RLE8
        raise UnsupportedVideoError(
            f"RLE8 decoder expects 8bpp/BI_RLE8, got {bit_count}bpp "
            f"compression {compression}"
        )
    (clr_used,) = struct.unpack_from("<I", strf, 32)
    n_colors = clr_used or 256
    # clamp to the quads actually present (round-15 codec sweep: a
    # truncated palette made np.frombuffer raise a raw ValueError instead
    # of this module's typed error); missing entries decode as black —
    # deterministic, and strictly better than crashing on a corrupt file
    avail = max(0, (len(strf) - 40) // 4)
    quads = np.frombuffer(
        strf, dtype=np.uint8, offset=40, count=min(n_colors, 256, avail) * 4
    ).reshape(-1, 4)
    palette = np.zeros((256, 3), dtype=np.uint8)
    palette[: len(quads)] = quads[:, 2::-1]  # RGBQUAD is B,G,R,reserved
    return palette


def _decode_rle8(body: bytes, w: int, h: int, strf: bytes) -> np.ndarray:
    """MS RLE8 '00dc' chunk -> RGB (h, w, 3).  Implements the full BI_RLE8
    state machine: encoded runs, absolute mode (escape >= 3, word-padded),
    delta moves (escape 2), end-of-line (0) and end-of-bitmap (1)."""
    palette = _rle8_palette_from_strf(strf)
    grid = np.zeros((h, w), dtype=np.uint8)  # bottom-up rows
    x = y = pos = 0
    n = len(body)
    while True:
        if pos + 2 > n:
            raise UnsupportedVideoError("truncated RLE8 stream")
        a, b = body[pos], body[pos + 1]
        pos += 2
        if a > 0:  # encoded run
            if y >= h or x + a > w:
                raise UnsupportedVideoError("RLE8 run overflows the frame")
            grid[y, x : x + a] = b
            x += a
        elif b == 0:  # end of line
            x, y = 0, y + 1
        elif b == 1:  # end of bitmap
            break
        elif b == 2:  # delta
            if pos + 2 > n:
                raise UnsupportedVideoError("truncated RLE8 delta")
            x += body[pos]
            y += body[pos + 1]
            pos += 2
            if x > w or y > h:
                raise UnsupportedVideoError("RLE8 delta leaves the frame")
        else:  # absolute mode: b literal indices, padded to a word boundary
            span = b + (b % 2)
            if pos + span > n:
                raise UnsupportedVideoError("truncated RLE8 absolute run")
            if y >= h or x + b > w:
                raise UnsupportedVideoError("RLE8 absolute run overflows")
            grid[y, x : x + b] = np.frombuffer(body, np.uint8, b, pos)
            x += b
            pos += span
    return palette[grid[::-1]]  # bottom-up -> top-down, indices -> RGB


def encode_avi_rle8(
    idx_frames: np.ndarray, palette: np.ndarray | None = None, fps: int = 10
) -> bytes:
    """(n, h, w) uint8 palette-index frames -> MS-RLE8-compressed AVI
    ('MRLE' handler, BI_RLE8 strf with an RGBQUAD palette, '00dc' chunks).
    The compressed sibling of :func:`encode_avi`."""
    if idx_frames.ndim != 3:
        raise ValueError("encode_avi_rle8 expects (n, h, w) index frames")
    if palette is None:
        palette = rle8_palette()
    n, h, w = idx_frames.shape
    bodies = [_encode_rle8_frame(idx_frames[i]) for i in range(n)]
    frame_bytes = max(len(b) for b in bodies)
    avih = struct.pack(
        "<14I", 1_000_000 // fps, frame_bytes * fps, 0, 0x10, n, 0, 1,
        frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MRLE"
        + struct.pack(
            "<IHHIIIIIIII4H", 0, 0, 0, 0, 1, fps, 0, n, frame_bytes,
            0xFFFFFFFF, 0, 0, 0, w, h,
        )
    )
    quads = np.zeros((256, 4), dtype=np.uint8)
    quads[:, :3] = palette[:, ::-1]  # RGBQUAD stores B,G,R,reserved
    strf = (
        struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, 0, 2835, 2835, 256, 0)
        + quads.tobytes()
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks, idx_entries, offset = [], [], 4
    for body in bodies:
        movi_chunks.append(_chunk(b"00dc", body))
        idx_entries.append(b"00dc" + struct.pack("<III", 0x10, offset, len(body)))
        offset += len(movi_chunks[-1])
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def synthetic_video_indexed(seed: int, w: int, h: int, n_frames: int) -> np.ndarray:
    """Deterministic palette-index frame stack with RUNS (RLE-friendly):
    frame f pixel (y, x) = (seed + f*13 + y*7 + (x//4)*3) mod 256 — pure
    closed form, so oracle SQL recomputes any probe analytically."""
    f, y, x = np.mgrid[0:n_frames, 0:h, 0:w]
    return ((seed + f * 13 + y * 7 + (x // 4) * 3) % 256).astype(np.uint8)


FOURCC_DECODERS[b"MRLE"] = _decode_rle8
FOURCC_DECODERS[b"mrle"] = _decode_rle8


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    """RIFF chunk: fourcc + u32 size + body, padded to even length."""
    return fourcc + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) % 2 else b""
    )


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """RGB uint8 array (n, h, w, 3) -> uncompressed AVI bytes."""
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("encode_avi expects (n, h, w, 3) RGB frames")
    n, h, w, _ = frames.shape
    frame_bytes = _dib_row_size(w) * h
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_bytes,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1, fps,  # dwScale / dwRate = frame period
            0,  # dwStart
            n,  # dwLength (frames)
            frame_bytes,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (0: one sample per chunk)
            0, 0, w, h,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 2835, 2835, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks, idx_entries, offset = [], [], 4  # offset from 'movi' fourcc
    for i in range(n):
        body = _encode_dib(frames[i])
        movi_chunks.append(_chunk(b"00db", body))
        idx_entries.append(
            b"00db" + struct.pack("<III", 0x10, offset, len(body))
        )
        offset += len(movi_chunks[-1])
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _walk_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) for each RIFF chunk in
    buf[pos:end], honouring even-length padding."""
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if body + size > end:
            raise UnsupportedVideoError("truncated AVI chunk")
        yield fourcc, body, size
        pos = body + size + (size % 2)


def decode_avi(payload: bytes, frame_indices=None) -> dict:
    """Uncompressed AVI bytes -> {width, height, n_frames, fps, frames}.

    Walks the RIFF tree: LIST 'hdrl' -> 'avih' for dimensions and frame
    count, LIST 'strl' -> 'strh' for the stream fourcc, LIST 'movi' for
    the '00db'/'00dc' frame chunks.  ``frame_indices`` selects which
    frames to pixel-decode (None = all); header metadata is always exact.
    Unknown top-level chunks (JUNK, INFO...) are skipped per the RIFF
    spec.  Compressed streams raise :class:`UnsupportedVideoError` unless
    a decoder is registered in :data:`FOURCC_DECODERS`.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise UnsupportedVideoError("not an AVI payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(len(payload), 8 + riff_size)

    width = height = n_frames = None
    usec_per_frame = 0
    handler = b"\x00\x00\x00\x00"
    strf_span: tuple[int, int] | None = None
    frame_chunks: list[tuple[int, int]] = []

    for fourcc, body, size in _walk_chunks(payload, 12, end):
        if fourcc != b"LIST":
            continue
        list_type = payload[body : body + 4]
        if list_type == b"hdrl":
            for f2, b2, s2 in _walk_chunks(payload, body + 4, body + size):
                if f2 == b"avih":
                    if s2 < 40:
                        raise UnsupportedVideoError("short avih header")
                    vals = struct.unpack_from("<10I", payload, b2)
                    usec_per_frame, n_frames = vals[0], vals[4]
                    width, height = vals[8], vals[9]
                elif f2 == b"LIST" and payload[b2 : b2 + 4] == b"strl":
                    in_vids = False
                    for f3, b3, s3 in _walk_chunks(payload, b2 + 4, b2 + s2):
                        if f3 == b"strh":
                            in_vids = payload[b3 : b3 + 4] == b"vids"
                            if in_vids:
                                handler = payload[b3 + 4 : b3 + 8]
                        elif f3 == b"strf" and in_vids:
                            # stream format (BITMAPINFOHEADER + palette) —
                            # palettized plug-in codecs need it
                            strf_span = (b3, s3)
        elif list_type == b"movi":
            for f2, b2, s2 in _walk_chunks(payload, body + 4, body + size):
                if f2[2:4] in (b"db", b"dc"):
                    frame_chunks.append((b2, s2))
                elif f2 == b"LIST" and payload[b2 : b2 + 4] == b"rec ":
                    # interleaved AVIs group frames in 'rec ' lists —
                    # recurse so every contained frame chunk is found
                    for f3, b3, s3 in _walk_chunks(payload, b2 + 4, b2 + s2):
                        if f3[2:4] in (b"db", b"dc"):
                            frame_chunks.append((b3, s3))

    if width is None or n_frames is None:
        raise UnsupportedVideoError("AVI missing avih header")
    if not (0 < width <= MAX_DIM and 0 < height <= MAX_DIM):
        raise UnsupportedVideoError(
            f"implausible AVI dimensions {width}x{height}"
        )
    uncompressed = handler in (b"DIB ", b"\x00\x00\x00\x00", b"RGB ")
    decoder = None if uncompressed else FOURCC_DECODERS.get(handler)
    if not uncompressed and decoder is None:
        raise UnsupportedVideoError(
            f"no decoder registered for video fourcc {handler!r}; "
            "register one in videocodec.FOURCC_DECODERS"
        )

    wanted = (
        range(len(frame_chunks))
        if frame_indices is None
        else [i for i in frame_indices if 0 <= i < len(frame_chunks)]
    )
    strf = (
        payload[strf_span[0] : strf_span[0] + strf_span[1]]
        if strf_span is not None
        else None
    )
    frames = []
    for i in wanted:
        b2, s2 = frame_chunks[i]
        body = payload[b2 : b2 + s2]
        frames.append(
            _decode_dib(body, width, height)
            if uncompressed
            else decoder(body, width, height, strf)
        )
    fps = round(1_000_000 / usec_per_frame) if usec_per_frame else 0
    return {
        "width": width,
        "height": height,
        "n_frames": len(frame_chunks),
        "declared_frames": n_frames,
        "fps": fps,
        "frames": frames,
    }


def synthetic_video(seed: int, w: int, h: int, n_frames: int) -> np.ndarray:
    """Deterministic RGB frame stack: frame f pixel (y, x) channel c =
    (seed + f*13 + x*3 + y*7 + c*11) mod 256 — the image test pattern with
    a per-frame offset, so oracle SQL can recompute derived statistics in
    closed form."""
    f, y, x = np.mgrid[0:n_frames, 0:h, 0:w]
    base = (seed + f * 13 + x * 3 + y * 7) % 256
    return np.stack(
        [(base + c * 11) % 256 for c in range(3)], axis=-1
    ).astype(np.uint8)
