"""Pure-Python audio codec for the multimodal pipeline.

A real encoder/decoder for the classic uncompressed audio container —
**WAV** (RIFF 'WAVE' with a PCM 'fmt ' chunk and a 'data' chunk) —
implemented from the public RIFF/WAVE specification with numpy only, the
same discipline as ``imagecodec`` (BMP/PPM) and ``videocodec`` (AVI).
Audio payloads are real WAV files: sample rates, channel counts, and
sample counts come from actual 'fmt '/'data' chunk parsing, and sample
decode yields real PCM amplitudes.

Compressed formats (MP3/AAC/...) and non-PCM WAV encodings stay out of
scope by design: ``decode_wav`` raises a clear ``UnsupportedAudioError``
for format tags without a registered decoder, and ``FORMAT_DECODERS`` is
the plug-in point where a library-backed decoder would drop in unchanged.

Layout emitted by :func:`encode_wav` (little-endian; chunks pad to even
length per the RIFF spec):

    RIFF <sz> 'WAVE'
      'fmt ' 16   wFormatTag=1 (PCM), nChannels, nSamplesPerSec,
                  nAvgBytesPerSec, nBlockAlign, wBitsPerSample
      'data' <sz> interleaved little-endian PCM16 samples
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedAudioError(NotImplementedError):
    """Payload is not in a format this build can decode."""


#: wFormatTag -> sample decoder; PCM16 (tag 1) is built in.  Register a
#: compressed codec by adding an entry (e.g. ``FORMAT_DECODERS[0x55] =
#: mp3_decode``).  G.711 µ-law (tag 7) registers below — a REAL compressed
#: codec (2:1 companding) carried through this seam, proving the plug-in
#: point works end to end.
FORMAT_DECODERS: dict[int, object] = {}


# --------------------------------------------------------------------------
# G.711 µ-law (public ITU-T G.711 spec): 8-bit companded <-> 16-bit linear
# --------------------------------------------------------------------------

_MULAW_BIAS = 0x84  # 132
_MULAW_CLIP = 32635


def mulaw_encode(samples: np.ndarray) -> np.ndarray:
    """Linear int16 -> µ-law codewords (uint8), vectorized closed form:
    x = min(|s|, 32635) + 132; e = floor(log2 x) - 7; m = (x >> (e+3)) & 15;
    byte = ~(sign | e<<4 | m).  Exactly mirrored by the SQL oracle."""
    s = np.asarray(samples, dtype=np.int64)
    sign = np.where(s < 0, 0x80, 0)
    x = np.minimum(np.abs(s), _MULAW_CLIP) + _MULAW_BIAS
    # exponent = MSB position of (x >> 7); x in [132, 32767] -> e in [0, 7]
    e = (np.floor(np.log2(x)).astype(np.int64) - 7).clip(0, 7)
    m = (x >> (e + 3)) & 0x0F
    return (~(sign | (e << 4) | m) & 0xFF).astype(np.uint8)


def mulaw_decode_codewords(codes: np.ndarray) -> np.ndarray:
    """µ-law codewords (uint8) -> linear int16:
    u = ~byte; s = (((m<<3) + 132) << e) - 132, negated when sign bit set."""
    u = (~np.asarray(codes, dtype=np.int64)) & 0xFF
    sign = (u & 0x80) != 0
    e = (u >> 4) & 0x07
    m = u & 0x0F
    t = (((m << 3) + _MULAW_BIAS) << e) - _MULAW_BIAS
    return np.where(sign, -t, t).astype(np.int16)


def _decode_mulaw(raw: bytes, channels: int, bits: int) -> np.ndarray:
    """FORMAT_DECODERS entry for wFormatTag 7: one byte per sample."""
    if bits != 8:
        raise UnsupportedAudioError(f"µ-law WAV must be 8-bit, got {bits}")
    n = len(raw) // channels
    codes = np.frombuffer(raw, dtype=np.uint8, count=n * channels)
    return mulaw_decode_codewords(codes).reshape(n, channels)


FORMAT_DECODERS[7] = _decode_mulaw


def encode_wav_mulaw(
    samples: np.ndarray, sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """int16 sample array -> G.711 µ-law WAV bytes (wFormatTag 7, 8-bit,
    with the spec-required 'fact' chunk carrying the sample count)."""
    pcm = np.asarray(samples, dtype=np.int16)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    if pcm.ndim != 2 or pcm.shape[1] != channels:
        raise ValueError(f"expected (n,) or (n, {channels}) samples")
    data = mulaw_encode(pcm.reshape(-1)).tobytes()
    block_align = channels  # 1 byte/sample
    fmt = struct.pack(
        "<HHIIHHH", 7, channels, sample_rate, sample_rate * block_align,
        block_align, 8, 0,  # cbSize=0 (WAVEFORMATEX for non-PCM tags)
    )
    fact = struct.pack("<I", pcm.shape[0])
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav(
    samples: np.ndarray, sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """int16 sample array — shape (n,) mono or (n, channels) — to PCM16
    WAV bytes."""
    pcm = np.asarray(samples, dtype="<i2")
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    if pcm.ndim != 2 or pcm.shape[1] != channels:
        raise ValueError(f"expected (n,) or (n, {channels}) samples")
    block_align = channels * 2
    data = pcm.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes, decode_samples: bool = True) -> dict:
    """PCM WAV bytes -> {sample_rate, channels, bits, n_samples, samples}.

    Walks the RIFF chunks: 'fmt ' for the format header, 'data' for the
    PCM payload; unknown chunks (LIST/INFO, 'fact', cue points...) are
    skipped per the spec.  ``decode_samples=False`` parses headers only
    (the cheap metadata path).  Non-PCM format tags raise
    :class:`UnsupportedAudioError` unless registered in
    :data:`FORMAT_DECODERS`."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise UnsupportedAudioError("not a WAV payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(len(payload), 8 + riff_size)

    fmt_tag = channels = rate = bits = None
    data_span = None
    pos = 12
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if body + size > end:
            raise UnsupportedAudioError("truncated WAV chunk")
        if fourcc == b"fmt ":
            if size < 16:
                raise UnsupportedAudioError("short fmt chunk")
            fmt_tag, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, body
            )
        elif fourcc == b"data":
            data_span = (body, size)
        pos = body + size + (size % 2)

    if fmt_tag is None or data_span is None:
        raise UnsupportedAudioError("WAV missing fmt or data chunk")
    if channels < 1 or channels > 64 or bits < 8 or bits % 8:
        raise UnsupportedAudioError(
            f"implausible WAV format: {channels} channels / {bits} bits"
        )
    # rate is a u32: 0 would divide-by-zero in duration math downstream,
    # and anything past int32 overflows consumers' declared int fields
    if not (1 <= rate <= 2**31 - 1):
        raise UnsupportedAudioError(f"implausible WAV sample rate {rate}")
    pcm16 = fmt_tag == 1 and bits == 16
    decoder = None if pcm16 else FORMAT_DECODERS.get(fmt_tag)
    if not pcm16 and decoder is None:
        raise UnsupportedAudioError(
            f"no decoder registered for WAV format tag {fmt_tag} / "
            f"{bits} bits; register one in audiocodec.FORMAT_DECODERS"
        )
    body, size = data_span
    n_samples = size // (channels * (bits // 8))
    samples = None
    if decode_samples:
        raw = payload[body : body + size]
        samples = (
            np.frombuffer(raw, dtype="<i2", count=n_samples * channels)
            .reshape(n_samples, channels)
            .copy()
            if pcm16
            else decoder(raw, channels, bits)
        )
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "n_samples": n_samples,
        "samples": samples,
    }


def synthetic_audio(seed: int, n_samples: int, channels: int = 1) -> np.ndarray:
    """Deterministic PCM16 pattern: sample (i, c) = ((seed + i*37 + c*101)
    mod 2048) - 1024 — pure closed form, so oracle SQL can recompute any
    derived statistic (first sample, extrema, exact sums) analytically."""
    i, c = np.mgrid[0:n_samples, 0:channels]
    return (((seed + i * 37 + c * 101) % 2048) - 1024).astype(np.int16)
