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
#: mp3_decode``).
FORMAT_DECODERS: dict[int, object] = {}


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
