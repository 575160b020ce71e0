"""Property-based differentials for the pure-numpy media codecs
(imagecodec / videocodec / audiocodec), mirroring the footer-splice fuzz
discipline: encode→decode identity over the whole parameter space, and
total robustness — arbitrary byte garbage must either decode or raise the
codec's Unsupported*Error, never any other exception type."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from palletjack_spark.functions.audiocodec import (
    UnsupportedAudioError,
    decode_wav,
    encode_wav,
    encode_wav_mulaw,
    synthetic_audio,
)
from palletjack_spark.functions.imagecodec import (
    UnsupportedImageError,
    decode_image,
    encode_bmp,
    encode_ppm,
    synthetic_image,
)
from palletjack_spark.functions.videocodec import (
    UnsupportedVideoError,
    decode_avi,
    encode_avi,
    encode_avi_rle8,
    synthetic_video,
    synthetic_video_indexed,
)


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 255),
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    bmp=st.booleans(),
)
def test_image_roundtrip_any_dims(seed, w, h, bmp):
    px = synthetic_image(seed, w, h)
    d = decode_image(encode_bmp(px) if bmp else encode_ppm(px))
    assert (d["width"], d["height"]) == (w, h)
    assert np.array_equal(d["pixels"], px)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 255),
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    n=st.integers(1, 12),
    fps=st.integers(1, 60),
)
def test_video_roundtrip_any_shape(seed, w, h, n, fps):
    frames = synthetic_video(seed, w, h, n)
    d = decode_avi(encode_avi(frames, fps=fps))
    assert (d["width"], d["height"], d["n_frames"], d["fps"]) == (w, h, n, fps)
    for got, want in zip(d["frames"], frames):
        assert np.array_equal(got, want)


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 255),
    n=st.integers(1, 2000),
    ch=st.integers(1, 4),
    rate=st.sampled_from([8000, 16000, 44100, 48000]),
)
def test_audio_roundtrip_any_shape(seed, n, ch, rate):
    s = synthetic_audio(seed, n, ch)
    d = decode_wav(encode_wav(s, sample_rate=rate, channels=ch))
    assert (d["sample_rate"], d["channels"], d["n_samples"]) == (rate, ch, n)
    assert np.array_equal(d["samples"], s)


@settings(max_examples=150, deadline=None)
@given(data=st.binary(max_size=512))
def test_garbage_never_crashes_with_foreign_exception(data):
    for dec, err in (
        (decode_image, UnsupportedImageError),
        (decode_avi, UnsupportedVideoError),
        (decode_wav, UnsupportedAudioError),
    ):
        try:
            dec(data)
        except err:
            pass


@settings(max_examples=60, deadline=None)
@given(
    data=st.data(),
    kind=st.sampled_from(["bmp", "ppm", "avi", "avi_rle8", "wav", "wav_mulaw"]),
)
def test_mutated_valid_payloads_never_crash(data, kind):
    """Flip bytes inside real payloads: decode must return or raise the
    codec's own error — truncation, bad sizes, and corrupt headers are all
    expected in crawled data and must not poison an executor batch."""
    if kind == "bmp":
        payload, dec, err = (
            encode_bmp(synthetic_image(1, 9, 7)), decode_image,
            UnsupportedImageError,
        )
    elif kind == "ppm":
        payload, dec, err = (
            encode_ppm(synthetic_image(2, 9, 7)), decode_image,
            UnsupportedImageError,
        )
    elif kind == "avi":
        payload, dec, err = (
            encode_avi(synthetic_video(3, 8, 6, 3)), decode_avi,
            UnsupportedVideoError,
        )
    elif kind == "avi_rle8":
        payload, dec, err = (
            encode_avi_rle8(synthetic_video_indexed(6, 8, 6, 3)), decode_avi,
            UnsupportedVideoError,
        )
    elif kind == "wav":
        payload, dec, err = (
            encode_wav(synthetic_audio(4, 64)), decode_wav,
            UnsupportedAudioError,
        )
    else:
        payload, dec, err = (
            encode_wav_mulaw(synthetic_audio(5, 64)), decode_wav,
            UnsupportedAudioError,
        )
    buf = bytearray(payload)
    for _ in range(data.draw(st.integers(1, 8))):
        i = data.draw(st.integers(0, len(buf) - 1))
        buf[i] = data.draw(st.integers(0, 255))
    cut = data.draw(st.integers(0, len(buf)))
    try:
        dec(bytes(buf[:cut]))
    except err:
        pass  # the ONLY acceptable failure mode — callers catch exactly this


def test_bmp_data_offset_inside_header_rejected():
    """Round-15 codec sweep: a BMP whose bfOffBits points inside its own
    header would decode header bytes as pixels — corrupt input must be a
    typed error, not garbage output."""
    payload = bytearray(encode_bmp(synthetic_image(9, 9, 7)))
    import struct

    struct.pack_into("<I", payload, 10, 10)  # bfOffBits into the header
    try:
        decode_image(bytes(payload))
    except UnsupportedImageError as e:
        assert "overlaps the header" in str(e)
    else:  # pragma: no cover - failure detail
        raise AssertionError("offset-in-header BMP decoded silently")
