"""Multimodal column plumbing (north-star mandate).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata travelling alongside.  The Spark-side plumbing — schema, batch
shape, partition sizing, Arrow transfer through ``mapInPandas`` — is real
and tested, and the decode paths are real too:

- IMAGE (round 2): ``imagecodec`` implements 24-bit BMP and binary PPM
  (P6) from their public specs in pure numpy — widths/heights come from
  genuine header parsing, resize is a real nearest-neighbour resample.
- VIDEO (round 3): ``videocodec`` implements the uncompressed AVI
  container (RIFF 'AVI ' tree walk -> 'avih' header -> 'movi' '00db' DIB
  frame chunks) the same way — frame counts and dimensions come from the
  actual RIFF parse, and frame sampling decodes real pixel data.

Compressed codecs plug in through the documented seams and three are
REAL here: baseline JPEG (round 16, ``jpegcodec`` — the T.81 Huffman +
DCT process in numpy, registered in ``imagecodec.REGISTRY``), G.711
µ-law audio (``audiocodec.FORMAT_DECODERS``) and MS-RLE8 video
(``videocodec.FOURCC_DECODERS``).  Codecs outside the implemented set
(H.264/...) raise ``UnsupportedImageError`` / ``UnsupportedVideoError``.

Scale notes: binary payloads stay in the executors (never collected);
feature extraction is Arrow-batched; ``spark.sql.execution.arrow.
maxRecordsPerBatch`` bounds batch memory for wide binaries; for real media
use ``spark.sql.files.maxPartitionBytes`` to keep (payload × rows/task)
under executor memory.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from palletjack_spark.functions.imagecodec import (
    UnsupportedImageError,
    decode_image,
    encode_bmp,
    encode_ppm,
    resize_nearest,
    synthetic_image,
)
from palletjack_spark.functions.pngcodec import encode_png
from palletjack_spark.functions.jpegcodec import (
    encode_jpeg,
    synthetic_block_image,
)
from palletjack_spark.functions.videocodec import (
    UnsupportedVideoError,
    decode_avi,
    encode_avi,
    encode_avi_rle8,
    synthetic_video,
    synthetic_video_indexed,
)
from palletjack_spark.functions.audiocodec import (
    UnsupportedAudioError,
    decode_wav,
    encode_wav,
    encode_wav_mulaw,
    synthetic_audio,
)

#: schema of a multimodal asset table
ASSET_SCHEMA = (
    "asset_id long, modality string, payload binary, width int, height int,"
    " n_bytes long"
)


def _asset_dims(asset_id: int) -> tuple[int, int]:
    """Deterministic closed-form dimensions for synthetic image assets —
    the oracle side recomputes these in SQL, the Spark side must recover
    them by DECODING the payload."""
    return 8 + asset_id % 16, 8 + (asset_id * 7) % 16


def _video_dims(asset_id: int) -> tuple[int, int, int]:
    """Closed-form (width, height, n_frames) for synthetic video assets —
    same oracle discipline as ``_asset_dims``: the SQL side recomputes
    these analytically, the Spark side must recover them by parsing the
    AVI RIFF headers."""
    return (
        8 + (asset_id * 5) % 12,
        6 + (asset_id * 3) % 10,
        2 + asset_id % 7,
    )


#: synthetic audio sample rate (Hz)
AUDIO_RATE = 8000


def _audio_dims(asset_id: int) -> tuple[int, int]:
    """Closed-form (channels, n_samples) for synthetic audio assets."""
    return 1 + asset_id % 2, 100 + (asset_id * 11) % 400


#: modality cycle used by :func:`attach_fake_binary` (index = id % 3)
_MODALITIES = ("image", "audio", "video")


def attach_fake_binary(
    df: DataFrame,
    text_col: str,
    id_col: str,
    audio_codec: str = "pcm16",
    video_codec: str = "dib",
    image_codec: str = "bmp_ppm",
    modalities: tuple[str, ...] | None = None,
) -> DataFrame:
    """Build a multimodal asset table from a text fixture.

    Modality cycles (image, audio, video) by id.  ALL THREE payloads are
    REAL encoded files — BMP (even ids) / PPM (odd) images, WAV audio,
    uncompressed-AVI video — of deterministic test patterns with
    closed-form parameters (``_asset_dims`` / ``_audio_dims`` /
    ``_video_dims``), so decode correctness is oracle-checkable for every
    modality.  ``audio_codec``: ``"pcm16"`` (uncompressed) or ``"mulaw"``
    (G.711-companded — exercises the ``FORMAT_DECODERS`` compressed-codec
    seam on the read side).  ``video_codec``: ``"dib"`` (uncompressed) or
    ``"rle8"`` (MS-RLE8-compressed, palettized — exercises the
    ``FOURCC_DECODERS`` seam).  ``image_codec``: ``"bmp_ppm"``
    (uncompressed, BMP for even ids / PPM for odd), ``"jpeg"``
    (baseline 4:2:0 JFIF of the per-block-constant gray pattern —
    exercises the compressed image seam; odd ids carry a restart
    interval so the DRI/RST path is hit too), ``"jpeg_progressive"``
    (the same per-block-constant pattern as an SOF2 PROGRESSIVE stream
    — spectral-selection bands, DC/AC successive approximation,
    EOBRUN runs; the format most web JPEGs use), or ``"png"``
    (lossless RFC 2083 of the standard synthetic pattern — truecolor
    for even ids, PLTE palette for odd, scanline filters cycling
    y % 5, so the fixture exercises zlib inflate, all five filter
    decoders, and the palette path in every image).

    ``modalities``: optional subset of ``("image", "audio", "video")``.
    A caller that consumes ONE modality (q94c-q94i all do) previously
    paid the encode cost of all three and filtered after the opaque
    ``mapInPandas`` — which Catalyst cannot see through, so 2/3 of the
    encode work was computed and thrown away (optimization guide §1.2
    "don't compute things you throw away" / §4.1 opaque-function
    pruning).  Passing the consumed subset filters rows by the id-cycle
    BEFORE the Python stage, as a narrow Catalyst predicate at the scan;
    the emitted rows (ids, payload bytes, every column) are identical to
    the unfiltered output filtered afterwards.  Default ``None`` keeps
    all three.

    The encode stage is CPU-bound Python, so when the input arrives in
    fewer partitions than the cluster's parallelism (one small parquet
    file → one task) it is spread with a repartition first; at corpus
    scale inputs already carry enough splits and the spread is a no-op
    (guide §2.5 input skew)."""
    if audio_codec not in ("pcm16", "mulaw"):
        raise ValueError(f"unknown audio_codec {audio_codec!r}")
    if video_codec not in ("dib", "rle8"):
        raise ValueError(f"unknown video_codec {video_codec!r}")
    if image_codec not in ("bmp_ppm", "jpeg", "jpeg_progressive", "png"):
        raise ValueError(f"unknown image_codec {image_codec!r}")
    if modalities is not None:
        unknown = set(modalities) - set(_MODALITIES)
        if unknown:
            raise ValueError(f"unknown modalities {sorted(unknown)!r}")
        keep = sorted(_MODALITIES.index(m) for m in set(modalities))
        if len(keep) < len(_MODALITIES):
            df = df.where((F.col(id_col) % 3).isin(keep))
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    cols = ["asset_id", "modality", "payload", "width", "height", "n_bytes"]

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, text in zip(pdf["asset_id"], pdf["text"]):
                aid = int(aid)
                modality = ("image", "audio", "video")[aid % 3]
                if modality == "image":
                    w, h = _asset_dims(aid)
                    if image_codec == "jpeg":
                        payload = encode_jpeg(
                            synthetic_block_image(aid % 256, w, h),
                            subsampling="420",
                            restart_interval=2 if aid % 2 else 0,
                        )
                    elif image_codec == "jpeg_progressive":
                        payload = encode_jpeg(
                            synthetic_block_image(aid % 256, w, h),
                            subsampling="420",
                            progressive=True,
                        )
                    elif image_codec == "png":
                        payload = encode_png(
                            synthetic_image(aid % 256, w, h),
                            palette=aid % 2 == 1,
                            filter_mode="cycle",
                        )
                    else:
                        px = synthetic_image(aid % 256, w, h)
                        payload = (
                            encode_bmp(px) if aid % 2 == 0 else encode_ppm(px)
                        )
                elif modality == "video":
                    w, h, n = _video_dims(aid)
                    if video_codec == "dib":
                        payload = encode_avi(
                            synthetic_video(aid % 256, w, h, n), fps=10
                        )
                    else:
                        payload = encode_avi_rle8(
                            synthetic_video_indexed(aid % 256, w, h, n),
                            fps=10,
                        )
                else:
                    ch, ns = _audio_dims(aid)
                    enc = encode_wav if audio_codec == "pcm16" else encode_wav_mulaw
                    payload = enc(
                        synthetic_audio(aid % 256, ns, ch),
                        sample_rate=AUDIO_RATE,
                        channels=ch,
                    )
                rows.append(
                    {
                        "asset_id": aid,
                        "modality": modality,
                        "payload": payload,
                        "width": None,
                        "height": None,
                        "n_bytes": len(payload),
                    }
                )
            yield pd.DataFrame(rows, columns=cols, dtype=object)

    return df.select(
        F.col(id_col).alias("asset_id"), F.col(text_col).alias("text")
    ).mapInPandas(gen, ASSET_SCHEMA)


def extract_binary_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas``: (asset_id, modality, n_bytes, head_byte, checksum,
    width, height, n_frames).  Image payloads are REALLY decoded (BMP/PPM
    header parse via ``imagecodec``) and video payloads REALLY parsed
    (AVI 'avih' header via ``videocodec``, pixel decode skipped —
    header-only metadata read); audio reports null dims."""

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            widths, heights, framecounts = [], [], []
            for modality, p in zip(pdf["modality"], pdf["payload"]):
                w = h = n = None
                if p is not None:
                    if modality == "image":
                        try:
                            d = decode_image(bytes(p))
                            w, h = d["width"], d["height"]
                        except UnsupportedImageError:
                            pass
                    elif modality == "video":
                        try:
                            d = decode_avi(bytes(p), frame_indices=[])
                            w, h, n = d["width"], d["height"], d["n_frames"]
                        except UnsupportedVideoError:
                            pass
                widths.append(w)
                heights.append(h)
                framecounts.append(n)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "head_byte": [
                        int(p[0]) if p is not None and len(p) else -1
                        for p in pdf["payload"]
                    ],
                    "checksum": [
                        int(np.frombuffer(bytes(p), dtype=np.uint8).sum())
                        % 65521
                        if p is not None
                        else 0
                        for p in pdf["payload"]
                    ],
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "n_frames": pd.array(framecounts, dtype="Int32"),
                }
            )

    return assets.mapInPandas(
        extract,
        "asset_id long, modality string, n_bytes long, head_byte int,"
        " checksum long, width int, height int, n_frames int",
    )


def resize_images(
    assets: DataFrame, target_w: int = 32, target_h: int = 32
) -> DataFrame:
    """Resize image assets to (target_w, target_h): binary-in/binary-out
    through ``mapInPandas``.  REAL pipeline: decode (BMP/PPM) →
    nearest-neighbour resample → re-encode as BMP.  Payloads no codec can
    read pass through with null dims rather than poisoning the batch."""

    def rs(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    d = decode_image(bytes(p) if p is not None else b"")
                except UnsupportedImageError:
                    rows.append(
                        {
                            "asset_id": aid,
                            "payload": None,
                            "width": None,
                            "height": None,
                            "n_bytes": 0,
                        }
                    )
                    continue
                out = encode_bmp(
                    resize_nearest(d["pixels"], target_w, target_h)
                )
                rows.append(
                    {
                        "asset_id": aid,
                        "payload": out,
                        "width": target_w,
                        "height": target_h,
                        "n_bytes": len(out),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "payload", "width", "height", "n_bytes"],
                dtype=object,
            )

    return (
        assets.where(F.col("modality") == "image")
        .select("asset_id", "payload")
        .mapInPandas(
            rs, "asset_id long, payload binary, width int, height int, n_bytes long"
        )
    )


def image_pixel_probes(assets: DataFrame) -> DataFrame:
    """Decode image payloads and probe three pixels — (0,0), the center
    (h//2, w//2), and the far corner (h-1, w-1), red channel — via
    ``mapInPandas``.  The probes anchor DECODED CONTENT, not just header
    metadata: for the q94g JPEG differential the first and last probe
    sit in different MCUs, so a wrong Huffman walk, DC prediction chain,
    dequantization, IDCT scale, or chroma upsample shifts at least one
    of them off the oracle's closed form.  Payloads no codec can read
    yield null probes rather than poisoning the batch."""

    def probe(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    d = decode_image(bytes(p) if p is not None else b"")
                except UnsupportedImageError:
                    rows.append(
                        {"asset_id": aid, "width": None, "height": None,
                         "p00": None, "p_mid": None, "p_last": None}
                    )
                    continue
                px = d["pixels"]
                h, w = px.shape[:2]
                rows.append(
                    {
                        "asset_id": aid,
                        "width": w,
                        "height": h,
                        "p00": int(px[0, 0, 0]),
                        "p_mid": int(px[h // 2, w // 2, 0]),
                        "p_last": int(px[h - 1, w - 1, 0]),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "width", "height", "p00", "p_mid", "p_last"],
                dtype=object,
            )

    return (
        assets.where(F.col("modality") == "image")
        .select("asset_id", "payload")
        .mapInPandas(
            probe,
            "asset_id long, width int, height int, p00 int, p_mid int,"
            " p_last int",
        )
    )


def _skip_counter(df: DataFrame, what: str):
    """Accumulator + executor-side log line for undecodable payloads.

    Skip-on-corrupt must not be SILENT (round-3 ADVICE: corrupt assets
    vanishing indistinguishably from empty output is data loss at curation
    scale): each batch that drops payloads logs a warning on the executor,
    and the total is queryable on the driver after any action via the
    accumulator handle attached to the result as ``_pjs_skipped``."""
    import logging

    acc = df.sparkSession.sparkContext.accumulator(0)
    log = logging.getLogger("palletjack_spark.multimodal")

    def note(n_skipped: int, n_batch: int) -> None:
        if n_skipped:
            acc.add(n_skipped)
            log.warning(
                "%s: skipped %d/%d undecodable payloads in batch",
                what, n_skipped, n_batch,
            )

    return acc, note


def sample_frames(assets: DataFrame, max_frames: int = 4) -> DataFrame:
    """Sample frames from video assets — the UDTF shape: one input row →
    one output row per sampled frame.  REAL pipeline since round 3: parse
    the AVI RIFF tree (``videocodec.decode_avi``), uniformly sample up to
    ``max_frames`` frames (source indices ``i * n // max_frames`` when the
    video is longer, every frame otherwise — only the selected '00db'
    chunks are pixel-decoded), and re-encode each sampled frame as a
    standalone BMP image payload.  Output: (asset_id, frame_no, src_frame,
    width, height, frame_payload).  Payloads no registered codec can read
    are skipped rather than poisoning the batch (``FOURCC_DECODERS`` is
    the compressed-codec plug-in point) — but NOT silently: skips are
    counted into an accumulator (attached to the result DataFrame as
    ``_pjs_skipped``) and warned per batch."""
    acc, note = _skip_counter(assets, "sample_frames")

    def fr(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            skipped = 0
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    meta = decode_avi(bytes(p) if p is not None else b"",
                                      frame_indices=[])
                    n = meta["n_frames"]
                    srcs = (
                        list(range(n))
                        if n <= max_frames
                        else [i * n // max_frames for i in range(max_frames)]
                    )
                    # the pixel decode must be inside the guard too: headers
                    # can parse while a selected DIB chunk is corrupt/short
                    decoded = decode_avi(bytes(p), frame_indices=srcs)
                except UnsupportedVideoError:
                    skipped += 1
                    continue
                for frame_no, (src, px) in enumerate(
                    zip(srcs, decoded["frames"])
                ):
                    rows.append(
                        {
                            "asset_id": aid,
                            "frame_no": frame_no,
                            "src_frame": src,
                            "width": meta["width"],
                            "height": meta["height"],
                            "frame_payload": encode_bmp(px),
                        }
                    )
            note(skipped, len(pdf))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "frame_no", "src_frame", "width", "height",
                    "frame_payload",
                ],
                dtype=object,
            )

    out = (
        assets.where(F.col("modality") == "video")
        .select("asset_id", "payload")
        .mapInPandas(
            fr,
            "asset_id long, frame_no int, src_frame int, width int,"
            " height int, frame_payload binary",
        )
    )
    out._pjs_skipped = acc
    return out


def extract_audio_features(assets: DataFrame) -> DataFrame:
    """Audio feature extraction over WAV payloads via ``mapInPandas``:
    (asset_id, sample_rate, channels, n_samples, duration_ms,
    first_sample, last_sample).  REAL pipeline: the RIFF/WAVE chunks are
    genuinely parsed (``audiocodec.decode_wav``) and the probe samples
    come from decoded PCM amplitudes — channel 0's first and last sample.
    Payloads no registered codec can read are skipped
    (``FORMAT_DECODERS`` is the compressed-codec plug-in point — G.711
    µ-law WAVs, tag 7, decode through it out of the box) — but NOT
    silently: skips are counted into an accumulator (attached to the
    result DataFrame as ``_pjs_skipped``) and warned per batch."""
    acc, note = _skip_counter(assets, "extract_audio_features")

    def ex(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            skipped = 0
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    d = decode_wav(bytes(p) if p is not None else b"")
                except UnsupportedAudioError:
                    skipped += 1
                    continue
                s = d["samples"]
                rows.append(
                    {
                        "asset_id": aid,
                        "sample_rate": d["sample_rate"],
                        "channels": d["channels"],
                        "n_samples": d["n_samples"],
                        "duration_ms": d["n_samples"] * 1000 // d["sample_rate"],
                        "first_sample": int(s[0, 0]) if len(s) else None,
                        "last_sample": int(s[-1, 0]) if len(s) else None,
                    }
                )
            note(skipped, len(pdf))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "sample_rate", "channels", "n_samples",
                    "duration_ms", "first_sample", "last_sample",
                ],
                dtype=object,
            )

    out = (
        assets.where(F.col("modality") == "audio")
        .select("asset_id", "payload")
        .mapInPandas(
            ex,
            "asset_id long, sample_rate int, channels int, n_samples int,"
            " duration_ms long, first_sample int, last_sample int",
        )
    )
    out._pjs_skipped = acc
    return out
