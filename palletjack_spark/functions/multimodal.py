"""Multimodal column plumbing (north-star mandate).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata travelling alongside.  The Spark-side plumbing — schema, batch
shape, partition sizing, Arrow transfer through ``mapInPandas`` — is real
and tested, and since round 2 the IMAGE decode path is real too:
``imagecodec`` implements 24-bit BMP and binary PPM (P6) from their public
specs in pure numpy, so image payloads are actual image files, widths and
heights come from genuine header parsing, and resize is a real
nearest-neighbour resample over decoded pixels.  Compressed formats and
audio/video codecs remain out of scope for this container — the
``imagecodec.REGISTRY`` dict is the documented plug-in point, and
unsupported payloads raise ``UnsupportedImageError``.

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


def attach_fake_binary(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a multimodal asset table from a text fixture.

    Modality cycles (image, audio, video) by id.  IMAGE payloads are REAL
    encoded files — BMP for even ids, PPM for odd — of a deterministic
    test pattern with closed-form dimensions (``_asset_dims``), so decode
    correctness is oracle-checkable.  Audio/video payloads stay opaque
    utf-8 blobs (no codec in this container)."""
    cols = ["asset_id", "modality", "payload", "width", "height", "n_bytes"]

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, text in zip(pdf["asset_id"], pdf["text"]):
                aid = int(aid)
                modality = ("image", "audio", "video")[aid % 3]
                if modality == "image":
                    w, h = _asset_dims(aid)
                    px = synthetic_image(aid % 256, w, h)
                    payload = (
                        encode_bmp(px) if aid % 2 == 0 else encode_ppm(px)
                    )
                else:
                    payload = text.encode("utf-8")
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
    width, height).  Image payloads are REALLY decoded (BMP/PPM header
    parse via ``imagecodec``); non-image modalities report null dims."""

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            widths, heights = [], []
            for modality, p in zip(pdf["modality"], pdf["payload"]):
                if modality == "image" and p is not None:
                    try:
                        d = decode_image(bytes(p))
                        widths.append(d["width"])
                        heights.append(d["height"])
                    except UnsupportedImageError:
                        widths.append(None)
                        heights.append(None)
                else:
                    widths.append(None)
                    heights.append(None)
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
                }
            )

    return assets.mapInPandas(
        extract,
        "asset_id long, modality string, n_bytes long, head_byte int,"
        " checksum long, width int, height int",
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


def sample_frames(
    assets: DataFrame, frame_bytes: int = 256, max_frames: int = 4
) -> DataFrame:
    """Sample frames from video assets — the UDTF shape: one input row →
    one output row per sampled frame.  Frame extraction is STUBBED as
    fixed-size payload slices (no video codec in this container; a codec
    would replace the slicing, keeping the fan-out schema and Arrow
    batching)."""

    def fr(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, frames = [], [], []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                p = bytes(p) if p is not None else b""
                n = min(max_frames, max(1, len(p) // frame_bytes))
                for i in range(n):
                    ids.append(aid)
                    nos.append(i)
                    frames.append(p[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"asset_id": ids, "frame_no": nos, "frame_payload": frames}
            )

    return (
        assets.where(F.col("modality") == "video")
        .select("asset_id", "payload")
        .mapInPandas(fr, "asset_id long, frame_no int, frame_payload binary")
    )
