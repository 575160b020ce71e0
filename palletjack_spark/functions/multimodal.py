"""Multimodal column plumbing (north-star mandate).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata travelling alongside.  The Spark-side plumbing — schema, batch
shape, partition sizing, Arrow transfer through ``mapInPandas`` — is real
and tested; the actual media decode is stubbed (no image/audio libraries
in this container) behind ``decode_image_stub``, which raises
NotImplementedError unless ``fake=True`` supplies a deterministic fake
decode.

Scale notes: binary payloads stay in the executors (never collected);
feature extraction is Arrow-batched; ``spark.sql.execution.arrow.
maxRecordsPerBatch`` bounds batch memory for wide binaries; for real media
use ``spark.sql.files.maxPartitionBytes`` to keep (payload × rows/task)
under executor memory.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: schema of a multimodal asset table
ASSET_SCHEMA = (
    "asset_id long, modality string, payload binary, width int, height int,"
    " n_bytes long"
)


def decode_image_stub(payload: bytes, fake: bool = False) -> dict:
    """Decode an image payload → {width, height, mode}.

    STUB: real decoding needs an image library not present in this
    container.  ``fake=True`` returns a deterministic fake derived from the
    payload bytes so the distributed plumbing is testable end-to-end."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library; pass fake=True for "
            "the deterministic test double"
        )
    return {
        "width": 16 + payload[0] % 64 if payload else 16,
        "height": 16 + payload[-1] % 64 if payload else 16,
        "mode": "RGB",
    }


def attach_fake_binary(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a multimodal asset table from a text fixture: payload =
    utf-8 bytes of the text (a deterministic opaque blob), modality by id."""
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("n_bytes"),
    )


def extract_binary_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas``: (asset_id, modality, n_bytes, head_byte, checksum,
    width, height).  The decode step itself is the stub above with
    ``fake=True``."""

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                decode_image_stub(p if p is not None else b"", fake=True)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "head_byte": [
                        int(p[0]) if p is not None and len(p) else -1
                        for p in pdf["payload"]
                    ],
                    "checksum": [
                        int(sum(p) % 65521) if p is not None else 0
                        for p in pdf["payload"]
                    ],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
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
    through ``mapInPandas``.  The resample math is STUBBED as deterministic
    stride-subsampling of the payload bytes (a real kernel would drop in
    here unchanged — same signature, same batch shape)."""
    n_out = target_w * target_h * 3  # RGB

    def rs(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for p in pdf["payload"]:
                p = bytes(p) if p is not None else b""
                stride = max(1, len(p) // n_out)
                payloads.append(p[::stride][:n_out].ljust(n_out, b"\0"))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": payloads,
                    "width": target_w,
                    "height": target_h,
                    "n_bytes": n_out,
                }
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
    fixed-size payload slices (a codec would replace the slicing, keeping
    the fan-out schema and Arrow batching)."""

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
