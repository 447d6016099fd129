"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

North-star surface for a training-data pipeline: images/audio/video
ride through the engine as ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.

The decode KERNELS are deterministic stubs (this container ships no
image/audio codecs — see ``_decode_stub``); the Spark-side plumbing —
schemas, batch iteration, partitioning behavior, output contracts — is
real and tested. Swapping a stub for Pillow/ffmpeg changes one inner
function, not the pipeline.

Scale notes:
- payload bytes never pass through the driver; each ``mapInPandas``
  batch is an Arrow RecordBatch on an executor.
- metadata (width/height/codec/duration) lives in plain columns, so
  filters like ``meta.width >= 512`` prune BEFORE any decode runs —
  project the metadata early, decode late.
- output rows that explode per-frame (``sample_frames``) multiply row
  counts, not payload copies: frames are sliced views re-encoded per
  row.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("codec", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("n_frames", IntegerType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def synthetic_media_table(spark, n: int = 100, seed: int = 7) -> DataFrame:
    """Deterministic fake media table: payload = seeded pseudo-random
    bytes, metadata consistent with the payload generator. Stands in
    for a parquet table of real encoded media."""
    rows = []
    for i in range(n):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        w = 64 + (h[0] % 8) * 32
        ht = 64 + (h[1] % 8) * 32
        frames = 1 + h[2] % 5
        payload = (h * ((w * ht * 3 // len(h)) + 1))[: w * ht * 3]
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, bytearray(payload), ("fake", w, ht, frames)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_stub(payload: bytes, width: int, height: int, dim: int = 8) -> list[float]:
    """STUB decode+featurize kernel. A real build decodes ``payload``
    with an image codec and runs a feature extractor; the container has
    no codecs, so this derives a deterministic ``dim``-float vector
    from the payload bytes (sha256-seeded). Replace the body — the
    signature and the pipeline around it are the real contract."""
    h = hashlib.sha256(payload).digest()
    return [((h[i] << 8 | h[i + 1]) / 65535.0) for i in range(0, 2 * dim, 2)]


def decode_image_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Decode + feature-extract images via ``mapInPandas``: Arrow
    batches in, (media_id, width, height, feature) out. Metadata-only
    columns project through without touching payload bytes; the
    ``kind == 'image'`` filter runs BEFORE this stage (pushed to the
    scan), so non-image payloads are never shipped to Python."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["meta"].map(lambda m: m["width"]),
                    "height": pdf["meta"].map(lambda m: m["height"]),
                    "feature": [
                        _decode_stub(bytes(p), m["width"], m["height"], dim)
                        for p, m in zip(pdf["payload"], pdf["meta"])
                    ],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches, schema=IMAGE_FEATURE_SCHEMA
    )


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize stage: payload → payload' with updated metadata. The
    resample kernel is stubbed (payload bytes are truncated/tiled to
    the target size deterministically); schema contract — same
    MEDIA_SCHEMA in and out — is the real part."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_payload = []
            out_meta = []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                need = target_w * target_h * 3
                raw = bytes(p)
                resized = (raw * (need // max(len(raw), 1) + 1))[:need]
                out_payload.append(bytearray(resized))
                out_meta.append(
                    {
                        "codec": m["codec"],
                        "width": target_w,
                        "height": target_h,
                        "n_frames": m["n_frames"],
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out_payload,
                    "meta": out_meta,
                }
            )

    return media.mapInPandas(batches, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled
    frame (frame payload = stubbed equal slice of the video payload).
    Row explosion happens executor-side inside the Arrow batch — the
    driver never sees payload bytes."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_payload", BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, payloads = [], [], []
            for mid, p, m in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                raw = bytes(p)
                n = int(m["n_frames"])
                step = max(len(raw) // max(n, 1), 1)
                for fi in range(0, n, every_nth):
                    ids.append(mid)
                    idxs.append(fi)
                    payloads.append(bytearray(raw[fi * step : (fi + 1) * step]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(batches, schema=out_schema)
