"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery — schema, partitioning, Arrow-batched UDF
signatures, batch shapes — is real and tested; the actual media decode is
STUBBED (this container has no image/audio libraries): ``decode_stub``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake "decoder" derives features from the bytes so the
plumbing is exercisable end-to-end.

At scale the rules encoded here are the ones that matter:

* media bytes ride a ``binary`` column next to typed metadata
  (``media_type``, ``width``, ``height``, ``duration_ms``), never inside
  JSON strings — columnar pruning must be able to drop the heavy bytes
  when a query touches only metadata;
* decode/resize/frame-sample run in ``mapInPandas`` so each Python worker
  amortizes library init across an Arrow batch;
* Arrow batch sizes must be bounded (session.py sets
  ``maxRecordsPerBatch``) because a batch of 4K-video rows is GBs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    FloatType,
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image/audio/video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("feature", ArrayType(FloatType())),  # 8-dim embedding
        StructField("thumb_w", IntegerType()),
        StructField("thumb_h", IntegerType()),
    ]
)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (bytes derived from md5)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = hashlib.md5(f"media:{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                256 + (i % 8) * 64 if kind != "audio" else None,
                144 + (i % 8) * 36 if kind != "audio" else None,
                1000 * (i % 30) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_stub(payload: bytes, media_type: str, fake: bool = False) -> dict:
    """Decode one media payload.

    Real decode is NOT implemented in this environment (no PIL/ffmpeg).
    ``fake=True`` substitutes a deterministic byte-derived feature so the
    Spark plumbing can be tested end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in "
            "this container; pass fake=True for the deterministic stub"
        )
    h = hashlib.md5(payload).digest()
    feature = [b / 255.0 for b in h[:8]]
    return {
        "n_bytes": len(payload),
        "feature": feature,
        "thumb_w": 32,
        "thumb_h": 18,
    }


def extract_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """mapInPandas feature extraction over the binary column. The batch
    shape (columnar pandas in, columnar pandas out, one row per media)
    is exactly what a real decoder would use.

    ``fake`` defaults to False, matching decode_stub's fail-safe: a
    production caller gets NotImplementedError, never silent hash-derived
    fake embeddings; tests/queries opt into the stub explicitly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [],
                "feature": [],
                "thumb_w": [],
                "thumb_h": [],
            }
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                d = decode_stub(bytes(payload), mtype, fake=fake)
                out["n_bytes"].append(d["n_bytes"])
                out["feature"].append(d["feature"])
                out["thumb_w"].append(d["thumb_w"])
                out["thumb_h"].append(d["thumb_h"])
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling *plan* for video rows: explode (media_id, frame_ts)
    pairs without decoding — pure column math, showing how the sampling
    fan-out is expressed so the decode UDF downstream stays per-frame."""
    return (
        media.filter(F.col("media_type") == "video")
        .filter(F.col("duration_ms") > 0)
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms)
                )
            ).alias("frame_ts_ms"),
        )
    )
