"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed in Arrow batches via ``mapInPandas`` (training-data-pipeline ops).

The image/audio codec libraries are not available in this container, so the
actual decode is STUBBED: ``decode_image_stub`` raises ``NotImplementedError``
unless ``fake=True``, in which case it derives a deterministic fake
(width, height, channel-mean) from the payload bytes. Everything around the
stub — schema contract, Arrow batch iteration, partition-aligned processing,
output column discipline — is real and tested; swapping in a real codec is a
one-function change.

Scale notes: payloads stay opaque bytes end-to-end (no driver collect); the
Pandas UDF path is Arrow-batched (spark.sql.execution.arrow.maxRecordsPerBatch
controls batch shape). Partitioning by a content-hash prefix spreads hot
sources. At 100 TB you'd read payloads from a binary-file source
(``spark.read.format('binaryFile')``) or parquet with a BYTE_ARRAY column —
same schema contract either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("source", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("content_md5", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_intensity", DoubleType()),
    ]
)


def decode_image_stub(payload: bytes, fake: bool = False) -> tuple[int, int, float]:
    """STUB for image decode (PIL/libjpeg not installed in this container).

    With ``fake=True`` returns a deterministic (width, height, mean) derived
    from the payload's md5 — stable across engines/runs, good enough to test
    the batch plumbing. Real deployments replace this body with e.g.
    ``PIL.Image.open(io.BytesIO(payload))``.
    """
    if not fake:
        raise NotImplementedError(
            "image codec not available in this environment; pass fake=True "
            "or swap in a real decoder"
        )
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    mean = h[2] / 255.0
    return width, height, mean


def extract_media_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Decode/feature-extract payloads in Arrow batches via ``mapInPandas``.

    Emits FEATURE_SCHEMA rows; byte_len/content_md5 are codec-independent,
    width/height/mean_intensity come from the (stubbed) decoder.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            decoded = [decode_image_stub(bytes(p), fake=fake_decode) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": [len(bytes(p)) for p in payloads],
                    "content_md5": [hashlib.md5(bytes(p)).hexdigest() for p in payloads],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mean_intensity": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' over an opaque video payload: emit one row per sampled
    offset (the real codec would decode frames; the offsets/batching are the
    Spark-side contract being exercised). Pure built-in functions — no UDF."""
    n = F.least(
        F.lit(max_frames), F.greatest(F.lit(1), (F.length("payload") / every_n_bytes).cast("int"))
    )
    return media.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), n - 1)).alias("frame_idx", "_i"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_n_bytes).alias("byte_offset"),
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Fabricate a MEDIA_SCHEMA table from the documents fixture (text bytes
    as payload) — deterministic stand-in for real binary ingest in tests."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
        "source",
    )
