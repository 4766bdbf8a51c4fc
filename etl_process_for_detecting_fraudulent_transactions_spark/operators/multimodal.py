"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed in Arrow batches via ``mapInPandas`` (training-data-pipeline ops).

The decode kernel is REAL for the netpbm P6 (binary PPM) format:
``decode_ppm`` parses the header (magic, comments, dimensions, maxval) and
computes pixel statistics from the actual raster bytes — no hashing tricks.
PNG — a genuinely COMPRESSED format — also decodes for real via stdlib
``zlib`` (chunk walk + CRC, inflate, all five scanline filters inverted),
and baseline JPEG — both grayscale and 3-component YCbCr color with
subsampled interleaved MCUs — decodes for real too (canonical Huffman +
DPCM + run-length entropy decode, dequantization, separable IDCT,
fixed-point color conversion — all from the public T.81 spec, no codec
library). Progressive (SOF2) and restart-interval JPEG are the remaining
unsupported corners; the ``decode_image`` dispatch point is the
one-function swap a full-codec deployment makes.

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

import numpy as np
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


def decode_ppm_raster(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL pure-Python parser for binary PPM (netpbm ``P6``).

    Parses the header per the netpbm spec subset that matters — ``P6``
    magic, ``#`` comment lines, whitespace-separated width/height/maxval,
    single whitespace byte before the raster — and returns
    (width, height, maxval, raster_bytes). Raises MediaDecodeError on
    truncation or malformed headers.
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
    return width, height, maxval, raster


def decode_ppm(payload: bytes) -> tuple[int, int, float]:
    """Decode a P6 PPM and compute the pixel mean from the actual raster.

    Returns (width, height, mean_intensity) with
    mean_intensity = sum(samples) / (n_samples * maxval) ∈ [0, 1].
    """
    width, height, maxval, raster = decode_ppm_raster(payload)
    # numpy-vectorized sums (same exact integers as the per-sample loop:
    # uint8/uint16 values accumulated into int64 — no float, no overflow for
    # any raster under 2^47 samples)
    if maxval < 256:
        arr = np.frombuffer(raster, dtype=np.uint8)
    else:  # 16-bit samples, big-endian per spec
        arr = np.frombuffer(raster, dtype=">u2")
    samples = arr.size
    total = int(arr.sum(dtype=np.int64))
    return width, height, total / (samples * maxval)


def decode_wav(payload: bytes) -> tuple[int, int, int, float]:
    """REAL pure-Python decoder for RIFF/WAVE PCM audio.

    Walks the chunk list (not fixed offsets — real WAV files carry LIST/fact
    chunks before data), validates the fmt chunk (PCM, 16-bit), and computes
    RMS amplitude from the actual little-endian samples. Returns
    (sample_rate, n_channels, n_samples, rms) with rms in raw sample units.
    Raises MediaDecodeError on truncation/malformed chunks.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise MediaDecodeError("not a RIFF/WAVE payload")
    pos = 12
    fmt = data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise MediaDecodeError(f"truncated {cid!r} chunk: {len(body)} of {size}")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise MediaDecodeError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise MediaDecodeError(f"unsupported WAV encoding fmt={audio_format} bits={bits}")
    if n_channels < 1 or len(data) % (2 * n_channels):
        raise MediaDecodeError("data chunk not a whole number of frames")
    if len(data) == 0:
        # structurally valid but empty recording: RMS is undefined, and the
        # division below would raise ZeroDivisionError instead of honoring
        # the documented MediaDecodeError contract
        raise MediaDecodeError("empty data chunk: no samples to decode")
    n_total = len(data) // 2
    # numpy-vectorized sum of squares: int16 samples squared (≤ 2^30) and
    # accumulated in int64 — bit-identical to the per-sample loop for any
    # clip under 2^33 samples
    samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
    sq = int(np.dot(samples, samples))
    n_samples = n_total // n_channels
    import math

    return sample_rate, n_channels, n_samples, math.sqrt(sq / n_total)


def resize_nearest(
    raster: bytes, src_w: int, src_h: int, out_w: int, out_h: int
) -> bytes:
    """REAL nearest-neighbor RGB resize over a decoded raster: output pixel
    (x, y) samples source pixel (x*src_w//out_w, y*src_h//out_h) — exact
    integer index math so any engine can replay it."""
    if len(raster) != 3 * src_w * src_h:
        raise MediaDecodeError("raster size does not match dimensions")
    # numpy fancy-indexed gather: identical x*src//out integer index math as
    # the per-pixel loop, one vectorized row/col selection instead
    arr = np.frombuffer(raster, dtype=np.uint8).reshape(src_h, src_w, 3)
    sy = (np.arange(out_h, dtype=np.int64) * src_h) // out_h
    sx = (np.arange(out_w, dtype=np.int64) * src_w) // out_w
    return arr[sy][:, sx].tobytes()


def decode_bmp(payload: bytes) -> tuple[int, int, float]:
    """REAL pure-Python decoder for uncompressed 24-bit BMP (BITMAPINFOHEADER).

    Parses the file header (pixel-array offset) and the info header
    (width, height — negative height = top-down rows — bit depth,
    BI_RGB only), then computes the pixel mean over the actual BGR rows,
    skipping each row's 4-byte alignment padding. Returns
    (width, height, mean_intensity) with mean over samples / 255 ∈ [0, 1]
    — the same contract as ``decode_ppm``."""
    if payload[:2] != b"BM":
        raise MediaDecodeError("not a BMP payload")
    if len(payload) < 54:
        raise MediaDecodeError("truncated BMP headers")
    pix_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise MediaDecodeError(f"unsupported BMP header size {hdr_size}")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    planes = int.from_bytes(payload[26:28], "little")
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if planes != 1 or bpp != 24 or compression != 0:
        raise MediaDecodeError(
            f"unsupported BMP encoding planes={planes} bpp={bpp} compression={compression}"
        )
    abs_h = abs(height)
    if width <= 0 or abs_h == 0:
        raise MediaDecodeError(f"bad BMP dimensions {width}x{height}")
    row_stride = (3 * width + 3) & ~3  # rows pad to 4-byte boundaries
    need = pix_off + row_stride * abs_h
    if len(payload) < need:
        raise MediaDecodeError(f"truncated BMP pixel array: {len(payload)} of {need}")
    rows = np.frombuffer(
        payload[pix_off : pix_off + row_stride * abs_h], dtype=np.uint8
    ).reshape(abs_h, row_stride)[:, : 3 * width]
    total = int(rows.sum(dtype=np.int64))
    return width, abs_h, total / (rows.size * 255)


def decode_image(payload: bytes) -> tuple[int, int, float]:
    """Dispatch on magic bytes. PPM, uncompressed 24-bit BMP, 8-bit
    truecolor PNG (stdlib-zlib inflate), and baseline JPEG — grayscale and
    YCbCr color (canonical Huffman + dequant + IDCT + fixed-point color
    conversion) — all decode for real. Progressive/restart-interval JPEG
    raises MediaDecodeError from the decoder itself; swapping in
    ``PIL.Image.open(io.BytesIO(payload))`` here remains the one-line
    change a full-codec deployment makes."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    if payload[:4] == b"GIF8":
        return decode_gif(payload)
    raise NotImplementedError(
        "no codec for this payload format in this environment "
        f"(magic={payload[:4]!r}); binary PPM (P6), uncompressed 24-bit "
        "BMP, 8-bit truecolor PNG, and baseline grayscale JPEG decode "
        "natively"
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


def synthesize_bmp_media(docs: DataFrame) -> DataFrame:
    """Fabricate REAL uncompressed 24-bit BMP payloads from the documents
    fixture — same deterministic recipe as ``synthesize_ppm_media`` (dims
    from the first two md5(text) bytes, pixel-array sample i =
    ``(doc_id*31 + i*7) % 256``) but laid out as a genuine BMP: 54-byte
    headers, bottom-up rows, 4-byte row padding (zeros, excluded from the
    decoder's mean). Exercises ``decode_bmp`` on real bytes; the oracle
    replays byte_len/mean analytically."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                h = hashlib.md5(text.encode()).digest()
                w, hgt = 4 + h[0] % 13, 4 + h[1] % 13
                stride = (3 * w + 3) & ~3
                vals = ((int(doc_id) * 31 + 7 * np.arange(3 * w * hgt, dtype=np.int64)) % 256).astype(np.uint8)
                rows = np.zeros((hgt, stride), dtype=np.uint8)
                rows[:, : 3 * w] = vals.reshape(hgt, 3 * w)
                body = rows.tobytes()
                info = (
                    (40).to_bytes(4, "little")
                    + w.to_bytes(4, "little", signed=True)
                    + hgt.to_bytes(4, "little", signed=True)
                    + (1).to_bytes(2, "little")
                    + (24).to_bytes(2, "little")
                    + (0).to_bytes(4, "little")
                    + len(body).to_bytes(4, "little")
                    + b"\x00" * 16
                )
                hdr = (
                    b"BM"
                    + (54 + len(body)).to_bytes(4, "little")
                    + b"\x00" * 4
                    + (54).to_bytes(4, "little")
                )
                payloads.append(hdr + info + body)
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "image",
                    "payload": payloads,
                    "source": pdf["source"],
                }
            )

    return docs.select("doc_id", "text", "source").mapInPandas(batches, schema=MEDIA_SCHEMA)


WAV_RATE = 8000

AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_sec", DoubleType()),
        StructField("rms", DoubleType()),
    ]
)

RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("src_width", IntegerType()),
        StructField("src_height", IntegerType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("resized_sum", LongType()),
        StructField("resized_mean", DoubleType()),
    ]
)


def synthesize_wav_media(docs: DataFrame) -> DataFrame:
    """Fabricate REAL RIFF/WAVE PCM payloads from the documents fixture.

    Deterministic for oracle replay: n_samples = 64 + md5(text)[2] % 192,
    sample i = ``((doc_id*7 + i*13) % 65536) - 32768`` as little-endian
    int16, mono at WAV_RATE. The files are genuine canonical WAVs — any
    audio tool plays them — so the decoder downstream walks real chunks.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                n = 64 + hashlib.md5(text.encode()).digest()[2] % 192
                data = b"".join(
                    (((d * 7 + i * 13) % 65536) - 32768).to_bytes(2, "little", signed=True)
                    for i in range(n)
                )
                fmt = (
                    (1).to_bytes(2, "little")          # PCM
                    + (1).to_bytes(2, "little")        # mono
                    + WAV_RATE.to_bytes(4, "little")
                    + (WAV_RATE * 2).to_bytes(4, "little")  # byte rate
                    + (2).to_bytes(2, "little")        # block align
                    + (16).to_bytes(2, "little")       # bits per sample
                )
                chunks = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
                chunks += b"data" + len(data).to_bytes(4, "little") + data
                payloads.append(b"RIFF" + len(chunks).to_bytes(4, "little") + chunks)
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "audio",
                    "payload": payloads,
                    "source": pdf["source"],
                }
            )

    return docs.select("doc_id", "text", "source").mapInPandas(batches, schema=MEDIA_SCHEMA)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Decode WAV payloads in Arrow batches: sample-rate/duration from the
    fmt chunk, RMS from the actual PCM samples."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [decode_wav(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": [r[0] for r in rows],
                    "n_channels": [r[1] for r in rows],
                    "n_samples": [r[2] for r in rows],
                    "duration_sec": [r[2] / r[0] for r in rows],
                    "rms": [r[3] for r in rows],
                }
            )

    return media.mapInPandas(batches, schema=AUDIO_SCHEMA)


def resize_media(media: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """Decode P6 payloads and nearest-neighbor-resize the real raster to
    (out_w, out_h); emits the resized raster's sum/mean so an analytic
    oracle can replay the exact integer index math."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, maxval, raster = decode_ppm_raster(bytes(p))
                rz = resize_nearest(raster, w, h, out_w, out_h)
                s = sum(rz)
                out_rows.append(
                    (mid, w, h, out_w, out_h, s, s / (len(rz) * maxval))
                )
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "media_id", "src_width", "src_height",
                    "out_width", "out_height", "resized_sum", "resized_mean",
                ],
            )

    return media.mapInPandas(batches, schema=RESIZE_SCHEMA)


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


# -- PNG: first COMPRESSED image codec, decoded for real ----------------------
# PNG needs no external codec library: the pixel stream is zlib-deflated
# (stdlib ``zlib``) scanlines, each prefixed by one of five filter bytes.
# This decoder walks the chunk structure (with CRC verification), inflates
# the IDAT stream, and inverts every filter type (None/Sub/Up/Average/
# Paeth). Baseline JPEG (grayscale and YCbCr color) decodes for real
# further below — the remaining unsupported corners are progressive (SOF2)
# and restart-interval streams.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> tuple[int, int, float]:
    """REAL pure-Python decoder for 8-bit truecolor (color type 2) PNG.

    Chunk walk with CRC checks → IHDR validation → IDAT concatenation →
    ``zlib.decompress`` → per-scanline filter inversion (all five filter
    types; Sub is an exact per-channel cumulative sum, Up is vectorized,
    Average/Paeth run the spec's sequential recurrence). Returns
    (width, height, mean_intensity) — the same contract as the PPM/BMP
    decoders."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise MediaDecodeError("not a PNG payload")
    pos, ihdr, idat, ended = 8, None, bytearray(), False
    while pos + 12 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) != ln:
            raise MediaDecodeError("truncated PNG chunk")
        crc = int.from_bytes(payload[pos + 8 + ln : pos + 12 + ln], "big")
        if crc != (zlib.crc32(typ + data) & 0xFFFFFFFF):
            raise MediaDecodeError(f"PNG chunk CRC mismatch in {typ!r}")
        pos += 12 + ln
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            ended = True
            break
    if ihdr is None or len(ihdr) != 13 or not ended:
        raise MediaDecodeError("missing or malformed IHDR/IEND")
    width = int.from_bytes(ihdr[0:4], "big")
    height = int.from_bytes(ihdr[4:8], "big")
    depth, color, comp, filt, interlace = ihdr[8], ihdr[9], ihdr[10], ihdr[11], ihdr[12]
    if depth != 8 or color != 2 or comp != 0 or filt != 0 or interlace != 0:
        raise MediaDecodeError(
            f"unsupported PNG encoding depth={depth} color={color} "
            f"comp={comp} filt={filt} interlace={interlace}"
        )
    if width <= 0 or height <= 0:
        raise MediaDecodeError(f"bad PNG dimensions {width}x{height}")
    stride = 3 * width
    expected = height * (1 + stride)
    # bounded inflate: the exact output size is known from IHDR, so cap the
    # decompressor at expected+1 — a zlib bomb (tiny IDAT deflating to GBs)
    # raises MediaDecodeError instead of OOMing the executor, matching the
    # other decoders' validate-declared-sizes-first discipline
    d = zlib.decompressobj()
    try:
        raw = d.decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise MediaDecodeError(f"corrupt PNG IDAT stream: {exc}") from exc
    if len(raw) != expected or not d.eof:
        raise MediaDecodeError(
            f"bad PNG scanline volume: {len(raw)} vs expected {expected}"
            + ("" if d.eof else " (stream continues past the declared raster)")
        )
    recon = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        f = raw[y * (1 + stride)]
        row = np.frombuffer(raw, np.uint8, count=stride, offset=y * (1 + stride) + 1)
        prev = recon[y - 1] if y else np.zeros(stride, np.uint8)
        if f == 0:
            recon[y] = row
        elif f == 1:  # Sub: per-channel cumulative sum mod 256, exact
            recon[y] = (
                np.cumsum(row.reshape(width, 3).astype(np.int64), axis=0)
                .astype(np.uint8)
                .ravel()
            )
        elif f == 2:  # Up: vectorized wrap-around add
            recon[y] = row + prev
        elif f in (3, 4):  # Average / Paeth: sequential spec recurrence
            out = recon[y]
            for x in range(stride):
                a = int(out[x - 3]) if x >= 3 else 0
                b = int(prev[x])
                if f == 3:
                    out[x] = (int(row[x]) + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(prev[x - 3]) if x >= 3 else 0
                    out[x] = (int(row[x]) + _paeth(a, b, c)) & 0xFF
        else:
            raise MediaDecodeError(f"unknown PNG filter type {f}")
    total = int(recon.sum(dtype=np.int64))
    return width, height, total / (recon.size * 255)


def _png_filter_rows(rows: "np.ndarray", f: int) -> "np.ndarray":
    """Apply PNG filter ``f`` to reconstructed rows (encode side) — filters
    reference RECONSTRUCTED neighbors, so encoding vectorizes fully."""
    if f == 0:
        return rows.copy()
    left = np.zeros_like(rows)
    left[:, 3:] = rows[:, :-3]
    up = np.zeros_like(rows)
    up[1:] = rows[:-1]
    if f == 1:
        return rows - left
    if f == 2:
        return rows - up
    if f == 3:
        return rows - ((left.astype(np.int16) + up.astype(np.int16)) // 2).astype(
            np.uint8
        )
    ul = np.zeros_like(rows)
    ul[1:, 3:] = rows[:-1, :-3]
    a, b, c = left.astype(np.int16), up.astype(np.int16), ul.astype(np.int16)
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)).astype(
        np.uint8
    )
    return rows - pred


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big")
        + typ
        + data
        + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def encode_png(rows: "np.ndarray", filter_type: int) -> bytes:
    """Encode reconstructed (h, 3*w) uint8 rows as a real 8-bit truecolor
    PNG, every scanline using ``filter_type``."""
    import zlib

    h, stride = rows.shape
    w = stride // 3
    filtered = _png_filter_rows(rows, filter_type)
    raw = b"".join(
        bytes([filter_type]) + filtered[y].tobytes() for y in range(h)
    )
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def synthesize_png_media(docs: DataFrame) -> DataFrame:
    """Fabricate REAL compressed PNG payloads from the documents fixture —
    the same deterministic pixel recipe as the PPM/BMP synthesizers (dims
    from the first two md5(text) bytes, sample i = (doc_id*31 + i*7) % 256)
    but zlib-deflated behind per-image filter type doc_id % 5, so every
    PNG filter path decodes for real in the gate. byte_len is NOT
    analytically replayable (deflate length), so the PNG gate drops it."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                h = hashlib.md5(text.encode()).digest()
                w, hgt = 4 + h[0] % 13, 4 + h[1] % 13
                vals = (
                    (int(doc_id) * 31 + 7 * np.arange(3 * w * hgt, dtype=np.int64))
                    % 256
                ).astype(np.uint8)
                payloads.append(
                    encode_png(vals.reshape(hgt, 3 * w), int(doc_id) % 5)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "image",
                    "payload": payloads,
                    "source": pdf["source"],
                }
            )

    return docs.select("doc_id", "text", "source").mapInPandas(batches, schema=MEDIA_SCHEMA)


# -- JPEG: baseline sequential decode, for real -------------------------------
# Baseline JPEG needs no external library either — the entropy layer is
# canonical Huffman coding and the transform is the 8x8 IDCT, both
# implementable exactly from the public ITU T.81 spec. The decoder below
# handles the general baseline path for 1-component (grayscale) and
# 3-component (YCbCr color, arbitrary integer-ratio sampling factors,
# interleaved MCU scan) frames: marker walk, DQT (8/16-bit), DHT, SOF0,
# SOS, byte-stuffed entropy-coded segment, DC DPCM + AC run-length,
# dequantization, de-zigzag, float separable IDCT with level shift, chroma
# replication upsample, fixed-point color conversion. The gates' payloads
# are DC-only with quant=1 and DC
# levels ≡ 0 (mod 8): the IDCT of a DC-only block is the constant DC/8, an
# exact integer, so the decoded mean is analytically replayable — the same
# restriction-for-oracle-exactness trade every multimodal gate makes, with
# the decode path itself fully real.

# Standard Huffman tables from ITU T.81 Annex K (public spec constants):
# (bit-length counts 1..16, then symbol values in order)
_JPEG_DC_LUMA_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_JPEG_DC_LUMA_VALS = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
_JPEG_AC_LUMA_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_JPEG_AC_LUMA_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
)

_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)
_ZIGZAG_IDX = np.array(_ZIGZAG)  # fancy-index form, built once


def _huffman_decode_table(bits, vals):
    """(code, length) -> symbol map built per T.81 C.2 canonical ordering."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(code, length)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huffman_encode_table(bits, vals):
    """symbol -> (code, length), the inverse of the decode table."""
    return {v: (c, l) for (c, l), v in _huffman_decode_table(bits, vals).items()}


# encode tables are compile-time constants — built once, not per payload
_DC_LUMA_ENC = _huffman_encode_table(_JPEG_DC_LUMA_BITS, _JPEG_DC_LUMA_VALS)
_AC_LUMA_ENC = _huffman_encode_table(_JPEG_AC_LUMA_BITS, _JPEG_AC_LUMA_VALS)


_IDCT_M = None


def _idct_basis():
    global _IDCT_M
    if _IDCT_M is None:
        m = np.zeros((8, 8))
        for u in range(8):
            cu = (0.5 / np.sqrt(2.0)) if u == 0 else 0.5
            for x in range(8):
                m[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / 16)
        _IDCT_M = m
    return _IDCT_M


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with T.81 byte
    unstuffing (0xFF 0x00 -> literal 0xFF; 0xFF D9 ends the scan)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf, self.pos, self.acc, self.nbits = buf, pos, 0, 0

    def _fill(self) -> None:
        if self.pos >= len(self.buf):
            raise MediaDecodeError("truncated JPEG entropy stream")
        b = self.buf[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.buf):
                raise MediaDecodeError("truncated JPEG marker in scan")
            nxt = self.buf[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed zero: literal 0xFF data byte
            elif nxt == 0xD9:  # EOI inside scan: pad bits exhausted
                raise MediaDecodeError("JPEG scan ended before all blocks")
            else:
                raise MediaDecodeError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((code, length))
            if sym is not None:
                return sym
        raise MediaDecodeError("invalid JPEG huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 sign extension of an s-bit magnitude value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


# libjpeg-style fixed-point YCbCr->RGB constants (BT.601 coefficients
# scaled by 2^16): the conversion is pure integer arithmetic (multiply,
# add the 0.5 rounding term, arithmetic-shift floor), so the decoded RGB
# is bit-deterministic and the gate oracle can replay the exact formula
# in SQL with FLOOR(x / 65536.0).
_FIX_CR_R = 91881  # round(1.40200 * 2^16)
_FIX_CB_G = 22554  # round(0.34414 * 2^16)
_FIX_CR_G = 46802  # round(0.71414 * 2^16)
_FIX_CB_B = 116130  # round(1.77200 * 2^16)


def _ycbcr_to_rgb(y: "np.ndarray", cb: "np.ndarray", cr: "np.ndarray"):
    """Fixed-point integer color conversion over int64 planes; returns the
    (3, h, w) clamped RGB stack. `>>16` on int64 is an arithmetic shift
    (floor), matching FLOOR(x/65536.0) in the oracle SQL."""
    cb_ = cb - 128
    cr_ = cr - 128
    r = y + ((_FIX_CR_R * cr_ + 32768) >> 16)
    g = y + ((-_FIX_CB_G * cb_ - _FIX_CR_G * cr_ + 32768) >> 16)
    b = y + ((_FIX_CB_B * cb_ + 32768) >> 16)
    return np.clip(np.stack([r, g, b]), 0, 255)


def decode_jpeg(payload: bytes) -> tuple[int, int, float]:
    """REAL baseline JPEG decoder (grayscale AND 3-component YCbCr color).

    Full marker walk, DQT/DHT/SOF0/SOS parsing, canonical Huffman decode of
    the byte-stuffed scan (DC DPCM + AC run-length/EOB/ZRL), dequantization,
    de-zigzag, separable float IDCT, +128 level shift, clamp. Color streams
    decode the interleaved MCU scan (per-component sampling factors, e.g.
    4:2:0 = 2x2,1x1,1x1), upsample chroma by replication, and convert
    YCbCr->RGB in fixed-point integer arithmetic. Progressive (SOF2) and
    restart-interval (DRI) streams raise MediaDecodeError as unsupported.
    Returns (width, height, mean_intensity) like the other image decoders;
    for color the mean is over all three RGB channels."""
    if payload[:2] != b"\xff\xd8":
        raise MediaDecodeError("not a JPEG payload")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    sof = None
    while True:
        if pos + 2 > len(payload):
            raise MediaDecodeError("truncated JPEG marker segment")
        if payload[pos] != 0xFF:
            raise MediaDecodeError(f"bad JPEG marker alignment at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise MediaDecodeError("JPEG EOI before SOS")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # TEM / RSTn: standalone markers, no length field
        if pos + 2 > len(payload):
            raise MediaDecodeError("truncated JPEG segment length")
        ln = int.from_bytes(payload[pos : pos + 2], "big")
        if ln < 2:
            raise MediaDecodeError(f"bad JPEG segment length {ln}")
        seg = payload[pos + 2 : pos + ln]
        if len(seg) != ln - 2:
            raise MediaDecodeError("truncated JPEG segment body")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                p += 1
                n = 64 * (2 if prec else 1)
                raw = seg[p : p + n]
                if len(raw) != n:
                    raise MediaDecodeError("truncated DQT")
                if prec:
                    q = [int.from_bytes(raw[2 * i : 2 * i + 2], "big") for i in range(64)]
                else:
                    q = list(raw)
                qtables[tid] = q
                p += n
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                if p + 17 > len(seg):
                    raise MediaDecodeError("truncated DHT header")
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = tuple(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = tuple(seg[p + 17 : p + 17 + n])
                if len(vals) != n:
                    raise MediaDecodeError("truncated DHT")
                htables[(cls, tid)] = _huffman_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if len(seg) < 6:
                raise MediaDecodeError("truncated SOF0 segment")
            precision, h, w, ncomp = seg[0], int.from_bytes(seg[1:3], "big"), int.from_bytes(seg[3:5], "big"), seg[5]
            if precision != 8:
                raise MediaDecodeError(f"unsupported JPEG precision {precision}")
            if ncomp not in (1, 3):
                raise MediaDecodeError(
                    f"unsupported JPEG component count {ncomp} (1 or 3)"
                )
            if len(seg) < 6 + 3 * ncomp:
                raise MediaDecodeError("truncated SOF0 component list")
            comps = []  # (cid, h_samp, v_samp, tq)
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                hs, vs = hv >> 4, hv & 0xF
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise MediaDecodeError(f"bad JPEG sampling factors {hs}x{vs}")
                comps.append((cid, hs, vs, tq))
            sof = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise MediaDecodeError(f"unsupported JPEG SOF type 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI: restart markers unsupported
            raise MediaDecodeError("unsupported JPEG restart-interval stream")
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise MediaDecodeError("JPEG SOS before SOF")
            if len(seg) < 1:
                raise MediaDecodeError("truncated SOS segment")
            ncomp_s = seg[0]
            if ncomp_s != len(sof[2]):
                raise MediaDecodeError(
                    "unsupported JPEG scan: component count differs from frame"
                )
            if len(seg) < 1 + 2 * ncomp_s + 3:
                raise MediaDecodeError("truncated SOS component list")
            scan_tabs = {}  # cid -> (dc table id, ac table id)
            for i in range(ncomp_s):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_tabs[cs] = (tdta >> 4, tdta & 0xF)
            scan_pos = pos + ln
            break
        pos += ln
    w, h, comps = sof
    if w <= 0 or h <= 0:
        raise MediaDecodeError(f"bad JPEG dimensions {w}x{h}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    # resolve per-component tables + geometry up front so a missing table
    # fails before any entropy decoding
    plan = []
    for cid, hs, vs, tq in comps:
        if hmax % hs or vmax % vs:
            raise MediaDecodeError(
                f"unsupported non-integer chroma upsampling ratio {hs}x{vs}"
            )
        if tq not in qtables:
            raise MediaDecodeError(f"JPEG references missing quant table {tq}")
        if cid not in scan_tabs:
            raise MediaDecodeError(f"JPEG scan missing component {cid}")
        dc_id, ac_id = scan_tabs[cid]
        dc_tab = htables.get((0, dc_id))
        ac_tab = htables.get((1, ac_id))
        if dc_tab is None or ac_tab is None:
            raise MediaDecodeError("JPEG references missing huffman table")
        plan.append((hs, vs, np.array(qtables[tq], dtype=np.int64), dc_tab, ac_tab))
    reader = _BitReader(payload, scan_pos)
    m = _idct_basis()

    def read_block(dc_tab, ac_tab, q, pred: int):
        zz = np.zeros(64, dtype=np.int64)
        s = reader.huff(dc_tab)
        diff = _extend(reader.bits(s), s) if s else 0
        pred += diff
        zz[0] = pred
        k = 1
        while k < 64:
            rs = reader.huff(ac_tab)
            r, size = rs >> 4, rs & 0xF
            if size == 0:
                if r == 15:  # ZRL: sixteen zeros
                    k += 16
                    if k > 63:
                        raise MediaDecodeError("JPEG AC coefficient overrun")
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise MediaDecodeError("JPEG AC coefficient overrun")
            zz[k] = _extend(reader.bits(size), size)
            k += 1
        coeff = np.zeros(64, dtype=np.float64)
        coeff[_ZIGZAG_IDX] = (zz * q).astype(np.float64)
        block = m.T @ coeff.reshape(8, 8) @ m
        return np.clip(np.rint(block).astype(np.int64) + 128, 0, 255), pred

    if len(comps) == 1:
        # non-interleaved single-component scan: MCU = one block
        hs, vs, q, dc_tab, ac_tab = plan[0]
        bw, bh = (w + 7) // 8, (h + 7) // 8
        img = np.zeros((bh * 8, bw * 8), dtype=np.int64)
        pred = 0
        for by in range(bh):
            for bx in range(bw):
                block, pred = read_block(dc_tab, ac_tab, q, pred)
                img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
        samples = img[:h, :w]
        total = int(samples.sum(dtype=np.int64))
        return w, h, total / (samples.size * 255)

    # interleaved multi-component scan (T.81 A.2.3): per MCU, component i
    # contributes h_i x v_i blocks in raster order; components in frame order
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.int64)
        for hs, vs, _, _, _ in plan
    ]
    preds = [0] * len(plan)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hs, vs, q, dc_tab, ac_tab) in enumerate(plan):
                for by in range(vs):
                    for bx in range(hs):
                        block, preds[ci] = read_block(dc_tab, ac_tab, q, preds[ci])
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    # replicate-upsample each plane to full MCU-padded resolution, then crop
    full = []
    for (hs, vs, _, _, _), plane in zip(plan, planes):
        up = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(up[:h, :w])
    rgb = _ycbcr_to_rgb(full[0], full[1], full[2])
    total = int(rgb.sum(dtype=np.int64))
    return w, h, total / (rgb.size * 255)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc, self.nbits = 0, 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def encode_jpeg_gray_dc(dc_levels: "np.ndarray", w: int, h: int) -> bytes:
    """Encode a REAL baseline grayscale JPEG whose blocks are DC-only.

    ``dc_levels`` is the (h//8, w//8) array of quantized DC coefficients
    (quant table all ones). With levels ≡ 0 (mod 8) every reconstructed
    block is the exact constant level/8 + 128 — analytically replayable."""
    seg = bytearray(b"\xff\xd8")  # SOI

    def chunk(marker: int, body: bytes) -> None:
        seg.extend(bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body)

    chunk(0xDB, bytes([0]) + bytes([1] * 64))  # DQT id 0, all ones
    chunk(
        0xC0,
        bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )  # SOF0: 1 component, 1x1 sampling, quant 0
    chunk(
        0xC4,
        bytes([0x00])
        + bytes(_JPEG_DC_LUMA_BITS)
        + bytes(_JPEG_DC_LUMA_VALS),
    )
    chunk(
        0xC4,
        bytes([0x10])
        + bytes(_JPEG_AC_LUMA_BITS)
        + bytes(_JPEG_AC_LUMA_VALS),
    )
    chunk(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
    dc_enc = _DC_LUMA_ENC
    ac_enc = _AC_LUMA_ENC
    wtr = _BitWriter()
    pred = 0
    for level in np.asarray(dc_levels, dtype=np.int64).ravel():
        diff = int(level) - pred
        pred = int(level)
        s = int(abs(diff)).bit_length()
        if s > 11:
            raise ValueError(
                f"DC DPCM diff {diff} needs magnitude category {s}; the "
                "Annex-K DC table tops out at 11 (|diff| < 2048)"
            )
        code, ln = dc_enc[s]
        wtr.write(code, ln)
        if s:
            wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        code, ln = ac_enc[0x00]  # EOB: all ACs zero
        wtr.write(code, ln)
    seg.extend(wtr.flush())
    seg.extend(b"\xff\xd9")  # EOI
    return bytes(seg)


def synthesize_jpeg_media(docs: DataFrame) -> DataFrame:
    """Fabricate REAL baseline grayscale JPEG payloads from the documents
    fixture: dims 8·(1 + md5[0]%3) × 8·(1 + md5[1]%3), block b's quantized
    DC level = 8·((doc_id·31 + b·7) % 25 − 12) — multiples of 8 with a flat
    quant table make every reconstructed block the exact constant
    level/8 + 128 ∈ [116, 140], so the decoded mean is analytically
    replayable while the payload exercises the full real decode path
    (markers, Huffman, DPCM, byte unstuffing, IDCT, level shift)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                hd = hashlib.md5(text.encode()).digest()
                w = 8 * (1 + hd[0] % 3)
                hgt = 8 * (1 + hd[1] % 3)
                bw, bh = w // 8, hgt // 8
                b = np.arange(bw * bh, dtype=np.int64)
                levels = 8 * ((int(doc_id) * 31 + b * 7) % 25 - 12)
                payloads.append(
                    encode_jpeg_gray_dc(levels.reshape(bh, bw), w, hgt)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "image",
                    "payload": payloads,
                    "source": pdf["source"],
                }
            )

    return docs.select("doc_id", "text", "source").mapInPandas(batches, schema=MEDIA_SCHEMA)


def encode_jpeg_color_dc(
    y_levels: "np.ndarray",
    cb_levels: "np.ndarray",
    cr_levels: "np.ndarray",
    w: int,
    h: int,
) -> bytes:
    """Encode a REAL baseline 4:2:0 YCbCr color JPEG whose blocks are
    DC-only.

    ``y_levels`` is the (h//8, w//8) array of quantized luma DC levels;
    ``cb_levels`` / ``cr_levels`` are the (h//16, w//16) chroma DC levels
    (one chroma block per MCU at 2x2,1x1,1x1 sampling). w and h must be
    multiples of 16 so every MCU is full. All components share the flat
    quant table and the Annex-K luma Huffman tables (legal — table ids are
    per-scan-component). With levels ≡ 0 (mod 8) every reconstructed block
    is the exact constant level/8 + 128, so the decoded RGB mean is
    analytically replayable through the fixed-point color conversion."""
    if w % 16 or h % 16:
        raise ValueError("color DC encoder requires dimensions ≡ 0 (mod 16)")
    seg = bytearray(b"\xff\xd8")  # SOI

    def chunk(marker: int, body: bytes) -> None:
        seg.extend(bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body)

    chunk(0xDB, bytes([0]) + bytes([1] * 64))  # DQT id 0, all ones
    chunk(
        0xC0,
        bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )  # SOF0: YCbCr 4:2:0, all on quant table 0
    chunk(0xC4, bytes([0x00]) + bytes(_JPEG_DC_LUMA_BITS) + bytes(_JPEG_DC_LUMA_VALS))
    chunk(0xC4, bytes([0x10]) + bytes(_JPEG_AC_LUMA_BITS) + bytes(_JPEG_AC_LUMA_VALS))
    chunk(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))  # SOS
    wtr = _BitWriter()
    preds = [0, 0, 0]
    ys = np.asarray(y_levels, dtype=np.int64)
    cbs = np.asarray(cb_levels, dtype=np.int64)
    crs = np.asarray(cr_levels, dtype=np.int64)

    def emit(level: int, ci: int) -> None:
        diff = int(level) - preds[ci]
        preds[ci] = int(level)
        s = int(abs(diff)).bit_length()
        if s > 11:
            raise ValueError(
                f"DC DPCM diff {diff} needs magnitude category {s}; the "
                "Annex-K DC table tops out at 11 (|diff| < 2048)"
            )
        code, ln = _DC_LUMA_ENC[s]
        wtr.write(code, ln)
        if s:
            wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        code, ln = _AC_LUMA_ENC[0x00]  # EOB: all ACs zero
        wtr.write(code, ln)

    for my in range(h // 16):
        for mx in range(w // 16):
            for dy in range(2):  # 4 luma blocks per MCU, raster order
                for dx in range(2):
                    emit(int(ys[2 * my + dy, 2 * mx + dx]), 0)
            emit(int(cbs[my, mx]), 1)
            emit(int(crs[my, mx]), 2)
    seg.extend(wtr.flush())
    seg.extend(b"\xff\xd9")  # EOI
    return bytes(seg)


def synthesize_jpeg_color_media(docs: DataFrame) -> DataFrame:
    """Fabricate REAL baseline 4:2:0 color JPEG payloads from the documents
    fixture: dims 16·(1 + md5[0]%2) × 16·(1 + md5[1]%2); luma block b's
    quantized DC level = 8·((doc_id·31 + b·7) % 25 − 12) (same generative
    family as the grayscale gate, so Y = (doc_id·31 + b·7) % 25 + 116
    exactly); chroma is constant per image with Cb−128 = doc_id·5 % 41 − 20
    and Cr−128 = doc_id·11 % 41 − 20 — offsets small enough that the
    fixed-point YCbCr→RGB conversion never clamps, keeping the decoded RGB
    mean an exact integer formula the oracle can replay."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                hd = hashlib.md5(text.encode()).digest()
                w = 16 * (1 + hd[0] % 2)
                hgt = 16 * (1 + hd[1] % 2)
                bw, bh = w // 8, hgt // 8
                b = np.arange(bw * bh, dtype=np.int64)
                y_levels = (8 * ((int(doc_id) * 31 + b * 7) % 25 - 12)).reshape(bh, bw)
                cb = 8 * (int(doc_id) * 5 % 41 - 20)
                cr = 8 * (int(doc_id) * 11 % 41 - 20)
                cshape = (hgt // 16, w // 16)
                payloads.append(
                    encode_jpeg_color_dc(
                        y_levels,
                        np.full(cshape, cb, dtype=np.int64),
                        np.full(cshape, cr, dtype=np.int64),
                        w,
                        hgt,
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "image",
                    "payload": payloads,
                    "source": pdf["source"],
                }
            )

    return docs.select("doc_id", "text", "source").mapInPandas(batches, schema=MEDIA_SCHEMA)


# -- perceptual hashing (aHash) -----------------------------------------------

PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("hash_hi", LongType()),
        StructField("hash_lo", LongType()),
        StructField("n_set", LongType()),
    ]
)


def perceptual_hash(media: DataFrame, grid: int = 8) -> DataFrame:
    """aHash perceptual fingerprint over REAL decoded rasters: decode the P6
    payload, grayscale each pixel as the channel SUM (0..765 — no float
    luma weights, so every engine replays it), nearest-neighbor-sample a
    ``grid x grid`` cell raster with the exact ``(k*src)//grid`` index math
    of ``resize_nearest``, and set bit i iff ``cell_i * grid^2 >= total``
    (the average test cross-multiplied into integers). The 64 bits pack
    big-endian into two 32-bit halves (``hash_hi``/``hash_lo``) so the
    values stay positive bigints in any engine.

    Near-dup image search then reduces to hamming distance on the packed
    halves — ``bit_count(xor)`` exactly as the simhash gate does for text;
    at scale the hashes band into buckets the same way."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, _maxval, raster = decode_ppm_raster(bytes(p))
                arr = (
                    np.frombuffer(raster, dtype=np.uint8)
                    .reshape(h, w, 3)
                    .astype(np.int64)
                )
                g = arr.sum(axis=2)
                sy = (np.arange(grid, dtype=np.int64) * h) // grid
                sx = (np.arange(grid, dtype=np.int64) * w) // grid
                cells = g[sy][:, sx].reshape(-1)
                total = int(cells.sum())
                bits = (cells * (grid * grid) >= total).astype(np.int64)
                half = (grid * grid) // 2
                hi = int(sum(int(b) << (half - 1 - i) for i, b in enumerate(bits[:half])))
                lo = int(sum(int(b) << (half - 1 - i) for i, b in enumerate(bits[half:])))
                rows.append((mid, w, h, hi, lo, int(bits.sum())))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "hash_hi", "hash_lo", "n_set",
                ],
            )

    return media.mapInPandas(batches, schema=PHASH_SCHEMA)


# -- GIF: LZW-compressed palette images (round 5) ------------------------------
# The fourth real image codec, exercising a compression family the suite
# didn't have: GIF's variable-width LSB-first LZW (PNG is zlib/LZ77+Huffman,
# JPEG is DCT+Huffman). Encoder and decoder implement the standard GIF
# convention — code width starts min_code_size+1 and grows when the next
# table slot reaches 2^width (checked after each table add), CLEAR resets,
# EOI terminates — so the payloads are genuine GIF89a files any external
# tool decodes.


def _gif_lzw_encode(data: bytes, mcs: int = 8) -> bytes:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    next_code, width = eoi + 1, mcs + 1
    table = {bytes([i]): i for i in range(1 << mcs)}
    out, acc, nbits = bytearray(), 0, 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    seq = b""
    for b in data:
        nxt = seq + bytes([b])
        if nxt in table:
            seq = nxt
            continue
        emit(table[seq])
        if next_code < 4096:  # tiny gate rasters never fill the table
            table[nxt] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        seq = bytes([b])
    if seq:
        emit(table[seq])
        # phantom tick: decoders advance their width counter on EVERY data
        # code read (they cannot know this was the tail emission with no
        # table add), so the encoder must advance too or the EOI widths
        # disagree exactly when the final append lands on a power of two
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, mcs: int) -> bytes:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width, acc, nbits, pos = mcs + 1, 0, 0, 0

    def read() -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                raise MediaDecodeError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    table: list[bytes] | None = None
    out, prev = bytearray(), None
    next_code = eoi + 1
    while True:
        code = read()
        if code == clear:
            table = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
            width, prev, next_code = mcs + 1, None, eoi + 1
            continue
        if code == eoi:
            break
        if table is None:
            raise MediaDecodeError("GIF LZW data before clear code")
        if prev is None:
            if code >= len(table):
                raise MediaDecodeError(f"bad first GIF LZW code {code}")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
            else:
                raise MediaDecodeError(f"GIF LZW code {code} beyond table")
            if len(table) < 4096:
                table.append(prev + entry[:1])
        # the width counter ticks once per DATA CODE READ (the giflib
        # convention), decoupled from table appends: table content runs one
        # entry behind the encoder's, but the encoder advances its counter
        # once per data code emitted — including the first after a clear
        # (its add) and the tail (a phantom tick) — so this mirrors it
        if next_code < 4096:
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        out += entry
        prev = entry
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, float]:
    """REAL pure-Python decoder for non-interlaced GIF87a/89a.

    Parses the logical screen descriptor and global color table, skips
    extension blocks (sub-block chains), LZW-decodes the first image's
    index stream, and computes the pixel mean over the PALETTE RGB samples
    — same (width, height, mean) contract as the other image decoders."""
    if payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise MediaDecodeError("not a GIF payload")
    if len(payload) < 13:
        raise MediaDecodeError("truncated GIF headers")
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = payload[pos : pos + n]
        if len(gct) != n:
            raise MediaDecodeError("truncated GIF global color table")
        pos += n
    while pos < len(payload):
        marker = payload[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            raise MediaDecodeError("GIF trailer before any image block")
        if marker == 0x21:  # extension: label + sub-block chain
            pos += 1
            while True:
                if pos >= len(payload):
                    raise MediaDecodeError("truncated GIF extension")
                size = payload[pos]
                pos += 1 + size
                if size == 0:
                    break
            continue
        if marker != 0x2C:
            raise MediaDecodeError(f"unknown GIF block 0x{marker:02x}")
        if pos + 9 > len(payload):
            raise MediaDecodeError("truncated GIF image descriptor")
        iw = int.from_bytes(payload[pos + 4 : pos + 6], "little")
        ih = int.from_bytes(payload[pos + 6 : pos + 8], "little")
        ipacked = payload[pos + 8]
        pos += 9
        if ipacked & 0x40:
            raise MediaDecodeError("interlaced GIF unsupported")
        palette = gct
        if ipacked & 0x80:
            n = 3 * (2 << (ipacked & 0x07))
            palette = payload[pos : pos + n]
            if len(palette) != n:
                raise MediaDecodeError("truncated GIF local color table")
            pos += n
        if palette is None:
            raise MediaDecodeError("GIF image without a color table")
        if iw <= 0 or ih <= 0:
            raise MediaDecodeError(f"bad GIF dimensions {iw}x{ih}")
        mcs = payload[pos]
        pos += 1
        chunks = []
        while True:
            if pos >= len(payload):
                raise MediaDecodeError("truncated GIF image data")
            size = payload[pos]
            pos += 1
            if size == 0:
                break
            chunks.append(payload[pos : pos + size])
            pos += size
        idx = np.frombuffer(_gif_lzw_decode(b"".join(chunks), mcs), dtype=np.uint8)
        if idx.size != iw * ih:
            raise MediaDecodeError(
                f"GIF index stream {idx.size} != {iw}x{ih} pixels"
            )
        pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise MediaDecodeError("GIF index beyond palette")
        samples = pal[idx]  # (n, 3) gather — the actual RGB raster
        total = int(samples.sum(dtype=np.int64))
        return iw, ih, total / (samples.size * 255)
    raise MediaDecodeError("GIF ended without an image block")


def synthesize_gif_media(docs: DataFrame) -> DataFrame:
    """Fabricate REAL GIF89a payloads from the documents fixture — the same
    deterministic recipe as the other image synthesizers (dims from the
    first two md5(text) bytes, pixel i's palette INDEX =
    ``(doc_id*31 + i*7) % 256``) over a 256-entry grayscale global color
    table (entry j = (j,j,j)), LZW-compressed for real. The oracle replays
    the index sum analytically; mean over palette RGB == index mean."""
    gct = bytes(v for j in range(256) for v in (j, j, j))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                h = hashlib.md5(text.encode()).digest()
                w, hgt = 4 + h[0] % 13, 4 + h[1] % 13
                idx = bytes((int(doc_id) * 31 + i * 7) % 256 for i in range(w * hgt))
                lsd = (
                    w.to_bytes(2, "little")
                    + hgt.to_bytes(2, "little")
                    + bytes([0xF7, 0, 0])  # GCT present, 2^(7+1)=256 entries
                )
                desc = (
                    b"\x2c"
                    + bytes(4)  # left, top
                    + w.to_bytes(2, "little")
                    + hgt.to_bytes(2, "little")
                    + b"\x00"  # no LCT, not interlaced
                )
                lzw = _gif_lzw_encode(idx, 8)
                blocks = b"".join(
                    bytes([min(255, len(lzw) - i)]) + lzw[i : i + 255]
                    for i in range(0, len(lzw), 255)
                )
                payloads.append(
                    b"GIF89a" + lsd + gct + desc + bytes([8]) + blocks + b"\x00\x3b"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "image",
                    "payload": payloads,
                    "source": pdf["source"],
                }
            )

    return docs.select("doc_id", "text", "source").mapInPandas(batches, schema=MEDIA_SCHEMA)
