"""Multimodal decode gate: synthesize REAL binary-PPM payloads from the
documents fixture, decode them with the real pure-Python PPM parser inside
Arrow-batched ``mapInPandas``, and validate the decoded dimensions and
pixel-mean against an analytic DuckDB oracle.

The synthesis is deterministic (dimensions from md5(text) bytes, pixel i =
``(doc_id*31 + i*7) % 256``), so the oracle recomputes width/height/byte_len
analytically and the raster mean with a per-doc lateral ``range`` — a fully
independent derivation of what the decoder must read out of the actual
bytes. ``content_md5`` (payload md5) is real but this DuckDB build has no
``md5(BLOB)``, so the gate projects it out; tests/test_multimodal.py pins it
against a Python-side construction instead.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ._io import fan_out
from ..operators.multimodal import (
    WAV_RATE,
    extract_audio_features,
    extract_media_features,
    frame_sample,
    media_from_documents,
    resize_media,
    synthesize_ppm_media,
    synthesize_wav_media,
)

_HEX = "0123456789abcdef"


def _media_docs(spark: SparkSession, sf_dir: str):
    """Documents that can seed a synthetic media payload.

    Null posture (round-8 null-robustness audit): a NULL-text doc has no
    payload — md5(NULL) is NULL in both engines, so dimensions/sample
    counts would be NULL and the Arrow codec kernels would crash on None.
    Every gate here and every oracle (WHERE text IS NOT NULL) excludes
    such docs identically."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        "text IS NOT NULL"
    )


def _sql_md5_byte(expr: str, i: int) -> str:
    """i-th byte of md5(expr) as 0..255, from hex chars (shared-hash trick)."""
    c1 = f"substr(md5({expr}), {2 * i + 1}, 1)"
    c2 = f"substr(md5({expr}), {2 * i + 2}, 1)"
    return f"((instr('{_HEX}', {c1}) - 1) * 16 + (instr('{_HEX}', {c2}) - 1))"


def multimodal_features(spark: SparkSession, sf_dir: str):
    docs = _media_docs(spark, sf_dir)
    return extract_media_features(synthesize_ppm_media(docs)).drop("content_md5")


# Header is b"P6\n%d %d\n255\n" → 3 + digits(w) + 1 + digits(h) + 1 + 4 bytes;
# raster is 3*w*h bytes of (doc_id*31 + i*7) % 256; mean = sum/(3*w*h*255).
ORACLE_FEATURES = f"""
WITH m AS (
  SELECT doc_id,
         CAST(4 + {_sql_md5_byte('text', 0)} % 13 AS INT) AS width,
         CAST(4 + {_sql_md5_byte('text', 1)} % 13 AS INT) AS height
  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents
),
px AS (
  SELECT doc_id, CAST(SUM((doc_id * 31 + i * 7) % 256) AS BIGINT) AS s
  FROM m, unnest(range(0, 3 * width * height)) AS u(i)
  GROUP BY doc_id
)
SELECT m.doc_id AS media_id,
       'image' AS media_type,
       CAST(9 + length(CAST(width AS VARCHAR)) + length(CAST(height AS VARCHAR))
            + 3 * width * height AS BIGINT) AS byte_len,
       width, height,
       CAST(px.s AS DOUBLE) / (3 * width * height * 255) AS mean_intensity
FROM m JOIN px USING (doc_id)
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str):
    docs = _media_docs(spark, sf_dir)
    return frame_sample(media_from_documents(docs))


ORACLE_FRAMES = """
WITH m AS (
  SELECT doc_id AS media_id,
         LEAST(8, GREATEST(1, CAST(FLOOR(octet_length(encode(text)) / 1024.0) AS INT))) AS n
  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents
)
SELECT media_id, CAST(i AS INT) AS frame_idx, CAST(i AS INT) * 1024 AS byte_offset
FROM m, unnest(range(0, n)) AS u(i)
"""


def multimodal_audio_features(spark: SparkSession, sf_dir: str):
    """Genuine RIFF/WAVE PCM payloads → real chunk-walking decoder → RMS and
    duration from the actual samples; oracle replays the deterministic
    sample function analytically."""
    docs = _media_docs(spark, sf_dir)
    return extract_audio_features(synthesize_wav_media(docs))


# sample i = ((doc_id*7 + i*13) % 65536) - 32768; n = 64 + md5(text)[2] % 192
ORACLE_AUDIO = f"""
WITH m AS (
  SELECT doc_id, 64 + {_sql_md5_byte('text', 2)} % 192 AS n FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents
),
ss AS (
  SELECT doc_id,
         SUM(((doc_id * 7 + i * 13) % 65536 - 32768)
             * ((doc_id * 7 + i * 13) % 65536 - 32768)) AS sq
  FROM m, unnest(range(0, n)) AS u(i)
  GROUP BY doc_id
)
SELECT m.doc_id AS media_id,
       CAST({WAV_RATE} AS INT) AS sample_rate,
       CAST(1 AS INT) AS n_channels,
       CAST(m.n AS BIGINT) AS n_samples,
       CAST(m.n AS DOUBLE) / {WAV_RATE} AS duration_sec,
       sqrt(CAST(sq AS DOUBLE) / m.n) AS rms
FROM m JOIN ss USING (doc_id)
"""


RESIZE_W = RESIZE_H = 4


def multimodal_resize(spark: SparkSession, sf_dir: str):
    """Real nearest-neighbor resize of the decoded PPM rasters to 4x4;
    oracle replays the exact integer index math (x*src_w//out_w) over the
    known pixel function."""
    docs = _media_docs(spark, sf_dir)
    return resize_media(synthesize_ppm_media(docs), RESIZE_W, RESIZE_H)


# resized pixel (x, y, c) samples raster index 3*((y*h//4)*w + (x*w//4)) + c,
# whose value is (doc_id*31 + idx*7) % 256
ORACLE_RESIZE = f"""
WITH m AS (
  SELECT doc_id,
         CAST(4 + {_sql_md5_byte('text', 0)} % 13 AS INT) AS w,
         CAST(4 + {_sql_md5_byte('text', 1)} % 13 AS INT) AS h
  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents
),
px AS (
  SELECT doc_id,
         SUM((doc_id * 31
              + (3 * ((y * h // {RESIZE_H}) * w + (x * w // {RESIZE_W})) + c) * 7)
             % 256) AS s
  FROM m,
       unnest(range(0, {RESIZE_H})) AS uy(y),
       unnest(range(0, {RESIZE_W})) AS ux(x),
       unnest(range(0, 3)) AS uc(c)
  GROUP BY doc_id
)
SELECT m.doc_id AS media_id,
       m.w AS src_width, m.h AS src_height,
       CAST({RESIZE_W} AS INT) AS out_width, CAST({RESIZE_H} AS INT) AS out_height,
       CAST(px.s AS BIGINT) AS resized_sum,
       CAST(px.s AS DOUBLE) / ({RESIZE_W * RESIZE_H * 3} * 255) AS resized_mean
FROM m JOIN px USING (doc_id)
"""


QUERIES = {
    "multimodal_features": multimodal_features,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_audio_features": multimodal_audio_features,
    "multimodal_resize": multimodal_resize,
}

ORACLES = {
    "multimodal_features": ORACLE_FEATURES,
    "multimodal_frame_sample": ORACLE_FRAMES,
    "multimodal_audio_features": ORACLE_AUDIO,
    "multimodal_resize": ORACLE_RESIZE,
}


# -- BMP decode gate (round 4): second REAL image codec through the same
# Arrow pipeline. Payloads are genuine uncompressed 24-bit BMPs (54-byte
# headers, bottom-up rows, zero row-padding to 4-byte stride); the decoder
# must skip the padding, so byte_len uses the padded stride while the mean
# uses only the 3*w*h pixel bytes — the oracle derives BOTH analytically.

def multimodal_bmp_features(spark: SparkSession, sf_dir: str):
    from ..operators.multimodal import synthesize_bmp_media

    docs = _media_docs(spark, sf_dir)
    return extract_media_features(synthesize_bmp_media(docs)).drop("content_md5")


ORACLE_BMP = f"""
WITH m AS (
  SELECT doc_id,
         CAST(4 + {_sql_md5_byte('text', 0)} % 13 AS INT) AS width,
         CAST(4 + {_sql_md5_byte('text', 1)} % 13 AS INT) AS height
  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents
),
px AS (
  SELECT doc_id, CAST(SUM((doc_id * 31 + i * 7) % 256) AS BIGINT) AS s
  FROM m, unnest(range(0, 3 * width * height)) AS u(i)
  GROUP BY doc_id
)
SELECT m.doc_id AS media_id,
       'image' AS media_type,
       CAST(54 + ((3 * width + 3) // 4) * 4 * height AS BIGINT) AS byte_len,
       width, height,
       CAST(px.s AS DOUBLE) / (3 * width * height * 255) AS mean_intensity
FROM m JOIN px USING (doc_id)
"""

QUERIES["multimodal_bmp_features"] = multimodal_bmp_features
ORACLES["multimodal_bmp_features"] = ORACLE_BMP


# -- PNG decode gate (round 4): first COMPRESSED image codec through the
# Arrow pipeline. Payloads are genuine zlib-deflated 8-bit truecolor PNGs
# with per-image filter type doc_id % 5 — every PNG scanline-filter path
# (None/Sub/Up/Average/Paeth) decodes for real inside the gate. byte_len is
# a deflate-stream length (not analytically replayable), so this gate emits
# only the decoded geometry + pixel statistics, which the oracle re-derives
# from the generative pixel formula exactly like the PPM/BMP gates.

def multimodal_png_features(spark: SparkSession, sf_dir: str):
    from ..operators.multimodal import synthesize_png_media

    # fan_out(python): the png codec is the expensive
    # Python-kernel tier — parallelize its mapInPandas chain, at the
    # medium width (per-task Arrow overhead; r12 sweep)
    docs = fan_out(_media_docs(spark, sf_dir), tier="medium")
    return (
        extract_media_features(synthesize_png_media(docs))
        .drop("content_md5")
        .drop("byte_len")
    )


ORACLE_PNG = f"""
WITH m AS (
  SELECT doc_id,
         CAST(4 + {_sql_md5_byte('text', 0)} % 13 AS INT) AS width,
         CAST(4 + {_sql_md5_byte('text', 1)} % 13 AS INT) AS height
  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents
),
px AS (
  SELECT doc_id, CAST(SUM((doc_id * 31 + i * 7) % 256) AS BIGINT) AS s
  FROM m, unnest(range(0, 3 * width * height)) AS u(i)
  GROUP BY doc_id
)
SELECT m.doc_id AS media_id,
       'image' AS media_type,
       width, height,
       CAST(px.s AS DOUBLE) / (3 * width * height * 255) AS mean_intensity
FROM m JOIN px USING (doc_id)
"""

QUERIES["multimodal_png_features"] = multimodal_png_features
ORACLES["multimodal_png_features"] = ORACLE_PNG


# -- JPEG decode gate (round 4): baseline JPEG through the Arrow pipeline.
# Payloads are genuine baseline grayscale JPEGs (Annex-K Huffman tables,
# DPCM-coded DC-only blocks, byte-stuffed scan); the decoder runs the full
# marker/Huffman/dequant/IDCT path. DC levels ≡ 0 (mod 8) with a flat quant
# table make each reconstructed block an exact constant, so the mean is
# analytically replayable; byte_len (an entropy-coded length) is dropped.

def multimodal_jpeg_features(spark: SparkSession, sf_dir: str):
    from ..operators.multimodal import synthesize_jpeg_media

    # fan_out(python): the jpeg codec is the expensive
    # Python-kernel tier — parallelize its mapInPandas chain, at the
    # medium width (per-task Arrow overhead; r12 sweep)
    docs = fan_out(_media_docs(spark, sf_dir), tier="medium")
    return (
        extract_media_features(synthesize_jpeg_media(docs))
        .drop("content_md5")
        .drop("byte_len")
    )


# block b's constant pixel value = (doc_id*31 + b*7) % 25 + 116; every block
# holds 64 of them, so the mean over pixels = mean over blocks / 255
ORACLE_JPEG = f"""
WITH m AS (
  SELECT doc_id,
         CAST(8 * (1 + {_sql_md5_byte('text', 0)} % 3) AS INT) AS width,
         CAST(8 * (1 + {_sql_md5_byte('text', 1)} % 3) AS INT) AS height
  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents
),
px AS (
  SELECT doc_id,
         CAST(SUM((doc_id * 31 + b * 7) % 25 + 116) AS BIGINT) AS s,
         COUNT(*) AS nb
  FROM m, unnest(range(0, (width // 8) * (height // 8))) AS u(b)
  GROUP BY doc_id
)
SELECT m.doc_id AS media_id,
       'image' AS media_type,
       width, height,
       CAST(px.s AS DOUBLE) / (px.nb * 255) AS mean_intensity
FROM m JOIN px USING (doc_id)
"""

QUERIES["multimodal_jpeg_features"] = multimodal_jpeg_features
ORACLES["multimodal_jpeg_features"] = ORACLE_JPEG


# -- Color JPEG decode gate (round 4): 3-component baseline YCbCr 4:2:0
# through the Arrow pipeline. Payloads are genuine interleaved-MCU color
# JPEGs (4 luma + 2 chroma DC-only blocks per MCU, per-component DPCM
# predictors, byte-stuffed scan); the decoder runs the full multi-component
# path — sampling-factor geometry, chroma replication upsample, and the
# libjpeg-style fixed-point YCbCr→RGB conversion. Luma varies per block;
# chroma is constant per image with offsets small enough that conversion
# never clamps, so the decoded RGB mean is an exact integer formula.

def multimodal_jpeg_color_features(spark: SparkSession, sf_dir: str):
    from ..operators.multimodal import synthesize_jpeg_color_media

    # fan_out(python): the jpeg codec is the expensive
    # Python-kernel tier — parallelize its mapInPandas chain, at the
    # medium width (per-task Arrow overhead; r12 sweep)
    docs = fan_out(_media_docs(spark, sf_dir), tier="medium")
    return (
        extract_media_features(synthesize_jpeg_color_media(docs))
        .drop("content_md5")
        .drop("byte_len")
    )


# Per block b, Y = (doc_id*31 + b*7) % 25 + 116 over 64 pixels; chroma
# offsets cb = doc_id*5 % 41 - 20, cr = doc_id*11 % 41 - 20 are constant per
# image, so the fixed-point channel adjustments (arithmetic-shift floor ≡
# FLOOR(x/65536.0)) apply uniformly:
#   mean = (3·ΣY + n·(radj + goff + badj)) / (3·n·255),  n = w·h
ORACLE_JPEG_COLOR = f"""
WITH m AS (
  SELECT doc_id,
         CAST(16 * (1 + {_sql_md5_byte('text', 0)} % 2) AS INT) AS width,
         CAST(16 * (1 + {_sql_md5_byte('text', 1)} % 2) AS INT) AS height,
         doc_id * 5 % 41 - 20 AS cb,
         doc_id * 11 % 41 - 20 AS cr
  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents
),
adj AS (
  SELECT doc_id,
         CAST(FLOOR((91881 * cr + 32768) / 65536.0) AS BIGINT)
           + CAST(FLOOR((-22554 * cb - 46802 * cr + 32768) / 65536.0) AS BIGINT)
           + CAST(FLOOR((116130 * cb + 32768) / 65536.0) AS BIGINT) AS chroma_adj
  FROM m
),
px AS (
  SELECT doc_id,
         CAST(64 * SUM((doc_id * 31 + b * 7) % 25 + 116) AS BIGINT) AS ysum
  FROM m, unnest(range(0, (width // 8) * (height // 8))) AS u(b)
  GROUP BY doc_id
)
SELECT m.doc_id AS media_id,
       'image' AS media_type,
       width, height,
       CAST(3 * px.ysum + width * height * adj.chroma_adj AS DOUBLE)
         / (3 * width * height * 255) AS mean_intensity
FROM m JOIN px USING (doc_id) JOIN adj USING (doc_id)
"""

QUERIES["multimodal_jpeg_color"] = multimodal_jpeg_color_features
ORACLES["multimodal_jpeg_color"] = ORACLE_JPEG_COLOR


def multimodal_phash(spark: SparkSession, sf_dir: str):
    """aHash perceptual fingerprints over real decoded PPM payloads — the
    image-dedup companion to the text simhash gate. The decode + grayscale
    + 8x8 nearest sample + average-threshold bit pack runs in the real
    Arrow kernel (operators/multimodal.py:perceptual_hash); the oracle
    replays every integer (sample indices, channel-sum grayscale, the
    cross-multiplied >= mean test, big-endian bit packing) analytically
    from the deterministic payload formula."""
    from ..operators.multimodal import perceptual_hash, synthesize_ppm_media

    docs = _media_docs(spark, sf_dir)
    return perceptual_hash(synthesize_ppm_media(docs))


# cell i (row-major on the 8x8 grid): source pixel index p =
# ((i//8)*h//8)*w + ((i%8)*w//8); grayscale = channel sum of raster bytes
# 3p, 3p+1, 3p+2 with byte j = (doc_id*31 + j*7) % 256; bit = g*64 >= total.
ORACLE_PHASH = f"""
WITH m AS (
  SELECT doc_id,
         CAST(4 + {_sql_md5_byte('text', 0)} % 13 AS BIGINT) AS w,
         CAST(4 + {_sql_md5_byte('text', 1)} % 13 AS BIGINT) AS h
  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents
),
g AS (
  SELECT doc_id, w, h, i,
         (doc_id*31 + (3*((((i//8)*h)//8)*w + ((i%8)*w)//8))*7) % 256
       + (doc_id*31 + (3*((((i//8)*h)//8)*w + ((i%8)*w)//8) + 1)*7) % 256
       + (doc_id*31 + (3*((((i//8)*h)//8)*w + ((i%8)*w)//8) + 2)*7) % 256 AS gv
  FROM m, unnest(range(0, 64)) AS u(i)
),
tot AS (SELECT doc_id, SUM(gv) AS total FROM g GROUP BY doc_id),
bits AS (
  SELECT g.doc_id, w, h, i,
         CASE WHEN gv * 64 >= total THEN 1 ELSE 0 END AS b
  FROM g JOIN tot USING (doc_id)
)
SELECT doc_id AS media_id,
       CAST(MAX(w) AS INT) AS width,
       CAST(MAX(h) AS INT) AS height,
       CAST(SUM(CASE WHEN i < 32 THEN b << (31 - i) ELSE 0 END) AS BIGINT)
         AS hash_hi,
       CAST(SUM(CASE WHEN i >= 32 THEN b << (63 - i) ELSE 0 END) AS BIGINT)
         AS hash_lo,
       CAST(SUM(b) AS BIGINT) AS n_set
FROM bits GROUP BY doc_id
"""

QUERIES["multimodal_phash"] = multimodal_phash
ORACLES["multimodal_phash"] = ORACLE_PHASH


# -- GIF decode gate (round 5): LZW through the Arrow pipeline. Payloads are
# genuine GIF89a files (logical screen descriptor, 256-entry grayscale
# global color table, variable-width LSB-first LZW with clear/EOI) — a
# compression family the codec suite didn't cover (PNG = LZ77+Huffman,
# JPEG = DCT+Huffman, GIF = LZW). byte_len is an LZW-stream length (not
# analytically replayable) so the gate emits decoded geometry + pixel
# stats; the grayscale palette makes the RGB mean equal the index mean,
# which the oracle re-derives from the generative formula.

def multimodal_gif_features(spark: SparkSession, sf_dir: str):
    from ..operators.multimodal import synthesize_gif_media

    # fan_out(python): the gif codec is the expensive
    # Python-kernel tier — parallelize its mapInPandas chain, at the
    # medium width (per-task Arrow overhead; r12 sweep)
    docs = fan_out(_media_docs(spark, sf_dir), tier="medium")
    return (
        extract_media_features(synthesize_gif_media(docs))
        .drop("content_md5")
        .drop("byte_len")
    )


ORACLE_GIF = f"""
WITH m AS (
  SELECT doc_id,
         CAST(4 + {_sql_md5_byte('text', 0)} % 13 AS INT) AS width,
         CAST(4 + {_sql_md5_byte('text', 1)} % 13 AS INT) AS height
  FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents
),
px AS (
  SELECT doc_id, CAST(SUM((doc_id * 31 + i * 7) % 256) AS BIGINT) AS s
  FROM m, unnest(range(0, width * height)) AS u(i)
  GROUP BY doc_id
)
SELECT m.doc_id AS media_id,
       'image' AS media_type,
       width, height,
       CAST(px.s AS DOUBLE) / (width * height * 255) AS mean_intensity
FROM m JOIN px USING (doc_id)
"""

QUERIES["multimodal_gif_features"] = multimodal_gif_features
ORACLES["multimodal_gif_features"] = ORACLE_GIF
