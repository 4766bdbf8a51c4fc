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

from ..operators.multimodal import (
    extract_media_features,
    frame_sample,
    media_from_documents,
    synthesize_ppm_media,
)

_HEX = "0123456789abcdef"


def _sql_md5_byte(expr: str, i: int) -> str:
    """i-th byte of md5(expr) as 0..255, from hex chars (shared-hash trick)."""
    c1 = f"substr(md5({expr}), {2 * i + 1}, 1)"
    c2 = f"substr(md5({expr}), {2 * i + 2}, 1)"
    return f"((instr('{_HEX}', {c1}) - 1) * 16 + (instr('{_HEX}', {c2}) - 1))"


def multimodal_features(spark: SparkSession, sf_dir: str):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return extract_media_features(synthesize_ppm_media(docs)).drop("content_md5")


# Header is b"P6\n%d %d\n255\n" → 3 + digits(w) + 1 + digits(h) + 1 + 4 bytes;
# raster is 3*w*h bytes of (doc_id*31 + i*7) % 256; mean = sum/(3*w*h*255).
ORACLE_FEATURES = f"""
WITH m AS (
  SELECT doc_id,
         CAST(4 + {_sql_md5_byte('text', 0)} % 13 AS INT) AS width,
         CAST(4 + {_sql_md5_byte('text', 1)} % 13 AS INT) AS height
  FROM documents
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
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return frame_sample(media_from_documents(docs))


ORACLE_FRAMES = """
WITH m AS (
  SELECT doc_id AS media_id,
         LEAST(8, GREATEST(1, CAST(FLOOR(octet_length(encode(text)) / 1024.0) AS INT))) AS n
  FROM documents
)
SELECT media_id, CAST(i AS INT) AS frame_idx, CAST(i AS INT) * 1024 AS byte_offset
FROM m, unnest(range(0, n)) AS u(i)
"""


QUERIES = {
    "multimodal_features": multimodal_features,
    "multimodal_frame_sample": multimodal_frame_sample,
}

ORACLES = {
    "multimodal_features": ORACLE_FEATURES,
    "multimodal_frame_sample": ORACLE_FRAMES,
}
