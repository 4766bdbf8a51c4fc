"""Multimodal plumbing gate: binary payload → Arrow-batched mapInPandas
feature extraction, validated against an analytic DuckDB oracle.

The stub decoder derives (width, height, mean) from md5 bytes, so the oracle
can recompute them in pure SQL — the gate therefore checks the REAL
Pandas-UDF path (schema contract, Arrow batch iteration, binary handling)
against an independent derivation, not against itself.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.multimodal import (
    extract_media_features,
    frame_sample,
    media_from_documents,
)

_HEX = "0123456789abcdef"


def _sql_md5_byte(expr: str, i: int) -> str:
    """i-th byte of md5(expr) as 0..255, from hex chars (shared-hash trick)."""
    c1 = f"substr(md5({expr}), {2 * i + 1}, 1)"
    c2 = f"substr(md5({expr}), {2 * i + 2}, 1)"
    return f"((instr('{_HEX}', {c1}) - 1) * 16 + (instr('{_HEX}', {c2}) - 1))"


def multimodal_features(spark: SparkSession, sf_dir: str):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return extract_media_features(media_from_documents(docs), fake_decode=True)


ORACLE_FEATURES = f"""
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       md5(text) AS content_md5,
       CAST(16 + {_sql_md5_byte('text', 0)} % 240 AS INT) AS width,
       CAST(16 + {_sql_md5_byte('text', 1)} % 240 AS INT) AS height,
       CAST({_sql_md5_byte('text', 2)} AS DOUBLE) / CAST(255 AS DOUBLE) AS mean_intensity
FROM documents
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
