"""Similarity search over ``embeddings`` (array<float>, 64-dim).

- ``knn_brute_force``: exact cosine top-k for a query subset — the baseline.
  Dot products run JVM-side via ``zip_with``/``aggregate`` (no Python UDF).
- ``knn_lsh``: sign-random-projection LSH — P deterministic ±1 hyperplanes
  (signs derived from md5 parity so both engines agree), bucket on the sign
  pattern, exact rerank *within* bucket. This is the 100 TB path: candidate
  set shrinks ~2^P-fold; brute force stays as the small-N oracle of record.
- ``embedding_cosine_pairs``: near-dup pairs above a cosine threshold within
  LSH buckets (the embedding-space analog of minhash dedup).

Ranking ties: cosine values of distinct random vectors differ by ≫ float
error, and ties break on vec_id, so row_number ranks are engine-stable.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TOP_K = 5
QUERY_MOD = 50          # queries = vec_id % QUERY_MOD == 0
N_PLANES = 8
COSINE_T = 0.35         # near-dup threshold (testdata max cosine ≈ 0.46)
DIM = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # double precision: float32×float32 products are then exact, so both
    # engines' sequential sums agree bit-for-bit
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def knn_brute_force(spark, sf_dir):
    """Exact cosine top-k: query subset × all candidates, rank per query."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", _cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank")
    )


EMB_D = "emb_d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings)"

ORACLE_KNN = f"""
WITH {EMB_D}, q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM emb_d WHERE vec_id % {QUERY_MOD} = 0
),
scored AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(qv, e.embedding) AS sim
  FROM q, emb_d e
  WHERE query_id <> e.vec_id
)
SELECT query_id, neighbor_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
FROM scored
QUALIFY rank <= {TOP_K}
"""


# -- LSH: deterministic ±1 hyperplanes from md5 parity -----------------------

def _plane_signs() -> list[list[int]]:
    """signs[p][d] ∈ {-1, +1}, derived from md5 so any engine can replay."""
    out = []
    for p in range(N_PLANES):
        row = []
        for d in range(DIM):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
            row.append(1 if h[0] in "01234567" else -1)
        out.append(row)
    return out

_SIGNS = _plane_signs()


def _bucket_col(vec):
    """Concatenated sign bits of the P hyperplane projections."""
    bits = []
    for p in range(N_PLANES):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(s)) for s in _SIGNS[p]]),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _sql_bucket(vec_expr: str) -> str:
    parts = []
    for p in range(N_PLANES):
        arr = "[" + ", ".join(f"{s:.1f}" for s in _SIGNS[p]) + "]"
        parts.append(
            f"CASE WHEN list_dot_product({vec_expr}, {arr}::DOUBLE[]) >= 0 THEN '1' ELSE '0' END"
        )
    return " || ".join(parts)


def knn_lsh(spark, sf_dir):
    """ANN: sign-LSH bucket, exact cosine rerank within bucket. Queries whose
    bucket has < k neighbors return fewer rows — the classic LSH recall
    trade-off, visible (and checked) against the brute-force oracle shape."""
    e = _emb(spark, sf_dir).withColumn("bucket", _bucket_col(F.col("embedding"))).cache()
    q = e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "bucket"
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"), "bucket")
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", _cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank")
    )


ORACLE_KNN_LSH = f"""
WITH {EMB_D}, b AS (
  SELECT vec_id, embedding, {_sql_bucket('embedding')} AS bucket FROM emb_d
),
q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM b WHERE vec_id % {QUERY_MOD} = 0),
scored AS (
  SELECT query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(qv, c.embedding) AS sim
  FROM q JOIN b c USING (bucket)
  WHERE query_id <> c.vec_id
)
SELECT query_id, neighbor_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
FROM scored
QUALIFY rank <= {TOP_K}
"""


def embedding_cosine_pairs(spark, sf_dir):
    """Embedding near-dup: pairs above COSINE_T, candidates restricted to a
    shared LSH bucket (sub-quadratic at scale)."""
    e = _emb(spark, sf_dir).withColumn("bucket", _bucket_col(F.col("embedding"))).cache()
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va"), "bucket")
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("sim", _cosine(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= COSINE_T)
        .select("vec_a", "vec_b")
    )


ORACLE_COSINE_PAIRS = f"""
WITH {EMB_D}, b AS (
  SELECT vec_id, embedding, {_sql_bucket('embedding')} AS bucket FROM emb_d
)
SELECT a.vec_id AS vec_a, c.vec_id AS vec_b
FROM b a JOIN b c USING (bucket)
WHERE a.vec_id < c.vec_id
  AND list_cosine_similarity(a.embedding, c.embedding) >= {COSINE_T}
"""


QUERIES = {
    "knn_brute_force": knn_brute_force,
    "knn_lsh": knn_lsh,
    "embedding_cosine_pairs": embedding_cosine_pairs,
}

ORACLES = {
    "knn_brute_force": ORACLE_KNN,
    "knn_lsh": ORACLE_KNN_LSH,
    "embedding_cosine_pairs": ORACLE_COSINE_PAIRS,
}
