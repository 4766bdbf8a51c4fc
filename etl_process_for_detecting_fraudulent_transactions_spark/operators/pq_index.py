"""Persisted IVF-PQ index: codebook + coarse centroids + codes partitioned
by inverted list, probed with partition pruning.

The in-query gate (queries/similarity.py:knn_ivf_pq) retrains and re-encodes
on every call — right for a one-shot correctness gate, wrong for the
production "encode the corpus once, answer queries forever" loop. This
operator persists the three artifacts of an IVF-PQ index (FAISS's IVFPQ on
a filesystem):

- ``codebook``: the trained PQ sub-quantizers — M·K rows of (m, cid,
  subvector). Kilobytes; always broadcast at probe time.
- ``coarse``: the coarse-quantizer centroids (full fixed-point vectors).
  Also kilobytes.
- ``codes``: one row per (vec_id, m) with its PQ code, hive-partitioned by
  the vector's inverted list — the ONLY corpus-sized artifact, and it is
  16× smaller than the raw float32 vectors (M 4-bit codes per vector). A
  probe reads only the nprobe_eff directories its query's coarse ranking
  selects:
  the parquet scan prunes partitions statically from a driver-side IN
  list, exactly like operators/ann_index.py.

Everything is the gate's fixed-point integer arithmetic, so probe results
are pinned EQUAL to the knn_ivf_pq gate output (tests/test_pq_index.py) —
not just statistically similar.

No DuckDB gate: the filesystem layout is the operator; the arithmetic it
serves is already oracle-verified through pq_encode / knn_pq_adc /
knn_ivf_pq.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# The exactness-critical fixed-point expressions (_quantize_full, _sq_l2,
# _subvectors, _pq_lut) are imported from the gate module — single
# definition, so index probes can never drift from the oracle-verified
# gates (the same discipline ann_index.py follows for the LSH kernels).
from ..queries.similarity import (
    TOP_K,
    _emb,
    _pq_lut,
    _pq_parts,
    _quantize_full,
    _sq_l2,
    _subvectors,
    centroid_stride,
    nprobe_eff,
)


def build_pq_index(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Train on the corpus and persist codebook + coarse centroids + codes.

    The codes write shuffles once on list_id (AQE ``REBALANCE`` so a hot
    inverted list splits across tasks instead of serializing) — each of the
    ~N/stride directories (stride = centroid_stride(N), so ~sqrt(N) lists beyond test scale) holds its list's codes as a few large
    files."""
    sub, cent, final = _pq_parts(spark, sf_dir)
    qfull = _quantize_full(_emb(spark, sf_dir), "vec_id", "embedding")
    # scale-aware centroid stride, same single definition as the gate
    # (nlist ≈ sqrt(N) beyond test scale); a 1-scalar driver count, like
    # the probe-time collects
    stride = centroid_stride(qfull.count())
    coarse = qfull.filter(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("qv").alias("cfull")
    )
    cd = qfull.crossJoin(F.broadcast(coarse)).select(
        "vec_id", "centroid_id", _sq_l2("qv", "cfull").alias("cd")
    )
    w = Window.partitionBy("vec_id").orderBy("cd", "centroid_id")
    lists = (
        cd.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") == 1)
        .select("vec_id", F.col("centroid_id").alias("list_id"))
    )
    codes = final.select("vec_id", "m", "cid").join(lists, "vec_id")
    cent.write.mode("overwrite").parquet(f"{path}/codebook")
    coarse.write.mode("overwrite").parquet(f"{path}/coarse")
    (
        codes.hint("rebalance", "list_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(f"{path}/codes")
    )


def query_pq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    top_k: int = TOP_K,
    exclude_self: bool = True,
) -> DataFrame:
    """ADC top-k over the probed inverted lists only.

    ``queries``: (query_id, embedding array<double>). Coarse ranking picks
    nprobe_eff lists per query; the probed list ids are collected driver-side
    (metadata: ≤ |queries|·nprobe_eff longs) and pushed as a partition
    IN-filter, so the codes scan reads only those directories. Scoring is
    M lookups per candidate against the per-query LUT — the raw vectors
    are never read at probe time."""
    qfull = _quantize_full(
        queries.select(F.col("query_id").alias("vec_id"), "embedding"),
        "vec_id",
        "embedding",
    ).localCheckpoint(eager=True)
    coarse = spark.read.parquet(f"{path}/coarse")
    cent = spark.read.parquet(f"{path}/codebook")
    # scale-aware probe width, same single definition as the knn_ivf_pq
    # gate (queries/similarity.py nprobe_eff) — the centroid table is
    # kilobytes, so the count is a metadata-scale driver action like the
    # probed-list collect below
    k_lists = nprobe_eff(coarse.count())
    cd = qfull.crossJoin(F.broadcast(coarse)).select(
        "vec_id", "centroid_id", _sq_l2("qv", "cfull").alias("cd")
    )
    w = Window.partitionBy("vec_id").orderBy("cd", "centroid_id")
    probes = (
        cd.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= k_lists)
        .select(
            F.col("vec_id").alias("query_id"), F.col("centroid_id").alias("list_id")
        )
        .localCheckpoint(eager=True)
    )
    probed = [r["list_id"] for r in probes.select("list_id").distinct().collect()]
    lut = _pq_lut(_subvectors(qfull), cent)
    codes = spark.read.parquet(f"{path}/codes").filter(F.col("list_id").isin(probed))
    scored = codes.join(F.broadcast(probes), "list_id")
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("vec_id"))
    scored = (
        scored.join(F.broadcast(lut), ["query_id", "m", "cid"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d").alias("adc_dist"))
    )
    wr = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )
