"""Persisted sign-LSH ANN index: build once, probe many, partition-pruned.

The in-query LSH path (queries/similarity.py:knn_lsh) recomputes buckets on
every call — right for a one-shot gate, wrong for the production "embed the
corpus once, answer queries forever" loop. This operator persists the banded
index as parquet **hive-partitioned by bucket**, so a probe touches only the
probed buckets' directories:

- build: N_TABLES sign-LSH tables (deterministic md5-parity hyperplanes,
  shared with queries/similarity.py) → one row per (vec_id, bucket) with the
  embedding inlined → ``partitionBy(bucket)``. Bucket cardinality is
  N_TABLES * 2^PLANES_PER_TABLE (4*64 = 256 directories): each holds ~1/64
  of the corpus per table — big-file-friendly at 100 TB, and far below the
  small-files cliff.
- probe: compute the query vectors' buckets driver-free, then join the index
  on the partition column. The query side is tiny → Spark broadcasts it and
  (with the literal IN-filter fallback below) the scan prunes partitions —
  reading ~T/2^P of the index instead of all of it.

At 100 TB the same layout holds: the index is embarrassingly rebuildable
(one narrow pass + shuffle on bucket), probes are bounded by bucket size,
and hot buckets (skewed hash regions) are AQE-splittable.

No DuckDB gate: filesystem layout is the point; correctness is pinned by
``tests/test_ann_index.py`` (probe results == in-query knn_lsh results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries.similarity import (
    TOP_K,
    _all_buckets_col,
    _cosine,
)


def _with_buckets(emb: DataFrame) -> DataFrame:
    """One row per (vec_id, table-qualified bucket), embedding inlined.

    Shares the knn-family bucket kernel (`_all_buckets_col`, Arrow matmul by
    default) so index probes stay bit-identical to the in-query knn_lsh gate
    (pinned by tests/test_ann_index.py)."""
    return emb.select(
        "vec_id",
        "embedding",
        F.explode(_all_buckets_col(F.col("embedding"))).alias("bucket"),
    )


def build_lsh_index(emb: DataFrame, path: str) -> None:
    """Write the banded index hive-partitioned by bucket.

    ``emb`` must carry (vec_id, embedding array<double>). The write shuffles
    once on bucket so each of the ~N_TABLES*2^P directories is a few large
    files, not one file per input task. The AQE ``REBALANCE`` hint (not a
    plain ``repartition``) makes the shuffle SKEW-SAFE: a hot bucket — a
    dense hash region holding far more than 1/2^P of the corpus — is split
    across multiple tasks/files instead of serializing into one giant task
    (pinned by tests/test_ann_index.py::test_build_splits_hot_bucket).
    """
    banded = _with_buckets(emb)
    (
        banded.hint("rebalance", "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def append_to_lsh_index(emb: DataFrame, path: str) -> None:
    """Incrementally add vectors to an existing index (no rebuild).

    Same banding + one shuffle on bucket; hive-partitioned appends only
    touch the directories the new vectors' buckets land in. Periodic
    compaction (re-running build_lsh_index) folds small append files back
    into few-per-directory — the standard LSM-ish maintenance story."""
    banded = _with_buckets(emb)
    (
        banded.hint("rebalance", "bucket")
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(path)
    )


def query_lsh_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    top_k: int = TOP_K,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact-rerank top-k within the probed buckets.

    ``queries``: (query_id, embedding array<double>). The probed bucket set
    is collected to the driver (bounded: |queries| * N_TABLES strings) and
    pushed as a partition IN-filter, so the parquet scan prunes directories
    statically — no full-index read, no dynamic-pruning dependence.

    ``exclude_self=True`` drops neighbors whose corpus vec_id equals the
    query_id — correct when queries ARE corpus members (the self-match is
    noise). For EXTERNAL queries whose ids are not in the corpus vec_id
    space, pass ``exclude_self=False``: a coincidental id collision would
    otherwise silently drop a valid neighbor.
    """
    qb = (
        _with_buckets(queries.select(F.col("query_id").alias("vec_id"), "embedding"))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            "bucket",
        )
        # eagerly checkpointed, NOT cached: the hyperplane projections would
        # otherwise run twice (driver-side bucket collect + scored join), and
        # a cache() here would stay pinned in executor storage after the
        # probe returns — in the "build once, probe many" loop each probe
        # would leak one cached frame until eviction (ADVICE r2). The
        # checkpoint blocks are tiny (|queries| × N_TABLES rows) and are
        # released by the ContextCleaner when this frame goes out of scope.
        .localCheckpoint(eager=True)
    )
    # driver-side bucket list: this is metadata (≤ |queries|*N_TABLES short
    # strings), not data — the exception to the no-collect rule
    probed = [r["bucket"] for r in qb.select("bucket").distinct().collect()]
    idx = (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(probed))
        .select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"), "bucket")
    )
    # score in the map stage, dedupe multi-table hits on scalar keys (the
    # duplicate scores are bit-identical, so max() is a pure dedupe) — never
    # shuffle or key a distinct on the embedding arrays themselves
    scored = qb.join(idx, "bucket")
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = (
        scored.select("query_id", "neighbor_id", _cosine(F.col("qv"), F.col("cv")).alias("sim"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("sim").alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "rank")
    )
