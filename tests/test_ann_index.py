"""Persisted LSH index (operators/ann_index.py): layout, pruning, parity.

The index is the "build once, probe many" production path; correctness is
defined by agreement with the in-query knn_lsh gate (same tables, same
hyperplanes, same rerank) and the scan must prune to the probed buckets'
partitions instead of reading the whole index.
"""

import os

from pyspark.sql import functions as F

from etl_process_for_detecting_fraudulent_transactions_spark.operators.ann_index import (
    build_lsh_index,
    query_lsh_index,
)
from etl_process_for_detecting_fraudulent_transactions_spark.queries.similarity import (
    N_TABLES,
    PLANES_PER_TABLE,
    QUERY_MOD,
    knn_lsh,
    _emb,
)


def _build(spark, sf_dir, tmp_path):
    path = str(tmp_path / "lsh_index")
    build_lsh_index(_emb(spark, sf_dir), path)
    return path


def test_index_layout_is_bucket_partitioned(spark, sf_dir, tmp_path):
    path = _build(spark, sf_dir, tmp_path)
    dirs = [d for d in os.listdir(path) if d.startswith("bucket=")]
    assert len(dirs) > 1
    assert len(dirs) <= N_TABLES * 2**PLANES_PER_TABLE
    # every embedding appears once per table
    n_vec = _emb(spark, sf_dir).count()
    assert spark.read.parquet(path).count() == n_vec * N_TABLES


def test_probe_matches_in_query_knn(spark, sf_dir, tmp_path):
    """Index probe == the knn_lsh gate for the gate's own query set (same
    hyperplanes, same candidates, same exact rerank)."""
    path = _build(spark, sf_dir, tmp_path)
    queries = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") % QUERY_MOD == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in query_lsh_index(spark, path, queries).collect()
    }
    want = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in knn_lsh(spark, sf_dir).collect()
    }
    assert got == want


def test_probe_scan_prunes_partitions(spark, sf_dir, tmp_path):
    """A single-query probe must prune the index scan to exactly its
    N_TABLES buckets: the index-side FileSourceScan's PartitionFilters must
    carry a bucket IN-list with N_TABLES literals (the query-side scans have
    empty PartitionFilters, so we require the populated one)."""
    import re

    path = _build(spark, sf_dir, tmp_path)
    one = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    df = query_lsh_index(spark, path, one)
    plan = df._jdf.queryExecution().executedPlan().toString()
    bucket_in = [
        m.group(1)
        for m in re.finditer(r"PartitionFilters: \[bucket#\d+ IN \(([^)]*)\)", plan)
    ]
    assert bucket_in, f"no bucket IN partition filter in plan:\n{plan[:2000]}"
    assert len(bucket_in[0].split(",")) == N_TABLES


def test_incremental_append_equals_full_rebuild(spark, sf_dir, tmp_path):
    """Building from half the vectors then appending the other half must
    answer probes identically to a one-shot full build."""
    from etl_process_for_detecting_fraudulent_transactions_spark.operators.ann_index import (
        append_to_lsh_index,
    )

    e = _emb(spark, sf_dir)
    full_path = str(tmp_path / "full")
    incr_path = str(tmp_path / "incr")
    build_lsh_index(e, full_path)
    build_lsh_index(e.filter(F.col("vec_id") % 2 == 0), incr_path)
    append_to_lsh_index(e.filter(F.col("vec_id") % 2 == 1), incr_path)

    queries = (
        e.filter(F.col("vec_id") % QUERY_MOD == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    full = {tuple(r) for r in query_lsh_index(spark, full_path, queries).collect()}
    incr = {tuple(r) for r in query_lsh_index(spark, incr_path, queries).collect()}
    assert full == incr and len(full) > 0
