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


def test_probe_recall_vs_brute_force_sf01(spark, tmp_path):
    """ABSOLUTE recall pin at sf0.1 (2000 vectors): the persisted-index probe
    must recall at least the same floor the in-query knn_lsh family is held
    to on these worst-case uniform embeddings (no cluster structure — see
    tests/test_ann_quality.py for the geometry argument)."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.similarity import (
        knn_brute_force,
    )

    sf1 = os.path.join(os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.1")
    path = _build(spark, sf1, tmp_path)
    queries = (
        _emb(spark, sf1)
        .filter(F.col("vec_id") % QUERY_MOD == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in query_lsh_index(spark, path, queries).collect()
    }
    brute = {
        (r["query_id"], r["neighbor_id"]) for r in knn_brute_force(spark, sf1).collect()
    }
    recall = len(got & brute) / len(brute)
    assert recall >= 0.10, f"index probe recall@5 {recall:.2f} < 0.10 at sf0.1"


def test_build_splits_hot_bucket(spark, sf_dir, tmp_path):
    """Skew evidence: a corpus whose majority is ONE vector (every copy lands
    in the same 4 buckets) must not serialize the build into one giant task
    per hot bucket — the REBALANCE shuffle splits it into multiple files,
    while layout and probe results stay correct."""
    e = _emb(spark, sf_dir)
    hot = (
        e.filter(F.col("vec_id") == 0)
        .select(F.explode(F.sequence(F.lit(10_000), F.lit(11_999))).alias("vec_id"), "embedding")
    )
    skewed = e.select("vec_id", "embedding").unionByName(hot)
    path = str(tmp_path / "skewed_index")
    # tiny advisory size so AQE's skew split engages at test scale
    old = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", None)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    try:
        build_lsh_index(skewed, path)
    finally:
        if old is None:
            spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        else:
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", old)
    # rows are all there, layout unchanged
    assert spark.read.parquet(path).count() == skewed.count() * N_TABLES
    # the hot vector's buckets each hold 2000+ copies; with a 16KB advisory
    # size the rebalance must have split them into multiple part-files
    hot_buckets = [
        r["bucket"]
        for r in spark.read.parquet(path)
        .groupBy("bucket").count().orderBy(F.desc("count")).limit(1).collect()
    ]
    bdir = os.path.join(path, f"bucket={hot_buckets[0]}")
    n_files = len([f for f in os.listdir(bdir) if f.endswith(".parquet")])
    assert n_files > 1, f"hot bucket wrote a single file (one task): {bdir}"
    # and probing the skewed index still returns exact-reranked neighbors
    one = (
        e.filter(F.col("vec_id") == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    res = query_lsh_index(spark, path, one).collect()
    assert len(res) > 0
    # the 2000 planted copies of the query vector are its cosine-1.0 top hits
    assert all(10_000 <= r["neighbor_id"] < 12_000 for r in res)


def test_probe_exclude_self_flag(spark, sf_dir, tmp_path):
    """exclude_self=False keeps a corpus neighbor whose vec_id equals the
    query_id (external-query id space); the default drops it."""
    path = _build(spark, sf_dir, tmp_path)
    one = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    with_self = query_lsh_index(spark, path, one, exclude_self=False).collect()
    without = query_lsh_index(spark, path, one).collect()
    # vec 0 IS in the corpus: with exclude_self=False its self-match must
    # surface at rank 1 (cosine 1.0); the default must not contain it
    assert any(r["neighbor_id"] == 0 and r["rank"] == 1 for r in with_self)
    assert all(r["neighbor_id"] != 0 for r in without)


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
