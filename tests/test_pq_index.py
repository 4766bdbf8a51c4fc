"""Persisted IVF-PQ index: probe parity with the in-query gate + partition
pruning proof. Mirrors tests/test_ann_index.py for the PQ family."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from etl_process_for_detecting_fraudulent_transactions_spark.operators.pq_index import (
    build_pq_index,
    query_pq_index,
)
from etl_process_for_detecting_fraudulent_transactions_spark.queries.similarity import (
    QUERY_MOD,
    _emb,
    knn_ivf_pq,
    nprobe_eff,
)


def _build(spark, sf_dir, tmp_path) -> str:
    path = str(tmp_path / "pq_index")
    build_pq_index(spark, sf_dir, path)
    return path


def test_probe_equals_in_query_gate(spark, sf_dir, tmp_path):
    """Probing the persisted index with the gate's own query subset must
    reproduce the knn_ivf_pq gate rows EXACTLY (codes, coarse ranking, LUT
    and ADC sums are all integer arithmetic — parity is equality, not
    similarity)."""
    path = _build(spark, sf_dir, tmp_path)
    queries = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") % QUERY_MOD == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    got = {
        (r.query_id, r.neighbor_id, r.adc_dist, r.rank)
        for r in query_pq_index(spark, path, queries).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.adc_dist, r.rank)
        for r in knn_ivf_pq(spark, sf_dir).collect()
    }
    assert got == want and got


def test_probe_scan_prunes_code_partitions(spark, sf_dir, tmp_path):
    """A single-query probe must prune the codes scan to exactly its
    nprobe_eff(n_lists) inverted lists: the codes-side FileSourceScan's
    PartitionFilters must carry a list_id IN-list with that many literals."""
    path = _build(spark, sf_dir, tmp_path)
    n_lists = spark.read.parquet(f"{path}/coarse").count()
    one = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    df = query_pq_index(spark, path, one)
    plan = df._jdf.queryExecution().executedPlan().toString()
    in_lists = [
        m.group(1)
        for m in re.finditer(r"PartitionFilters: \[list_id#\d+L? IN \(([^)]*)\)", plan)
    ]
    assert in_lists, f"no list_id IN partition filter in plan:\n{plan[:2000]}"
    assert len(in_lists[0].split(",")) == min(nprobe_eff(n_lists), n_lists)


def test_external_queries_keep_self_matches(spark, sf_dir, tmp_path):
    """exclude_self=False keeps a corpus vector that ties an external
    query's id — the id-collision contract shared with query_lsh_index."""
    path = _build(spark, sf_dir, tmp_path)
    q = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    with_self = query_pq_index(spark, path, q, exclude_self=False).collect()
    # vec 0 is its own nearest code point: identical codes → ADC dist is the
    # pure quantization distance, minimal among its list
    best = min(with_self, key=lambda r: (r.adc_dist, r.neighbor_id))
    assert best.neighbor_id == 0


def test_rerank_probe_equals_rerank_gate(spark, sf_dir, tmp_path):
    """rerank_with (r12): probing the persisted index two-stage — ADC
    top-R shortlist, exact squared-L2 re-rank over fetched full vectors —
    must reproduce the knn_ivf_pq_rerank gate rows EXACTLY (same
    fixed-point arithmetic end-to-end)."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.similarity import (
        knn_ivf_pq_rerank,
    )

    path = _build(spark, sf_dir, tmp_path)
    queries = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") % QUERY_MOD == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    got = {
        (r.query_id, r.neighbor_id, r.exact_dist, r.rank)
        for r in query_pq_index(
            spark, path, queries, rerank_with=_emb(spark, sf_dir)
        ).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.exact_dist, r.rank)
        for r in knn_ivf_pq_rerank(spark, sf_dir).collect()
    }
    assert got == want and got


def test_meta_artifact_round_trips_scalars(spark, sf_dir, tmp_path):
    """build writes a 1-row meta parquet (nvec/nlist/stride) so probes read
    the scalars back instead of re-counting per call (round-12 advice)."""
    path = _build(spark, sf_dir, tmp_path)
    meta = spark.read.parquet(f"{path}/meta").head()
    assert meta["nvec"] == _emb(spark, sf_dir).count()
    assert meta["nlist"] == spark.read.parquet(f"{path}/coarse").count()
    assert meta["nvec"] // meta["stride"] + (1 if meta["nvec"] % meta["stride"] else 0) >= meta["nlist"]
