"""Streaming ANN serving over the persisted IVF-PQ index: micro-batched
probes must equal the batch probe exactly, and retries must be idempotent."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from etl_process_for_detecting_fraudulent_transactions_spark.operators.pq_index import (
    build_pq_index,
    query_pq_index,
)
from etl_process_for_detecting_fraudulent_transactions_spark.queries.similarity import (
    QUERY_MOD,
    _emb,
)
from etl_process_for_detecting_fraudulent_transactions_spark.streaming.pipeline import (
    _ann_probe_process_batch,
    ann_probe_stream,
)

_QSCHEMA = "query_id bigint, embedding array<double>"


def _wait(q, timeout=120):
    q.awaitTermination(timeout)
    deadline = time.time() + timeout
    while q.isActive and time.time() < deadline:
        time.sleep(0.5)
    assert not q.isActive


def test_stream_probe_equals_batch_probe(spark, sf_dir, tmp_path):
    """Queries split across micro-batches (one file per trigger) must
    produce the UNION of per-batch probes == one batch probe of all
    queries — probes are per-query independent and the index is
    read-only, so equality is exact, including adc_dist."""
    index = str(tmp_path / "pq_index")
    build_pq_index(spark, sf_dir, index)
    queries = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") % QUERY_MOD == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    qdir = tmp_path / "qstream"
    qdir.mkdir()
    # two files → two micro-batches under maxFilesPerTrigger=1
    queries.filter(F.col("query_id") % (2 * QUERY_MOD) == 0).write.parquet(
        str(qdir / "f0.parquet")
    )
    queries.filter(F.col("query_id") % (2 * QUERY_MOD) != 0).write.parquet(
        str(qdir / "f1.parquet")
    )
    stream = (
        spark.readStream.schema(_QSCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(qdir / "*.parquet"))
    )
    results = str(tmp_path / "results")
    q = ann_probe_stream(stream, index, results, str(tmp_path / "ckpt"))
    _wait(q)

    got = {
        (r.query_id, r.neighbor_id, r.adc_dist, r.rank)
        for r in spark.read.parquet(results).drop("batch").collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.adc_dist, r.rank)
        for r in query_pq_index(spark, index, queries, exclude_self=False).collect()
    }
    assert got == want and got


def test_stream_probe_retry_is_idempotent(spark, sf_dir, tmp_path):
    """Re-running the same (batch_df, batch_id) overwrites the batch's own
    partition — rows identical, no duplication."""
    index = str(tmp_path / "pq_index")
    build_pq_index(spark, sf_dir, index)
    batch = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") % QUERY_MOD == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    results = str(tmp_path / "results")
    _ann_probe_process_batch(batch, 7, index, results)
    first = sorted(
        (r.query_id, r.neighbor_id, r.adc_dist, r.rank)
        for r in spark.read.parquet(results).drop("batch").collect()
    )
    _ann_probe_process_batch(batch, 7, index, results)  # retry
    second = sorted(
        (r.query_id, r.neighbor_id, r.adc_dist, r.rank)
        for r in spark.read.parquet(results).drop("batch").collect()
    )
    assert first == second and first
