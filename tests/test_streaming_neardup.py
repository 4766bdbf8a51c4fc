"""Streaming incremental near-dup detection: batch-equivalence pin.

``near_dup_stream`` (streaming/pipeline.py) is the streaming form of
``queries.dedup.dedup_incremental``: a persisted LSH index over the old
corpus, each micro-batch of new docs band-joined against it + itself,
exact-Jaccard verified, then appended to the index. Streaming the "new"
partition (doc_id % 5 == 4, the same split the batch gate uses) in two
micro-batches must reproduce the batch gate's verified pair set EXACTLY —
including the Jaccard doubles (identical integer counts + single IEEE
division on both paths) — because the union over batches of
(batch × index) ∪ (batch × batch) candidates equals the batch operator's
(new × old) ∪ (new × new), and band keys are per-doc map-side expressions,
invariant to which frame a doc arrives in.
"""

import os

from pyspark.sql import functions as F

from tests.conftest import TESTDATA


def test_near_dup_stream_matches_incremental_batch(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.dedup import (
        INC_NEW_MOD,
        dedup_incremental,
    )
    from etl_process_for_detecting_fraudulent_transactions_spark.streaming.pipeline import (
        near_dup_stream,
        seed_near_dup_index,
    )

    sf_dir = os.path.join(TESTDATA, "sf0.001")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    is_new = (F.col("doc_id") % INC_NEW_MOD) == INC_NEW_MOD - 1

    index_dir = str(tmp_path / "index")
    seed_near_dup_index(docs.filter(~is_new), index_dir)

    # two files -> two micro-batches under maxFilesPerTrigger=1, so the
    # cross-batch new×new path (batch-2 doc vs batch-1 doc now in the index)
    # is actually exercised
    landing = str(tmp_path / "landing")
    new = docs.filter(is_new)
    new.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("append").parquet(landing)
    new.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(landing)

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    pairs_dir = str(tmp_path / "pairs")
    q = near_dup_stream(stream, index_dir, pairs_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in spark.read.parquet(pairs_dir).collect()
    }
    exp = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_incremental(spark, sf_dir).collect()
    }
    assert exp, "fixture must plant near-dup pairs involving the new batch"
    assert got == exp

    # index now holds the full corpus: arrays row count == all docs with >=3 words
    n_indexed = spark.read.parquet(f"{index_dir}/arrays").count()
    n_docs = docs.filter(F.size(F.split("text", " ")) >= 3).count()
    assert n_indexed == n_docs


def test_near_dup_batch_retry_is_idempotent(spark, tmp_path):
    """Structured Streaming retries a failed foreachBatch with the SAME
    batch_id: processing each batch twice must leave the pair set and index
    row counts exactly as a single clean run would — the
    overwrite-per-batch-partition layout plus own-partition exclusion on
    read, not append, is what guarantees it."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.dedup import (
        INC_NEW_MOD,
        dedup_incremental,
    )
    from etl_process_for_detecting_fraudulent_transactions_spark.streaming.pipeline import (
        _near_dup_process_batch,
        seed_near_dup_index,
    )

    sf_dir = os.path.join(TESTDATA, "sf0.001")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    is_new = (F.col("doc_id") % INC_NEW_MOD) == INC_NEW_MOD - 1

    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    seed_near_dup_index(docs.filter(~is_new), index_dir)

    new = docs.filter(is_new)
    b0 = new.filter(F.col("doc_id") % 2 == 0)
    b1 = new.filter(F.col("doc_id") % 2 == 1)

    # Structured Streaming's retry contract: a failed batch k is re-run with
    # the same batch_id BEFORE batch k+1 ever starts, and a committed batch
    # is never re-run. The second call per batch below is the HARD case:
    # the first call already committed its batch=b<id> index partition, so
    # the retry runs against an index that contains its own docs — the
    # processor must exclude its own partition to see the state the first
    # attempt saw, then overwrite its output identically.
    _near_dup_process_batch(b0, 0, index_dir, pairs_dir)
    _near_dup_process_batch(b0, 0, index_dir, pairs_dir)  # crash-after-write retry
    _near_dup_process_batch(b1, 1, index_dir, pairs_dir)
    _near_dup_process_batch(b1, 1, index_dir, pairs_dir)  # crash-after-write retry

    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in spark.read.parquet(pairs_dir).collect()
    }
    exp = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_incremental(spark, sf_dir).collect()
    }
    assert got == exp
    # no duplicate pair rows at all, not just set-equality
    n_rows = spark.read.parquet(pairs_dir).count()
    assert n_rows == len(got)
    # index holds each doc exactly once
    arrays = spark.read.parquet(f"{index_dir}/arrays")
    assert arrays.count() == arrays.select("doc_id").distinct().count()


def test_near_dup_cross_batch_redelivery_first_write_wins(spark, tmp_path):
    """A doc redelivered under a LATER batch id (at-least-once upstream)
    must not enter the index twice, must not re-emit its pairs under the
    new batch id, and must not duplicate future pair rows — the total
    output stays exactly the single-delivery result."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.dedup import (
        INC_NEW_MOD,
        dedup_incremental,
    )
    from etl_process_for_detecting_fraudulent_transactions_spark.streaming.pipeline import (
        _near_dup_process_batch,
        seed_near_dup_index,
    )

    sf_dir = os.path.join(TESTDATA, "sf0.001")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    is_new = (F.col("doc_id") % INC_NEW_MOD) == INC_NEW_MOD - 1

    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    seed_near_dup_index(docs.filter(~is_new), index_dir)

    new = docs.filter(is_new)
    b0 = new.filter(F.col("doc_id") % 2 == 0)
    b1 = new.filter(F.col("doc_id") % 2 == 1)

    _near_dup_process_batch(b0, 0, index_dir, pairs_dir)
    # batch 1 redelivers ALL of batch 0 alongside its genuinely-new docs
    _near_dup_process_batch(b1.unionByName(b0), 1, index_dir, pairs_dir)
    # batch 2 redelivers batch 1 in full — and nothing new
    _near_dup_process_batch(b1, 2, index_dir, pairs_dir)

    got_rows = spark.read.parquet(pairs_dir).select("doc_a", "doc_b", "jaccard")
    got = {(r.doc_a, r.doc_b, r.jaccard) for r in got_rows.collect()}
    exp = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_incremental(spark, sf_dir).collect()
    }
    assert got == exp
    assert got_rows.count() == len(got)  # no duplicate rows anywhere
    arrays = spark.read.parquet(f"{index_dir}/arrays")
    assert arrays.count() == arrays.select("doc_id").distinct().count()
