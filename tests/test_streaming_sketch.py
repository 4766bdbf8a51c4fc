"""Streaming count-min sketch: the CMS cell table maintained by a streaming
aggregation over an event stream equals the batch-built sketch — the
mergeable-sketch property (cells are plain counts, so partial aggregation
IS sketch merge) carries over to incremental maintenance for free.

Two micro-batches arrive (events split by event_id parity); after the
availableNow drain, the complete-mode cell counts must be bit-identical to
``countmin_heavy_hitters``'s build phase over the same rows, and probing
them must give the same estimates.
"""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import TESTDATA

SF_DIR = os.path.join(TESTDATA, "sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not available"
)


def _cells_expr(df):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        CMS_D,
        _cms_bucket,
    )

    k = F.col("user_id").cast("string")
    return df.select(
        F.posexplode(F.array(*[_cms_bucket(r, k) for r in range(CMS_D)])).alias(
            "row", "bucket"
        )
    )


def test_streaming_cms_cells_match_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").select("event_id", "user_id")
    # two "arrival batches" as separate parquet files in a watched dir
    src = f"{tmp_path}/stream_src"
    events.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(src)
    events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("event_id long, user_id long").parquet(src)
    cells_stream = (
        _cells_expr(stream)
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = (
        cells_stream.writeStream.format("memory")
        .queryName("cms_cells")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in spark.sql("SELECT * FROM cms_cells").collect()
    }
    want = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in _cells_expr(events)
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want


def test_streaming_kmv_merge_matches_batch(spark, tmp_path):
    """KMV mergeability as an OPERATIONAL property: a foreachBatch loop
    that keeps only the K smallest distinct hashes per cohort (merge =
    union -> re-take K smallest) over two arrival batches ends with the
    sketch state the batch build produces — so the persisted sketch stays
    K-bounded no matter how many batches arrive, and estimates from the
    streamed sketch equal the batch gate's output exactly."""
    import shutil

    from pyspark.sql import Window

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        KMV_K,
        _kmv_hash,
        approx_distinct_kmv,
    )

    events = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "event_type", "user_id"
    )
    src = f"{tmp_path}/kmv_src"
    events.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(src)
    events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(src)

    sketch_dir = f"{tmp_path}/kmv_sketch"

    def merge_batch(batch_df, _bid):
        b = (
            batch_df.filter(F.col("user_id").isNotNull())
            .select("event_type", _kmv_hash(F.col("user_id")).alias("h"))
            .distinct()
        )
        sess = batch_df.sparkSession
        import os as _os

        if _os.path.isdir(sketch_dir):
            b = b.unionByName(sess.read.parquet(sketch_dir)).distinct()
        w = Window.partitionBy("event_type").orderBy("h")
        merged = (
            b.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= KMV_K)
            .select("event_type", "h")
        )
        tmp = sketch_dir + ".__tmp__"
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(sketch_dir, ignore_errors=True)
        _os.replace(tmp, sketch_dir)

    q = (
        spark.readStream.schema("event_id long, event_type string, user_id long")
        .option("maxFilesPerTrigger", 1)  # force >= 2 merge rounds
        .parquet(src)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", f"{tmp_path}/kmv_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    sketch = spark.read.parquet(sketch_dir)
    # K-bounded state per cohort
    per = sketch.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("m"), F.max("h").alias("hk")
    )
    assert per.filter(F.col("m") > KMV_K).count() == 0
    # estimates from the streamed sketch == the batch gate, bit for bit
    est = F.when(F.col("m") < KMV_K, F.col("m")).otherwise(
        F.expr(f"CAST({(KMV_K - 1) * 4294967296} DIV GREATEST(hk, 1) AS BIGINT)")
    )
    got = {
        r.event_type: r.approx_users
        for r in per.select("event_type", est.alias("approx_users")).collect()
    }
    want = {
        r.event_type: r.approx_users
        for r in approx_distinct_kmv(spark, SF_DIR).collect()
    }
    assert got == want and len(got) == 5
