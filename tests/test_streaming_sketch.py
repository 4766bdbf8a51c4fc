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
