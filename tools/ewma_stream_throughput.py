"""Measured throughput for the online EWMA anomaly stream (round-4 s5).

Drives ``ewma_stream`` (applyInPandasWithState, per-series two-long state)
over a synthetic 10x-tier event stream; rows/s from Structured Streaming's
own progress metrics — the scale datapoint mirroring
tools/streaming_throughput.py for the Q4 matcher.

Synthetic shape: N_ROWS events over N_TYPES series, strictly increasing
timestamps, values deterministic via xxhash64 with a planted 5x spike every
97th event per series so the anomaly emit path runs.

Usage: python tools/ewma_stream_throughput.py [n_rows] [n_files]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 4
N_TYPES = 64  # state width; also the stream's shuffle parallelism


def main() -> None:
    from pyspark.sql import functions as F

    from etl_process_for_detecting_fraudulent_transactions_spark.session import get_spark
    from etl_process_for_detecting_fraudulent_transactions_spark.streaming.pipeline import (
        ewma_stream,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    tmp = tempfile.mkdtemp(prefix="ewma_tput_")
    landing = os.path.join(tmp, "landing")
    ckpt = os.path.join(tmp, "ckpt")
    try:
        base = spark.range(N_ROWS).select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                F.lit(1_704_067_200_000_000)  # 2024-01-01 UTC
                + (F.col("id") / N_TYPES).cast("long") * 1_000_000
                + (F.col("id") % N_TYPES) * 100
            ).alias("ts"),
            F.concat(F.lit("t"), (F.col("id") % N_TYPES).cast("string")).alias(
                "event_type"
            ),
            F.when(
                (F.col("id") / N_TYPES).cast("long") % 97 == 0, F.lit(500.0)
            )
            # smooth baseline (100 +/- 4.5%) so only the planted spikes
            # trip the 20% gate — keeps the measurement about the state
            # path, not the sink
            .otherwise(100.0 + ((F.xxhash64("id") % 90 + 90) % 90) / 10.0)
            .alias("value"),
        )
        base.repartitionByRange(N_FILES, "ts").write.parquet(landing)

        stream = (
            spark.readStream.schema(spark.read.parquet(landing).schema)
            .option("maxFilesPerTrigger", max(1, N_FILES // 4))
            .parquet(landing)
        )
        q = (
            ewma_stream(stream)
            .writeStream.format("memory")
            .queryName("ewma_tput_out")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        t0 = time.time()
        seen = 0
        while time.time() - t0 < 600:
            # running max: recentProgress caps at ~100 entries and the
            # availableNow+timeout cleanup batches can evict data batches
            seen = max(seen, sum(p.numInputRows for p in q.recentProgress))
            if seen >= N_ROWS:
                break
            time.sleep(0.5)
        data_batches = [p for p in q.recentProgress if p.numInputRows > 0]
        wall = sum(p.batchDuration for p in data_batches) / 1000.0
        emitted = spark.sql("SELECT COUNT(*) AS n FROM ewma_tput_out").collect()[0].n
        q.stop()
        print(
            json.dumps(
                {
                    "rows": seen,
                    "wall_sec": round(wall, 2),
                    "rows_per_sec": round(seen / wall) if wall else None,
                    "batches": len(data_batches),
                    "anomalies": emitted,
                }
            )
        )
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
