"""Measured throughput for the stateful streaming matcher (VERDICT r3 #6).

Drives ``guessing_amount_stream`` (applyInPandasWithState, per-card state)
over a synthetic 10x-tier transaction stream and reports rows/s from
Structured Streaming's own progress metrics (numInputRows / batch duration)
— the scale datapoint for the stateful-streaming path that the batch
families already have via bench.py's SPARK_GRAFT_BENCH_SCALE_UNION tier.

Synthetic shape: N_ROWS transactions over N_CARDS cards (state width =
concurrently-active cards), timestamps strictly increasing per card so the
ordered-replay contract holds, ~1% of cards carry a planted Q4 pattern so
the matcher's emit path is exercised, amounts/results drawn deterministically
(seeded) — no wall-clock or RNG in the measured path.

Usage: python tools/streaming_throughput.py [n_rows] [n_files]
Prints one JSON line: {"rows": N, "wall_sec": W, "rows_per_sec": R,
"batches": B, "events": E}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 4
N_CARDS = 10_000


def main() -> None:
    from pyspark.sql import functions as F

    from etl_process_for_detecting_fraudulent_transactions_spark.session import get_spark
    from etl_process_for_detecting_fraudulent_transactions_spark.streaming.pipeline import (
        guessing_amount_stream,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    tmp = tempfile.mkdtemp(prefix="stream_tput_")
    landing = os.path.join(tmp, "landing")
    ckpt = os.path.join(tmp, "ckpt")
    try:
        # deterministic synthetic stream: per-card increasing timestamps,
        # 1%-of-cards planted REJECT,REJECT,REJECT,SUCCESS descending-amt
        # runs so the matcher emits; everything seeded via hash, no RNG
        base = spark.range(N_ROWS).select(
            (F.col("id") % N_CARDS).cast("string").alias("card_num"),
            F.timestamp_micros(
                F.lit(1_614_556_800_000_000)  # 2021-03-01 00:00:00 UTC
                + (F.col("id") / N_CARDS).cast("long") * 60_000_000
                + (F.col("id") % N_CARDS) * 1_000
            ).alias("trans_date"),
            F.lit("PAYMENT").alias("oper_type"),
            F.when(
                (F.col("id") % N_CARDS < N_CARDS / 100) & ((F.col("id") / N_CARDS).cast("long") % 4 < 3),
                F.lit("REJECT"),
            )
            .otherwise(F.lit("SUCCESS"))
            .alias("oper_result"),
            F.when(
                F.col("id") % N_CARDS < N_CARDS / 100,
                (1000 - ((F.col("id") / N_CARDS).cast("long") % 4) * 100).cast("decimal(10,2)"),
            )
            .otherwise(((F.xxhash64("id") % 9000 + 9000) % 9000 + 100).cast("decimal(10,2)"))
            .alias("amt"),
            F.lit("T001").alias("terminal"),
        )
        base.repartitionByRange(N_FILES, "trans_date").write.parquet(landing)

        stream = (
            spark.readStream.schema(spark.read.parquet(landing).schema)
            .option("maxFilesPerTrigger", max(1, N_FILES // 4))
            .parquet(landing)
        )
        q = (
            guessing_amount_stream(stream)
            .writeStream.format("memory")
            .queryName("tput_out")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        # drain: poll progress until cumulative input rows reach N_ROWS
        # (ProcessingTimeTimeout keeps availableNow alive afterwards)
        t0 = time.time()
        seen = 0
        while time.time() - t0 < 600:
            seen = sum(p.numInputRows for p in q.recentProgress)
            if seen >= N_ROWS:
                break
            time.sleep(0.5)
        data_batches = [p for p in q.recentProgress if p.numInputRows > 0]
        wall = sum(p.batchDuration for p in data_batches) / 1000.0
        events = spark.sql("SELECT COUNT(*) FROM tput_out").collect()[0][0]
        q.stop()
        q.awaitTermination(60)
        print(
            json.dumps(
                {
                    "rows": seen,
                    "wall_sec": round(wall, 2),
                    "rows_per_sec": round(seen / wall) if wall else None,
                    "batches": len(data_batches),
                    "events": events,
                    "cards": N_CARDS,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
