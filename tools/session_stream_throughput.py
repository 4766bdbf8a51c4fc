"""Measured throughput for the JVM-NATIVE stateful streaming path
(``card_sessions`` — built-in ``session_window`` aggregation with watermark
state GC), the third streaming scale datapoint next to the two Python-state
paths (Q4 matcher 67k rows/s, ewma_stream 90k rows/s on local[32]).

The contrast this measures: applyInPandasWithState crosses the Arrow
boundary per (group, batch) and runs the recurrence in Python, while
session_window keeps merge/GC entirely inside Tungsten — the number here
quantifies what the engine gains whenever the operator fits a built-in.

Synthetic shape: N_ROWS transactions over N_CARDS cards, per-card
inter-arrival alternating under/over the 30-minute gap so sessions really
merge AND really close (the watermark advances past them and evicts
state); timestamps strictly increasing per card, all values deterministic.

Usage: python tools/session_stream_throughput.py [n_rows] [n_files]
Prints one JSON line: {"rows": N, "wall_sec": W, "rows_per_sec": R,
"batches": B, "sessions": S}.
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
N_CARDS = 1024  # concurrent-session state width


def main() -> None:
    from pyspark.sql import functions as F

    from etl_process_for_detecting_fraudulent_transactions_spark.session import get_spark
    from etl_process_for_detecting_fraudulent_transactions_spark.streaming.pipeline import (
        card_sessions,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    tmp = tempfile.mkdtemp(prefix="sess_tput_")
    landing = os.path.join(tmp, "landing")
    ckpt = os.path.join(tmp, "ckpt")
    try:
        # per-card event k at: k*7 min + (k div 5)*40 min — runs of ~5
        # events 7 min apart (inside the 30-min gap: one session), then a
        # 40-min jump that closes the session; ~N_ROWS/(N_CARDS*5) sessions
        # per card, watermark-evicted as the stream advances
        k = (F.col("id") / N_CARDS).cast("long")
        base = spark.range(N_ROWS).select(
            F.concat(F.lit("c"), (F.col("id") % N_CARDS).cast("string")).alias(
                "card_num"
            ),
            F.timestamp_micros(
                F.lit(1_704_067_200_000_000)  # 2024-01-01 UTC
                + (k * 7 * 60 + (k / 5).cast("long") * 40 * 60) * 1_000_000
                + (F.col("id") % N_CARDS) * 1_000
            ).alias("trans_date"),
            ((F.xxhash64("id") % 9000 + 9000) % 9000 / 100.0 + 10.0).alias("amt"),
        )
        base.repartitionByRange(N_FILES, "trans_date").write.parquet(landing)

        stream = (
            spark.readStream.schema(spark.read.parquet(landing).schema)
            .option("maxFilesPerTrigger", max(1, N_FILES // 4))
            .parquet(landing)
        )
        q = (
            card_sessions(stream)
            .writeStream.format("memory")
            .queryName("sess_tput_out")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        t0 = time.time()
        seen = 0
        while time.time() - t0 < 600:
            seen = max(seen, sum(p.numInputRows for p in q.recentProgress))
            if seen >= N_ROWS and not q.isActive:
                break
            if seen >= N_ROWS and q.status["isDataAvailable"] is False:
                break
            time.sleep(0.5)
        data_batches = [p for p in q.recentProgress if p.numInputRows > 0]
        wall = sum(p.batchDuration for p in data_batches) / 1000.0
        sessions = spark.sql("SELECT COUNT(*) AS n FROM sess_tput_out").collect()[0].n
        q.stop()
        print(
            json.dumps(
                {
                    "rows": seen,
                    "wall_sec": round(wall, 2),
                    "rows_per_sec": round(seen / wall) if wall else None,
                    "batches": len(data_batches),
                    "sessions": sessions,
                }
            )
        )
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
