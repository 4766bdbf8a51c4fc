"""MEASURED state-size audit for the stateful streaming operators.

The streaming family's 100-TB claims are state-size claims — "state is
bins+1 longs per key", "per-user state carries only the latest click",
"two longs per series" — i.e. state is O(KEYS), independent of stream
length. This tool measures that directly from Structured Streaming's own
progress metrics (stateOperators.numRowsTotal / memoryUsedBytes): each
audited operator is driven to completion over the SAME key set at N rows
and at 10N rows; stream-length independence means the state row count is
IDENTICAL at both sizes (and memory moves only with serialization noise,
never 10x).

Ops audited (all applyInPandasWithState over the events schema):
  - ewma_stream    — per-series (count, ewma_milli) state; keys = types
  - drift_stream   — per-type bins+1 long counts vs a fixed reference
  - asof_stream    — per-user (click_us, click_id, has_click)

Usage: python tools/state_audit.py [n_rows] [n_keys]
Prints one markdown row per (op, size) and a verdict line per op; exits
non-zero if any op's state rows GREW with stream length.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N_KEYS = int(sys.argv[2]) if len(sys.argv) > 2 else 64


def _events(spark, n_rows: int, n_keys: int, out: str) -> str:
    """events parquet: n_keys users/types, strictly increasing ts."""
    from pyspark.sql import functions as F

    spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(1_704_067_200_000_000) + F.col("id") * 1_000_000
        ).alias("ts"),
        (F.col("id") % n_keys).alias("user_id"),
        F.when((F.col("id") % 3) == 0, "purchase")
        .otherwise("click")
        .alias("event_type2"),
        F.concat(F.lit("t"), (F.col("id") % n_keys).cast("string")).alias(
            "event_type"
        ),
        (100.0 + (F.pmod(F.xxhash64("id"), F.lit(900))).cast("double") / 10.0)
        .alias("value"),
    ).withColumn(
        # asof needs click/purchase literals in event_type; ewma/drift key
        # on event_type too — give each op the column shape it expects by
        # renaming at drive time
        "tmp", F.lit(0)
    ).drop("tmp").write.mode("overwrite").parquet(out)
    return out


def _drive(spark, df_stream, name: str, ckpt: str):
    """Run to completion under availableNow (the poll-then-stop pattern —
    ProcessingTimeTimeout keeps the query alive forever otherwise) and
    return the last data batch's state-operator metrics."""
    q = (
        df_stream.writeStream.format("noop")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.time()
    last = None
    last_batch = -1
    idle = 0
    while time.time() - t0 < 600:
        progressed = False
        for p in q.recentProgress:
            so = p.stateOperators
            if p.numInputRows > 0 and so:
                last = so[0]
                if p.batchId > last_batch:
                    last_batch = p.batchId
                    progressed = True
        # Drain until NEW data batches stop arriving: the idle counter only
        # advances on polls that saw no fresh batch and resets whenever one
        # lands, so a slow host can't snapshot state mid-stream (the old
        # counter ticked on every poll after the FIRST batch).
        if last is not None:
            idle = 0 if progressed else idle + 1
            if idle >= 6:
                break
        time.sleep(0.5)
    q.stop()
    return last


def main() -> int:
    from pyspark.sql import functions as F

    from etl_process_for_detecting_fraudulent_transactions_spark.session import get_spark
    from etl_process_for_detecting_fraudulent_transactions_spark.streaming.pipeline import (
        asof_stream,
        drift_stream,
        ewma_stream,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    def ops(stream):
        ref = [100] * 16  # fixed reference histogram for the drift monitor
        return {
            "ewma_stream": ewma_stream(stream),
            "drift_stream": drift_stream(stream, ref, 1000_00, 625),
            "asof_stream": asof_stream(
                stream.drop("event_type").withColumnRenamed(
                    "event_type2", "event_type"
                )
            ),
        }

    results: dict[str, list] = {}
    tmp = tempfile.mkdtemp(prefix="state_audit_")
    try:
        for mult in (1, 10):
            n = N_ROWS * mult
            landing = _events(spark, n, N_KEYS, f"{tmp}/ev_{mult}")
            for op_name in ("ewma_stream", "drift_stream", "asof_stream"):
                stream = spark.readStream.schema(
                    spark.read.parquet(landing).schema
                ).option("maxFilesPerTrigger", 8).parquet(landing)
                so = _drive(
                    spark,
                    ops(stream)[op_name],
                    f"{op_name}_{mult}",
                    f"{tmp}/ckpt_{op_name}_{mult}",
                )
                rows = so.numRowsTotal if so else -1
                mem = so.memoryUsedBytes / 2**20 if so else -1
                results.setdefault(op_name, []).append((n, rows, mem))
                print(
                    f"| {op_name} | {n} rows | state_rows {rows} |"
                    f" state {mem:.2f} MB |"
                )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()

    bad = []
    for op_name, runs in results.items():
        (_, r1, _), (_, r10, _) = runs
        ok = r1 == r10 and r1 > 0
        print(
            f"# {op_name}: state rows {r1} at 1x vs {r10} at 10x -> "
            f"{'stream-length-independent' if ok else 'GREW WITH INPUT'}"
        )
        if not ok:
            bad.append(op_name)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
