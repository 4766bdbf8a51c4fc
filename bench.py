"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is timed as a cold logical plan → full materialization
(count via noop-ish collect of aggregates; collect() for row outputs).
Session startup is excluded (the driver compares per-query throughput,
not JVM boot).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_process_for_detecting_fraudulent_transactions_spark.queries import all_queries  # noqa: E402
from etl_process_for_detecting_fraudulent_transactions_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    qs = all_queries()
    only = os.environ.get("SPARK_GRAFT_BENCH_KEYS")  # test hook: subset keys
    if only:
        keep = set(only.split(","))
        qs = {k: v for k, v in qs.items() if k in keep}
    # warm the JVM + parquet footers with one cheap action (excluded)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(qs):
        best, n = None, 0
        try:
            for it in range(2):  # best-of-2: the host is noisy; min is the signal
                t0 = time.perf_counter()
                df = qs[name](spark, sf_dir)
                # noop sink: materializes EVERY output column (count() would
                # let Catalyst prune unreferenced columns, under-timing
                # narrow projection queries) without write-path cost
                df.write.format("noop").mode("overwrite").save()
                elapsed = time.perf_counter() - t0
                best = elapsed if best is None else min(best, elapsed)
                if it == 0:
                    n = df.count()  # untimed, reporting only
                # queries are independent: drop cached frames so one query's
                # cache residue doesn't squeeze the next one's execution memory
                spark.catalog.clearCache()
        except Exception as exc:  # noqa: BLE001 — one bad query must not kill the bench
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            spark.catalog.clearCache()
            continue
        times[name] = round(best, 3)
        print(f"# {name}: {times[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "query_suite_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "errors": errors,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
