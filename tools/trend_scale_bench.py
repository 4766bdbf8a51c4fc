"""Stretched-calendar scale evidence for the robust-trend family
(VERDICT r6 #6): theil_sen_slope / mann_kendall_trend / pettitt_changepoint
claim their quadratic (Pettitt: cubic) stages are bounded by CALENDAR DAYS,
never by fact rows. The 100x-union tier can't test that claim — replication
multiplies fact rows but replays the same ~30-day calendar — so this tool
PLANTS a calendar 10x-30x longer (default 900 days, 5 types, 10M fact rows)
and measures, per gate:

  - the full gate time (cold plan -> noop sink, best-of-2), and
  - the daily-aggregate stage ALONE on the same input (the fact-scale part
    every gate shares),

so the report shows how much of each gate is the linear fact scan vs the
calendar-bounded pair/cut machinery. Expected shape: theil_sen and
mann_kendall stay daily-agg-dominated at 900 days (405k pairs/type is
nothing); pettitt's O(days^3/6) cut materialization (~121M rows/type at 900
days) grows past the fact scan — still fully distributed (explode + hash
agg, no single-task stage), but calendar length, not fact volume, is its
honest cost driver, and the tool prints that split rather than hiding it.

Usage: python tools/trend_scale_bench.py [days] [total_rows] [types]
Writes nothing to the repo; prints markdown-ready rows for SCALING.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    days = int(sys.argv[1]) if len(sys.argv) > 1 else 900
    total_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    n_types = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        mann_kendall_trend,
        pettitt_changepoint,
        theil_sen_slope,
    )
    from etl_process_for_detecting_fraudulent_transactions_spark.session import get_spark

    spark = get_spark(app_name="trend_scale_bench")
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory(prefix="trend_scale_") as tmp:
        # Planted corpus: deterministic (hash-derived values, no RNG state),
        # one level shift at 60% of the calendar so Pettitt has a real
        # changepoint to find; same column names/types the gates read.
        per_day = max(1, total_rows // days)
        shift_day = (days * 3) // 5
        df = (
            spark.range(0, days * per_day, 1, 32)
            .select(
                F.col("id").alias("event_id"),
                (F.col("id") % days).alias("d"),
                F.pmod(F.xxhash64(F.col("id")), F.lit(1000)).alias("h"),
            )
            .select(
                "event_id",
                F.timestamp_micros(
                    F.lit(1_600_000_000_000_000)
                    + F.col("d") * 86_400_000_000
                    + (F.col("h") * 86_400_000) % 86_400_000_000
                ).alias("ts"),
                (F.col("h") % 10_000).alias("user_id"),
                F.concat(F.lit("type_"), (F.col("h") % n_types)).alias(
                    "event_type"
                ),
                (
                    (F.col("h").cast("double") / 10.0)
                    + F.when(F.col("d") >= shift_day, 40.0).otherwise(0.0)
                ).alias("value"),
                F.lit("{}").alias("props"),
            )
        )
        df.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
        n = spark.read.parquet(f"{tmp}/events.parquet").count()
        print(f"# planted: {n} rows, {days} days, {n_types} types", file=sys.stderr)

        def timed(fn) -> float:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, tmp).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                spark.catalog.clearCache()
            return best

        def daily_agg_only(spark_, sf_dir):
            # the shared fact-scale stage of all three gates, in isolation
            from etl_process_for_detecting_fraudulent_transactions_spark.queries._io import (
                load_table,
            )

            ev = load_table(spark_, sf_dir, "events").filter(
                F.col("value").isNotNull()
            )
            return ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
                F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("x")
            )

        base = timed(daily_agg_only)
        nm = f"{n / 10**6:.1f}M"
        print(
            f"| daily-agg stage alone | events {nm} x {days}d "
            f"| {base:.2f} | {round(n / base / 10**6, 1)}M |"
        )
        for name, fn in (
            ("theil_sen_slope", theil_sen_slope),
            ("mann_kendall_trend", mann_kendall_trend),
            ("pettitt_changepoint", pettitt_changepoint),
        ):
            sec = timed(fn)
            share = 100.0 * base / sec
            print(
                f"| {name} | events {nm} x {days}d | {sec:.2f} "
                f"| {round(n / sec / 10**6, 1)}M | daily-agg share {share:.0f}% |"
            )

    spark.stop()


if __name__ == "__main__":
    main()
