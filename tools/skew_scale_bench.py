"""Planted key-skew tier for the USER-KEYED operator families (round 7).

The bench's replicated-union tier multiplies volume but keeps the key
distribution of the synthetic corpus — near-uniform users — so it never
exercises the claim the 100-TB posture actually rests on: user-keyed
shuffles, per-user windows, and the salted two-phase aggregate under a
REAL power-law key distribution (one celebrity user owning a visible
fraction of the fact table).

This tool plants two 10M-row event corpora that differ ONLY in user_id:
  - skewed:  user_id Pareto-tailed via the md5-inverse-CDF trick the graph
    tier established (deterministic, byte-reproducible, no RNG state) —
    the head user's share is measured and printed, not assumed;
  - uniform: user_id = hash % n_users (the control at identical volume,
    schema, and timestamp layout).

It then times the user-keyed gates on both and prints the skew/uniform
ratio per gate. What to expect and why it is the honest split:
  - hash-aggregate gates (cumulative_distinct_users, cohort_overlap,
    salted_join_agg's two-phase path) should be near-1× — partial
    aggregation absorbs key skew before the shuffle;
  - per-user WINDOW gates (sessionize, session_window_builtin,
    asof_join_nearest) concentrate the head user's rows in one task by
    definition of the partition contract; the ratio measures how much a
    celebrity key actually costs, and AQE's skew handling cannot split a
    window partition. That cost scales with the HEAD USER's rows, not the
    table — the printed head-share makes the bound explicit.

Usage: python tools/skew_scale_bench.py [total_rows] [alpha]
Writes nothing to the repo; prints markdown-ready rows for SCALING.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

GATES = (
    "sessionize",
    "sessionize_2phase",
    "session_window_builtin",
    "session_window_segmented",
    "asof_join_nearest",
    "asof_join_segmented",
    "cumulative_distinct_users",
    "cohort_overlap_jaccard",
    "salted_join_agg",
)


def plant_events(spark, total_rows: int, alpha: float, skewed: bool, out: str,
                 c_min: int = 100):
    """events.parquet over 30 days / 5 types; user_id is the only knob."""
    n_users = max(1000, total_rows // 100)
    if skewed:
        # md5 -> 60-bit uniform u; x = C * u^(-1/(alpha-1)) is Pareto with
        # the mass concentrated at small ids; C=100 puts the HEAD user at a
        # realistic celebrity share (~(alpha-1)% of all rows); C=1 is the
        # DEGENERATE tier where one id absorbs over half the table — the
        # adversarial bound for per-user window partitions; cap at n_users
        uid = F.least(
            F.expr(
                f"CAST({c_min} * POW((conv(substring(md5(cast(id AS"
                f" STRING)), 1, 15), 16, 10) + 1) / {2**60},"
                f" {-1.0 / (alpha - 1.0)}) AS BIGINT)"
            ),
            F.lit(n_users).cast("bigint"),
        )
    else:
        uid = F.pmod(F.xxhash64(F.col("id")), F.lit(n_users))
    h = F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(1_000_000))
    df = spark.range(0, total_rows, 1, 32).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(1_600_000_000_000_000)
            + (F.col("id") % 30) * 86_400_000_000
            + (h * 86_399) % 86_400_000_000
        ).alias("ts"),
        uid.alias("user_id"),
        F.element_at(
            F.array(*(F.lit(t) for t in
                      ("click", "purchase", "view", "signup", "error"))),
            (h % 5 + 1).cast("int"),
        ).alias("event_type"),
        ((h % 10_000).cast("double") / 10.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    df.write.mode("overwrite").parquet(f"{out}/events.parquet")
    # non-event tables read as-is (salted_join_agg joins customer): symlink
    # the sf0.1 originals — user_id cardinality there is irrelevant to the
    # skew under test, which lives in the fact keys
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(os.path.abspath(f"{base}/{t}.parquet"), dst)
    stats = (
        spark.read.parquet(f"{out}/events.parquet")
        .groupBy("user_id")
        .count()
        .agg(
            F.count(F.lit(1)).alias("users"),
            F.max("count").alias("head_rows"),
            F.sum("count").alias("n"),
        )
        .collect()[0]
    )
    return stats["users"], stats["head_rows"], stats["n"]


def main() -> None:
    total_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    alpha = float(sys.argv[2]) if len(sys.argv) > 2 else 2.2
    c_min = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    from etl_process_for_detecting_fraudulent_transactions_spark.queries import all_queries
    from etl_process_for_detecting_fraudulent_transactions_spark.session import get_spark

    spark = get_spark(app_name="skew_scale_bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    def timed(fn, sf_dir) -> float:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        return best

    with tempfile.TemporaryDirectory(prefix="skew_scale_") as tmp:
        runs = {}
        for label, skewed in (("uniform", False), ("skewed", True)):
            d = f"{tmp}/{label}"
            os.makedirs(d, exist_ok=True)
            users, head, n = plant_events(
                spark, total_rows, alpha, skewed, d, c_min
            )
            print(
                f"# {label}: {n} rows, {users} distinct users, head user"
                f" {head} rows ({100.0 * head / n:.1f}%)",
                file=sys.stderr,
            )
            runs[label] = (d, users, head, n)

        print(
            f"# corpus: {total_rows} rows; skewed head share"
            f" {100.0 * runs['skewed'][2] / runs['skewed'][3]:.1f}%"
            f" vs uniform {100.0 * runs['uniform'][2] / runs['uniform'][3]:.2f}%"
        )
        for g in GATES:
            tu = timed(qs[g], runs["uniform"][0])
            ts_ = timed(qs[g], runs["skewed"][0])
            print(
                f"| {g} | {tu:.2f} | {ts_:.2f} | {ts_ / tu:.2f}× "
                f"| {round(total_rows / ts_ / 10**6, 1)}M |"
            )

    spark.stop()


if __name__ == "__main__":
    main()
