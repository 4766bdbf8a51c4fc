"""Accuracy contract for the approximate-sketch queries: the HLL distinct
estimate must land within its configured relative error of the exact answer
(the oracle gate can't check this — estimates are engine-specific — so the
contract is pinned here)."""

from pyspark.sql import functions as F

from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
    approx_distinct_sketch,
)


def test_hll_estimate_within_relative_error(spark, sf_dir):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in approx_distinct_sketch(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["exact_users"]
        for r in (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("exact_users"))
            .collect()
        )
    }
    assert set(approx) == set(exact)
    for k in exact:
        rel = abs(approx[k] - exact[k]) / max(exact[k], 1)
        assert rel < 0.05, f"{k}: approx {approx[k]} vs exact {exact[k]} (rel {rel:.3f})"
