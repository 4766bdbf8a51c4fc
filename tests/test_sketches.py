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


def test_countmin_overestimates_within_epsilon(spark):
    """CMS guarantee: est >= true always; est <= true + eps*N with prob
    1-delta (eps = e/W, delta = e^-D). At sf0.01: N=10k, W=256 -> eps*N ≈
    106; the md5 hash family behaves like the guarantee assumes."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        CMS_W,
        countmin_heavy_hitters,
    )

    import os

    sf_dir = os.path.join(os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.01")
    est = {
        r["user_id"]: r["est_count"] for r in countmin_heavy_hitters(spark, sf_dir).collect()
    }
    true = {
        r["user_id"]: r["n"]
        for r in (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        if r["user_id"] % 10 == 0
    }
    assert set(est) == set(true)
    n_total = sum(
        r["n"]
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    import math

    eps_n = math.e / CMS_W * n_total
    for k, t in true.items():
        assert est[k] >= t, f"CMS UNDER-estimated {k}: {est[k]} < {t}"
        assert est[k] <= t + eps_n, f"{k}: est {est[k]} vs true {t} (+{eps_n:.0f} bound)"
