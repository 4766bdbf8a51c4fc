"""Sampled-boundary equi-depth: population tolerance, totality, and the
no-sort/no-join plan contract (the scale path whose exact counterpart is
the equidepth_histogram gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_process_for_detecting_fraudulent_transactions_spark.operators.histogram import (
    equidepth_assign,
    equidepth_bounds,
)

K = 8


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_populations_near_equal_and_total(spark, sf_dir):
    """Every non-null row lands in exactly one bucket in [1, K]; bucket
    populations are within 5% of n/K (the sketch's rank error at
    accuracy=10k is far tighter than that — the slack is for duplicated
    boundary values)."""
    e = _events(spark, sf_dir)
    n = e.filter(F.col("value").isNotNull()).count()
    got = (
        equidepth_assign(e, "value", K)
        .groupBy("bucket")
        .count()
        .collect()
    )
    by_bucket = {r.bucket: r["count"] for r in got}
    assert set(by_bucket) == set(range(1, K + 1))
    assert sum(by_bucket.values()) == n
    target = n / K
    for b, c in by_bucket.items():
        assert abs(c - target) <= 0.05 * target + 5, (b, c, target)


def test_bounds_are_sorted_metadata(spark, sf_dir):
    bounds = equidepth_bounds(_events(spark, sf_dir), "value", K)
    assert len(bounds) == K - 1
    assert bounds == sorted(bounds)


def test_plan_has_no_global_sort_or_join(spark, sf_dir):
    """The assignment scan must be embarrassingly parallel: no join, no
    window, no exchange at all in the bucketing plan (the sketch pass is a
    separate, already-finished aggregation)."""
    df = equidepth_assign(_events(spark, sf_dir), "value", K)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" not in plan
    assert "Exchange" not in plan


def test_matches_exact_gate_boundaries_roughly(spark, sf_dir):
    """Sketch boundaries at accuracy=10k must bracket the exact NTILE
    bucket edges: for each approximate boundary, the exact rank of values
    below it is within 1% of the ideal i·n/K rank."""
    e = _events(spark, sf_dir)
    n = e.filter(F.col("value").isNotNull()).count()
    bounds = equidepth_bounds(e, "value", K)
    for i, b in enumerate(bounds, start=1):
        rank = e.filter(F.col("value") <= b).count()
        assert abs(rank - i * n / K) <= 0.01 * n + 5, (i, b, rank)
