"""Scale-path equi-depth histogram: sketched boundaries + broadcast
bucketing.

`queries/stats.py:equidepth_histogram` is the EXACT form — one global
NTILE sort. The 100× throughput tier measured its wall: ~708k rows/s flat
from 10× to 100× input, because the final window is a single partition no
matter how many cores exist. This operator is the documented 100-TB path:

1. boundaries from ``percentile_approx`` — Spark's mergeable
   QuantileSummaries sketch (Greenwald-Khanna): ONE map-side-combinable
   aggregation pass, no sort, no wide shuffle; the k-1 boundary doubles
   come back as driver metadata.
2. bucket assignment as a second narrow scan: each row counts how many
   boundaries are ≤ its value via a Catalyst HOF over the literal
   boundary array — JVM-side, embarrassingly parallel, no join at all.

The trade is exactness of the bucket POPULATIONS (boundaries are within
the sketch's rank error; populations are approximately n/k) for linear
scaling. tests/test_histogram.py pins the contract: every row lands in
exactly one bucket, bucket populations are within tolerance of n/k at
test scale, and the plan contains neither a global sort nor a join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def equidepth_bounds(
    df: DataFrame, col: str, k: int, accuracy: int = 10_000
) -> list[float]:
    """k-1 approximate bucket boundaries from one sketch aggregation.

    ``accuracy`` is percentile_approx's inverse rank-error knob (error ≤
    1/accuracy of the rank); the sketch is mergeable, so the pass is
    map-side combinable at any cluster size. The returned list is driver
    metadata (k-1 doubles), not data."""
    if k < 2:
        raise ValueError("need at least 2 buckets")
    row = df.agg(
        F.percentile_approx(
            col, [i / k for i in range(1, k)], accuracy
        ).alias("bounds")
    ).collect()[0]
    return list(row["bounds"])


def bucket_column(col: Column, bounds: list[float]) -> Column:
    """1-based bucket id: 1 + how many boundaries are ≤ the value — a
    Catalyst HOF over the literal boundary array (JVM-side, no join, no
    sort; NULL values yield NULL bucket)."""
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    return F.when(
        col.isNotNull(), F.size(F.filter(arr, lambda b: b <= col)) + 1
    ).cast("int")


def equidepth_assign(
    df: DataFrame, col: str, k: int, accuracy: int = 10_000
) -> DataFrame:
    """df + a ``bucket`` column in [1, k]: sketch pass + narrow scan."""
    bounds = equidepth_bounds(df, col, k, accuracy)
    return df.withColumn("bucket", bucket_column(F.col(col), bounds))
