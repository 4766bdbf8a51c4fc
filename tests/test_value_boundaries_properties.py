"""Property test for the shared `_value_boundaries` histogram-route helper
(round 6): for randomized fixed-seed value sets — skewed, tied, negative,
tiny, and adversarially clustered — the boundaries it finds without a
global sort must equal the sorted-list definition exactly, for BOTH rank
formulas it is used with (lift's descending deciles, equi-depth's ascending
cuts). One Spark session, many examples inside one test: each example is
two jobs, so the whole sweep stays cheap."""

from __future__ import annotations

import random


def _expected(vals, n_ks, rank_fn):
    asc = sorted(vals)
    n = len(asc)
    return sorted((asc[rank_fn(k, n) - 1] for k in range(1, n_ks + 1)),
                  reverse=True)


def _run(spark, vals, n_ks, rank_sql):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        _value_boundaries,
    )

    df = spark.createDataFrame([(v,) for v in vals], "bv_in bigint")
    row = _value_boundaries(spark, df, "bv_in", n_ks, rank_sql).collect()[0]
    return list(row["cs"])


def _cases(rng):
    yield [rng.randint(-1000, 1000) for _ in range(rng.randint(20, 400))]
    # mass ties: few distinct values
    yield [rng.choice([7, 7, 7, 42, 99]) for _ in range(200)]
    # heavy skew: zipf-ish magnitudes spanning bins unevenly
    yield [int(10 ** (rng.random() * 6)) for _ in range(300)]
    # adversarial: all values inside ONE histogram bin except one outlier
    yield [rng.randint(0, 3) for _ in range(150)] + [10_000_000]
    # negatives straddling zero
    yield [rng.randint(-5, 5) for _ in range(64)]
    # tiny inputs around the rank-formula edges
    yield [rng.randint(0, 9) for _ in range(rng.randint(10, 15))]


def test_value_boundaries_match_sorted_definition(spark):
    rng = random.Random(66)
    n_checked = 0
    for round_i in range(3):
        for vals in _cases(rng):
            # equi-depth ascending cuts: rank = ceil(k*n/B), B = 8
            got = _run(spark, vals, 7, "(k * n + 7) div 8")
            want = _expected(vals, 7, lambda k, n: (k * n + 7) // 8)
            assert got == want, (round_i, vals[:10], got, want)
            # lift descending deciles: rank = n - ceil(k*n/10) + 1
            got = _run(spark, vals, 9, "n - (k * n + 9) div 10 + 1")
            want = _expected(
                vals, 9, lambda k, n: n - (k * n + 9) // 10 + 1
            )
            assert got == want, (round_i, vals[:10], got, want)
            n_checked += 1
    assert n_checked == 18
