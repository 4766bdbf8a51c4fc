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


def test_kmv_estimate_within_relative_error(spark):
    """KMV contract: exact below K distinct hashes; above, the (K-1)/U_(K)
    estimator's standard error is 1/sqrt(K-2) ≈ 12.7% at K=64 — pinned at
    3 sigma. sf0.01 exercises the estimator path (150 distinct > K)."""
    import os

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        KMV_K,
        approx_distinct_kmv,
    )

    sf_dir = os.path.join(
        os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.01"
    )
    approx = {
        r["event_type"]: r["approx_users"]
        for r in approx_distinct_kmv(spark, sf_dir).collect()
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
    assert any(v > KMV_K for v in exact.values()), "estimator path not exercised"
    for k in exact:
        rel = abs(approx[k] - exact[k]) / max(exact[k], 1)
        bound = 1.0 if exact[k] <= KMV_K else 3 / (KMV_K - 2) ** 0.5
        if exact[k] <= KMV_K:
            assert approx[k] == exact[k], f"{k}: below-K must be exact"
        else:
            assert rel < bound, f"{k}: approx {approx[k]} vs {exact[k]} (rel {rel:.3f})"


def test_kmv_set_ops_exact_regime_and_bounds(spark, sf_dir):
    """Sketch algebra truth: at sf0.001 every cohort has < K distinct
    users, so the merged sketch is in the EXACT regime — est_a/est_b/
    est_union/est_intersect must equal the true distinct counts, and
    jaccard_est the true Jaccard. (The estimator path is exercised by the
    sf0.01 oracle-parity gate; here we pin the exact-regime identity
    against independently computed truth.)"""
    import duckdb

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        kmv_set_ops,
    )

    got = {(r.type_a, r.type_b): r for r in kmv_set_ops(spark, sf_dir).collect()}
    assert len(got) == 10  # C(5,2) cohort pairs
    truth = duckdb.sql(
        f"""
        WITH u AS (
          SELECT DISTINCT event_type, user_id
          FROM '{sf_dir}/events.parquet' WHERE user_id IS NOT NULL
        )
        SELECT a.event_type AS ta, b.event_type AS tb,
               COUNT(DISTINCT a.user_id) FILTER (a.user_id = b.user_id) AS inter,
               COUNT(DISTINCT a.user_id) AS na, COUNT(DISTINCT b.user_id) AS nb
        FROM u a, u b WHERE a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
        """
    ).fetchall()
    for ta, tb, inter, na, nb in truth:
        r = got[(ta, tb)]
        union = na + nb - inter
        assert (r.est_a, r.est_b, r.est_union) == (na, nb, union)
        assert r.est_intersect == inter
        assert r.jaccard_est == inter / union
        assert r.inter_hits == inter


def test_drift_ks_known_distributions(spark, tmp_path):
    """Exact-KS truth on hand-built samples vs an independent plain-Python
    sup-of-CDF-difference computation (tie handling included)."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        drift_ks_test,
    )

    # period0 (even ids): [1,2,2,9]; period1 (odd ids): [2,3,3,9]
    vals = {0: 1.0, 2: 2.0, 4: 2.0, 6: 9.0, 1: 2.0, 3: 3.0, 5: 3.0, 7: 9.0}
    rows = [(i, "t", v) for i, v in vals.items()]
    path = str(tmp_path / "ev")
    spark.createDataFrame(rows, ["event_id", "event_type", "value"]).write.parquet(
        f"{path}/events.parquet"
    )
    got = drift_ks_test(spark, path).collect()[0]

    a = sorted(v for i, v in vals.items() if i % 2 == 0)
    b = sorted(v for i, v in vals.items() if i % 2 == 1)
    pts = sorted(set(a + b))
    ks_num = max(
        abs(
            sum(1 for x in a if x <= p) * len(b)
            - sum(1 for x in b if x <= p) * len(a)
        )
        for p in pts
    )
    assert (got.n1, got.n2, got.ks_num) == (len(a), len(b), ks_num)
    assert got.ks_stat == ks_num / (len(a) * len(b))
    assert ks_num == 8  # at v=2: F1=3/4, F2=1/4 -> |3*4 - 1*4| = 8


def test_chi2_independence_known_table(spark, tmp_path):
    """Exact-chi2 truth on a hand-built contingency table vs an independent
    plain-Python float computation: every scaled integer cell is
    floor(10^6 * exact rational), so the summed statistic is within
    n_cells * 1e-6 of the float chi-squared (and never above it)."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        chi2_independence,
    )

    # 2x3 table: rows en/fr, cols a/b/c
    counts = {("en", "a"): 10, ("en", "b"): 20, ("en", "c"): 30,
              ("fr", "a"): 25, ("fr", "b"): 15, ("fr", "c"): 5}
    rows = [
        (i, lang, src)
        for i, ((lang, src), n) in enumerate(counts.items())
        for _ in range(n)
    ]
    path = str(tmp_path / "docs")
    spark.createDataFrame(rows, ["doc_id", "lang", "source"]).write.parquet(
        f"{path}/documents.parquet"
    )
    out = chi2_independence(spark, path).collect()

    t = sum(counts.values())
    r = {"en": 60, "fr": 45}
    c = {"a": 35, "b": 35, "c": 35}
    chi2_float = sum(
        (o - r[l] * c[s] / t) ** 2 / (r[l] * c[s] / t)
        for (l, s), o in counts.items()
    )
    got = out[0]
    assert got.dof == (2 - 1) * (3 - 1)
    assert len(out) == 6
    assert all(row.chi2_micro == got.chi2_micro for row in out)
    assert 0 <= chi2_float - got.chi2_micro / 1e6 < 6e-6
    for row in out:
        o, l, s = counts[(row.lang, row.source)], row.lang, row.source
        assert row.o == o
        assert row.e_micro == (r[l] * c[s] * 10**6) // t


def test_ewma_anomaly_known_series(spark, tmp_path):
    """Fixed-point EWMA recurrence truth on a hand-built daily series vs an
    independent plain-Python replay (anomaly checked against s BEFORE the
    update, exactly as the gate and its recursive-CTE oracle do)."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.timeseries import (
        ewma_anomaly,
    )

    import datetime as dt

    # one event per day -> daily x = floor(value*1000)
    vals = [10.0, 10.0, 10.0, 50.0, 10.0, 10.0]  # day 4 spikes, day 5 dips
    rows = [
        (i, dt.datetime(2024, 1, i + 1, 12, 0, 0), 7, "t", v)
        for i, v in enumerate(vals)
    ]
    path = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    ).write.parquet(f"{path}/events.parquet")

    got = ewma_anomaly(spark, path).collect()[0]

    xs = [int(v * 1000 // 1) for v in vals]
    s, anom = xs[0], 0
    for x in xs[1:]:
        if abs(x - s) * 5 > s:
            anom += 1
        s = (3 * x + 13 * s) // 16
    assert (got.n_days, got.ewma_final_milli, got.n_anomalies) == (
        len(xs), s, anom,
    )
    # spike day, return-to-baseline day, and the day after (EWMA still
    # elevated at 16093 milli while x is back to 10000)
    assert anom == 3


def test_interval_union_known_intervals(spark, tmp_path):
    """Interval-merge truth on hand-built overlapping/touching/disjoint
    spans: [0,10] + [5,12] merge (overlap), [12,20] merges too (touching
    start == running max end is NOT a new island), [25,30] is disjoint."""
    import datetime as dt

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.timeseries import (
        interval_union,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [  # (event_id, start_offset_s, duration_s)
        (1, 0, 10), (2, 5, 7), (3, 12, 8), (4, 25, 5),
    ]
    data = [
        (eid, base + dt.timedelta(seconds=off), 42, "t", float(dur))
        for eid, off, dur in rows
    ]
    path = str(tmp_path / "ev")
    spark.createDataFrame(
        data, ["event_id", "ts", "user_id", "event_type", "value"]
    ).write.parquet(f"{path}/events.parquet")

    got = interval_union(spark, path).collect()[0]
    # islands: [0,20] (three intervals chain) and [25,30]
    assert (got.n_intervals, got.n_merged) == (4, 2)
    assert got.covered_us == (20 + 5) * 1_000_000


def test_poisson_bootstrap_weight_distribution(spark, sf_dir):
    """The hash-derived Poisson(1) weights must (a) reproduce the CDF cuts —
    replicate draw totals within 4 sigma of n (Poisson sum concentrates) —
    and (b) give replicate means that bracket the true mean (the CI
    property the bootstrap exists for)."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        BOOT_B,
        poisson_bootstrap,
    )

    rows = poisson_bootstrap(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").dropna(subset=["value"])
    import pyspark.sql.functions as F

    truth = {
        r.event_type: (r.n, r.s)
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("s"),
        )
        .collect()
    }
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for etype, reps in by_type.items():
        n, s = truth[etype]
        assert len(reps) == BOOT_B
        for r in reps:  # Poisson(1) sum over n rows: mean n, sd sqrt(n)
            assert abs(r.n_drawn - n) < 4 * n**0.5 + 10
        means = sorted(r.mean_milli for r in reps)
        assert means[0] <= s / n <= means[-1]


def test_pareto_frontier_equals_naive_dominance(spark, sf_dir):
    """The sort-based skyline equals the DEFINITION: rows with no dominator
    (cheaper-or-equal AND newer-or-equal, one strict) — checked via the
    naive quadratic anti-join the operator exists to avoid."""
    import pyspark.sql.functions as F

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.extra import (
        pareto_frontier,
    )

    got = {
        (r.o_orderpriority, r.o_orderkey)
        for r in pareto_frontier(spark, sf_dir).collect()
    }
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_totalprice").cast("decimal(18,4)").alias("price"),
            F.col("o_orderdate").alias("odate"),
        )
    )
    a, b = o.alias("a"), o.alias("b")
    dominated = a.join(
        b,
        (F.col("a.o_orderpriority") == F.col("b.o_orderpriority"))
        & (F.col("b.price") <= F.col("a.price"))
        & (F.col("b.odate") >= F.col("a.odate"))
        & (
            (F.col("b.price") < F.col("a.price"))
            | (F.col("b.odate") > F.col("a.odate"))
        ),
        "semi",
    )
    want = {
        (r.o_orderpriority, r.o_orderkey)
        for r in o.subtract(dominated).select("o_orderpriority", "o_orderkey").collect()
    }
    assert got == want and got


def test_cusum_known_series(spark, tmp_path):
    """CUSUM recurrence truth on a hand-built shifted series vs an
    independent plain-Python replay: a sustained level shift accumulates
    past the threshold; the pre-shift regime never alarms."""
    import datetime as dt

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.timeseries import (
        cusum_anomaly,
    )

    vals = [10.0] * 6 + [14.0] * 6  # sustained +40% shift at day 7
    rows = [
        (i, dt.datetime(2024, 1, i + 1, 12, 0, 0), 7, "t", v)
        for i, v in enumerate(vals)
    ]
    path = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    ).write.parquet(f"{path}/events.parquet")

    got = cusum_anomaly(spark, path).collect()[0]

    xs = [int(v * 1000 // 1) for v in vals]
    mu = sum(xs) // len(xs)
    k, h = mu // 20, mu // 2
    s = alarms = mx = 0
    for x in xs:
        s = max(0, s + x - mu - k)
        if s > h:
            alarms += 1
        mx = max(mx, s)
    assert (got.n_days, got.mu_milli, got.n_alarms, got.max_cusum,
            got.final_cusum) == (len(xs), mu, alarms, mx, s)
    assert alarms >= 2  # the shift is detected and stays alarmed


def test_interval_union_property_random_intervals(spark, tmp_path):
    """Property pin: the window sweep equals an independent plain-Python
    interval merge on hypothesis-generated interval sets (multi-user,
    duplicate starts, zero-length and containing intervals included).
    One Spark round over a batch of generated cases (a @given-per-case
    Spark job would be minutes; the batch is one job)."""
    import datetime as dt
    import random

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.timeseries import (
        interval_union,
    )

    rng = random.Random(20240815)
    base = dt.datetime(2024, 1, 1)
    rows, want = [], {}
    eid = 0
    for user in range(40):  # 40 generated cases, one per user
        n = rng.randint(1, 12)
        ivs = []
        for _ in range(n):
            start = rng.randint(0, 500)
            dur = rng.choice([0, 1, 2, 5, 50, 200])
            ivs.append((start, dur))
            rows.append(
                (eid, base + dt.timedelta(seconds=start), user, "t", float(dur))
            )
            eid += 1
        # independent merge: sort by start, extend or open islands
        merged = []
        for s, d in sorted(ivs):
            e = s + d
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        want[user] = (
            n,
            len(merged),
            sum(e - s for s, e in merged) * 1_000_000,
        )

    path = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    ).write.parquet(f"{path}/events.parquet")
    got = {
        r.user_id: (r.n_intervals, r.n_merged, r.covered_us)
        for r in interval_union(spark, path).collect()
    }
    assert got == want


def test_gap_islands_property_random_days(spark, tmp_path):
    """Property pin: the day - row_number streak detection equals an
    independent plain-Python consecutive-run scan on randomized per-user
    day sets (duplicate events per day included)."""
    import datetime as dt
    import random

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.timeseries import (
        gap_islands,
    )

    rng = random.Random(19)
    rows, want = [], {}
    eid = 0
    for user in range(40):
        days = sorted(rng.sample(range(60), rng.randint(1, 20)))
        for d in days:
            for _ in range(rng.randint(1, 3)):  # multiple events per day
                rows.append(
                    (eid, dt.datetime(2024, 1, 1, 12) + dt.timedelta(days=d),
                     user, "t", 1.0)
                )
                eid += 1
        streaks, cur = [], 1
        for a, b in zip(days, days[1:]):
            if b == a + 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        want[user] = (len(days), len(streaks), max(streaks))

    path = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    ).write.parquet(f"{path}/events.parquet")
    got = {
        r.user_id: (r.active_days, r.n_streaks, r.longest_streak)
        for r in gap_islands(spark, path).collect()
    }
    assert got == want


def test_twap_property_random_series(spark, tmp_path):
    """Property pin: twap_daily equals an independent plain-Python
    interval-weighted mean on randomized intra-day series (duplicate
    timestamps tiebroken by event_id, exactly as the gate orders)."""
    import datetime as dt
    import random

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.timeseries import (
        twap_daily,
    )

    rng = random.Random(7)
    rows, eid = [], 0
    series = {}
    for t in range(8):  # 8 single-day series
        etype = f"t{t}"
        n = rng.randint(2, 15)
        evs = []
        for _ in range(n):
            off = rng.randint(0, 86_399)
            v = rng.randint(1, 500) / 7.0
            evs.append((off, eid, v))
            rows.append(
                (eid, dt.datetime(2024, 1, 5) + dt.timedelta(seconds=off),
                 1, etype, v)
            )
            eid += 1
        series[etype] = sorted(evs)
    path = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    ).write.parquet(f"{path}/events.parquet")

    got = {
        r.event_type: (r.total_us, r.n_intervals, r.twap)
        for r in twap_daily(spark, path).collect()
    }
    for etype, evs in series.items():
        wsum = tot = 0
        for (o1, _, v), (o2, _, _) in zip(evs, evs[1:]):
            dur = (o2 - o1) * 1_000_000
            wsum += int(v * 1000 // 1) * dur
            tot += dur
        if tot == 0 and len(evs) >= 2:
            # all events share one timestamp: intervals exist but carry
            # zero duration — twap divides 0/0 -> NULL in both engines
            assert got[etype][0] == 0
            continue
        assert got[etype][0] == tot
        assert got[etype][1] == len(evs) - 1
        assert got[etype][2] == wsum / (tot * 1000)


def test_heavy_hitters_exact_rescan_planted_skew(spark, tmp_path):
    """The nominate->rescan path on a PLANTED heavy-key distribution: the
    gate's relative threshold (1.2x the mean per-user rate) must return
    exactly the true heavy set with exact counts, and the CMS estimate must
    never underestimate (the superset property the two-pass design relies
    on). Guards VERDICT r4 #3's finding that the gate was vacuously green
    (0 rows) on the near-uniform synthetic user_ids."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        heavy_hitters_exact_rescan,
    )

    # 100 light users x 10 events + two heavies: 1001 x 100, 1002 x 50.
    # n_total=1150, n_users=102, mean≈11.3, 1.2x bar≈13.5 -> true heavy
    # set is exactly {1001: 100, 1002: 50}.
    counts = {u: 10 for u in range(1, 101)}
    counts[1001] = 100
    counts[1002] = 50
    rows = [
        (eid, u, "click")
        for eid, (u, n) in enumerate(
            (u, i) for u, n in counts.items() for i in range(n)
        )
    ]
    path = str(tmp_path / "ev")
    spark.createDataFrame(rows, ["event_id", "user_id", "event_type"]).write.parquet(
        f"{path}/events.parquet"
    )

    got = {
        r["user_id"]: (r["exact_count"], r["est_count"], r["overestimate"])
        for r in heavy_hitters_exact_rescan(spark, path).collect()
    }
    assert set(got) == {1001, 1002}
    assert got[1001][0] == 100
    assert got[1002][0] == 50
    for exact, est, over in got.values():
        assert est >= exact  # CMS never underestimates
        assert over == est - exact
