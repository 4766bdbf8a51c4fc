"""Independent-truth pins for the round-6 gates: each gate replayed against
a plain-Python implementation of its DEFINITION on planted fixed-seed
fixtures — engine-free double-entry bookkeeping, so a shared misreading of
the semantics cannot pass both the Spark side and the DuckDB oracle.

All planted `value` floats are binary-exact (multiples of 0.25/0.5), so
floor(value*1000) is unambiguous across engines and this replay.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import random


def _tdiv(a: int, b: int) -> int:
    """DuckDB's // and Spark's DIV: truncation toward zero."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _write_events(spark, tmp_path, rows):
    path = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    ).write.parquet(f"{path}/events.parquet")
    return path


def _daily_milli(rows, types=None):
    """day -> type -> sum(floor(value*1000)) over the planted rows."""
    out = {}
    for _e, ts, _u, t, v in rows:
        if types and t not in types:
            continue
        d = ts.date()
        out.setdefault(t, {}).setdefault(d, 0)
        out[t][d] += math.floor(v * 1000)
    return out


def test_theil_sen_slope_recovers_planted_slope_despite_outliers(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import theil_sen_slope

    base = dt.datetime(2024, 3, 1, 12)
    rows, eid = [], 0
    # clean line x_d = 100 + 7*d (units), with two gross outliers that
    # would wreck a least-squares fit but not the pairwise median
    for d in range(15):
        v = 100.0 + 7.0 * d
        if d in (4, 11):
            v += 5000.0
        rows.append((eid, base + dt.timedelta(days=d), 1, "click", v))
        eid += 1
    path = _write_events(spark, tmp_path, rows)

    got = {r["event_type"]: (r["n_pairs"], r["ts_slope_milli"])
           for r in theil_sen_slope(spark, path).collect()}

    series = sorted(_daily_milli(rows)["click"].items())
    d0 = series[0][0]
    pts = [((day - d0).days, x) for day, x in series]
    slopes = sorted(
        _tdiv(xb - xa, db - da)
        for i, (da, xa) in enumerate(pts)
        for db, xb in pts[i + 1:]
    )
    n = len(slopes)
    expect = slopes[(n + 1) // 2 - 1]
    assert got == {"click": (n, expect)}
    assert expect == 7000  # the planted slope in milli, outliers rejected


def test_mann_kendall_trend_classification(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import mann_kendall_trend

    base = dt.datetime(2024, 3, 1, 12)
    rows, eid = [], 0
    for d in range(12):
        rows.append((eid, base + dt.timedelta(days=d), 1, "up", 10.0 + d)); eid += 1
        rows.append((eid, base + dt.timedelta(days=d), 1, "down", 100.0 - d)); eid += 1
        rows.append((eid, base + dt.timedelta(days=d), 1, "flat", 42.0)); eid += 1
    path = _write_events(spark, tmp_path, rows)

    got = {r["event_type"]: (r["s_stat"], r["n_pairs"], r["n_days"], r["trend"])
           for r in mann_kendall_trend(spark, path).collect()}
    n, npairs = 12, 66
    assert got["up"] == (npairs, npairs, n, "increasing")
    assert got["down"] == (-npairs, npairs, n, "decreasing")
    assert got["flat"] == (0, npairs, n, "no_trend")
    # threshold replay: 18*S^2 > 4*n(n-1)(2n+5)
    assert 18 * npairs**2 > 4 * n * (n - 1) * (2 * n + 5)


def test_gini_impurity_daily_planted_distributions(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import gini_impurity_daily

    base = dt.datetime(2024, 3, 1, 12)
    rows, eid = [], 0
    # day 0: pure (one type, 8 rows) -> gini 0, hhi 1e6
    for _ in range(8):
        rows.append((eid, base, 1, "a", 1.0)); eid += 1
    # day 1: two equal types (5+5) -> gini 500000, hhi 500000
    d1 = base + dt.timedelta(days=1)
    for _ in range(5):
        rows.append((eid, d1, 1, "a", 1.0)); eid += 1
        rows.append((eid, d1, 1, "b", 1.0)); eid += 1
    # day 2: skewed 6/2 -> n=8, sum c^2 = 40 -> hhi = 40*1e6 // 64
    d2 = base + dt.timedelta(days=2)
    for _ in range(6):
        rows.append((eid, d2, 1, "a", 1.0)); eid += 1
    for _ in range(2):
        rows.append((eid, d2, 1, "b", 1.0)); eid += 1
    path = _write_events(spark, tmp_path, rows)

    got = {r["day"].isoformat(): (r["n"], r["n_types"], r["gini_ppm"], r["hhi_ppm"])
           for r in gini_impurity_daily(spark, path).collect()}
    assert got["2024-03-01"] == (8, 1, 0, 1_000_000)
    assert got["2024-03-02"] == (10, 2, 500_000, 500_000)
    assert got["2024-03-03"] == (8, 2, (64 - 40) * 1_000_000 // 64,
                                 40 * 1_000_000 // 64)


def test_hll_registers_python_replay(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import hll_registers

    rng = random.Random(6)
    base = dt.datetime(2024, 3, 1)
    users = list(range(1, 1501))
    rows = []
    for eid in range(4000):
        u = rng.choice(users)
        rows.append((eid, base + dt.timedelta(seconds=eid), u, "click", 1.0))
    path = _write_events(spark, tmp_path, rows)

    row = hll_registers(spark, path).collect()[0]

    regs = {}
    seen = set()
    for _e, _ts, u, _t, _v in rows:
        seen.add(u)
        v = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
        bucket, w = v % 64, v // 64
        rank = 55 if w == 0 else 55 - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rank)
    s40 = sum(1 << (40 - r) for r in regs.values() if r <= 40)
    est = 2904064 * (1 << 40) // (1000 * s40)
    assert row["v_buckets"] == len(regs)
    assert row["max_rank"] == max(regs.values())
    assert row["s40"] == s40
    assert row["n_exact"] == len(seen)
    assert row["hll_estimate"] == est
    assert row["rel_err_ppm"] == abs(est - len(seen)) * 1_000_000 // len(seen)
    # sanity: the raw estimator lands within 30% at n=1500, m=64
    assert abs(est - len(seen)) / len(seen) < 0.30


def test_holt_winters_python_replay_including_negative_trend(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.timeseries import (
        holt_winters_level_trend,
    )

    base = dt.datetime(2024, 3, 1, 12)
    rows, eid = [], 0
    # strictly DECREASING series: the trend recurrence goes negative, which
    # is exactly where Python floor-div and DuckDB trunc-div diverge
    for d in range(14):
        rows.append((eid, base + dt.timedelta(days=d), 1, "drop", 500.0 - 30.0 * d))
        eid += 1
    path = _write_events(spark, tmp_path, rows)

    row = holt_winters_level_trend(spark, path).collect()[0]

    xs = [math.floor((500.0 - 30.0 * d) * 1000) for d in range(14)]
    level, trend = xs[0], 0
    for x in xs[1:]:
        prev = level
        level = _tdiv(x + 3 * (level + trend), 4)
        trend = _tdiv((level - prev) + 7 * trend, 8)
    assert trend < 0  # the planted decrease reached the trend term
    assert (row["n_days"], row["level_milli"], row["trend_milli"],
            row["forecast_milli"]) == (14, level, trend, level + trend)


def test_asof_join_forward_python_replay(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.timeseries import (
        asof_join_forward,
    )

    rng = random.Random(8)
    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for u in range(1, 13):
        for _ in range(rng.randint(0, 14)):
            ts = base + dt.timedelta(seconds=rng.randint(0, 200_000))
            rows.append((eid, ts, u, rng.choice(["click", "purchase", "view"]), 1.0))
            eid += 1
    # planted: purchase with a click at the SAME instant (inclusive) plus
    # an earlier click (must NOT match); two clicks at one later instant
    # for a second purchase (min-event_id tie-break)
    t0 = base + dt.timedelta(seconds=500)
    t1 = base + dt.timedelta(seconds=900)
    rows += [
        (eid, t0 - dt.timedelta(seconds=50), 99, "click", 1.0),      # before: no
        (eid + 1, t0, 99, "purchase", 1.0),
        (eid + 2, t0, 99, "click", 1.0),                              # same instant
        (eid + 3, t1, 98, "purchase", 1.0),
        (eid + 4, t1 + dt.timedelta(seconds=7), 98, "click", 1.0),
        (eid + 5, t1 + dt.timedelta(seconds=7), 98, "click", 1.0),    # tie: min id
        (eid + 6, base + dt.timedelta(days=30), 97, "purchase", 1.0), # no later click
    ]
    path = _write_events(spark, tmp_path, rows)

    got = {r["event_id"]: (r["click_us"], r["click_event_id"], r["lead_us"])
           for r in asof_join_forward(spark, path).collect()}

    by_user = {}
    for e, ts, u, t, _ in rows:
        if t == "click":
            by_user.setdefault(u, []).append((ts, e))
    expect = {}
    for e, ts, u, t, _ in rows:
        if t != "purchase":
            continue
        cands = [(cts, ce) for cts, ce in by_user.get(u, []) if cts >= ts]
        if not cands:
            continue
        cts, ce = min(cands)  # earliest ts, then min event_id
        us = lambda x: int(x.timestamp() * 1_000_000)
        expect[e] = (us(cts), ce, us(cts) - us(ts))
    assert got == expect and got
    assert expect[eid + 1] == (int(t0.timestamp() * 1e6), eid + 2, 0)
    assert expect[eid + 3][1] == eid + 4  # min-id tie-break
    assert eid + 6 not in expect


def test_ks_two_sample_python_replay(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import ks_two_sample

    rng = random.Random(9)
    base = dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    # clicks ~ lattice 0..100 (quarters), purchases shifted +10: a real gap,
    # plus shared values so the pooled support has cross-group duplicates
    for _ in range(400):
        rows.append((eid, base, 1, "click", rng.randint(0, 400) / 4.0)); eid += 1
    for _ in range(300):
        rows.append((eid, base, 1, "purchase", 10.0 + rng.randint(0, 400) / 4.0)); eid += 1
    path = _write_events(spark, tmp_path, rows)

    row = ks_two_sample(spark, path).collect()[0]

    c1, c2 = {}, {}
    for _e, _ts, _u, t, v in rows:
        m = math.floor(v * 1000)
        (c1 if t == "click" else c2)[m] = (c1 if t == "click" else c2).get(m, 0) + 1
    n1, n2 = sum(c1.values()), sum(c2.values())
    support = sorted(set(c1) | set(c2))
    cum1 = cum2 = 0
    maxd = 0
    for v in support:
        cum1 += c1.get(v, 0)
        cum2 += c2.get(v, 0)
        maxd = max(maxd, abs(cum1 * n2 - cum2 * n1))
    assert (row["n1"], row["n2"], row["max_cross_diff"]) == (n1, n2, maxd)
    assert row["ks_ppm"] == maxd * 1_000_000 // (n1 * n2)
    assert row["ks_ppm"] > 50_000  # the planted shift is detected


def test_spearman_daily_perfect_monotone_and_ties(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import spearman_daily

    base = dt.datetime(2024, 3, 1, 12)
    rows, eid = [], 0
    # clicks strictly increasing by day; purchases strictly DECREASING:
    # perfect inverse rank order -> rho exactly -1
    for d in range(10):
        rows.append((eid, base + dt.timedelta(days=d), 1, "click", 10.0 + d)); eid += 1
        rows.append((eid, base + dt.timedelta(days=d), 1, "purchase", 90.0 - d)); eid += 1
    path = _write_events(spark, tmp_path, rows)
    row = spearman_daily(spark, path).collect()[0]
    n = 10
    # perfect inverse: sum d^2 = n(n^2-1)/3, doubled ranks -> *4
    assert row["n_days"] == n
    assert row["d2_sum4"] == 4 * n * (n * n - 1) // 3
    assert row["rho_ppm"] == 1_000_000 - 2_000_000  # exactly -1


def test_spearman_daily_average_ranks_on_ties(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import spearman_daily

    base = dt.datetime(2024, 3, 1, 12)
    rows, eid = [], 0
    xs = [5.0, 5.0, 7.0, 9.0]   # tie in x
    ys = [1.0, 2.0, 3.0, 4.0]
    for d, (x, y) in enumerate(zip(xs, ys)):
        rows.append((eid, base + dt.timedelta(days=d), 1, "click", x)); eid += 1
        rows.append((eid, base + dt.timedelta(days=d), 1, "purchase", y)); eid += 1
    path = _write_events(spark, tmp_path, rows)
    row = spearman_daily(spark, path).collect()[0]
    # doubled average ranks: x -> [3,3,6,8] (avg rank 1.5 for the tie),
    # y -> [2,4,6,8]; d2_sum4 = 1+1+0+0 = 2
    assert row["n_days"] == 4 and row["d2_sum4"] == 2
    assert row["rho_ppm"] == 1_000_000 - 6 * 2 * 1_000_000 // (4 * 4 * 15)


def test_autocorr_lag_python_replay(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.timeseries import autocorr_lag

    base = dt.datetime(2024, 3, 1, 12)
    rows, eid = [], 0
    # alternating high/low daily totals: ACF(1) negative, ACF(2) positive
    vals = [1000.0 if d % 2 == 0 else 200.0 for d in range(16)]
    for d, v in enumerate(vals):
        rows.append((eid, base + dt.timedelta(days=d), 1, "click", v)); eid += 1
    path = _write_events(spark, tmp_path, rows)

    got = {r["lag"]: (r["n_pairs"], r["num"], r["r2_micro"], r["r_sign"])
           for r in autocorr_lag(spark, path).collect()}

    series = [math.floor(v * 1000) // 1000 for v in vals]
    for lag in (1, 2, 3):
        pairs = [(series[i], series[i + lag]) for i in range(len(series) - lag)]
        n = len(pairs)
        sx = sum(p[0] for p in pairs); sy = sum(p[1] for p in pairs)
        sxx = sum(p[0] * p[0] for p in pairs)
        syy = sum(p[1] * p[1] for p in pairs)
        sxy = sum(p[0] * p[1] for p in pairs)
        num = n * sxy - sx * sy
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        r2 = num * num * 1_000_000 // (vx * vy)
        sign = (num > 0) - (num < 0)
        assert got[lag] == (n, num, r2, sign)
    assert got[1][3] == -1 and got[2][3] == 1


def test_lift_gains_value_deciles_python_replay(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        lift_gains_value_deciles,
    )

    rng = random.Random(11)
    base = dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    for u in range(1, 61):
        n_purch = rng.randint(0, 20)
        for i in range(n_purch):
            rows.append((eid, base + dt.timedelta(hours=i), u, "purchase",
                         rng.randint(1, 400) / 4.0))
            eid += 1
        for i in range(rng.randint(0, 5)):
            rows.append((eid, base + dt.timedelta(hours=i), u, "click",
                         rng.randint(1, 400) / 4.0))
            eid += 1
    path = _write_events(spark, tmp_path, rows)

    got = {r["decile"]: (r["n"], r["n_conv"], r["cum_n"], r["cum_conv"],
                         r["gain_ppm"], r["lift_ppm"])
           for r in lift_gains_value_deciles(spark, path).collect()}

    users = {}
    for _e, _ts, u, t, v in rows:
        s, np_ = users.get(u, (0, 0))
        users[u] = (s + math.floor(v * 1000), np_ + (1 if t == "purchase" else 0))
    recs = [(s, 1 if np_ >= 14 else 0) for s, np_ in users.values()]
    n = len(recs)
    asc = sorted(s for s, _ in recs)
    bounds = [asc[n - (k * n + 9) // 10 + 1 - 1] for k in range(1, 10)]
    per = {}
    for s, conv in recs:
        d = 1 + sum(1 for c in bounds if s < c)
        cnt, cv = per.get(d, (0, 0))
        per[d] = (cnt + 1, cv + conv)
    total_n = sum(c for c, _ in per.values())
    total_c = sum(c for _, c in per.values())
    cum_n = cum_c = 0
    expect = {}
    for d in sorted(per):
        cnt, cv = per[d]
        cum_n += cnt; cum_c += cv
        expect[d] = (cnt, cv, cum_n, cum_c,
                     cum_c * 1_000_000 // total_c,
                     cum_c * total_n * 1_000_000 // (cum_n * total_c))
    assert got == expect and len(got) >= 8


def test_k_anonymity_profile_planted_unique_record(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.quality import (
        k_anonymity_profile,
    )

    path = str(tmp_path / "docs")
    rows = []
    # class A: (en, web, bucket 1) x 6 rows; class B: (fr, web, bucket 2) x 3;
    # class C: a single unique record
    for i in range(6):
        rows.append((i, "t", "en", "web", 150))
    for i in range(6, 9):
        rows.append((i, "t", "fr", "web", 250))
    rows.append((9, "t", "de", "api", 999))
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(f"{path}/documents.parquet")

    row = k_anonymity_profile(spark, path).collect()[0]
    assert (row["n_classes"], row["n_rows"]) == (3, 10)
    assert row["k_anonymity"] == 1          # the planted unique record
    assert row["rows_at_risk"] == 4         # class B (3) + unique (1)
    assert row["classes_at_risk"] == 2
    assert row["unique_records"] == 1


def test_l_diversity_events_planted_leaky_class(spark, tmp_path):
    import datetime as dt
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.quality import (
        l_diversity_events,
    )

    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows, eid = [], 0
    # class (click, 10h): 5 rows all the SAME user -> l = 1 (leaky)
    for _ in range(5):
        rows.append((eid, base, 7, "click", 1.0)); eid += 1
    # class (click, 11h): 6 rows over 4 users -> l = 4
    for u in (1, 2, 3, 4, 1, 2):
        rows.append((eid, base + dt.timedelta(hours=1), u, "click", 1.0)); eid += 1
    path = _write_events(spark, tmp_path, rows)

    row = l_diversity_events(spark, path).collect()[0]
    assert (row["n_classes"], row["n_rows"]) == (2, 11)
    assert row["l_diversity"] == 1
    assert row["rows_at_risk"] == 5 and row["classes_at_risk"] == 1


def test_equidepth_2pass_value_ties_never_split(spark, tmp_path):
    """The variant's tie contract: rows with equal milli values always land
    in ONE bucket (value semantics — the documented difference from NTILE,
    which splits ties positionally), and boundaries are the exact
    rank-ceil(k*n/B) elements."""
    import datetime as dt
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        equidepth_histogram_2pass,
        HIST_BUCKETS,
    )

    base = dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    # 40 rows of a single massively-tied value (5.0) + 24 distinct values:
    # the tie block spans several would-be NTILE buckets
    for _ in range(40):
        rows.append((eid, base, 1, "click", 5.0)); eid += 1
    for i in range(24):
        rows.append((eid, base, 1, "click", 10.0 + i)); eid += 1
    path = _write_events(spark, tmp_path, rows)

    got = {r["bucket"]: (r["n"], r["lo"], r["hi"])
           for r in equidepth_histogram_2pass(spark, path).collect()}

    # python replay of the definition
    vals = sorted(math.floor(v * 1000) for _e, _ts, _u, _t, v in rows)
    n, B = len(vals), HIST_BUCKETS
    bounds = [vals[(k * n + B - 1) // B - 1] for k in range(1, B)]
    per = {}
    raw = sorted(v for _e, _ts, _u, _t, v in rows)
    for v in raw:
        m = math.floor(v * 1000)
        b = 1 + sum(1 for c in bounds if m > c)
        cnt, lo, hi = per.get(b, (0, None, None))
        per[b] = (cnt + 1, v if lo is None else min(lo, v),
                  v if hi is None else max(hi, v))
    assert got == per
    # all 40 tied rows share one bucket
    tied_buckets = [b for b, (c, lo, hi) in got.items() if lo <= 5.0 <= hi]
    assert len(tied_buckets) == 1 and got[tied_buckets[0]][0] >= 40


def test_pettitt_changepoint_finds_planted_level_shift(spark, tmp_path):
    """A planted step (level 100 for days 0-9, level 900 for days 10-19)
    must put the changepoint at the step (cut index 10) with the maximal
    |U|, replayed against the O(n^2) definition."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        pettitt_changepoint,
    )

    base = dt.datetime(2024, 3, 1, 12)
    rows, eid = [], 0
    for d in range(20):
        v = 100.0 if d < 10 else 900.0
        rows.append((eid, base + dt.timedelta(days=d), 1, "click", v)); eid += 1
    path = _write_events(spark, tmp_path, rows)

    row = pettitt_changepoint(spark, path).collect()[0]

    xs = [math.floor((100.0 if d < 10 else 900.0) * 1000) for d in range(20)]
    n = len(xs)

    def sgn(a):
        return (a > 0) - (a < 0)

    us = {
        t: sum(sgn(xs[i] - xs[j]) for i in range(t) for j in range(t, n))
        for t in range(1, n)
    }
    best_t = min(us, key=lambda t: (-abs(us[t]), t))
    assert (row["cp_index"], row["u_at_cp"], row["u_abs"]) == (
        best_t, us[best_t], abs(us[best_t]))
    assert best_t == 10 and abs(us[best_t]) == 100  # 10*10 cross pairs
    # cp_day = the LAST day of the pre-change segment (cut t sits between
    # day t and day t+1): days 0-9 are the low level, so day index 9
    assert row["cp_day"].isoformat() == "2024-03-10"
