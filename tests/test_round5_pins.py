"""Independent-truth pins for the round-5 gates: each gate replayed against
a plain-Python implementation of its DEFINITION on randomized (fixed-seed)
planted fixtures — the same double-entry bookkeeping the DuckDB oracles
provide, but engine-free, so a shared misreading of the semantics can't
pass both sides."""

from __future__ import annotations

import datetime as dt
import random

import pytest


def _write_events(spark, tmp_path, rows, cols=("event_id", "ts", "user_id", "event_type", "value")):
    path = str(tmp_path / "ev")
    spark.createDataFrame(rows, list(cols)).write.parquet(f"{path}/events.parquet")
    return path


def test_asof_join_nearest_python_replay(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.timeseries import (
        asof_join_nearest,
    )

    rng = random.Random(5)
    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for u in range(1, 13):
        for _ in range(rng.randint(0, 14)):
            ts = base + dt.timedelta(seconds=rng.randint(0, 200_000))
            rows.append((eid, ts, u, rng.choice(["click", "purchase", "view"]), 1.0))
            eid += 1
    # planted edge cases: click and purchase at the SAME instant (inclusive
    # match) and two clicks at one instant (max-event_id tie-break)
    t0 = base + dt.timedelta(seconds=999)
    rows += [(eid, t0, 99, "click", 1.0), (eid + 1, t0, 99, "click", 1.0),
             (eid + 2, t0, 99, "purchase", 1.0)]
    path = _write_events(spark, tmp_path, rows)

    got = {
        r["event_id"]: (r["click_us"], r["click_event_id"], r["gap_us"])
        for r in asof_join_nearest(spark, path).collect()
    }

    # definitional replay: latest click at-or-before, same-(user,ts) clicks
    # collapse to the max event_id
    clicks = {}
    for e, ts, u, t, _ in rows:
        if t == "click":
            key = (u, ts)
            clicks[key] = max(clicks.get(key, -1), e)
    by_user = {}
    for (u, ts), e in clicks.items():
        by_user.setdefault(u, []).append((ts, e))
    expect = {}
    for e, ts, u, t, _ in rows:
        if t != "purchase":
            continue
        cands = [(cts, ce) for cts, ce in by_user.get(u, []) if cts <= ts]
        if not cands:
            continue
        cts, ce = max(cands)  # latest ts; unique per (user, ts) after collapse
        us = lambda x: int(x.timestamp() * 1_000_000)
        expect[e] = (us(cts), ce, us(ts) - us(cts))
    assert got == expect and got  # non-vacuous
    # planted same-instant case: inclusive match, max-event_id tie-break
    assert expect[eid + 2][1] == eid + 1 and expect[eid + 2][2] == 0


def test_rolling_median_7d_python_replay(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.timeseries import (
        rolling_median_7d,
    )

    rng = random.Random(7)
    rows, eid = [], 0
    daily = {}
    for d in range(20):
        if rng.random() < 0.15:
            continue  # day gaps: ROWS frame must skip them, not zero-fill
        day = dt.datetime(2024, 1, 1 + d)
        v = rng.randint(1, 500) / 10.0
        rows.append((eid, day, 1, "click", v))
        daily[day.date()] = daily.get(day.date(), 0) + int(v * 1000 // 1)
        eid += 1
    path = _write_events(spark, tmp_path, rows)

    got = {
        r["day"]: (r["n_obs"], r["med_x2_milli"])
        for r in rolling_median_7d(spark, path).collect()
    }
    days = sorted(daily)
    for i, day in enumerate(days):
        window = [daily[d] for d in days[max(0, i - 6) : i + 1]]
        s = sorted(window)
        n = len(s)
        med_x2 = 2 * s[n // 2] if n % 2 == 1 else s[n // 2 - 1] + s[n // 2]
        assert got[day] == (n, med_x2), f"{day}: {got[day]} vs ({n}, {med_x2})"


def test_cumulative_distinct_users_python_replay(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.timeseries import (
        cumulative_distinct_users,
    )

    rng = random.Random(11)
    rows = [
        (i, dt.datetime(2024, 1, rng.randint(1, 15), rng.randint(0, 23)), rng.randint(1, 20), "view", 1.0)
        for i in range(200)
    ]
    path = _write_events(spark, tmp_path, rows)
    got = {r["day"]: (r["new_users"], r["cum_users"])
           for r in cumulative_distinct_users(spark, path).collect()}

    seen: set[int] = set()
    by_day: dict[dt.date, set[int]] = {}
    for _, ts, u, _, _ in rows:
        by_day.setdefault(ts.date(), set()).add(u)
    for day in sorted(by_day):
        new = by_day[day] - seen
        seen |= by_day[day]
        assert got[day] == (len(new), len(seen))


def test_seasonal_baseline_dev_python_replay(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.timeseries import (
        seasonal_baseline_dev,
    )

    rng = random.Random(13)
    rows = [
        (i, dt.datetime(2024, 1, rng.randint(1, 28), rng.randint(0, 23)),
         1, rng.choice(["click", "view"]), 1.0)
        for i in range(300)
    ]
    path = _write_events(spark, tmp_path, rows)
    got = {(r["event_type"], r["day"]): (r["wd"], r["n"], r["base_num"], r["base_den"], r["dev_num"])
           for r in seasonal_baseline_dev(spark, path).collect()}

    n: dict[tuple, int] = {}
    for _, ts, _, t, _ in rows:
        n[(t, ts.date())] = n.get((t, ts.date()), 0) + 1
    base: dict[tuple, list[int]] = {}
    for (t, day), c in n.items():
        wd = day.isoweekday() % 7 + 1  # Spark dayofweek: Sun=1..Sat=7
        base.setdefault((t, wd), []).append(c)
    for (t, day), c in n.items():
        wd = day.isoweekday() % 7 + 1
        bn, bd = sum(base[(t, wd)]), len(base[(t, wd)])
        assert got[(t, day)] == (wd, c, bn, bd, c * bd - bn)


def test_ab_proportion_test_python_replay(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        ab_proportion_test,
    )

    rng = random.Random(17)
    rows, eid = [], 0
    conv = {}
    for u in range(1, 41):
        k = rng.randint(5, 25)  # purchases straddle the >=14 conversion bar
        conv[u] = 1 if k >= 14 else 0
        for _ in range(k):
            rows.append((eid, dt.datetime(2024, 1, 1 + eid % 20), u, "purchase", 1.0))
            eid += 1
        rows.append((eid, dt.datetime(2024, 1, 2), u, "view", 1.0))
        eid += 1
    path = _write_events(spark, tmp_path, rows)

    r = ab_proportion_test(spark, path).collect()[0]
    na = sum(1 for u in conv if u % 2 == 0)
    nb = sum(1 for u in conv if u % 2 == 1)
    ca = sum(conv[u] for u in conv if u % 2 == 0)
    cb = sum(conv[u] for u in conv if u % 2 == 1)
    num = (ca * nb - cb * na) ** 2 * (na + nb) * 10**6
    den = na * nb * (ca + cb) * (na + nb - ca - cb)
    assert (r["n_a"], r["n_b"], r["conv_a"], r["conv_b"]) == (na, nb, ca, cb)
    assert r["z2_micro"] == num // den
    # cross-check the statistic against the float formula (binomial z^2)
    pa, pb, p = ca / na, cb / nb, (ca + cb) / (na + nb)
    z2 = (pa - pb) ** 2 / (p * (1 - p) * (1 / na + 1 / nb))
    assert abs(r["z2_micro"] / 1e6 - z2) < 1e-5


def test_mad_outliers_python_replay(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        mad_outliers,
    )
    import statistics

    rng = random.Random(19)
    rows, eid = [], 0
    daily = {}
    for d in range(25):
        day = dt.datetime(2024, 1, 1) + dt.timedelta(days=d)
        v = rng.randint(50, 80) / 1.0
        if d in (5, 17):  # planted spikes: the gate must flag SOMETHING
            v = 5000.0
        rows.append((eid, day, 1, "click", v))
        daily[day.date()] = int(v * 1000)
        eid += 1
    path = _write_events(spark, tmp_path, rows)

    got = {r["day"]: (r["med_x2"], r["mad_x4"], r["is_outlier"])
           for r in mad_outliers(spark, path).collect()}
    xs = list(daily.values())
    med_x2 = int(2 * statistics.median(xs))
    devs = [abs(2 * x - med_x2) for x in xs]
    mad_x4 = int(2 * statistics.median(devs))
    flagged = set()
    for day, x in daily.items():
        out = 1 if 2 * abs(2 * x - med_x2) > 3 * mad_x4 else 0
        assert got[day] == (med_x2, mad_x4, out)
        if out:
            flagged.add(day)
    assert flagged == {dt.date(2024, 1, 6), dt.date(2024, 1, 18)}


def test_editdist_topk_python_replay(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.text import (
        editdist_topk,
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = random.Random(23)
    alphabet = "abcdef"
    names = {k: "".join(rng.choice(alphabet) for _ in range(rng.randint(4, 9)))
             for k in range(1, 300)}
    path = str(tmp_path / "cust")
    spark.createDataFrame(
        [(k, v) for k, v in names.items()], ["c_custkey", "c_name"]
    ).write.parquet(f"{path}/customer.parquet")

    got = {}
    for r in editdist_topk(spark, path).collect():
        got.setdefault(r["probe_key"], []).append((r["rank"], r["match_key"], r["dist"]))
    probes = [k for k in names if k % 97 == 0]
    assert probes and set(got) == set(probes)
    for pk in probes:
        cands = sorted(
            (lev(names[pk], names[k]), k) for k in names if k != pk
        )[:3]
        expect = [(i + 1, k, d) for i, (d, k) in enumerate(cands)]
        assert sorted(got[pk]) == expect, f"probe {pk}: {sorted(got[pk])} vs {expect}"


def test_pca_power_iteration_python_replay(spark):
    """pca_power_iteration replays exactly under an independent plain-Python
    integer implementation of the same 3-round matrix-free recurrence
    (arbitrary-precision ints, so the DECIMAL(38,0) path is cross-checked
    against true integer arithmetic). Convergence-to-eigenvector is NOT
    pinned: the synthetic embeddings' top two eigenvalues are near-degenerate
    (ratio ~1.02), so 3 rounds gate the ITERATION PRIMITIVE, not the limit."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.similarity import (
        PCA_ITERS,
        _PCA_V_SCALE,
        pca_power_iteration,
    )

    sf_dir = os.path.join(
        os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.01"
    )
    got = {
        r["dim"]: r["component"] for r in pca_power_iteration(spark, sf_dir).collect()
    }

    E = np.array(
        pq.read_table(f"{sf_dir}/embeddings.parquet")["embedding"].to_pylist(),
        dtype=np.float64,
    )
    Q = np.floor(E * 1_000_000).astype(object)  # python ints: no overflow
    d = Q.shape[1]

    def floordiv(a: int, b: int) -> int:
        return a // b if a >= 0 else -((-a + b - 1) // b)

    v = [_PCA_V_SCALE] * d
    for _ in range(PCA_ITERS):
        dots = Q @ np.array(v, dtype=object)
        w = Q.T @ dots
        m = max(abs(int(x)) for x in w)
        v = [floordiv(int(x) * _PCA_V_SCALE, m) for x in w]
    assert got == {i: v[i] for i in range(d)}


def test_ols_two_features_matches_numpy_lstsq(spark):
    """The exact Cramer-determinant coefficients agree with numpy's
    float least-squares on the same daily design matrix (micro-truncation
    tolerance) — the gate's integer algebra is cross-checked against an
    entirely independent solver."""
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import pandas as pd

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        ols_two_features,
    )

    sf_dir = os.path.join(
        os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.01"
    )
    r = ols_two_features(spark, sf_dir).collect()[0]

    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev = ev[ev.user_id.notna()]
    ev["day"] = pd.to_datetime(ev.ts).dt.date
    g = ev.groupby(["event_type", "day"])
    daily = pd.DataFrame(
        {
            "x1": g.size(),
            "x2": g.user_id.nunique(),
            "y": g.value.apply(lambda s: int(np.floor(s.dropna() * 1000).sum())),
        }
    ).reset_index()
    X = np.column_stack([np.ones(len(daily)), daily.x1, daily.x2]).astype(float)
    beta, *_ = np.linalg.lstsq(X, daily.y.astype(float), rcond=None)
    assert r["n_rows"] == len(daily)
    for got_micro, want in zip((r["b0_micro"], r["b1_micro"], r["b2_micro"]), beta):
        assert abs(got_micro / 1e6 - want) <= max(1e-4 * abs(want), 2e-6), (
            got_micro / 1e6,
            want,
        )


def test_winsorized_stats_python_replay(spark, tmp_path):
    """Winsorization replayed in plain Python: exact rank-interpolated
    [p05, p95] bounds in 20ths, clamped sums, clip counts — with planted
    extreme days that MUST clip."""
    rng = random.Random(29)
    rows, daily, eid = [], {}, 0
    for d in range(30):
        day = dt.datetime(2024, 1, 1) + dt.timedelta(days=d)
        v = rng.randint(40, 60) * 1.0
        if d == 3:
            v = 9000.0  # must clip high
        if d == 27:
            v = 0.001  # must clip low (milli floor -> 0)
        rows.append((eid, day, 1, "click", v))
        daily[day.date()] = int(v * 1000)
        eid += 1
    path = _write_events(spark, tmp_path, rows)

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        winsorized_stats,
    )

    r = {x["event_type"]: x for x in winsorized_stats(spark, path).collect()}["click"]
    xs = sorted(daily.values())
    n = len(xs)

    def bound20(k):
        i, rem = (n - 1) * k // 20, (n - 1) * k % 20
        nxt = xs[i + 1] if i + 1 < n else 0
        return (20 - rem) * xs[i] + rem * nxt

    lo20, hi20 = bound20(1), bound20(19)
    c20s = [min(max(20 * x, lo20), hi20) for x in daily.values()]
    clipped = sum(1 for x in daily.values() if 20 * x < lo20 or 20 * x > hi20)
    assert (r["n_days"], r["lo20"], r["hi20"]) == (n, lo20, hi20)
    assert r["winsorized_sum20"] == sum(c20s)
    assert r["n_clipped"] == clipped and clipped >= 2


def test_exact_median_2pass_python_replay(spark, tmp_path):
    """The histogram-route + bin-rescan quantile picks EXACTLY the k-th
    smallest element on adversarial distributions: heavy duplicate runs
    that straddle bin boundaries, a constant group (mx == mn: one bin),
    and a two-point group."""
    rng = random.Random(31)
    rows, eid = [], 0
    groups = {
        "dups": [5.0] * 40 + [5.001] * 40 + [9000.0] * 21,  # duplicate walls
        "const": [7.0] * 15,                                  # mx == mn
        "twopoint": [1.0] * 9 + [2.0] * 4,
    }
    groups["rand"] = [rng.randint(0, 10_000) / 10.0 for _ in range(301)]
    for etype, vals in groups.items():
        for v in vals:
            day = dt.datetime(2024, 1, 1 + eid % 28)
            rows.append((eid, day, 1, etype, v))
            eid += 1
    path = _write_events(spark, tmp_path, rows)

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        exact_median_2pass,
    )

    got = {
        r["event_type"]: (r["n"], r["median_milli"], r["p90_milli"])
        for r in exact_median_2pass(spark, path).collect()
    }
    for etype, vals in groups.items():
        xs = sorted(int(v * 1000 // 1) for v in vals)
        n = len(xs)
        med = xs[(n + 1) // 2 - 1]
        p90 = xs[(n * 9 + 9) // 10 - 1]
        assert got[etype] == (n, med, p90), (etype, got[etype], (n, med, p90))


def test_golden_record_merge_planted_clusters(spark, tmp_path):
    """Survivorship rules on PLANTED clusters: word-reordered members
    collapse to one bow cluster; text comes from the longest member,
    lang from the majority (tie -> lexicographic min), source from the
    minimum, n_chars from the max — each from a DIFFERENT member."""
    rows = [
        # cluster A: same DISTINCT word set (repeats don't change it);
        # doc 2 longest, langs en/de/en -> majority en,
        # sources src3/src1/src2 -> min src1, n_chars 10/99/50 -> 99
        (1, "alpha beta gamma", "en", "src3", 10),
        (2, "gamma alpha beta beta alpha gamma", "de", "src1", 99),
        (3, "beta gamma alpha", "en", "src2", 50),
        # cluster B: equal-length texts -> text from min doc_id (4);
        # lang vote ties de/en -> lexicographic min 'de'
        (4, "delta epsilon", "de", "srcB", 7),
        (5, "epsilon delta", "en", "srcA", 8),
        # singleton: filtered out (n_members >= 2)
        (6, "zeta", "en", "src0", 4),
    ]
    path = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(f"{path}/documents.parquet")

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.dedup import (
        golden_record_merge,
    )

    got = {
        r["golden_id"]: (
            r["n_members"], r["text_from"], r["golden_lang"],
            r["golden_source"], r["golden_n_chars"],
        )
        for r in golden_record_merge(spark, path).collect()
    }
    assert set(got) == {1, 4}
    assert got[1] == (3, 2, "en", "src1", 99)  # longest text is doc 2
    assert got[4] == (2, 4, "de", "srcA", 8)   # length tie -> min doc_id; lang tie -> min 'de'


def test_lift_gains_table_python_replay(spark, tmp_path):
    """Lift/gains replayed in plain Python on a planted cohort where high
    spenders convert: decile 1 must concentrate conversions (lift > 1e6
    ppm) and the cumulative gains must reach exactly 1e6 at decile 10."""
    rng = random.Random(37)
    rows, eid = [], 0
    users = {}
    for u in range(1, 51):
        k = rng.randint(5, 25)
        spend = 0
        for _ in range(k):
            v = (100.0 if k >= 14 else 10.0) + rng.randint(0, 99) / 10.0
            rows.append((eid, dt.datetime(2024, 1, 1 + eid % 20), u, "purchase", v))
            spend += int(v * 1000 // 1)
            eid += 1
        users[u] = (spend, 1 if k >= 14 else 0)
    path = _write_events(spark, tmp_path, rows)

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        lift_gains_table,
    )

    got = {
        r["decile"]: (r["n"], r["n_conv"], r["cum_n"], r["cum_conv"],
                      r["gain_ppm"], r["lift_ppm"])
        for r in lift_gains_table(spark, path).collect()
    }

    order = sorted(users, key=lambda u: (-users[u][0], u))
    N, C = len(order), sum(users[u][1] for u in order)
    # NTILE semantics: first (N mod 10) deciles get ceil(N/10)
    base, extra = divmod(N, 10)
    expect, idx = {}, 0
    cum_n = cum_c = 0
    for d in range(1, 11):
        size = base + (1 if d <= extra else 0)
        conv = sum(users[u][1] for u in order[idx : idx + size])
        idx += size
        cum_n += size
        cum_c += conv
        expect[d] = (
            size, conv, cum_n, cum_c,
            cum_c * 10**6 // C,
            cum_c * N * 10**6 // (cum_n * C),
        )
    assert got == expect
    assert got[1][5] > 10**6  # decile 1 concentrates conversions
    assert got[10][4] == 10**6


def test_kaplan_meier_python_replay(spark, tmp_path):
    """KM estimator replayed in plain Python on a planted cohort with known
    event/censor times — the survival curve must be the exact fixed-point
    product over the hand-computed risk table, monotone nonincreasing."""
    rows, eid = [], 0
    # 6 users: clicks on day 1; purchases after 1,1,3 days; 3 censored
    # (study end = day 10 via a view event)
    plan = {1: 1, 2: 1, 3: 3, 4: None, 5: None, 6: None}
    for u, d in plan.items():
        rows.append((eid, dt.datetime(2024, 1, 1, 8), u, "click", 1.0)); eid += 1
        if d is not None:
            rows.append((eid, dt.datetime(2024, 1, 1 + d, 9), u, "purchase", 1.0)); eid += 1
    rows.append((eid, dt.datetime(2024, 1, 11), 99, "view", 1.0))  # no click: excluded
    path = _write_events(spark, tmp_path, rows)

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        kaplan_meier_survival,
    )

    got = {r["t_days"]: (r["n_risk"], r["d_events"], r["s_micro"])
           for r in kaplan_meier_survival(spark, path).collect()}
    # durations: events at 1 (x2), 3 (x1); censored at 10 (x3)
    # risk: t=1 -> n=6, d=2; t=3 -> n=4, d=1
    s1 = 1_000_000 * (6 - 2) // 6
    s3 = s1 * (4 - 1) // 4
    assert got == {1: (6, 2, s1), 3: (4, 1, s3)}
    assert s1 > s3  # monotone decreasing
