"""Independent-truth pins for the round-7 gates: each gate replayed against
a plain-Python implementation of its DEFINITION on planted fixed-seed
fixtures — engine-free double-entry bookkeeping, so a shared misreading of
the semantics cannot pass both the Spark side and the DuckDB oracle.

All planted `value` floats are binary-exact (multiples of 0.25/0.5), so
floor(value*1000) is unambiguous across engines and this replay.
"""

from __future__ import annotations

import datetime as dt
import math
import random
from collections import Counter


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


def _w1_replay(click_milli, purch_milli):
    """The W1 definition over integer milli-values: area between the two
    empirical CDFs, carried as the exact integer cross-difference."""
    c1, c2 = Counter(click_milli), Counter(purch_milli)
    support = sorted(set(c1) | set(c2))
    n1, n2 = sum(c1.values()), sum(c2.values())
    cum1 = cum2 = area = 0
    for v, vn in zip(support, support[1:]):
        cum1 += c1.get(v, 0)
        cum2 += c2.get(v, 0)
        area += abs(cum1 * n2 - cum2 * n1) * (vn - v)
    return n1, n2, area, _tdiv(area * 1000, n1 * n2)


def test_wasserstein_matches_definition_on_random_fixture(spark, tmp_path):
    """580 planted values across a wide range (ties, empty buckets,
    cross-bucket support gaps) — the distributed prefix-sum + ledger-lead
    construction must equal the plain single-pass definition exactly."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        wasserstein_1d,
    )

    rng = random.Random(77)
    base = dt.datetime(2024, 5, 1, 9)
    rows, eid = [], 0
    clicks, purchases = [], []
    for _ in range(300):
        v = rng.randrange(0, 2000) * 0.25
        clicks.append(math.floor(v * 1000))
        rows.append((eid, base + dt.timedelta(minutes=eid), 1, "click", v))
        eid += 1
    for _ in range(280):
        v = rng.randrange(0, 2000) * 0.25 + 50.0
        purchases.append(math.floor(v * 1000))
        rows.append((eid, base + dt.timedelta(minutes=eid), 1, "purchase", v))
        eid += 1
    # a third type the gate must ignore
    rows.append((eid, base, 1, "view", 9999.5))
    path = _write_events(spark, tmp_path, rows)

    row = wasserstein_1d(spark, path).collect()[0]
    expect = _w1_replay(clicks, purchases)
    assert (row["n1"], row["n2"], row["area"], row["w1_micro"]) == expect


def test_wasserstein_of_pure_shift_is_the_shift(spark, tmp_path):
    """W1 between a distribution and its +delta shift is exactly delta —
    the analytic property that catches any off-by-one in the gap/cum
    pairing (a max-style or misaligned construction would not return
    delta)."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        wasserstein_1d,
    )

    base = dt.datetime(2024, 5, 1, 9)
    vals = [1.0, 2.5, 2.5, 7.25, 30.0, 30.0, 101.5]
    delta = 10.25
    rows, eid = [], 0
    for v in vals:
        rows.append((eid, base + dt.timedelta(minutes=eid), 1, "click", v))
        eid += 1
        rows.append(
            (eid, base + dt.timedelta(minutes=eid), 1, "purchase", v + delta)
        )
        eid += 1
    path = _write_events(spark, tmp_path, rows)

    row = wasserstein_1d(spark, path).collect()[0]
    # w1_micro is in micro-value units: milli-value * 1000
    assert row["w1_micro"] == math.floor(delta * 1000) * 1000
    assert row["n1"] == row["n2"] == len(vals)


def test_top_value_share_on_planted_concentration(spark, tmp_path):
    """198 rows of 1.0 plus 2 rows of 500.0: n=200 -> ceil(n/100)=2 top
    rows, boundary = 500000 milli, share = 1000000/(198+1000) exactly;
    replayed against the sort-based definition."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        top_value_share,
    )

    base = dt.datetime(2024, 6, 1, 8)
    rows = []
    for i in range(198):
        rows.append((i, base + dt.timedelta(minutes=i), 1, "click", 1.0))
    rows.append((198, base, 1, "purchase", 500.0))
    rows.append((199, base, 1, "purchase", 500.0))
    path = _write_events(spark, tmp_path, rows)

    row = top_value_share(spark, path).collect()[0]

    milli = sorted(math.floor(v * 1000) for *_x, v in rows)
    n = len(milli)
    boundary = milli[n - _tdiv(n + 99, 100)]  # asc rank n - ceil(n/100) + 1
    top = [v for v in milli if v >= boundary]
    assert (
        row["n_rows"],
        row["p99_boundary_milli"],
        row["n_top"],
        row["total_milli"],
        row["top_milli"],
        row["share_ppm"],
    ) == (
        n,
        boundary,
        len(top),
        sum(milli),
        sum(top),
        _tdiv(sum(top) * 1_000_000, sum(milli)),
    )
    assert row["n_top"] == 2 and row["p99_boundary_milli"] == 500000


def test_t_closeness_flags_planted_skewed_class(spark, tmp_path):
    """Three days over two sensitive values: two balanced days matching the
    global mix and one fully-skewed day. The skewed day's EMD must match
    the hand-computed t and be the (only) class over the 0.2 threshold."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.quality import (
        t_closeness_profile,
    )

    base = dt.datetime(2024, 7, 1, 10)
    rows, eid = [], 0
    plan = {  # day -> {type: count}
        0: {"click": 5, "purchase": 5},
        1: {"click": 5, "purchase": 5},
        2: {"click": 10, "purchase": 0},
    }
    for d, mix in plan.items():
        for t, c in mix.items():
            for _ in range(c):
                rows.append(
                    (eid, base + dt.timedelta(days=d, seconds=eid), 1, t, 1.0)
                )
                eid += 1
    path = _write_events(spark, tmp_path, rows)

    row = t_closeness_profile(spark, path).collect()[0]

    # python replay of the definition (m=2 sensitive values, lexical order)
    big_n, m = 30, 2
    g_click = 20
    t_ppms = []
    for d, mix in plan.items():
        n_c = sum(mix.values())
        # cumulative over ('click', 'purchase'): only the 'click' prefix
        # contributes (the full-cum term is always 0)
        term = abs(mix["click"] * big_n - g_click * n_c)
        # the 'purchase' cum term: |n_c*N - N*n_c| = 0
        t_ppms.append(_tdiv(term * 1_000_000, (m - 1) * n_c * big_n))
    assert row["n_classes"] == 3
    assert row["max_t_ppm"] == max(t_ppms)
    assert row["classes_at_risk"] == sum(1 for t in t_ppms if t > 200000) == 1
    assert row["rows_at_risk"] == 10


def test_cohort_overlap_jaccard_on_planted_days(spark, tmp_path):
    """Day1 {1,2,3}, day2 {2,3,4,5}, day3 {9}: the day1 row must carry
    inter=2 / jaccard=2/5, the day2 row inter=0 (left-join zero fill), and
    no row exists for day3 (no successor day)."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.extra import (
        cohort_overlap_jaccard,
    )

    base = dt.datetime(2024, 8, 1, 12)
    plan = {0: [1, 2, 3], 1: [2, 3, 4, 5], 2: [9]}
    rows, eid = [], 0
    for d, users in plan.items():
        for u in users:
            # two events per (day, user): the distinct must collapse them
            for _ in range(2):
                rows.append(
                    (eid, base + dt.timedelta(days=d, seconds=eid), u,
                     "click", 1.0)
                )
                eid += 1
    path = _write_events(spark, tmp_path, rows)

    got = {
        r["day"].isoformat(): (
            r["n_day"], r["n_next"], r["n_inter"], r["jaccard_ppm"]
        )
        for r in cohort_overlap_jaccard(spark, path).collect()
    }
    assert got == {
        "2024-08-01": (3, 4, 2, _tdiv(2 * 1_000_000, 5)),
        "2024-08-02": (4, 1, 0, 0),
    }


def test_sessionize_2phase_equals_sessionize_on_boundary_fixture(spark, tmp_path):
    """The segmented formulation must equal the single-window gate row for
    row on a fixture built to stress every boundary case: a session
    CHAINING across three midnights (<=30-min bridges), a bucket whose
    first event starts a fresh session (>30-min bridge), an empty day
    between active days, an exactly-30-minute gap (same session: the rule
    is strictly greater), a multi-session day, and a second user whose
    events interleave in time."""
    import datetime as dt

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.relational import (
        sessionize,
        sessionize_2phase,
    )

    d0 = dt.datetime(2024, 9, 1, 0, 0, 0)

    def at(day, h, m, s=0):
        return dt.datetime(2024, 9, day, h, m, s)

    rows, eid = [], 0
    for u, ts in [
        # user 1: one session chaining across midnights of days 1->2->3
        (1, at(1, 23, 50)),
        (1, at(2, 0, 10)),    # 20 min across the boundary -> same session
        (1, at(2, 12, 0)),    # >30 min inside day 2 -> NEW session
        (1, at(2, 23, 45)),   # >30 min -> NEW session ...
        (1, at(3, 0, 5)),     # ... chaining into day 3 (20 min)
        # user 1: >30-min boundary -> day 4 starts fresh
        (1, at(4, 9, 0)),
        # user 1: empty day 5; day 6 with an exactly-30:00 gap (same
        # session — the rule is strictly greater than 30 min)
        (1, at(6, 10, 0)),
        (1, at(6, 10, 30)),
        (1, at(6, 11, 0, 1)),  # 30:01 -> NEW session
        # user 2 interleaves
        (2, at(1, 23, 55)),
        (2, at(2, 0, 40)),    # 45 min -> NEW session
    ]:
        rows.append((eid, ts, u, "click", 1.0))
        eid += 1
    path = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    ).write.parquet(f"{path}/events.parquet")

    key = lambda r: (r["user_id"], r["session_seq"])  # noqa: E731
    base = {key(r): (r["n_events"], r["session_start"], r["session_end"])
            for r in sessionize(spark, path).collect()}
    seg = {key(r): (r["n_events"], r["session_start"], r["session_end"])
           for r in sessionize_2phase(spark, path).collect()}
    assert seg == base
    # independent truth for user 1: sessions are
    # {23:50, 0:10}, {12:00}, {23:45, 0:05}, {9:00}, {10:00, 10:30}, {11:00:01}
    u1 = sorted((s, v[0]) for (u, s), v in base.items() if u == 1)
    assert u1 == [(1, 2), (2, 1), (3, 2), (4, 1), (5, 2), (6, 1)]


def test_sessionize_2phase_equals_sessionize_on_random_corpus(spark, tmp_path):
    """Randomized equivalence sweep: 2500 events, 12 users, inter-event
    gaps drawn to land on both sides of the 30-min threshold and to cross
    midnights often (gap distribution peaks near the threshold and near
    the bucket width). Exact row-set equality with the single-window
    gate."""
    import datetime as dt

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.relational import (
        sessionize,
        sessionize_2phase,
    )

    rng = random.Random(1234)
    rows, eid = [], 0
    for u in range(1, 13):
        t = dt.datetime(2024, 9, 1, rng.randrange(24), rng.randrange(60))
        for _ in range(rng.randrange(120, 260)):
            rows.append((eid, t, u, "click", 1.0))
            eid += 1
            # adversarial gap mix: tiny, just-under, exactly-at, just-over
            # threshold, hours, and near-a-day (forces empty buckets and
            # boundary bridges); duplicates (gap 0) exercise the
            # (ts, event_id) tie-break
            gap = rng.choice(
                [0, 1, 60, 1799, 1800, 1801, 3600, 7200, 80000, 90000]
            )
            t = t + dt.timedelta(seconds=gap)
    path = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    ).write.parquet(f"{path}/events.parquet")

    canon = lambda df: sorted(  # noqa: E731
        (r["user_id"], r["session_seq"], r["n_events"],
         r["session_start"], r["session_end"])
        for r in df.collect()
    )
    assert canon(sessionize_2phase(spark, path)) == canon(
        sessionize(spark, path)
    )


def test_top_value_share_tiny_corpus_boundary_is_max(spark, tmp_path):
    """n=5 < 100: ceil(n/100)=1, so the p99 boundary is the MAX value and
    the top set is exactly the max's tie group (value semantics)."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        top_value_share,
    )

    base = dt.datetime(2024, 6, 2, 8)
    vals = [1.0, 2.0, 9.5, 9.5, 3.0]  # max 9.5 tied twice
    rows = [(i, base, 1, "click", v) for i, v in enumerate(vals)]
    path = _write_events(spark, tmp_path, rows)

    row = top_value_share(spark, path).collect()[0]
    assert row["n_rows"] == 5
    assert row["p99_boundary_milli"] == 9500
    assert row["n_top"] == 2 and row["top_milli"] == 19000
    assert row["share_ppm"] == _tdiv(19000 * 1_000_000, 25000)


def test_wasserstein_disjoint_supports(spark, tmp_path):
    """Fully disjoint supports: every click below every purchase. W1 must
    equal the gap between the means (for equal counts) — here click at
    {1.0, 2.0} vs purchase at {10.0, 11.0}: W1 = 9.0 exactly."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        wasserstein_1d,
    )

    base = dt.datetime(2024, 5, 2, 9)
    rows = [
        (0, base, 1, "click", 1.0),
        (1, base, 1, "click", 2.0),
        (2, base, 1, "purchase", 10.0),
        (3, base, 1, "purchase", 11.0),
    ]
    path = _write_events(spark, tmp_path, rows)
    row = wasserstein_1d(spark, path).collect()[0]
    # equal counts + equal shapes shifted by 9000 milli -> W1 = 9000 milli
    assert row["w1_micro"] == 9_000_000
    expect = _w1_replay([1000, 2000], [10000, 11000])
    assert (row["n1"], row["n2"], row["area"], row["w1_micro"]) == expect


def test_cohort_overlap_skips_calendar_gaps(spark, tmp_path):
    """A missing day between two active days produces NO row for either
    neighbor (the spine joins day to day+1 among ACTIVE days only): day 1
    and day 3 active, day 2 empty -> zero output rows."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.extra import (
        cohort_overlap_jaccard,
    )

    base = dt.datetime(2024, 8, 10, 12)
    rows = [
        (0, base, 1, "click", 1.0),
        (1, base + dt.timedelta(days=2), 1, "click", 1.0),
    ]
    path = _write_events(spark, tmp_path, rows)
    assert cohort_overlap_jaccard(spark, path).count() == 0
