"""Independent-truth pins for the round-8 segmented skew-immune siblings:
each sibling replayed on planted fixtures against (a) its BASELINE gate —
the pair must be row-identical, that is the 'IDENTICAL output' claim in the
docstring — and (b) a plain-Python implementation of the DEFINITION, so a
shared misreading cannot pass both engines.

Fixtures are built from integer microsecond epochs (``timestamp_micros``),
so bucket boundaries, exact-gap ties, and cross-midnight carries are planted
deliberately rather than hoped for: sessions spanning the day-bucket edge,
gaps of EXACTLY 30 minutes (which CONTINUE a session — Spark's builtin
merges touching session windows; this fixture is what established that and
corrected the oracle's former >= reading), 30:00.000001 gaps (new
session), multi-empty-day continuations, purchases whose
nearest click sits several buckets back, purchases before any click, and
click/purchase collisions at one instant.
"""

from __future__ import annotations

import random

GAP_US = 30 * 60 * 1_000_000
DAY_US = 86_400 * 1_000_000


def _write_events_us(spark, tmp_path, rows):
    """rows: (event_id, t_us, user_id, event_type, value) with integer
    micros — ts is derived inside Spark so epochs are exact by
    construction (no driver-side timezone conversion in play)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "ev")
    (
        spark.createDataFrame(
            rows, ["event_id", "t_us", "user_id", "event_type", "value"]
        )
        .select(
            "event_id",
            F.timestamp_micros("t_us").alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
        .write.parquet(f"{path}/events.parquet")
    )
    return path


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# planted corpora
# ---------------------------------------------------------------------------

def _boundary_rows():
    """Hand-planted edge cases, one user per scenario."""
    rows, eid = [], 0

    def ev(t_us, user, typ="click", val=1.0):
        nonlocal eid
        rows.append((eid, t_us, user, typ, val))
        eid += 1

    base = 1_600_000_000_000_000
    base = base - base % DAY_US  # align to a bucket edge

    # user 1: session spans midnight — 23:50 then 00:10 next day (20 min)
    ev(base + DAY_US - 10 * 60_000_000, 1)
    ev(base + DAY_US + 10 * 60_000_000, 1)
    # user 2: gap of EXACTLY 30 min across midnight — ONE session (Spark's
    # session_window merges touching windows; strict > starts new)
    ev(base + DAY_US - 15 * 60_000_000, 2)
    ev(base + DAY_US + 15 * 60_000_000, 2)
    # user 3: 30:00.000001 gap within one bucket — two sessions
    ev(base + 1000, 3)
    ev(base + 1000 + GAP_US + 1, 3)
    # user 4: continuation chained across 3 consecutive midnights, every
    # hop within 30 min, plus a strictly-over-30min break in the middle
    # bucket
    ev(base + DAY_US - 60_000_000, 4)
    ev(base + DAY_US + 60_000_000, 4)
    ev(base + DAY_US + 60_000_000 + GAP_US + 1, 4)  # 30:00.000001 -> new
    ev(base + 2 * DAY_US - 60_000_000, 4)
    ev(base + 2 * DAY_US + 60_000_000, 4)
    # user 5: two events at the SAME instant at a bucket edge
    ev(base + 3 * DAY_US, 5)
    ev(base + 3 * DAY_US, 5)
    # user 6: single event exactly ON a bucket edge
    ev(base + 5 * DAY_US, 6)
    # user 7: active buckets separated by EMPTY days (new session, and the
    # ledger's lag must hop over the empty calendar days correctly)
    ev(base + 100, 7)
    ev(base + 4 * DAY_US + 100, 7)
    return rows


def _asof_rows():
    """Hand-planted as-of scenarios."""
    rows, eid = [], 0

    def ev(t_us, user, typ, val=1.0):
        nonlocal eid
        rows.append((eid, t_us, user, typ, val))
        eid += 1

    base = 1_600_000_000_000_000
    base = base - base % DAY_US

    # user 1: click then purchase in the same bucket
    ev(base + 1_000_000, 1, "click")
    ev(base + 2_000_000, 1, "purchase")
    # user 2: purchase 3 buckets after the click (cross-bucket carry over
    # two click-free days, one of which has a purchase-only bucket)
    ev(base + 5_000_000, 2, "click")
    ev(base + DAY_US + 5_000_000, 2, "purchase")
    ev(base + 3 * DAY_US + 5_000_000, 2, "purchase")
    # user 3: purchase BEFORE any click (dropped), then click, then purchase
    ev(base + 1_000_000, 3, "purchase")
    ev(base + 2_000_000, 3, "click")
    ev(base + 3_000_000, 3, "purchase")
    # user 4: click and purchase at the SAME instant (inclusive match) and
    # two clicks at one instant (dedup by max event_id wins)
    ev(base + 9_000_000, 4, "click")
    ev(base + 9_000_000, 4, "click")
    ev(base + 9_000_000, 4, "purchase")
    # user 5: newer click in the purchase's own bucket must SHADOW the
    # carried-in click from the previous bucket
    ev(base + 10_000_000, 5, "click")
    ev(base + DAY_US + 1_000_000, 5, "click")
    ev(base + DAY_US + 2_000_000, 5, "purchase")
    # user 6: clicks only (no output rows)
    ev(base + 1, 6, "click")
    return rows


def _random_rows(seed, n_users=17, n_events=900, kinds=("click", "purchase", "view")):
    """Fuzzed corpus: bursty per-user timelines straddling ~6 day-buckets,
    with collisions at shared instants planted by coarse time quantization."""
    rng = random.Random(seed)
    base = 1_600_000_000_000_000
    base = base - base % DAY_US
    rows = []
    for eid in range(n_events):
        user = rng.randrange(1, n_users + 1)
        # quantized to 97s grid -> deliberate equal-instant collisions
        t_us = base + rng.randrange(0, 6 * 86_400 // 97) * 97_000_000
        rows.append((eid, t_us, user, rng.choice(kinds), 1.0))
    return rows


# ---------------------------------------------------------------------------
# plain-Python definitions
# ---------------------------------------------------------------------------

def _sessions_replay(rows):
    """session_window semantics: per user, ordered by t_us; a gap STRICTLY
    over 30 min starts a new session (touching windows merge); emit
    (user, start, last, n, span)."""
    byuser: dict = {}
    for _eid, t_us, user, _typ, _v in rows:
        byuser.setdefault(user, []).append(t_us)
    out = []
    for user, ts in byuser.items():
        ts.sort()
        start = last = ts[0]
        n = 1
        for t in ts[1:]:
            if t - last > GAP_US:
                out.append((user, start, last, n, last - start))
                start, n = t, 0
            n += 1
            last = t
        out.append((user, start, last, n, last - start))
    return sorted(out)


def _asof_replay(rows):
    """Backward inclusive as-of with per-(user, ts) click dedup by max id."""
    clicks: dict = {}
    purchases = []
    for eid, t_us, user, typ, _v in rows:
        if typ == "click":
            key = (user, t_us)
            if key not in clicks or eid > clicks[key]:
                clicks[key] = eid
        elif typ == "purchase":
            purchases.append((eid, t_us, user))
    byuser: dict = {}
    for (user, t_us), cid in clicks.items():
        byuser.setdefault(user, []).append((t_us, cid))
    for c in byuser.values():
        c.sort()
    out = []
    for pid, t_us, user in purchases:
        best = None
        for ct, cid in byuser.get(user, ()):
            if ct <= t_us:
                best = (ct, cid)
            else:
                break
        if best is not None:
            out.append((pid, user, t_us, best[0], t_us - best[0], best[1]))
    return sorted(out)


# ---------------------------------------------------------------------------
# session_window_segmented
# ---------------------------------------------------------------------------

def test_session_segmented_equals_builtin_on_planted_boundaries(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.timeseries import (
        session_window_builtin,
        session_window_segmented,
    )

    rows = _boundary_rows()
    path = _write_events_us(spark, tmp_path, rows)
    seg = _canon(session_window_segmented(spark, path))
    builtin = _canon(session_window_builtin(spark, path))
    assert seg == builtin
    assert seg == _sessions_replay(rows)


def test_session_segmented_matches_definition_on_fuzzed_corpus(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.timeseries import (
        session_window_builtin,
        session_window_segmented,
    )

    rows = _random_rows(1234)
    path = _write_events_us(spark, tmp_path, rows)
    seg = _canon(session_window_segmented(spark, path))
    assert seg == _sessions_replay(rows)
    assert seg == _canon(session_window_builtin(spark, path))


# ---------------------------------------------------------------------------
# asof_join_segmented
# ---------------------------------------------------------------------------

def test_asof_segmented_equals_baseline_on_planted_carries(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.timeseries import (
        asof_join_nearest,
        asof_join_segmented,
    )

    rows = _asof_rows()
    path = _write_events_us(spark, tmp_path, rows)
    seg = _canon(asof_join_segmented(spark, path))
    baseline = _canon(asof_join_nearest(spark, path))
    assert seg == baseline
    assert seg == _asof_replay(rows)
    # the planted drop case: user 3's first purchase has no prior click
    dropped = {(r[0], r[1]) for r in _asof_replay(rows)}
    assert (5, 3) not in dropped and (7, 3) in dropped


def test_asof_segmented_matches_definition_on_fuzzed_corpus(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.timeseries import (
        asof_join_nearest,
        asof_join_segmented,
    )

    rows = _random_rows(987)
    path = _write_events_us(spark, tmp_path, rows)
    seg = _canon(asof_join_segmented(spark, path))
    assert seg == _asof_replay(rows)
    assert seg == _canon(asof_join_nearest(spark, path))
