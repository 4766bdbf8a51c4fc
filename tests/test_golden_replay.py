"""Golden replay: run the full 3-day pipeline on the reference's own bundled
data and assert the per-run, per-rule REP_FRAUD multiset counts captured by
executing the reference this session (SURVEY.md §5, BASELINE.md).

The reference data stays read-only under /root/reference; files are copied to
a tmp dir because the pipeline archives (moves) consumed inputs.
"""

import datetime as dt
import os
import shutil

import pytest

from tests.conftest import REFDATA, SEED_DUMP

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFDATA), reason="reference data not available"
)

# SURVEY §5 golden outputs (verified by executing the reference)
GOLDEN_PER_DAY = {
    "01032021": {"city_fraud": 1, "guessing_amount_fraud": 1},
    "02032021": {"passport_fraud": 480, "city_fraud": 1},
    "03032021": {"passport_fraud": 818, "account_fraud": 328, "city_fraud": 1},
}
GOLDEN_EVENTS = {
    "01032021": {
        "city_fraud": [("8115 161624", "2021-03-01 02:54:34")],
        "guessing_amount_fraud": [("5771 567535", "2021-03-01 22:36:38")],
    },
    "02032021": {"city_fraud": [("5360 464827", "2021-03-02 00:16:34")]},
    "03032021": {"city_fraud": [("3365 607538", "2021-03-03 01:00:13")]},
}
GOLDEN_CUMULATIVE = 1630
GOLDEN_HIST_ROWS = 155


@pytest.fixture(scope="module")
def replay(spark, tmp_path_factory):
    from etl_process_for_detecting_fraudulent_transactions_spark.plans.pipeline import (
        HIST,
        PipelineState,
        run_day,
    )
    from etl_process_for_detecting_fraudulent_transactions_spark.storage import ParquetStore

    root = tmp_path_factory.mktemp("golden")
    data_dir = root / "data"
    shutil.copytree(REFDATA, data_dir)
    os.chmod(data_dir, 0o755)
    for f in data_dir.iterdir():
        os.chmod(f, 0o644)

    state = PipelineState(
        store=ParquetStore(spark, str(root / "store")),
        seed_dump_path=SEED_DUMP,
    )
    per_day = {}
    for i, date in enumerate(["01032021", "02032021", "03032021"]):
        ts = dt.datetime(2021, 3, int(date[:2]), 12, 0, 0)
        day_report = run_day(spark, state, str(data_dir), run_date=date, run_ts=ts)
        per_day[date] = day_report.collect()
    return state, per_day


def test_per_day_rule_counts(replay):
    _, per_day = replay
    for date, golden in GOLDEN_PER_DAY.items():
        got = {}
        for row in per_day[date]:
            got[row.event_type] = got.get(row.event_type, 0) + 1
        assert got == golden, f"day {date}: {got} != {golden}"


def test_golden_event_identities(replay):
    _, per_day = replay
    for date, rules in GOLDEN_EVENTS.items():
        for rule, expected in rules.items():
            got = sorted(
                (r.passport, r.event_dt.strftime("%Y-%m-%d %H:%M:%S"))
                for r in per_day[date]
                if r.event_type == rule
            )
            assert got == sorted(expected), f"{date}/{rule}: {got}"


def test_cumulative_report(replay, spark):
    state, _ = replay
    from etl_process_for_detecting_fraudulent_transactions_spark.plans.pipeline import REPORT

    assert state.store.read(REPORT).count() == GOLDEN_CUMULATIVE


def test_hist_shape(replay, spark):
    state, _ = replay
    from etl_process_for_detecting_fraudulent_transactions_spark.plans.pipeline import HIST

    hist = state.store.read(HIST)
    rows = hist.collect()
    assert len(rows) == GOLDEN_HIST_ROWS
    open_live = [r for r in rows if r.deleted_flg == 0 and r.effective_to.year == 2999]
    deleted = [r for r in rows if r.deleted_flg == 1]
    assert len(open_live) == 150
    assert len(deleted) == 1 and deleted[0].terminal_id == "P9111"


def test_files_archived(replay):
    _, per_day = replay
    # all nine inputs consumed exactly once
    assert all(len(v) > 0 for v in per_day.values())
