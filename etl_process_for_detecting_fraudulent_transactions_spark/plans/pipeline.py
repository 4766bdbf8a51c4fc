"""Daily-batch orchestration — the reference's main.py as one function.

``run_day`` mirrors the lifecycle at main.py:1-26: rebuild per-run dims/fact
from the seed dump + day files, historize terminals (SCD2), evaluate the four
fraud rules, append REP_FRAUD, archive consumed files. Per-run tables are
plain lazy DataFrames (the reference's STG_* tables and views are exactly
unexecuted logical plans); only terminals-hist and the report mart persist
(SURVEY §1.1).

Determinism: ``run_ts`` is injected everywhere the reference stamps wall
clock (SCD2 effective_from/to, report_dt) so golden replays are exact.
"""

from __future__ import annotations

import datetime as _dt
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..operators.scd2 import scd2_apply_snapshot
from ..schemas import BLACKLIST_RAW, DIM_TERMINALS_HIST, REP_FRAUD, TERMINALS_SNAPSHOT
from ..sources.csv_source import read_transactions_csv, split_corrupt
from ..sources.files import archive_file, ddmmyyyy_to_iso, discover_run_date
from ..sources.seed_source import read_seed_dims
from ..sources.xlsx_source import read_xlsx_df
from ..storage import ParquetStore
from .ingest import typed_blacklist, typed_transactions
from .report import stamp, union_rules
from .rules import account_fraud, city_fraud, guessing_amount_fraud, passport_fraud

HIST = "dwh_dim_terminals_hist"
REPORT = "rep_fraud"


@dataclass
class PipelineState:
    """Persistent-store handle + per-run knobs."""

    store: ParquetStore
    seed_dump_path: str
    compat_time_filter: bool = True
    compat_hist_join: bool = True
    archive: bool = True
    extra: dict = field(default_factory=dict)


def run_day(
    spark: SparkSession,
    state: PipelineState,
    data_dir: str,
    run_date: str | None = None,
    run_ts: _dt.datetime | None = None,
) -> DataFrame:
    """Process one day of incoming files; returns the day's report rows.

    ``run_date``: DDMMYYYY (discovered from the transactions file when None).
    ``run_ts``: the logical load timestamp (wall clock when None).
    """
    date = run_date or discover_run_date(data_dir)
    iso = _dt.date.fromisoformat(ddmmyyyy_to_iso(date))
    ts = run_ts or _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)

    tx_path = os.path.join(data_dir, f"transactions_{date}.txt")
    term_path = os.path.join(data_dir, f"terminals_{date}.xlsx")
    bl_path = os.path.join(data_dir, f"passport_blacklist_{date}.xlsx")

    # per-run rebuild: seed dims + day fact + cumulative blacklist
    dims = read_seed_dims(spark, state.seed_dump_path)
    clean_tx, corrupt_tx = split_corrupt(read_transactions_csv(spark, tx_path))
    state.extra["corrupt_transactions"] = corrupt_tx  # dead-letter handle
    transactions = typed_transactions(clean_tx)
    blacklist = typed_blacklist(read_xlsx_df(spark, bl_path, BLACKLIST_RAW))

    # SCD2 historization of the terminals snapshot
    snapshot = read_xlsx_df(spark, term_path, TERMINALS_SNAPSHOT)
    hist = state.store.read(HIST, DIM_TERMINALS_HIST)
    new_hist = scd2_apply_snapshot(hist, snapshot, run_ts=ts)
    state.store.overwrite_swap(new_hist, HIST)
    hist = state.store.read(HIST, DIM_TERMINALS_HIST)

    cards, accounts, clients = dims["cards"], dims["accounts"], dims["clients"]
    report = stamp(
        union_rules(
            [
                passport_fraud(transactions, cards, accounts, clients, blacklist, iso),
                account_fraud(transactions, cards, accounts, clients, iso),
                city_fraud(
                    transactions, hist, cards, accounts, clients,
                    compat_time_filter=state.compat_time_filter,
                    compat_hist_join=state.compat_hist_join,
                ),
                guessing_amount_fraud(transactions, cards, accounts, clients),
            ]
        ),
        ts,
    )
    state.store.append(report, REPORT, partition_by=["report_date"])

    if state.archive:
        archive_dir = os.path.join(data_dir, os.pardir, "archive")
        for p in (tx_path, term_path, bl_path):
            if os.path.exists(p):
                archive_file(p, archive_dir)

    return state.store.read(REPORT, REP_FRAUD).filter(f"report_dt = '{ts}'")
