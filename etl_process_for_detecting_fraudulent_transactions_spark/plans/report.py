"""REP_FRAUD accumulation (SURVEY §2.8 X4).

Each rule's report-shaped rows are stamped with ``report_dt`` (an injected
run_ts, not wall clock — determinism, SURVEY §4 item 3) and appended. The
reference orders Q1/Q2 inserts by (passport, event_dt); that ordering is
cosmetic (rep_fraud.py:51,102) — correctness checks are order-insensitive —
and an append-only parquet mart has no meaningful row order, so we skip the
sort (a pointless full shuffle at scale).
"""

from __future__ import annotations

import datetime as _dt
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stamp(report_rows: DataFrame, run_ts: _dt.datetime) -> DataFrame:
    """Stamp report_dt + a derived report_date partition column: the mart is
    hive-partitioned by day, so per-day reads prune to one directory
    (PartitionFilters in the scan) instead of scanning the whole history."""
    return report_rows.withColumn("report_dt", F.lit(run_ts)).withColumn(
        "report_date", F.to_date(F.lit(run_ts))
    )


def union_rules(rule_outputs: list[DataFrame]) -> DataFrame:
    return reduce(lambda a, b: a.unionByName(b), rule_outputs)
