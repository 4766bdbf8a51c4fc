"""Incremental rollup maintenance: keep a materialized aggregate fresh by
merging each new fact batch's partial aggregate instead of recomputing from
all of history.

The reference rebuilds everything per run (SURVEY §2.7 D1 — viable at 47k
rows, not at 100 TB). The scale-correct pattern is a *mergeable* aggregate
state: sums and counts are commutative monoids, so

    rollup(facts ∪ batch) == merge(rollup(facts), rollup(batch))

holds exactly — and merging touches only the groups present in the batch.
Float discipline matches the rest of the engine: measures are summed as
DECIMAL(18,4) partials (order/partitioning independent), surfaced as double
only in read views.

Store-level refresh uses partition-scoped rewrite: only the partitions the
batch touches are read, merged, and overwritten (``overwrite_partitions``);
a daily increment into a by-month rollup rewrites 1–2 months, never the
whole table. Equivalence merge==full-recompute is property-tested in
``tests/test_rollup.py`` and cross-engine-gated by the
``incremental_monthly_rollup`` driver query.
"""

from __future__ import annotations

import os
import shutil
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# state-column suffixes: a rollup state carries exact decimal sums + a count
_CNT = "rollup_cnt"


def _sum_col(c: str) -> str:
    return f"{c}_sum"


def rollup_state(facts: DataFrame, keys: Sequence[str], measures: Sequence[str]) -> DataFrame:
    """Partial-aggregate ``facts`` into mergeable rollup state: one row per
    key combination with DECIMAL(18,4)-exact sums and a row count."""
    # state sums are pinned to DECIMAL(28,4): Spark widens sum(decimal) per
    # aggregation level (18,4 -> 28,4 -> 38,4), and mixed widths across
    # partition files written by successive refreshes break the parquet read
    aggs = [
        F.sum(F.col(c).cast("decimal(18,4)")).cast("decimal(28,4)").alias(_sum_col(c))
        for c in measures
    ] + [F.count(F.lit(1)).alias(_CNT)]
    return facts.groupBy(*keys).agg(*aggs)


def merge_rollup(
    state: DataFrame, batch_state: DataFrame, keys: Sequence[str], measures: Sequence[str]
) -> DataFrame:
    """Merge two rollup states (same schema): union + re-sum. Decimal sums
    and bigint counts are associative/commutative, so any merge order and
    any partitioning yield identical results."""
    aggs = [
        F.sum(_sum_col(c)).cast("decimal(28,4)").alias(_sum_col(c)) for c in measures
    ] + [F.sum(_CNT).alias(_CNT)]
    return state.unionByName(batch_state).groupBy(*keys).agg(*aggs)


def finish_rollup(state: DataFrame, measures: Sequence[str]) -> DataFrame:
    """Read view over rollup state: exact sums surfaced as doubles plus the
    derived mergeable average."""
    out = state
    for c in measures:
        out = out.withColumn(f"{c}_total", F.col(_sum_col(c)).cast("double"))
        # avg = double(sum)/count: ONE double division of exact operands —
        # decimal division would hit engine-specific quotient-scale rules
        out = out.withColumn(
            f"{c}_avg", F.col(_sum_col(c)).cast("double") / F.col(_CNT)
        )
    return out.drop(*[_sum_col(c) for c in measures])


def refresh_rollup(
    store,
    name: str,
    new_facts: DataFrame,
    keys: Sequence[str],
    measures: Sequence[str],
    partition_key: str,
) -> None:
    """Incrementally fold ``new_facts`` into the materialized rollup at
    ``store.path(name)``, rewriting ONLY the partitions the batch touches.

    ``partition_key`` must be one of ``keys`` (the rollup's storage
    partitioning — e.g. month). Steps: (1) partial-aggregate the batch,
    (2) read only the touched partitions of existing state (partition
    pruning — the untouched ones are never opened), (3) merge, (4) swap the
    touched partition directories in. Untouched partition files are not
    rewritten (asserted by mtime in tests/test_rollup.py).
    """
    batch_state = rollup_state(new_facts, keys, measures)
    # the batch's partition values drive pruning + the scoped overwrite;
    # a daily batch touches O(1) partitions, so collect() is driver-safe
    touched = [r[0] for r in batch_state.select(partition_key).distinct().collect()]
    if not touched:
        return
    root = store.path(name)
    if store.exists(name):
        existing = store.read(name).filter(F.col(partition_key).isin(touched))
        merged = merge_rollup(existing, batch_state, keys, measures)
    else:
        merged = batch_state
    # materialize before touching the directories the plan reads from
    merged = merged.localCheckpoint(eager=True)
    tmp = root + ".__rollup_tmp__"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").partitionBy(partition_key).parquet(tmp)
    for part_dir in os.listdir(tmp):
        if not part_dir.startswith(f"{partition_key}="):
            continue  # _SUCCESS etc.
        dst = os.path.join(root, part_dir)
        shutil.rmtree(dst, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
        os.replace(os.path.join(tmp, part_dir), dst)
    shutil.rmtree(tmp, ignore_errors=True)
