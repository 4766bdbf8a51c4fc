"""Incremental rollup maintenance (operators/rollup.py): merge-equivalence
property and partition-scoped refresh (untouched partitions are not
rewritten)."""

import os

from pyspark.sql import functions as F

from etl_process_for_detecting_fraudulent_transactions_spark.operators.rollup import (
    finish_rollup,
    merge_rollup,
    refresh_rollup,
    rollup_state,
)
from etl_process_for_detecting_fraudulent_transactions_spark.storage import ParquetStore

KEYS, MEASURES = ["month"], ["o_totalprice"]


def _orders_with_month(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "month", F.date_trunc("month", F.col("o_orderdate"))
    )


def _canon(df):
    out = finish_rollup(df, MEASURES)
    # read-back moves the partition column to the end — order by name
    return sorted(tuple(r) for r in out.select(*sorted(out.columns)).collect())


def test_any_batch_split_merges_to_full_recompute(spark, sf_dir):
    o = _orders_with_month(spark, sf_dir)
    full = rollup_state(o, KEYS, MEASURES)

    # split by a key-uncorrelated hash so every batch touches every month
    parts = [o.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    state = rollup_state(parts[0], KEYS, MEASURES)
    for p in parts[1:]:
        state = merge_rollup(state, rollup_state(p, KEYS, MEASURES), KEYS, MEASURES)

    assert _canon(state) == _canon(full)


def test_refresh_rewrites_only_touched_partitions(spark, sf_dir, tmp_path):
    import datetime as dt

    o = _orders_with_month(spark, sf_dir)
    store = ParquetStore(spark, str(tmp_path))

    seed = o.filter(F.col("o_orderdate") < dt.datetime(1996, 1, 1))
    refresh_rollup(store, "monthly", seed, KEYS, MEASURES, partition_key="month")

    root = store.path("monthly")
    before = {
        d: os.path.getmtime(os.path.join(root, d))
        for d in os.listdir(root)
        if d.startswith("month=")
    }
    assert len(before) == 12  # 1995 only

    # a batch touching a single already-present month plus one new month
    batch = o.filter(
        (F.col("o_orderdate") >= dt.datetime(1995, 12, 1))
        & (F.col("o_orderdate") < dt.datetime(1996, 2, 1))
    )
    refresh_rollup(store, "monthly", batch, KEYS, MEASURES, partition_key="month")

    after = {
        d: os.path.getmtime(os.path.join(root, d))
        for d in os.listdir(root)
        if d.startswith("month=")
    }
    assert len(after) == 13
    changed = {d for d in before if after[d] != before[d]}
    assert changed == {d for d in before if "1995-12" in d}, changed

    # and the merged state is exact: refresh(seed) then refresh(batch) ==
    # one recompute over seed ⊎ batch (multiset union — December rows are in
    # both inputs by construction, and the rollup must count them twice)
    expected = rollup_state(seed.unionByName(batch), KEYS, MEASURES)
    got = store.read("monthly")
    assert _canon(got) == _canon(expected)
