"""SCD2 snapshot-diff historization as a pure DataFrame rewrite (SURVEY §2.8 X2).

The reference mutates a history table in place — anti-joins for new/deleted
rows, an equi-join with attribute-inequality residual for changed rows, then
two UPDATEs + three INSERTs (py_scripts/data_to_db.py:145-295). Spark has no
in-place UPDATE, and a Spark-first design doesn't want one: we classify the
snapshot against the current version set with TWO broadcast-able joins —
snapshot ⟕ current (new/changed/unchanged) plus current ▷ snapshot (deleted),
the exact decomposition of a full outer on a unique key — and emit the new
history as ``untouched ∪ closed ∪ opened``, a deterministic, testable
transform with an injectable ``run_ts``. (A single full-outer classify was
the round-1 shape; Spark executes full outer only as sort-merge and AQE may
never demote it to broadcast, so the decomposed form wins at dim scale.)

Scale notes (100 TB design): dimension history ≪ facts, so a full rewrite per
load is cheap; the classify join shuffles only by the natural key (or
broadcasts when the snapshot is small — Catalyst/AQE picks this). For a
billion-key dimension you'd swap the writer for Delta MERGE; the classifier
here stays the same.

Semantics replicated exactly:
- "current" = open (effective_to = HIGH_TS), non-deleted versions
  (the reference's view probes current_timestamp BETWEEN from AND to with
  deleted_flg = 0; with monotone load timestamps these coincide).
- changed-detection uses NULL-blind ``<>`` on each attribute, so NULL↔value
  transitions are missed — faithful to the reference (SURVEY §2.3 J4);
  ``null_safe_diff=True`` gives the fixed behavior.
- closing sets effective_to = run_ts - 1s on ALL open rows of affected keys
  (the reference's UPDATE has no deleted_flg filter).
- deleted keys are closed AND re-inserted as an open row with deleted_flg=1
  carrying the last-known attributes.
"""

from __future__ import annotations

import datetime as _dt
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HIGH_TS = _dt.datetime(2999, 12, 31, 23, 59, 59)


def current_view(hist: DataFrame, key: str = "terminal_id") -> DataFrame:
    """Open, non-deleted versions — the reference's STG_V_TERMINALS
    (data_to_db.py:158-168) without the wall-clock probe."""
    return hist.filter(
        (F.col("deleted_flg") == 0) & (F.col("effective_to") == F.lit(HIGH_TS))
    )


def scd2_apply_snapshot(
    hist: DataFrame,
    snapshot: DataFrame,
    run_ts: _dt.datetime,
    key: str = "terminal_id",
    attrs: tuple[str, ...] = ("terminal_type", "terminal_city", "terminal_address"),
    null_safe_diff: bool = False,
) -> DataFrame:
    """Return the post-load history for a full snapshot at ``run_ts``.

    ``hist`` may be empty (first load) but must carry the hist schema
    (key, *attrs, effective_from, effective_to, deleted_flg).
    """
    cols = [key, *attrs]
    close_ts = run_ts - _dt.timedelta(seconds=1)

    cur = current_view(hist, key).select(cols)
    snap = snapshot.select(cols)

    # Classify in two broadcast-able joins instead of one full outer:
    # Spark executes a full-outer equi-join only as sort-merge (broadcast
    # hash doesn't support it), which put 6 SMJs in the r1 plan audit.
    # snap ⟕ cur (new/changed/unchanged) + cur ▷ snap (deleted) covers the
    # same four-way split, and both joins broadcast the small side at dim
    # scale — the full-outer semantics are exactly these two pieces because
    # the join is on a unique key.
    s = snap.alias("s")
    c = cur.alias("c")
    joined = s.join(c, F.col(f"s.{key}") == F.col(f"c.{key}"), "left")

    if null_safe_diff:
        diff = reduce(
            lambda a, b: a | b,
            [~F.col(f"s.{x}").eqNullSafe(F.col(f"c.{x}")) for x in attrs],
        )
    else:
        # NULL-blind <>, faithful to the reference's changed-rows join
        diff = reduce(
            lambda a, b: a | b,
            [F.col(f"s.{x}") != F.col(f"c.{x}") for x in attrs],
        )

    classified = joined.select(
        F.col(f"s.{key}").alias(key),
        *[F.col(f"s.{x}").alias(f"s_{x}") for x in attrs],
        F.when(F.col(f"c.{key}").isNull(), F.lit("new"))
        .when(diff, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("_status"),
    ).cache()
    # deleted is read twice (affected_keys + tombstones) but is dim-scale;
    # recomputing the anti join is cheaper than pinning another cache entry
    # for the lifetime of a long-running multi-day ingest
    deleted = cur.join(snap.select(key), key, "left_anti")

    # 'new' is included so that a re-added key's open TOMBSTONE gets closed
    # (the reference never closes it — data_to_db.py:209-271 only updates
    # changed/deleted keys — leaving two open rows per re-added terminal;
    # that latent bug is not replicated: hist invariants > bug parity here,
    # and the bundled data never re-adds a deleted terminal)
    affected_keys = (
        classified.filter(F.col("_status").isin("changed", "new"))
        .select(key)
        .unionByName(deleted.select(key))
    )

    # close ALL open rows (any deleted_flg) of affected keys — reference UPDATE
    # matches on key + open effective_to only (data_to_db.py:227-232, 251-256)
    open_rows = hist.filter(F.col("effective_to") == F.lit(HIGH_TS))
    untouched = hist.filter(F.col("effective_to") != F.lit(HIGH_TS)).unionByName(
        open_rows.join(affected_keys, key, "left_anti")
    )
    closed = open_rows.join(affected_keys, key, "semi").withColumn(
        "effective_to", F.lit(close_ts)
    )

    opened_live = (
        classified.filter(F.col("_status").isin("new", "changed"))
        .select(key, *[F.col(f"s_{x}").alias(x) for x in attrs])
        .withColumn("effective_from", F.lit(run_ts))
        .withColumn("effective_to", F.lit(HIGH_TS))
        .withColumn("deleted_flg", F.lit(0))
    )
    opened_deleted = (
        deleted.select(key, *attrs)
        .withColumn("effective_from", F.lit(run_ts))
        .withColumn("effective_to", F.lit(HIGH_TS))
        .withColumn("deleted_flg", F.lit(1))
    )

    return (
        untouched.unionByName(closed)
        .unionByName(opened_live)
        .unionByName(opened_deleted)
    )
