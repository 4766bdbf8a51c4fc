"""SnapshotStore (time travel / commit protocol / vacuum) contract tests."""

import os

import pytest

from etl_process_for_detecting_fraudulent_transactions_spark.operators.snapshots import (
    SnapshotStore,
)


def _vals(df):
    return sorted(r.v for r in df.collect())


def test_time_travel_and_append(spark, tmp_path):
    st = SnapshotStore(spark, str(tmp_path / "t"))
    v1 = st.commit(spark.range(3).selectExpr("id AS v"))
    v2 = st.commit(spark.range(10, 12).selectExpr("id AS v"), mode="append")
    v3 = st.commit(spark.range(100, 101).selectExpr("id AS v"))
    assert (v1, v2, v3) == (1, 2, 3)
    assert _vals(st.read(1)) == [0, 1, 2]
    assert _vals(st.read(2)) == [0, 1, 2, 10, 11]
    assert _vals(st.read(3)) == [100]
    assert _vals(st.read()) == [100]  # head
    assert st.versions() == [1, 2, 3]


def test_rollback_creates_new_head(spark, tmp_path):
    st = SnapshotStore(spark, str(tmp_path / "t"))
    st.commit(spark.range(3).selectExpr("id AS v"))
    st.commit(spark.range(50, 51).selectExpr("id AS v"))
    v = st.rollback(1)
    assert v == 3
    assert _vals(st.read()) == [0, 1, 2]
    # the bad head is still auditable
    assert _vals(st.read(2)) == [50]


def test_commit_collision_retries_to_next_version(spark, tmp_path):
    st = SnapshotStore(spark, str(tmp_path / "t"))
    st.commit(spark.range(1).selectExpr("id AS v"))
    # simulate a concurrent writer landing v2 between our write and commit:
    # pre-create the v2 manifest the competitor would have won
    os.makedirs(os.path.dirname(st._manifest_path(2)), exist_ok=True)
    with open(st._manifest_path(2), "x") as fh:
        fh.write('{"version": 2, "op": "overwrite", "dirs": []}')
    v = st.commit(spark.range(5, 6).selectExpr("id AS v"))
    assert v == 3  # lost the race on 2, won 3
    assert _vals(st.read(3)) == [5]


def test_vacuum_drops_history_keeps_live(spark, tmp_path):
    st = SnapshotStore(spark, str(tmp_path / "t"))
    st.commit(spark.range(3).selectExpr("id AS v"))
    st.commit(spark.range(10, 12).selectExpr("id AS v"), mode="append")
    st.commit(spark.range(100, 101).selectExpr("id AS v"))
    out = st.vacuum(retain_last=1)
    # v1+v2's two data dirs die (v3 overwrote); manifests v1, v2 die
    assert out["dropped_versions"] == 2 and out["dropped_dirs"] == 2
    assert out["retained"] == [3]
    assert _vals(st.read()) == [100]
    with pytest.raises(FileNotFoundError):
        st.read(1)


def test_vacuum_append_chain_keeps_shared_dirs(spark, tmp_path):
    """An append head references its ancestors' data dirs — vacuum must
    keep every directory the retained manifest points at, even when the
    manifest that CREATED the dir is dropped."""
    st = SnapshotStore(spark, str(tmp_path / "t"))
    st.commit(spark.range(3).selectExpr("id AS v"))
    st.commit(spark.range(10, 12).selectExpr("id AS v"), mode="append")
    out = st.vacuum(retain_last=1)
    assert out["dropped_versions"] == 1 and out["dropped_dirs"] == 0
    assert _vals(st.read()) == [0, 1, 2, 10, 11]
