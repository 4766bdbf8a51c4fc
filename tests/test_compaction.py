"""Small-file compaction (storage.compact_small_files): fewer files, same
rows/values, atomic swap, partition layout preserved."""

import os

from pyspark.sql import functions as F

from etl_process_for_detecting_fraudulent_transactions_spark.storage import (
    compact_small_files,
)


def _parquet_files(path):
    return [
        os.path.join(r, f)
        for r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]


def test_compaction_preserves_rows_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "flat")
    # simulate 20 tiny append batches
    for i in range(20):
        spark.range(i * 100, (i + 1) * 100).withColumn(
            "v", F.col("id") * 2
        ).write.mode("append").parquet(path)
    before_rows = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert len(_parquet_files(path)) >= 20

    stats = compact_small_files(spark, path)
    assert stats["files_before"] >= 20
    assert stats["files_after"] < stats["files_before"]
    assert len(_parquet_files(path)) == stats["files_after"]
    after_rows = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after_rows == before_rows


def test_compaction_keeps_hive_partitions(spark, tmp_path):
    path = str(tmp_path / "parted")
    for i in range(6):
        (
            spark.range(i * 50, (i + 1) * 50)
            .withColumn("day", (F.col("id") % 3).cast("int"))
            .write.mode("append")
            .partitionBy("day")
            .parquet(path)
        )
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    n_before = len(_parquet_files(path))

    stats = compact_small_files(spark, path, partition_by=["day"])
    assert stats["files_after"] < n_before
    # layout check: every file still lives under a day=N directory
    for f in _parquet_files(path):
        assert "/day=" in f, f
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after == before
