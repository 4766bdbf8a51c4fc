"""Z-order clustering: bit-interleave correctness against a Python
reference, and the actual pruning claim measured from REAL parquet footers —
a 2-D box predicate must skip far more row groups (here: files, one row
group each at this size) under z-order layout than under single-column sort.
"""

import pytest
from pyspark.sql import functions as F

from etl_process_for_detecting_fraudulent_transactions_spark.operators.zorder import (
    pruned_fraction,
    rowgroup_envelopes,
    write_zordered,
    z_value,
)


def _py_interleave(x: int, y: int) -> int:
    out = 0
    for i in range(16):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_z_value_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (255, 256)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", z_value([F.col("x"), F.col("y")])).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _py_interleave(x, y), (x, y)


def test_zorder_layout_prunes_2d_box_better_than_linear_sort(spark, sf_dir, tmp_path):
    """Both layouts write the same events into the same number of files; the
    2-D box (user band x time band) must intersect the min/max envelope of
    far fewer z-ordered files. Envelopes come from the real footers — this
    is exactly the statistic a parquet reader prunes with."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries._io import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("t")
    )
    # 64 range-partitions ~ 6 z-prefix bits ~ an 8x8 (user, time) tile grid;
    # the linear layout's 64 files are 64 time bands that each span ALL users
    n_files = 64

    linear = str(tmp_path / "linear")
    # the common default layout: globally sorted by time only
    ev.repartitionByRange(n_files, "t").sortWithinPartitions("t").write.mode(
        "overwrite"
    ).parquet(linear)

    zpath = str(tmp_path / "zorder")
    write_zordered(ev, zpath, ["user_id", "t"], n_files=n_files)

    # same rows survive the rewrite
    assert spark.read.parquet(zpath).count() == ev.count()

    lo_u, hi_u, lo_t, hi_t = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("t"), F.max("t")
    ).first()
    # a band covering ~1/8 of each dimension
    box = {
        "user_id": (lo_u, lo_u + (hi_u - lo_u) // 8),
        "t": (lo_t, lo_t + (hi_t - lo_t) // 8),
    }

    lin_env = rowgroup_envelopes(linear, ["user_id", "t"])
    z_env = rowgroup_envelopes(zpath, ["user_id", "t"])
    lin_skip = pruned_fraction(lin_env, box)
    z_skip = pruned_fraction(z_env, box)

    # time-sorted layout prunes on t (~7/8 of groups) but the user band
    # hits every surviving group; z-order prunes on BOTH dimensions.
    assert z_skip > lin_skip, (z_skip, lin_skip)
    assert z_skip >= 0.9, z_skip


def test_z_value_random_against_reference(spark):
    import random

    rng = random.Random(7)
    rows = [(rng.randrange(65536), rng.randrange(65536)) for _ in range(200)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", z_value([F.col("x"), F.col("y")])).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _py_interleave(x, y), (x, y)


def test_z_value_rejects_non_2d():
    with pytest.raises(ValueError):
        z_value([F.col("a")])
    with pytest.raises(ValueError):
        z_value([F.col("a"), F.col("b"), F.col("c")])


def test_zorder_null_dims_go_to_bucket_zero(spark, tmp_path):
    """Null z-dimension rows must land in the LOW corner (bucket 0), not
    silently in the max corner via F.least's null-skipping — asserted on
    the actual normalized bucket, not just row survival."""
    from etl_process_for_detecting_fraudulent_transactions_spark.operators.zorder import (
        _normalize_u16,
        zorder_by,
    )

    df = spark.createDataFrame(
        [(1, 10, 100), (2, None, 200), (3, 99, None), (4, 50, 150)],
        "id int, a int, b int",
    )
    buckets = {
        r.id: r.n
        for r in df.select(
            "id", _normalize_u16(F.col("a"), F.lit(10), F.lit(99)).alias("n")
        ).collect()
    }
    assert buckets[2] == 0, buckets  # null dim -> bucket 0, NOT 65535
    assert buckets[1] == 0 and buckets[4] < 65535 and buckets[3] == 65535

    out = zorder_by(df, ["a", "b"], n_files=2)
    # all rows survive, none dropped or duplicated
    assert sorted(r.id for r in out.collect()) == [1, 2, 3, 4]
