"""Scale-path proofs: bucketed co-located joins (no exchange in the plan)
and skew salting (identical results, scattered hot key).
"""

import pytest
from pyspark.sql import functions as F

from etl_process_for_detecting_fraudulent_transactions_spark.operators.skew import salted_join
from etl_process_for_detecting_fraudulent_transactions_spark.storage import write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucket_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdemo LOCATION '{wh}'")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(o, "bdemo.orders_b", "o_orderkey", 8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "bdemo.lineitem_b", "o_orderkey", 8
    )
    yield "bdemo.orders_b", "bdemo.lineitem_b"
    spark.sql("DROP DATABASE IF EXISTS bdemo CASCADE")


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    """Equi-join of two same-bucketed tables: the sort-merge join reads
    co-located buckets directly — zero Exchange nodes — and returns the same
    rows as the plain shuffled join."""
    to, tl = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        a, b = spark.table(to), spark.table(tl)
        joined = a.join(b, "o_orderkey").select("o_orderkey", "l_linenumber")
        plan = _physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"unexpected shuffle:\n{plan}"

        plain = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .join(
                spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
                    "l_orderkey", "o_orderkey"
                ),
                "o_orderkey",
            )
            .select("o_orderkey", "l_linenumber")
        )
        assert "Exchange" in _physical_plan(plain)  # the join bucketing removes
        assert joined.count() == plain.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key also skips the exchange."""
    to, _ = bucketed_tables
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        agg = spark.table(to).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
        assert "Exchange" not in _physical_plan(agg)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting the hottest customer keys yields exactly the plain join's
    result multiset."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_mktsegment"
    )
    hot = (
        o.groupBy("o_custkey").count().orderBy(F.desc("count"), "o_custkey").limit(5)
    ).select("o_custkey")

    plain = o.join(c, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(o, c, "o_custkey", hot_keys=hot, n_salts=8).select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_scatters_hot_key(spark, sf_dir):
    """The hot key's fact rows actually receive >1 distinct salt (the whole
    point: one task's work becomes n_salts tasks')."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    hot_key = (
        o.groupBy("o_custkey").count().orderBy(F.desc("count"), "o_custkey").limit(1)
    ).collect()[0][0]
    hot = spark.createDataFrame([(hot_key,)], "o_custkey bigint")
    f = o.join(
        F.broadcast(hot.select(F.col("o_custkey").alias("__hot_key"))),
        o.o_custkey == F.col("__hot_key"),
        "left",
    ).withColumn(
        "__salt",
        F.when(F.col("__hot_key").isNotNull(), (F.rand(seed=42) * 8).cast("int")).otherwise(
            F.lit(0)
        ),
    )
    n_salts = f.filter(F.col("o_custkey") == hot_key).select("__salt").distinct().count()
    assert n_salts > 1
