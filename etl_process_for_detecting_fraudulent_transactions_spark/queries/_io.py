"""Shared testdata table loader.

``events.parquet`` is written with nanosecond timestamps (INT64
TIMESTAMP(NANOS)), which Spark's vectorized parquet reader rejects. We flip
``spark.sql.legacy.parquet.nanosAsLong`` (dynamic SQL conf — safe on a
driver-provided session) and rebuild the timestamp at microsecond precision,
matching DuckDB's own nanos→micros truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
