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
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            # Parquet footer-schema caching makes the nanosAsLong conf
            # first-read-order-sensitive: if the session already read this
            # file, ts comes back as TIMESTAMP_NTZ and every unix_micros()
            # call downstream throws DATATYPE_MISMATCH. Session tz is pinned
            # to UTC (session.py), so the cast is value-preserving vs
            # DuckDB's naive timestamps.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
