"""Regression guard for the TIMESTAMP_NTZ poisoning bug (VERDICT r1 #1).

``events.parquet`` carries nanosecond timestamps. Spark's
``spark.sql.legacy.parquet.nanosAsLong`` conf is first-read-order-sensitive:
once a session has read the file with the conf off, the cached footer schema
makes ``ts`` come back as TIMESTAMP_NTZ on every later read — and every
``unix_micros()`` consumer (window gates, sessionize, entry()) throws
DATATYPE_MISMATCH. ``load_table`` must normalize BOTH shapes (bigint nanos
and TIMESTAMP_NTZ) to a plain UTC TIMESTAMP.
"""

import os

from pyspark.sql import functions as F

from etl_process_for_detecting_fraudulent_transactions_spark.queries._io import load_table
from tests.conftest import TESTDATA

SF = os.path.join(TESTDATA, "sf0.001")


def test_load_table_survives_poisoned_footer_cache(spark):
    # Poison: read events with nanosAsLong explicitly OFF so the session's
    # footer cache pins ts as TIMESTAMP_NTZ (the driver-session failure mode).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    poisoned = spark.read.parquet(f"{SF}/events.parquet")
    assert dict(poisoned.dtypes)["ts"] == "timestamp_ntz"

    df = load_table(spark, SF, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # unix_micros (the r1 crash site) must resolve and produce sane values
    row = df.select(F.max(F.unix_micros("ts")).alias("us")).collect()[0]
    assert row["us"] is not None and row["us"] > 0


def test_load_table_values_match_duckdb_truncation(spark):
    """Whatever read path fires, the microsecond values must equal DuckDB's
    nanos→micros truncation of the same file (the oracle side)."""
    import duckdb

    df = load_table(spark, SF, "events")
    # compare a deterministic sample by event_id
    sample = (
        df.select("event_id", F.unix_micros("ts").alias("us"))
        .filter(F.col("event_id") % 97 == 0)
        .collect()
    )
    spark_us = {r["event_id"]: r["us"] for r in sample}
    con = duckdb.connect()
    duck = con.sql(
        f"SELECT event_id, epoch_us(ts) AS us FROM read_parquet('{SF}/events.parquet') "
        "WHERE event_id % 97 = 0"
    ).fetchall()
    duck_us = {k: v for k, v in duck}
    con.close()
    assert spark_us == duck_us
