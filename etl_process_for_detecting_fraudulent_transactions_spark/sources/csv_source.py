"""CSV source for the daily transactions increment (SURVEY §2.1 S1).

Distributed ``spark.read.csv`` with an explicit all-string schema — inference
is both a correctness hazard (the comma-decimal amount column would become
garbage) and a scale hazard (an extra full pass over 100 TB of input).
Typing happens in one explicit cast stage (plans/ingest.py).

Malformed rows: the reference (pandas C parser) hard-fails the whole load on
a ragged row. At 100 TB a single bad row must not kill a daily batch, so the
reader defaults to PERMISSIVE with a ``_corrupt_record`` rescue column;
``split_corrupt`` separates clean rows from rejects so the pipeline can
quarantine them (dead-letter pattern) instead of aborting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..schemas import TRANSACTIONS_RAW

CORRUPT_COL = "_corrupt_record"

_RAW_WITH_RESCUE = StructType(
    list(TRANSACTIONS_RAW.fields) + [StructField(CORRUPT_COL, StringType(), True)]
)


def read_transactions_csv(
    spark: SparkSession, path: str, mode: str = "PERMISSIVE"
) -> DataFrame:
    """Read one (or a glob of) semicolon-separated transactions file(s).

    Reference: pandas.read_csv(sep=';') at py_scripts/data_to_db.py:16-18.
    ``mode``: PERMISSIVE (default, ragged rows land in ``_corrupt_record``),
    DROPMALFORMED, or FAILFAST.
    """
    return (
        spark.read.option("sep", ";")
        .option("header", True)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(_RAW_WITH_RESCUE)
        .csv(path)
    )


def split_corrupt(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_rescue_col, corrupt_rows) — dead-letter split.

    Note: Spark requires the rescue column to be referenced through a
    cached/materialized plan boundary when filtered on alone; selecting
    it together with the data columns (as here) is the supported path.
    """
    cached = raw.cache()
    clean = cached.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = cached.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, bad
