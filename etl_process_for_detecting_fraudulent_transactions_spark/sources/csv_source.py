"""CSV source for the daily transactions increment (SURVEY §2.1 S1).

Distributed ``spark.read.csv`` with an explicit all-string schema — inference
is both a correctness hazard (the comma-decimal amount column would become
garbage) and a scale hazard (an extra full pass over 100 TB of input).
Typing happens in one explicit cast stage (plans/ingest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TRANSACTIONS_RAW


def read_transactions_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read one (or a glob of) semicolon-separated transactions file(s).

    Reference: pandas.read_csv(sep=';') at py_scripts/data_to_db.py:16-18.
    """
    return (
        spark.read.option("sep", ";")
        .option("header", True)
        .schema(TRANSACTIONS_RAW)
        .csv(path)
    )
