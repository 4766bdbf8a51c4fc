"""Typed-stage casts: raw file DataFrames → DWH fact shapes (SURVEY §2.8 X1/X3).

One explicit cast boundary replaces the reference's triple schema drift
(pandas inference → SQLite affinity → advisory DDL). The comma-decimal amount
is typed once here (SURVEY §4 item 1); downstream rules never touch raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.casts import comma_decimal


def typed_transactions(raw: DataFrame) -> DataFrame:
    """Raw CSV stage → DWH_FACT_TRANSACTIONS shape.

    Rename-projection mirrors the INSERT-SELECT at data_to_db.py:96-114;
    typing is ours.
    """
    return raw.select(
        F.col("transaction_id").alias("trans_id"),
        F.try_to_timestamp("transaction_date").alias("trans_date"),
        comma_decimal("amount").alias("amt"),
        "card_num",
        "oper_type",
        "oper_result",
        "terminal",
    )


def typed_blacklist(raw: DataFrame) -> DataFrame:
    """Raw xlsx stage → DWH_FACT_PASSPORT_BLACKLIST shape
    (data_to_db.py:128-136). ``date`` arrives as a real timestamp from the
    xlsx source (Excel serial + date numFmt)."""
    return raw.select(
        F.col("passport").alias("passport_num"),
        F.col("date").alias("entry_dt"),
    )
