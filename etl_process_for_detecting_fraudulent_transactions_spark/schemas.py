"""Explicit StructType schemas for every table (SURVEY.md §1.2).

The reference lets three schema systems drift (pandas inference → SQLite type
affinity → advisory DDL). Here every boundary has exactly one explicit schema:
a *raw* (all-string) schema at the file boundary and a *typed* schema after
the cast stage (see functions/casts.py for the comma-decimal fix, SURVEY §2.2
P8; reference DDL at sql_scripts/DWH_tables.sql:1-61).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# --- raw file-boundary schemas -------------------------------------------

# transactions_DDMMYYYY.txt, sep=';' (reference: data/transactions_*.txt,
# loaded at py_scripts/data_to_db.py:91-119)
TRANSACTIONS_RAW = _st(
    ("transaction_id", StringType()),
    ("transaction_date", StringType()),
    ("amount", StringType()),  # comma-decimal text, e.g. '1046,40'
    ("card_num", StringType()),
    ("oper_type", StringType()),
    ("oper_result", StringType()),
    ("terminal", StringType()),
)

# terminals_DDMMYYYY.xlsx full snapshot (py_scripts/data_to_db.py:282-295)
TERMINALS_SNAPSHOT = _st(
    ("terminal_id", StringType()),
    ("terminal_type", StringType()),
    ("terminal_city", StringType()),
    ("terminal_address", StringType()),
)

# passport_blacklist_DDMMYYYY.xlsx cumulative (py_scripts/data_to_db.py:123-141)
BLACKLIST_RAW = _st(
    ("date", TimestampType()),
    ("passport", StringType()),
)

# --- typed DWH schemas ----------------------------------------------------

FACT_TRANSACTIONS = _st(
    ("trans_id", StringType()),
    ("trans_date", TimestampType()),
    ("amt", DecimalType(10, 2)),
    ("card_num", StringType()),
    ("oper_type", StringType()),
    ("oper_result", StringType()),
    ("terminal", StringType()),
)

DIM_CARDS = _st(
    ("card_num", StringType()),
    ("account_num", StringType()),
    ("create_dt", DateType()),
    ("update_dt", DateType()),
)

DIM_ACCOUNTS = _st(
    ("account_num", StringType()),
    ("valid_to", DateType()),
    ("client", StringType()),
    ("create_dt", DateType()),
    ("update_dt", DateType()),
)

# NB: 'patrinymic' misspelling is part of the reference contract
# (sql_scripts/DWH_tables.sql:24; rename from source 'patronymic' at
# py_scripts/data_to_db.py:64,75).
DIM_CLIENTS = _st(
    ("client_id", StringType()),
    ("last_name", StringType()),
    ("first_name", StringType()),
    ("patrinymic", StringType()),
    ("date_of_birth", DateType()),
    ("passport_num", StringType()),
    ("passport_valid_to", DateType()),
    ("phone", StringType()),
    ("create_dt", DateType()),
    ("update_dt", DateType()),
)

FACT_PASSPORT_BLACKLIST = _st(
    ("passport_num", StringType()),
    ("entry_dt", TimestampType()),
)

DIM_TERMINALS_HIST = _st(
    ("terminal_id", StringType()),
    ("terminal_type", StringType()),
    ("terminal_city", StringType()),
    ("terminal_address", StringType()),
    ("effective_from", TimestampType()),
    ("effective_to", TimestampType()),
    ("deleted_flg", IntegerType()),
)

REP_FRAUD = _st(
    ("event_dt", TimestampType()),
    ("passport", StringType()),
    ("fio", StringType()),
    ("phone", StringType()),
    ("event_type", StringType()),
    ("report_dt", TimestampType()),
    ("report_date", DateType()),  # hive partition column of the mart
)

# extension tables (driver testdata)
DOCUMENTS = _st(
    ("doc_id", LongType()),
    ("text", StringType()),
    ("lang", StringType()),
    ("source", StringType()),
    ("n_chars", LongType()),
)
