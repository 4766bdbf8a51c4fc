"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the guessing-amount fraud shape —
lag-window sequence detection — over sf0.001 events). ``queries()`` /
``oracle_sql()`` expose the full operator inventory from SURVEY.md §2 plus
the training-data-pipeline extensions (dedup / similarity / text analysis),
each as a (Spark callable, DuckDB oracle SQL) pair with matching column
names. See etl_process_for_detecting_fraudulent_transactions_spark/queries/.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_process_for_detecting_fraudulent_transactions_spark.queries import (  # noqa: E402
    all_oracles,
    all_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The city-fraud shape (lead-window event-sequence detection, SURVEY §2.9
    Q3): consecutive per-user events of different type within 60 minutes —
    83 rows at sf0.001 (the lag-sequence Q4 shape has no hits that small).
    """
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.relational import (
        window_lead_gap,
    )

    return window_lead_gap(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per queries() key."""
    return all_oracles()
