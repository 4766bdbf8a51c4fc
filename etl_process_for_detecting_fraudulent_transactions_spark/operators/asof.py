"""Point-in-time (as-of) join: fact rows → the dimension version valid at
the fact's timestamp.

This is the operator the reference NEEDED for its city-fraud rule: it joins
transactions to the full terminal history with no version predicate
(py_scripts/rep_fraud.py:122-131, SURVEY §2.3 J6) and silently duplicates
each transaction once per history version. The correct semantics is an
interval containment join against the SCD2 table:

    fact.ts BETWEEN hist.effective_from AND hist.effective_to

Physical strategy: SCD2 dimension histories are small relative to facts, so
``broadcast(hist)`` makes this a map-side range probe — the fact never
shuffles. For a billion-row interval table you would instead bucket both
sides by key and rely on AQE/sort-merge with the range residual; the logical
form below is identical either way (Catalyst picks the join once the hint is
dropped).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def point_in_time_join(
    facts: DataFrame,
    hist: DataFrame,
    on: Column,
    fact_time: str,
    how: str = "inner",
    effective_from: str = "effective_from",
    effective_to: str = "effective_to",
    broadcast_hist: bool = True,
) -> DataFrame:
    """Join each fact row to the single hist version valid at ``fact_time``.

    ``on``: the key equality Column (e.g. ``facts.terminal == hist.terminal_id``).
    SCD2 invariants (tests/test_scd2_properties.py) guarantee at most one
    matching version per key — the join never duplicates facts.
    """
    h = F.broadcast(hist) if broadcast_hist else hist
    cond = (
        on
        & (F.col(fact_time) >= F.col(effective_from))
        & (F.col(fact_time) <= F.col(effective_to))
    )
    return facts.join(h, cond, how)
