"""Property tests for the reference-semantics scalar helpers (functions/casts.py),
using the REAL reference engine — stdlib sqlite3 — as the model where the
semantics came from SQLite (prefix cast P8, NULL-propagating concat P7), and
the exact trunc-toward-zero model for minute deltas (P9).

Each hypothesis example batches a whole list of values into ONE DataFrame so
Spark job count stays small.
"""

import datetime as dt
import sqlite3

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_process_for_detecting_fraudulent_transactions_spark.functions.casts import (
    fio_concat,
    int_amount,
    minutes_between,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# the domain int_amount is specified for: the reference's amount format
# '<units>,<2-digit cents>' (data/transactions_*.txt), plus decimal strings
amount_str = st.builds(
    lambda units, cents: f"{units},{cents:02d}",
    st.integers(min_value=0, max_value=10**8),
    st.integers(min_value=0, max_value=99),
)


@given(amounts=st.lists(amount_str, min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_int_amount_matches_sqlite_prefix_cast(spark, amounts):
    con = sqlite3.connect(":memory:")
    want = [con.execute("SELECT CAST(? AS INTEGER)", (a,)).fetchone()[0] for a in amounts]
    con.close()
    df = spark.createDataFrame([(a,) for a in amounts], "amt string")
    got = [r["v"] for r in df.select(int_amount("amt").alias("v")).collect()]
    assert got == want


name_part = st.one_of(st.none(), st.text(alphabet="абвabcXYZ -", min_size=0, max_size=8))


@given(rows=st.lists(st.tuples(name_part, name_part, name_part), min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_fio_concat_matches_sqlite_null_propagation(spark, rows):
    con = sqlite3.connect(":memory:")
    want = [
        con.execute("SELECT ? || ' ' || ? || ' ' || ?", row).fetchone()[0] for row in rows
    ]
    con.close()
    df = spark.createDataFrame(rows, "ln string, fn string, pt string")
    got = [r["v"] for r in df.select(fio_concat("ln", "fn", "pt").alias("v")).collect()]
    assert got == want


ts = st.datetimes(
    min_value=dt.datetime(2000, 1, 1), max_value=dt.datetime(2030, 1, 1)
).map(lambda d: d.replace(microsecond=0))


@given(pairs=st.lists(st.tuples(ts, ts), min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_minutes_between_truncates_toward_zero(spark, pairs):
    # exact model: whole minutes of the signed second delta, trunc toward 0
    # (the reference's julianday float arithmetic agrees except for its own
    # float noise at exact-minute boundaries; our engine is the exact form)
    want = [int((a - b).total_seconds() / 60.0) for a, b in pairs]
    df = spark.createDataFrame(pairs, "a timestamp, b timestamp")
    got = [r["v"] for r in df.select(minutes_between("a", "b").alias("v")).collect()]
    assert got == want
