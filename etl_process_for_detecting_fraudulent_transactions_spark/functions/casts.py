"""Scalar expression helpers replicating reference semantics (SURVEY §2.2).

All pure Column expressions — no Python UDFs — so every query stays inside
Catalyst / whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType


def comma_decimal(col: Column | str, precision: int = 10, scale: int = 2) -> Column:
    """Parse a comma-decimal string ('1046,40') into DecimalType.

    The reference stores the raw text and relies on SQLite's numeric-prefix
    cast (py_scripts/rep_fraud.py:194-197); we type it properly at the ingest
    boundary instead (SURVEY §4 item 1).
    """
    c = F.col(col) if isinstance(col, str) else col
    # try_cast: junk parses to NULL (SQLite cast semantics; ANSI cast throws)
    return F.regexp_replace(c, ",", ".").try_cast(DecimalType(precision, scale))


def int_amount(col: Column | str) -> Column:
    """Integer currency units with SQLite prefix-cast semantics.

    SQLite ``cast('5000,99' as integer)`` parses the numeric prefix → 5000
    (truncation toward zero of the pre-comma part). Equivalent for the
    non-negative amounts in this domain: take the text before the first
    comma/period and cast. Works on raw comma-decimal strings AND on
    decimal-typed columns (via their canonical string form).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c.cast("string"), "[,.]").getItem(0).try_cast("long")


def minutes_between(later: Column | str, earlier: Column | str) -> Column:
    """Whole-minute delta, truncated toward zero.

    Mirrors ``cast((julianday(a)-julianday(b))*24*60 as integer)``
    (py_scripts/rep_fraud.py:148,219,225): fractional minutes truncated
    toward zero for either sign (Spark double→long cast also truncates
    toward zero).
    """
    a = F.col(later) if isinstance(later, str) else later
    b = F.col(earlier) if isinstance(earlier, str) else earlier
    return ((a.cast("double") - b.cast("double")) / 60.0).cast("long")


def fio_concat(last: Column | str, first: Column | str, patr: Column | str) -> Column:
    """NULL-propagating full-name concat.

    SQLite ``||`` yields NULL if any operand is NULL (py_scripts/
    rep_fraud.py:15 etc.); Spark ``concat`` matches. Do NOT swap in
    ``concat_ws`` — it skips NULLs and diverges (SURVEY §2.2 P7).
    """
    ln = F.col(last) if isinstance(last, str) else last
    fn = F.col(first) if isinstance(first, str) else first
    pt = F.col(patr) if isinstance(patr, str) else patr
    return F.concat(ln, F.lit(" "), fn, F.lit(" "), pt)
