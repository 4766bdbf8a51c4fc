"""NDJSON (JSON-Lines) source with the same dead-letter discipline as the
CSV source.

Training-data pipelines overwhelmingly land documents as newline-delimited
JSON (Common Crawl derivatives, chat logs, API dumps). The same two rules
the CSV reader follows apply at 100 TB:

- **Explicit schema, never inference.** Schema inference is an extra full
  pass over the input, and on heterogeneous NDJSON it silently widens types
  (a field that is int in 99% of rows and string in 1% becomes string
  everywhere). Callers pass the schema; typing surprises become visible
  corrupt records instead of silent coercions.
- **PERMISSIVE + rescue column.** One malformed line must not kill a daily
  batch: broken lines land whole in ``_corrupt_record`` and are split off
  for quarantine (the dead-letter pattern), mirroring
  ``csv_source.split_corrupt``.

``multiLine`` stays False: NDJSON is the only JSON layout that splits —
a multi-line JSON array is ONE spark partition per FILE (no parallelism),
which is why the loader refuses it rather than accepting a flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from .csv_source import CORRUPT_COL


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read newline-delimited JSON with an explicit schema and a rescue
    column. ``mode``: PERMISSIVE (default), DROPMALFORMED, or FAILFAST."""
    with_rescue = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    return (
        spark.read.option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(with_rescue)
        .json(path)
    )


def split_corrupt(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the rescue column, corrupt rows) — dead-letter
    split, same contract as the CSV source."""
    clean = raw.filter(raw[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    bad = raw.filter(raw[CORRUPT_COL].isNotNull())
    return clean, bad
