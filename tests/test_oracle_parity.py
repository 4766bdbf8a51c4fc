"""Driver-contract rehearsal: run every queries() entry on Spark AND its
DuckDB oracle at sf0.001, compare row counts, column names, and values
(order-insensitive, exact) — the same gate the driver applies at sf0.01.
"""

import math
import os

import duckdb
import pytest

from tests.conftest import TESTDATA

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    from decimal import Decimal

    if isinstance(v, Decimal):
        return float(v)
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


from etl_process_for_detecting_fraudulent_transactions_spark.queries import (  # noqa: E402
    all_oracles,
    all_queries,
)

_QUERIES = all_queries()
_ORACLES = all_oracles()

_DR_CACHE = []


def _rehearsal_module():
    """tools/driver_rehearsal.py loaded once (tools/ is not a package)."""
    if not _DR_CACHE:
        import importlib.util as ilu
        from pathlib import Path

        spec = ilu.spec_from_file_location(
            "driver_rehearsal",
            Path(__file__).parent.parent / "tools" / "driver_rehearsal.py",
        )
        mod = ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _DR_CACHE.append(mod)
    return _DR_CACHE[0]


@pytest.fixture(scope="module")
def duck():
    sf_dir = os.path.join(TESTDATA, "sf0.001")
    con = _duck(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("key", sorted(_QUERIES))
def test_query_matches_oracle(key, spark, duck, sf_dir):
    sdf = _QUERIES[key](spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns

    if key not in _ORACLES:
        assert srows is not None  # rows-only check (non-SQL-expressible op)
        return

    rel = duck.sql(_ORACLES[key])
    dtypes = [str(t) for t in rel.types]
    drows = rel.fetchall()
    dcols = [d[0] for d in rel.description]

    assert sorted(scols) == sorted(dcols), f"{key}: columns {scols} vs {dcols}"

    # Dtype-class strictness (VERDICT r4 #2): the driver's hasher renders
    # DuckDB HUGEINT as pandas float64 while Spark emits int64 — value-equal
    # results still hash-mismatch. Compare per-column type classes the way
    # tools/driver_rehearsal.py does, so an un-cast HUGEINT (or any other
    # int-vs-float split) fails HERE, not at the driver.
    _dr = _rehearsal_module()
    skinds = {f.name.lower(): _dr._spark_kind(f.dataType) for f in sdf.schema.fields}
    okinds = {c.lower(): _dr._duck_kind(t) for c, t in zip(dcols, dtypes)}
    dtype_bad = [
        f"{c}: spark={skinds[c]} duckdb={okinds[c]}"
        for c in sorted(skinds)
        if c in okinds and skinds[c] != okinds[c]
    ]
    assert not dtype_bad, f"{key}: dtype-class mismatch {dtype_bad}"

    # Registry float discipline pin (VERDICT r11 #1): no gate ships a raw
    # DECIMAL result column — wide-accumulator sums must cast back to
    # double at the end. json_props_stats hash-diverged at the r11 driver
    # check on exactly this surface (values equal, dtype raw DECIMAL(38,0))
    # while the Decimal->float normalization above kept the rehearsal
    # green; this asserts the discipline structurally on BOTH engines.
    from pyspark.sql.types import DecimalType

    dec_spark = [
        f.name for f in sdf.schema.fields if isinstance(f.dataType, DecimalType)
    ]
    assert not dec_spark, f"{key}: raw DECIMAL result column(s) {dec_spark}"
    dec_duck = [c for c, t in zip(dcols, dtypes) if "DECIMAL" in t.upper()]
    assert not dec_duck, f"{key}: oracle DECIMAL result column(s) {dec_duck}"
    assert len(srows) == len(drows), f"{key}: rowcount {len(srows)} vs {len(drows)}"
    sc, dc = _canon(srows, scols), _canon(drows, dcols)
    mismatches = [i for i, (a, b) in enumerate(zip(sc, dc)) if a != b]
    assert not mismatches, (
        f"{key}: {len(mismatches)} mismatched rows; first: "
        f"spark={sc[mismatches[0]]} duck={dc[mismatches[0]]}"
    )
