"""Driver-contract rehearsal over the FULL registry at a chosen sf.

Replays what the driver does at sf0.01: run every ``queries()`` entry on
Spark AND its ``oracle_sql()`` on DuckDB (same parquet views), compare row
count, sorted column names, and order-insensitive exact values. Queries
without an oracle get the weaker rows-only check, as the driver does.

Usage: python tools/driver_rehearsal.py [sf0.01] [key ...]
Prints one line per query and a final tally; exit 1 on any mismatch.

Known harness artifact: DATE columns come back as datetime.date from Spark
and (sometimes) pandas.Timestamp-like from DuckDB — both are normalized via
isoformat of the DATE part when the oracle column is a DATE (the driver's
own hasher normalizes these; it hash-matched monthly_revenue in r1).
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(v):
    from decimal import Decimal

    if isinstance(v, float):
        return "nan" if math.isnan(v) else v
    if isinstance(v, Decimal):
        return float(v)
    if hasattr(v, "isoformat"):
        iso = v.isoformat()
        # normalize date vs midnight-datetime renderings of DATE columns
        return iso[:10] if iso.endswith("T00:00:00") else iso
    return v


def _canon(rows, cols):
    """Order-insensitive canonical form: columns sorted case-insensitively
    (Spark and DuckDB may differ in identifier case), values normalized."""
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
    only = set(sys.argv[2:])
    sf_dir = f"/root/testdata/{sf}"

    from etl_process_for_detecting_fraudulent_transactions_spark.queries import (
        all_oracles,
        all_queries,
    )
    from etl_process_for_detecting_fraudulent_transactions_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries, oracles = all_queries(), all_oracles()
    bad = []
    for i, (k, fn) in enumerate(queries.items()):
        if only and k not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            if k not in oracles:
                n = sdf.count()
                print(f"[{i:3}] {k}: rows-only ({n} rows)")
                continue
            srows_raw = [tuple(row) for row in sdf.collect()]
            ores = con.sql(oracles[k])
            scols, ocols = list(sdf.columns), list(ores.columns)
            if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
                bad.append((k, f"columns {scols} vs {ocols}"))
                print(f"[{i:3}] {k}: COLUMN MISMATCH {scols} vs {ocols}")
                continue
            sc = _canon(srows_raw, scols)
            oc = _canon(ores.fetchall(), ocols)
            if len(sc) != len(oc):
                bad.append((k, f"rowcount {len(sc)} vs {len(oc)}"))
                print(f"[{i:3}] {k}: ROWCOUNT {len(sc)} vs {len(oc)}")
            elif sc != oc:
                diff = next(
                    (a, b) for a, b in zip(sc, oc) if a != b
                )
                bad.append((k, f"values differ, e.g. {diff}"))
                print(f"[{i:3}] {k}: VALUE MISMATCH e.g. {diff}")
            else:
                print(f"[{i:3}] {k}: ok ({len(sc)} rows)")
        except Exception as exc:  # noqa: BLE001 — rehearsal must not die mid-sweep
            bad.append((k, f"error: {exc}"))
            print(f"[{i:3}] {k}: ERROR {str(exc)[:200]}")
        finally:
            # gates cache frames internally (shingles, signatures, hashed
            # vectors); without this, a full sweep accumulates dozens of
            # pinned frames that squeeze execution memory by the tail
            spark.catalog.clearCache()
    print(f"\n{len(bad)} failures / {len(queries)} queries at {sf}")
    for k, why in bad:
        print(f"  FAIL {k}: {why[:300]}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
