"""Driver-contract query registry.

Each submodule exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL over the same
parquet views). Keys are shared; a key present in QUERIES but not ORACLES
gets the driver's weaker rows-only check (reserved for genuinely
non-SQL-expressible ops).

Column-name discipline: every computed column is aliased identically in the
Spark plan and the oracle SQL — the driver sorts columns by name before
value-hashing. Float discipline: aggregates over doubles go through exact
decimal arithmetic and are cast back to double at the end, so both engines
produce bit-identical results regardless of partitioning/order.
"""

from __future__ import annotations

from . import (
    dedup,
    extra,
    multimodal,
    quality,
    relational,
    sampling,
    similarity,
    stats,
    text,
    timeseries,
    tpch_more,
    tpch_rest,
)

# Order matters: the driver's correctness budget covers roughly the first 50
# registered queries. Round 1 listed relational/extra/tpch first and starved
# every dedup/similarity/text/sampling/timeseries/quality gate of driver
# evidence (VERDICT r1 #5). Registry order for round 2:
#   1. the 7 gates fixed this round (NTZ window gates, SCD2 sentinel,
#      BIGINT-cast oracles) — they need fresh driver evidence;
#   2. the LLM-pipeline families the driver has never checked;
#   3. the already-driver-green relational/extra/tpch families (still guarded
#      by local parity tests in tests/test_oracle_parity.py).
_MODULES = (
    relational,
    extra,
    tpch_more,
    tpch_rest,
    stats,
    sampling,
    timeseries,
    quality,
    dedup,
    similarity,
    text,
    multimodal,
)

# Keys re-verified first this round (fixed since CORRECTNESS_r01).
_PRIORITY_KEYS = (
    "window_lead_gap",
    "window_lag_seq",
    "sessionize",
    "scd2_snapshot_diff",
    "tpch_q12_priority_class",
    "tpch_q18_large_orders",
    "json_props_stats",
)

# Family order after the priority keys: never-driver-checked families first.
_FAMILY_ORDER = (
    dedup,
    similarity,
    text,
    sampling,
    timeseries,
    quality,
    stats,
    multimodal,
    relational,
    extra,
    tpch_more,
    tpch_rest,
)


def _ordered(attr: str) -> dict:
    merged = {}
    for m in _MODULES:
        merged.update(getattr(m, attr))
    out = {k: merged[k] for k in _PRIORITY_KEYS if k in merged}
    for m in _FAMILY_ORDER:
        for k in getattr(m, attr):
            if k in merged and k not in out:
                out[k] = merged[k]
    return out


def all_queries():
    return _ordered("QUERIES")


def all_oracles():
    return _ordered("ORACLES")
