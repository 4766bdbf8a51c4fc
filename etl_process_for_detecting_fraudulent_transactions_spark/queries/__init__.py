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
    graph,
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

# Order matters: the driver's correctness budget covers the first ~50
# registered queries (r1-r4 each checked exactly the first 50). Round-5
# rotation executes VERDICT r4 #3 verbatim — the ENTIRE window goes to
# evidence debt, zero new gates above position 50:
#   1-3   the three r4 hash-reds, re-checked after the HUGEINT->BIGINT
#         oracle casts (triangle_stats, pagerank_copurchase,
#         chi2_independence — VERDICT r4 #1);
#   4     heavy_hitters_exact_rescan, re-checked after de-vacuating the
#         threshold so the gate emits rows at driver scale (VERDICT r4 #4);
#   5-21  the 17 keys NEVER driver-checked (sat at positions 51-67 of the
#         r4 window);
#   22-49 the 28 keys whose latest evidence is round 1;
#   50    scd2_snapshot_diff (r2-stale, verdict-named in r3 AND perf-flagged
#         in r4 — double reason to pin fresh evidence).
# After position 50: the remaining r2-stale verdict-named re-checks, then
# the r2-stale dedup/text/sampling core, then family order (stalest-family
# first). Registry additions this round are appended BELOW the window
# (VERDICT r4 #3: "freeze registry additions above rotation position 50").
#
# ROUND-6 ROTATION PLAN (write it now so the next session executes, not
# re-derives): assuming CORRECTNESS_r05 goes green on this window, the r6
# priority list should be (1) any r5 reds, fixed, first; (2) the 22 round-5
# gates (never driver-checked: asof_join_nearest .. kaplan_meier_survival —
# `tools/rotation_check.py` lists them); (3) the remaining r2-stale set
# (sessionize, tpch_q12/q18, json_props_stats, the dedup/text/sampling core,
# quantity_percentiles .. merge_upsert — ~28 keys). That is ~50 slots:
# again a full window of evidence debt, zero additions above position 50.
_MODULES = (
    relational,
    extra,
    graph,
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

# Keys verified first this round (r4 reds first, then stalest-first debt).
_PRIORITY_KEYS = (
    # -- 1-3: r4 hash-reds, oracles re-cast HUGEINT->BIGINT this round --
    "triangle_stats",
    "pagerank_copurchase",
    "chi2_independence",
    # -- 4: de-vacuated this round (threshold now emits rows at sf0.01) --
    "heavy_hitters_exact_rescan",
    # -- 5-21: never driver-checked (positions 51-67 of the r4 window) --
    "table_checksum",
    "resample_interpolate",
    "poisson_bootstrap",
    "pareto_frontier",
    "null_ops",
    "linkpred_common_neighbors",
    "weighted_median",
    "cusum_anomaly",
    "kcore_peel",
    "series_correlation",
    "join_size_estimate",
    "column_profile",
    "benford_digits",
    "scd3_update",
    "feature_hashing",
    "lm_doc_score",
    "quantile_normalize",
    # -- 22-49: latest evidence round 1 (four rounds stale) --
    "above_nation_avg",
    "case_when_bands",
    "cube_revenue",
    "distinct_segments",
    "fraud_flag_events",
    "full_outer_orders",
    "monthly_revenue",
    "pit_join_events",
    "pivot_priority_revenue",
    "right_join_orders",
    "rollup_revenue",
    "set_except_customers",
    "set_intersect_customers",
    "sql_text_api",
    "string_ops",
    "topk_orders",
    "tpch_q10_returned_items",
    "tpch_q14_promo_share",
    "tpch_q16_supplier_variety",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive_revenue",
    "tpch_q22_dormant_customers",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "union_rule_accumulation",
    "window_distribution_funcs",
    "window_rank_topn",
    # -- 50: r2-stale + r4 perf-flagged --
    "scd2_snapshot_diff",
    # ---- window boundary (driver checks ~50) ----
    # -- r2-stale: remaining verdict-named re-checks (r1 failures fixed r2) --
    "sessionize",
    "tpch_q12_priority_class",
    "tpch_q18_large_orders",
    "json_props_stats",
    # -- r2-stale: dedup/text/sampling core --
    "dedup_exact",
    "dedup_bow_fingerprint",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "fuzzy_name_pairs",
    "curation_pipeline",
    "text_token_stats",
    "text_quality",
    "train_test_split",
    "stratified_sample",
)

# Family order after the priority keys: remaining r2-stale families first
# so any budget beyond 50 lands on the next-stalest evidence.
_FAMILY_ORDER = (
    stats,
    text,
    graph,
    timeseries,
    quality,
    sampling,
    dedup,
    extra,
    similarity,
    multimodal,
    relational,
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
