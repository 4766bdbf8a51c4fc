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
# registered queries (r1-r6 each checked exactly the first 50). Round-7
# rotation executes the r6 judge's amended plan (VERDICT r6 "Next round" #1):
# never-driver-checked evidence is WORSE than stale-but-once-green, so the
# window is:
#   1-14  the 14 round-6 gates that have never been driver-checked
#         (lift_gains_value_deciles .. l_diversity_events);
#   15-20 the 6 remaining r2-stale keys (seq_packing .. merge_upsert);
#   21-50 the first 30 of the 46 r3-stale keys (countmin_heavy_hitters ..
#         join_residual_ineq, in `tools/rotation_check.py` order).
# After position 50: the remaining 16 r3-stale keys, then family order.
# Round-7 additions are appended BELOW the window (growth throttled to ≤5
# per VERDICT r6 #2 so evidence debt converges).
#
# ROUND-8 ROTATION PLAN (written now so the next session executes, not
# re-derives): assuming CORRECTNESS_r07 goes green on this window, the r8
# priority list should be (1) any r7 reds, fixed, first; (2) the 16
# remaining r3-stale keys (window_lead_gap .. tpch_q21_waiting_suppliers);
# (3) ~34 of the 46 r4-stale keys stalest-first (approx_distinct_kmv ..
# variant_json_ops — `tools/rotation_check.py` lists them); (4) any round-7
# additions. That clears all pre-r5 evidence debt by round 8 close.
# Round-8 gate-slot candidates (keep the ≤5 throttle): segmented siblings
# for the two remaining degenerate-key window walls the round-7 skew tier
# measured (asof_join_nearest 2.8×, session_window_builtin 9.4× at a
# 56%-head key — tools/skew_scale_bench.py; sessionize already has its
# sibling, the same ledger-merge recipe applies).
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

# Keys verified first this round (never-driver-checked first, then stalest).
_PRIORITY_KEYS = (
    # -- 1-14: the round-6 additions, never driver-checked (VERDICT r6 #1) --
    "lift_gains_value_deciles",
    "equidepth_histogram_2pass",
    "theil_sen_slope",
    "mann_kendall_trend",
    "gini_impurity_daily",
    "hll_registers",
    "ks_two_sample",
    "spearman_daily",
    "pettitt_changepoint",
    "holt_winters_level_trend",
    "asof_join_forward",
    "autocorr_lag",
    "k_anonymity_profile",
    "l_diversity_events",
    # -- 15-20: the 6 remaining r2-stale keys --
    "seq_packing",
    "eval_contamination",
    "resample_ffill",
    "hopping_window_stats",
    "integrity_checks",
    "merge_upsert",
    # -- 21-50: first 30 of the 46 r3-stale keys (rotation_check order) --
    "countmin_heavy_hitters",
    "substring_dedup",
    "gopher_quality_filter",
    "tfidf_keywords",
    "bigram_lm_counts",
    "data_skew_profile",
    "domain_mix_sample",
    "per_source_cap",
    "dedup_minhash_mllib",
    "dedup_prefix_jaccard",
    "dedup_incremental",
    "range_join_events",
    "funnel_steps",
    "retention_cohorts",
    "knn_brute_force",
    "knn_lsh",
    "embedding_cosine_pairs",
    "knn_ivf",
    "knn_lsh_multiprobe",
    "label_centroid_assign",
    "semantic_dedup",
    "multimodal_frame_sample",
    "pricing_summary",
    "groupby_having_countdistinct",
    "groupby_max",
    "join_3hop_agg",
    "left_join_count",
    "anti_join",
    "semi_join",
    "join_residual_ineq",
    # ---- window boundary (driver checks ~50) ----
    # -- the remaining 16 r3-stale keys (round-8 window, per the plan above) --
    "window_lead_gap",
    "window_lag_seq",
    "concat_null",
    "prefix_int_cast",
    "between_filter",
    "order_by_report",
    "tpch_q2_min_cost_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_parts",
    "tpch_q13_custdist",
    "tpch_q15_top_supplier",
    "tpch_q20_promotion_suppliers",
    "tpch_q21_waiting_suppliers",
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
