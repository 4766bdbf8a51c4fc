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
# registered queries (r1-r7 each checked exactly the first 50). Round-8
# rotation executes the r7 judge's amended plan (VERDICT r7 "Next round"
# #1): never-driver-checked evidence is WORSE than stale-but-once-green,
# so the window is:
#   1-5   the 5 round-7 gates that have never been driver-checked
#         (wasserstein_1d .. sessionize_2phase, rotation_check order);
#   6-21  the 16 remaining r3-stale keys (window_lead_gap ..
#         tpch_q21_waiting_suppliers);
#   22-50 the first 29 of the 46 r4-stale keys (approx_distinct_kmv ..
#         dedup_signature_est, in `tools/rotation_check.py` order).
# After position 50: the remaining 17 r4-stale keys, then family order.
# Round-8 additions are appended BELOW the window (growth throttled to ≤5
# per VERDICT r7 #4 so evidence debt converges; registry ≤222 at close).
# Round-8 used 4 of the 5 slots: session_window_segmented +
# asof_join_segmented (the skew siblings VERDICT r7 #2/#3 ordered) and
# dsir_importance_weights + hybrid_search_rrf (LLM-pipeline data selection
# and hybrid retrieval) — registry 221 at close.
#
# ROUND-9 ROTATION PLAN (written now so the next session executes, not
# re-derives): assuming CORRECTNESS_r08 goes green on this window, the r9
# priority list should be (1) any r8 reds, fixed, first; (2) the 4 round-8
# additions (never-checked): session_window_segmented, asof_join_segmented,
# dsir_importance_weights, hybrid_search_rrf; (3) the 17 remaining r4-stale
# keys (minhash_containment .. variant_json_ops); (4) the r5-stale cohort,
# stalest-first per `tools/rotation_check.py`. That makes max staleness r5
# at round-9 open (VERDICT r7 #4's bar) and clears r4 debt entirely.
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
    # -- 1-5: the round-7 additions, never driver-checked (VERDICT r7 #1) --
    "wasserstein_1d",
    "top_value_share",
    "t_closeness_profile",
    "cohort_overlap_jaccard",
    "sessionize_2phase",
    # -- 6-21: the 16 remaining r3-stale keys --
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
    # -- 22-50: first 29 of the 46 r4-stale keys (rotation_check order) --
    "approx_distinct_kmv",
    "zscore_outliers",
    "equidepth_histogram",
    "kmv_set_ops",
    "incremental_join_view",
    "drift_ks_test",
    "trend_slope_ols",
    "auc_mann_whitney",
    "decision_stump_train",
    "bloom_filter_probe",
    "doc_novelty_score",
    "inverted_index",
    "keyword_search_topk",
    "bpe_merge_step",
    "bm25_topk",
    "classifier_eval",
    "max_concurrent_events",
    "event_path_trigrams",
    "bfs_distance",
    "assoc_rules",
    "gap_islands",
    "ewma_anomaly",
    "ohlc_bars",
    "twap_daily",
    "interval_union",
    "weighted_sample",
    "dedup_clusters",
    "dedup_canonical_pick",
    "dedup_signature_est",
    # ---- window boundary (driver checks ~50) ----
    # -- the remaining 17 r4-stale keys (round-9 window, per the plan above) --
    "minhash_containment",
    "record_linkage_fs",
    "datetime_ops",
    "regex_ops",
    "attribution_last_touch",
    "pq_encode",
    "knn_pq_adc",
    "knn_ivf_pq",
    "multimodal_features",
    "multimodal_audio_features",
    "multimodal_resize",
    "multimodal_bmp_features",
    "multimodal_png_features",
    "multimodal_jpeg_features",
    "multimodal_jpeg_color",
    "multimodal_phash",
    "variant_json_ops",
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
