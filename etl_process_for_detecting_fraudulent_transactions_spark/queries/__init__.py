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
# registered queries (r1-r8 each checked exactly the first 50). Round-9
# rotation executes the committed plan (VERDICT r8 "Next round" #1, which
# is the plan this file wrote at r8 close): CORRECTNESS_r08 was 50/50
# green with zero reds, so the window is:
#   1-4   the 4 round-8 additions that have never been driver-checked
#         (dsir_importance_weights .. hybrid_search_rrf, rotation_check
#         order);
#   5     window_lag_seq — r8-checked but VACUOUSLY (0 rows == 0 oracle
#         rows); VERDICT r8 #2's done-criterion is a driver row with
#         spark_rows > 0, which needs it inside the window now that the
#         span fix makes sf0.01 yield 156 rows;
#   6-22  the 17 remaining r4-stale keys (minhash_containment ..
#         variant_json_ops);
#   23-50 the first 28 of the 50 r5-stale keys (chi2_independence ..
#         monthly_revenue, in `tools/rotation_check.py` order).
# After position 50: the remaining 22 r5-stale keys, then family order.
# Round-9 additions are appended BELOW the window (growth throttled to <=5
# per the standing convention). Round-9 used 2 of the 5 slots —
# quality_classifier_nb + crosslingual_dedup, both from the r8 judge's
# shortlist — registry 223 at close.
#
# ROUND-10 ROTATION PLAN (written now so the next session executes, not
# re-derives): assuming CORRECTNESS_r09 goes green on this window, the r10
# priority list should be (1) any r9 reds, fixed, first; (2) the 2 round-9
# additions (never-checked): quality_classifier_nb, crosslingual_dedup;
# (3) the remaining 22 r5-stale keys (string_ops, then case_when_bands ..
# tpch_q22_dormant_customers); (4) the r6-stale cohort, stalest-first per
# `tools/rotation_check.py`. That clears r5 debt entirely and makes max
# staleness r6 at round-10 open.
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
    # -- 1-4: the round-8 additions, never driver-checked (VERDICT r8 #1) --
    "dsir_importance_weights",
    "session_window_segmented",
    "asof_join_segmented",
    "hybrid_search_rrf",
    # -- 5: the de-vacuated gate (VERDICT r8 #2 wants a >0-row driver hash) --
    "window_lag_seq",
    # -- 6-22: the 17 remaining r4-stale keys --
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
    # -- 23-50: first 28 of the 50 r5-stale keys (rotation_check order) --
    "chi2_independence",
    "heavy_hitters_exact_rescan",
    "table_checksum",
    "poisson_bootstrap",
    "weighted_median",
    "join_size_estimate",
    "benford_digits",
    "feature_hashing",
    "lm_doc_score",
    "triangle_stats",
    "pagerank_copurchase",
    "linkpred_common_neighbors",
    "kcore_peel",
    "resample_interpolate",
    "cusum_anomaly",
    "series_correlation",
    "column_profile",
    "quantile_normalize",
    "topk_orders",
    "distinct_segments",
    "set_except_customers",
    "set_intersect_customers",
    "full_outer_orders",
    "right_join_orders",
    "window_rank_topn",
    "cube_revenue",
    "pivot_priority_revenue",
    "monthly_revenue",
    # ---- window boundary (driver checks ~50) ----
    # -- the remaining 22 r5-stale keys (round-10 window, per plan above) --
    "string_ops",
    "case_when_bands",
    "above_nation_avg",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q10_returned_items",
    "window_distribution_funcs",
    "pareto_frontier",
    "null_ops",
    "scd2_snapshot_diff",
    "sql_text_api",
    "union_rule_accumulation",
    "rollup_revenue",
    "fraud_flag_events",
    "pit_join_events",
    "scd3_update",
    "tpch_q4_order_priority",
    "tpch_q14_promo_share",
    "tpch_q16_supplier_variety",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive_revenue",
    "tpch_q22_dormant_customers",
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
