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
# registered queries (r1-r9 each checked exactly the first 50). Round-10
# rotation executes the committed plan (VERDICT r9 "Next round" #1, written
# at r9 close): CORRECTNESS_r09 was 50/50 green with zero reds, so the
# window is:
#   1-2   the 2 round-9 additions that have never been driver-checked
#         (quality_classifier_nb, crosslingual_dedup — both green in the
#         r9 judge's own sf0.01 rehearsal);
#   3-24  the 22 remaining r5-stale keys (string_ops ..
#         tpch_q22_dormant_customers, rotation_check order);
#   25-26 the 2 round-10 additions (tokenizer_fertility, ann_recall_audit
#         — the r9 judge's shortlist (a)+(b)), placed INSIDE the window so
#         they are driver-checked in the round that ships them (VERDICT r9
#         #3 allows either side; in-window leaves zero never-checked keys
#         at close);
#   27-50 the first 24 r6-stale keys (quantity_percentiles ..
#         doc_repetition_ratio, rotation_check stalest-first order).
# After position 50: the remaining 26 r6-stale keys (pii_redact_names ..
# json_props_stats), then family order (the r7 cohort). This clears r5
# debt entirely; staleness floor after r10 is r6 (26 keys carry).
#
# Round-10 additions used 2 of the 5 throttled slots — registry 225 at
# close (<= 228 per the standing <=5-per-round convention).
#
# ROUND-11 ROTATION PLAN (written now so the next session executes, not
# re-derives): assuming CORRECTNESS_r10 goes green on this window, the r11
# priority list should be (1) any r10 reds, fixed, first; (2) the 26
# remaining r6-stale keys (pii_redact_names .. json_props_stats, already
# ordered below); (3) the first ~24 r7-stale keys stalest-first per
# `tools/rotation_check.py` (countmin_heavy_hitters ..). That clears r6
# debt entirely and makes max staleness r7 at round-11 open.
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
    # -- 1-2: the round-9 additions, never driver-checked (VERDICT r9 #1) --
    "quality_classifier_nb",
    "crosslingual_dedup",
    # -- 3-24: the 22 remaining r5-stale keys (rotation_check order) --
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
    # -- 25-26: the round-10 additions (driver-checked in their own round) --
    "tokenizer_fertility",
    "ann_recall_audit",
    # -- 27-50: first 24 of the 50 r6-stale keys (rotation_check order) --
    "quantity_percentiles",
    "rolling_7day_window",
    "embedding_hof_stats",
    "unpivot_line_metrics",
    "doc_word_topk",
    "grouping_sets_revenue",
    "incremental_monthly_rollup",
    "ab_proportion_test",
    "mad_outliers",
    "groupwise_mode",
    "ols_two_features",
    "winsorized_stats",
    "ratio_to_report",
    "exact_median_2pass",
    "lift_gains_table",
    "kaplan_meier_survival",
    "text_token_stats",
    "text_quality",
    "lang_id_markers",
    "doc_fingerprint",
    "text_bpe_tokens",
    "curation_pipeline",
    "doc_chunk_windows",
    "doc_repetition_ratio",
    # ---- window boundary (driver checks ~50) ----
    # -- the remaining 26 r6-stale keys (round-11 window, per plan above) --
    "pii_redact_names",
    "editdist_topk",
    "phrase_search",
    "sssp_weighted",
    "asof_join_nearest",
    "rolling_median_7d",
    "cumulative_distinct_users",
    "seasonal_baseline_dev",
    "session_window_builtin",
    "train_test_split",
    "stratified_sample",
    "dedup_exact",
    "dedup_bow_fingerprint",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "fuzzy_name_pairs",
    "golden_record_merge",
    "salted_join_agg",
    "attribution_linear",
    "pca_power_iteration",
    "multimodal_gif_features",
    "sessionize",
    "tpch_q12_priority_class",
    "tpch_q18_large_orders",
    "json_props_stats",
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
