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
# registered queries (r1-r5 each checked exactly the first 50). Round-6
# rotation executes the plan committed in r5 (VERDICT r5 #1) verbatim —
# CORRECTNESS_r05 was 50/50 green (zero reds to re-run), so the window is:
#   1-22  the 22 round-5 gates that have NEVER been driver-checked
#         (appended below the frozen window last round by design);
#   23-50 the first 28 of the 34 r2-stale keys (sessionize, tpch_q12/q18,
#         json_props_stats, the dedup/text/sampling core,
#         quantity_percentiles .. pii_redact_names).
# After position 50: the remaining 6 r2-stale keys (seq_packing ..
# merge_upsert), then family order (stalest-family first — the 46 r3-stale
# keys). Registry additions this round are again appended BELOW the window.
#
# ROUND-7 ROTATION PLAN (write it now so the next session executes, not
# re-derives): assuming CORRECTNESS_r06 goes green on this window, the r7
# priority list should be (1) any r6 reds, fixed, first; (2) the 6 remaining
# r2-stale keys (seq_packing, eval_contamination, resample_ffill,
# hopping_window_stats, integrity_checks, merge_upsert); (3) ~40 of the 46
# r3-stale keys (countmin_heavy_hitters .. tpch_q21_waiting_suppliers —
# `tools/rotation_check.py` lists them); (4) any round-6 additions, stalest
# first. That clears all pre-r4 evidence debt in one more round.
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

# Keys verified first this round (never-driver-checked first, then r2-stale).
_PRIORITY_KEYS = (
    # -- 1-22: the round-5 additions, never driver-checked (VERDICT r5 #1) --
    "ab_proportion_test",
    "mad_outliers",
    "groupwise_mode",
    "ols_two_features",
    "winsorized_stats",
    "ratio_to_report",
    "exact_median_2pass",
    "lift_gains_table",
    "kaplan_meier_survival",
    "editdist_topk",
    "phrase_search",
    "sssp_weighted",
    "asof_join_nearest",
    "rolling_median_7d",
    "cumulative_distinct_users",
    "seasonal_baseline_dev",
    "session_window_builtin",
    "golden_record_merge",
    "salted_join_agg",
    "attribution_linear",
    "pca_power_iteration",
    "multimodal_gif_features",
    # -- 23-50: first 28 of the 34 r2-stale keys --
    "sessionize",
    "tpch_q12_priority_class",
    "tpch_q18_large_orders",
    "json_props_stats",
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
    "quantity_percentiles",
    "rolling_7day_window",
    "embedding_hof_stats",
    "unpivot_line_metrics",
    "doc_word_topk",
    "grouping_sets_revenue",
    "incremental_monthly_rollup",
    "lang_id_markers",
    "doc_fingerprint",
    "text_bpe_tokens",
    "doc_chunk_windows",
    "doc_repetition_ratio",
    "pii_redact_names",
    # ---- window boundary (driver checks ~50) ----
    # -- the remaining 6 r2-stale keys (round-7 window, per the plan above) --
    "seq_packing",
    "eval_contamination",
    "resample_ffill",
    "hopping_window_stats",
    "integrity_checks",
    "merge_upsert",
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
