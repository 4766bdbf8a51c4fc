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
# registered queries (r1-r11 each checked exactly the first 50). Round-12
# rotation executes the committed r11 plan AMENDED by the r11 verdict's
# systemic finding: *edited-since-last-green-driver-check* outranks *merely
# old* (json_props_stats was edited r9, sat outside the r9-r10 windows, and
# failed its first post-edit driver check in r11). tools/rotation_check.py
# now derives that class from git at function+oracle+helper granularity;
# the window below is its output:
#   1     json_props_stats — the r11 red, fixed this round (k_sum
#         DECIMAL(38,0) → double, VARCHAR-routed oracle; VERDICT r11 #1);
#   2-4   keys edited THIS round (dedup_simhash 64-bit shingle rework,
#         dedup_recall_audit, domain_mix_reweight — advice NULL guard);
#   5-27  every other edited-since-check key, stalest first: the r11
#         verdict's explicit shortlist (ann_recall_audit, knn_ivf,
#         knn_ivf_pq, knn_pq_adc, pq_encode — VERDICT r11 #2) plus the
#         keys the new tool surfaced beyond it (crosslingual_dedup,
#         dedup_minhash_mllib .. window_lag_seq);
#   28-31 the 4 round-12 additions (knn_ivf_pq_rerank — VERDICT r11 #6;
#         url_host_dedup — VERDICT r11 #7; dedup_cluster_sizes — the
#         dup-multiplicity spectrum; source_overlap_matrix — cross-source
#         duplicate containment), in-window per precedent;
#   32-48 the 17 remaining never-edited r7-stale keys (data_skew_profile
#         .. join_residual_ineq) — clears r7 debt entirely;
#   49-50 the first 2 r8-stale keys (approx_distinct_kmv,
#         zscore_outliers).
# After position 50: the next r8-stale keys in rotation_check order, so
# any budget overflow lands next-stalest, then family order. Staleness
# floor after r12 is r8 (~40 keys carry).
#
# Round-12 additions used 4 of the 5 throttled slots — registry 231 at
# close (<= 232 per the standing <=5-per-round convention).
#
# ROUND-13 ROTATION PLAN (written now so the next session executes, not
# re-derives): (1) any r12 reds, fixed, first; (2) any keys
# tools/rotation_check.py marks *edited* at r13 open (it reads git — run
# it, don't guess); (3) the remaining ~36 r8-stale keys stalest-first
# (drift_ks_test, trend_slope_ols, .. — positions 51+ below hold the
# first 12); (4) r9-stale keys with whatever budget remains. That clears
# r8 debt and makes max staleness r9 at round-13 close.
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

# Keys verified first this round (edited-since-check first, then stalest;
# new gates in-window).
# OPTIMIZATION ROUND AMENDMENT (r12-opt): the optimization pass edited the
# defining code of 70 gates (fan_out/fan_out_by plan reshaping, the
# explode_outer fix, loop restructuring), which overflows the ~50-key
# window the edited-since-check discipline assumes. The window below is
# tools/rotation_check.py's ranking restated for that case: the 4 gates
# with NO driver evidence yet (added after the r11 driver run) first,
# then edited keys stalest-green-first — every slot holds a key whose
# last driver evidence predates its current code. The 24 edited keys
# that do not fit carry r10/r11 driver evidence (the freshest tiers) and
# were all oracle-rehearsed green at sf0.01 after their edits this
# round; they are the next-round window's head if any show red.
_PRIORITY_KEYS = (
    # -- no driver evidence yet (post-r11 additions) --
    "knn_ivf_pq_rerank",
    "url_host_dedup",
    "dedup_cluster_sizes",
    "source_overlap_matrix",
    # -- edited since last green check, stalest evidence first --
    "json_props_stats",
    "dedup_minhash_mllib",
    "dedup_prefix_jaccard",
    "dedup_incremental",
    "semantic_dedup",
    "knn_brute_force",
    "knn_lsh",
    "embedding_cosine_pairs",
    "knn_ivf",
    "knn_lsh_multiprobe",
    "label_centroid_assign",
    "multimodal_frame_sample",
    "kmv_set_ops",
    "dedup_clusters",
    "dedup_canonical_pick",
    "dedup_signature_est",
    "doc_novelty_score",
    "inverted_index",
    "keyword_search_topk",
    "bpe_merge_step",
    "bm25_topk",
    "classifier_eval",
    "bfs_distance",
    "assoc_rules",
    "minhash_containment",
    "pq_encode",
    "knn_pq_adc",
    "knn_ivf_pq",
    "hybrid_search_rrf",
    "window_lag_seq",
    "poisson_bootstrap",
    "feature_hashing",
    "lm_doc_score",
    "dsir_importance_weights",
    "triangle_stats",
    "pagerank_copurchase",
    "linkpred_common_neighbors",
    "kcore_peel",
    "record_linkage_fs",
    "multimodal_png_features",
    "multimodal_jpeg_features",
    "multimodal_jpeg_color",
    "crosslingual_dedup",
    "ann_recall_audit",
    "text_token_stats",
    "text_quality",
    # ---- window boundary (driver checks ~50) ----
    # -- carryover of the former window (r7/r8-stale, un-edited) --
    "dedup_simhash",
    "dedup_recall_audit",
    "domain_mix_reweight",
    "data_skew_profile",
    "k_anonymity_profile",
    "l_diversity_events",
    "merge_upsert",
    "domain_mix_sample",
    "per_source_cap",
    "range_join_events",
    "funnel_steps",
    "retention_cohorts",
    "pricing_summary",
    "groupby_having_countdistinct",
    "groupby_max",
    "join_3hop_agg",
    "left_join_count",
    "anti_join",
    "semi_join",
    "join_residual_ineq",
    "approx_distinct_kmv",
    "zscore_outliers",
    "equidepth_histogram",
    "incremental_join_view",
    "drift_ks_test",
    "trend_slope_ols",
    "auc_mann_whitney",
    "decision_stump_train",
    "bloom_filter_probe",
    "wasserstein_1d",
    "top_value_share",
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
