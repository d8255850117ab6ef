"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`couchwarehouse_spark.plans` — the registry of
implemented operators from SURVEY.md §2. The driver's verify runs
``entry(spark)`` as a smoke check, runs each ``queries()[name]`` at
sf=0.01 and compares against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Importing the plan modules populates the registry.
import couchwarehouse_spark.plans.all  # noqa: F401
from couchwarehouse_spark.plans import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


# The driver evaluates the FIRST 50 registered queries, so ordering is
# coverage policy. Round-8 rotation — ACTUAL composition (3 anchors +
# 2 changed + 12 new + 1 family + 27 queue + 5 stalest = 50),
# executing round 7's written plan: the full 28-entry
# never-driver-verified queue (10 r7-deferred + 18 r7-new; KN counts
# in the changed group below since its quantization moved to
# nano-nats this round) plus this round's new/changed entries, which
# drives never-driver-verified to 0 for all 249 pre-round entries —
# cumulative driver coverage 250/250 once this window lands.
#  - 3 never-regressed anchors (ETL kernel — also the required
#    etl-family representative — the R1-R14 e2e, and the relational
#    flagship),
#  - 2 entries whose IMPLEMENTATION changed this round and must be
#    (re-)proven: kneser_ney_bigram_scores (micro → NANO-nat term
#    quantization, r7 verdict #1 — also the last r7-new queue entry)
#    and stop_shingle_cap_audit (parallelized doc scan, r7 verdict
#    #4 — r07-green before the change),
#  - 12 NEW entries: warehouse_split_transform_e2e (R5 transform
#    hook + R8 split routing under the oracle gate, r7 verdict #6 —
#    the last two R-tier behaviors that were pytest-only), the 5-test
#    statistics batch (spearman/welch/anova/t-closeness/Cramér's V),
#    the 3 k-NN graph kernels (mutual-NN, k-core, assortativity), 2
#    multimodal planners (aspect buckets, vision token budget), and
#    readability_fog_census — every operator added this round is
#    driver-verified the round it lands,
#  - 1 family-coverage slot: key_skew_audit (the only skew_plan
#    entry family-eligible; the window must keep a skew_plan rep),
#  - 27 remaining queue entries (10 r7-deferred + 17 r7-new),
#  - 5 STALEST greens: the r02-window survivors never re-verified
#    since round 2 (staleness computed from CORRECTNESS_r01..r07
#    last-green rounds — these predate the verdict's r03-first list).
#    Only the 5 alphabetically-first fit after this round's 12 new
#    entries claimed their slots; the other 12 r02 survivors
#    (doc_length_histogram, domain_mixture_weights, no_big_order_anti,
#    order_cohort_full_outer, price_band_join, priority_multiset_diff,
#    range_frame_revenue, rollup_priority_status, set_except_nations,
#    set_intersect_brands, set_union_nations, top_revenue_orders) are
#    displaced to round 9 — new-operator coverage outranks
#    re-verification, the round-7 precedent.
# ROUND-9 ROTATION PLAN (write the r09 window from this): keep the 3
# anchors + any round-9-changed entries; window any round-8-new
# operators not yet driver-verified — the post-window r8 additions:
# market_basket_lift_pairs, cuped_adjusted_abtest,
# conformal_interval_coverage, two_way_effects_decomposition,
# burrows_delta_stylometry, holt_linear_backtest,
# mmr_diversified_rerank, pseudo_relevance_feedback,
# column_profile_audit, try_functions, length_bucket_packing_plan,
# bradley_terry_strengths, rolling_median_7d, event_trigram_paths,
# markov_removal_attribution, quantile_treatment_effects,
# streaming_window_counts_e2e, streaming_dedup_e2e,
# warehouse_streaming_ingest_e2e, mann_kendall_trend,
# mcnemar_paired_test
# (21 total, all t2-sim green at both SFs this round); then stalest
# greens — the 12
# displaced r02 survivors first (list above), then the r03 cohort (agg_stats, array_functions, asof_last_view,
# bm25_relevance, big_spenders_semi, cte_above_avg_customers,
# deterministic_split, doc_chunking, embedding_near_dup,
# flatten_props, full_text_relevance, graph_pagerank_step,
# grouping_sets_orders, hybrid_search_rrf,
# incremental_agg_maintenance, ivf_topk, json_functions,
# language_id_heuristic, multimodal_metadata, near_dup_clusters,
# ngram_jaccard_pairs, pandas_udf_disc_price, percentile_stats,
# recursive_cte_month_spine, repetition_census, seq_extraction,
# sequence_packing, session_window_stats, simhash_near_dup,
# sliding_window_counts, snapshot_cdc, string_functions,
# tf_idf_top_terms, user_pseudonymization, vocab_oov_audit,
# window_top_orders), then r04 greens if slots remain.
# Every entry outside the window stays registered, oracle-checked by
# tests/t2_sim.py, pytest-covered, and bench-timed.
PRIORITY = [
    # --- 3 anchors (green in every round they ran; latest_event_per_user
    # is also the window's required etl-family representative) ---
    "latest_event_per_user",
    "warehouse_e2e_pipeline",
    "pricing_summary",
    # --- 2 changed-this-round entries (re-prove the new impl) ---
    "kneser_ney_bigram_scores",
    "stop_shingle_cap_audit",
    # --- 12 new-this-round entries ---
    "warehouse_split_transform_e2e",
    "spearman_rank_corr",
    "welch_t_doclen",
    "anova_doclen_by_source",
    "t_closeness_audit",
    "cramers_v_matrix",
    "mutual_knn_pairs",
    "kcore_decomposition",
    "degree_assortativity",
    "aspect_bucket_plan",
    "vision_token_budget",
    "readability_fog_census",
    # --- 1 family-coverage slot (skew_plan rep; r07-green) ---
    "key_skew_audit",
    # --- 10 r7-deferred queue entries ---
    "sql_udf_functions",
    "l_diversity_audit",
    "theil_sen_trend",
    "seasonal_naive_backtest",
    "shrunk_rate_estimates",
    "dbscan_core_census",
    "simpsons_paradox_scan",
    "psi_drift_audit",
    "kendall_tau_rank_corr",
    "abtest_two_proportion_z",
    # --- 17 r7-new queue entries (KN is in the changed group above) ---
    "collocation_llr_pairs",
    "cross_source_leakage_matrix",
    "lsh_band_tuning_audit",
    "positional_template_drift",
    "centroid_shift_drift",
    "good_turing_estimates",
    "cdc_chunk_dedup",
    "minhash_estimate_error_audit",
    "dedup_cluster_source_mix",
    "quantile_normalization_map",
    "jaccard_threshold_sweep",
    "split_balance_audit",
    "bootstrap_mean_ci",
    "levenshtein_near_dup",
    "payload_magic_byte_census",
    "graph_common_neighbors_linkpred",
    "peak_concurrency_census",
    # --- 5 stalest greens (r02-window survivors; the other 12 r02
    # survivors are displaced to round 9 by this round's new ops) ---
    "balance_distribution_ranks",
    "crossdoc_ngram_dup",
    "cube_flag_status",
    "customer_order_gaps",
    "distinct_segments",
]


def _ordered(mapping: dict) -> dict:
    head = {n: mapping[n] for n in PRIORITY if n in mapping}
    tail = {n: mapping[n] for n in sorted(mapping) if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query. The driver treats omitted keys
    as rows-only checks, but this repo registers an oracle for EVERY
    entry (enforced by tests/test_registry_contract.py)."""
    return _ordered(dict(ORACLES))
