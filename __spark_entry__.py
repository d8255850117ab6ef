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
# coverage policy. Round-7 rotation — ACTUAL composition (3 + 9 + 1 +
# 37 = 50; keep these counts in sync with the list, next round's
# rotation is planned from them):
#  - 3 never-regressed anchors (ETL kernel — also the required
#    etl-family representative — the R1-R14 e2e, and the relational
#    flagship),
#  - 9 entries whose IMPLEMENTATION changed this round and must be
#    re-proven: 7 micro-nat quantized ln-reduces
#    (unigram/bigram_surprisal_scores, stupid_backoff_scores,
#    token_entropy_per_source, heldout_perplexity_eval,
#    math_functions, scalar_kitchen_sink) and the 2 pair generators
#    that now WIRE the DF_CAP stop-shingle filter
#    (sparse_cosine_pairs, containment_dup_pairs),
#  - 1 family-coverage slot: key_skew_audit (the only skew_plan-family
#    entries are r06-green; the window must keep a skew_plan rep),
#  - 37 never-driver-verified entries from the round-7 queue,
#    including multimodal_feature_extract — whose r06 bookkeeping note
#    "(r04-green)" was WRONG (its only driver row ever was an r02
#    no_oracle err; the r06 verdict caught the error and it now takes
#    a window slot) — and the 4 entries round 6 deferred
#    (rfm_segmentation, mad_outlier_census, benford_first_digit_audit,
#    markov_transition_matrix, first in line as promised).
# ROUND-8 ROTATION PLAN (write the r08 window from this): keep the 3
# anchors + any round-8-changed entries; take the 28 queue remainders
# — the 10 deferred this round (sql_udf_functions, l_diversity_audit,
# theil_sen_trend, seasonal_naive_backtest, shrunk_rate_estimates,
# dbscan_core_census, simpsons_paradox_scan, psi_drift_audit,
# kendall_tau_rank_corr, abtest_two_proportion_z) plus the 18 NEW
# round-7 operators (kneser_ney_bigram_scores, collocation_llr_pairs,
# cross_source_leakage_matrix, lsh_band_tuning_audit,
# positional_template_drift, centroid_shift_drift,
# good_turing_estimates, cdc_chunk_dedup, minhash_estimate_error_audit,
# dedup_cluster_source_mix, quantile_normalization_map,
# jaccard_threshold_sweep, split_balance_audit, bootstrap_mean_ci,
# levenshtein_near_dup, payload_magic_byte_census,
# graph_common_neighbors_linkpred, peak_concurrency_census), all t2-sim green
# at sf0.01 this round — which drives never-driver-verified to 0 (28
# queue entries + ~19 staleness slots fit in one window); fill the
# remaining slots with the STALEST greens, r03-first
# (flatten_props, conform_projection, seq_extraction,
# mango_selector_filter, delete_propagation, full_text_relevance,
# bm25_relevance, minhash_lsh_candidates, simhash_near_dup,
# ngram_jaccard_pairs, embedding_near_dup, json_functions,
# string_functions, knn_cosine_topk, exact_dedup, and the other
# r03-window survivors), then r04 greens if slots remain.
#    Displaced to fit this round (r06-green, still t2-sim checked):
#    event_debounce, udtf_token_runs, knn_label_purity,
#    retrieval_eval_mrr, point_in_time_features,
#    pq_quantization_audit, temperature_sampling_weights,
#    rolling_active_users, cooccurrence_pmi_pairs,
#    multimodal_audio_framing, contrastive_pair_mining,
#    span_corruption_census, source_tvd_matrix, kn_continuation_counts,
#    doc_boundary_overlap, best_of_n_selection, preference_pair_harvest,
#    embedding_gram_matrix, vocab_coverage_curve, modality_pairing_audit,
#    count_min_sketch_audit, bloom_filter_build_audit,
#    conversion_attribution, skyline_cheap_early_orders, ks_drift_doclen,
#    mannwhitney_drift_doclen, chi2_term_keyness, event_lateness_census,
#    cms_join_size_audit, mixture_epoch_plan, score_calibration_bins,
#    gopher_quality_flags, feature_hashing_vectorizer,
#    heaps_law_vocab_growth, random_projection_audit,
#    dsir_importance_weights, pca_power_iteration,
#    event_pattern_regex_census, scd2_point_in_time_join,
#    source_kl_divergence, binary_classifier_confusion.
# Every entry outside the window stays registered, oracle-checked by
# tests/t2_sim.py, pytest-covered, and bench-timed.
PRIORITY = [
    # --- 3 anchors (green in every round they ran; latest_event_per_user
    # is also the window's required etl-family representative) ---
    "latest_event_per_user",
    "warehouse_e2e_pipeline",
    "pricing_summary",
    # --- 9 changed-this-round entries (re-prove the new impl) ---
    "unigram_surprisal_scores",
    "bigram_surprisal_scores",
    "stupid_backoff_scores",
    "token_entropy_per_source",
    "heldout_perplexity_eval",
    "math_functions",
    "scalar_kitchen_sink",
    "sparse_cosine_pairs",
    "containment_dup_pairs",
    # --- 1 family-coverage slot (skew_plan rep; r06-green) ---
    "key_skew_audit",
    # --- 37 never-driver-verified (the round-7 queue) ---
    "rfm_segmentation",
    "mad_outlier_census",
    "benford_first_digit_audit",
    "markov_transition_matrix",
    "multimodal_feature_extract",
    "zipf_frequency_spectrum",
    "referential_integrity_audit",
    "user_activity_streaks",
    "weighted_sample_topk",
    "bleu_ngram_eval",
    "ngram_novelty_audit",
    "tokenizer_fertility_by_lang",
    "burstiness_fano_census",
    "jackknife_source_sensitivity",
    "text_normalization_census",
    "predicate_delete_cdc",
    "markov_conditional_entropy",
    "funnel_latency_percentiles",
    "shipping_lag_census",
    "normalized_dedup_gain",
    "ann_shard_balance_plan",
    "boilerplate_suffix_census",
    "star_flatten_export",
    "gini_source_concentration",
    "waterfill_budget_allocation",
    "equidepth_histogram_bounds",
    "ngram_entropy_rate",
    "stop_shingle_cap_audit",
    "incremental_dedup_probe",
    "multimodal_phash_buckets",
    "mutual_information_audit",
    "functional_dependency_audit",
    "event_autocorrelation",
    "cusum_changepoint_scan",
    "churn_hazard_table",
    "embedding_dim_stats_audit",
    "retrieval_eval_ndcg",
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
