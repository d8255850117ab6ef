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
# coverage policy. Round-6 rotation — ACTUAL composition (3 + 2 + 13
# + 14 + 11 + 7 = 50; keep these counts in sync with the list, next
# round's rotation is planned from them):
#  - 3 never-regressed anchors (ETL kernel — also the required
#    etl-family representative — the R1-R14 e2e, which exercises the
#    new CHECK-constraint hook in the merge path, and the relational
#    flagship),
#  - 2 entries whose IMPLEMENTATION changed this round and must be
#    re-proven (event_debounce — microsecond-exact gaps;
#    udtf_token_runs — per-call view/UDTF names),
#  - 13 operators new early this round (never driver-verified by
#    construction),
#  - 14 operators new mid-round (batches 2-5: source TVD, KN
#    continuation, boundary overlap, best-of-n, preference pairs,
#    Gram matrix, vocab curve, held-out LM eval, modality pairing,
#    CMS audit, Bloom audit, conversion attribution, skyline, KS
#    drift),
#  - 11 operators new LATE this round (batches 6-7: Mann-Whitney, χ²
#    keyness, lateness census, CMS join-size, epoch planner,
#    calibration bins, containment pairs, Gopher census, feature
#    hashing, Heaps' law, JL projection audit),
#  - 7 operators from batches 8-10 (DSIR, PCA matvec, stupid backoff,
#    event-pattern regex census, SCD2 point-in-time join, source KL
#    divergence, classifier confusion).
#    The window covers every never-driver-verified entry EXCEPT the
#    four lowest-divergence-risk ones, deferred to round 7 (all
#    t2-sim green, first in line next round): rfm_segmentation and
#    mad_outlier_census (R17 passthroughs — the same ANSI text runs
#    in both engines), benford_first_digit_audit (integer-cents digit
#    census with inlined Benford constants), and
#    markov_transition_matrix (integer-exact transition counts,
#    model-checked in tests).
# ROUND-7 ROTATION QUEUE (never driver-verified; all t2-sim green at
# sf0.01 this round): the 4 deferred above plus the late-round-6
# batches 11-15 — zipf_frequency_spectrum, referential_integrity_audit,
# user_activity_streaks, weighted_sample_topk, bleu_ngram_eval,
# ngram_novelty_audit, tokenizer_fertility_by_lang,
# burstiness_fano_census, jackknife_source_sensitivity,
# text_normalization_census, predicate_delete_cdc,
# markov_conditional_entropy, funnel_latency_percentiles,
# shipping_lag_census, normalized_dedup_gain, ann_shard_balance_plan,
# boilerplate_suffix_census, star_flatten_export,
# gini_source_concentration, waterfill_budget_allocation,
# equidepth_histogram_bounds, ngram_entropy_rate,
# stop_shingle_cap_audit, incremental_dedup_probe,
# multimodal_phash_buckets, mutual_information_audit,
# functional_dependency_audit, event_autocorrelation,
# cusum_changepoint_scan, abtest_two_proportion_z,
# churn_hazard_table, embedding_dim_stats_audit,
# retrieval_eval_ndcg, l_diversity_audit, theil_sen_trend,
# seasonal_naive_backtest, shrunk_rate_estimates,
# dbscan_core_census, simpsons_paradox_scan, psi_drift_audit,
# kendall_tau_rank_corr, sql_udf_functions (45 total — more than one window's spare
# capacity, so round 7 rotates ~30 in and round 8 takes the rest).
# Keep the 3 anchors + any round-7-changed entries, fill the rest
# with this queue, then backfill with the stalest greens
# (r03-and-earlier).
#    Displaced to fit (all r05-green and still t2-sim checked):
#    anchors conform_projection, scd2_user_state_history,
#    mango_selector_filter, minhash_lsh_candidates,
#    delete_propagation, time_travel_cdc, nation_revenue,
#    tumbling_window_counts, exact_dedup, knn_cosine_topk;
#    multimodal_feature_extract (r04-green); the 7 round-6 staleness
#    slots (price_band_join, rollup_priority_status,
#    top_revenue_orders, agg_stats, array_functions, asof_last_view,
#    percentile_stats). Next round's staleness rotation starts from
#    the r03-and-earlier greens.
# Every entry outside the window stays registered, oracle-checked by
# tests/t2_sim.py, pytest-covered, and bench-timed.
PRIORITY = [
    # --- 3 anchors (green in every round they ran; latest_event_per_user
    # is also the window's required etl-family representative) ---
    "latest_event_per_user",
    "warehouse_e2e_pipeline",
    "pricing_summary",
    # --- 2 changed-this-round entries (re-prove the new impl) ---
    "event_debounce",
    "udtf_token_runs",
    # --- 13 NEW operators this round ---
    "knn_label_purity",
    "retrieval_eval_mrr",
    "bigram_surprisal_scores",
    "sparse_cosine_pairs",
    "point_in_time_features",
    "key_skew_audit",
    "pq_quantization_audit",
    "temperature_sampling_weights",
    "rolling_active_users",
    "cooccurrence_pmi_pairs",
    "multimodal_audio_framing",
    "contrastive_pair_mining",
    "span_corruption_census",
    # --- 14 NEW operators, batches 2-5 this round ---
    "source_tvd_matrix",
    "kn_continuation_counts",
    "doc_boundary_overlap",
    "best_of_n_selection",
    "preference_pair_harvest",
    "embedding_gram_matrix",
    "vocab_coverage_curve",
    "heldout_perplexity_eval",
    "modality_pairing_audit",
    "count_min_sketch_audit",
    "bloom_filter_build_audit",
    "conversion_attribution",
    "skyline_cheap_early_orders",
    "ks_drift_doclen",
    # --- 11 NEW operators, batches 6-7 this round ---
    "mannwhitney_drift_doclen",
    "chi2_term_keyness",
    "event_lateness_census",
    "cms_join_size_audit",
    "mixture_epoch_plan",
    "score_calibration_bins",
    "containment_dup_pairs",
    "gopher_quality_flags",
    "feature_hashing_vectorizer",
    "heaps_law_vocab_growth",
    "random_projection_audit",
    # --- 7 NEW operators, batches 8-10 this round ---
    "dsir_importance_weights",
    "pca_power_iteration",
    "stupid_backoff_scores",
    "event_pattern_regex_census",
    "scd2_point_in_time_join",
    "source_kl_divergence",
    "binary_classifier_confusion",
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
