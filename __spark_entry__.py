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
# coverage policy. Round-9 rotation — ACTUAL composition (3 anchors +
# 2 changed + 12 new + 9 late-new + 21 queue + 1 family + 2 r03 =
# 50), executing round 8's written plan: the full 21-entry
# never-driver-verified r8 queue (every r8 operator that landed after
# the r8 window was written, incl. the three streaming e2e entries),
# plus this round's new/changed entries, which drives cumulative
# driver coverage to 282/285-of-the-r8-registry once this window
# lands (the remaining r03+ greens rotate next round). The 9
# stalest-r02 re-verification slots were displaced by the nine
# late-round-9 operators (new-operator coverage outranks
# re-verification — the r7/r8 precedent); they move to the FRONT of
# the round-10 queue below.
#  - 3 never-regressed anchors (ETL kernel — also the required
#    etl-family representative — the R1-R14 e2e, and the relational
#    flagship),
#  - 2 entries whose IMPLEMENTATION changed this round and must be
#    re-proven: welch_t_doclen and anova_doclen_by_source (ANSI
#    divide-by-zero guards, ADVICE r8 — nullif in both lanes; their
#    queue-mates mann_kendall_trend and holt_linear_backtest also
#    changed but already sit in the 21-entry queue below),
#  - 6 NEW entries: streaming_interval_join_e2e (watermarked
#    stream-stream interval join under the oracle gate, r8 verdict
#    #4a), streaming_session_state_e2e (applyInPandasWithState
#    event-time session-ization under the oracle gate, r8 verdict
#    #4b), zorder_relayout_e2e (OPTIMIZE ZORDER relayout + range
#    query, r8 verdict #4c), streaming_static_enrich_e2e
#    (stream-static broadcast-dim enrichment join under the oracle
#    gate), gini_token_concentration (integer-exact Lorenz/Gini
#    corpus-concentration audit), abtest_power_mde (two-proportion
#    power analysis with literal normal quantiles),
#    sprt_boundary_scan (Wald sequential test path in integer
#    nano-nats) and temporal_split_audit (chronological split census
#    with user-level leakage rates) and partition_modularity (Newman
#    Q of the IVF-cell partition over the kNN graph) and
#    text_artifact_census (mojibake/control/markup cleanliness gate),
#    streaming_left_interval_join_e2e (LEFT outer stream-stream join
#    whose NULL-emission horizon — min-across-sources watermark — is
#    encoded in the oracle) and embedding_isotropy_audit (collapsed-
#    embedding diagnostic over micro-quantized integer reduces) —
#    every operator added this round is driver-verified the round it
#    lands,
#  - 9 LATE-NEW entries (landed after the window above was written;
#    window slots taken from the stalest-r02 block, r7/r8 precedent):
#    benjamini_hochberg_fdr (step-up FDR over integer-quantized
#    Chernoff p-values), brown_forsythe_variance (median-centered
#    Levene with integer |2x - med2| deviations),
#    kmv_distinct_audit (K-minimum-values sketch, k-th hash crosses
#    the oracle exactly), kaplan_meier_survival (product-limit
#    survival in cumulative integer nano-nats),
#    did_estimator (difference-in-differences over cent-quantized
#    cells), ipw_treatment_effect (Horvitz-Thompson stratum terms in
#    integer micro units vs the deliberately confounded naive mean),
#    roc_auc_rank (tie-exact Mann-Whitney AUC over micro-quantized
#    scores), hits_hub_authority (two integer HITS iterations on the
#    k-NN graph) and jensen_shannon_sources (pairwise bounded JSD,
#    closed-form disjoint mass). TWENTY-SEVEN further round-9
#    operators are t2-sim green at sf0.001/0.01/0.1 and queue for
#    round 10:
#    cohens_kappa_raters, retrieval_eval_map, lm_dirichlet_relevance,
#    fleiss_kappa_multirater, ewma_control_chart (dyadic lambda=1/2,
#    scaled-integer recursion), adamic_adar_linkpred,
#    textrank_keywords (per-iteration micro-quantized word-graph
#    PageRank), item_cooccurrence_cf (basket-keyed item-item cosine),
#    fellegi_sunter_linkage (blocked pair census scored by exact
#    log-likelihood-ratio weights), logrank_test (two-sample survival
#    inference over the KM grid), lead_lag_xcorr (cross-correlation
#    at lags over daily series), brier_decomposition (Brier + ECE
#    + Murphy reliability/resolution/uncertainty), cochrans_q_test
#    (k-rater marginal exchangeability), friedman_rank_test
#    (nonparametric repeated-measures blocks), kmv_set_operations
#    (sketch Jaccard/intersection algebra), consistent_hash_rebalance
#    (mod vs ring moved-key audit), dau_wau_stickiness (exact sliding
#    distinct actives), dow_seasonality_strength (eta-squared weekly
#    variance share), qini_uplift_curve (uplift-model eval deciles),
#    neyman_allocation_plan (optimal stratified-sample design),
#    hodges_lehmann_shift (pairwise-median via integer histogram
#    convolution), cliff_delta_effect (tie-exact ordinal effect
#    size), runs_test_randomness (Wald-Wolfowitz regime screen),
#    knn_hubness_audit (in-degree skewness ANN pathology probe),
#    kruskal_wallis_doclen (k-sample rank ANOVA from value
#    histograms), wasserstein_doclen_drift (integer-numerator
#    earth-mover drift) and binary_segmentation_split (offline
#    changepoint argmax),
#  - 21 r8-queue entries: the post-window r8 additions, all t2-sim
#    green at both SFs in r8 AND independently re-verified by the r8
#    judge (VERDICT.md) — their first driver window,
#  - 1 family-coverage slot: key_skew_audit (the only skew_plan
#    entry family-eligible; the window must keep a skew_plan rep),
#  - 2 r03 family reps: embedding_near_dup and multimodal_metadata
#    (the window's dedup and multimodal_plan family reps; the other
#    r02 survivors — doc_length_histogram, domain_mixture_weights,
#    no_big_order_anti, order_cohort_full_outer, price_band_join,
#    priority_multiset_diff, range_frame_revenue,
#    rollup_priority_status, set_except_nations — were displaced by
#    the 9 late-new operators and head the round-10 queue).
# ROUND-10 ROTATION PLAN (write the r10 window from this): keep the 3
# anchors + any round-10-changed entries; window FIRST the 20
# round-9-new operators not driver-verified in r9
# (cohens_kappa_raters, retrieval_eval_map, lm_dirichlet_relevance,
# fleiss_kappa_multirater, ewma_control_chart, adamic_adar_linkpred,
# textrank_keywords, item_cooccurrence_cf, fellegi_sunter_linkage,
# logrank_test, lead_lag_xcorr, brier_decomposition, cochrans_q_test,
# friedman_rank_test, kmv_set_operations, consistent_hash_rebalance,
# dau_wau_stickiness, dow_seasonality_strength, qini_uplift_curve,
# neyman_allocation_plan, hodges_lehmann_shift, cliff_delta_effect,
# runs_test_randomness, knn_hubness_audit, kruskal_wallis_doclen,
# wasserstein_doclen_drift, binary_segmentation_split —
# all t2-sim green at sf0.001/0.01/0.1 this round) and any
# round-10-new operators; then stalest greens — the 9 r02 survivors displaced by
# the late-r9 batch (doc_length_histogram, domain_mixture_weights,
# no_big_order_anti, order_cohort_full_outer, price_band_join,
# priority_multiset_diff, range_frame_revenue, rollup_priority_status,
# set_except_nations), then the remaining r03 cohort
# (set_intersect_brands, set_union_nations, top_revenue_orders —
# r02, displaced twice — then agg_stats, array_functions, asof_last_view,
# big_spenders_semi, bm25_relevance,
# cte_above_avg_customers, deterministic_split, doc_chunking,
# flatten_props, full_text_relevance, graph_pagerank_step,
# grouping_sets_orders, hybrid_search_rrf,
# incremental_agg_maintenance, ivf_topk, json_functions,
# language_id_heuristic, near_dup_clusters, ngram_jaccard_pairs,
# pandas_udf_disc_price, percentile_stats, recursive_cte_month_spine,
# repetition_census, seq_extraction, sequence_packing,
# session_window_stats, simhash_near_dup, sliding_window_counts,
# snapshot_cdc, string_functions, tf_idf_top_terms,
# user_pseudonymization, vocab_oov_audit, window_top_orders), then
# the r04 cohort if slots remain. Keep key_skew_audit (skew_plan) and
# one dedup + one multimodal_plan + one sampling rep in every window.
# Every entry outside the window stays registered, oracle-checked by
# tests/t2_sim.py, pytest-covered, and bench-timed.
PRIORITY = [
    # --- 3 anchors (green in every round they ran; latest_event_per_user
    # is also the window's required etl-family representative) ---
    "latest_event_per_user",
    "warehouse_e2e_pipeline",
    "pricing_summary",
    # --- 2 changed-this-round entries (re-prove the guarded impl) ---
    "welch_t_doclen",
    "anova_doclen_by_source",
    # --- 12 new-this-round entries ---
    "streaming_interval_join_e2e",
    "streaming_session_state_e2e",
    "zorder_relayout_e2e",
    "streaming_static_enrich_e2e",
    "gini_token_concentration",
    "abtest_power_mde",
    "sprt_boundary_scan",
    "temporal_split_audit",
    "partition_modularity",
    "text_artifact_census",
    "streaming_left_interval_join_e2e",
    "embedding_isotropy_audit",
    # --- 21 r8-queue entries (first driver window; mann_kendall and
    # holt also changed this round — ANSI guards) ---
    "market_basket_lift_pairs",
    "cuped_adjusted_abtest",
    "conformal_interval_coverage",
    "two_way_effects_decomposition",
    "burrows_delta_stylometry",
    "holt_linear_backtest",
    "mmr_diversified_rerank",
    "pseudo_relevance_feedback",
    "column_profile_audit",
    "try_functions",
    "length_bucket_packing_plan",
    "bradley_terry_strengths",
    "rolling_median_7d",
    "event_trigram_paths",
    "markov_removal_attribution",
    "quantile_treatment_effects",
    "streaming_window_counts_e2e",
    "streaming_dedup_e2e",
    "warehouse_streaming_ingest_e2e",
    "mann_kendall_trend",
    "mcnemar_paired_test",
    # --- 1 family-coverage slot (skew_plan rep; r08-green) ---
    "key_skew_audit",
    # --- 9 late-new round-9 entries (slots from the stalest-r02
    # block; those re-verifications head the round-10 queue) ---
    "benjamini_hochberg_fdr",
    "brown_forsythe_variance",
    "kmv_distinct_audit",
    "kaplan_meier_survival",
    "did_estimator",
    "ipw_treatment_effect",
    "roc_auc_rank",
    "hits_hub_authority",
    "jensen_shannon_sources",
    # --- 2 r03-cohort greens (dedup + multimodal_plan family reps) ---
    "embedding_near_dup",
    "multimodal_metadata",
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
