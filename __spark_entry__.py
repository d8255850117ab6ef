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
# coverage policy. Round-10 rotation — ACTUAL composition (3 anchors +
# 1 changed + 10 new + 27 r9-queue + 4 family/stale reps + 5 late-new
# = 50), executing round 9's written plan: the full 27-entry
# never-driver-verified r9 queue runs FIRST after the new entries, so
# this window drives cumulative driver coverage to 345/345 — every
# registry entry has a green driver row once it lands.
#  - 3 never-regressed anchors (ETL kernel — also the required
#    etl-family representative — the R1-R14 e2e, and the relational
#    flagship),
#  - 1 entry whose IMPLEMENTATION changed this round and must be
#    re-proven: benjamini_hochberg_fdr (r9 ADVICE: nullif the pooled-
#    variance denominator in BOTH lanes for the xx=0/xx=nn degenerate
#    shapes and coalesce the Chernoff p to exactly 1.0 so the rank
#    window never orders a NULL; planted degenerate fixtures in
#    tests/test_round10_ops.py),
#  - 10 NEW entries: schema_evolution_e2e (opt-in schema evolution
#    under the oracle gate — two-phase spool whose second batch ADDS
#    a column; null-backfill + per-version reads certified, r9
#    verdict #3), streaming_restart_resume_e2e (crash-recovery: two
#    query lifecycles over one checkpoint, restart boundary asserted
#    via query id/run id and manifest version count, r9 verdict #4),
#    streaming_dedup_watermark_e2e (dropDuplicatesWithinWatermark —
#    the bounded-state dedup; oracle encodes both horizon outcomes,
#    r9 verdict #6), chao1_vocab_richness (unseen-vocabulary estimate
#    + Good coverage), hill_tail_index (heavy-tail exponent via
#    TakeOrdered top-k, nano-nat ln reduce), grubbs_outlier_test
#    (max-normed residual, integer argmax), log2_histogram_quantiles
#    (DDSketch-style gamma=2 quantile sketch with exact bit-arithmetic
#    buckets + containment audit), permutation_test_ab (user-cluster
#    randomization inference, md5-indexed replicates),
#    page_hinkley_drift (self-calibrating sequential drift detector)
#    and ljung_box_test (portmanteau ACF inference) — every operator
#    added this round is driver-verified the round it lands,
#  - 27 r9-queue entries: the round-9 operators t2-sim green at both
#    SFs in r9 AND independently re-verified by the r9 judge
#    (VERDICT.md) — their first driver window,
#  - 4 family-coverage slots (every window keeps every plan family —
#    scalar, dedup, multimodal_plan and curation need explicit reps
#    this round; skew_plan and sampling ride along inside the r9
#    queue via consistent_hash_rebalance and brier_decomposition/
#    neyman_allocation_plan): try_functions, embedding_near_dup,
#    multimodal_metadata, gini_token_concentration,
#  - 5 LATE-NEW round-10 entries (landed after the window above was
#    written; slots taken from the stalest-r02 block, the r7/r8/r9
#    precedent): mcc_confusion_scalars (Matthews/balanced-acc/Youden
#    over the confusion cells), cramer_von_mises_drift (integrated
#    squared CDF distance completing the KS/U drift triad),
#    triple_itemset_support (basket-local Apriori k=3),
#    multimodal_phash_near_dup (band-blocked Hamming verify census)
#    and constraint_quarantine_e2e (CHECK-constraint dead-letter mode
#    under the oracle gate).
# ROUND-11 ROTATION PLAN (write the r11 window from this): keep the 3
# anchors + any round-11-changed entries; window FIRST the round-10
# operators that landed after this 50-slot window filled — the
# never-driver-verified r10 queue: holt_winters_backtest (additive
# seasonal recursion, applyInPandas vs list-carrying recursive CTE),
# lm_jelinek_mercer_relevance (third Lucene similarity),
# effective_sample_size (Geyer-truncated ESS), hurst_exponent_rs
# (rescaled-range long-memory exponent), pr_auc_classifier (tie-exact
# average precision), theil_atkinson_concentration (decomposable
# inequality indices), restore_version_e2e (RESTORE undoes a bad
# delete_where under the oracle gate) and clone_divergence_e2e
# (zero-copy branch isolation in both directions under the oracle
# gate), overdispersion_index (Poisson variance/mean screen),
# capture_recapture_estimate (Chapman unseen-population estimate) and
# pinball_loss_eval (quantile-forecast scoring at tau=0.9),
# update_where_cdc_e2e (predicate UPDATE + pinned-snapshot diff; note:
# seq-based changes() deliberately does not report in-place rewrites),
# compact_small_files_e2e (two disjoint-prefix ingest waves fragment
# buckets via file-level pruning, OPTIMIZE folds them, census
# unchanged) and vacuum_retention_e2e (retention reclaims only
# unreferenced bytes; dropped version fails loudly) and rebucket_e2e
# (partition-strategy evolution: relayout to a new id-hash bucket
# count, post-relayout merges hash with the new count, old snapshots
# keep their own layout) — all t2-sim
# green at sf0.001/0.01/0.1 this round; then any
# round-11-new operators; then
# the stalest greens — the 9 displaced-r02 entries
# (doc_length_histogram, domain_mixture_weights, no_big_order_anti,
# order_cohort_full_outer, price_band_join, priority_multiset_diff,
# range_frame_revenue, rollup_priority_status, set_except_nations),
# then the r03 cohort
# (set_intersect_brands, set_union_nations, top_revenue_orders, then
# agg_stats, array_functions, asof_last_view, big_spenders_semi,
# bm25_relevance, cte_above_avg_customers, doc_chunking, flatten_props,
# full_text_relevance, graph_pagerank_step, grouping_sets_orders,
# hybrid_search_rrf, incremental_agg_maintenance, ivf_topk,
# json_functions, language_id_heuristic, near_dup_clusters,
# ngram_jaccard_pairs, pandas_udf_disc_price, percentile_stats,
# recursive_cte_month_spine, repetition_census, seq_extraction,
# sequence_packing, session_window_stats, simhash_near_dup,
# sliding_window_counts, snapshot_cdc, string_functions,
# tf_idf_top_terms, user_pseudonymization, vocab_oov_audit,
# window_top_orders), then the r04 cohort if slots remain. Keep
# key_skew_audit (skew_plan) and one dedup + one multimodal_plan + one
# sampling rep in every window. Every entry outside the window stays
# registered, oracle-checked by tests/t2_sim.py, pytest-covered, and
# bench-timed.
PRIORITY = [
    # --- 3 anchors (green in every round they ran; latest_event_per_user
    # is also the window's required etl-family representative) ---
    "latest_event_per_user",
    "warehouse_e2e_pipeline",
    "pricing_summary",
    # --- 1 changed-this-round entry (re-prove the guarded impl) ---
    "benjamini_hochberg_fdr",
    # --- 10 new-this-round entries ---
    "schema_evolution_e2e",
    "streaming_restart_resume_e2e",
    "streaming_dedup_watermark_e2e",
    "chao1_vocab_richness",
    "hill_tail_index",
    "grubbs_outlier_test",
    "log2_histogram_quantiles",
    "permutation_test_ab",
    "page_hinkley_drift",
    "ljung_box_test",
    # --- 27 r9-queue entries (first driver window) ---
    "cohens_kappa_raters",
    "retrieval_eval_map",
    "lm_dirichlet_relevance",
    "fleiss_kappa_multirater",
    "ewma_control_chart",
    "adamic_adar_linkpred",
    "textrank_keywords",
    "item_cooccurrence_cf",
    "fellegi_sunter_linkage",
    "logrank_test",
    "lead_lag_xcorr",
    "brier_decomposition",
    "cochrans_q_test",
    "friedman_rank_test",
    "kmv_set_operations",
    "consistent_hash_rebalance",
    "dau_wau_stickiness",
    "dow_seasonality_strength",
    "qini_uplift_curve",
    "neyman_allocation_plan",
    "hodges_lehmann_shift",
    "cliff_delta_effect",
    "runs_test_randomness",
    "knn_hubness_audit",
    "kruskal_wallis_doclen",
    "wasserstein_doclen_drift",
    "binary_segmentation_split",
    # --- 4 family reps (scalar / dedup / multimodal / curation; the
    # skew_plan and sampling families are covered inside the r9 queue
    # by consistent_hash_rebalance and brier_decomposition/
    # neyman_allocation_plan, so key_skew_audit and
    # deterministic_split rotate out this round) ---
    "try_functions",
    "embedding_near_dup",
    "multimodal_metadata",
    "gini_token_concentration",
    # --- 5 late-new round-10 entries (slots from the stalest-r02
    # block, the r7/r8/r9 precedent; those re-verifications head the
    # round-11 queue) ---
    "mcc_confusion_scalars",
    "cramer_von_mises_drift",
    "triple_itemset_support",
    "multimodal_phash_near_dup",
    "constraint_quarantine_e2e",
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
