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
# coverage policy. Round-11 rotation — ACTUAL composition (3 anchors +
# 4 r10-ADVICE-changed + the full 15-entry never-driver-verified r10
# queue + 25 new r11 entries + 3 family reps = 50). With the r10 queue
# driven green, cumulative driver coverage reaches 360/360 of the r10
# registry, and every r11 operator is driver-verified the round it
# lands.
#  - 3 never-regressed anchors (ETL kernel — also the required
#    etl-family representative — the R1-R14 e2e, and the relational
#    flagship),
#  - 4 entries whose IMPLEMENTATION changed this round (r10 ADVICE):
#    streaming_dedup_watermark_e2e (dedup keys on doc_id ALONE so
#    post-horizon re-admission depends on genuine state eviction),
#    cramer_von_mises_drift (loud symmetric BIGINT-overflow guard via
#    a one-armed in-plan assert_true Catalyst cannot fold away),
#    hill_tail_index (effective-k reporting), log2_histogram_quantiles
#    (integral `div` rank grid). pinball_loss_eval and
#    hurst_exponent_rs carry the same `div` fix and sit inside the
#    r10 queue below, so they re-prove in the same window.
#  - 15 r10-queue entries: t2-sim green at all three SFs in r10 AND
#    independently re-verified by the r10 judge — first driver window,
#  - 25 NEW r11 entries: the OPTIMIZE-vs-ingest commit race
#    (concurrent_compact_ingest_e2e), the last pytest-only warehouse
#    verbs oracle-gated (merge_into / analyze / TIMESTAMP AS OF /
#    fsck / masked views), the full-outer stream-stream interval join
#    (completing the join-mode matrix, right-side eviction boundary
#    probed + pinned), the statistics batch (Jarque-Bera,
#    Mantel-Haenszel, Yule-Walker AR(2), GPD + Gumbel completing the
#    EVT triad, SRM, Cochran-Armitage, Durbin-Watson, delta-method
#    ratio SE, exact minimax-PAV isotonic calibration, energy
#    distance with no-pair-join BIGINT pair sums), and the
#    dedup/graph/text batch (winnowing minimizers with the detection
#    guarantee, Jaccard/PA link prediction, per-node clustering,
#    Church-Gale burstiness), the dyadic-exact half-life decayed
#    popularity counter, the cumulative-gains decile table, and the
#    corpus release export round-trip (shards + manifest verify +
#    consumer re-read, tamper drill included),
#  - 3 family reps (skew / multimodal / scalar — the families no new
#    entry covers; dedup, text and sampling are represented by
#    winnowing_fingerprints, term_burstiness_adaptation and
#    corpus_export_roundtrip_e2e): key_skew_audit, multimodal_resize,
#    array_functions.
# ROUND-12 ROTATION PLAN (write the r12 window from this): keep the 3
# anchors + any round-12-changed entries; window FIRST any round-11
# operators that landed after this 50-slot window filled (check
# CORRECTNESS_r11.json against the registry — if all 22 r11 entries
# ran, there is no r12 carry-over queue), then new r12 entries, then
# the STALEST greens displaced this round — the r02 block
# (doc_length_histogram, domain_mixture_weights, no_big_order_anti,
# order_cohort_full_outer, price_band_join, priority_multiset_diff,
# range_frame_revenue, rollup_priority_status, set_except_nations,
# set_intersect_brands, set_union_nations, top_revenue_orders), then
# the r03 cohort (agg_stats, asof_last_view, big_spenders_semi,
# bm25_relevance, cte_above_avg_customers, doc_chunking, flatten_props,
# full_text_relevance, graph_pagerank_step, grouping_sets_orders,
# hybrid_search_rrf, incremental_agg_maintenance, ivf_topk,
# json_functions, language_id_heuristic, ngram_jaccard_pairs,
# pandas_udf_disc_price, percentile_stats, recursive_cte_month_spine,
# repetition_census, seq_extraction, sequence_packing,
# session_window_stats, simhash_near_dup, sliding_window_counts,
# snapshot_cdc, string_functions, user_pseudonymization,
# vocab_oov_audit, window_top_orders), then the r04 cohort. Keep one
# skew_plan + one dedup + one multimodal_plan + one sampling + one
# scalar + one text rep in every window. Every entry outside the
# window stays registered, oracle-checked by tests/t2_sim.py,
# pytest-covered, and bench-timed.
PRIORITY = [
    # --- 3 anchors (green in every round they ran; latest_event_per_user
    # is also the window's required etl-family representative) ---
    "latest_event_per_user",
    "warehouse_e2e_pipeline",
    "pricing_summary",
    # --- 4 changed-this-round entries (r10 ADVICE fixes; re-prove) ---
    "streaming_dedup_watermark_e2e",
    "cramer_von_mises_drift",
    "hill_tail_index",
    "log2_histogram_quantiles",
    # --- 15 r10-queue entries (first driver window; pinball_loss_eval
    # and hurst_exponent_rs also carry this round's `div` fix) ---
    "holt_winters_backtest",
    "lm_jelinek_mercer_relevance",
    "effective_sample_size",
    "hurst_exponent_rs",
    "pr_auc_classifier",
    "theil_atkinson_concentration",
    "restore_version_e2e",
    "clone_divergence_e2e",
    "overdispersion_index",
    "capture_recapture_estimate",
    "pinball_loss_eval",
    "update_where_cdc_e2e",
    "compact_small_files_e2e",
    "vacuum_retention_e2e",
    "rebucket_e2e",
    # --- 25 new round-11 entries ---
    "concurrent_compact_ingest_e2e",
    "merge_into_upsert_e2e",
    "analyze_stats_e2e",
    "asof_timestamp_read_e2e",
    "jarque_bera_normality",
    "mantel_haenszel_or",
    "yule_walker_ar2",
    "gpd_pot_tail_fit",
    "srm_guardrail_check",
    "jaccard_pa_linkpred",
    "local_clustering_coefficient",
    "winnowing_fingerprints",
    "isotonic_calibration_pav",
    "cochran_armitage_trend",
    "durbin_watson",
    "gumbel_block_maxima_fit",
    "ratio_metric_delta_method",
    "energy_distance_drift",
    "term_burstiness_adaptation",
    "fsck_integrity_e2e",
    "masked_view_e2e",
    "streaming_full_outer_interval_join_e2e",
    "half_life_decayed_popularity",
    "gains_decile_table",
    "corpus_export_roundtrip_e2e",
    # --- 3 family reps (skew / multimodal / scalar; dedup, text and
    # sampling ride inside the new-entry block) ---
    "key_skew_audit",
    "multimodal_resize",
    "array_functions",
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
