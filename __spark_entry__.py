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
# coverage policy. Round-11 rotation — executes round 10's written plan
# (3 anchors + 4 changed-this-round + the full 15-entry
# never-driver-verified r10 queue + new r11 entries + family reps +
# stalest greens = 50). With the r10 queue driven green, cumulative
# driver coverage reaches 360/360 of the r10 registry — every entry
# ever registered has a green driver row.
#  - 3 never-regressed anchors (ETL kernel — also the required
#    etl-family representative — the R1-R14 e2e, and the relational
#    flagship),
#  - 4 entries whose IMPLEMENTATION changed this round and must be
#    re-proven (r10 ADVICE fixes): streaming_dedup_watermark_e2e
#    (dedup keys on doc_id ALONE so post-horizon re-admission depends
#    on genuine state eviction), cramer_von_mises_drift (loud
#    symmetric BIGINT-overflow guard via in-plan assert_true),
#    hill_tail_index (effective-k reporting for short corpora),
#    log2_histogram_quantiles (integral `div` rank grid matching
#    DuckDB's `//` at all magnitudes). pinball_loss_eval and
#    hurst_exponent_rs got the same `div` fix and sit inside the r10
#    queue below, so they re-prove in the same window.
#  - 15 r10-queue entries: the round-10 operators that landed after
#    the r10 window filled — t2-sim green at sf0.001/0.01/0.1 in r10
#    AND independently re-verified by the r10 judge (VERDICT.md) —
#    their first driver window,
#  - new round-11 entries (every operator added this round is
#    driver-verified the round it lands),
#  - 4 family-coverage reps (skew_plan / multimodal_plan / dedup /
#    sampling — the stalest member of each family not already in the
#    window): key_skew_audit, multimodal_resize, near_dup_clusters,
#    deterministic_split,
#  - stalest greens fill the rest: the full displaced-r02 block, then
#    the r03 cohort alphabetically.
# ROUND-12 ROTATION PLAN (write the r12 window from this): keep the 3
# anchors + any round-12-changed entries; window FIRST any round-11
# operators that landed after this 50-slot window filled (check
# CORRECTNESS_r11.json against the registry), then new r12 entries,
# then the stalest greens — the remainder of the r03 cohort
# (ivf_topk, json_functions, language_id_heuristic, ngram_jaccard_pairs,
# pandas_udf_disc_price, percentile_stats, recursive_cte_month_spine,
# repetition_census, seq_extraction, sequence_packing,
# session_window_stats, simhash_near_dup, sliding_window_counts,
# snapshot_cdc, string_functions, tf_idf_top_terms,
# user_pseudonymization, vocab_oov_audit, window_top_orders), then the
# r04 cohort (salted_skew_aggregate, multimodal_resize rotates back
# out, benchmark_decontamination, corpus_build_pipeline, ...). Keep
# one skew_plan + one dedup + one multimodal_plan + one sampling rep
# in every window. Every entry outside the window stays registered,
# oracle-checked by tests/t2_sim.py, pytest-covered, and bench-timed.
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
    # --- new round-11 entries (inserted as they land, displacing the
    # stalest-r03 tail below) ---
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
    # --- 4 family reps (skew / multimodal / dedup / sampling — the
    # stalest eligible member of each family) ---
    "key_skew_audit",
    "multimodal_resize",
    "near_dup_clusters",
    "deterministic_split",
    # --- 12 displaced-r02 entries (stalest greens) ---
    # --- r03-cohort fill, alphabetical (displaced first by new r11
    # entries, from the BOTTOM up) ---
    "array_functions",
    "tf_idf_top_terms",
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
