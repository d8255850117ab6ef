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
# coverage policy. Round-5 rotation — ACTUAL composition (13 + 3 + 13
# + 18 + 2 = 50 (14 NEW after graph_label_propagation landed); keep these counts in sync with the list, next round's
# rotation is planned from them):
#  - 13 never-regressed anchors (ETL kernel + e2e + one representative
#    per family),
#  - 3 entries whose r04 rows were hash-red or dtype-risky and are
#    FIXED this round (lsh_recall_audit, moment_stats, math_functions
#    — the window must prove the fix),
#  - 14 operators NEW this round (never driver-verified by construction),
#  - 18 carried never-driver-verified entries (the full remainder of
#    the never-seen set from r01-r04),
#  - 2 stalest last-seen-r01 entries (exact_dedup_canonical,
#    multimodal_frame_sample — the latter also restores multimodal
#    family coverage). The other last-seen-r01 entries
#    (balance_distribution_ranks, crossdoc_ngram_dup, cube_flag_status,
#    customer_order_gaps, distinct_segments, doc_length_histogram,
#    domain_mixture_weights) rotate into the round-6 window.
# Every entry outside the window stays registered, oracle-checked by
# tests/t2_sim.py, pytest-covered, and bench-timed.
PRIORITY = [
    # --- 13 anchors (green in CORRECTNESS_r03 AND r04) ---
    "latest_event_per_user",
    "delete_propagation",
    "time_travel_cdc",
    "conform_projection",
    "scd2_user_state_history",
    "mango_selector_filter",
    "warehouse_e2e_pipeline",
    "pricing_summary",
    "nation_revenue",
    "tumbling_window_counts",
    "exact_dedup",
    "minhash_lsh_candidates",
    "knn_cosine_topk",
    # --- 3 fixed-this-round entries (r04 red / latent) ---
    "lsh_recall_audit",
    "moment_stats",
    "math_functions",
    # --- 14 NEW operators this round ---
    "duplicate_ngram_removal",
    "inverted_index_postings",
    "per_source_quality_cut",
    "pii_id_masking_census",
    "event_debounce",
    "winsorized_stats",
    "udtf_token_runs",
    "salted_skew_join",
    "seeded_global_shuffle",
    "ivf_recall_audit",
    "semdedup_prune",
    "dedup_savings_histogram",
    "bpe_apply_merges",
    "graph_label_propagation",
    # --- 18 never-driver-verified entries (rotation round 5) ---
    "cohort_retention",
    "conditional_functions",
    "correlated_exists_orders",
    "date_functions",
    "event_conversion_funnel",
    "event_locf_gap_fill",
    "event_rate_anomaly",
    "grouped_agg_median_qty",
    "grouped_demean_applyinpandas",
    "lateral_topn_per_customer",
    "map_functions",
    "mixture_resample_counts",
    "pivot_status_by_priority",
    "spend_quartiles_ntile",
    "split_leakage_check",
    "token_coverage_topk",
    "token_position_census",
    "unpivot_order_metrics",
    # --- 2 stalest (last driver row: r01) ---
    "exact_dedup_canonical",
    "multimodal_frame_sample",  # also restores multimodal family coverage
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
