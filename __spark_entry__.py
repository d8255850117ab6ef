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
# coverage policy. Round-4 rotation (VERDICT r3, Next-round #1): keep 13
# never-regressed anchors (ETL kernel + e2e + one representative per
# family), add the two operators NEW this round (scd2_user_state_history,
# time_travel_cdc — the manifest-snapshot e2e certifier), and fill the
# other 35 slots with entries that have never had a driver CORRECTNESS
# row (r01–r03 union = 70 of 123); the remaining never-verified entries
# rotate into the round-5 window. Every entry outside the window stays
# registered, oracle-checked by tests/t2_sim.py, pytest-covered, and
# bench-timed.
PRIORITY = [
    # --- 13 anchors (all green in CORRECTNESS_r03) + 2 new this round ---
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
    "k_anonymity_audit",
    "salted_skew_aggregate",
    # --- 35 never-driver-verified entries (rotation round 4) ---
    # similarity / ANN / graph / ML (X2)
    "ann_lsh_topk",
    "ann_multiprobe_topk",
    "ann_batch_topk",
    "knn_graph_bucketed",
    "graph_pagerank_3iter",
    "graph_triangle_count",
    "kmeans_lloyd_step",
    "centroid_similarity_per_label",
    "ml_inference_scores",
    "int8_quantization_audit",
    "embedding_norm_audit",
    # dedup depth (X1)
    "dedup_survivors",
    "doc_fingerprints",
    "lsh_recall_audit",
    "source_overlap_matrix",
    # text analysis depth (X4)
    "token_frequency",
    "token_count_bpe_ish",
    "unigram_surprisal_scores",
    "bigram_stats",
    "bpe_pair_census",
    "quality_scores",
    "token_entropy_per_source",
    # statistics / sketches
    "approx_distinct_audit",
    "approx_percentile_audit",
    "hll_union_audit",
    "moment_stats",
    "regression_price_qty",
    # sampling / curation / layout
    "stratified_sample",
    "benchmark_decontamination",
    "corpus_build_pipeline",
    "dataset_card",
    "zorder_layout_cells",
    "quality_filter_funnel",
    # scalar + multimodal depth
    "variant_json_functions",
    "multimodal_resize",
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
