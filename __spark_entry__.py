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
# coverage policy: one-plus representatives of every SURVEY.md §2 family
# (ETL kernel R*, relational S*, streaming D*, scalar C*, and the X1-X4
# LLM-pipeline operators) land inside the window; remaining depth
# entries (extra variants per family) follow after and stay fully
# registered, pytest-covered, and bench-timed.
PRIORITY = [
    # ETL kernel (R4, R6, R11, R12, R13, R15) + CDC / incremental MV
    "latest_event_per_user",
    "delete_propagation",
    "flatten_props",
    "conform_projection",
    "seq_extraction",
    "mango_selector_filter",
    "snapshot_cdc",
    "incremental_agg_maintenance",
    # end-to-end warehouse pipeline (R1→R14)
    "warehouse_e2e_pipeline",
    # event-time windows (D4 — all three window kinds)
    "tumbling_window_counts",
    "sliding_window_counts",
    "session_window_stats",
    # dedup (X1)
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_candidates",
    "simhash_near_dup",
    "embedding_near_dup",
    "near_dup_clusters",
    # similarity (X2)
    "knn_cosine_topk",
    "ivf_topk",
    "hybrid_search_rrf",
    "graph_pagerank_step",
    # text analysis (X4)
    "tf_idf_top_terms",
    "language_id_heuristic",
    "doc_chunking",
    # curation / governance
    "repetition_census",
    "vocab_oov_audit",
    "user_pseudonymization",
    "k_anonymity_audit",
    # sampling / splits
    "deterministic_split",
    "sequence_packing",
    # scalar families (C-str, C-json, C-arr, C-date+math+cond, C-udf)
    "string_functions",
    "json_functions",
    "array_functions",
    "scalar_kitchen_sink",
    "pandas_udf_disc_price",
    # statistics / skew
    "percentile_stats",
    "salted_skew_aggregate",
    # multimodal (X3)
    "multimodal_metadata",
    # relational (S5-S16, S19) incl. BM25 full-text and recursive CTE
    "pricing_summary",
    "agg_stats",
    "nation_revenue",
    "big_spenders_semi",
    "asof_last_view",
    "grouping_sets_orders",
    "window_top_orders",
    "cte_above_avg_customers",
    "recursive_cte_month_spine",
    "full_text_relevance",
    "bm25_relevance",
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
