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
# coverage policy. ROUND-13 window (optimization round 2 of 2) — written
# from the r12 rotation plan below, exactly as VERDICT.md "Next round"
# item #1 requires:
#  - 3 never-regressed anchors (ETL kernel, R1-R14 e2e, relational
#    flagship),
#  - anderson_darling_drift (landed after the r12 window filled; never
#    had a driver row),
#  - the 22 norm-factored (cosine_n) similarity/graph entries from the
#    r12 optimization that did not fit the r12 window:
#    knn_graph_bucketed and its consumers (pagerank step/3iter,
#    triangle, label propagation, modularity, HITS, assortativity,
#    k-core, clustering coefficient, the three link-prediction entries,
#    mutual_knn_pairs, knn_hubness_audit, knn_label_purity) plus
#    contrastive_pair_mining, dbscan_core_census, ann_batch_topk and
#    the retrieval_eval trio — proven bit-exact pairwise and
#    oracle-green at all three SFs locally in r12, but without a
#    post-change driver row until now,
#  - any entry whose execution changed in THIS round's optimizations
#    (pseudo_relevance_feedback; the e2e shuffle-scope derivation
#    keeps the bench value byte-identical so the 26 e2es certified by
#    the r12 window are unchanged),
#  - fill to 50 with the stalest greens (the r02 cohort, then r03)
#    per the standing one-rep-per-family mandate.
# Round-12 rotation (for the record) — was (3 anchors +
# 3 ADVICE/scale-changed + 12 new r12 entries + the 11 streaming e2es
# and 15 warehouse e2es whose EXECUTION changed that round (the
# scoped-shuffle shim + trigger-cadence cut — every one re-proven at
# sf0.01+sf0.1 locally, and the driver must see them too) + 6 family
# reps drawn from the stalest greens = 50):
#  - 3 never-regressed anchors (ETL kernel — also the etl-family rep —
#    the R1-R14 e2e, and the relational flagship),
#  - 3 entries whose IMPLEMENTATION changed (r11 ADVICE + verdict #3):
#    fellegi_sunter_linkage (FS_BLOCK_CAP sub-salted block pair join),
#    gumbel_block_maxima_fit (shared IEEE association for mu),
#    analyze_stats_e2e (victim total folded back into the stats
#    census — complete by construction),
#  - 12 NEW r12 entries: the graph-traversal ANN lane
#    (graph_greedy_search_topk over a two-table LSH-forest k-NN graph
#    + greedy_search_recall_audit vs brute force), the nonparametric/
#    effect-size batch (wilcoxon_signed_rank, kendall_w_concordance,
#    negative_binomial_mom_fit, cohens_d_effect_size,
#    theil_u_uncertainty, hellinger_doclen_drift, max_drawdown_series)
#    and the lexical/split batch (msttr_lexical_diversity,
#    yule_k_lexical_richness, stratified_kfold_audit),
#  - 11 streaming e2es + 15 warehouse e2es (execution changed: fewer
#    trigger rounds with the same data-determined emission horizons;
#    scoped shuffle partitions; identical oracle hashes —
#    masked_view_e2e carries the same shim but is the least
#    shuffle-dependent of the family and stays with t2_sim),
#  - 6 family reps from the stalest greens (r02/r03 cohorts):
#    doc_length_histogram (curation, r02), session_window_stats
#    (events_windows, r03), string_functions (scalar, r03),
#    recursive_cte_month_spine (relational_extra, r03),
#    salted_skew_join (skew_plan), multimodal_metadata
#    (multimodal_plan); dedup, text
#    and sampling are represented by fellegi_sunter_linkage, the
#    lexical pair and stratified_kfold_audit inside the blocks above.
# ROUND-13 ROTATION PLAN (write the r13 window from this): keep the 3
# anchors + any round-13-changed entries; window FIRST any r12
# operators that landed after this 50-slot window filled (check
# CORRECTNESS_r12.json against the registry — anderson_darling_drift
# landed after this window filled and is the expected one-entry
# carry-over; the other 12 r12 entries are IN this window), THEN the
# r12-OPTIMIZATION-touched similarity/graph family that did not fit
# this window (knn_graph_bucketed and its consumers: pagerank step/
# 3iter, triangle, label propagation, modularity, HITS, assortativity,
# k-core, clustering coefficient, the three link-prediction entries,
# mutual_knn_pairs, knn_hubness_audit, knn_label_purity, plus
# contrastive_pair_mining, dbscan_core_census, ann_batch_topk, the
# retrieval_eval trio — the norm-factored pair stage was proven
# bit-exact pairwise AND oracle-green at all three SFs, and the
# in-window greedy pair exercises the same cosine_n kernel, but they
# have not had a driver row since the change), then new r13 entries,
# then the STALEST greens displaced this round — the remaining r02
# block (domain_mixture_weights, no_big_order_anti,
# order_cohort_full_outer, price_band_join, priority_multiset_diff,
# range_frame_revenue, rollup_priority_status, set_except_nations,
# set_intersect_brands, set_union_nations, top_revenue_orders), then
# the r03 cohort (agg_stats, big_spenders_semi, bm25_relevance,
# cte_above_avg_customers, doc_chunking, flatten_props,
# full_text_relevance, graph_pagerank_step, grouping_sets_orders,
# hybrid_search_rrf, incremental_agg_maintenance, ivf_topk,
# json_functions, language_id_heuristic, ngram_jaccard_pairs,
# pandas_udf_disc_price, percentile_stats,
# repetition_census, seq_extraction, sequence_packing, simhash_near_dup,
# sliding_window_counts, snapshot_cdc, user_pseudonymization,
# vocab_oov_audit, window_top_orders), then the r04 cohort. Keep one
# rep per family in every window. Every entry outside the window stays
# registered, oracle-checked by tests/t2_sim.py, pytest-covered, and
# bench-timed.
#
# Round-11 rotation (for the record) — was: (3 anchors +
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
PRIORITY = [
    # --- 3 anchors ---
    "latest_event_per_user",
    "warehouse_e2e_pipeline",
    "pricing_summary",
    # --- landed after the r12 window filled; never driver-verified ---
    "anderson_darling_drift",
    # --- the 22 norm-factored (cosine_n) r12-optimization entries ---
    "knn_graph_bucketed",
    "graph_pagerank_step",
    "graph_pagerank_3iter",
    "graph_triangle_count",
    "graph_label_propagation",
    "partition_modularity",
    "hits_hub_authority",
    "degree_assortativity",
    "kcore_decomposition",
    "local_clustering_coefficient",
    "adamic_adar_linkpred",
    "graph_common_neighbors_linkpred",
    "jaccard_pa_linkpred",
    "mutual_knn_pairs",
    "knn_hubness_audit",
    "knn_label_purity",
    "contrastive_pair_mining",
    "dbscan_core_census",
    "ann_batch_topk",
    "retrieval_eval_mrr",
    "retrieval_eval_map",
    "retrieval_eval_ndcg",
    # --- entries whose execution changed in round 13 (data-derived
    # pair-join widths; PRF stage collapse) ---
    "pseudo_relevance_feedback",
    "graph_greedy_search_topk",
    "greedy_search_recall_audit",
    "semdedup_prune",
    "embedding_gram_matrix",
    "centroid_shift_drift",
    # --- fill to 50 with the stalest greens (r02 cohort, then r03) ---
    "domain_mixture_weights",
    "no_big_order_anti",
    "order_cohort_full_outer",
    "price_band_join",
    "priority_multiset_diff",
    "range_frame_revenue",
    "rollup_priority_status",
    "bm25_relevance",
    "cte_above_avg_customers",
    "doc_chunking",
    "flatten_props",
    "full_text_relevance",
    # --- one-rep-per-family mandate (tests/test_registry_contract.py::
    # test_window_covers_every_family): the six families the blocks
    # above don't reach, each represented by its STALEST green (last
    # driver-verified round in parentheses) ---
    "multimodal_frame_sample",   # multimodal_plan (r5)
    "json_functions",            # scalar (r3)
    "sliding_window_counts",     # events_windows (r3)
    "deterministic_split",       # sampling (r3)
    "near_dup_clusters",         # dedup (r3)
    "salted_skew_aggregate",     # skew_plan (r4)
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
