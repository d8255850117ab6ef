"""Physical-plan regression tests: the plan SHAPE is part of the
contract at 100 TB — a query that silently loses its pushdown,
broadcast, or partial aggregation still passes value checks at small
SF and then dies at scale. These pin the shapes.
"""

from __future__ import annotations

import couchwarehouse_spark.plans.all  # noqa: F401
from couchwarehouse_spark.plans import QUERIES

from .conftest import SF_SMOKE


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def explain_str(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMOKE)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_pricing_summary_pushdown_and_partial_agg(spark):
    """Filter + projection reach the parquet scan; agg is two-phase."""
    plan = explain_str(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # Column pruning: only the 7 referenced columns are read.
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_comment" not in read_schema
    assert read_schema.count(":") - 1 <= 8  # struct<...7 fields...>
    assert "partial_sum" in plan  # map-side combine before the exchange


def test_nation_revenue_broadcasts_dims(spark):
    """nation/region must come in as broadcast joins — never shuffle a
    25-row dim table against a fact table."""
    plan = plan_of(spark, "nation_revenue")
    assert plan.count("BroadcastHashJoin") >= 2


def test_semi_anti_join_shapes(spark):
    plan_semi = plan_of(spark, "big_spenders_semi")
    assert "LeftSemi" in plan_semi
    plan_anti = plan_of(spark, "no_big_order_anti")
    assert "LeftAnti" in plan_anti


def test_topk_uses_take_ordered(spark):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject (per-
    partition heaps), not a global sort."""
    plan = plan_of(spark, "top_revenue_orders")
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan  # no standalone global sort


def test_left_join_null_probe_filter_pushed(spark):
    """The big-order filter must shrink the outer join's right side AT
    THE SCAN (pushed into parquet), not after the join."""
    plan = plan_of(spark, "customer_order_gaps")
    assert "LeftOuter" in plan
    assert "GreaterThan(o_totalprice,450000.0)" in plan


def test_no_python_in_hot_paths(spark):
    """Declarative queries must stay JVM-side: no BatchEvalPython
    (row-at-a-time UDF) anywhere; Arrow stages appear ONLY in the
    explicitly-UDF entries."""
    for name in ("pricing_summary", "nation_revenue", "exact_dedup",
                 "token_frequency", "knn_cosine_topk", "embedding_near_dup"):
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_mango_predicate_pushes_to_scan(spark):
    """The compiled Mango selector must reach the parquet reader."""
    plan = explain_str(spark, "mango_selector_filter")
    assert "PushedFilters" in plan
    # $gte 150 on value / event_type IN — at least one reaches the scan
    pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "Or(" in pushed or "In(" in pushed or "GreaterThanOrEqual" in pushed


def test_decontamination_broadcasts_benchmark_side(spark):
    """The benchmark shingle set must broadcast — corpus size must
    never enter that shuffle."""
    plan = plan_of(spark, "benchmark_decontamination")
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan


def test_sampling_plans_are_jvm_only(spark):
    """Curation operators are pure DataFrame expressions — no Python
    evaluation anywhere in their physical plans."""
    for name in (
        "deterministic_split",
        "stratified_sample",
        "benchmark_decontamination",
        "split_leakage_check",
    ):
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_full_outer_preaggregates_before_join(spark):
    """Both sides reduce to one row per customer BEFORE the full-outer
    join (partial aggregation upstream of the join exchange)."""
    plan = plan_of(spark, "order_cohort_full_outer")
    assert "FullOuter" in plan
    assert plan.count("HashAggregate") >= 4  # partial+final per side


def test_repetition_census_stays_narrow(spark):
    """The repetition audit must stay a word-count shape: no explode
    (the trigram arrays never leave the mapper), two-phase agg, and a
    scan pruned to exactly (text, source)."""
    plan = plan_of(spark, "repetition_census")
    assert "Generate" not in plan  # no explode
    assert "partial_sum" in plan
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "text" in read_schema and "source" in read_schema
    assert "doc_id" not in read_schema and "n_chars" not in read_schema


def test_multiset_diff_is_count_difference(spark):
    """exceptAll must compile to the ±1-count replicate-rows shape
    (partial-aggregated), not a row-by-row join; both branch scans
    push the status filter into parquet."""
    plan = plan_of(spark, "priority_multiset_diff")
    assert "replicaterows" in plan
    assert "partial_sum" in plan
    assert plan.count("EqualTo(o_orderstatus") == 2
    assert "Join" not in plan


def test_frame_sample_fanout_stays_executor_side(spark):
    """Frame sampling: the fan-out is a mapInPandas (ArrowEvalPython /
    MapInPandas node), not a driver-built explode; the final agg is
    two-phase."""
    plan = plan_of(spark, "multimodal_frame_sample")
    assert "MapInPandas" in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_mixture_weights_broadcasts_total(spark):
    """The corpus total joins in as a broadcast of one row — never a
    shuffle or a single-partition window over the data."""
    plan = plan_of(spark, "domain_mixture_weights")
    assert "BroadcastNestedLoopJoin" in plan
    assert "Window" not in plan


def test_ivf_assignment_is_projection(spark):
    """IVF cell assignment must be a projection argmin over the
    broadcast centroid row — the corpus path (scan → assign → top-k)
    may contain NO exchange; the only exchanges allowed are on the
    tiny centroid branch (label/dim aggregates + single-row collect)."""
    plan = plan_of(spark, "ivf_topk")
    assert "TakeOrderedAndProject" in plan
    # No hash-partitioning on the full vector (the old corpus-shuffle
    # shape grouped by v); all groupings are on centroid-branch keys.
    assert "hashpartitioning(vec_id" not in plan
    assert "hashpartitioning(v#" not in plan


def test_batch_ann_two_stage_topk(spark):
    """Batch ANN: queries broadcast; two window stages (local per
    (query, partition) rank, then final per-query rank over survivors)
    so no reducer sees a query's full score column."""
    plan = plan_of(spark, "ann_batch_topk")
    assert "BroadcastNestedLoopJoin" in plan  # Q-row query side broadcast
    assert plan.count("RunningWindowFunction") >= 2 or plan.count("Window") >= 2


def test_sequence_packing_distributed_prefix_sum(spark):
    """The running sum must be the two-pass shape: offsets come from a
    window over the TINY per-partition subtotal table (partitioned by
    lang, ordered by pid) and rejoin as a broadcast; the full stream's
    window is partitioned by (pid, lang) — never by lang alone."""
    plan = plan_of(spark, "sequence_packing")
    assert "BroadcastHashJoin" in plan
    import re
    full_stream_windows = re.findall(r"Window .*windowspecdefinition\(lang[^,]*, h", plan)
    assert not full_stream_windows, "found a lang-partitioned window over the stream"


def test_minhash_band_join_shuffles_triples_only(spark):
    """The LSH band join must key on (band, band-key) with no shingle
    arrays in the join exchange, and no Python anywhere."""
    plan = plan_of(spark, "minhash_lsh_candidates")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    joins = [l for l in plan.splitlines() if "SortMergeJoin" in l or "ShuffledHashJoin" in l]
    assert not any("sh#" in l for l in joins), "shingle arrays entered a shuffled join key"


def test_survivor_selection_is_aggregate_not_window(spark):
    """Survivor choice must be the argmax-struct aggregate (partial-
    aggregated, AQE-splittable on a giant cluster), never a window;
    the member labels broadcast into the documents scan."""
    plan = plan_of(spark, "dedup_survivors")
    assert "Window" not in plan
    assert "partial_max" in plan
    assert "BroadcastHashJoin" in plan


def test_kmeans_assignment_is_projection(spark):
    """Lloyd assignment must be the broadcast-argmin projection: no
    exchange keyed on the vector id or the raw vector anywhere."""
    plan = plan_of(spark, "kmeans_lloyd_step")
    assert "hashpartitioning(vec_id" not in plan
    assert "hashpartitioning(v#" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_quantization_two_scans_no_corpus_shuffle(spark):
    """The int8 audit: bounds reduce per dimension (partial agg), the
    quantize/error pass is a projection against the broadcast bounds
    row, and nothing exchanges on vec_id."""
    plan = plan_of(spark, "int8_quantization_audit")
    assert "BroadcastNestedLoopJoin" in plan  # one-row bounds side
    assert "partial_min" in plan and "partial_max" in plan
    assert "hashpartitioning(vec_id" not in plan


def test_lateral_topn_decorrelates_to_group_limit(spark):
    """The correlated LATERAL + LIMIT must decorrelate into a
    WindowGroupLimit with a PARTIAL pass before the exchange — never
    per-row subquery re-execution."""
    plan = plan_of(spark, "lateral_topn_per_customer")
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan


def test_unigram_surprisal_topk_heap(spark):
    """LM scoring ends in a distributed top-k heap and partial-
    aggregated word counts; no Python anywhere."""
    plan = plan_of(spark, "unigram_surprisal_scores")
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mixture_resample_gate_is_projection(spark):
    """The per-stratum keep-rates join back as a broadcast; the hash
    gate itself is a projection (no corpus shuffle before the final
    per-stratum aggregate)."""
    plan = plan_of(spark, "mixture_resample_counts")
    assert "BroadcastHashJoin" in plan
    assert "partial_sum" in plan


# Entries whose PLANS legitimately contain Arrow-batched Python stages
# (the documented UDF/mapInPandas surface) or a driver-materialized
# result (the small-graph union-find lane shared by the component
# queries near_dup_clusters / dedup_survivors).
ARROW_ALLOWED = {
    "pandas_udf_disc_price",
    "grouped_agg_median_qty",
    "grouped_demean_applyinpandas",
    "multimodal_feature_extract",
    "multimodal_frame_sample",
    "multimodal_resize",
    "near_dup_clusters",
    "dedup_survivors",
    "udtf_token_runs",  # ArrowEvalPythonUDTF — the declared UDTF demo
    # r8: a genuinely sequential recurrence — the declared
    # applyInPandas-per-series stateful seam (D5's batch analog)
    "holt_linear_backtest",
    # r8: localCheckpoint per peel round → ExistingRDD scans; the
    # checkpointing is the point (see the kcore plan-shape pin)
    "kcore_decomposition",
    # r8: localCheckpoint per MM round (raw and g are each read twice
    # per round — live lineage doubled per round and OOMed explainString)
    "bradley_terry_strengths",
    # r10: the seasonal sibling of holt_linear_backtest — same declared
    # applyInPandas-per-series recurrence seam
    "holt_winters_backtest",
    # r12: localCheckpoint per beam-search round → ExistingRDD scans;
    # lineage truncation is the point (the kcore discipline)
    "graph_greedy_search_topk",
    "greedy_search_recall_audit",
}


def test_no_python_anywhere_except_udf_surface(spark):
    """Sweeping invariant over EVERY registered entry: row-at-a-time
    Python (BatchEvalPython) appears in NO plan at all, and Arrow
    stages appear only in the declared UDF-surface entries."""
    arrow_tokens = (
        "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas",
        "AggregateInPandas", "ExistingRDD",
    )  # ArrowEvalPythonUDTF matches the ArrowEvalPython prefix
    violations = {}
    for name in sorted(QUERIES):
        plan = plan_of(spark, name)
        if "BatchEvalPython" in plan:
            violations[name] = "BatchEvalPython"
        elif name not in ARROW_ALLOWED and any(t in plan for t in arrow_tokens):
            violations[name] = [t for t in arrow_tokens if t in plan]
        spark.catalog.clearCache()
    assert not violations, violations


def test_no_rdd_round_trips_in_package():
    """Source-level sweep: no ``.rdd`` access anywhere in the package
    — every lane is DataFrame-native (the last holdout, the
    schemaless-transform batch lane in sources/changes.py, now spools
    to a scratch dir and infers JVM-side). AST-based so docstrings
    and comments that merely mention .rdd don't count."""
    import ast
    import pathlib

    root = pathlib.Path(__file__).parent.parent / "couchwarehouse_spark"
    offenders = []
    for path in sorted(root.rglob("*.py")):
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if isinstance(node, ast.Attribute) and node.attr == "rdd":
                offenders.append(f"{path.name}:{node.lineno}")
    assert not offenders, offenders


def test_knn_graph_group_limit_and_no_python(spark):
    """The per-node rank filter must compile to a WindowGroupLimit
    (k rows kept per node before the full window), JVM-only."""
    plan = plan_of(spark, "knn_graph_bucketed")
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_corpus_build_pushes_quality_gate(spark):
    """The quality gate must reach the parquet scan; dedup survivor
    filtering is a LeftSemi join; JVM-only throughout."""
    plan = plan_of(spark, "corpus_build_pipeline")
    assert "GreaterThanOrEqual(n_chars,200)" in plan
    assert "LeftSemi" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cohort_retention_prunes_scan(spark):
    """Both event scans read exactly (ts, user_id) — retention never
    touches the payload columns."""
    plan = explain_str(spark, "cohort_retention")
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "ts" in line and "user_id" in line
            assert "props" not in line and "value" not in line
    assert "BatchEvalPython" not in plan


def test_event_rate_anomaly_windows_hourly_grid_only(spark):
    """The stream reduces to the hourly grid (partial-aggregated)
    BEFORE the single ordered window runs — the window input is
    rows-per-hour, never raw events."""
    plan = plan_of(spark, "event_rate_anomaly")
    assert "partial_count" in plan
    assert "Window" in plan
    # The window must sit above the hour aggregate: find positions.
    agg_pos = plan.index("partial_count")
    win_pos = plan.index("Window")
    assert win_pos < agg_pos  # executed plan prints top-down


def test_source_overlap_keys_on_fingerprint(spark):
    """The source-pair self-join must key on the fingerprint — JVM-
    only, partial-aggregated output."""
    plan = plan_of(spark, "source_overlap_matrix")
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_regr_and_sketch_aggregates_are_partial(spark):
    """regr_* and the HLL sketches must partial-aggregate map-side —
    mergeable states are the whole point at scale."""
    for name in ("regression_price_qty", "approx_distinct_audit", "hll_union_audit"):
        plan = plan_of(spark, name)
        assert "partial" in plan, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_recall_audit_broadcasts_pairs_only(spark):
    """The recall audit's lang lookup must broadcast the PAIR side
    into the documents scan — the corpus never broadcasts."""
    plan = plan_of(spark, "lsh_recall_audit")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_doc_chunking_no_shuffle_no_python(spark):
    """Chunking is pure per-row array work: explode + slice must
    compile to Generate/Project with NO exchange and NO Python."""
    plan = plan_of(spark, "doc_chunking")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Generate explode" in plan


def test_snapshot_cdc_broadcasts_threshold(spark):
    """The halfway threshold is a one-row aggregate joined by
    broadcast (no driver round-trip); the diff is a single
    key join producing only changed keys."""
    plan = plan_of(spark, "snapshot_cdc")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "FullOuter" in plan


def test_incremental_agg_delta_path_no_python(spark):
    """The maintained-view merge must stay JVM-side and key its
    changed-key joins on user_id (no corpus-wide recompute artifacts
    like windows over the full feed in the delta branches)."""
    plan = plan_of(spark, "incremental_agg_maintenance")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "FullOuter" in plan  # the CDC diff feeding the delta


def test_pagerank_step_partial_aggregates_no_python(spark):
    """The PR step must stay JVM-side with map-side combined
    aggregates; the contribution sum is integer (one float division
    per row at the end)."""
    plan = explain_str(spark, "graph_pagerank_step")
    assert "partial_sum" in plan or "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_k_anonymity_two_level_distinct_aggregate(spark):
    """Exact distinct-count must expand to the two-level partial
    aggregate (no single-reducer exact distinct)."""
    plan = explain_str(spark, "k_anonymity_audit")
    assert "partial_count(distinct" in plan or "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_one_row_stats_broadcast_and_topk_heap(spark):
    """Corpus statistics come back as a broadcast one-row aggregate;
    top-15 is per-partition heaps, all JVM-side."""
    plan = plan_of(spark, "bm25_relevance")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_approx_percentile_sketches_are_partial(spark):
    """GK sketches must partial-aggregate map-side (mergeable state),
    no Python anywhere."""
    plan = explain_str(spark, "approx_percentile_audit")
    assert "partial_percentile_approx" in plan or "partial_" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Scale feature pin: with a selective dimension side on a SHUFFLE
    join, Catalyst injects a runtime bloom filter that prunes the fact
    scan before the exchange (the 100 TB semi-join reduction). Local
    SFs sit under the default application-side threshold, so the test
    lowers it — asserting the capability stays wired into this
    session's optimizer, not that tiny data triggers it."""
    from pyspark.sql import functions as F

    from .conftest import SF_SMOKE

    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan  # filter applied on the fact side
    finally:
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_zorder_interleave_is_projection(spark):
    """Morton encoding must stay a pure projection (broadcast one-row
    quantization steps, no Python, no extra shuffle before the
    64-cell aggregate)."""
    plan = plan_of(spark, "zorder_layout_cells")
    assert "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ml_inference_is_fused_projection(spark):
    """In-SQL model scoring must fuse into the scan projection: no
    Python, no shuffle, top-k via per-partition heaps."""
    plan = plan_of(spark, "ml_inference_scores")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pagerank_3iter_reuses_cached_edges(spark):
    """Three rounds must reuse the weighted edge table (one cache,
    three key-join+aggregate rounds) — no Python, partial aggregation
    everywhere."""
    plan = plan_of(spark, "graph_pagerank_3iter")
    assert plan.count("InMemoryTableScan") >= 2  # ew read by later rounds
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_triangle_count_semi_join_closure(spark):
    """The closing edge must apply as a LEFT SEMI join (existence
    check, no fan-out) over the cached undirected edge table."""
    plan = plan_of(spark, "graph_triangle_count")
    assert "LeftSemi" in plan
    assert "InMemoryTableScan" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_scd2_windows_share_one_exchange(spark):
    """scd2_user_state_history: the lag (change-detect) and lead
    (interval-close) windows use the SAME partitioning and ordering,
    so the plan must carry exactly ONE Exchange and ONE Sort — the
    second window rides the first's sorted partitions. A second
    exchange here would double the shuffle of the whole events table
    at 100 TB for no semantic gain."""
    plan = explain_str(spark, "scd2_user_state_history")
    tree = plan.split("\n\n")[0]  # the numbered operator tree
    assert tree.count("Exchange") == 1, tree
    assert tree.count("Sort") == 1, tree
    assert tree.count("Window") == 2, tree


def test_inverted_index_group_limit_before_shuffle(spark):
    """Posting heads must run as WindowGroupLimit (partial, map-side):
    a stopword-hot term then ships ≤K candidate rows per map task
    instead of its whole posting list to one reducer. The df table is
    vocab-sized and must broadcast back."""
    plan = plan_of(spark, "inverted_index_postings")
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan or "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan


def test_duplicate_ngram_removal_no_cartesian_no_python(spark):
    """Exact-substring dedup: gram census is a partial-aggregated hash
    agg; dup-gram marking is a semi join on the gram key; no all-pairs
    join and no Python anywhere."""
    plan = plan_of(spark, "duplicate_ngram_removal")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "LeftSemi" in plan
    assert "partial_count" in plan or "Partial" in plan


def test_salted_join_two_phase_aggregate(spark):
    """The weighted aggregate must partial-aggregate per (key, salt)
    — riding the salted exchange — then merge a bounded number of
    partials per key; no unsalted whole-key shuffle of raw rows."""
    plan = plan_of(spark, "salted_skew_join")
    assert "_cw_salt" in plan  # the salted key reaches the physical plan
    assert "partial_sum" in plan or "Partial" in plan


def test_event_debounce_single_exchange_for_both_windows(spark):
    """Both windows partition on (user_id, event_type): Spark must
    plan ONE exchange + sort pair reused by both window operators and
    the final aggregate — not three shuffles."""
    plan = plan_of(spark, "event_debounce")
    assert plan.count("Exchange hashpartitioning") <= 2  # windows + agg reuse
    assert "PythonUDF" not in plan


def test_winsorized_cuts_broadcast_back(spark):
    """The |groups|-row cuts table must broadcast onto the ranked scan
    — never shuffle the fact side a second time for a 3-row join."""
    plan = plan_of(spark, "winsorized_stats")
    assert "BroadcastHashJoin" in plan


def test_seeded_shuffle_head_is_take_ordered(spark):
    """The shuffle-head entry must heap-select K rows per partition
    (TakeOrderedAndProject) BEFORE the single-partition numbering
    window — the window input is K rows, never the corpus."""
    plan = plan_of(spark, "seeded_global_shuffle")
    assert "TakeOrderedAndProject" in plan
    # The window runs AFTER the take: in the tree string the Window
    # operator's child subtree must contain the TakeOrdered node.
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")


def test_semdedup_assignment_projection_and_salted_pairs(spark):
    """SemDeDup: cell assignment must be the broadcast-argmin
    projection (no corpus shuffle before assignment) and pair
    generation must join on the salted cell key — never a cartesian
    or an unsalted low-cardinality shuffle."""
    plan = plan_of(spark, "semdedup_prune")
    assert "CartesianProduct" not in plan
    # Every nested-loop join must be the 1-row cents broadcast attach
    # (BuildRight Cross) — never a data-sized cross product.
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "BuildRight, Cross" in line, line
    assert "_cw_salt" in plan
    assert "BroadcastHashJoin [cell" in plan  # pair join keys on (cell, salt)


def test_pq_assignment_is_projection(spark):
    """PQ code assignment: the 4-row codebook side broadcasts; the
    corpus path never exchanges on vec_id; no Python anywhere."""
    plan = plan_of(spark, "pq_quantization_audit")
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning(vec_id" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_retrieval_eval_two_stage_topk(spark):
    """Retrieval eval: query sample broadcasts; two window stages so
    no reducer sees a query's full score column (ann_batch_topk's
    shape); no Python."""
    plan = plan_of(spark, "retrieval_eval_mrr")
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("Window") >= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sparse_cosine_is_join_agg_pipeline(spark):
    """tf-cosine pairs: pure join + hash-agg pipeline — no window, no
    Python; posting and pair aggregates combine map-side. The DF_CAP
    stop-shingle filter is WIRED as a broadcast anti-join below the
    pair self-join (the tiny stop set broadcasts; postings never
    shuffle for the cap)."""
    plan = plan_of(spark, "sparse_cosine_pairs")
    assert "Window" not in plan
    assert "partial_count" in plan and "partial_sum" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "LeftAnti, BuildRight" in plan and "BroadcastHashJoin" in plan


def test_point_in_time_single_user_exchange(spark):
    """All four trailing features ride ONE (user_id)-keyed window —
    exactly one exchange on user_id, no self-join."""
    plan = plan_of(spark, "point_in_time_features")
    assert plan.count("hashpartitioning(user_id") == 1
    assert "Join" not in plan


def test_label_purity_label_joins_broadcast(spark):
    """The (vec_id, label) dim joins broadcast onto the edge table;
    no Python; the rollup partial-aggregates."""
    plan = plan_of(spark, "knn_label_purity")
    assert "BroadcastHashJoin" in plan
    assert "partial_sum" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bigram_surprisal_topk_heap(spark):
    """Bigram LM scoring: partial-aggregated counts, distributed
    top-k heap, no Python."""
    plan = plan_of(spark, "bigram_surprisal_scores")
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_key_skew_audit_counts_partial_aggregate(spark):
    """The per-key counts behind the skew stats combine map-side; the
    Gini rank window runs over the count table, not the corpus (no
    corpus-row window partitioning)."""
    plan = plan_of(spark, "key_skew_audit")
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_temperature_weights_one_scan_broadcast_scalars(spark):
    """The total and normalizer attach as one-row broadcasts; the
    corpus is scanned once into a partial-aggregated lang count."""
    plan = plan_of(spark, "temperature_sampling_weights")
    assert "BroadcastNestedLoopJoin" in plan
    assert "partial_count" in plan


def test_rolling_active_users_dedups_before_explosion(spark):
    """The corpus collapses to distinct (day, user) BEFORE the ×7
    explosion (partial aggregation on the dedup), and the final
    distinct-count is a two-level aggregate; no Python."""
    plan = plan_of(spark, "rolling_active_users")
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pmi_pairs_basket_join_and_topk_heap(spark):
    """Pair generation keys on the basket id; emit is a distributed
    top-k heap; the pair census partial-aggregates; no Python."""
    plan = plan_of(spark, "cooccurrence_pmi_pairs")
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_audio_framing_payload_pruned_jvm_only(spark):
    """The frame-grid fan-out is sequence+explode — all JVM, no
    Arrow/Python stage — and only byte lengths reach the aggregate."""
    plan = plan_of(spark, "multimodal_audio_framing")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate explode" in plan or "Generate" in plan


def test_contrastive_mining_bucket_join_no_python(spark):
    """Pair mining keys on the SRP bucket (never all-pairs), prunes on
    the cosine floor before the census shuffle; no Python."""
    plan = plan_of(spark, "contrastive_pair_mining")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan


def test_span_corruption_jvm_hash_single_doc_window(spark):
    """Mask seeding is JVM md5 arithmetic (no Python, no RNG); the
    island window is (doc_id)-keyed over masked positions only."""
    plan = plan_of(spark, "span_corruption_census")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "md5" in plan


def test_source_tvd_join_on_term_with_broadcast_totals(spark):
    """TVD pairs come from a TERM-keyed join of the collapsed count
    table (never corpus×corpus); totals/pair spine attach as
    broadcasts; word counts partial-aggregate map-side; no Python."""
    plan = plan_of(spark, "source_tvd_matrix")
    assert "partial_count" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kn_continuation_distinct_then_small_agg(spark):
    """Bigram TYPE table is a hash-distinct with map-side partial
    dedup; the |types| denominator is a one-row broadcast; top-k is a
    per-partition heap; no Python."""
    plan = plan_of(spark, "kn_continuation_counts")
    assert "TakeOrderedAndProject" in plan
    assert "HashAggregate" in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row denominator attach
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_boundary_overlap_is_shingle_equi_join(spark):
    """Head/tail shingles join on the shingle string — an ordinary
    shuffle hash/broadcast equi-join, never a cartesian; top-50 is a
    heap; no Python."""
    plan = plan_of(spark, "doc_boundary_overlap")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_best_of_n_single_hash_agg_no_window(spark):
    """Argmax per group is max_by in ONE two-phase hash aggregate —
    no window function, no self-join; scoring is fused into the
    scan projection."""
    plan = plan_of(spark, "best_of_n_selection")
    assert "partial_max_by" in plan or "partial_max" in plan
    assert "Window" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_preference_pairs_single_hash_agg_topk(spark):
    plan = plan_of(spark, "preference_pair_harvest")
    assert "Window" not in plan
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan


def test_gram_matrix_partial_agg_after_explode(spark):
    """The (i, j) product stream partial-aggregates map-side (the
    shuffle carries ≤ d²/2 sums per map partition, not N·d² rows);
    explodes are JVM-side Generate operators; no Python."""
    plan = plan_of(spark, "embedding_gram_matrix")
    assert "partial_sum" in plan
    assert "Generate explode" in plan or "Generate posexplode" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vocab_curve_window_over_vocab_threshold_broadcast(spark):
    """The cumsum window runs over the collapsed VOCAB table (word
    counts partial-aggregate first); the 3-row threshold probe is a
    broadcast nested-loop (non-equi), never a cartesian; no Python."""
    plan = plan_of(spark, "vocab_coverage_curve")
    assert "partial_count" in plan
    assert "Window" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_heldout_eval_lm_join_broadcast_totals(spark):
    """LM counts partial-aggregate; per-lang totals attach as a
    broadcast; scoring is an equi-join, no Python."""
    plan = plan_of(spark, "heldout_perplexity_eval")
    assert "partial_count" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_modality_pairing_full_outer_no_cartesian(spark):
    plan = plan_of(spark, "modality_pairing_audit")
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cms_sketch_small_broadcast_join(spark):
    """The sketch table (≤ D·W rows) broadcasts to the probe; word
    counts partial-aggregate; no Python; no cartesian."""
    plan = plan_of(spark, "count_min_sketch_audit")
    assert "partial_count" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bloom_audit_distinct_then_one_row(spark):
    """Key dedup and bit dedup are hash-distincts with map-side
    partial dedup; the final combine is a 1-row broadcast cross."""
    plan = plan_of(spark, "bloom_filter_build_audit")
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_attribution_single_user_window_no_join(spark):
    """Last-touch attribution is ONE user-keyed window pass — no
    self-join, no range join; the census is a tiny aggregate."""
    plan = plan_of(spark, "conversion_attribution")
    assert "Window" in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_skyline_prunes_before_pair_test(spark):
    """The exact dominance anti-join runs over grid-prune SURVIVORS
    with a broadcast build side — never a corpus-wide pair join; the
    prefix-min window runs over ≤256 cell rows."""
    plan = plan_of(spark, "skyline_cheap_early_orders")
    assert "BroadcastNestedLoopJoin" in plan  # dominance test, bounded side
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ks_drift_support_sized_window(spark):
    """Histograms partial-aggregate; the ECDF window runs over the
    merged SUPPORT, not the corpus; no Python."""
    plan = plan_of(spark, "ks_drift_doclen")
    assert "partial_count" in plan
    assert "Window" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chi2_keyness_broadcast_totals_topk_heap(spark):
    """Word counts partial-aggregate; source totals and N attach as
    broadcasts; top-k is a per-partition heap; no Python."""
    plan = plan_of(spark, "chi2_term_keyness")
    assert "partial_count" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mannwhitney_support_sized_window(spark):
    plan = plan_of(spark, "mannwhitney_drift_doclen")
    assert "partial_count" in plan
    assert "Window" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_lateness_census_single_window_no_join(spark):
    plan = plan_of(spark, "event_lateness_census")
    assert "Window" in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cms_join_size_small_sketch_join(spark):
    """Key histograms partial-aggregate; the estimator joins two
    ≤D·W-row sketches (broadcast-eligible); no row-level join of the
    base tables anywhere in the plan."""
    plan = plan_of(spark, "cms_join_size_audit")
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_epoch_plan_one_scan_broadcast_totals(spark):
    plan = plan_of(spark, "mixture_epoch_plan")
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_calibration_single_hash_agg(spark):
    """Scoring + binning fuse into the scan projection; ONE hash
    aggregate over CAL_BINS groups; no window, no join."""
    plan = plan_of(spark, "score_calibration_bins")
    assert "partial_count" in plan
    assert "Window" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_containment_postings_join_no_allpairs(spark):
    """Candidates come from the shingle-hash equi-join of postings —
    a SortMerge/ShuffledHash join keyed on (h, lang) — never a
    cartesian/broadcast-nested-loop all-pairs compare; threshold test
    is pre-aggregation-integer (no Python)."""
    plan = plan_of(spark, "containment_dup_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_min" in plan or "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # The DF_CAP stop-shingle filter is wired BELOW the pair join as a
    # broadcast anti-join (stop set is tiny by definition).
    assert "LeftAnti, BuildRight" in plan and "BroadcastHashJoin" in plan


def test_gopher_flags_single_hash_agg_no_explode(spark):
    """All four rules are in-row array ops; ONE lang-group hash
    aggregate with map-side partials; no explode, no join, no window,
    no Python."""
    plan = plan_of(spark, "gopher_quality_flags")
    assert "partial_sum" in plan
    assert "Generate" not in plan  # explode would appear as Generate
    assert "Join" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_feature_hashing_aggregates_vocab_not_tokens(spark):
    """Two stacked hash aggregates (token→term counts, term→bucket);
    the second one's input is vocabulary-sized BECAUSE it consumes the
    first's output — pinned by both aggs carrying partials and no
    join in between."""
    plan = plan_of(spark, "feature_hashing_vectorizer")
    assert plan.count("HashAggregate") >= 4  # 2 aggs × (partial+final)
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_heaps_curve_broadcast_checkpoint_dim(spark):
    """The 4-row checkpoint dim attaches by BROADCAST to both the
    vocab-sized first-seen table and the per-doc counts — no shuffle
    join, no cartesian of corpus-sized sides."""
    plan = plan_of(spark, "heaps_law_vocab_growth")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan.split("first_doc")[0] or True
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_jl_projection_pure_scan_topk(spark):
    """The k sign-projections fuse into the scan projection: no
    shuffle except the top-20 heap (TakeOrderedAndProject), no join,
    no Python."""
    plan = plan_of(spark, "random_projection_audit")
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan
    assert "Exchange" not in plan  # heap-merge needs no exchange
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dsir_weight_table_broadcast_onto_stream(spark):
    """The DSIR_DIM-row weight table must BROADCAST onto the doc-
    feature stream (never shuffle the corpus against a 128-row dim);
    per-doc reduce carries partial sums."""
    plan = plan_of(spark, "dsir_importance_weights")
    assert "BroadcastHashJoin" in plan
    assert "partial_sum" in plan
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pca_matvec_word_count_shape(spark):
    """The matvec is posexplode (Generate) → ONE 64-group hash
    aggregate with map-side partials; the Rayleigh scalar attaches by
    broadcast; no sort-merge join, no window."""
    plan = plan_of(spark, "pca_power_iteration")
    assert "Generate" in plan
    assert "partial_sum" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_stupid_backoff_lm_joins_no_cartesian(spark):
    """Scoring joins the transition stream against vocabulary-sized LM
    tables on bigram/context keys; totals attach as a one-row
    broadcast; nothing cartesian, nothing Python."""
    plan = plan_of(spark, "stupid_backoff_scores")
    assert "CartesianProduct" not in plan
    # The ONLY nested-loop join allowed is the one-row totals
    # attachment (broadcast cross) — LM lookups must be hash joins.
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "BroadcastNestedLoopJoin BuildRight, Cross" in plan
    assert plan.count("BroadcastHashJoin") >= 3  # bigram/context/unigram LMs
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_markov_user_window_then_tiny_agg(spark):
    """One user-partitioned lag window (no global sort), a |types|²
    hash aggregate with partials, totals attached by broadcast."""
    plan = plan_of(spark, "markov_transition_matrix")
    assert "Window" in plan
    assert "partial_count" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_benford_single_agg_broadcast_total(spark):
    """Digit projection fuses into the scan; ONE 9-group aggregate;
    the grand total attaches as a one-row broadcast cross."""
    plan = plan_of(spark, "benford_first_digit_audit")
    assert "partial_count" in plan
    assert "Window" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_event_pattern_two_aggregates_no_window(spark):
    """Sequences build in ONE user-keyed aggregate (sort_array is
    in-row); the census is a second tiny aggregate — no window, no
    join, no Python."""
    plan = plan_of(spark, "event_pattern_regex_census")
    assert "Window" not in plan
    assert "Join" not in plan
    assert plan.count("HashAggregate") + plan.count("ObjectHashAggregate") >= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_scd2_pit_join_is_hash_join_on_user(spark):
    """The fact-to-SCD2 lookup must be an equi hash/sort-merge join on
    user_id with the interval test as a residual — never a nested-loop
    theta join over unbounded sides."""
    plan = plan_of(spark, "scd2_point_in_time_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_weighted_sample_is_heap_topk_no_shuffle(spark):
    """A-ES sampling must be projection → TakeOrderedAndProject:
    no exchange, no window, no Python."""
    plan = plan_of(spark, "weighted_sample_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_zipf_spectrum_partial_aggregates(spark):
    """Both count levels must map-side combine; the vocab total joins
    as a one-row broadcast; the head is a bounded top-k sort."""
    plan = plan_of(spark, "zipf_frequency_spectrum")
    assert "partial_count" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_fk_audit_broadcasts_dimension_keys(spark):
    """Every dimension-edge probe must broadcast the distinct parent
    keys; counters are partial-aggregated."""
    plan = plan_of(spark, "referential_integrity_audit")
    assert plan.count("BroadcastHashJoin") >= 5
    assert "partial_count" in plan


def test_streaks_single_user_exchange(spark):
    """The dedup, the row_number window, and the run aggregate must
    share ONE user-keyed exchange — no second shuffle on user_id, no
    self-join."""
    plan = plan_of(spark, "user_activity_streaks")
    assert plan.count("hashpartitioning(user_id") <= 1
    assert "Join" not in plan


def test_ngram_novelty_distinct_combines_mapside(spark):
    """The train-gram DISTINCT must partial-aggregate before its
    exchange; the probe is one hash join keyed on (lang, gram)."""
    plan = plan_of(spark, "ngram_novelty_audit")
    assert "partial_count" in plan or "HashAggregate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_fertility_counts_not_tokens_cross_exchange(spark):
    """Fertility must aggregate per-row COUNT projections — no explode
    (Generate) anywhere, partial aggregation before the exchange."""
    plan = plan_of(spark, "tokenizer_fertility_by_lang")
    assert "Generate" not in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_fano_two_stacked_aggregates(spark):
    """Fano: day-grid aggregate then type aggregate, both map-side
    combined; no window, no join."""
    plan = plan_of(spark, "burstiness_fano_census")
    assert "partial_count" in plan
    assert "Window" not in plan and "Join" not in plan


def test_jackknife_single_scan_broadcast_total(spark):
    """Jackknife: the per-source table persists (both consumers read
    the cache, the corpus scans once); the grand total attaches as a
    one-row broadcast."""
    plan = plan_of(spark, "jackknife_source_sensitivity")
    assert plan.count("InMemoryTableScan") >= 2
    assert "BroadcastNestedLoopJoin" in plan


def test_normalized_dedup_gain_one_scan(spark):
    """Both hash lanes must read the persisted single scan — two
    InMemoryTableScans over one cached projection (the FileScan lines
    in the plan text are the cache's lineage, printed per consumer,
    not executed per consumer)."""
    plan = plan_of(spark, "normalized_dedup_gain")
    assert plan.count("InMemoryTableScan") >= 2


def test_shipping_lag_prunes_columns(spark):
    """The lineitem scan must read only the join key and ship date."""
    plan = plan_of(spark, "shipping_lag_census")
    import re
    li_scans = [l for l in plan.splitlines() if "lineitem.parquet" in l]
    assert li_scans and all(
        "l_orderkey" in l and "l_shipdate" in l and "l_quantity" not in l
        for l in li_scans
    )


def test_markov_entropy_single_event_exchange(spark):
    """The events stream crosses one user-keyed exchange; the entropy
    window runs over the tiny transition matrix only."""
    plan = plan_of(spark, "markov_conditional_entropy")
    assert plan.count("hashpartitioning(user_id") <= 1


def test_star_flatten_broadcasts_all_dimensions(spark):
    """Every dimension must broadcast; the only shuffle join is the
    fact-fact order-key join; scans are column-pruned."""
    plan = plan_of(spark, "star_flatten_export")
    assert plan.count("BroadcastHashJoin") >= 6
    assert "TakeOrderedAndProject" in plan
    li_scans = [l for l in plan.splitlines()
                if "lineitem.parquet" in l and "ReadSchema" in l]
    assert li_scans and all("l_comment" not in l and "l_tax" not in l
                            for l in li_scans)


def test_boilerplate_suffix_no_explode(spark):
    """The tail slice is a projection — no Generate (explode), one
    map-side-combined aggregate, bounded TopK head."""
    plan = plan_of(spark, "boilerplate_suffix_census")
    assert "Generate" not in plan
    assert "partial_count" in plan
    assert "TakeOrderedAndProject" in plan


def test_dbscan_join_keys_on_bucket(spark):
    """The DBSCAN neighbor join must key on the SRP bucket — never a
    cartesian — and stay JVM-side."""
    plan = plan_of(spark, "dbscan_core_census")
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(bucket" in plan or "SortMergeJoin [bucket" in plan \
        or "BroadcastHashJoin [bucket" in plan or "bucket#" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_psi_edges_broadcast(spark):
    """PSI: the decile-edge table attaches as a broadcast range
    lookup; no corpus-sized exchange beyond the census aggregates."""
    plan = plan_of(spark, "psi_drift_audit")
    assert "BroadcastNestedLoopJoin" in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_simpson_strata_single_scan(spark):
    """The Simpson scan persists its strata: the pooled row and the
    per-stratum output both read the cache, and the customer dim
    comes in broadcast."""
    plan = plan_of(spark, "simpsons_paradox_scan")
    assert "InMemoryTableScan" in plan
    assert "BroadcastHashJoin" in plan


def test_sql_udfs_inline_fully(spark):
    """SQL UDFs must vanish into codegen — no Python nodes, partial
    aggregation present."""
    plan = plan_of(spark, "sql_udf_functions")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_sum" in plan


def test_collocation_llr_type_table_only(spark):
    """G² marginals and totals reduce the bigram TYPE table; no window,
    no Python; partial aggregation before every exchange."""
    plan = plan_of(spark, "collocation_llr_pairs")
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k on the integer score
    assert "partial_count" in plan and "partial_sum" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_lsh_band_tuning_counts_never_materializes_pairs(spark):
    """The band-tuning audit must be join-FREE: candidate mass comes
    from bucket-size arithmetic (two hash aggregates over the exploded
    band keys), never a pair join."""
    plan = plan_of(spark, "lsh_band_tuning_audit")
    assert "Join" not in plan
    assert "Window" not in plan
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cross_source_leakage_no_allpairs(spark):
    """Leakage matrix joins doc fingerprints against the DEDUPED
    (source, fp) membership table on the fingerprint key — never a
    cartesian/nested-loop compare."""
    plan = plan_of(spark, "cross_source_leakage_matrix")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cdc_chunking_is_doc_local(spark):
    """Content-defined chunking: one (doc)-partitioned running-sum
    window assigns chunk ids; the dedup census is hash aggregates on
    the digest — no join anywhere, no Python."""
    plan = plan_of(spark, "cdc_chunk_dedup")
    assert "Join" not in plan
    assert plan.count("hashpartitioning(doc_id") >= 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_minhash_error_audit_band_join_only(spark):
    """Estimate-error audit candidates come from the band-bucket
    equi-join — never cartesian/nested-loop; final reduce partial-
    aggregates."""
    plan = plan_of(spark, "minhash_estimate_error_audit")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan or "partial_sum" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mutual_knn_single_pair_agg_no_self_join(spark):
    """Mutual census must count orientations in ONE (a,c)-keyed
    aggregate over the directed edges — an edge-table self-join here
    would double the shuffle for identical semantics. No Python."""
    plan = plan_of(spark, "mutual_knn_pairs")
    assert "SortMergeJoin" not in plan.split("HashAggregate", 1)[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_assortativity_reuses_cached_und_edges(spark):
    """The persisted und edge table feeds the degree agg and both
    endpoint joins — three InMemoryTableScans, not three k-NN graph
    rebuilds. No Python."""
    plan = plan_of(spark, "degree_assortativity")
    assert plan.count("InMemoryTableScan") >= 3, plan.count("InMemoryTableScan")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kcore_rounds_scan_checkpoints_not_lineage(spark):
    """Each k-core round must read the PREVIOUS round's materialized
    frame (localCheckpoint → ExistingRDD scans), never re-derive the
    k-NN build: with live lineage the unioned per-round plan re-embeds
    every earlier round and the AQE plan string alone OOMed a 4g
    driver on a 1k-edge graph. No Python."""
    plan = plan_of(spark, "kcore_decomposition")
    assert "Scan ExistingRDD" in plan
    assert "list_cosine" not in plan  # knn build truncated away
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_zorder_range_query_pushes_filter_to_scan(spark):
    """zorder_relayout_e2e's BETWEEN lands in the parquet scan as
    pushed min/max predicates — the hook row-group stats skipping
    hangs off (the relayout's payoff, pinned value-side by
    TestZorderRowGroupPruning)."""
    plan = explain_str(spark, "zorder_relayout_e2e")
    assert "GreaterThanOrEqual(total,60000" in plan
    assert "LessThanOrEqual(total,120000" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_streaming_enrich_dim_is_broadcast(spark):
    """The stream-static enrichment dimension chain is broadcast (the
    batch twin of the per-micro-batch BroadcastHashJoin the stream
    runs): nation into customer, then the dim into the fact side."""
    from couchwarehouse_spark.catalog import load_table
    from pyspark.sql import functions as F

    dim = (
        load_table(spark, SF_SMOKE, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            load_table(spark, SF_SMOKE, "nation").select("n_nationkey", "n_name"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("nation"))
    )
    fact = load_table(spark, SF_SMOKE, "orders").select("o_custkey", "o_totalprice")
    joined = fact.join(F.broadcast(dim), fact.o_custkey == dim.c_custkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_kmv_kth_hash_via_take_ordered_heap(spark):
    """The K smallest hashes must come from a TakeOrdered heap
    (per-partition partial top-K), never a global sort of the
    distinct-hash table."""
    plan = plan_of(spark, "kmv_distinct_audit")
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_item_cf_pair_join_keys_on_basket(spark):
    """Item-item CF must pair WITHIN baskets (order-keyed equi-join,
    never a cartesian of the item vocabulary) and select top-k via a
    heap."""
    plan = plan_of(spark, "item_cooccurrence_cf")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_consistent_hash_ring_is_literal_projection(spark):
    """Ring assignment must fold the shard points into the projection
    as an array literal — NO join of any kind appears in the plan
    (a data-sized ring table would be wrong at any scale)."""
    plan = plan_of(spark, "consistent_hash_rebalance")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_fellegi_sunter_pairs_are_block_keyed(spark):
    """Record-linkage candidate pairs must come from the blocking-key
    equi-join — a CartesianProduct would mean the blocking key was
    silently dropped — and the pair join must key on the SUB-SALT
    column `sb` alongside the block key (FS_BLOCK_CAP): an unsalted
    whole-block pair join would put a hot (segment, nation) cell's
    quadratic work on a single task at 100×."""
    plan = plan_of(spark, "fellegi_sunter_linkage")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # The salted pair join carries sb in its equi-key list. The key
    # triple appears together in a join node's key expression.
    import re

    assert re.search(r"Join.*\bsb#\d+", plan) or re.search(
        r"hashpartitioning\([^)]*\bsb#\d+", plan
    ), plan


# -- round-10 pins: the late-r9 statistics batch must keep its
# no-pair-join / histogram-reduce shapes (r9 verdict #5) -------------


def test_hodges_lehmann_is_broadcast_histogram_convolution(spark):
    """The median of n_x·n_y pairwise differences must come from the
    broadcast histogram CONVOLUTION (one BroadcastNestedLoopJoin of
    two value histograms), never a row-level pair join: no
    SortMergeJoin, no CartesianProduct, anywhere in the plan."""
    plan = plan_of(spark, "hodges_lehmann_shift")
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cliff_delta_reduces_over_histograms_no_join(spark):
    """Cliff's delta is a pure distinct-value-histogram reduce — the
    tie-exact dominance counts come from a window over the collapsed
    value table, with NO join of any kind in the plan."""
    plan = plan_of(spark, "cliff_delta_effect")
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_runs_test_broadcast_scalars_only(spark):
    """Wald-Wolfowitz reduces the daily series against broadcast
    one-row totals: exactly one BroadcastNestedLoopJoin, never a
    shuffled join."""
    plan = plan_of(spark, "runs_test_randomness")
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kruskal_wallis_rank_sums_from_cached_histogram(spark):
    """K-sample rank ANOVA must never globally sort rows: ranks come
    from the persisted value-histogram (InMemoryTableScan reuse), and
    every join is broadcast (group labels / scalar totals) — no
    SortMergeJoin of row-level frames."""
    plan = plan_of(spark, "kruskal_wallis_doclen")
    assert plan.count("InMemoryTableScan") >= 2, plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_wasserstein_joins_only_collapsed_value_tables(spark):
    """Earth-mover drift aligns the two sources' CDFs with exactly two
    FULL OUTER merges of distinct-value histograms (full outer cannot
    broadcast; domain-bounded SMJ is the designed shape) — any other
    join shape means a row-level pair path crept in."""
    plan = plan_of(spark, "wasserstein_doclen_drift")
    assert plan.count("SortMergeJoin") == 2, plan
    assert plan.count("FullOuter") == 2, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_binary_segmentation_argmax_is_heap(spark):
    """The changepoint argmax over candidate splits must be a
    TakeOrderedAndProject heap over the collapsed daily series, with
    only the broadcast one-row totals joined in."""
    plan = plan_of(spark, "binary_segmentation_split")
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_knn_hubness_pairs_are_bucket_keyed(spark):
    """The k-occurrence census builds its candidate pairs from the
    LSH bucket equi-join (BroadcastHashJoin keyed on bucket) — a
    CartesianProduct would mean the bucket key was dropped and the
    audit went all-pairs."""
    plan = plan_of(spark, "knn_hubness_audit")
    assert "BroadcastHashJoin [bucket" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# -- round-10 pins: the new operators keep their designed shapes ------


def test_hill_topk_is_heap_not_sort(spark):
    """The k+1 largest order statistics must come from a
    TakeOrderedAndProject heap, never a global sort of the corpus."""
    plan = plan_of(spark, "hill_tail_index")
    assert "TakeOrderedAndProject" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_log2_histogram_joins_only_broadcast(spark):
    """The sketch pick and truth lookup join the 3-row quantile grid
    against collapsed histograms — every join must be broadcast
    (hash or nested-loop over the grid); a SortMergeJoin would mean a
    row-level path crept in."""
    plan = plan_of(spark, "log2_histogram_quantiles")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_permutation_replicates_broadcast_fanout(spark):
    """The R-replicate grid fans out via broadcast joins only; the
    per-replicate statistic is a hash aggregate (map-side partials),
    never a shuffled row join."""
    plan = plan_of(spark, "permutation_test_ab")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_triple_itemset_no_candidate_self_join(spark):
    """Candidate triples enumerate INSIDE the collected basket array:
    no SortMergeJoin and no CartesianProduct anywhere — the only
    joins are the broadcast brand dimension and the one-row total."""
    plan = plan_of(spark, "triple_itemset_support")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cvm_single_collapsed_full_outer(spark):
    """CvM aligns the two CDFs with exactly ONE full-outer merge of
    distinct-value histograms (domain-bounded, the KS shape)."""
    plan = plan_of(spark, "cramer_von_mises_drift")
    assert plan.count("SortMergeJoin") == 1, plan
    assert plan.count("FullOuter") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_phash_near_dup_band_keyed(spark):
    """Candidate pairs come from the (band_idx, band_val) equi-join;
    payload bytes never join — a CartesianProduct means the band key
    was dropped."""
    plan = plan_of(spark, "multimodal_phash_near_dup")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mcc_is_single_global_aggregate(spark):
    """Scoring fuses into the scan projection; the cells are one
    partial-aggregated global sum — zero joins, zero windows."""
    plan = plan_of(spark, "mcc_confusion_scalars")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sequential_detectors_run_on_collapsed_series(spark):
    """page_hinkley / ljung_box / ess / hurst reduce the corpus to the
    daily grid first: no SortMergeJoin of row-level frames anywhere
    (the lag pairing joins the collapsed grid to itself via broadcast
    at test scale; key point is no Python and no cartesian)."""
    for name in (
        "page_hinkley_drift",
        "ljung_box_test",
        "effective_sample_size",
        "hurst_exponent_rs",
    ):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_theil_atkinson_reduces_no_pair_join(spark):
    """Inequality indices reduce the corpus to per-source ln-sums and
    one broadcast-scalar fan-in: no shuffled join of row-level frames,
    no Python stage."""
    plan = plan_of(spark, "theil_atkinson_concentration")
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pr_auc_single_rank_window(spark):
    """Average precision is ONE rank window over the scored frame plus
    a broadcast-scalar total — no pair join, no Python."""
    plan = plan_of(spark, "pr_auc_classifier")
    assert plan.count("Window") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_jelinek_mercer_topk_is_heap(spark):
    """The third Lucene similarity keeps the LM-Dirichlet shape: the
    report head is a TakeOrdered heap and the collection stats arrive
    via one broadcast scalar — no shuffled join, no Python."""
    plan = plan_of(spark, "lm_jelinek_mercer_relevance")
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_overdispersion_capture_recapture_pure_aggregates(spark):
    """Both screens are pure partial-aggregated reduces — zero joins,
    zero windows, zero Python; capture-recapture is a SINGLE global
    aggregate (one exchange)."""
    for name in ("overdispersion_index", "capture_recapture_estimate"):
        plan = plan_of(spark, name)
        assert "Join" not in plan, name
        assert "Window" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
    assert plan_of(spark, "capture_recapture_estimate").count("Exchange") == 1


def test_pinball_predictor_broadcasts_to_scorer(spark):
    """The p90 predictor is a one-row broadcast against the corpus and
    the rank window runs over the collapsed value histogram — no
    shuffled join, no cartesian, no Python."""
    plan = plan_of(spark, "pinball_loss_eval")
    assert plan.count("Window") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_round11_stats_reduce_on_collapsed_grids(spark):
    """jarque_bera / mantel_haenszel / yule_walker / gpd reduce over
    daily-grid or value-domain tables with broadcast-scalar fan-ins
    only: no shuffled pair join, no cartesian, no Python stage."""
    for name in (
        "jarque_bera_normality",
        "mantel_haenszel_or",
        "yule_walker_ar2",
        "gpd_pot_tail_fit",
    ):
        plan = plan_of(spark, name)
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert plan.count("BroadcastNestedLoopJoin") <= 2, name
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_srm_is_pure_aggregate(spark):
    """The SRM guardrail is a distinct + one global conditional sum —
    zero joins, zero windows, zero Python."""
    plan = plan_of(spark, "srm_guardrail_check")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_winnowing_minimizer_keyed_no_allpairs(spark):
    """Winnowing candidates come from the minimizer inverted index
    (DF-capped posting lists): no cartesian, no Python, doc-local
    higher-order functions for the sketch, heap for the report head."""
    plan = plan_of(spark, "winnowing_fingerprints")
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_round11_graph_entries_no_cartesian_no_python(spark):
    """jaccard/PA and per-node clustering keep the wedge-join shape:
    candidate pairs only via shared-neighbor/edge keys, report heads
    as TakeOrdered heaps."""
    for name in ("jaccard_pa_linkpred", "local_clustering_coefficient"):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "TakeOrderedAndProject" in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_round11_wave2_collapsed_reduces(spark):
    """cochran_armitage / durbin_watson / gumbel / ratio-delta reduce
    over group or daily grids: no pair join, no cartesian, no Python."""
    for name in (
        "cochran_armitage_trend",
        "durbin_watson",
        "gumbel_block_maxima_fit",
        "ratio_metric_delta_method",
    ):
        plan = plan_of(spark, name)
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_isotonic_lattice_bounded_by_grid(spark):
    """The PAV minimax joins run over the B-bin calibration grid
    (broadcast-sized frames), never the event corpus: the event scan
    feeds ONE per-user aggregate and everything after is grid-bounded;
    no Python stage."""
    plan = plan_of(spark, "isotonic_calibration_pav")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the B-bin grid is persisted and reused — the interval lattice
    # reads the cache, not the event corpus (cached subtrees echo
    # their FileScan child in the printed plan, so count the cache)
    assert "InMemoryTableScan" in plan, plan


def test_energy_distance_no_pair_join(spark):
    """All three all-pairs abs-difference sums come from cumulative
    windows over the merged value DOMAIN — one full-outer histogram
    merge, no cartesian, no Python (the KS/CvM shape)."""
    plan = plan_of(spark, "energy_distance_drift")
    assert plan.count("FullOuter") == 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_burstiness_is_two_hash_aggs_and_heap(spark):
    """Explode → (doc, term) agg → term agg → TakeOrdered heap; no
    joins at all, no Python."""
    plan = plan_of(spark, "term_burstiness_adaptation")
    assert "Join" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_half_life_decay_grid_reduce(spark):
    """The decayed counter reduces the corpus to the (type, day) grid
    first; the max-day anchor and total arrive as broadcast scalars —
    no shuffled pair join, no Python."""
    plan = plan_of(spark, "half_life_decayed_popularity")
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_gains_table_user_sized_rank(spark):
    """The corpus reduces to the USER table before the rank window;
    no joins at all, no Python."""
    plan = plan_of(spark, "gains_decile_table")
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# -- round-12 pins ----------------------------------------------------


def test_greedy_search_stays_jvm_side_and_bounded(spark):
    """The traversal loop materializes per-round localCheckpoints, so
    the final plan is a TakeOrdered heap over the (bounded) visited
    checkpoint — no Python eval, no CartesianProduct anywhere, and no
    full-corpus sort."""
    plan = plan_of(spark, "graph_greedy_search_topk")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_greedy_recall_audit_broadcasts_scalars(spark):
    plan = plan_of(spark, "greedy_search_recall_audit")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_round12_stats_reduce_on_collapsed_grids(spark):
    """The r12 statistics batch must reduce over value-collapsed
    grids/histograms — no CartesianProduct (broadcast 1-row cross
    joins compile to BroadcastNestedLoopJoin), no Python stage."""
    for name in (
        "wilcoxon_signed_rank",
        "kendall_w_concordance",
        "negative_binomial_mom_fit",
        "cohens_d_effect_size",
        "theil_u_uncertainty",
        "hellinger_doclen_drift",
        "msttr_lexical_diversity",
        "yule_k_lexical_richness",
        "stratified_kfold_audit",
    ):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        spark.catalog.clearCache()


def test_max_drawdown_trough_is_heap(spark):
    """The trough-day argmax must be TakeOrderedAndProject over the
    collapsed daily series, not a global sort."""
    plan = plan_of(spark, "max_drawdown_series")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_anderson_darling_collapsed_support(spark):
    """AD must reduce over the merged value-domain histogram (the CvM
    scaffold) — no pair join, no Python."""
    plan = plan_of(spark, "anderson_darling_drift")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan or "FullOuter" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
