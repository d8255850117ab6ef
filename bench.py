"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# A real driver heap BEFORE the JVM gateway launches (builder conf is
# too late — session.py NB): the suite runs 249 queries in one JVM and
# the default 1g heap flakes on broadcast builds under end-of-suite
# memory pressure. setdefault so an external setting still wins.
os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")

import couchwarehouse_spark.plans.all  # noqa: F401  (populate registry)
from couchwarehouse_spark.plans import QUERIES
from couchwarehouse_spark.session import get_spark

# Headline set: exercised every round; representative of the operator
# families (scan/agg, join, window, ETL kernel, dedup, similarity,
# text, event-time). Every other registered query still runs after.
HEADLINE = [
    "pricing_summary",          # scan → filter → hash agg (TPC-H Q1 shape)
    "nation_revenue",           # multi-way broadcast join + agg
    "window_top_orders",        # ranking/analytic windows
    "latest_event_per_user",    # upsert kernel (latest-wins window dedup)
    "exact_dedup",              # X1 hash-agg dedup census
    "minhash_lsh_candidates",   # X1 MinHash-LSH near-dup (sub-quadratic path)
    "knn_cosine_topk",          # X2 vector top-k
    "hybrid_search_rrf",        # X2+X4 lexical+vector fusion
    "token_frequency",          # X4 tokenize/explode/count
    "repetition_census",        # X+ curation quality gate
    "tumbling_window_counts",   # D4 event-time windows
    "warehouse_e2e_pipeline",   # R1→R14 full ETL kernel
    "time_travel_cdc",          # manifest snapshot versions + time travel
    "snapshot_cdc",             # CDC between merged states
    "scd2_user_state_history",  # SCD Type-2 validity intervals
    "bm25_relevance",           # S19 full-text BM25
    "doc_chunking",             # X4 context-window chunking
    "graph_pagerank_3iter",     # X2 iterative graph kernel
    "dataset_card",             # X+ one-row corpus release stats
    "duplicate_ngram_removal",  # X1 exact-substring span dedup (r5)
    "semdedup_prune",           # X2 learned-cell semantic dedup (r5)
    "inverted_index_postings",  # X4 index build via WindowGroupLimit (r5)
    "event_debounce",           # D4 gaps-and-islands burst suppression (r5)
    "sparse_cosine_pairs",      # X1 integer-exact tf-cosine pairs (r6)
    "pq_quantization_audit",    # X2 product-quantization distortion (r6)
    "point_in_time_features",   # D4 leakage-safe feature backfill (r6)
    "retrieval_eval_mrr",       # X2 retrieval eval harness (r6)
    "source_tvd_matrix",        # X+ integer-exact mixture-drift audit (r6b)
    "embedding_gram_matrix",    # X2 distributed X'X kernel (r6b)
    "containment_dup_pairs",    # X1 doc-in-doc containment pairs (r6c)
    "dsir_importance_weights",  # X+ DSIR target-domain sampling weights (r6c)
    "markov_transition_matrix", # D4 user-journey transition kernel (r6c)
    "predicate_delete_cdc",     # R11+ delete_where + CDF certification (r6d)
    "ngram_novelty_audit",      # X+ train→test memorization exposure (r6d)
    "weighted_sample_topk",     # X+ A-ES weighted sampling, zero-shuffle (r6d)
    "referential_integrity_audit",  # S10+ FK orphan census (r6d)
    "kneser_ney_bigram_scores", # X4 interpolated-KN held-out scoring (r7)
    "cdc_chunk_dedup",          # X1 content-defined chunk dedup census (r7)
    "lsh_band_tuning_audit",    # X1 join-free band-geometry pricing (r7)
    "cross_source_leakage_matrix",  # X1 source-pair contamination (r7)
    "warehouse_split_transform_e2e",  # R5+R8 split/transform e2e (r8)
    "kcore_decomposition",      # X2 bounded graph peel, checkpointed (r8)
    "pseudo_relevance_feedback",  # S19+ two-pass BM25 query expansion (r8)
    "cuped_adjusted_abtest",    # X+ experiment variance reduction (r8)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="couchwarehouse_bench")

    names = [n for n in HEADLINE if n in QUERIES]
    extra = [n for n in sorted(QUERIES) if n not in names]
    names += extra
    if not names:
        sys.exit("no queries registered — check couchwarehouse_spark.plans.all imports")

    # Neutral warm-up (JIT, codegen, parquet reader + footers) so the
    # first benchmarked query isn't measured colder than the rest.
    # limit(1) touches each table's footer/schema without precomputing
    # any benchmark result (and caches are cleared between queries).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(100).groupBy("id").count().collect()
    for tbl in ("region", "lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{tbl}.parquet")).limit(1).collect()
    # One REAL untimed query over the actual parquet exercising the
    # hot engine paths the footer probes above don't reach — the
    # vectorized columnar scan loop, hash-agg codegen + Janino, a
    # shuffle exchange write/read, and a broadcast-hash join. Without
    # it the first timed entry (pricing_summary) absorbed ~1 s of
    # JVM/codegen warm-up every round (2.77 s in BENCH_r07 vs 1.88 s
    # warm in r06 — r7 verdict #3). The warm-up SHAPE is deliberately
    # distinct from every benchmarked query so no entry gets its own
    # compiled plan handed to it for free.
    _li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    _or = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    (
        _li.join(_or, _li.l_orderkey == _or.o_orderkey)
        .groupBy("l_linestatus", "o_orderstatus")
        .agg({"l_quantity": "avg", "l_tax": "sum"})
        .write.format("noop").mode("overwrite").save()
    )

    # Per-query hang guard: each query runs in its own job group and a
    # watchdog cancels the group after PER_QUERY_TIMEOUT_S — a wedged
    # query costs one error line, never the whole bench.
    per_query_timeout = float(os.environ.get("SPARK_GRAFT_QUERY_TIMEOUT_S", "180"))

    # Optional noise protocol (default OFF — single pass, identical
    # behavior and contract line): SPARK_GRAFT_BENCH_PASSES=N runs the
    # whole query list N times and reports the per-query MINIMUM, the
    # noise-robust statistic this host's 1.2-3x same-code swings need
    # (BENCH_HISTORY.md discipline). Interleaving whole passes (not
    # repeating each query back-to-back) keeps every timed execution
    # cold-cache per query while bursty host contention averages out
    # across passes.
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "1")))

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for pass_no in range(passes):
        for name in names:
            t0 = time.monotonic()
            sc = spark.sparkContext
            sc.setJobGroup(f"bench:{name}", name, interruptOnCancel=True)
            # cancelJobGroupAndFutureJobs (Spark 4) also kills jobs the
            # query submits AFTER the timer fires — a plain cancelJobGroup
            # is a no-op if the query happens to be between jobs (driver-
            # side work) at fire time and the hang guard wouldn't hold.
            cancel = getattr(sc, "cancelJobGroupAndFutureJobs", sc.cancelJobGroup)
            timer = threading.Timer(
                per_query_timeout,
                lambda g=f"bench:{name}": cancel(g),  # bind NOW, not at fire
            )
            timer.daemon = True
            timer.start()
            try:
                df = QUERIES[name](spark, sf_dir)
                # Materialize every column of every row (noop sink) — count()
                # would let Catalyst prune the very columns the query computes.
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:  # one broken query costs one line, not the run
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                print(f"# {name}: ERROR {errors[name].splitlines()[0]}", file=sys.stderr)
            else:
                t = round(time.monotonic() - t0, 3)
                if name not in timings or t < timings[name]:
                    timings[name] = t
                print(f"# {name}: {t}s", file=sys.stderr)
            finally:
                timer.cancel()
                sc.setLocalProperty("spark.jobGroup.id", None)
                # Drop caches a query left behind (several operators persist
                # intermediates they cannot unpersist before returning) so later
                # queries aren't measured under accumulated memory pressure.
                spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "", 1).isdigit() else sf
    # Full per-query map → stderr (one line, greppable). The stdout
    # line must stay parseable inside a bounded tail capture (the
    # round driver keeps the last ~2000 chars of output and parses
    # the JSON it finds there — BENCH_r03 lost the headline timings
    # to exactly this truncation), so stdout carries the headline
    # set + aggregates and always fits. Within the stderr map, the
    # driver-WINDOW entries are serialized LAST: tail truncation keeps
    # the end of the line, so a window entry's timing can never be the
    # part that's cut (r06 verdict polish ask).
    try:
        from __spark_entry__ import PRIORITY as _WINDOW
    except Exception:  # bench must never die on the shim
        _WINDOW = []
    ordered = {
        n: timings[n] for n in sorted(timings) if n not in set(_WINDOW)
    }
    ordered.update({n: timings[n] for n in _WINDOW if n in timings})
    full = {
        "metric": "total_query_wall_sec", "value": total, "unit": "sec",
        "queries": ordered, "sf": sf_val,
    }
    if errors:
        full["errors"] = errors
    print("# full: " + json.dumps(full), file=sys.stderr)
    out = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": {n: timings[n] for n in HEADLINE if n in timings},
        "sf": sf_val,
        "n_queries": len(timings),
        "other_query_wall_sec": round(
            total - sum(t for n, t in timings.items() if n in HEADLINE), 3
        ),
    }
    if errors:
        out["n_errors"] = len(errors)
        out["error_queries"] = sorted(errors)[:10]
    line = json.dumps(out)
    assert len(line) < 1900, f"stdout bench line too long ({len(line)})"
    print(line)


if __name__ == "__main__":
    main()
