"""Semantic properties of the training-data curation operators
(plans.sampling) beyond the oracle hash: split totals, sample sizes,
determinism, and leakage-audit internal consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

import couchwarehouse_spark.plans.all  # noqa: F401  (populate registry)
from couchwarehouse_spark.catalog import load_table
from couchwarehouse_spark.plans.sampling import SAMPLE_K
from couchwarehouse_spark.plans.registry import QUERIES

from .conftest import SF_SMOKE


def test_split_partitions_every_doc(spark):
    census = QUERIES["deterministic_split"](spark, SF_SMOKE).toPandas()
    total_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert census["n_docs"].sum() == total_docs
    assert set(census["split"]) <= {"train", "val", "test"}
    # 80/10/10 within loose tolerance (500 docs, md5-uniform buckets)
    frac = census.groupby("split")["n_docs"].sum() / total_docs
    assert 0.6 < frac["train"] < 0.95
    assert frac["val"] < 0.25 and frac["test"] < 0.25


def test_stratified_sample_deterministic_and_sized(spark):
    a = QUERIES["stratified_sample"](spark, SF_SMOKE).toPandas()
    b = QUERIES["stratified_sample"](spark, SF_SMOKE).toPandas()
    key = ["lang", "sample_rank"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    ), "sample must be identical across runs"
    strata = load_table(spark, SF_SMOKE, "documents").groupBy("lang").count().toPandas()
    expected = strata.set_index("lang")["count"].clip(upper=SAMPLE_K)
    got = a.groupby("lang")["doc_id"].count()
    assert got.sort_index().equals(expected.sort_index().astype(got.dtype))


def test_decontamination_bounds(spark):
    r = QUERIES["benchmark_decontamination"](spark, SF_SMOKE).toPandas()
    assert (r["n_contaminated"] <= r["n_corpus_docs"]).all()
    assert r["n_contaminated"].sum() > 0, "synthetic corpus must show overlap"


def test_leakage_check_consistency(spark):
    r = QUERIES["split_leakage_check"](spark, SF_SMOKE).toPandas()
    leaky, affected = int(r["leaky_fingerprints"][0]), int(r["docs_affected"][0])
    # every leaky fingerprint spans >= 2 docs by construction
    assert affected >= 2 * leaky
    assert leaky > 0, "synthetic corpus must show cross-split near-dups"


def test_full_outer_cohorts_cover_all_customers(spark):
    r = QUERIES["order_cohort_full_outer"](spark, SF_SMOKE).toPandas()
    orders = load_table(spark, SF_SMOKE, "orders")
    n95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    n96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    expected_total = n95.union(n96).distinct().count()
    assert r["n_customers"].sum() == expected_total


def test_resample_gate_decorrelated_from_split():
    """The salted resample gate must be independent of the split
    bucket: at a harsh keep-rate the kept set still lands ~80/10/10
    across train/val/test. The UNSALTED gate is provably correlated
    (100 | 10000 ⇒ bucket10k < 40 forces bucket100 < 40 ⇒ every kept
    doc is 'train') — this pins the salt so a refactor can never drop
    it silently. DuckDB evaluates the exact SQL forms the oracles use."""
    import duckdb

    from couchwarehouse_spark.plans.sampling import (
        RESAMPLE_BP,
        RESAMPLE_SALT,
        _hash_bucket_sql,
    )

    con = duckdb.connect()
    con.sql("CREATE VIEW ids AS SELECT range AS doc_id FROM range(0, 20000)")
    salted = _hash_bucket_sql(RESAMPLE_BP, RESAMPLE_SALT).replace("doc_id", "ids.doc_id")
    unsalted = _hash_bucket_sql(RESAMPLE_BP).replace("doc_id", "ids.doc_id")
    split = _hash_bucket_sql(100).replace("doc_id", "ids.doc_id")
    rate = 40  # keep 0.4% — the harsh-downsample regime
    got = con.sql(
        f"""SELECT
              count(*) FILTER ({salted} < {rate})                          AS kept,
              count(*) FILTER ({salted} < {rate} AND {split} >= 80)        AS kept_eval,
              count(*) FILTER ({unsalted} < {rate} AND {split} >= 80)      AS unsalted_eval
            FROM ids"""
    ).fetchone()
    kept, kept_eval, unsalted_eval = got
    assert kept > 40  # the gate actually fires at this resolution
    # Salted: ~20% of kept docs belong to val/test (loose bounds).
    assert 0.05 < kept_eval / kept < 0.4
    # Unsalted: provably zero kept docs outside train.
    assert unsalted_eval == 0


def test_quantizer_error_within_theoretical_bound(spark):
    """int8 midpoint reconstruction error is bounded by half a bin:
    max_abs_err ≤ max_dim_range/512 (+ float slack). Catches any
    regression that breaks the quantizer arithmetic while leaving both
    lanes consistently wrong (which the oracle alone cannot see)."""
    audit = QUERIES["int8_quantization_audit"](spark, SF_SMOKE).toPandas()
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x")
    )
    rng = emb.groupBy("dim").agg((F.max("x") - F.min("x")).alias("r")).toPandas()
    # Slack covers the audit's round(...,6) half-up emission: the true
    # max error can be EXACTLY range/512, whose 6-dp rounding may
    # exceed the raw bound by up to half the rounding quantum.
    bound = rng["r"].max() / 512 + 5e-7
    assert (audit["max_max_err"] <= bound).all()
    assert (audit["avg_max_err"] <= audit["max_max_err"]).all()
    assert (audit["max_max_err"] > 0).all()  # non-vacuous
