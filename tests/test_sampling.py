"""Semantic properties of the training-data curation operators
(plans.sampling) beyond the oracle hash: split totals, sample sizes,
determinism, and leakage-audit internal consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

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
