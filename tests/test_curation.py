"""Semantic pins for the curation operators (plans/curation.py),
independent of the DuckDB oracle: known inputs → known outputs."""

from __future__ import annotations

import pandas as pd

from couchwarehouse_spark.plans.curation import LEN_BUCKET, MIX_CAP, REP_FLAG_NUM
from couchwarehouse_spark.plans.registry import QUERIES

from .conftest import SF_SMOKE


def test_repetition_census_bounds(spark):
    pdf = QUERIES["repetition_census"](spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    # rate is dup/total of the same sums
    assert ((pdf.repetition_rate >= 0) & (pdf.repetition_rate <= 1)).all()
    assert (pdf.dup_trigrams <= pdf.total_trigrams).all()
    # flags can never exceed doc counts, and the synthetic corpus is
    # repetitive enough that the gate actually fires somewhere
    assert (pdf.n_flagged <= pdf.n_docs).all()
    assert pdf.n_flagged.sum() > 0, "flag threshold never fired — entry is vacuous"
    expected_rate = round(pdf.dup_trigrams.sum() / pdf.total_trigrams.sum(), 6)
    got = (pdf.dup_trigrams.sum() / pdf.total_trigrams.sum())
    assert abs(got - expected_rate) < 1e-6


def test_repetition_flag_threshold_exact(spark):
    """REP_FLAG_NUM·dup > total is a strict integer comparison: a
    repetitive doc trips it, a dup-free doc cannot. Literal docs via
    SQL VALUES (fast path)."""
    df = spark.sql(
        f"""
        SELECT * FROM VALUES
          ('a b c a b c a b c a b c', 'exactly-high'),  -- 10 trigrams, 7 dup
          ('a b c d e f g h i j k l', 'zero-dup')
          AS t(text, tag)
        """
    )
    from pyspark.sql import functions as F
    from couchwarehouse_spark.plans.dedup import _shingles

    toks = F.split("text", " ")
    total = F.size(toks) - 2
    dup = total - F.size(F.array_distinct(_shingles(toks)))
    out = df.select(
        "tag", (F.lit(REP_FLAG_NUM) * dup > total).alias("flagged")
    ).toPandas().set_index("tag")
    assert bool(out.loc["exactly-high", "flagged"])  # 50·7 > 10
    assert not bool(out.loc["zero-dup", "flagged"])


def test_length_histogram_partitions_corpus(spark):
    pdf = QUERIES["doc_length_histogram"](spark, SF_SMOKE).toPandas()
    # buckets are multiples of the width and non-overlapping ranges
    assert (pdf.bucket_start % LEN_BUCKET == 0).all()
    assert (pdf.min_tokens >= pdf.bucket_start).all()
    assert (pdf.max_tokens < pdf.bucket_start + LEN_BUCKET).all()
    # histogram covers every document exactly once
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchone()[0]
    assert pdf.n_docs.sum() == n


def test_mixture_weights_normalized(spark):
    pdf = QUERIES["domain_mixture_weights"](spark, SF_SMOKE).toPandas()
    assert abs(pdf.actual_share.sum() - 1.0) < 1e-4
    assert (pdf.resample_weight <= MIX_CAP).all()
    assert (pdf.resample_weight > 0).all()
    # weight should be anti-monotone in share: the most over-represented
    # source gets the smallest weight
    top = pdf.sort_values("n_docs").iloc[-1]
    assert top.resample_weight == pdf.resample_weight.min()
