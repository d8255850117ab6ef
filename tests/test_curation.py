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


def test_crossdoc_ngram_dup_bounds(spark):
    pdf = QUERIES["crossdoc_ngram_dup"](spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    assert (pdf.shared_ngrams <= pdf.total_ngrams).all()
    assert ((pdf.crossdup_rate >= 0) & (pdf.crossdup_rate <= 1)).all()
    assert (pdf.n_flagged <= pdf.n_docs).all()
    assert pdf.n_flagged.sum() > 0, "majority-shared gate never fired — vacuous"
    # every document with >= 5 tokens is audited exactly once
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMOKE}/documents.parquet' "
        "WHERE len(string_split(text, ' ')) >= 5"
    ).fetchone()[0]
    assert pdf.n_docs.sum() == n


def test_crossdoc_planted_duplicates(spark):
    """Two identical docs share 100% of 5-grams; a unique doc shares
    none: the flag must separate them."""
    from pyspark.sql import functions as F

    from couchwarehouse_spark.plans.curation import XDOC_FLAG_DEN, XDOC_N

    df = spark.sql(
        """
        SELECT * FROM VALUES
          (1, 'the quick brown fox jumps over the lazy dog'),
          (2, 'the quick brown fox jumps over the lazy dog'),
          (3, 'completely different words with no overlap at all here')
          AS t(doc_id, text)
        """
    )
    toks = F.split("text", " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (XDOC_N - 1)),
        lambda i: F.xxhash64(
            F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(XDOC_N)])
        ),
    )
    ex = df.select("doc_id", F.explode(F.array_distinct(grams)).alias("g"))
    cnt = ex.groupBy("g").agg(F.count("*").alias("nd"))
    per_doc = (
        ex.join(cnt, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("total_g"),
            F.sum((F.col("nd") >= 2).cast("long")).alias("shared_g"),
        )
        .withColumn(
            "flagged", F.lit(XDOC_FLAG_DEN) * F.col("shared_g") > F.col("total_g")
        )
        .toPandas()
        .set_index("doc_id")
    )
    assert bool(per_doc.loc[1, "flagged"]) and bool(per_doc.loc[2, "flagged"])
    assert not bool(per_doc.loc[3, "flagged"])
    assert per_doc.loc[3, "shared_g"] == 0


def test_vocab_oov_audit_bounds(spark):
    pdf = QUERIES["vocab_oov_audit"](spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    assert (pdf.oov_tokens <= pdf.total_tokens).all()
    assert ((pdf.oov_rate >= 0) & (pdf.oov_rate < 1)).all()
    # the 24-token vocab must leave real OOV mass on this corpus...
    assert pdf.oov_tokens.sum() > 0, "vocab covers everything — audit is vacuous"
    # ...but in-vocab tokens must still be the majority everywhere
    assert (2 * pdf.oov_tokens < pdf.total_tokens).all()


def test_user_pseudonymization_semantics(spark):
    pdf = QUERIES["user_pseudonymization"](spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    # the tokenization must be injective on this corpus (the audit's point)
    assert pdf.injective.all()
    assert (pdf.n_pseudonyms == pdf.n_users).all()
    # tokens are 16 lowercase-hex chars and never echo a raw user_id
    assert pdf.first_pseudonym.str.fullmatch(r"[0-9a-f]{16}").all()
