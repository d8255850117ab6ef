"""Planted-fixture golden tests for round-7 hardening: the DF_CAP
stop-shingle filter wired into the inverted-index pair generators
(VERDICT r06 ask #3). Each fixture plants a "viral" shingle whose
document frequency exceeds DF_CAP — the df² quadratic key the cap
exists to remove — and proves (a) the hot key generates NO pairs,
(b) genuine near-dups on cold vocabulary still pair, and (c) a
shingle at exactly df == DF_CAP is KEPT (the cap is strict >)."""

from __future__ import annotations

import os

from couchwarehouse_spark.plans.dedup import DF_CAP


def _write(df, sf_dir: str, name: str) -> None:
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{sf_dir}/{name}.parquet")


def _docs(spark, rows):
    """rows: list of (doc_id, text, lang, source)."""
    return spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


class TestDfCapWired:
    def test_containment_hot_shingle_generates_no_pairs(self, spark, tmp_path):
        """DF_CAP+10 identical single-shingle docs would be (n choose 2)
        containment-1.0 pairs WITHOUT the cap; with it they contribute
        nothing, while a genuine cold-vocabulary subset pair survives."""
        from couchwarehouse_spark.plans.dedup import containment_dup_pairs

        d = str(tmp_path / "sf")
        hot = [(i, "hot stop shingle", "en", "s0") for i in range(DF_CAP + 10)]
        cold = [
            (100, "p q r s", "en", "s0"),  # shingles pqr, qrs
            (101, "p q r s t u", "en", "s0"),  # superset → containment 1.0
        ]
        _write(_docs(spark, hot + cold), d, "documents")
        out = containment_dup_pairs(spark, d).toPandas()
        assert len(out) == 1
        row = out.iloc[0]
        assert (row["doc_a"], row["doc_b"]) == (100, 101)
        assert row["containment"] == 1.0

    def test_containment_df_exactly_at_cap_is_kept(self, spark, tmp_path):
        """df == DF_CAP is NOT capped (strict >): DF_CAP identical
        docs still produce all (DF_CAP choose 2) pairs."""
        from couchwarehouse_spark.plans.dedup import containment_dup_pairs

        d = str(tmp_path / "sf")
        rows = [(i, "hot stop shingle", "en", "s0") for i in range(DF_CAP)]
        _write(_docs(spark, rows), d, "documents")
        assert containment_dup_pairs(spark, d).count() == DF_CAP * (DF_CAP - 1) // 2

    def test_sparse_cosine_hot_shingle_generates_no_pairs(self, spark, tmp_path):
        """Same plant for the tf-cosine generator: the viral shingle is
        dropped from the vocabulary (its docs then have empty tf
        vectors), while a cold 3-of-4-shingle overlap pair (cos 0.75)
        survives with its cosine computed over the capped vocabulary."""
        from couchwarehouse_spark.plans.dedup import sparse_cosine_pairs

        d = str(tmp_path / "sf")
        hot = [(i, "hot stop shingle", "en", "s0") for i in range(DF_CAP + 10)]
        cold = [
            (100, "p q r s t u", "en", "s0"),  # pqr qrs rst stu
            (101, "p q r s t v", "en", "s0"),  # pqr qrs rst stv → dot 3, norms 4
        ]
        _write(_docs(spark, hot + cold), d, "documents")
        out = sparse_cosine_pairs(spark, d).toPandas()
        assert len(out) == 1
        row = out.iloc[0]
        assert (row["doc_id_1"], row["doc_id_2"]) == (100, 101)
        assert row["cos_sim"] == 0.75
