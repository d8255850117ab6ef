"""Smoke tests for rows-only (non-SQL-expressible) query entries —
the driver records a weaker rows-only check for these, so locally we
at least pin their behavior on data with known duplicates.
"""

from __future__ import annotations

import couchwarehouse_spark.plans.all  # noqa: F401
from couchwarehouse_spark.plans import ORACLES, QUERIES

from .conftest import SF_SMOKE


def _rows_only_names():
    return sorted(n for n in QUERIES if n not in ORACLES)


def test_rows_only_queries_execute(spark):
    for name in _rows_only_names():
        df = QUERIES[name](spark, SF_SMOKE)
        df.limit(5).collect()  # runs the plan end-to-end


def test_minhash_finds_exact_duplicates(spark, tmp_path):
    """A corpus with planted exact dups: MinHash-LSH must surface them
    (identical docs collide in every band; jaccard = 1.0)."""
    import pandas as pd

    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "spark structured streaming with watermarks handles late data well",
        "completely different text about warehouse analytics and queries",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((i, t))
    rows.append((100, base[0]))  # exact dup of doc 0
    rows.append((101, base[1]))  # exact dup of doc 1
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "s"
    pdf["n_chars"] = pdf["text"].str.len()
    path = str(tmp_path / "documents.parquet")
    pdf.to_parquet(path)

    from couchwarehouse_spark.plans.dedup import minhash_lsh_candidates, simhash_near_dup

    out = minhash_lsh_candidates(spark, str(tmp_path)).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out}
    assert pairs[(0, 100)] == 1.0
    assert pairs[(1, 101)] == 1.0

    sim = {(r["doc_a"], r["doc_b"]) for r in simhash_near_dup(spark, str(tmp_path)).collect()}
    assert (0, 100) in sim and (1, 101) in sim


def test_minhash_recall_vs_exhaustive(spark):
    """With 16 real permutations (4 bands of 4), every same-lang pair
    the exhaustive prefix-filter scan certifies at J >= 0.5 must also
    come out of the LSH path: P(band collision) = 1-(1-s^4)^4 >= 0.93
    at s = 0.5 per pair, and the smoke corpus's true pairs sit far
    above threshold. This pins the permutation-salting bug class: a
    collapsed (single-permutation) signature drops recall through the
    floor."""
    from couchwarehouse_spark.plans.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(spark, SF_SMOKE).collect()
    }
    exhaustive = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(spark, SF_SMOKE).collect()
    }
    assert exhaustive, "smoke corpus lost its planted near-dups"
    missed = exhaustive - lsh
    assert not missed, f"LSH missed same-lang verified pairs: {sorted(missed)[:10]}"
