"""Planted-fixture golden tests for the round-5 operators.

The oracle lane (tests/t2_sim.py + driver) proves Spark ≡ DuckDB on
the synthetic corpus; these tests prove both are RIGHT, by running the
operators on hand-built inputs whose correct output is known by
construction — the same strategy as the dedup/LSH planted-duplicate
tests (SURVEY.md §5).
"""

from __future__ import annotations

import pandas as pd


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


class TestDuplicateNgramRemoval:
    def _run(self, spark, tmp_path, texts):
        from couchwarehouse_spark.plans.dedup import duplicate_ngram_removal

        d = str(tmp_path / "sf")
        import os

        os.makedirs(d, exist_ok=True)
        _docs_df(spark, texts).write.mode("overwrite").parquet(
            f"{d}/documents.parquet"
        )
        out = duplicate_ngram_removal(spark, d).toPandas()
        return out.set_index("doc_id").sort_index()

    def test_planted_shared_span_removed(self, spark, tmp_path):
        """An 8-gram planted in two docs must vanish from both; the
        unique remainder survives with order preserved."""
        span = "a b c d e f g h"  # the duplicated 8-gram
        texts = [
            f"x1 x2 {span} y1 y2",
            f"z1 {span} z2 z3 z4",
            "u1 u2 u3 u4 u5 u6 u7 u8 u9",  # unique doc, untouched
        ]
        out = self._run(spark, tmp_path, texts)
        assert out.loc[0, "cleaned_text"] == "x1 x2 y1 y2"
        assert out.loc[1, "cleaned_text"] == "z1 z2 z3 z4"
        assert out.loc[2, "cleaned_text"] == texts[2]
        assert out.loc[0, "n_tokens_before"] == 12
        assert out.loc[0, "n_tokens_after"] == 4

    def test_overlapping_duplicate_grams_union_spans(self, spark, tmp_path):
        """A 9-token shared run contains TWO duplicated 8-grams whose
        position spans overlap; the union of spans (all 9 words) is
        removed — no double-count, no gap."""
        run = "a b c d e f g h i"
        texts = [f"p1 {run} p2", f"q1 q2 {run}"]
        out = self._run(spark, tmp_path, texts)
        assert out.loc[0, "cleaned_text"] == "p1 p2"
        assert out.loc[1, "cleaned_text"] == "q1 q2"

    def test_whole_doc_removed_yields_empty_string(self, spark, tmp_path):
        """A doc that IS a duplicated 8-gram ends up empty (0 tokens,
        '' text) — present in the output, not dropped."""
        span = "a b c d e f g h"
        out = self._run(spark, tmp_path, [span, span, "solo1 solo2 solo3"])
        assert out.loc[0, "n_tokens_after"] == 0
        assert out.loc[0, "cleaned_text"] == ""
        assert out.loc[1, "cleaned_text"] == ""
        assert out.loc[2, "cleaned_text"] == "solo1 solo2 solo3"

    def test_short_docs_have_no_grams(self, spark, tmp_path):
        """Sub-8-token docs produce no grams (the Spark descending-
        sequence trap is guarded): identical 3-token docs survive
        intact — THIS operator removes spans, not whole-doc dups."""
        out = self._run(spark, tmp_path, ["a b c", "a b c"])
        assert (out["n_tokens_after"] == 3).all()
        assert list(out["cleaned_text"]) == ["a b c", "a b c"]


class TestEventDebounce:
    def test_burst_collapses_to_head(self, spark, tmp_path):
        from couchwarehouse_spark.plans.events_windows import event_debounce

        import os

        d = str(tmp_path / "sf")
        os.makedirs(d, exist_ok=True)
        rows = [
            # user 1, click: 3 events inside the 3600s gap → one island
            (1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 10:30:00", 1, "click", 1.0, "{}"),
            (3, "2024-01-01 11:15:00", 1, "click", 1.0, "{}"),
            # ...then a >1h gap → second island
            (4, "2024-01-01 13:00:00", 1, "click", 1.0, "{}"),
            # user 1, view: separate key, no suppression (single event)
            (5, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).selectExpr(
            "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
            "value", "props",
        )
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = event_debounce(spark, d).toPandas()
        # Only (1, click) suppressed anything: 4 events → 2 islands.
        assert len(out) == 1
        r = out.iloc[0]
        assert (r["user_id"], r["event_type"]) == (1, "click")
        assert (r["n_events"], r["n_kept"], r["n_suppressed"]) == (4, 2, 2)

    def test_simultaneous_events_are_one_island(self, spark, tmp_path):
        """Tied timestamps (same user/type at the same instant): the
        head-flag and island-numbering windows must share ONE total
        order — with mismatched orders (the r5 review bug) tied rows
        were renumbered into phantom islands and the suppression
        vanished entirely."""
        import os

        from couchwarehouse_spark.plans.events_windows import event_debounce

        d = str(tmp_path / "sf")
        os.makedirs(d, exist_ok=True)
        rows = [
            # Two simultaneous clicks — with value DESCENDING so a
            # (ts, value) island order disagrees with (ts, event_id).
            (1, "2024-01-01 10:00:00", 1, "click", 5.0, "{}"),
            (2, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).selectExpr(
            "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
            "value", "props",
        )
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = event_debounce(spark, d).toPandas()
        assert len(out) == 1
        r = out.iloc[0]
        assert (r["n_events"], r["n_kept"], r["n_suppressed"]) == (2, 1, 1)


class TestPerSourceQualityCut:
    def test_adaptive_cut_is_per_source(self, spark, tmp_path):
        """Each source keeps ceil(0.6·n) of ITS OWN docs: a source
        whose scores are all low still keeps 60% — the point of the
        adaptive (non-global) threshold."""
        from couchwarehouse_spark.plans.curation import per_source_quality_cut

        import os

        d = str(tmp_path / "sf")
        os.makedirs(d, exist_ok=True)
        rows = []
        # srcA: 5 docs, long tokens (high score). srcB: 5 docs, short.
        for i in range(5):
            rows.append((i, " ".join(["longtokenword"] * (i + 2)), "en", "srcA"))
        for i in range(5):
            rows.append((10 + i, " ".join(["ab"] * (i + 2)), "en", "srcB"))
        df = spark.createDataFrame(
            [(i, t, l, s, len(t)) for i, t, l, s in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = per_source_quality_cut(spark, d).toPandas().set_index("source")
        # ceil(0.6 * 5) = 3 kept in BOTH sources despite srcB's lower scores.
        assert out.loc["srcA", "n_kept"] == 3
        assert out.loc["srcB", "n_kept"] == 3
        assert out.loc["srcA", "cut_score"] > out.loc["srcB", "cut_score"]


class TestUdtfTokenRuns:
    def test_runs_and_boundaries(self, spark, tmp_path):
        from couchwarehouse_spark.plans.scalar import udtf_token_runs

        import os

        d = str(tmp_path / "sf")
        os.makedirs(d, exist_ok=True)
        _docs_df(
            spark,
            [
                "a a a b c c",  # runs: a×3@0, c×2@4
                "x y z",  # no runs
                "e e",  # run at doc start/end
            ],
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = (
            udtf_token_runs(spark, d)
            .toPandas()
            .sort_values(["doc_id", "start_pos"])
            .reset_index(drop=True)
        )
        got = [tuple(r) for r in out.itertuples(index=False)]
        assert got == [(0, "a", 0, 3), (0, "c", 4, 2), (2, "e", 0, 2)]


class TestSeededGlobalShuffle:
    def test_order_is_deterministic_and_seeded(self, spark, sf_dir):
        from couchwarehouse_spark.plans.sampling import seeded_global_shuffle

        a = seeded_global_shuffle(spark, sf_dir).toPandas()
        b = seeded_global_shuffle(spark, sf_dir).toPandas()
        pd.testing.assert_frame_equal(a, b)  # run-to-run reproducible
        assert list(a["position"]) == list(range(1, len(a) + 1))
        # md5 ordering ≠ doc_id ordering (it actually shuffles)
        assert list(a["doc_id"]) != sorted(a["doc_id"])


class TestWinsorizedStats:
    def test_clamp_bounds_and_counts(self, spark, sf_dir):
        """Tails really clamp: n_floor ≈ 5% and n_ceil ≈ 5% of rows,
        and the winsorized mean sits strictly between the cut values."""
        from couchwarehouse_spark.plans.statistics import winsorized_stats

        out = winsorized_stats(spark, sf_dir).toPandas()
        assert (out["n_floor"] > 0).all() and (out["n_ceil"] > 0).all()
        # each tail is < 6% of rows (p05/p95 cuts, minus ties)
        assert ((out["n_floor"] / out["n_rows"]) < 0.06).all()
        assert ((out["n_ceil"] / out["n_rows"]) < 0.06).all()


class TestIvfRecallAudit:
    def test_recall_bounds(self, spark, sf_dir):
        from couchwarehouse_spark.plans.similarity import ivf_recall_audit

        r = ivf_recall_audit(spark, sf_dir).toPandas().iloc[0]
        assert r["n_exact"] > 0
        assert 0 <= r["n_matched"] <= r["n_exact"]
        assert 0.0 <= r["recall_at_k"] <= 1.0


def _py_duplicate_ngram_removal(texts, k=8):
    """Pure-Python model of the operator: duplicated k-gram spans
    removed, docs reassembled. The independent implementation the
    distributed plan must agree with on ANY corpus."""
    from collections import Counter

    toks = [t.split(" ") for t in texts]
    grams = Counter()
    for ts in toks:
        for s in range(len(ts) - k + 1):
            grams[" ".join(ts[s : s + k])] += 1
    out = []
    for i, ts in enumerate(toks):
        removed = set()
        for s in range(len(ts) - k + 1):
            if grams[" ".join(ts[s : s + k])] > 1:
                removed.update(range(s, s + k))
        kept = [w for p, w in enumerate(ts) if p not in removed]
        out.append((i, len(ts), len(kept), " ".join(kept)))
    return out


def test_duplicate_ngram_removal_matches_python_model(spark, tmp_path):
    """Randomized-corpus equivalence: on corpora drawn from a tiny
    vocabulary (forcing plenty of colliding 8-grams, including
    within-doc repeats and partial overlaps), the distributed plan
    must equal an independent pure-Python implementation exactly."""
    import os
    import random

    from couchwarehouse_spark.plans.dedup import duplicate_ngram_removal

    for seed in (7, 21, 99):
        rng = random.Random(seed)
        vocab = ["a", "b", "c", "d"]  # tiny vocab → dense collisions
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
            for _ in range(40)
        ]
        d = str(tmp_path / f"sf{seed}")
        os.makedirs(d, exist_ok=True)
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

        got = sorted(
            tuple(r)
            for r in duplicate_ngram_removal(spark, d)
            .toPandas()
            .itertuples(index=False)
        )
        want = sorted(_py_duplicate_ngram_removal(texts))
        assert got == want, f"seed {seed}: first diff {next((a, b) for a, b in zip(got, want) if a != b)}"


class TestBpeApplyMerges:
    def test_planted_merges(self, spark, tmp_path):
        """Known corpus: 'x y' dominates the census; applying merges
        must fuse every adjacent x-y (including runs, non-overlapping
        left-to-right) and report exact token counts."""
        import os

        from couchwarehouse_spark.plans.text import bpe_apply_merges

        d = str(tmp_path / "sf")
        os.makedirs(d, exist_ok=True)
        texts = [
            "x y x y x y q",   # 3 fused pairs
            "x y y q q x y",   # 2 fused (middle y unpaired after 1st)
            "a b c a b c",     # next-ranked pairs
        ]
        _docs_df(spark, texts).write.mode("overwrite").parquet(
            f"{d}/documents.parquet"
        )
        out = bpe_apply_merges(spark, d).toPandas().iloc[0]
        # census: 'x y'×5 > 'a b'×2 = 'b c'×2 = ... top3 = x y, a b, b c
        # (count desc, then lexicographic) → after x_y and a_b fuse,
        # 'b c' no longer matches (b consumed) — batched-BPE semantics.
        assert out["tokens_before"] == 7 + 7 + 6
        assert out["merged_units"] == 5 + 2  # five x_y + two a_b
        assert out["tokens_after"] == out["tokens_before"] - out["merged_units"]
