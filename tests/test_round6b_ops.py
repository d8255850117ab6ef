"""Planted-fixture golden tests for the round-6 second-batch operators
(boundary overlap, KN continuation, source TVD, best-of-n / preference
pairs, embedding Gram). The oracle lane proves Spark ≡ DuckDB; these
prove both are RIGHT on hand-built inputs whose correct output is
known by construction (SURVEY.md §5)."""

from __future__ import annotations

import hashlib
import os


def _write(df, sf_dir: str, name: str) -> None:
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{sf_dir}/{name}.parquet")


def _docs(spark, rows):
    """rows: list of (doc_id, text, source)."""
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _reward(doc_id: int) -> int:
    """Mirror of the salted md5 reward in plans/sampling.py."""
    return int(hashlib.md5(f"rm1:{doc_id}".encode()).hexdigest()[:8], 16)


class TestDocBoundaryOverlap:
    def test_tail_matches_head_once(self, spark, tmp_path):
        """Doc 0's last 3 words are doc 1's first 3 words — exactly one
        stitch pair, in the (tail_doc, head_doc) direction only."""
        from couchwarehouse_spark.plans.dedup import doc_boundary_overlap

        d = str(tmp_path / "sf")
        _write(
            _docs(
                spark,
                [
                    (0, "p q r s t u", "src0"),
                    (1, "s t u v w x", "src0"),
                    (2, "zz zz zz zz", "src0"),
                ],
            ),
            d,
            "documents",
        )
        out = doc_boundary_overlap(spark, d).toPandas()
        # doc 2's head == its own tail ("zz zz zz") but self-pairs are
        # excluded, so only the 0→1 stitch survives.
        assert len(out) == 1
        row = out.iloc[0]
        assert (row["tail_doc"], row["head_doc"], row["shingle"]) == (0, 1, "s t u")

    def test_short_docs_excluded(self, spark, tmp_path):
        from couchwarehouse_spark.plans.dedup import doc_boundary_overlap

        d = str(tmp_path / "sf")
        _write(_docs(spark, [(0, "a b", "src0"), (1, "a b", "src0")]), d, "documents")
        assert len(doc_boundary_overlap(spark, d).toPandas()) == 0


class TestKnContinuationCounts:
    def test_distinct_left_contexts_counted_once(self, spark, tmp_path):
        """'x' follows three distinct words (a, b, c) — repetition of
        the (a, x) bigram must NOT raise its continuation count; 'y'
        follows only 'a'."""
        from couchwarehouse_spark.plans.text import kn_continuation_counts

        d = str(tmp_path / "sf")
        _write(
            _docs(
                spark,
                [
                    (0, "a x a x a x", "src0"),  # (a,x) ×3 → one TYPE
                    (1, "b x", "src0"),
                    (2, "c x", "src0"),
                    (3, "a y", "src0"),
                ],
            ),
            d,
            "documents",
        )
        out = kn_continuation_counts(spark, d).toPandas().set_index("term")
        # bigram types: (a,x) (x,a) (b,x) (c,x) (a,y) → 5 types
        assert out.loc["x", "left_continuation"] == 3
        assert out.loc["a", "left_continuation"] == 1  # only (x, a)
        assert out.loc["y", "left_continuation"] == 1
        assert out.loc["x", "p_continuation"] == round(3 / 5, 6)


class TestSourceTvdMatrix:
    def _run(self, spark, tmp_path, rows):
        from couchwarehouse_spark.plans.curation import source_tvd_matrix

        d = str(tmp_path / "sf")
        _write(_docs(spark, rows), d, "documents")
        return source_tvd_matrix(spark, d).toPandas()

    def test_identical_distributions_zero(self, spark, tmp_path):
        out = self._run(
            spark,
            tmp_path,
            [(0, "a b", "srcA"), (1, "a b a b", "srcB")],
        )
        assert len(out) == 1
        assert out.iloc[0]["tvd_numerator"] == 0
        assert out.iloc[0]["tvd"] == 0.0

    def test_disjoint_distributions_one(self, spark, tmp_path):
        """No shared term: the pair must still appear, TVD = 1."""
        out = self._run(
            spark,
            tmp_path,
            [(0, "a a b", "srcA"), (1, "c d", "srcB")],
        )
        assert len(out) == 1
        row = out.iloc[0]
        # numerator = Ta*Tb + Tb*Ta = 2*3*2 = 12, denominator 6, /2 → 1
        assert row["tvd_numerator"] == 12
        assert row["tvd_denominator"] == 6
        assert row["tvd"] == 1.0

    def test_half_overlap(self, spark, tmp_path):
        """P = {a: 1}, Q = {a: ½, b: ½} → TVD = ½."""
        out = self._run(
            spark,
            tmp_path,
            [(0, "a a", "srcA"), (1, "a b", "srcB")],
        )
        assert len(out) == 1
        assert out.iloc[0]["tvd"] == 0.5


class TestBestOfN:
    def test_argmax_and_margin_match_hash(self, spark, tmp_path):
        """One full group (doc_ids 0..3): chosen/rejected/margin are
        exactly the argmax/argmin of the salted md5 reward."""
        from couchwarehouse_spark.plans.sampling import (
            best_of_n_selection,
            preference_pair_harvest,
        )

        rows = [(i, "w x y z", "src0") for i in range(4)]
        d = str(tmp_path / "sf")
        _write(_docs(spark, rows), d, "documents")

        rewards = {i: _reward(i) for i in range(4)}
        best = max(rewards, key=rewards.get)
        worst = min(rewards, key=rewards.get)

        sel = best_of_n_selection(spark, d).toPandas()
        assert len(sel) == 1
        assert sel.iloc[0]["n_groups"] == 1
        assert sel.iloc[0]["n_candidates"] == 4
        assert sel.iloc[0]["sum_chosen_reward"] == rewards[best]
        assert sel.iloc[0]["sum_pool_reward"] == sum(rewards.values())

        pairs = preference_pair_harvest(spark, d).toPandas()
        assert len(pairs) == 1
        row = pairs.iloc[0]
        assert row["chosen_doc"] == best
        assert row["rejected_doc"] == worst
        assert row["reward_margin"] == rewards[best] - rewards[worst]

    def test_singleton_groups_dropped_from_pairs(self, spark, tmp_path):
        """A lone doc in its group yields no preference pair (but still
        a best-of-n selection)."""
        from couchwarehouse_spark.plans.sampling import (
            best_of_n_selection,
            preference_pair_harvest,
        )

        d = str(tmp_path / "sf")
        _write(_docs(spark, [(8, "a b", "src0")]), d, "documents")
        assert len(preference_pair_harvest(spark, d).toPandas()) == 0
        sel = best_of_n_selection(spark, d).toPandas()
        assert len(sel) == 1 and sel.iloc[0]["n_candidates"] == 1


class TestEmbeddingGramMatrix:
    def test_known_second_moments(self, spark, tmp_path):
        """Two 3-d vectors with hand-computable fixed-point products:
        v1 = (1, 0, 2), v2 = (1, 1, 0) quantized ×1000 →
        G[0,1] = 0 + 1e6, G[0,2] = 2e6 + 0, G[1,2] = 0 + 0."""
        from couchwarehouse_spark.plans.similarity import embedding_gram_matrix

        d = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                [(0, [1.0, 0.0, 2.0], 0), (1, [1.0, 1.0, 0.0], 1)],
                "vec_id long, embedding array<float>, label int",
            ),
            d,
            "embeddings",
        )
        out = embedding_gram_matrix(spark, d).toPandas()
        got = {
            (r["dim_i"], r["dim_j"]): r["gram"] for _, r in out.iterrows()
        }
        assert got == {(0, 1): 1_000_000, (0, 2): 2_000_000, (1, 2): 0}
        assert (out["n_rows"] == 2).all()


class TestVocabCoverageCurve:
    def test_hand_counted_curve(self, spark, tmp_path):
        """Counts a:4 b:2 c:1 d:1 (total 8): 50% needs only {a};
        90% (7.2 tokens) and 99% (7.92) need the full vocabulary."""
        from couchwarehouse_spark.plans.text import vocab_coverage_curve

        d = str(tmp_path / "sf")
        _write(_docs(spark, [(0, "a a a a b b c d", "src0")]), d, "documents")
        out = vocab_coverage_curve(spark, d).toPandas().set_index("threshold_pct")
        assert out.loc[50, "vocab_size"] == 1
        assert out.loc[50, "tokens_covered"] == 4
        assert out.loc[90, "vocab_size"] == 4
        assert out.loc[99, "vocab_size"] == 4
        assert (out["total_tokens"] == 8).all()


class TestHeldoutPerplexityEval:
    def test_oov_and_smoothed_surprisal(self, spark, tmp_path):
        """doc_id 0 hashes into the train split, doc_id 8 into test
        (salted-md5 buckets). LM on train: a:3 b:1 (T=4, V=2); test
        tokens 'a z': p(a) = 4/7, p(z OOV) = 1/7 under add-1."""
        import math

        from couchwarehouse_spark.plans.sampling import heldout_perplexity_eval

        d = str(tmp_path / "sf")
        _write(
            _docs(spark, [(0, "a a a b", "src0"), (8, "a z", "src0")]),
            d,
            "documents",
        )
        out = heldout_perplexity_eval(spark, d).toPandas()
        assert len(out) == 1
        row = out.iloc[0]
        assert row["n_eval_tokens"] == 2
        assert row["n_oov_tokens"] == 1
        expected = round((-math.log(4 / 7) - math.log(1 / 7)) / 2, 6)
        assert row["avg_surprisal"] == expected


class TestModalityPairingAudit:
    def test_classifies_all_three_ways(self, spark, tmp_path):
        from couchwarehouse_spark.plans.multimodal_plan import (
            modality_pairing_audit,
        )

        d = str(tmp_path / "sf")
        _write(_docs(spark, [(0, "t", "src0"), (1, "t", "src0")]), d, "documents")
        _write(
            spark.createDataFrame(
                [(1, [0.0], 0), (2, [0.0], 0)],
                "vec_id long, embedding array<float>, label int",
            ),
            d,
            "embeddings",
        )
        out = modality_pairing_audit(spark, d).toPandas()
        got = {(r["lang"], r["pairing"]): r["n"] for _, r in out.iterrows()}
        assert got == {
            ("en", "paired"): 1,
            ("en", "text_only"): 1,
            ("<unpaired>", "vector_only"): 1,
        }


class TestCountMinSketch:
    def test_no_collision_estimates_exact(self, spark, tmp_path):
        """Two terms in a 4×256 sketch: no collisions, so every
        estimate equals the true count and overestimate is 0 — and
        the CMS guarantee (never underestimate) holds by assertion."""
        from couchwarehouse_spark.plans.statistics import count_min_sketch_audit

        d = str(tmp_path / "sf")
        _write(_docs(spark, [(0, "a a a b", "src0")]), d, "documents")
        out = count_min_sketch_audit(spark, d).toPandas().set_index("term")
        assert out.loc["a", "true_count"] == 3
        assert out.loc["b", "true_count"] == 1
        assert (out["cms_estimate"] >= out["true_count"]).all()
        assert (out["overestimate"] == 0).all()


class TestBloomFilter:
    def test_bits_match_hash_mirror(self, spark, tmp_path):
        from couchwarehouse_spark.plans.statistics import (
            BLOOM_K,
            BLOOM_M,
            bloom_filter_build_audit,
        )

        texts = ["alpha beta", "gamma delta"]
        d = str(tmp_path / "sf")
        _write(_docs(spark, list(enumerate_src(texts))), d, "documents")
        out = bloom_filter_build_audit(spark, d).toPandas().iloc[0]

        bits = set()
        for t in texts:
            fp = hashlib.md5(t.encode()).hexdigest()
            for j in range(BLOOM_K):
                bits.add(
                    int(hashlib.md5(f"{j}:{fp}".encode()).hexdigest()[:8], 16)
                    % BLOOM_M
                )
        assert out["n_keys"] == 2
        assert out["n_bits_set"] == len(bits)
        assert out["fp_rate_est"] == round((len(bits) / BLOOM_M) ** BLOOM_K, 6)


def enumerate_src(texts):
    return [(i, t, "src0") for i, t in enumerate(texts)]


class TestConversionAttribution:
    def test_last_touch_window_and_organic(self, spark, tmp_path):
        """click 1h before purchase → attributed; view 25h before →
        organic (outside the 24h lookback); bare purchase → organic;
        error 1min before → attributed to error."""
        import datetime as dt

        from couchwarehouse_spark.plans.events_windows import (
            conversion_attribution,
        )

        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

        def ev(eid, uid, etype, minutes):
            return (eid, t0 + dt.timedelta(minutes=minutes), uid, etype, 1.0, "{}")

        rows = [
            ev(1, 1, "click", 0), ev(2, 1, "purchase", 60),
            ev(3, 2, "view", 0), ev(4, 2, "purchase", 25 * 60),
            ev(5, 3, "purchase", 0),
            ev(6, 4, "error", 0), ev(7, 4, "purchase", 1),
        ]
        d = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string",
            ),
            d,
            "events",
        )
        out = conversion_attribution(spark, d).toPandas()
        got = {r["attributed_to"]: r["n_conversions"] for _, r in out.iterrows()}
        assert got == {"click": 1, "organic": 2, "error": 1}
        n_users = {r["attributed_to"]: r["n_users"] for _, r in out.iterrows()}
        assert n_users == {"click": 1, "organic": 2, "error": 1}


class TestSkyline:
    def test_matches_naive_dominance(self, spark, tmp_path):
        """Duplicates survive together (no strict edge), same-price
        later dates fall, and the output equals the brute-force
        NOT-EXISTS semantics computed here."""
        import datetime as dt

        from couchwarehouse_spark.plans.relational_extra import (
            skyline_cheap_early_orders,
        )

        rows = [
            (1, 10.0, dt.date(2024, 1, 5)),
            (2, 10.0, dt.date(2024, 1, 5)),   # exact duplicate of 1
            (3, 10.0, dt.date(2024, 1, 7)),   # same price, later → out
            (4, 5.0, dt.date(2024, 1, 10)),   # cheapest → in
            (5, 20.0, dt.date(2024, 1, 1)),   # earliest → in
            (6, 15.0, dt.date(2024, 1, 3)),   # incomparable → in
            (7, 25.0, dt.date(2024, 1, 2)),   # dominated by 5 → out
        ]
        d = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                rows, "o_orderkey long, o_totalprice double, o_orderdate date"
            ),
            d,
            "orders",
        )
        out = skyline_cheap_early_orders(spark, d).toPandas()

        naive = {
            k
            for k, p, dd in rows
            if not any(
                (p2 <= p and d2 <= dd and (p2 < p or d2 < dd))
                for _, p2, d2 in rows
            )
        }
        assert set(out["o_orderkey"]) == naive == {1, 2, 4, 5, 6}

    def test_uniform_price_degenerate_grid(self, spark, tmp_path):
        """All prices equal (grid step 0): skyline = the min-date rows."""
        import datetime as dt

        from couchwarehouse_spark.plans.relational_extra import (
            skyline_cheap_early_orders,
        )

        rows = [
            (1, 7.0, dt.date(2024, 2, 1)),
            (2, 7.0, dt.date(2024, 2, 1)),
            (3, 7.0, dt.date(2024, 2, 9)),
        ]
        d = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                rows, "o_orderkey long, o_totalprice double, o_orderdate date"
            ),
            d,
            "orders",
        )
        out = skyline_cheap_early_orders(spark, d).toPandas()
        assert set(out["o_orderkey"]) == {1, 2}


class TestKsDrift:
    def test_hand_computed_statistic(self, spark, tmp_path):
        """src0 lens {10,10,20}, src1 lens {20,30}: max cross-
        multiplied ECDF gap = |2·2 − 0·3| = 4 over denominator 6."""
        from couchwarehouse_spark.plans.relational_extra import ks_drift_doclen

        rows = [
            (0, "x", "src0", 10), (1, "x", "src0", 10), (2, "x", "src0", 20),
            (3, "x", "src1", 20), (4, "x", "src1", 30),
        ]
        d = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                [(i, t, "en", s, n) for i, t, s, n in rows],
                "doc_id long, text string, lang string, source string, n_chars long",
            ),
            d,
            "documents",
        )
        out = ks_drift_doclen(spark, d).toPandas().iloc[0]
        assert out["ks_numerator"] == 4
        assert out["ks_denominator"] == 6
        assert out["ks_statistic"] == round(4 / 6, 6)

    def test_identical_distributions_zero(self, spark, tmp_path):
        from couchwarehouse_spark.plans.relational_extra import ks_drift_doclen

        rows = [(0, "x", "src0", 10), (1, "x", "src1", 10)]
        d = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                [(i, t, "en", s, n) for i, t, s, n in rows],
                "doc_id long, text string, lang string, source string, n_chars long",
            ),
            d,
            "documents",
        )
        out = ks_drift_doclen(spark, d).toPandas().iloc[0]
        assert out["ks_numerator"] == 0 and out["ks_statistic"] == 0.0


class TestChi2Keyness:
    def test_hand_contingency(self, spark, tmp_path):
        """srcA = 'x'×6, srcB = 'y'×6: for (srcA, 'x') the 2×2 table is
        a=6 b=0 c=0 d=6 → χ² = N = 12 (perfect association)."""
        from couchwarehouse_spark.plans.statistics import chi2_term_keyness

        d = str(tmp_path / "sf")
        _write(
            _docs(
                spark,
                [(0, "x x x x x x", "srcA"), (1, "y y y y y y", "srcB")],
            ),
            d,
            "documents",
        )
        out = chi2_term_keyness(spark, d).toPandas()
        assert len(out) == 2  # both (srcA, x) and (srcB, y) hit the floor
        for _, r in out.iterrows():
            assert (r["a"], r["b"], r["c"], r["d"]) == (6, 0, 0, 6)
            assert r["chi2"] == 12.0


class TestMannWhitney:
    def test_complete_separation_auc_one(self, spark, tmp_path):
        """All src1 lengths above all src0 lengths → AUC = 1."""
        from couchwarehouse_spark.plans.statistics import (
            mannwhitney_drift_doclen,
        )

        rows = [(0, "x", "src0", 10), (1, "x", "src0", 20),
                (2, "x", "src1", 30), (3, "x", "src1", 40)]
        d = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                [(i, t, "en", s, n) for i, t, s, n in rows],
                "doc_id long, text string, lang string, source string, n_chars long",
            ),
            d,
            "documents",
        )
        out = mannwhitney_drift_doclen(spark, d).toPandas().iloc[0]
        assert out["u2_statistic"] == 2 * 4  # every B beats every A, doubled
        assert out["auc"] == 1.0

    def test_ties_count_half(self, spark, tmp_path):
        """Identical singleton distributions: one tie → U2 = 1, AUC = ½."""
        from couchwarehouse_spark.plans.statistics import (
            mannwhitney_drift_doclen,
        )

        rows = [(0, "x", "src0", 10), (1, "x", "src1", 10)]
        d = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                [(i, t, "en", s, n) for i, t, s, n in rows],
                "doc_id long, text string, lang string, source string, n_chars long",
            ),
            d,
            "documents",
        )
        out = mannwhitney_drift_doclen(spark, d).toPandas().iloc[0]
        assert out["u2_statistic"] == 1
        assert out["auc"] == 0.5


class TestEventLatenessCensus:
    def test_buckets_and_max_lag(self, spark, tmp_path):
        """Arrival order: t=100, t=40 (60s late → late_1m boundary
        inclusive), t=200, t=199 (1s late), t=0 (200s late →
        late_10m). Running max watermark; first event on time."""
        import datetime as dt

        from couchwarehouse_spark.plans.events_windows import (
            event_lateness_census,
        )

        t0 = dt.datetime(2024, 3, 1)

        def ev(eid, sec):
            return (eid, t0 + dt.timedelta(seconds=sec), 1, "view", 1.0, "{}")

        rows = [ev(1, 100), ev(2, 40), ev(3, 200), ev(4, 199), ev(5, 0)]
        d = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string",
            ),
            d,
            "events",
        )
        out = event_lateness_census(spark, d).toPandas().set_index("lateness")
        assert out.loc["on_time", "n_events"] == 2  # first + new max t=200
        assert out.loc["late_1m", "n_events"] == 2  # 60s (boundary) + 1s
        assert out.loc["late_10m", "n_events"] == 1  # 200s
        assert out.loc["late_10m", "max_lag_us"] == 200_000_000


class TestMixtureEpochPlan:
    def test_budget_allocation_and_cap(self, spark, tmp_path):
        """Two equal languages split the budget evenly; the epoch cap
        binds when the planned draw exceeds MAX_EPOCHS x available."""
        from couchwarehouse_spark.plans.sampling import (
            MAX_EPOCHS,
            TOKEN_BUDGET,
            mixture_epoch_plan,
        )

        d = str(tmp_path / "sf")
        df = spark.createDataFrame(
            [(0, "a b c d", "en", "src0", 7), (1, "w x y z", "fr", "src0", 7)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        import os

        os.makedirs(d, exist_ok=True)
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = mixture_epoch_plan(spark, d).toPandas().set_index("lang")
        # equal token mass → w = 1/2 each → planned = budget/2
        assert out.loc["en", "planned_tokens"] == TOKEN_BUDGET // 2
        assert out.loc["fr", "planned_tokens"] == TOKEN_BUDGET // 2
        # only 4 tokens available → cap at MAX_EPOCHS * 4
        assert out.loc["en", "effective_tokens"] == MAX_EPOCHS * 4
        assert out.loc["en", "epochs"] == round(TOKEN_BUDGET / 2 / 4, 4)


class TestScoreCalibration:
    def test_bins_partition_and_rates(self, spark, tmp_path):
        """Every doc lands in exactly one decile; per-bin positive
        rate matches a Python mirror of the hash score."""
        from couchwarehouse_spark.plans.sampling import (
            CAL_BINS,
            CAL_SCALE,
            score_calibration_bins,
        )

        rows = [(i, "t", "en" if i % 3 == 0 else "fr", "src0", 1) for i in range(60)]
        d = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                rows,
                "doc_id long, text string, lang string, source string, n_chars long",
            ),
            d,
            "documents",
        )
        out = score_calibration_bins(spark, d).toPandas()
        assert out["n"].sum() == 60
        mirror = {}
        for i, _, lang, _, _ in rows:
            s = int(hashlib.md5(f"cal:{i}".encode()).hexdigest()[:8], 16)
            b = s * CAL_BINS // CAL_SCALE
            n, p = mirror.get(b, (0, 0))
            mirror[b] = (n + 1, p + (1 if lang == "en" else 0))
        for _, r in out.iterrows():
            n, p = mirror[r["bin"]]
            assert r["n"] == n and r["n_pos"] == p
