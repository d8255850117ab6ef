"""Planted-fixture golden tests for round 12.

Round 12 opens by closing the r11 ADVICE items (analyze-stats victim
fold-back, Gumbel mu association) and the VERDICT follow-ups: the
Fellegi-Sunter sub-salted block pair join (FS_BLOCK_CAP), the
graph-traversal ANN lane, and the streaming state-store stress
claims. These tests plant the shapes the sf-scale oracle sims can't
isolate: a hot block big enough to force s > 1 sub-salting with the
pair census checked against a naive O(block²) reference, and the
greedy-search determinism/termination contracts.
"""

from __future__ import annotations

import os

import pytest


def _write(df, sf_dir: str, name: str) -> None:
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{sf_dir}/{name}.parquet")


class TestFellegiSunterSubSalting:
    def test_hot_block_census_matches_naive_pairs(self, spark, tmp_path):
        """120 rows in one (segment, nation) block forces
        s = ceil(120/FS_BLOCK_CAP) = 3 sub-salting; the agreement-
        pattern census must equal the naive per-block O(n²)
        enumeration — every unordered pair generated exactly once."""
        from couchwarehouse_spark.plans.dedup import (
            FS_BLOCK_CAP,
            fellegi_sunter_linkage,
        )

        assert FS_BLOCK_CAP == 50  # census below assumes 120 > 2*cap
        rows = []
        # Hot block: 120 rows, acctbal cycles 0..5k, name digit 0..9.
        for i in range(120):
            rows.append((i, f"Customer#{i % 10}", 1, "HOT", float(i % 6) * 1000.0 + 1.0))
        # Cold block: 10 rows.
        for i in range(120, 130):
            rows.append((i, f"Customer#{i % 7}", 2, "COLD", float(i % 3) * 1000.0 + 1.0))
        cust = spark.createDataFrame(
            rows,
            "c_custkey long, c_name string, c_nationkey long, "
            "c_mktsegment string, c_acctbal double",
        )
        sf = str(tmp_path / "sf")
        _write(cust, sf, "customer")

        # Naive reference census over each block.
        from collections import Counter
        from itertools import combinations

        feats = {
            k: (seg, nat, int(bal // 1000), name[-1])
            for (k, name, nat, seg, bal) in rows
        }
        expected: Counter = Counter()
        by_block: dict = {}
        for k, (seg, nat, f1, f2) in feats.items():
            by_block.setdefault((seg, nat), []).append((k, f1, f2))
        for members in by_block.values():
            for (ka, f1a, f2a), (kb, f1b, f2b) in combinations(members, 2):
                expected[(f1a == f1b, f2a == f2b)] += 1

        got = {
            (r["agree_acctbal_kilo"], r["agree_name_digit"]): r["n_pairs"]
            for r in fellegi_sunter_linkage(spark, sf).collect()
        }
        assert got == dict(expected)
        assert sum(got.values()) == 120 * 119 // 2 + 10 * 9 // 2


class TestGreedySearch:
    def test_deterministic_and_bounded(self, spark):
        """Two runs at SF_SMOKE are row-identical (every frontier and
        answer selection is (cos DESC, vec_id)-ordered), hops stay in
        [0, GS_ROUNDS], and the answer is ≤ TOP_K rows without the
        query vector."""
        from couchwarehouse_spark.plans import QUERIES
        from couchwarehouse_spark.plans.similarity import (
            GS_ROUNDS,
            QUERY_VEC_ID,
            TOP_K,
        )

        from .conftest import SF_SMOKE

        r1 = QUERIES["graph_greedy_search_topk"](spark, SF_SMOKE).collect()
        r2 = QUERIES["graph_greedy_search_topk"](spark, SF_SMOKE).collect()
        assert r1 == r2
        assert 0 < len(r1) <= TOP_K
        assert all(0 <= r["hop"] <= GS_ROUNDS for r in r1)
        assert all(r["vec_id"] != QUERY_VEC_ID for r in r1)
        # Scores arrive sorted descending with vec_id tiebreak.
        key = [(-r["cos_sim"], r["vec_id"]) for r in r1]
        assert key == sorted(key)

    def test_recall_audit_invariants(self, spark):
        from couchwarehouse_spark.plans import QUERIES

        from .conftest import SF_SMOKE

        row = QUERIES["greedy_search_recall_audit"](spark, SF_SMOKE).collect()[0]
        assert row["n_hits"] <= row["n_ann"] <= row["k"] == 10
        assert abs(row["recall_at_k"] - row["n_hits"] / 10.0) < 1e-9


def _orders(spark, rows):
    """rows: (o_orderkey, o_custkey, o_orderstatus, o_totalprice,
    o_orderdate, o_orderpriority)."""
    return spark.createDataFrame(
        list(rows),
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


def _events(spark, rows):
    """rows: (event_id, ts, user_id, event_type, value)."""
    return spark.createDataFrame(
        list(rows),
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )


class TestRound12StatsGoldens:
    def test_wilcoxon_hand_computed(self, spark, tmp_path):
        """Diffs +200, -100, +100, +300 cents (|d|=100 tied twice, so
        midranks 1.5/1.5 then 3, 4): W+ = 1.5 + 3 + 4 = 8.5,
        z = (17 - 10)/sqrt(30)."""
        from datetime import datetime

        from couchwarehouse_spark.plans.statistics import wilcoxon_signed_rank

        jan, feb = datetime(2024, 1, 5), datetime(2024, 2, 5)
        rows = [
            (1, 1, "O", 3.0, jan, "1-URGENT"), (2, 1, "O", 1.0, feb, "1-URGENT"),
            (3, 2, "O", 1.0, jan, "1-URGENT"), (4, 2, "O", 2.0, feb, "1-URGENT"),
            (5, 3, "O", 2.0, jan, "1-URGENT"), (6, 3, "O", 1.0, feb, "1-URGENT"),
            (7, 4, "O", 4.0, jan, "1-URGENT"), (8, 4, "O", 1.0, feb, "1-URGENT"),
            # excluded: odd-month only, and a zero difference
            (9, 5, "O", 9.0, jan, "1-URGENT"),
            (10, 6, "O", 2.0, jan, "1-URGENT"), (11, 6, "O", 2.0, feb, "1-URGENT"),
        ]
        sf = str(tmp_path / "sf")
        _write(_orders(spark, rows), sf, "orders")
        row = wilcoxon_signed_rank(spark, sf).collect()[0]
        assert row["n_pairs"] == 4
        assert row["w_plus"] == 8.5
        assert row["z_score"] == round(7 / 30**0.5, 4)

    def test_kendall_w_perfect_concordance(self, spark, tmp_path):
        from couchwarehouse_spark.plans.statistics import kendall_w_concordance

        rows = [
            (1, "Customer#1", 1, "SEG", 1.0),
            (2, "Customer#2", 2, "SEG", 2.0),
            (3, "Customer#3", 2, "SEG", 2.5),
            (4, "Customer#4", 3, "SEG", 3.0),
            (5, "Customer#5", 3, "SEG", 3.5),
            (6, "Customer#6", 3, "SEG", 4.0),
        ]
        cust = spark.createDataFrame(
            rows,
            "c_custkey long, c_name string, c_nationkey long, "
            "c_mktsegment string, c_acctbal double",
        )
        sf = str(tmp_path / "sf")
        _write(cust, sf, "customer")
        row = kendall_w_concordance(spark, sf).collect()[0]
        assert row["n_items"] == 3 and row["m_raters"] == 3
        assert row["kendall_w"] == 1.0

    def test_negative_binomial_hand_fit(self, spark, tmp_path):
        """Daily counts {1, 5}: mean 3, var 8, r = 9/5, p = 3/8."""
        from datetime import datetime

        from couchwarehouse_spark.plans.statistics import (
            negative_binomial_mom_fit,
        )

        rows = [(0, datetime(2024, 1, 1, 12), 1, "view", 1.0)]
        rows += [
            (i, datetime(2024, 1, 2, 6 + i), 1, "view", 1.0) for i in range(1, 6)
        ]
        sf = str(tmp_path / "sf")
        _write(_events(spark, rows), sf, "events")
        row = negative_binomial_mom_fit(spark, sf).collect()[0]
        assert row["n_days"] == 2
        assert row["mean_daily"] == 3.0 and row["var_daily"] == 8.0
        assert row["nb_r"] == 1.8 and row["nb_p"] == 0.375

    def test_cohens_d_identical_groups_is_zero(self, spark, tmp_path):
        from couchwarehouse_spark.plans.statistics import cohens_d_effect_size

        docs = spark.createDataFrame(
            [
                (1, "x", "en", "s", 100), (2, "x", "en", "s", 200),
                (3, "x", "fr", "s", 100), (4, "x", "fr", "s", 200),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        sf = str(tmp_path / "sf")
        _write(docs, sf, "documents")
        row = cohens_d_effect_size(spark, sf).collect()[0]
        assert row["lang"] == "fr"
        assert row["cohens_d"] == 0.0 and row["hedges_g"] == 0.0

    def test_max_drawdown_hand_series(self, spark, tmp_path):
        """PnL +500, -300, +100, -200 -> cum 500,200,300,100; peak 500
        throughout; max drawdown 400 on day 4."""
        from datetime import datetime

        from couchwarehouse_spark.plans.statistics import max_drawdown_series

        rows = [
            (1, datetime(2024, 1, 1, 12), 1, "purchase", 5.0),
            (2, datetime(2024, 1, 2, 12), 1, "error", 3.0),
            (3, datetime(2024, 1, 3, 12), 1, "purchase", 1.0),
            (4, datetime(2024, 1, 4, 12), 1, "error", 2.0),
        ]
        sf = str(tmp_path / "sf")
        _write(_events(spark, rows), sf, "events")
        row = max_drawdown_series(spark, sf).collect()[0]
        assert row["n_days"] == 4
        assert row["max_drawdown_cents"] == 400
        assert row["trough_day"] == "2024-01-04"

    def test_theil_u_deterministic_relation_is_one(self, spark, tmp_path):
        """status is a function of priority -> U(status|priority) = 1,
        exactly, because MI terms and H(X) terms quantize identically."""
        from datetime import datetime

        from couchwarehouse_spark.plans.statistics import theil_u_uncertainty

        d = datetime(2024, 1, 1)
        rows = [
            (1, 1, "A", 1.0, d, "P1"), (2, 1, "A", 1.0, d, "P1"),
            (3, 1, "B", 1.0, d, "P2"), (4, 1, "B", 1.0, d, "P2"),
            (5, 1, "B", 1.0, d, "P2"),
        ]
        sf = str(tmp_path / "sf")
        _write(_orders(spark, rows), sf, "orders")
        row = theil_u_uncertainty(spark, sf).collect()[0]
        assert row["n_orders"] == 5
        assert row["theil_u"] == 1.0
        assert row["mi_nats"] == row["h_status_nats"] > 0

    def test_hellinger_identical_distributions(self, spark, tmp_path):
        from couchwarehouse_spark.plans.statistics import hellinger_doclen_drift

        docs = spark.createDataFrame(
            [
                (1, "x", "en", "s", 100), (2, "x", "en", "s", 300),
                (3, "x", "en", "s", 100), (4, "x", "en", "s", 300),
                (5, "x", "fr", "s", 100), (6, "x", "fr", "s", 300),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        sf = str(tmp_path / "sf")
        _write(docs, sf, "documents")
        row = hellinger_doclen_drift(spark, sf).collect()[0]
        assert row["lang"] == "fr"
        assert row["bhattacharyya"] == 1.0 and row["hellinger"] == 0.0


class TestRound12TextGoldens:
    def test_msttr_hand_segments(self, spark, tmp_path):
        """25 tokens: segment 1 all-same (1 type), segment 2 all
        distinct (10 types), 5-token tail drops -> MSTTR 11/20."""
        from couchwarehouse_spark.plans.text import msttr_lexical_diversity

        text = " ".join(["a"] * 10 + [f"w{i}" for i in range(10)] + ["t"] * 5)
        docs = spark.createDataFrame(
            [(1, text, "en", "s", len(text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        sf = str(tmp_path / "sf")
        _write(docs, sf, "documents")
        row = msttr_lexical_diversity(spark, sf).collect()[0]
        assert row["n_segments"] == 2 and row["sum_types"] == 11
        assert row["msttr"] == 0.55

    def test_yule_k_hand_spectrum(self, spark, tmp_path):
        """Tokens 'a a a b': K = 1e4 * (10 - 4) / 16 = 3750."""
        from couchwarehouse_spark.plans.text import yule_k_lexical_richness

        docs = spark.createDataFrame(
            [(1, "a a a b", "en", "s", 7)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        sf = str(tmp_path / "sf")
        _write(docs, sf, "documents")
        row = yule_k_lexical_richness(spark, sf).collect()[0]
        assert row["n_tokens"] == 4 and row["vocab"] == 2
        assert row["yule_k"] == 3750.0


class TestStratifiedKfold:
    def test_folds_deterministic_and_complete(self, spark):
        from couchwarehouse_spark.plans import QUERIES
        from couchwarehouse_spark.plans.sampling import KFOLDS

        from .conftest import SF_SMOKE

        r1 = QUERIES["stratified_kfold_audit"](spark, SF_SMOKE).collect()
        r2 = QUERIES["stratified_kfold_audit"](spark, SF_SMOKE).collect()
        assert r1 == r2
        assert all(0 <= r["fold"] < KFOLDS for r in r1)
        # Every doc lands in exactly one fold: per-lang cells sum to
        # the lang totals implied by expected_per_fold * KFOLDS.
        by_lang = {}
        for r in r1:
            by_lang.setdefault(r["lang"], [0, 0.0])
            by_lang[r["lang"]][0] += r["n_docs"]
            by_lang[r["lang"]][1] = r["expected_per_fold"] * KFOLDS
        for lang, (n, exp_total) in by_lang.items():
            assert abs(n - exp_total) < 0.5, lang


class TestAndersonDarling:
    def test_identical_samples_zero(self, spark, tmp_path):
        """src0 and src1 with identical length histograms: every
        N*M_j - n_a*H_j term is 0, so A² = 0 exactly."""
        docs = spark.createDataFrame(
            [
                (1, "x", "en", "src0", 100), (2, "x", "en", "src0", 200),
                (3, "x", "en", "src1", 100), (4, "x", "en", "src1", 200),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        from couchwarehouse_spark.plans.statistics import anderson_darling_drift

        sf = str(tmp_path / "sf")
        _write(docs, sf, "documents")
        row = anderson_darling_drift(spark, sf).collect()[0]
        assert row["n_a"] == 2 and row["n_b"] == 2
        assert row["ad_micro_sum"] == 0 and row["ad_stat"] == 0.0

    def test_disjoint_samples_hand_value(self, spark, tmp_path):
        """src0 = {1,1}, src1 = {9,9}: one distinct boundary below N,
        terms at v=1: h=2, M=2, H=2, N=4, n_a=2 ->
        2*(4*2-2*2)^2/(2*2) = 8; A² = 8/(2*2) = 2.0."""
        docs = spark.createDataFrame(
            [
                (1, "x", "en", "src0", 1), (2, "x", "en", "src0", 1),
                (3, "x", "en", "src1", 9), (4, "x", "en", "src1", 9),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        from couchwarehouse_spark.plans.statistics import anderson_darling_drift

        sf = str(tmp_path / "sf")
        _write(docs, sf, "documents")
        row = anderson_darling_drift(spark, sf).collect()[0]
        assert row["ad_stat"] == 2.0
