"""Planted-fixture golden tests for the late-round-9 operator
batches: multiple-testing control (BH-FDR), variance homogeneity
(Brown-Forsythe), agreement (Cohen / Fleiss / Cochran's Q), the KMV
sketch and its set algebra, survival analysis (Kaplan-Meier +
log-rank), causal estimators (DiD, IPW, Qini), model/retrieval eval
(rank-AUC, MAP@10, Brier/ECE), HITS, LM-Dirichlet retrieval,
Jensen-Shannon divergence, SPC (EWMA), link prediction
(Adamic-Adar), TextRank, item-item CF, Fellegi-Sunter linkage,
lead-lag cross-correlation, Friedman, engagement (DAU/WAU),
day-of-week seasonality, Neyman allocation, Hodges-Lehmann,
Cliff's delta, the runs test, consistent-hash rebalance, and the
k-NN hubness audit. Each fixture is small enough that the expected
statistic is computed by hand (or with one line of math) in the
assertion.
"""

from __future__ import annotations

import math
import os
from datetime import datetime, timedelta


def _write(df, sf_dir: str, name: str) -> None:
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{sf_dir}/{name}.parquet")


def _docs(spark, rows):
    """rows: (doc_id, text, lang, source)."""
    return spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _docs_chars(spark, rows):
    """rows: (doc_id, text, lang, source, n_chars) — explicit n_chars."""
    return spark.createDataFrame(
        list(rows),
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _events(spark, rows):
    """rows: (event_id, user_id, day_offset, event_type, value)."""
    base = datetime(2024, 1, 1, 12, 0, 0)
    return spark.createDataFrame(
        [
            (i, base + timedelta(days=d), u, et, v, "{}")
            for i, u, d, et, v in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _emb(spark, rows):
    """rows: (vec_id, label, {dim: value})."""
    return spark.createDataFrame(
        [
            (i, [float(d.get(j, 0.0)) for j in range(64)], lab)
            for i, lab, d in rows
        ],
        "vec_id long, embedding array<float>, label int",
    )


class TestBenjaminiHochberg:
    def test_extreme_types_rejected_mid_type_not(self, spark, tmp_path):
        """Type 'hot' converts always, 'cold' never (|z| huge, Chernoff
        p ~ 0 -> rejected); 'mid' converts at the pooled rate (z ~ 0,
        p = 1 -> survives). BH ordering must put mid last."""
        from couchwarehouse_spark.plans.statistics import benjamini_hochberg_fdr

        sf = str(tmp_path / "sf")
        rows = []
        eid = 0
        for _ in range(100):
            rows.append((eid, eid, 0, "hot", 100.0)); eid += 1
            rows.append((eid, eid, 0, "cold", 1.0)); eid += 1
            rows.append((eid, eid, 0, "mid", 100.0 if eid % 2 else 1.0)); eid += 1
        _write(_events(spark, rows), sf, "events")
        out = {r["event_type"]: r for r in benjamini_hochberg_fdr(spark, sf).collect()}
        assert out["hot"]["rejected"] and out["cold"]["rejected"]
        assert not out["mid"]["rejected"]
        assert out["mid"]["bh_rank"] == 3
        assert out["hot"]["p_chernoff"] < 1e-5
        assert out["mid"]["p_chernoff"] > 0.9
        # step-up monotonicity: every rank below a rejected rank is rejected
        ranks = sorted(out.values(), key=lambda r: r["bh_rank"])
        seen_accept = False
        for r in ranks:
            if not r["rejected"]:
                seen_accept = True
            assert not (seen_accept and r["rejected"])


class TestBrownForsythe:
    def test_hand_computed_f_statistic(self, spark, tmp_path):
        """Group bb = [100, 200, 300] (med 200, |2x-400| = [200,0,200]),
        group aa constant (all deviations 0). By hand W = 4.0."""
        from couchwarehouse_spark.plans.statistics import brown_forsythe_variance

        sf = str(tmp_path / "sf")
        _write(
            _docs_chars(spark, [
                (1, "t", "aa", "s", 50), (2, "t", "aa", "s", 50),
                (3, "t", "aa", "s", 50),
                (4, "t", "bb", "s", 100), (5, "t", "bb", "s", 200),
                (6, "t", "bb", "s", 300),
            ]),
            sf, "documents",
        )
        row = brown_forsythe_variance(spark, sf).collect()[0]
        assert row["k_groups"] == 2 and row["n_docs"] == 6
        assert row["bf_stat"] == 4.0


class TestCohensKappa:
    def test_hand_computed_kappa(self, spark, tmp_path):
        """Cells n11=2, n10=1, n01=0, n00=1 -> po=0.75, pe=0.5, k=0.5."""
        from couchwarehouse_spark.plans.statistics import cohens_kappa_raters

        sf = str(tmp_path / "sf")
        long_text = "w " * 69 + "w"   # 70 tokens
        short_text = "w " * 9 + "w"   # 10 tokens
        _write(
            _docs_chars(spark, [
                (1, long_text, "en", "s", 400),   # both raters: long
                (2, long_text, "en", "s", 350),   # both raters: long
                (3, short_text, "en", "s", 320),  # chars long, tokens short
                (4, short_text, "en", "s", 100),  # both short
            ]),
            sf, "documents",
        )
        row = cohens_kappa_raters(spark, sf).collect()[0]
        assert (row["n11"], row["n10"], row["n01"], row["n00"]) == (2, 1, 0, 1)
        assert row["po"] == 0.75 and row["pe"] == 0.5 and row["kappa"] == 0.5


class TestKMVSketch:
    def test_exact_count_and_positive_estimate(self, spark, tmp_path):
        from couchwarehouse_spark.plans.statistics import kmv_distinct_audit

        sf = str(tmp_path / "sf")
        li = spark.createDataFrame(
            [(i, i % 200, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
              datetime(2024, 1, 1)) for i in range(600)],
            "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_linenumber int, l_quantity double, l_extendedprice double, "
            "l_discount double, l_tax double, l_returnflag string, "
            "l_linestatus string, l_shipdate timestamp",
        )
        _write(li, sf, "lineitem")
        row = kmv_distinct_audit(spark, sf).collect()[0]
        assert row["n_exact"] == 200
        assert row["kth_hash"] > 0
        assert row["kmv_estimate"] > 0


class TestKaplanMeier:
    def test_hand_computed_survival_step(self, spark, tmp_path):
        """4 users: two hit the big purchase at t=2, one censors at
        t=1, one censors at t=4. The only death time is t=2 with
        n_at_risk 3 -> log S = ln(1/3)."""
        from couchwarehouse_spark.plans.statistics import kaplan_meier_survival

        sf = str(tmp_path / "sf")
        rows = [
            # u1: first day0, big purchase day2
            (1, 1, 0, "view", 1.0), (2, 1, 2, "purchase", 250.0),
            # u2: first day0, censored at day4
            (3, 2, 0, "view", 1.0), (4, 2, 4, "click", 1.0),
            # u3: big purchase day2
            (5, 3, 0, "view", 1.0), (6, 3, 2, "purchase", 300.0),
            # u4: censored at day1
            (7, 4, 0, "view", 1.0), (8, 4, 1, "click", 1.0),
        ]
        _write(_events(spark, rows), sf, "events")
        out = kaplan_meier_survival(spark, sf).collect()
        assert len(out) == 1
        row = out[0]
        assert row["t_days"] == 2 and row["n_at_risk"] == 3
        assert row["n_events"] == 2
        assert row["log_survival_nats"] == round(math.log(1.0 / 3.0), 6)


class TestDiD:
    def test_hand_computed_did(self, spark, tmp_path):
        """Treat (odd uid) lifts 10 -> 30; control lifts 10 -> 15.
        DiD = 20 - 5 = 15."""
        from couchwarehouse_spark.plans.statistics import did_estimator

        sf = str(tmp_path / "sf")
        rows = [
            (1, 1, 0, "view", 10.0), (2, 1, 20, "view", 30.0),
            (3, 2, 0, "view", 10.0), (4, 2, 20, "view", 15.0),
        ]
        _write(_events(spark, rows), sf, "events")
        row = did_estimator(spark, sf).collect()[0]
        assert row["mean_treat_pre"] == 10.0 and row["mean_treat_post"] == 30.0
        assert row["mean_ctrl_pre"] == 10.0 and row["mean_ctrl_post"] == 15.0
        assert row["did_estimate"] == 15.0


class TestIPW:
    def test_confounded_naive_vs_ipw(self, spark, tmp_path):
        """Two strata with propensities 1/3 (view) and 2/3 (purchase);
        hand-computed ATE_IPW = 12, naive = 14 (biased by the
        expensive stratum being treated more often)."""
        from couchwarehouse_spark.plans.statistics import ipw_treatment_effect

        sf = str(tmp_path / "sf")
        rows = [
            (1, 0, 0, "view", 10.0),      # treated (uid%3=0)
            (2, 1, 0, "view", 2.0),       # control
            (3, 2, 0, "view", 2.0),       # control
            (4, 0, 0, "purchase", 20.0),  # treated
            (5, 1, 0, "purchase", 20.0),  # treated (purchase & uid%3=1)
            (6, 2, 0, "purchase", 4.0),   # control
        ]
        _write(_events(spark, rows), sf, "events")
        row = ipw_treatment_effect(spark, sf).collect()[0]
        assert row["n_strata"] == 2 and row["n_events"] == 6
        assert row["ate_ipw"] == 12.0
        assert row["ate_naive"] == 14.0


class TestRocAuc:
    def test_tie_exact_auc(self, spark, tmp_path):
        """Positives at scores {1.0, 0.1}, negatives at {-0.8, 0.1}:
        U = 2 + 1 + 0.5 = 3.5 -> AUC = 0.875 with the tie counted
        half, exactly."""
        from couchwarehouse_spark.plans.similarity import roc_auc_rank

        sf = str(tmp_path / "sf")
        _write(
            _emb(spark, [
                (1, 1, {1: 1.0}),   # pos, score 0.9 + 0.1 = 1.0
                (2, 1, {}),         # pos, score 0.1 (zero vec is fine: dot only)
                (3, 0, {0: 1.0}),   # neg, score -0.9 + 0.1 = -0.8
                (4, 0, {}),         # neg, score 0.1 (tie with vec 2)
            ]),
            sf, "embeddings",
        )
        row = roc_auc_rank(spark, sf).collect()[0]
        assert row["n_pos"] == 2 and row["n_neg"] == 2
        assert row["u2_stat"] == 7  # 2U = 7
        assert row["auc"] == 0.875


class TestRetrievalMAP:
    def test_hand_computed_ap(self, spark, tmp_path):
        """Query v0 (label 0): ranked v1 (label 1, miss), v3 (label 0,
        hit at rank 2), v2 (cos 0, miss). R = |label0| - 1 = 1 ->
        AP = P@2 = 0.5."""
        from couchwarehouse_spark.plans.similarity import retrieval_eval_map

        sf = str(tmp_path / "sf")
        _write(
            _emb(spark, [
                (0, 0, {0: 1.0}),            # the query (vec_id % 10 == 0)
                (1, 1, {0: 1.0}),            # cos 1, wrong label
                (2, 1, {1: 1.0}),            # cos 0
                (3, 0, {0: 0.5}),            # cos 1 (colinear), right label
            ]),
            sf, "embeddings",
        )
        out = {r["label"]: r for r in retrieval_eval_map(spark, sf).collect()}
        assert out[0]["n_queries"] == 1
        assert out[0]["map_at_10"] == 0.5


class TestHits:
    def test_structure_on_dense_cluster(self, spark, tmp_path):
        """A single tight cluster: every node gets positive authority
        and hub mass; output is authority-sorted."""
        from couchwarehouse_spark.plans.similarity import hits_hub_authority

        sf = str(tmp_path / "sf")
        _write(
            _emb(spark, [
                (i, 0, {0: 1.0, 1: 0.01 * i, 2: 0.003 * i * i})
                for i in range(6)
            ]),
            sf, "embeddings",
        )
        out = hits_hub_authority(spark, sf).collect()
        assert len(out) == 6
        auth = [r["auth_score"] for r in out]
        assert auth == sorted(auth, reverse=True)
        assert all(r["hub_score"] > 0 for r in out)
        assert sum(auth) > 0


class TestLMDirichlet:
    def test_hand_computed_scores(self, spark, tmp_path):
        from couchwarehouse_spark.plans.relational_extra import (
            LM_MU, lm_dirichlet_relevance,
        )

        sf = str(tmp_path / "sf")
        _write(
            _docs(spark, [
                (1, "data data x y", "en", "s"),
                (2, "x y z w", "en", "s"),
                (3, "table x y z", "en", "s"),
            ]),
            sf, "documents",
        )
        out = {r["doc_id"]: r for r in lm_dirichlet_relevance(spark, sf).collect()}
        assert set(out) == {1, 3}  # doc 2 has no query term
        c_len, cf1, cf2 = 12, 2, 1

        def score(tf1, tf2, dl):
            return round(
                math.log((tf1 + LM_MU * cf1 / c_len) / (dl + LM_MU))
                + math.log((tf2 + LM_MU * cf2 / c_len) / (dl + LM_MU)),
                4,
            )

        assert out[1]["score"] == score(2, 0, 4)
        assert out[3]["score"] == score(0, 1, 4)


class TestJensenShannon:
    def test_identical_zero_disjoint_ln2(self, spark, tmp_path):
        """Identical sources -> JSD 0; disjoint vocab -> JSD ln 2."""
        from couchwarehouse_spark.plans.curation import jensen_shannon_sources

        sf = str(tmp_path / "sf")
        _write(
            _docs(spark, [
                (1, "a a", "en", "s1"),
                (2, "b b", "en", "s2"),
                (3, "a a", "en", "s3"),
            ]),
            sf, "documents",
        )
        out = {(r["src_a"], r["src_b"]): r for r in
               jensen_shannon_sources(spark, sf).collect()}
        # each disjoint side quantizes 0.5*ln2 to micro units before
        # the sum, so the result is ln2 +/- 1 micro-nat per side
        ln2 = math.log(2)
        assert abs(out[("s1", "s2")]["jsd_nats"] - ln2) <= 2e-6
        assert abs(out[("s2", "s3")]["jsd_nats"] - ln2) <= 2e-6
        assert out[("s1", "s3")]["jsd_nats"] == 0.0
        assert out[("s1", "s3")]["n_shared_terms"] == 1


class TestFleissKappa:
    def test_perfect_agreement(self, spark, tmp_path):
        """All three raters agree on every doc -> P_bar = 1,
        P_e = 0.5 (balanced marginals), kappa = 1."""
        from couchwarehouse_spark.plans.statistics import fleiss_kappa_multirater

        sf = str(tmp_path / "sf")
        pos_text = "data " + "w " * 68 + "w"   # 70 tokens, has 'data'
        neg_text = "w " * 9 + "w"              # 10 tokens, no 'data'
        _write(
            _docs_chars(spark, [
                (1, pos_text, "en", "s", 400), (2, pos_text, "en", "s", 420),
                (3, neg_text, "en", "s", 100), (4, neg_text, "en", "s", 120),
            ]),
            sf, "documents",
        )
        row = fleiss_kappa_multirater(spark, sf).collect()[0]
        assert row["n_items"] == 4
        assert row["p_bar"] == 1.0 and row["p_e"] == 0.5
        assert row["fleiss_kappa"] == 1.0


class TestEwmaChart:
    def test_dyadic_recursion_exact(self, spark, tmp_path):
        """Counts [10, 1, 1, 1] -> EWMA [10, 5.5, 3.25, 2.125]
        exactly (lambda = 1/2 is dyadic)."""
        from couchwarehouse_spark.plans.events_windows import ewma_control_chart

        sf = str(tmp_path / "sf")
        rows, eid = [], 0
        for day, n in enumerate([10, 1, 1, 1]):
            for _ in range(n):
                rows.append((eid, eid, day, "view", 1.0)); eid += 1
        _write(_events(spark, rows), sf, "events")
        out = ewma_control_chart(spark, sf).collect()
        assert [r["ewma"] for r in out] == [10.0, 5.5, 3.25, 2.125]
        assert [r["n_events"] for r in out] == [10, 1, 1, 1]
        assert not any(r["out_of_control"] for r in out)


class TestAdamicAdar:
    def test_structure_on_dense_cluster(self, spark, tmp_path):
        from couchwarehouse_spark.plans.similarity import adamic_adar_linkpred

        sf = str(tmp_path / "sf")
        _write(
            _emb(spark, [
                (i, 0, {0: 1.0, 1: 0.01 * i, 2: 0.003 * i * i})
                for i in range(8)
            ]),
            sf, "embeddings",
        )
        out = adamic_adar_linkpred(spark, sf).collect()
        assert 0 < len(out) <= 20
        scores = [r["adamic_adar"] for r in out]
        assert scores == sorted(scores, reverse=True)
        assert all(r["common_neighbors"] >= 1 for r in out)
        assert all(r["adamic_adar"] > 0 for r in out)


class TestTextRank:
    def test_hand_computed_two_iterations(self, spark, tmp_path):
        """Path graph a-b-c: hub token b outranks the leaves; leaves
        tie and break on token order. Micro ranks computed by hand."""
        from couchwarehouse_spark.plans.text import textrank_keywords

        sf = str(tmp_path / "sf")
        _write(
            _docs(spark, [(1, "a b", "en", "s"), (2, "b c", "en", "s")]),
            sf, "documents",
        )
        out = textrank_keywords(spark, sf).collect()
        got = [(r["token"], r["textrank_micro"]) for r in out]
        assert got == [("b", 1127500), ("a", 936250), ("c", 936250)]


class TestItemCF:
    def test_hand_computed_cosine(self, spark, tmp_path):
        """Baskets {1,2}, {1,2}, {1,3}: sim(1,2) = 2/sqrt(6),
        sim(1,3) = 1/sqrt(3)."""
        from couchwarehouse_spark.plans.relational_extra import (
            item_cooccurrence_cf,
        )

        sf = str(tmp_path / "sf")
        li = spark.createDataFrame(
            [(o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", datetime(2024, 1, 1))
             for o, parts in [(1, [1, 2]), (2, [1, 2]), (3, [1, 3])]
             for p in parts],
            "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_linenumber int, l_quantity double, l_extendedprice double, "
            "l_discount double, l_tax double, l_returnflag string, "
            "l_linestatus string, l_shipdate timestamp",
        )
        _write(li, sf, "lineitem")
        out = item_cooccurrence_cf(spark, sf).collect()
        assert [(r["item_a"], r["item_b"], r["c_ab"]) for r in out] == [
            (1, 2, 2), (1, 3, 1),
        ]
        assert out[0]["cosine_sim"] == round(2 / math.sqrt(6), 6)
        assert out[1]["cosine_sim"] == round(1 / math.sqrt(3), 6)


class TestFellegiSunter:
    def test_pattern_census_and_weights(self, spark, tmp_path):
        """One block, 3 records: pair (1,2) agrees on both fields,
        pairs (1,3)/(2,3) disagree on both. Both field histograms are
        {x:2, y:1} so u = 1/3 and the weights are 2*ln(2.7) and
        2*ln(0.15) in micro-nats."""
        from couchwarehouse_spark.plans.dedup import fellegi_sunter_linkage

        sf = str(tmp_path / "sf")
        cust = spark.createDataFrame(
            [
                (1, "Customer#001", 5, 1500.0, "AUTO"),
                (2, "Customer#011", 5, 1600.0, "AUTO"),
                (3, "Customer#002", 5, 2500.0, "AUTO"),
            ],
            "c_custkey long, c_name string, c_nationkey int, "
            "c_acctbal double, c_mktsegment string",
        )
        _write(cust, sf, "customer")
        out = {(r["agree_acctbal_kilo"], r["agree_name_digit"]): r
               for r in fellegi_sunter_linkage(spark, sf).collect()}
        assert set(out) == {(True, True), (False, False)}
        assert out[(True, True)]["n_pairs"] == 1
        assert out[(False, False)]["n_pairs"] == 2
        w_agree = round(1_000_000 * math.log(0.9 * 6 / 2))
        w_dis = round(1_000_000 * math.log(0.1 * 6 / 4))
        assert out[(True, True)]["match_weight_nats"] == round(
            2 * w_agree / 1_000_000, 6
        )
        assert out[(False, False)]["match_weight_nats"] == round(
            2 * w_dis / 1_000_000, 6
        )


class TestLogRank:
    def test_hand_computed_chi2(self, spark, tmp_path):
        """Treated users (odd uid) both convert at t=1; controls censor
        at t=5. One death time: E1 = 2*(2/4) = 1, V = 1/3 ->
        chi2 = (2-1)^2 / (1/3) = 3."""
        from couchwarehouse_spark.plans.statistics import logrank_test

        sf = str(tmp_path / "sf")
        rows = [
            (1, 1, 0, "view", 1.0), (2, 1, 1, "purchase", 250.0),
            (3, 3, 0, "view", 1.0), (4, 3, 1, "purchase", 300.0),
            (5, 2, 0, "view", 1.0), (6, 2, 5, "click", 1.0),
            (7, 4, 0, "view", 1.0), (8, 4, 5, "click", 1.0),
        ]
        _write(_events(spark, rows), sf, "events")
        row = logrank_test(spark, sf).collect()[0]
        assert row["n_treat"] == 2 and row["n_ctrl"] == 2
        assert row["observed_treat"] == 2
        assert row["expected_treat"] == 1.0
        assert row["logrank_chi2"] == 3.0


class TestLeadLagXcorr:
    def test_shifted_series_perfect_lag1(self, spark, tmp_path):
        """Purchases replay the view series one day later -> r = 1 at
        lag 1 over the 3 overlapping days."""
        from couchwarehouse_spark.plans.events_windows import lead_lag_xcorr

        sf = str(tmp_path / "sf")
        views = [1, 2, 3, 4]
        purchases = [5, 1, 2, 3]  # day d+1 purchases = day d views
        rows, eid = [], 0
        for day in range(4):
            for _ in range(views[day]):
                rows.append((eid, eid, day, "view", 1.0)); eid += 1
            for _ in range(purchases[day]):
                rows.append((eid, eid, day, "purchase", 1.0)); eid += 1
        _write(_events(spark, rows), sf, "events")
        out = {r["lag_days"]: r for r in lead_lag_xcorr(spark, sf).collect()}
        assert out[1]["n_days"] == 3
        assert out[1]["xcorr"] == 1.0
        assert out[0]["n_days"] == 4


class TestBrierDecomposition:
    def test_degenerate_all_positive(self, spark, tmp_path):
        """All docs are 'en' -> uncertainty 0, resolution 0, and the
        Brier score equals the reliability-style penalty for every
        unit of unclaimed confidence."""
        from couchwarehouse_spark.plans.sampling import brier_decomposition

        sf = str(tmp_path / "sf")
        _write(
            _docs(spark, [(i, "w x", "en", "s") for i in range(20)]),
            sf, "documents",
        )
        row = brier_decomposition(spark, sf).collect()[0]
        assert row["n_docs"] == 20
        assert row["uncertainty"] == 0.0
        assert row["resolution"] == 0.0
        assert row["brier_score"] > 0 and row["ece"] > 0


class TestCochransQ:
    def test_hand_computed_q(self, spark, tmp_path):
        """Rows (1,1,1), (1,0,0), (1,0,0), (0,0,0): C = (3,1,1),
        sum R = 5, sum R^2 = 11 -> Q = 2*(3*11 - 25)/(15 - 11) = 4."""
        from couchwarehouse_spark.plans.statistics import cochrans_q_test

        sf = str(tmp_path / "sf")
        long_with_term = "data " + "w " * 68 + "w"  # 70 toks, has 'data'
        short_plain = "w " * 9 + "w"                # 10 toks, no 'data'
        _write(
            _docs_chars(spark, [
                (1, long_with_term, "en", "s", 400),  # (1,1,1)
                (2, short_plain, "en", "s", 400),     # (1,0,0)
                (3, short_plain, "en", "s", 400),     # (1,0,0)
                (4, short_plain, "en", "s", 100),     # (0,0,0)
            ]),
            sf, "documents",
        )
        row = cochrans_q_test(spark, sf).collect()[0]
        assert (row["c1"], row["c2"], row["c3"]) == (3, 1, 1)
        assert row["cochran_q"] == 4.0


class TestFriedman:
    def test_hand_computed_chi2(self, spark, tmp_path):
        """Two days, two types, 'view' always larger: rank sums 8 and 4
        (x2 scale) -> chi2 = 3*80/12 - 18 = 2."""
        from couchwarehouse_spark.plans.statistics import friedman_rank_test

        sf = str(tmp_path / "sf")
        rows, eid = [], 0
        for day, (nv, np_) in enumerate([(3, 1), (4, 2)]):
            for _ in range(nv):
                rows.append((eid, eid, day, "view", 1.0)); eid += 1
            for _ in range(np_):
                rows.append((eid, eid, day, "purchase", 1.0)); eid += 1
        _write(_events(spark, rows), sf, "events")
        row = friedman_rank_test(spark, sf).collect()[0]
        assert row["n_blocks"] == 2 and row["k_treatments"] == 2
        assert row["friedman_chi2"] == 2.0


class TestKMVSetOps:
    def test_small_universe_exact_flags(self, spark, tmp_path):
        """Union smaller than K: every hash is in the sketch, so k_int
        equals the exact intersection and jaccard_est is exact."""
        from couchwarehouse_spark.plans.statistics import kmv_set_operations

        sf = str(tmp_path / "sf")
        rows = []
        for p in range(1, 31):       # order 0 (mod 50 = 0): parts 1..30
            rows.append((0, p))
        for p in range(20, 51):      # order 1 (mod 50 = 1): parts 20..50
            rows.append((1, p))
        li = spark.createDataFrame(
            [(o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", datetime(2024, 1, 1))
             for o, p in rows],
            "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_linenumber int, l_quantity double, l_extendedprice double, "
            "l_discount double, l_tax double, l_returnflag string, "
            "l_linestatus string, l_shipdate timestamp",
        )
        _write(li, sf, "lineitem")
        row = kmv_set_operations(spark, sf).collect()[0]
        assert row["n_union"] == 50
        assert row["n_intersection_exact"] == 11  # parts 20..30
        assert row["k_int"] == 11
        assert row["jaccard_est"] == round(11 / 50, 4)


class TestConsistentHashRebalance:
    def test_ring_moves_fewer_keys_than_mod(self, spark, tmp_path):
        from couchwarehouse_spark.plans.skew_plan import (
            consistent_hash_rebalance,
        )

        sf = str(tmp_path / "sf")
        orders = spark.createDataFrame(
            [(i, i % 100 + 1, "O", 1.0, datetime(2024, 1, 1), "1-URGENT")
             for i in range(300)],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, "
            "o_orderpriority string",
        )
        _write(orders, sf, "orders")
        row = consistent_hash_rebalance(spark, sf).collect()[0]
        assert row["n_keys"] == 100
        assert row["moved_ring"] < row["moved_mod"]
        assert row["frac_moved_ring"] < row["frac_moved_mod"]


class TestDauWau:
    def test_hand_computed_ratio(self, spark, tmp_path):
        """Day 0: users 1-3 active; day 1: only user 1. WAU covers both
        days -> stickiness day1 = 1/3."""
        from couchwarehouse_spark.plans.events_windows import dau_wau_stickiness

        sf = str(tmp_path / "sf")
        rows = [
            (1, 1, 0, "view", 1.0), (2, 2, 0, "view", 1.0),
            (3, 3, 0, "view", 1.0), (4, 1, 1, "view", 1.0),
        ]
        _write(_events(spark, rows), sf, "events")
        out = {r["day"]: r for r in dau_wau_stickiness(spark, sf).collect()}
        assert out["2024-01-01"]["dau"] == 3 and out["2024-01-01"]["wau"] == 3
        assert out["2024-01-01"]["stickiness"] == 1.0
        assert out["2024-01-02"]["dau"] == 1 and out["2024-01-02"]["wau"] == 3
        assert out["2024-01-02"]["stickiness"] == round(1 / 3, 4)


class TestDowSeasonality:
    def test_pure_weekly_pattern_explains_all_variance(self, spark, tmp_path):
        """Counts repeat [7,1,1,1,1,1,1] across two weeks -> every
        day-of-week group is constant, eta^2 = 1, peak is Monday
        (dow 0 from the 2024-01-01 anchor)."""
        from couchwarehouse_spark.plans.events_windows import (
            dow_seasonality_strength,
        )

        sf = str(tmp_path / "sf")
        rows, eid = [], 0
        pattern = [7, 1, 1, 1, 1, 1, 1]
        for day in range(14):
            for _ in range(pattern[day % 7]):
                rows.append((eid, eid, day, "view", 1.0)); eid += 1
        _write(_events(spark, rows), sf, "events")
        row = dow_seasonality_strength(spark, sf).collect()[0]
        assert row["n_days"] == 14
        assert row["eta_squared"] == 1.0
        assert row["peak_dow"] == 0 and row["peak_mean"] == 7.0


class TestQini:
    def test_final_point_equals_total_incremental(self, spark, tmp_path):
        """Only treated users convert -> the last cumulative point is
        the full treated conversion count and the curve is cumulative
        monotone in exposure."""
        from couchwarehouse_spark.plans.statistics import qini_uplift_curve

        sf = str(tmp_path / "sf")
        rows, eid = [], 0
        for u in range(1, 41):
            treat = u % 2 == 1
            v = 150.0 if treat else 50.0  # only treated cross the 100 bar
            rows.append((eid, u, 0, "purchase", v)); eid += 1
        _write(_events(spark, rows), sf, "events")
        out = qini_uplift_curve(spark, sf).collect()
        last = out[-1]
        assert last["n_treat_cum"] == 20 and last["n_ctrl_cum"] == 20
        assert last["conv_treat_cum"] == 20 and last["conv_ctrl_cum"] == 0
        assert last["qini"] == 20.0
        cum = [r["n_treat_cum"] + r["n_ctrl_cum"] for r in out]
        assert cum == sorted(cum)


class TestNeymanAllocation:
    def test_zero_variance_stratum_gets_nothing(self, spark, tmp_path):
        """Source 'a' has constant lengths (S_h = 0): the entire
        Neyman budget goes to 'b', while proportional still splits by
        size."""
        from couchwarehouse_spark.plans.sampling import neyman_allocation_plan

        sf = str(tmp_path / "sf")
        _write(
            _docs_chars(spark, [
                (1, "t", "en", "a", 100), (2, "t", "en", "a", 100),
                (3, "t", "en", "b", 50), (4, "t", "en", "b", 350),
            ]),
            sf, "documents",
        )
        out = {r["source"]: r for r in neyman_allocation_plan(spark, sf).collect()}
        assert out["a"]["sd_chars"] == 0.0 and out["a"]["n_neyman"] == 0
        assert out["b"]["n_neyman"] == 1000
        assert out["a"]["n_proportional"] == 500
        assert out["b"]["n_proportional"] == 500


class TestHodgesLehmann:
    def test_hand_computed_pairwise_median(self, spark, tmp_path):
        """en = [100, 200] vs rest = [50]: diffs {50, 150}, lower
        median = 50."""
        from couchwarehouse_spark.plans.statistics import hodges_lehmann_shift

        sf = str(tmp_path / "sf")
        _write(
            _docs_chars(spark, [
                (1, "t", "en", "s", 100), (2, "t", "en", "s", 200),
                (3, "t", "xx", "s", 50),
            ]),
            sf, "documents",
        )
        row = hodges_lehmann_shift(spark, sf).collect()[0]
        assert row["n_pairs"] == 2
        assert row["hl_shift"] == 50


class TestCliffDelta:
    def test_balanced_dominance_is_zero(self, spark, tmp_path):
        """en = [100, 300] vs rest = [200]: one win, one loss ->
        delta = 0 exactly."""
        from couchwarehouse_spark.plans.statistics import cliff_delta_effect

        sf = str(tmp_path / "sf")
        _write(
            _docs_chars(spark, [
                (1, "t", "en", "s", 100), (2, "t", "en", "s", 300),
                (3, "t", "xx", "s", 200),
            ]),
            sf, "documents",
        )
        row = cliff_delta_effect(spark, sf).collect()[0]
        assert row["n_x"] == 2 and row["n_y"] == 1
        assert row["u2_stat"] == 2  # one win counts 2 in the x2 scale
        assert row["cliff_delta"] == 0.0


class TestRunsTest:
    def test_hand_computed_runs_z(self, spark, tmp_path):
        """Daily counts [5,6,1,2,7,8] (median 5.5, no ties): signs
        BABBAA -> 4 runs, n1=3 above, n2=3 below; z from the
        Wald-Wolfowitz moments."""
        from couchwarehouse_spark.plans.statistics import runs_test_randomness

        sf = str(tmp_path / "sf")
        rows, eid = [], 0
        for day, n in enumerate([5, 6, 1, 2, 7, 8]):
            for _ in range(n):
                rows.append((eid, eid, day, "view", 1.0)); eid += 1
        _write(_events(spark, rows), sf, "events")
        row = runs_test_randomness(spark, sf).collect()[0]
        assert (row["n_above"], row["n_below"], row["n_runs"]) == (3, 3, 4)
        n1, n2, r = 3, 3, 4
        n = n1 + n2
        mu = 2 * n1 * n2 / n + 1
        sigma = math.sqrt(
            (2 * n1 * n2) * (2 * n1 * n2 - n) / (n * n * (n - 1))
        )
        assert row["runs_z"] == round((r - mu) / sigma, 4)


class TestHubness:
    def test_edge_conservation_on_dense_cluster(self, spark, tmp_path):
        """8 vectors in one bucket: every node emits exactly k=3
        edges, so the in-degree total must equal 24."""
        from couchwarehouse_spark.plans.similarity import knn_hubness_audit

        sf = str(tmp_path / "sf")
        _write(
            _emb(spark, [
                (i, 0, {0: 1.0, 1: 0.01 * i, 2: 0.003 * i * i})
                for i in range(8)
            ]),
            sf, "embeddings",
        )
        row = knn_hubness_audit(spark, sf).collect()[0]
        assert row["n_vectors"] == 8
        assert row["n_edges"] == 24
        assert row["max_in_degree"] >= 3
        assert row["n_hubs"] + row["n_antihubs"] <= 8


class TestKruskalWallis:
    def test_hand_computed_h_no_ties(self, spark, tmp_path):
        """aa = [10, 20], bb = [30, 40] (global ranks 1..4, no ties):
        H = 12/20 * (9/2 + 49/2) - 15 = 2.4."""
        from couchwarehouse_spark.plans.statistics import kruskal_wallis_doclen

        sf = str(tmp_path / "sf")
        _write(
            _docs_chars(spark, [
                (1, "t", "aa", "s", 10), (2, "t", "aa", "s", 20),
                (3, "t", "bb", "s", 30), (4, "t", "bb", "s", 40),
            ]),
            sf, "documents",
        )
        row = kruskal_wallis_doclen(spark, sf).collect()[0]
        assert row["k_groups"] == 2 and row["n_docs"] == 4
        assert row["h_stat"] == 2.4
        assert row["h_adjusted"] == 2.4  # no ties -> correction is 1


class TestWasserstein:
    def test_point_masses_move_exact_distance(self, spark, tmp_path):
        """en mass at 100, rest at 200: every unit moves 100 ->
        W1 = 100 with an exact integer numerator."""
        from couchwarehouse_spark.plans.statistics import (
            wasserstein_doclen_drift,
        )

        sf = str(tmp_path / "sf")
        _write(
            _docs_chars(spark, [
                (1, "t", "en", "s", 100), (2, "t", "en", "s", 100),
                (3, "t", "xx", "s", 200),
            ]),
            sf, "documents",
        )
        row = wasserstein_doclen_drift(spark, sf).collect()[0]
        assert row["n_x"] == 2 and row["n_y"] == 1
        assert row["w1_numerator"] == 200  # |2*1 - 0*2| * gap(100)
        assert row["wasserstein_1"] == 100.0


class TestBinarySegmentation:
    def test_level_shift_found_at_boundary(self, spark, tmp_path):
        """Counts [1,1,1,9,9,9]: the gain (n_L*n_R/n)*(dmean)^2 =
        3*3/6*64 = 96 peaks at the true boundary after day 3."""
        from couchwarehouse_spark.plans.events_windows import (
            binary_segmentation_split,
        )

        sf = str(tmp_path / "sf")
        rows, eid = [], 0
        for day, n in enumerate([1, 1, 1, 9, 9, 9]):
            for _ in range(n):
                rows.append((eid, eid, day, "view", 1.0)); eid += 1
        _write(_events(spark, rows), sf, "events")
        row = binary_segmentation_split(spark, sf).collect()[0]
        assert row["split_after_day"] == "2024-01-03"
        assert row["n_days"] == 6
        assert row["between_ss_gain"] == 96.0
        assert row["mean_left"] == 1.0 and row["mean_right"] == 9.0
