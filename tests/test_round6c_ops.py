"""Planted-fixture golden tests for the round-6 third-batch operators
(containment pairs, Gopher rule census, feature hashing, Heaps' law,
MAD outliers, JL projection audit). The oracle lane proves
Spark ≡ DuckDB; these prove both are RIGHT on hand-built inputs whose
correct output is known by construction (SURVEY.md §5)."""

from __future__ import annotations

import hashlib
import os


def _write(df, sf_dir: str, name: str) -> None:
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{sf_dir}/{name}.parquet")


def _docs(spark, rows):
    """rows: list of (doc_id, text, lang, source)."""
    return spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


class TestContainmentDupPairs:
    def test_subset_doc_scores_full_containment(self, spark, tmp_path):
        """Doc 0's shingle set is a strict subset of doc 1's → max
        containment 1.0 even though Jaccard is low; the unrelated doc
        pairs with nobody."""
        from couchwarehouse_spark.plans.dedup import containment_dup_pairs

        d = str(tmp_path / "sf")
        long_text = "a b c d " + " ".join(f"w{i}" for i in range(20))
        _write(
            _docs(
                spark,
                [
                    (0, "a b c d", "en", "s0"),  # shingles: abc, bcd
                    (1, long_text, "en", "s0"),  # superset of doc 0's
                    (2, "x y z x y z x", "en", "s0"),
                ],
            ),
            d,
            "documents",
        )
        out = containment_dup_pairs(spark, d).toPandas()
        assert len(out) == 1
        row = out.iloc[0]
        assert (row["doc_a"], row["doc_b"]) == (0, 1)
        assert row["containment"] == 1.0

    def test_lang_blocking(self, spark, tmp_path):
        """Identical texts in different langs never pair."""
        from couchwarehouse_spark.plans.dedup import containment_dup_pairs

        d = str(tmp_path / "sf")
        _write(
            _docs(
                spark,
                [(0, "a b c d e", "en", "s0"), (1, "a b c d e", "de", "s0")],
            ),
            d,
            "documents",
        )
        assert containment_dup_pairs(spark, d).count() == 0

    def test_below_threshold_excluded(self, spark, tmp_path):
        """Two docs sharing 1 of their 3 shingles (containment 1/3 <
        3/5) produce no pair."""
        from couchwarehouse_spark.plans.dedup import containment_dup_pairs

        d = str(tmp_path / "sf")
        _write(
            _docs(
                spark,
                [
                    (0, "a b c p q", "en", "s0"),  # abc, bcp, cpq
                    (1, "a b c r s", "en", "s0"),  # abc, bcr, crs
                ],
            ),
            d,
            "documents",
        )
        assert containment_dup_pairs(spark, d).count() == 0


class TestGopherQualityFlags:
    def test_each_rule_fires_on_its_planted_doc(self, spark, tmp_path):
        """One doc per failure mode + one passing doc; each failing doc
        trips EXACTLY its intended rule. Bands: wordcount [20, 80],
        mean word length [4.3, 4.8], ≥2 distinct stopwords, dup-bigram
        gate 16·dup > total."""
        from couchwarehouse_spark.plans.curation import gopher_quality_flags

        d = str(tmp_path / "sf")
        # Passing: 30 tokens, all bigrams distinct, word_chars =
        # 3+2 + 20·4 + 8·6 = 133 → mean 4.433 ∈ [4.3, 4.8].
        passing = (
            "the of "
            + " ".join(f"ab{i:02d}" for i in range(20))
            + " "
            + " ".join(f"cdef{i:02d}" for i in range(8))
        )
        # Short: 4 tokens < 20 (also mean-length low — wordcount AND
        # wordlen fire; asserted below).
        short = "the of abcd abcde"
        # No stopwords: 30 distinct tokens, word_chars = 18·4 + 12·5 =
        # 132 → mean 4.4 in band; only the stopword rule fires.
        no_stops = (
            " ".join(f"wx{i:02d}" for i in range(18))
            + " "
            + " ".join(f"qrs{i:02d}" for i in range(12))
        )
        # Repeaty: "abc abcdef" ×14 → 30 tokens, word_chars =
        # 5 + 14·(3+6) = 131 → mean 4.366 in band; 29 bigrams but only
        # 4 distinct → dup rule fires alone.
        repeaty = "the of " + " ".join("abc abcdef" for _ in range(14))
        rows = [
            (0, passing, "en", "s0"),
            (1, short, "en", "s0"),
            (2, no_stops, "en", "s0"),
            (3, repeaty, "en", "s0"),
        ]
        _write(_docs(spark, rows), d, "documents")
        out = gopher_quality_flags(spark, d).toPandas().set_index("lang")
        r = out.loc["en"]
        assert r["n_docs"] == 4
        assert r["n_fail_wordcount"] == 1  # short
        assert r["n_fail_wordlen"] == 1  # short (14·10 < 43·4)
        assert r["n_fail_stopwords"] == 1  # no_stops
        assert r["n_fail_dupbigram"] == 1  # repeaty
        assert r["n_pass"] == 1  # passing


class TestFeatureHashingVectorizer:
    @staticmethod
    def _bucket(term: str) -> int:
        return int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % 32

    @staticmethod
    def _sign(term: str) -> int:
        h = int(hashlib.md5(f"sgn:{term}".encode()).hexdigest()[:15], 16)
        return 1 if h % 2 == 0 else -1

    def test_signed_masses_match_hand_hash(self, spark, tmp_path):
        from couchwarehouse_spark.plans.text import feature_hashing_vectorizer

        d = str(tmp_path / "sf")
        _write(
            _docs(spark, [(0, "cat cat dog", "en", "s0"), (1, "dog emu", "en", "s0")]),
            d,
            "documents",
        )
        out = feature_hashing_vectorizer(spark, d).toPandas()
        expected: dict[int, list] = {}
        for term, c in [("cat", 2), ("dog", 2), ("emu", 1)]:
            b = self._bucket(term)
            e = expected.setdefault(b, [0, 0, 0])
            e[0] += 1
            e[1] += c
            e[2] += self._sign(term) * c
        got = {
            int(r["bucket"]): [int(r["n_terms"]), int(r["total_count"]), int(r["signed_mass"])]
            for _, r in out.iterrows()
        }
        assert got == expected


class TestHeapsLawVocabGrowth:
    def test_prefix_vocab_counts(self, spark, tmp_path):
        from couchwarehouse_spark.plans.text import heaps_law_vocab_growth

        d = str(tmp_path / "sf")
        # 4 docs; ceil-cutoffs at 10/25/50/100% of 4 docs = 1, 1, 2, 4.
        _write(
            _docs(
                spark,
                [
                    (0, "a b", "en", "s0"),
                    (1, "a c", "en", "s0"),
                    (2, "a b c", "en", "s0"),
                    (3, "d d d", "en", "s0"),
                ],
            ),
            d,
            "documents",
        )
        out = heaps_law_vocab_growth(spark, d).toPandas().set_index("pct")
        assert out.loc[10]["cutoff_docs"] == 1
        assert out.loc[10]["vocab_size"] == 2  # {a, b}
        assert out.loc[10]["n_tokens_cum"] == 2
        assert out.loc[50]["cutoff_docs"] == 2
        assert out.loc[50]["vocab_size"] == 3  # {a, b, c}
        assert out.loc[50]["n_tokens_cum"] == 4
        assert out.loc[100]["vocab_size"] == 4
        assert out.loc[100]["n_tokens_cum"] == 10


class TestMadOutlierCensus:
    def test_hand_computed_median_mad_outliers(self, spark):
        from couchwarehouse_spark.plans.statistics import MAD_SQL

        # Status A: values 1..9 plus one wild 1000.
        # n=10 → median = element at rank ceil(5) = 5 → value 5.0.
        # adevs: 4,3,2,1,0,1,2,3,4,995 → sorted 0,1,1,2,2,3,3,4,4,995;
        # MAD = rank-5 element = 2.0; 3·MAD = 6 → only 1000 (adev 995)
        # is an outlier.
        rows = [(k, "A", float(v)) for k, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
        spark.createDataFrame(
            rows, "o_orderkey long, o_orderstatus string, o_totalprice double"
        ).createOrReplaceTempView("orders")
        out = spark.sql(MAD_SQL).toPandas().set_index("o_orderstatus")
        r = out.loc["A"]
        assert r["n_orders"] == 10
        assert r["median_price"] == 5.0
        assert r["mad"] == 2.0
        assert r["n_outliers"] == 1
        assert r["outlier_rate"] == 0.1


class TestRandomProjectionAudit:
    def test_unit_basis_vector_has_exact_unit_distortion(self, spark, tmp_path):
        """embedding = e_0 → ‖x‖² = 1 and every projection is ±1, so
        ‖Px‖² = k and the distortion ratio is exactly 1.0."""
        from couchwarehouse_spark.plans.similarity import random_projection_audit

        d = str(tmp_path / "sf")
        e0 = [1.0] + [0.0] * 63
        spark.createDataFrame(
            [(0, e0, 7)], "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
        out = random_projection_audit(spark, d).toPandas()
        assert len(out) == 1
        assert out.iloc[0]["norm_sq"] == 1.0
        assert out.iloc[0]["jl_distortion"] == 1.0


class TestDsirImportanceWeights:
    def test_target_like_doc_outranks_offdomain(self, spark, tmp_path):
        """Docs repeating the target (en) corpus's bigrams must score
        above docs made of off-domain bigrams."""
        from couchwarehouse_spark.plans.dedup import md5_long  # noqa: F401
        from couchwarehouse_spark.plans.sampling import dsir_importance_weights

        d = str(tmp_path / "sf")
        en = "alpha beta gamma delta alpha beta"
        _write(
            _docs(
                spark,
                [
                    (0, en, "en", "s0"),
                    (1, en, "en", "s0"),
                    (2, "alpha beta gamma delta", "de", "s0"),  # target-like
                    (3, "omega psi chi phi omega psi", "de", "s0"),  # off-domain
                ],
            ),
            d,
            "documents",
        )
        out = dsir_importance_weights(spark, d).toPandas()
        w = {int(r["doc_id"]): r["dsir_logw"] for _, r in out.iterrows()}
        # The target-like de doc must outscore the off-domain de doc.
        assert w[2] > w[3]
        # Docs made purely of target bigrams outscore everything else.
        assert min(w[0], w[1], w[2]) > w[3]


class TestPcaPowerIteration:
    def test_matvec_matches_numpy(self, spark, tmp_path):
        import numpy as np

        from couchwarehouse_spark.plans.similarity import (
            PCA_SCALE,
            pca_power_iteration,
        )

        rng = np.random.RandomState(7)
        X = rng.randn(20, 64).astype("float32")
        spark.createDataFrame(
            [(i, [float(x) for x in X[i]], 0) for i in range(20)],
            "vec_id long, embedding array<float>, label int",
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/embeddings.parquet")
        out = pca_power_iteration(spark, str(tmp_path / "sf")).toPandas()
        Q = np.floor(X.astype("float64") * PCA_SCALE).astype("int64")
        s = Q.sum(axis=1)
        v1 = (Q * s[:, None]).sum(axis=0)
        ray = int((s * s).sum())
        got = {int(r["dim_i"]): int(r["v1"]) for _, r in out.iterrows()}
        for dim, val in got.items():
            assert val == int(v1[dim]), dim
        assert set(out["rayleigh_num"]) == {ray}
        # rows are the top-|v1| dims
        top = sorted(range(64), key=lambda i: (-abs(int(v1[i])), i))[:10]
        assert sorted(got) == sorted(top)


class TestStupidBackoffScores:
    def test_backoff_fires_only_on_unseen_bigrams(self, spark, tmp_path):
        """Train/test split is the deterministic hash gate; craft ids
        so one test doc repeats a train bigram (no backoff) and one
        introduces a novel bigram (backoff)."""
        from couchwarehouse_spark.plans.sampling import TRAIN_PCT, VAL_PCT, _split_bucket
        from couchwarehouse_spark.plans.text import stupid_backoff_scores
        import hashlib

        def bucket(doc_id: int) -> int:
            return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100

        train_ids = [i for i in range(200) if bucket(i) < TRAIN_PCT][:2]
        test_ids = [i for i in range(200) if bucket(i) >= TRAIN_PCT + VAL_PCT][:2]
        rows = [
            (train_ids[0], "aa bb cc", "en", "s0"),
            (train_ids[1], "aa bb dd", "en", "s0"),
            (test_ids[0], "aa bb", "en", "s0"),  # seen bigram → no backoff
            (test_ids[1], "cc aa", "en", "s0"),  # novel bigram → backoff
        ]
        d = str(tmp_path / "sf")
        _write(_docs(spark, rows), d, "documents")
        out = stupid_backoff_scores(spark, d).toPandas()
        r = out[out["lang"] == "en"].iloc[0]
        assert r["n_transitions"] == 2
        assert r["n_backoff"] == 1
        # "aa bb": B=2, C(aa)=2 → S=1 → -ln S = 0. "cc aa": backoff,
        # S = 0.4·(u(aa)+1)/(N+V+1) = 0.4·3/(6+4+1) = 12/110.
        import math

        expected = round((0.0 + -math.log(0.4 * 3 / 11)) / 2, 6)
        assert abs(r["avg_surprisal"] - expected) < 1e-6


class TestMarkovTransitionMatrix:
    def test_hand_built_chain(self, spark, tmp_path):
        from couchwarehouse_spark.plans.events_windows import (
            markov_transition_matrix,
        )

        rows = [
            # user 1: a -> b -> a -> b   (a->b ×2, b->a ×1)
            (1, "2024-01-01 00:00:00", 1, "a", 0.0, "{}"),
            (2, "2024-01-01 00:01:00", 1, "b", 0.0, "{}"),
            (3, "2024-01-01 00:02:00", 1, "a", 0.0, "{}"),
            (4, "2024-01-01 00:03:00", 1, "b", 0.0, "{}"),
            # user 2: a -> c            (a->c ×1)
            (5, "2024-01-01 00:00:00", 2, "a", 0.0, "{}"),
            (6, "2024-01-01 00:01:00", 2, "c", 0.0, "{}"),
        ]
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        df.write.mode("overwrite").parquet(f"{tmp_path}/sf/events.parquet")
        out = markov_transition_matrix(spark, str(tmp_path / "sf")).toPandas()
        got = {
            (r["prev_type"], r["next_type"]): (
                int(r["n_transitions"]), r["p_transition"]
            )
            for _, r in out.iterrows()
        }
        assert got[("a", "b")] == (2, round(2 / 3, 6))
        assert got[("a", "c")] == (1, round(1 / 3, 6))
        assert got[("b", "a")] == (1, 1.0)
        assert len(got) == 3  # no cross-user transition (2's a -> 1's b)


class TestBenfordFirstDigitAudit:
    def test_digits_and_chi2_terms(self, spark, tmp_path):
        from couchwarehouse_spark.plans.statistics import (
            _BENFORD,
            benford_first_digit_audit,
        )

        # 123.45 -> cents 12345 -> digit 1; 999.99 -> 99999 -> 9;
        # 0.07 -> 7 -> 7; 850.00 -> 85000 -> 8.
        rows = [
            (1, "A", 123.45), (2, "A", 999.99), (3, "A", 0.07), (4, "A", 850.00),
        ]
        spark.createDataFrame(
            rows, "o_orderkey long, o_orderstatus string, o_totalprice double"
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/orders.parquet")
        out = benford_first_digit_audit(spark, str(tmp_path / "sf")).toPandas()
        got = {int(r["digit"]): r for _, r in out.iterrows()}
        assert sorted(got) == [1, 7, 8, 9]
        assert all(int(got[d]["n_orders"]) == 1 for d in got)
        assert got[1]["observed_share"] == 0.25
        assert got[1]["benford_share"] == _BENFORD[1]
        e = _BENFORD[1] * 4
        assert abs(got[1]["chi2_term"] - round((1 - e) ** 2 / e, 6)) < 1e-9


class TestContainmentRandomizedModel:
    def test_matches_bruteforce_on_random_corpus(self, spark, tmp_path):
        """Seeded random corpus; expected pairs computed by a
        brute-force Python model over the same shingle/threshold
        definition — validates candidate generation loses nothing."""
        import random

        from couchwarehouse_spark.plans.dedup import (
            CONT_DEN,
            CONT_NUM,
            containment_dup_pairs,
        )

        rng = random.Random(99)
        vocab = [f"w{i}" for i in range(12)]
        rows = []
        texts = {}
        for i in range(40):
            if i % 7 == 3 and i > 0:
                # Plant partial dups: doc i embeds a prior doc's text.
                base = texts[rng.randrange(i)]
                text = base + " " + " ".join(rng.choice(vocab) for _ in range(6))
            else:
                text = " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 15)))
            texts[i] = text
            rows.append((i, text, "en", "s0"))
        d = str(tmp_path / "sf")
        _write(_docs(spark, rows), d, "documents")

        def shingles(t: str) -> set:
            w = t.split(" ")
            return {" ".join(w[j : j + 3]) for j in range(len(w) - 2)}

        expected = {}
        sh = {i: shingles(t) for i, t in texts.items() if len(t.split(" ")) >= 3}
        for a in sh:
            for b in sh:
                if a < b:
                    inter = len(sh[a] & sh[b])
                    m = min(len(sh[a]), len(sh[b]))
                    if inter and CONT_DEN * inter >= CONT_NUM * m:
                        expected[(a, b)] = round(inter / m, 4)
        out = containment_dup_pairs(spark, d).toPandas()
        got = {
            (int(r["doc_a"]), int(r["doc_b"])): r["containment"]
            for _, r in out.iterrows()
        }
        assert got == expected
        assert len(expected) >= 3  # the planted dups actually fired


class TestEventPatternRegexCensus:
    def test_funnel_and_double_error_detection(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from couchwarehouse_spark.plans.events_windows import (
            event_pattern_regex_census,
        )

        rows = [
            # user 1: view→signup→click→purchase  => funnel (v.*c.*p)
            (1, "2024-01-01 00:00:00", 1, "view", 0.0, "{}"),
            (2, "2024-01-01 00:01:00", 1, "signup", 0.0, "{}"),
            (3, "2024-01-01 00:02:00", 1, "click", 0.0, "{}"),
            (4, "2024-01-01 00:03:00", 1, "purchase", 0.0, "{}"),
            # user 2: purchase→click→view  => out of order, no funnel
            (5, "2024-01-01 00:00:00", 2, "purchase", 0.0, "{}"),
            (6, "2024-01-01 00:01:00", 2, "click", 0.0, "{}"),
            (7, "2024-01-01 00:02:00", 2, "view", 0.0, "{}"),
            # user 3: error→error  => double error; starts with 'e'
            (8, "2024-01-01 00:00:00", 3, "error", 0.0, "{}"),
            (9, "2024-01-01 00:01:00", 3, "error", 0.0, "{}"),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        df.write.mode("overwrite").parquet(f"{tmp_path}/sf/events.parquet")
        out = event_pattern_regex_census(spark, str(tmp_path / "sf")).toPandas()
        got = {r["first_event"]: r for _, r in out.iterrows()}
        assert int(got["v"]["n_funnel"]) == 1
        assert int(got["v"]["n_double_error"]) == 0
        assert int(got["p"]["n_funnel"]) == 0  # order matters
        assert int(got["e"]["n_double_error"]) == 1
        assert int(got["e"]["total_events"]) == 2


class TestRfmSegmentation:
    def test_quartiles_and_census_on_tiny_dim(self, spark):
        from couchwarehouse_spark.plans.relational_extra import RFM_SQL

        # 4 customers, clean quartile separation on every metric.
        rows = []
        key = 0
        for cust, (n_orders, price, day) in enumerate(
            [(8, 900.0, 28), (6, 700.0, 21), (4, 500.0, 14), (2, 300.0, 7)], start=1
        ):
            for _ in range(n_orders):
                key += 1
                rows.append((key, cust, f"2024-01-{day:02d}", price))
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderdate string, "
            "o_totalprice double",
        ).createOrReplaceTempView("orders")
        out = spark.sql(RFM_SQL).toPandas()
        # Customer 1 is best on all three metrics → segment (1,1,1).
        seg = {(int(r["r_q"]), int(r["f_q"]), int(r["m_q"])): r for _, r in out.iterrows()}
        assert set(seg) == {(1, 1, 1), (2, 2, 2), (3, 3, 3), (4, 4, 4)}
        best = seg[(1, 1, 1)]
        assert int(best["n_customers"]) == 1
        assert int(best["total_orders"]) == 8
        assert best["total_monetary"] == 7200.0


class TestScd2PointInTimeJoin:
    def test_prior_state_lookup_with_first_event_none(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from couchwarehouse_spark.plans.events_windows import (
            scd2_point_in_time_join,
        )

        rows = [
            # user 1: view, then purchase → prior state 'view'
            (1, "2024-01-01 00:00:00", 1, "view", 0.0, "{}"),
            (2, "2024-01-01 01:00:00", 1, "purchase", 0.0, "{}"),
            # user 2: purchase first ever → prior state 'none'
            (3, "2024-01-01 00:00:00", 2, "purchase", 0.0, "{}"),
            # user 1 again: second purchase right after the first →
            # prior interval is the 'purchase' state opened at 01:00
            (4, "2024-01-01 02:00:00", 1, "purchase", 0.0, "{}"),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        df.write.mode("overwrite").parquet(f"{tmp_path}/sf/events.parquet")
        out = scd2_point_in_time_join(spark, str(tmp_path / "sf")).toPandas()
        got = {r["prior_state"]: (int(r["n_purchases"]), int(r["n_users"]))
               for _, r in out.iterrows()}
        assert got["view"] == (1, 1)
        assert got["none"] == (1, 1)
        assert got["purchase"] == (1, 1)


class TestBinaryClassifierConfusion:
    def test_cells_sum_to_n_and_metrics_consistent(self, spark, tmp_path):
        import numpy as np

        from couchwarehouse_spark.plans.similarity import (
            binary_classifier_confusion,
        )

        rng = np.random.RandomState(3)
        X = rng.randn(30, 64).astype("float32")
        spark.createDataFrame(
            [(i, [float(x) for x in X[i]], i % 5) for i in range(30)],
            "vec_id long, embedding array<float>, label int",
        ).write.mode("overwrite").parquet(f"{tmp_path}/sf/embeddings.parquet")
        out = binary_classifier_confusion(spark, str(tmp_path / "sf")).toPandas()
        r = out.iloc[0]
        tp, fp, fn, tn = int(r["tp"]), int(r["fp"]), int(r["fn"]), int(r["tn"])
        assert tp + fp + fn + tn == 30
        # positives = labels 0, 2, 4 → 18 of 30 (i % 5 even)
        assert tp + fn == sum(1 for i in range(30) if (i % 5) % 2 == 0)
        if tp + fp:
            assert abs(r["precision"] - round(tp / (tp + fp), 6)) < 1e-9
        assert abs(r["accuracy"] - round((tp + tn) / 30, 6)) < 1e-9


class TestSourceKlDivergence:
    def test_uniform_source_has_zero_kl_skewed_positive(self, spark, tmp_path):
        from couchwarehouse_spark.plans.curation import source_kl_divergence

        # srcA matches the corpus distribution exactly (KL = 0 is only
        # possible when p_source == p_corpus for every term); srcB is
        # maximally skewed.
        d = str(tmp_path / "sf")
        _write(
            _docs(
                spark,
                [
                    (0, "x x y y", "en", "srcA"),
                    (1, "x x y y", "en", "srcB"),
                ],
            ),
            d,
            "documents",
        )
        out = source_kl_divergence(spark, d).toPandas().set_index("source")
        # Both sources have the same distribution as the corpus → 0.
        assert out.loc["srcA"]["kl_nats"] == 0.0
        assert out.loc["srcB"]["kl_nats"] == 0.0

    def test_skewed_source_positive(self, spark, tmp_path):
        import math

        from couchwarehouse_spark.plans.curation import source_kl_divergence

        d = str(tmp_path / "sf")
        _write(
            _docs(
                spark,
                [
                    (0, "x x x y", "en", "srcA"),  # corpus: x=6, y=2 (N=8)
                    (1, "x x x y", "en", "srcB"),
                ],
            ),
            d,
            "documents",
        )
        # Each source: x=3/4, y=1/4 == corpus 6/8, 2/8 → KL = 0 again.
        out = source_kl_divergence(spark, d).toPandas()
        assert (out["kl_nats"] == 0.0).all()
        # Now make them differ.
        _write(
            _docs(
                spark,
                [
                    (0, "x x x x", "en", "srcA"),  # all x
                    (1, "y y y y", "en", "srcB"),  # all y
                ],
            ),
            d,
            "documents",
        )
        out = source_kl_divergence(spark, d).toPandas().set_index("source")
        # p_srcA(x)=1 vs p_c(x)=1/2 → KL = ln 2.
        assert abs(out.loc["srcA"]["kl_nats"] - round(math.log(2), 6)) < 1e-6
        assert abs(out.loc["srcB"]["kl_nats"] - round(math.log(2), 6)) < 1e-6


class TestZipfFrequencySpectrum:
    def test_spectrum_counts_by_construction(self, spark, tmp_path):
        from couchwarehouse_spark.plans.text import zipf_frequency_spectrum

        d = str(tmp_path / "sf")
        # Corpus: a×3, b×2, c×2, d,e,f,g ×1 → N_1=4, N_2=2, N_3=1.
        _write(
            _docs(spark, [(0, "a a a b b", "en", "s"), (1, "c c d e f g", "en", "s")]),
            d,
            "documents",
        )
        out = zipf_frequency_spectrum(spark, d).toPandas().set_index("freq")
        assert int(out.loc[1]["n_terms"]) == 4
        assert int(out.loc[2]["n_terms"]) == 2
        assert int(out.loc[3]["n_terms"]) == 1
        # vocab = 7 → hapax share 4/7
        assert abs(out.loc[1]["vocab_share"] - round(4 / 7, 6)) < 1e-9


class TestReferentialIntegrityAudit:
    def test_planted_orphans_and_nulls(self, spark, tmp_path):
        from couchwarehouse_spark.plans.relational_extra import (
            referential_integrity_audit,
        )

        d = str(tmp_path / "sf")
        # Minimal star: 2 regions, 2 nations (one pointing at a MISSING
        # region), 2 customers (one NULL nation key), 1 supplier,
        # 1 part, 2 orders (one orphan custkey), 2 lineitems.
        _write(spark.createDataFrame([(0, "R0"), (1, "R1")], "r_regionkey long, r_name string"), d, "region")
        _write(spark.createDataFrame([(0, "N0", 0), (1, "N1", 9)], "n_nationkey long, n_name string, n_regionkey long"), d, "nation")
        _write(spark.createDataFrame([(0, 0), (1, None)], "c_custkey long, c_nationkey long"), d, "customer")
        _write(spark.createDataFrame([(0, 0)], "s_suppkey long, s_nationkey long"), d, "supplier")
        _write(spark.createDataFrame([(0,)], "p_partkey long"), d, "part")
        _write(spark.createDataFrame([(0, 0), (1, 77)], "o_orderkey long, o_custkey long"), d, "orders")
        _write(spark.createDataFrame([(0, 0, 0), (1, 0, 0)], "l_orderkey long, l_partkey long, l_suppkey long"), d, "lineitem")
        out = (
            referential_integrity_audit(spark, d)
            .toPandas()
            .set_index("fk_edge")
        )
        assert int(out.loc["nation.n_regionkey->region"]["n_orphans"]) == 1
        assert int(out.loc["orders.o_custkey->customer"]["n_orphans"]) == 1
        row = out.loc["customer.c_nationkey->nation"]
        assert (int(row["n_orphans"]), int(row["n_null_keys"])) == (0, 1)
        li = out.loc["lineitem.l_orderkey->orders"]
        assert (int(li["n_child_rows"]), int(li["n_orphans"])) == (2, 0)


class TestUserActivityStreaks:
    def test_streak_histogram_by_construction(self, spark, tmp_path):
        import datetime as dt

        from couchwarehouse_spark.plans.events_windows import user_activity_streaks

        d = str(tmp_path / "sf")
        day = lambda n, h=9: dt.datetime(2024, 1, n, h)  # noqa: E731
        rows = [
            # user 1: days 1,2,3 then 5 → best streak 3
            (1, day(1)), (1, day(2)), (1, day(3)), (1, day(5)),
            # user 2: two events same day → streak 1
            (2, day(7)), (2, day(7, 15)),
            # user 3: days 1,2 → streak 2
            (3, day(1)), (3, day(2)),
        ]
        _write(
            spark.createDataFrame(
                [(i, ts, u, "view", 1.0, "{}") for i, (u, ts) in enumerate(rows)],
                "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
            ),
            d,
            "events",
        )
        out = user_activity_streaks(spark, d).toPandas().set_index("streak_days")
        assert int(out.loc[1]["n_users"]) == 1  # user 2
        assert int(out.loc[2]["n_users"]) == 1  # user 3
        assert int(out.loc[3]["n_users"]) == 1  # user 1


class TestWeightedSampleTopk:
    def test_topk_matches_bruteforce_aes(self, spark, tmp_path):
        import hashlib as hl
        import math

        from couchwarehouse_spark.plans.sampling import (
            AES_K,
            AES_SEED,
            weighted_sample_topk,
        )

        d = str(tmp_path / "sf")
        rows = [(i, "x " * (i + 1), "en", "s") for i in range(40)]
        _write(_docs(spark, rows), d, "documents")
        out = weighted_sample_topk(spark, d).toPandas()
        assert len(out) == min(AES_K, 40)

        def key(i, w):
            u = (int(hl.md5(f"{AES_SEED}:{i}".encode()).hexdigest()[:8], 16) + 1) / 2**32
            return round(1e9 * math.log(u) / w)

        expect = sorted(
            ((key(i, len(t)), -i) for i, t, _, _ in rows), reverse=True
        )[:AES_K]
        got = list(zip(out["key_nano"].astype(int), -out["doc_id"].astype(int)))
        assert got == expect

    def test_heavier_docs_win_more(self, spark, tmp_path):
        """With one doc vastly heavier than the rest, it must be in the
        sample: ln(u)/w → 0⁻ as w grows, beating any light doc's key
        unless its u is pathologically close to 1 for all light docs."""
        from couchwarehouse_spark.plans.sampling import weighted_sample_topk

        d = str(tmp_path / "sf")
        rows = [(0, "y" * 100000, "en", "s")] + [
            (i, "x", "en", "s") for i in range(1, 60)
        ]
        _write(_docs(spark, rows), d, "documents")
        out = weighted_sample_topk(spark, d).toPandas()
        assert 0 in set(out["doc_id"])


class TestBleuNgramEval:
    def test_identical_pair_scores_one(self, spark, tmp_path):
        from couchwarehouse_spark.plans.text import bleu_ngram_eval

        d = str(tmp_path / "sf")
        _write(
            _docs(
                spark,
                [(0, "a b c d", "en", "s"), (1, "a b c d", "en", "s")],
            ),
            d,
            "documents",
        )
        out = bleu_ngram_eval(spark, d).toPandas().set_index("ngram_n")
        assert out.loc[1]["precision"] == 1.0
        assert out.loc[2]["precision"] == 1.0
        assert int(out.loc[2]["n_cand_ngrams"]) == 3

    def test_clipping_caps_repeats(self, spark, tmp_path):
        """'the the the the' vs 'the cat': unigram clip = min(4,1)=1
        → p1 = 1/4; no shared bigram → p2 = 0."""
        from couchwarehouse_spark.plans.text import bleu_ngram_eval

        d = str(tmp_path / "sf")
        _write(
            _docs(
                spark,
                [(0, "the the the the", "en", "s"), (1, "the cat", "en", "s")],
            ),
            d,
            "documents",
        )
        out = bleu_ngram_eval(spark, d).toPandas().set_index("ngram_n")
        assert out.loc[1]["precision"] == 0.25
        assert int(out.loc[1]["n_clipped"]) == 1
        assert out.loc[2]["precision"] == 0.0

    def test_unpaired_candidate_excluded(self, spark, tmp_path):
        """doc 2 has no odd partner → contributes nothing."""
        from couchwarehouse_spark.plans.text import bleu_ngram_eval

        d = str(tmp_path / "sf")
        _write(
            _docs(
                spark,
                [
                    (0, "a b", "en", "s"),
                    (1, "a b", "en", "s"),
                    (2, "z z z", "en", "s"),
                ],
            ),
            d,
            "documents",
        )
        out = bleu_ngram_eval(spark, d).toPandas().set_index("ngram_n")
        assert int(out.loc[1]["n_cand_ngrams"]) == 2


class TestNgramNoveltyAudit:
    def test_novelty_by_construction(self, spark, tmp_path):
        """Pick ids landing in train/test via the real hash gates, then
        plant a test doc whose trigrams are half-seen in train."""
        from couchwarehouse_spark.plans.sampling import (
            _split_bucket,
            ngram_novelty_audit,
        )
        from pyspark.sql import functions as F

        # Find one train id and one test id with the REAL gate.
        ids = spark.range(200).select(
            F.col("id"), _split_bucket(F.col("id")).alias("b")
        ).toPandas()
        train_id = int(ids[ids["b"] < 80].iloc[0]["id"])
        test_id = int(ids[ids["b"] >= 90].iloc[0]["id"])
        d = str(tmp_path / "sf")
        _write(
            _docs(
                spark,
                [
                    (train_id, "a b c d", "en", "s"),  # trigrams: abc, bcd
                    # test doc: trigrams (a b c)=seen, (x y z)=novel
                    (test_id, "a b c", "en", "s"),
                ]
                + [(test_id + 1000 if (test_id + 1000) != train_id else test_id + 2000,
                    "", "en", "s")],
            ),
            d,
            "documents",
        )
        out = ngram_novelty_audit(spark, d).toPandas()
        row = out[out["lang"] == "en"].iloc[0]
        assert int(row["n_test_ngrams"]) == 1
        assert int(row["n_seen_in_train"]) == 1
        assert row["novelty_rate"] == 0.0


class TestTokenizerFertility:
    def test_fertility_by_hand(self, spark, tmp_path):
        from couchwarehouse_spark.plans.text import tokenizer_fertility_by_lang

        d = str(tmp_path / "sf")
        # "ab1c d!" → subwords: ab,1,c,d,! = 5; words: 2 → fertility 2.5
        _write(_docs(spark, [(0, "ab1c d!", "en", "s")]), d, "documents")
        out = tokenizer_fertility_by_lang(spark, d).toPandas().iloc[0]
        assert int(out["n_subword_tokens"]) == 5
        assert int(out["n_words"]) == 2
        assert out["fertility"] == 2.5


class TestBurstinessFano:
    def test_poisson_like_vs_bursty(self, spark, tmp_path):
        import datetime as dt

        from couchwarehouse_spark.plans.statistics import burstiness_fano_census

        d = str(tmp_path / "sf")
        rows = []
        # 'steady': 2 events every day for 4 days → variance 0, fano 0.
        for day in range(1, 5):
            for k in range(2):
                rows.append(("steady", dt.datetime(2024, 1, day, 8 + k)))
        # 'bursty': 6 events day 1, 0-0-0, 2 events day 5 → days observed
        # are only those WITH events: counts [6, 2] → n=2, s=8, ss=40,
        # fano = (2*40 - 64) / (2*8) = 1.0
        for k in range(6):
            rows.append(("bursty", dt.datetime(2024, 1, 1, 6 + k)))
        for k in range(2):
            rows.append(("bursty", dt.datetime(2024, 1, 5, 6 + k)))
        _write(
            spark.createDataFrame(
                [(i, ts, 1, et, 1.0, "{}") for i, (et, ts) in enumerate(rows)],
                "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
            ),
            d,
            "events",
        )
        out = burstiness_fano_census(spark, d).toPandas().set_index("event_type")
        assert out.loc["steady"]["fano_factor"] == 0.0
        assert out.loc["bursty"]["fano_factor"] == 1.0
        assert int(out.loc["bursty"]["n_days"]) == 2


class TestJackknifeSourceSensitivity:
    def test_leave_out_means_by_hand(self, spark, tmp_path):
        from couchwarehouse_spark.plans.curation import load_table  # noqa: F401
        from couchwarehouse_spark.plans.statistics import (
            jackknife_source_sensitivity,
        )

        d = str(tmp_path / "sf")
        # s0: lengths 10, 20 (sum 30); s1: length 60. Overall mean 30.
        _write(
            _docs(
                spark,
                [(0, "x" * 10, "en", "s0"), (1, "x" * 20, "en", "s0"), (2, "x" * 60, "en", "s1")],
            ),
            d,
            "documents",
        )
        out = jackknife_source_sensitivity(spark, d).toPandas().set_index("source")
        assert out.loc["s0"]["mean_without"] == 60.0  # only s1 left
        assert out.loc["s0"]["jackknife_delta"] == 30.0
        assert out.loc["s1"]["mean_without"] == 15.0  # s0's mean
        assert out.loc["s1"]["jackknife_delta"] == -15.0


class TestTextNormalizationCensus:
    def test_removal_accounting(self, spark, tmp_path):
        from couchwarehouse_spark.plans.curation import text_normalization_census

        d = str(tmp_path / "sf")
        _write(
            _docs(
                spark,
                [
                    (0, "Hello,  World!", "en", "s0"),  # 14 chars → "hello world" 11
                    (1, "clean text", "en", "s0"),  # unchanged
                ],
            ),
            d,
            "documents",
        )
        out = text_normalization_census(spark, d).toPandas().iloc[0]
        assert int(out["n_docs"]) == 2
        assert int(out["n_changed"]) == 1
        assert int(out["chars_removed"]) == 3  # ',', '!', one space
        assert out["removal_rate"] == round(3 / 24, 6)


class TestMarkovConditionalEntropy:
    def test_deterministic_vs_uniform_states(self, spark, tmp_path):
        import datetime as dt
        import math

        from couchwarehouse_spark.plans.events_windows import (
            markov_conditional_entropy,
        )

        d = str(tmp_path / "sf")
        t0 = dt.datetime(2024, 1, 1)
        rows = []
        # user 1 ×4: a -> b always (H(a)=0). users carry b -> (c|d) 50/50.
        for u in range(1, 5):
            rows += [(u, t0, "a"), (u, t0.replace(hour=1), "b"),
                     (u, t0.replace(hour=2), "c" if u % 2 else "d")]
        _write(
            spark.createDataFrame(
                [(i, ts, u, et, 1.0, "{}") for i, (u, ts, et) in enumerate(rows)],
                "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
            ),
            d,
            "events",
        )
        out = markov_conditional_entropy(spark, d).toPandas().set_index("prev_type")
        assert out.loc["a"]["h_next_nats"] == 0.0
        assert int(out.loc["a"]["n_transitions"]) == 4
        assert abs(out.loc["b"]["h_next_nats"] - round(math.log(2), 6)) < 1e-6


class TestShippingLagCensus:
    def test_buckets_by_hand(self, spark, tmp_path):
        import datetime as dt

        from couchwarehouse_spark.plans.relational_extra import (
            LAG_BUCKET_DAYS,
            shipping_lag_census,
        )

        d = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                [(1, 1, "1-URGENT", dt.date(2024, 1, 1), 100.0)],
                "o_orderkey long, o_custkey long, o_orderpriority string, o_orderdate date, o_totalprice double",
            ),
            d,
            "orders",
        )
        _write(
            spark.createDataFrame(
                [
                    (1, dt.date(2024, 1, 6)),    # lag 5  → bucket 0
                    (1, dt.date(2024, 2, 15)),   # lag 45 → bucket 1
                ],
                "l_orderkey long, l_shipdate date",
            ),
            d,
            "lineitem",
        )
        out = shipping_lag_census(spark, d).toPandas()
        assert LAG_BUCKET_DAYS == 30
        b0 = out[out["lag_bucket"] == 0].iloc[0]
        assert (int(b0["n_lineitems"]), int(b0["min_lag_days"])) == (1, 5)
        b1 = out[out["lag_bucket"] == 1].iloc[0]
        assert int(b1["max_lag_days"]) == 45


class TestNormalizedDedupGain:
    def test_gain_counts(self, spark, tmp_path):
        from couchwarehouse_spark.plans.dedup import normalized_dedup_gain

        d = str(tmp_path / "sf")
        _write(
            _docs(
                spark,
                [
                    (0, "Hello World", "en", "s0"),
                    (1, "hello,  world!", "en", "s0"),  # dup only after norm
                    (2, "same text", "en", "s0"),
                    (3, "same text", "en", "s0"),  # raw dup
                    (4, "unique", "en", "s0"),
                ],
            ),
            d,
            "documents",
        )
        out = normalized_dedup_gain(spark, d).toPandas().iloc[0]
        assert int(out["raw_dup_rows"]) == 1
        assert int(out["normalized_dup_rows"]) == 2
        assert int(out["dedup_gain"]) == 1


class TestFunnelLatencyPercentiles:
    def test_single_user_latency(self, spark, tmp_path):
        import datetime as dt

        from couchwarehouse_spark.plans.events_windows import (
            funnel_latency_percentiles,
        )

        d = str(tmp_path / "sf")
        t0 = dt.datetime(2024, 1, 1, 9)
        rows = [
            (1, t0, "view"),
            (1, t0 + dt.timedelta(seconds=90), "purchase"),
            (2, t0, "view"),  # never converts
            (3, t0 + dt.timedelta(hours=1), "purchase"),  # no view first
        ]
        _write(
            spark.createDataFrame(
                [(i, ts, u, et, 1.0, "{}") for i, (u, ts, et) in enumerate(rows)],
                "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
            ),
            d,
            "events",
        )
        out = funnel_latency_percentiles(spark, d).toPandas().iloc[0]
        assert int(out["n_converted"]) == 1
        assert int(out["p50_latency_us"]) == 90_000_000
        assert int(out["p99_latency_us"]) == 90_000_000


class TestGiniSourceConcentration:
    def test_equal_and_skewed(self, spark, tmp_path):
        from couchwarehouse_spark.plans.statistics import (
            gini_source_concentration,
        )

        d = str(tmp_path / "sf")
        # Equal masses → Gini 0.
        _write(
            _docs(spark, [(0, "x" * 50, "en", "a"), (1, "x" * 50, "en", "b")]),
            d,
            "documents",
        )
        out = gini_source_concentration(spark, d).toPandas().iloc[0]
        assert out["gini"] == 0.0
        # 10 vs 90 of 100 → G = 2*(1*10+2*90)/(2*100) - 3/2 = 0.4
        _write(
            _docs(spark, [(0, "x" * 10, "en", "a"), (1, "x" * 90, "en", "b")]),
            d,
            "documents",
        )
        out = gini_source_concentration(spark, d).toPandas().iloc[0]
        assert out["gini"] == 0.4


class TestWaterfillBudgetAllocation:
    def test_sum_equals_budget_and_maxmin_fair(self, spark, tmp_path):
        from couchwarehouse_spark.plans.sampling import (
            WF_BUDGET_DEN,
            WF_BUDGET_NUM,
            waterfill_budget_allocation,
        )

        d = str(tmp_path / "sf")
        # tokens per lang: a=2, b=10, c=30, d=100 (total 142, budget 85)
        _write(
            _docs(
                spark,
                [
                    (0, "t " * 1 + "t", "aa", "s"),      # 2 tokens
                    (1, ("t " * 9) + "t", "bb", "s"),    # 10
                    (2, ("t " * 29) + "t", "cc", "s"),   # 30
                    (3, ("t " * 99) + "t", "dd", "s"),   # 100
                ],
            ),
            d,
            "documents",
        )
        out = waterfill_budget_allocation(spark, d).toPandas().set_index("lang")
        total = 142
        budget = WF_BUDGET_NUM * total // WF_BUDGET_DEN  # 85
        assert int(out["allocated"].sum()) == budget
        # small langs taken whole
        assert int(out.loc["aa"]["allocated"]) == 2
        assert int(out.loc["bb"]["allocated"]) == 10
        assert bool(out.loc["aa"]["capped"]) is False
        # cc's 30 sits BELOW the would-be shared level (73/2 = 36.5),
        # so the water-fill takes cc whole and only dd is capped, at
        # the remaining budget 85 - 42 = 43.
        assert int(out.loc["cc"]["allocated"]) == 30
        assert bool(out.loc["cc"]["capped"]) is False
        assert int(out.loc["dd"]["allocated"]) == 43
        assert bool(out.loc["dd"]["capped"]) is True
        # no allocation exceeds availability
        assert (out["allocated"] <= out["available"]).all()


class TestNgramEntropyRate:
    def test_deterministic_vs_coin_flip_language(self, spark, tmp_path):
        import math

        from couchwarehouse_spark.plans.text import ngram_entropy_rate

        d = str(tmp_path / "sf")
        _write(
            _docs(
                spark,
                [
                    # aa: every next token is determined → H = 0
                    (0, "a b a b a b a b", "aa", "s"),
                    # bb: after 'x' comes y or z 50/50 (4 of each) → each
                    # of the 8 x-transitions contributes ln2; the 7
                    # returns (y→x, z→x) are deterministic.
                    (1, "x y x z x y x z x y x z x y x z", "bb", "s"),
                ],
            ),
            d,
            "documents",
        )
        out = ngram_entropy_rate(spark, d).toPandas().set_index("lang")
        assert out.loc["aa"]["entropy_rate_nats"] == 0.0
        # bb: 15 bigrams, 8 x→{y,z} each ln2, 7 returns 0 → 8·ln2/15
        expect = round(8 * math.log(2) / 15, 6)
        assert abs(out.loc["bb"]["entropy_rate_nats"] - expect) < 2e-6


class TestStopShingleCapAudit:
    def test_pair_work_accounting(self, spark, tmp_path):
        from couchwarehouse_spark.plans import dedup as D

        d = str(tmp_path / "sf")
        # 60 docs share shingle "a b c" (df=60 > cap 50); one doc has a
        # unique shingle tail.
        rows = [(i, "a b c", "en", "s") for i in range(60)]
        rows.append((100, "p q r", "en", "s"))
        _write(_docs(spark, rows), d, "documents")
        out = D.stop_shingle_cap_audit(spark, d).toPandas().iloc[0]
        assert int(out["n_shingles"]) == 2
        assert int(out["n_stop_shingles"]) == 1
        assert int(out["pair_work_total"]) == 60 * 60 + 1
        assert int(out["pair_work_capped"]) == 3600
        assert out["pair_work_saved_share"] == round(3600 / 3601, 6)


class TestIncrementalDedupProbe:
    def test_batch_vs_corpus_hits(self, spark, tmp_path):
        from couchwarehouse_spark.plans.dedup import incremental_dedup_probe

        d = str(tmp_path / "sf")
        _write(
            _docs(
                spark,
                [
                    # corpus (ids not % 10): one doc with text "same"
                    (1, "same text here", "en", "s0"),
                    (2, "other corpus doc", "en", "s0"),
                    # batch (ids % 10 == 0): one dup (after norm), one new
                    (10, "Same, Text HERE!", "en", "s0"),
                    (20, "genuinely new", "en", "s0"),
                ],
            ),
            d,
            "documents",
        )
        out = incremental_dedup_probe(spark, d).toPandas().iloc[0]
        assert int(out["n_incoming"]) == 2
        assert int(out["n_already_present"]) == 1
        assert out["dup_vs_corpus_rate"] == 0.5


class TestWaterfillRandomizedModel:
    @staticmethod
    def _model(avail: dict, num: int, den: int) -> dict:
        """Independent pure-Python water-fill: simulate pouring the
        budget one 'round' at a time (exact integer arithmetic)."""
        budget = num * sum(avail.values()) // den
        alloc = dict.fromkeys(avail, 0)
        remaining = dict(avail)
        while budget > 0 and any(remaining.values()):
            live = sorted(k for k, v in remaining.items() if v > 0)
            level = budget // len(live)
            if level == 0:
                # distribute the last few units to the first ranks of
                # the CAPPED set in ascending-availability order — the
                # same deterministic remainder rule as the operator
                order = sorted(live, key=lambda k: (avail[k], k))
                for k in order[:budget]:
                    alloc[k] += 1
                    remaining[k] -= 1
                budget = 0
                break
            take_any = False
            for k in live:
                t = min(level, remaining[k])
                if t:
                    alloc[k] += t
                    remaining[k] -= t
                    budget -= t
                    take_any = True
            if not take_any:
                break
        return alloc

    def test_random_corpora_match_model_invariants(self, spark, tmp_path):
        import random

        from couchwarehouse_spark.plans.sampling import (
            WF_BUDGET_DEN,
            WF_BUDGET_NUM,
            waterfill_budget_allocation,
        )

        rng = random.Random(7)
        for trial in range(4):
            langs = [f"l{j}" for j in range(rng.randrange(2, 7))]
            rows, avail = [], {}
            for j, lg in enumerate(langs):
                n_tok = rng.randrange(1, 40)
                avail[lg] = n_tok
                rows.append((trial * 100 + j, " ".join(["t"] * n_tok), lg, "s"))
            d = str(tmp_path / f"sf{trial}")
            _write(_docs(spark, rows), d, "documents")
            out = (
                waterfill_budget_allocation(spark, d)
                .toPandas()
                .set_index("lang")
            )
            total = sum(avail.values())
            budget = WF_BUDGET_NUM * total // WF_BUDGET_DEN
            # hard invariants
            assert int(out["allocated"].sum()) == budget, (trial, avail)
            assert (out["allocated"] <= out["available"]).all()
            # max-min fairness: no uncapped language may receive less
            # than any capped language's allocation
            capped_alloc = out[out["capped"]]["allocated"]
            if len(capped_alloc):
                floor_cap = int(capped_alloc.min())
                uncapped = out[~out["capped"]]
                assert (uncapped["allocated"] <= floor_cap + 1).all(), (
                    trial,
                    avail,
                )
            # exact match against the independent pouring model
            model = self._model(avail, WF_BUDGET_NUM, WF_BUDGET_DEN)
            got = {lg: int(out.loc[lg]["allocated"]) for lg in avail}
            assert got == model, (trial, avail)


class TestMutualInformationAudit:
    def test_independent_and_dependent(self, spark, tmp_path):
        import datetime as dt
        import math

        from couchwarehouse_spark.plans.statistics import (
            mutual_information_audit,
        )

        d = str(tmp_path / "sf")

        def orders(rows):
            return spark.createDataFrame(
                [
                    (i, 1, pr, stat, dt.date(2024, 1, 1), 10.0)
                    for i, (pr, stat) in enumerate(rows)
                ],
                "o_orderkey long, o_custkey long, o_orderpriority string, "
                "o_orderstatus string, o_orderdate date, o_totalprice double",
            )

        # Independent: every (priority, status) combo equally likely.
        rows = [(p, s) for p in ("HI", "LO") for s in ("O", "F")] * 5
        _write(orders(rows), d, "orders")
        out = mutual_information_audit(spark, d).toPandas().iloc[0]
        assert out["mi_nats"] == 0.0
        # Perfectly dependent binary pair → MI = ln 2.
        rows = [("HI", "O")] * 10 + [("LO", "F")] * 10
        _write(orders(rows), d, "orders")
        out = mutual_information_audit(spark, d).toPandas().iloc[0]
        assert abs(out["mi_nats"] - round(math.log(2), 6)) < 1e-6


class TestFunctionalDependencyAudit:
    def test_true_and_violated_fd(self, spark, tmp_path):
        import datetime as dt

        from couchwarehouse_spark.plans.relational_extra import (
            functional_dependency_audit,
        )

        d = str(tmp_path / "sf")
        _write(spark.createDataFrame([(0, 0), (1, 0)], "n_nationkey long, n_regionkey long"), d, "nation")
        _write(spark.createDataFrame([(0, 0, "A"), (1, 1, "B")], "c_custkey long, c_nationkey long, c_mktsegment string"), d, "customer")
        _write(
            spark.createDataFrame(
                # priority HI maps to TWO statuses → 1 violating key of 2
                [(0, 0, "HI", "O", dt.date(2024, 1, 1), 1.0),
                 (1, 0, "HI", "F", dt.date(2024, 1, 1), 1.0),
                 (2, 0, "LO", "O", dt.date(2024, 1, 1), 1.0)],
                "o_orderkey long, o_custkey long, o_orderpriority string, o_orderstatus string, o_orderdate date, o_totalprice double",
            ),
            d,
            "orders",
        )
        _write(spark.createDataFrame([(0, "B1", "T1")], "p_partkey long, p_brand string, p_type string"), d, "part")
        out = functional_dependency_audit(spark, d).toPandas().set_index("fd")
        assert int(out.loc["nation->region"]["n_violating_keys"]) == 0
        row = out.loc["orderpriority->orderstatus"]
        assert (int(row["n_keys"]), int(row["n_violating_keys"])) == (2, 1)
        assert row["violation_rate"] == 0.5


class TestEventAutocorrelation:
    def test_alternating_series_lag_signs(self, spark, tmp_path):
        import datetime as dt

        from couchwarehouse_spark.plans.events_windows import (
            event_autocorrelation,
        )

        d = str(tmp_path / "sf")
        rows = []
        eid = 0
        # daily counts alternate 1,3,1,3,... over 10 days → ACF(1) = -1,
        # ACF(2) = +1 exactly.
        for day in range(1, 11):
            n = 1 if day % 2 else 3
            for k in range(n):
                rows.append((eid, dt.datetime(2024, 1, day, 8 + k), 1, "view", 1.0, "{}"))
                eid += 1
        _write(
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
            ),
            d,
            "events",
        )
        out = event_autocorrelation(spark, d).toPandas().set_index("lag")
        assert out.loc[1]["acf"] == -1.0
        assert out.loc[2]["acf"] == 1.0
        assert int(out.loc[1]["n_pairs"]) == 9


class TestCusumChangepointScan:
    def test_level_shift_found_at_break(self, spark, tmp_path):
        import datetime as dt

        from couchwarehouse_spark.plans.events_windows import (
            cusum_changepoint_scan,
        )

        d = str(tmp_path / "sf")
        rows, eid = [], 0
        # 1 event/day for days 1-6, then 5/day for days 7-12 →
        # |CUSUM| peaks at the last pre-break day (rank 6).
        for day in range(1, 13):
            for k in range(1 if day <= 6 else 5):
                rows.append((eid, dt.datetime(2024, 1, day, 8 + k), 1, "view", 1.0, "{}"))
                eid += 1
        _write(
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
            ),
            d,
            "events",
        )
        out = cusum_changepoint_scan(spark, d).toPandas().iloc[0]
        assert out["changepoint_day"] == "2024-01-06"
        assert int(out["changepoint_rank"]) == 6
        assert out["cusum_peak_share"] > 0.1


class TestAbtestTwoProportionZ:
    def test_planted_lift_z_by_hand(self, spark, tmp_path):
        import datetime as dt
        import math

        from couchwarehouse_spark.plans.statistics import (
            abtest_two_proportion_z,
        )

        d = str(tmp_path / "sf")
        rows, eid = [], 0
        t0 = dt.datetime(2024, 1, 1, 9)

        def user(u, purchases, views):
            nonlocal eid
            for _ in range(purchases):
                rows.append((eid, t0, u, "purchase", 1.0, "{}")); eid += 1
            for _ in range(views):
                rows.append((eid, t0, u, "view", 1.0, "{}")); eid += 1

        # A (even ids): 4 users, 3 convert. B (odd): 4 users, 1 converts.
        for u, conv in ((0, 1), (2, 1), (4, 1), (6, 0)):
            user(u, 2 if conv else 1, 1 if conv else 2)
        for u, conv in ((1, 1), (3, 0), (5, 0), (7, 0)):
            user(u, 2 if conv else 1, 1 if conv else 2)
        _write(
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
            ),
            d,
            "events",
        )
        out = abtest_two_proportion_z(spark, d).toPandas().iloc[0]
        assert (int(out["n_a"]), int(out["x_a"])) == (4, 3)
        assert (int(out["n_b"]), int(out["x_b"])) == (4, 1)
        pool = 4 / 8
        z = (0.75 - 0.25) / math.sqrt(pool * (1 - pool) * (1 / 4 + 1 / 4))
        assert abs(out["z_stat"] - round(z, 6)) < 1e-9


class TestChurnHazardTable:
    def test_life_table_by_hand(self, spark, tmp_path):
        import datetime as dt

        from couchwarehouse_spark.plans.events_windows import churn_hazard_table

        d = str(tmp_path / "sf")
        rows, eid = [], 0

        def user(u, days):
            nonlocal eid
            for dd in days:
                rows.append((eid, dt.datetime(2024, 1, dd, 9), u, "view", 1.0, "{}"))
                eid += 1

        # lifetimes: u1=0 (one day), u2=0, u3=2, u4=5
        user(1, [3]); user(2, [7]); user(3, [1, 3]); user(4, [2, 7])
        _write(
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
            ),
            d,
            "events",
        )
        out = churn_hazard_table(spark, d).toPandas().set_index("lifetime_days")
        assert (int(out.loc[0]["n_at_risk"]), int(out.loc[0]["n_ended"])) == (4, 2)
        assert out.loc[0]["hazard"] == 0.5
        assert (int(out.loc[2]["n_at_risk"]), int(out.loc[2]["n_ended"])) == (2, 1)
        assert (int(out.loc[5]["n_at_risk"]), int(out.loc[5]["n_ended"])) == (1, 1)
        assert out.loc[5]["hazard"] == 1.0


class TestEmbeddingDimStatsAudit:
    def test_planted_dims(self, spark, tmp_path):
        from couchwarehouse_spark.plans.similarity import (
            embedding_dim_stats_audit,
        )

        d = str(tmp_path / "sf")
        # dim0 constant 0.5 (variance 0), dim1 alternates ±1 (pop var 1,
        # mean 0); remaining dims zero.
        vecs = []
        for i in range(10):
            v = [0.5, 1.0 if i % 2 else -1.0] + [0.0] * 62
            vecs.append((i, v, 0))
        _write(
            spark.createDataFrame(
                vecs, "vec_id long, embedding array<float>, label int"
            ),
            d,
            "embeddings",
        )
        out = embedding_dim_stats_audit(spark, d).toPandas()
        top = out.iloc[0]
        assert int(top["dim"]) == 1
        assert top["pop_variance"] == 1.0
        assert top["mean_val"] == 0.0
        # dim0 appears with variance 0 and mean 0.5
        d0 = out[out["dim"] == 0]
        if len(d0):
            assert d0.iloc[0]["pop_variance"] == 0.0
            assert d0.iloc[0]["mean_val"] == 0.5


class TestRetrievalEvalNdcg:
    def test_perfect_and_partial_ranking(self, spark, tmp_path):
        import math

        from couchwarehouse_spark.plans.similarity import (
            EVAL_QUERY_MOD,
            retrieval_eval_ndcg,
        )

        d = str(tmp_path / "sf")
        # Query vec_id 0 (label 7): its only relevant neighbor (also
        # label 7) is planted as the EXACT same direction → rank 1 →
        # perfect nDCG 1.0. Ten orthogonal-ish fillers with other labels.
        assert EVAL_QUERY_MOD != 1
        base = [1.0] + [0.0] * 63
        rel = [0.9] + [0.1] * 63  # same direction-ish → top cosine
        rows = [(0, base, 7), (1, rel, 7)]
        for i in range(2, 12):
            v = [0.0] * 64
            v[i] = 1.0
            rows.append((i, v, i % 5 + 10))
        _write(
            spark.createDataFrame(
                [(i, [float(x) for x in v], l) for i, v, l in rows],
                "vec_id long, embedding array<float>, label int",
            ),
            d,
            "embeddings",
        )
        out = retrieval_eval_ndcg(spark, d).toPandas().set_index("label")
        assert out.loc[7]["ndcg_at_10"] == 1.0


class TestLDiversityAudit:
    def test_homogeneous_class_flagged(self, spark, tmp_path):
        import datetime as dt

        from couchwarehouse_spark.plans.curation import l_diversity_audit

        d = str(tmp_path / "sf")
        rows = []
        # class (view, 9h): 3 users, all value band 0 → l=1, at risk.
        for i, u in enumerate((1, 2, 3)):
            rows.append((i, dt.datetime(2024, 1, 1, 9), u, "view", 10.0, "{}"))
        # class (click, 10h): 2 users, bands 0/1/2 → l=3, safe.
        rows.append((10, dt.datetime(2024, 1, 1, 10), 4, "click", 10.0, "{}"))
        rows.append((11, dt.datetime(2024, 1, 1, 10), 5, "click", 60.0, "{}"))
        rows.append((12, dt.datetime(2024, 1, 1, 10), 5, "click", 110.0, "{}"))
        _write(
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
            ),
            d,
            "events",
        )
        out = l_diversity_audit(spark, d).toPandas().iloc[0]
        assert int(out["n_classes"]) == 2
        assert int(out["n_below_l"]) == 1
        assert int(out["min_l"]) == 1
        assert out["users_at_risk_share"] == 0.6  # 3 of 5 users


class TestTheilSenTrend:
    def test_outlier_resistant_slope(self, spark, tmp_path):
        import datetime as dt

        from couchwarehouse_spark.plans.statistics import theil_sen_trend

        d = str(tmp_path / "sf")
        rows, eid = [], 0
        # counts 1,2,3,4,50,6,7 — an outlier day 5; TS slope stays 1.
        for day, n in enumerate([1, 2, 3, 4, 50, 6, 7], start=1):
            for k in range(n):
                rows.append((eid, dt.datetime(2024, 1, day, 8, k % 60), 1, "view", 1.0, "{}"))
                eid += 1
        _write(
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
            ),
            d,
            "events",
        )
        out = theil_sen_trend(spark, d).toPandas().iloc[0]
        assert int(out["n_pairs"]) == 21
        assert out["slope_per_day"] == 1.0  # the median slope ignores day 5


class TestSeasonalNaiveBacktest:
    def test_perfect_weekly_cycle_scores_zero(self, spark, tmp_path):
        import datetime as dt

        from couchwarehouse_spark.plans.events_windows import (
            seasonal_naive_backtest,
        )

        d = str(tmp_path / "sf")
        rows, eid = [], 0
        # A perfect 7-day cycle over 21 days → seasonal-naive is exact
        # on the 14 scored days: MAE = MAPE = 0.
        cycle = [1, 2, 3, 4, 5, 2, 1]
        for day in range(1, 22):
            for k in range(cycle[(day - 1) % 7]):
                rows.append((eid, dt.datetime(2024, 1, day, 8, k), 1, "view", 1.0, "{}"))
                eid += 1
        _write(
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
            ),
            d,
            "events",
        )
        out = seasonal_naive_backtest(spark, d).toPandas().iloc[0]
        assert int(out["n_days"]) == 14
        assert out["mae"] == 0.0
        assert out["mape"] == 0.0
        assert int(out["worst_abs_error"]) == 0


class TestShrunkRateEstimates:
    def test_small_groups_shrink_more(self, spark, tmp_path):
        import datetime as dt

        from couchwarehouse_spark.plans.statistics import shrunk_rate_estimates

        d = str(tmp_path / "sf")
        rows, eid = [], 0

        def grp(et, n, x):
            nonlocal eid
            for i in range(n):
                v = 60.0 if i < x else 10.0
                rows.append((eid, dt.datetime(2024, 1, 1, 9), 1, et, v, "{}"))
                eid += 1

        grp("big", 200, 100)   # rate 0.5, huge n
        grp("smallhi", 4, 4)   # rate 1.0, tiny n
        grp("smalllo", 4, 0)   # rate 0.0, tiny n
        _write(
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
            ),
            d,
            "events",
        )
        out = shrunk_rate_estimates(spark, d).toPandas().set_index("event_type")
        # shrunk values pull toward the grand mean of rates (0.5), and
        # the big group's barely moves
        assert abs(out.loc["big"]["shrunk_rate"] - 0.5) < 0.05
        assert out.loc["smallhi"]["shrunk_rate"] < out.loc["smallhi"]["raw_rate"]
        assert out.loc["smalllo"]["shrunk_rate"] > out.loc["smalllo"]["raw_rate"]
        # shrinkage moved the small groups strictly more than the big one
        move_big = abs(out.loc["big"]["shrunk_rate"] - out.loc["big"]["raw_rate"])
        move_small = abs(
            out.loc["smallhi"]["shrunk_rate"] - out.loc["smallhi"]["raw_rate"]
        )
        assert move_small > move_big


class TestDbscanCoreCensus:
    def test_dense_cluster_vs_isolated(self, spark, tmp_path):
        from couchwarehouse_spark.plans.similarity import dbscan_core_census

        d = str(tmp_path / "sf")
        # 5 near-identical vectors (label 1) → each has 4 neighbors at
        # cosine ≈ 1 → all core. One orthogonal point (label 2) →
        # isolated (different bucket or cosine ≈ 0 < 0.55 anyway).
        rows = []
        for i in range(5):
            v = [1.0] + [0.001 * i] + [0.0] * 62
            rows.append((i, v, 1))
        v2 = [0.0] * 64
        v2[5] = 1.0
        rows.append((9, v2, 2))
        _write(
            spark.createDataFrame(
                [(i, [float(x) for x in v], l) for i, v, l in rows],
                "vec_id long, embedding array<float>, label int",
            ),
            d,
            "embeddings",
        )
        out = dbscan_core_census(spark, d).toPandas().set_index("label")
        assert int(out.loc[1]["n_core"]) == 5
        assert int(out.loc[2]["n_isolated"]) == 1


class TestSimpsonsParadoxScan:
    def test_planted_reversal_detected(self, spark, tmp_path):
        import datetime as dt

        from couchwarehouse_spark.plans.relational_extra import (
            SPX_CUT,
            simpsons_paradox_scan,
        )

        d = str(tmp_path / "sf")
        hi, lo = SPX_CUT + 1000, SPX_CUT - 1000
        _write(
            spark.createDataFrame(
                [(1, "SEG_A"), (2, "SEG_B")],
                "c_custkey long, c_mktsegment string",
            ),
            d,
            "customer",
        )
        rows = []
        okey = 0

        def orders(cust, urgent, n, x):
            nonlocal okey
            for i in range(n):
                rows.append(
                    (okey, cust, "1-URGENT" if urgent else "3-MEDIUM",
                     "O", dt.date(2024, 1, 1), hi if i < x else lo)
                )
                okey += 1

        # Classic reversal: within EACH segment urgent is WORSE, but
        # urgent concentrates in the high-rate segment so the pooled
        # direction says urgent is better.
        orders(1, True, 80, 60)    # A urgent: 75%
        orders(1, False, 10, 8)    # A other: 80%  (urgent worse in A)
        orders(2, True, 10, 1)     # B urgent: 10%
        orders(2, False, 80, 16)   # B other: 20%  (urgent worse in B)
        _write(
            spark.createDataFrame(
                rows,
                "o_orderkey long, o_custkey long, o_orderpriority string, "
                "o_orderstatus string, o_orderdate date, o_totalprice double",
            ),
            d,
            "orders",
        )
        out = simpsons_paradox_scan(spark, d).toPandas().set_index("seg")
        # pooled: urgent 61/90 ≈ .678 vs other 24/90 ≈ .267 → urgent better
        # but BOTH strata say urgent worse → both disagree.
        assert bool(out.loc["SEG_A"]["urgent_better_here"]) is False
        assert bool(out.loc["SEG_B"]["urgent_better_here"]) is False
        assert bool(out.loc["SEG_A"]["agrees_with_aggregate"]) is False
        assert bool(out.loc["SEG_B"]["agrees_with_aggregate"]) is False


class TestPsiDriftAudit:
    def test_aa_reading_near_zero_and_bins_complete(self, spark, tmp_path):
        from couchwarehouse_spark.plans.sampling import _hash_bucket  # noqa: F401
        from couchwarehouse_spark.plans.statistics import psi_drift_audit

        d = str(tmp_path / "sf")
        # 400 docs with lengths spread 1..400: the 80/20 md5 gates draw
        # from the same distribution → PSI should read ~0 (A/A).
        rows = [(i, "x" * (i + 1), "en", "s") for i in range(400)]
        _write(_docs(spark, rows), d, "documents")
        out = psi_drift_audit(spark, d).toPandas().iloc[0]
        assert int(out["n_ref"]) + int(out["n_cur"]) == 400
        assert int(out["n_bins"]) >= 9
        assert abs(out["psi"]) < 0.25  # A/A: well under the act threshold


class TestKendallTauRankCorr:
    def test_perfect_and_reversed_agreement(self, spark, tmp_path):
        from couchwarehouse_spark.plans.statistics import (
            KT_MOD,
            kendall_tau_rank_corr,
        )

        d = str(tmp_path / "sf")
        # sampled ids (multiples of KT_MOD): token count rises WITH
        # char count → tau_a = 1.
        rows = [
            (i * KT_MOD, "t " * (i + 1) + "t", "en", "s") for i in range(6)
        ]
        _write(_docs(spark, rows), d, "documents")
        out = kendall_tau_rank_corr(spark, d).toPandas().iloc[0]
        assert int(out["n_pairs"]) == 15
        assert out["tau_a"] == 1.0
        # reversed: more tokens but strictly FEWER total chars
        # (token width falls faster than count rises) → tau_a = -1.
        rows = []
        widths = [100, 40, 25, 17, 12]  # totals: 100, 81, 77, 71, 64
        for i, w in enumerate(widths):
            rows.append((i * KT_MOD, " ".join(["x" * w] * (i + 1)), "en", "s"))
        _write(_docs(spark, rows), d, "documents")
        out = kendall_tau_rank_corr(spark, d).toPandas().iloc[0]
        assert out["tau_a"] == -1.0


class TestSqlUdfFunctions:
    def test_inlines_into_codegen_no_python(self, spark, tmp_path):
        """SQL UDFs must inline: no Python eval nodes; the plan is the
        same partial-aggregated scan as hand-written expressions."""
        from couchwarehouse_spark.plans.scalar import sql_udf_functions

        df = sql_udf_functions(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "partial_sum" in plan
        out = {r["l_returnflag"]: r for r in df.collect()}
        assert set(out) == {"A", "N", "R"}
