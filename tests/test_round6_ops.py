"""Planted-fixture golden tests for the round-6 operators.

The oracle lane (tests/t2_sim.py + driver) proves Spark ≡ DuckDB on
the synthetic corpus; these prove both are RIGHT, on hand-built inputs
whose correct output is known by construction (SURVEY.md §5).
"""

from __future__ import annotations

import datetime as dt
import math
import os


def _write(df, sf_dir: str, name: str) -> None:
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{sf_dir}/{name}.parquet")


def _docs(spark, rows, langs=None):
    langs = langs or ["en"] * len(rows)
    return spark.createDataFrame(
        [(i, t, langs[i], "src0", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


class TestSparseCosinePairs:
    def _run(self, spark, tmp_path, texts):
        from couchwarehouse_spark.plans.dedup import sparse_cosine_pairs

        d = str(tmp_path / "sf")
        _write(_docs(spark, texts), d, "documents")
        return sparse_cosine_pairs(spark, d).toPandas()

    def test_identical_docs_cosine_one(self, spark, tmp_path):
        out = self._run(
            spark,
            tmp_path,
            ["a b c a b c", "a b c a b c", "x y z w v u"],
        )
        assert len(out) == 1
        row = out.iloc[0]
        assert (row["doc_id_1"], row["doc_id_2"]) == (0, 1)
        assert row["cos_sim"] == 1.0

    def test_half_overlap_hits_boundary_inclusive(self, spark, tmp_path):
        """Docs sharing exactly one of two unit-tf shingles have
        cos = 1/sqrt(2·2) = 0.5 — ON the ≥ 0.5 boundary, which the
        integer predicate 4·dot² ≥ n1·n2 keeps exactly."""
        out = self._run(spark, tmp_path, ["a b c d", "a b c e"])
        assert len(out) == 1
        assert out.iloc[0]["cos_sim"] == 0.5

    def test_below_threshold_excluded(self, spark, tmp_path):
        """One shared shingle of three per doc: cos = 1/3 < 0.5."""
        out = self._run(spark, tmp_path, ["a b c d e", "a b c x y"])
        assert len(out) == 0

    def test_repetition_raises_similarity_vs_jaccard(self, spark, tmp_path):
        """tf-cosine sees multiplicity: a doc that repeats the shared
        span scores the boilerplate pair ABOVE the set-overlap level.
        doc0 = span once + filler, doc1 = span 3×: the dot rides the
        repeated counts. Expected cosine computed by hand below."""
        span = "s1 s2 s3"  # one shingle when repeated via spacing
        out = self._run(
            spark,
            tmp_path,
            [f"{span} f1 f2 f3", f"{span} {span} {span}"],
        )
        # doc0 shingles: (s1 s2 s3),(s2 s3 f1),(s3 f1 f2),(f1 f2 f3) all tf1 → n2=4
        # doc1: 9 tokens → 7 shingles: s1s2s3 ×3? positions:
        #   [s1 s2 s3 s1 s2 s3 s1 s2 s3] → shingles at 1..7:
        #   (s1 s2 s3)×3, (s2 s3 s1)×2, (s3 s1 s2)×2 → n2 = 9+4+4 = 17
        # dot = tf0(s1s2s3)=1 × tf1=3 = 3; cos = 3/sqrt(4·17) = 0.363…
        # < 0.5 → excluded; but with doc0's filler dropped:
        assert len(out) == 0
        out2 = self._run(spark, tmp_path, [span + " f1", f"{span} {span} {span}"])
        # doc0: shingles (s1 s2 s3),(s2 s3 f1) → n2=2
        # dot = 1·3 = 3 → cos = 3/sqrt(2·17) = 0.514… ≥ 0.5 → kept
        assert len(out2) == 1
        assert abs(out2.iloc[0]["cos_sim"] - 3 / math.sqrt(2 * 17)) < 1e-6


class TestPointInTimeFeatures:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )

    def _run(self, spark, tmp_path, rows):
        from couchwarehouse_spark.plans.events_windows import (
            point_in_time_features,
        )

        d = str(tmp_path / "sf")
        _write(self._events(spark, rows), d, "events")
        out = point_in_time_features(spark, d).toPandas()
        return out.set_index("event_id").sort_index()

    def test_trailing_window_counts_prior_events_only(self, spark, tmp_path):
        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        h = dt.timedelta(hours=1)
        rows = [
            (1, t0, 7, "view", 1.0, "{}"),
            (2, t0 + h, 7, "click", 2.0, "{}"),
            (3, t0 + 2 * h, 7, "purchase", 10.0, "{}"),
            # 26h later: the view/click above fall outside 24h
            (4, t0 + 28 * h, 7, "purchase", 5.0, "{}"),
        ]
        out = self._run(spark, tmp_path, rows)
        assert out.loc[3, "n_views_24h"] == 1
        assert out.loc[3, "n_clicks_24h"] == 1
        assert out.loc[3, "sum_value_24h"] == 3.0
        # the earlier purchase (t0+2h) is 26h before event 4 → excluded
        assert out.loc[4, "n_views_24h"] == 0
        assert out.loc[4, "n_clicks_24h"] == 0
        assert out.loc[4, "sum_value_24h"] == 0.0

    def test_same_instant_event_excluded_no_leakage(self, spark, tmp_path):
        """An event at the label's EXACT timestamp must not leak into
        the features (frame ends 1 µs before the label)."""
        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            (1, t0, 7, "view", 1.0, "{}"),
            (2, t0, 7, "purchase", 10.0, "{}"),
            (3, t0 - dt.timedelta(microseconds=1), 7, "click", 1.0, "{}"),
        ]
        out = self._run(spark, tmp_path, rows)
        assert out.loc[2, "n_views_24h"] == 0  # same-instant view excluded
        assert out.loc[2, "n_clicks_24h"] == 1  # 1 µs earlier click included

    def test_users_isolated(self, spark, tmp_path):
        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            (1, t0, 7, "view", 1.0, "{}"),
            (2, t0 + dt.timedelta(hours=1), 8, "purchase", 5.0, "{}"),
        ]
        out = self._run(spark, tmp_path, rows)
        assert out.loc[2, "n_views_24h"] == 0


class TestKeySkewAudit:
    def test_gini_on_planted_distribution(self, spark, tmp_path):
        """event_type counts {A:1, B:3}: sorted [1,3], n=2, total=4 →
        gini = ((2·1−3)·1 + (2·2−3)·3) / (2·4) = 0.25; top1 = 0.75."""
        from couchwarehouse_spark.plans.skew_plan import key_skew_audit

        t0 = dt.datetime(2024, 1, 1)
        rows = [(i, t0, i % 2, "B" if i else "A", 0.0, "{}") for i in range(4)]
        d = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                rows, "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string"
            ),
            d,
            "events",
        )
        out = key_skew_audit(spark, d).toPandas().set_index("key_col")
        et = out.loc["event_type"]
        assert et["n_keys"] == 2 and et["n_rows"] == 4 and et["max_rows"] == 3
        assert et["top1_share"] == 0.75
        assert et["gini"] == 0.25
        # user_id is perfectly even {0:2, 1:2} → gini 0
        assert out.loc["user_id", "gini"] == 0.0


class TestTemperatureSamplingWeights:
    def test_planted_two_lang_mixture(self, spark, tmp_path):
        from couchwarehouse_spark.plans.sampling import (
            temperature_sampling_weights,
        )

        texts = ["t"] * 5
        langs = ["lo"] + ["hi"] * 4  # p = 0.2 / 0.8
        d = str(tmp_path / "sf")
        _write(_docs(spark, texts, langs), d, "documents")
        out = (
            temperature_sampling_weights(spark, d).toPandas().set_index("lang")
        )
        z = math.sqrt(0.2) + math.sqrt(0.8)
        assert abs(out.loc["lo", "w_temp"] - math.sqrt(0.2) / z) < 1e-6
        assert abs(out.loc["hi", "w_temp"] - math.sqrt(0.8) / z) < 1e-6
        assert out.loc["lo", "boost"] > 1 > out.loc["hi", "boost"]
        # weights sum to 1 (within rounding)
        assert abs(out["w_temp"].sum() - 1.0) < 1e-5


class TestBigramSurprisal:
    def test_hand_computed_lm(self, spark, tmp_path):
        """Corpus 'a b a b' + 'a b c': c(ab)=3, c(ba)=1, c(bc)=1,
        c1(a)=3, c1(b)=2 → doc0 avg = −(ln1+ln½+ln1)/3, doc1 avg =
        −(ln1+ln½)/2; doc1 ranks first."""
        from couchwarehouse_spark.plans.text import bigram_surprisal_scores

        d = str(tmp_path / "sf")
        _write(_docs(spark, ["a b a b", "a b c"]), d, "documents")
        out = bigram_surprisal_scores(spark, d).toPandas()
        assert list(out["doc_id"]) == [1, 0]
        assert abs(out.iloc[0]["avg_surprisal"] - (-math.log(0.5)) / 2) < 1e-6
        assert abs(out.iloc[1]["avg_surprisal"] - (-math.log(0.5)) / 3) < 1e-6


class TestPQQuantizationAudit:
    def test_vectors_at_centroids_have_zero_distortion(self, spark, tmp_path):
        """Two labels whose members all equal one vector: centroids
        coincide with the members, every subvector codes to its own
        label with distance 0."""
        from couchwarehouse_spark.plans.similarity import (
            PQ_M,
            pq_quantization_audit,
        )

        v0 = [1.0] * 64
        v1 = [0.0] * 32 + [2.0] * 32
        rows = [(i, v0, 0) for i in range(3)] + [(i + 3, v1, 1) for i in range(3)]
        d = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                rows, "vec_id long, embedding array<float>, label int"
            ),
            d,
            "embeddings",
        )
        out = pq_quantization_audit(spark, d).toPandas()
        assert len(out) == 2 * PQ_M  # both cells occupied in all subspaces
        assert (out["n_assigned"] == 3).all()
        assert (out["n_label_match"] == 3).all()
        assert (out["avg_dist"] == 0.0).all()


class TestRetrievalEvalMrr:
    def test_first_relevant_at_rank_one(self, spark, tmp_path):
        """Query id 0 (label 0); its nearest neighbor shares the label
        → MRR = 1; one relevant doc in top-10 → precision = 0.1."""
        from couchwarehouse_spark.plans.similarity import retrieval_eval_mrr

        e0 = [1.0] + [0.0] * 63
        e_near = [0.9] + [0.1] + [0.0] * 62
        e_far = [0.0] * 62 + [1.0, 1.0]
        rows = [(0, e0, 0), (1, e_near, 0), (2, e_far, 1), (3, e_far, 1)]
        d = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                rows, "vec_id long, embedding array<float>, label int"
            ),
            d,
            "embeddings",
        )
        out = retrieval_eval_mrr(spark, d).toPandas().set_index("label")
        assert out.loc[0, "n_queries"] == 1
        assert out.loc[0, "mrr_at_10"] == 1.0
        assert out.loc[0, "precision_at_10"] == 0.1


class TestRollingActiveUsers:
    def test_planted_wau_window(self, spark, tmp_path):
        """User 1 active on day 1 only; user 2 on days 1 and 9.
        Day 1: DAU {1,2}; day 7 window [1..7] still holds both; day 8
        window [2..8] holds nobody... (no events) — day 8 has no
        window row only if no contribution; user 1's day-1 activity
        contributes to days 1-7, user 2's day-9 to days 9-15 capped at
        max day 9."""
        from couchwarehouse_spark.plans.events_windows import (
            rolling_active_users,
        )

        t = dt.datetime(2024, 3, 1, 10, 0, 0)
        rows = [
            (1, t, 1, "view", 0.0, "{}"),
            (2, t, 2, "click", 0.0, "{}"),
            (3, t + dt.timedelta(days=8), 2, "view", 0.0, "{}"),
        ]
        d = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                rows, "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string"
            ),
            d,
            "events",
        )
        out = rolling_active_users(spark, d).toPandas().set_index("day")
        assert out.loc["2024-03-01", "dau"] == 2
        assert out.loc["2024-03-01", "wau"] == 2
        assert out.loc["2024-03-01", "stickiness"] == 1.0
        # days 2-7: both users still inside the trailing window, dau 0
        assert out.loc["2024-03-07", "wau"] == 2
        assert out.loc["2024-03-07", "dau"] == 0
        # day 8: nobody active in [day2..day8] → no row at all
        assert "2024-03-08" not in out.index
        assert out.loc["2024-03-09", "wau"] == 1
        assert out.loc["2024-03-09", "dau"] == 1


class TestCooccurrencePmiPairs:
    def test_planted_association(self, spark, tmp_path):
        """Parts 10+20 co-occur in 3 of 4 orders; each appears in 3
        orders alone → PMI = ln(3·4/(3·3)) = ln(4/3). A pair below the
        support floor never appears."""
        import math

        from couchwarehouse_spark.plans.statistics import (
            cooccurrence_pmi_pairs,
        )

        rows = []
        ln = 0
        for ok in range(1, 4):  # orders 1-3: {10, 20}
            for pk in (10, 20):
                ln += 1
                rows.append((ok, pk, ln))
        rows.append((4, 30, ln + 1))  # order 4: {30} alone
        rows.append((4, 40, ln + 2))  # pair (30,40) support 1 < floor
        d = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                [
                    (ok, pk, 1, n, 1.0, 1.0, 0.0, 0.0, "N", "O",
                     dt.datetime(2024, 1, 1))
                    for ok, pk, n in rows
                ],
                "l_orderkey long, l_partkey long, l_suppkey long, "
                "l_linenumber int, l_quantity double, l_extendedprice double, "
                "l_discount double, l_tax double, l_returnflag string, "
                "l_linestatus string, l_shipdate timestamp",
            ),
            d,
            "lineitem",
        )
        out = cooccurrence_pmi_pairs(spark, d).toPandas()
        assert len(out) == 1
        row = out.iloc[0]
        assert (row["part_a"], row["part_b"], row["c_ab"]) == (10, 20, 3)
        assert abs(row["pmi"] - math.log(4 / 3)) < 1e-6


class TestSparseCosineRandomizedModel:
    def test_matches_pure_python_model(self, spark, tmp_path):
        """Randomized-corpus equivalence: an independent pure-Python
        tf-cosine implementation must produce exactly the same pair
        set and (rounded) similarities — the duplicate_ngram_removal
        test strategy applied to the newest dedup operator."""
        import random
        from collections import Counter

        from couchwarehouse_spark.plans.dedup import sparse_cosine_pairs

        rng = random.Random(1234)
        vocab = [f"w{i}" for i in range(12)]  # small vocab → real overlap
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
            for _ in range(40)
        ]

        def shingles(text):
            toks = text.split(" ")
            if len(toks) < 3:
                return None
            return Counter(
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            )

        tf = {i: s for i, t in enumerate(texts) if (s := shingles(t))}
        expected = {}
        ids = sorted(tf)
        for a in ids:
            for b in ids:
                if a >= b:
                    continue
                dot = sum(tf[a][g] * tf[b][g] for g in tf[a] if g in tf[b])
                n1 = sum(v * v for v in tf[a].values())
                n2 = sum(v * v for v in tf[b].values())
                if 4 * dot * dot >= n1 * n2 and dot > 0:
                    expected[(a, b)] = round(dot / math.sqrt(n1 * n2), 6)

        d = str(tmp_path / "sf")
        _write(_docs(spark, texts), d, "documents")
        out = sparse_cosine_pairs(spark, d).toPandas()
        got = {
            (int(r["doc_id_1"]), int(r["doc_id_2"])): round(r["cos_sim"], 6)
            for _, r in out.iterrows()
        }
        assert got == expected
