"""Planted-fixture golden tests for round 7.

Covers: the DF_CAP stop-shingle filter wired into the inverted-index
pair generators (a planted viral shingle whose df exceeds the cap
must generate NO pairs while cold-vocabulary near-dups still pair,
and df == cap is kept — strict >); the sub-second microsecond e2e
through the real warehouse; the four r06-advice fixes; and hand-built
goldens for every operator added this round (KN scoring, G²
collocations, leakage matrix, band tuning, positional drift, centroid
shift, Good-Turing, CDC chunking, MinHash error, cluster source mix,
quantile map, threshold sweep, split balance, bootstrap CI,
Levenshtein near-dup, magic-byte router, sweep-line concurrency,
common-neighbor link prediction). The oracle lane proves
Spark ≡ DuckDB; these prove both are RIGHT on inputs whose correct
output is known by construction (SURVEY.md §5)."""

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


class TestSubsecondWarehouseE2E:
    def test_microseconds_survive_ingest_merge_window(self, spark, tmp_path):
        """Sub-second event feed through the REAL warehouse (strict
        declared schema → spool → latest-wins merge → second merge
        batch → window): a 3600.5 s gap debounces into TWO bursts
        while a 3599.5 s gap stays ONE — only microsecond-exact
        arithmetic end-to-end can tell them apart (whole-second
        unix_timestamp reads both as 3600 or 3599). VERDICT r06 ask #6:
        the shared events.parquet is whole-second, so this lane is the
        sub-second coverage."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from couchwarehouse_spark.plans.events_windows import (
            DEBOUNCE_GAP_SECONDS,
        )
        from couchwarehouse_spark.warehouse import Warehouse

        from .fixtures import envelope, write_feed

        def ev(i, user, ts):
            return {
                "_id": f"ev{i:04d}",
                "_rev": "1-x",
                "user_id": user,
                "event_type": "click",
                "ts": ts,
            }

        t0 = "2024-01-01T00:00:00.250000"
        within = "2024-01-01T00:59:59.750000"  # +3599.5 s from t0
        beyond = "2024-01-01T01:00:00.750000"  # +3600.5 s from t0
        wh = Warehouse(
            spark, str(tmp_path / "wh"), "subsec", n_buckets=2,
            feed_schema=(
                "_id string, _rev string, user_id bigint, "
                "event_type string, ts string"
            ),
        )
        wh.spool(write_feed(str(tmp_path / "f1.jsonl"), [
            envelope(1, ev(1, 1, t0)),
            envelope(2, ev(2, 1, within)),
            envelope(3, ev(3, 2, t0)),
        ]))
        # Second batch = second MERGE cycle: user 2's far event plus an
        # amendment of ev0001 (same ts, higher seq) — microseconds must
        # survive the latest-wins rewrite too.
        amended = ev(1, 1, t0)
        amended["_rev"] = "2-y"
        wh.spool(write_feed(str(tmp_path / "f2.jsonl"), [
            envelope(4, ev(4, 2, beyond)),
            envelope(5, amended),
        ]))

        # CouchDB docs carry timestamps as ISO TEXT (the reference's
        # boolean/number/string logical types — _logical_of); the
        # warehouse must preserve the FULL fractional string through
        # both merges, and the window lane casts exactly like
        # event_debounce does.
        t = wh.table().withColumn("ts", F.col("ts").cast("timestamp"))
        # Microseconds intact after two merges: exact gap values.
        w = Window.partitionBy("user_id").orderBy("ts", "id")
        gaps = (
            t.select(
                "user_id",
                (
                    F.unix_micros("ts")
                    - F.unix_micros(F.lag("ts").over(w))
                ).alias("gap_us"),
            )
            .filter(F.col("gap_us").isNotNull())
            .collect()
        )
        got = {r["user_id"]: r["gap_us"] for r in gaps}
        assert got == {1: 3_599_500_000, 2: 3_600_500_000}
        # The debounce head rule (the event_debounce expression) splits
        # user 2 into two bursts and keeps user 1 in one.
        heads = t.select(
            "user_id",
            F.when(
                F.lag("ts").over(w).isNull()
                | (
                    F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                    > DEBOUNCE_GAP_SECONDS * 1_000_000
                ),
                1,
            ).otherwise(0).alias("h"),
        )
        kept = {
            r["user_id"]: r["n"]
            for r in heads.groupBy("user_id").agg(F.sum("h").alias("n")).collect()
        }
        assert kept == {1: 1, 2: 2}


class TestAdviceR06Fixes:
    """The four ADVICE r06 items: merge_into ghost-delete counting,
    quarantine schema mixing, --update-where per-type skip, and
    webdataset duplicate-key fail-fast."""

    def test_merge_into_ghost_delete_not_counted(self, spark, tmp_path):
        """A tombstone for an id absent from the table is a no-op and
        must NOT inflate the rows-applied count."""
        from couchwarehouse_spark.warehouse import Warehouse

        from .fixtures import person_feed

        feed = person_feed(str(tmp_path / "feed.jsonl"), n=5)
        wh = Warehouse(spark, str(tmp_path / "wh"), "ghostdel", n_buckets=2)
        wh.spool(feed)
        inc = spark.createDataFrame(
            [
                ("person0001", None, True),  # exists → counted
                ("nosuchdoc", None, True),  # ghost → NOT counted
                ("person0002", "Renamed", False),  # live upsert
            ],
            "id string, name string, gone boolean",
        )
        assert wh.merge_into(inc, delete_col="gone") == 2
        assert wh.table().count() == 4  # 5 - 1 real delete

    def test_quarantine_mixed_origins_share_one_schema(self, spark, tmp_path):
        """Feed-batch offenders and update_where offenders land in the
        SAME dead-letter schema (no internal _cw_bucket column), so
        quarantined() reads both without silently dropping columns."""
        import random

        from couchwarehouse_spark.warehouse import Warehouse

        from .fixtures import envelope, order_doc, write_feed

        rng = random.Random(7)
        wh = Warehouse(
            spark, str(tmp_path / "wh"), "qmix", n_buckets=2,
            constraint_mode="quarantine",
        )
        wh.spool(write_feed(
            str(tmp_path / "f1.jsonl"),
            [envelope(i + 1, order_doc(i, rng)) for i in range(4)],
        ))
        wh.add_constraint("total_cap", "total <= 1000")
        # Origin 1: a feed batch with one violating row.
        bad = order_doc(99, rng)
        bad["total"] = 5000.0
        wh.spool(write_feed(str(tmp_path / "f2.jsonl"), [envelope(10, bad)]))
        # Origin 2: an update_where that drives rows over the cap.
        wh.update_where("total > 0", {"total": "total + 2000"})
        q = wh.quarantined()
        assert not any(c.startswith("_cw_") for c in q.columns)
        rows = q.collect()
        assert len(rows) >= 2  # both origins present
        assert all(r["total"] is not None for r in rows)  # column survived

    def test_cli_update_where_skips_type_missing_predicate_column(
        self, spark, tmp_path, capsys
    ):
        """A predicate referencing a column absent from one doc type
        skips that type (like --delete-where) instead of aborting the
        CLI after earlier types already updated."""
        import random

        from couchwarehouse_spark.cli import main

        from .fixtures import envelope, order_doc, person_doc, write_feed

        rng = random.Random(3)
        docs = [envelope(i + 1, person_doc(i, rng)) for i in range(3)] + [
            envelope(10 + i, order_doc(i, rng)) for i in range(3)
        ]
        feed = write_feed(str(tmp_path / "feed.jsonl"), docs)
        rc = main([
            "--feed", feed,
            "--database", "skipdb",
            "--warehouse-dir", str(tmp_path / "wh"),
            "--split", "type",
            "--reset",
            # 'status' exists on orders only; person types must skip,
            # not abort. The assignment column 'total' gates person
            # out via the column check, but the predicate-only column
            # is the abort path this guards.
            "--update-where", "status = 'paid'::total=total + 1",
        ])
        assert rc == 0
        err = capsys.readouterr().err
        assert "skipped" not in err or "update-where" in err

    def test_webdataset_duplicate_keys_fail_fast(self, spark, tmp_path):
        """Duplicate key values must raise at export time, not surface
        later as a verify_webdataset mismatch; no shards are written."""
        import os as _os

        import pytest

        from couchwarehouse_spark.sinks.webdataset_export import export_webdataset

        df = spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "c")], "doc_id long, text string"
        )
        out = str(tmp_path / "wds")
        with pytest.raises(ValueError, match="duplicate"):
            export_webdataset(df, out, key="doc_id", text_col="text", n_shards=2)
        assert not [f for f in _os.listdir(out) if f.endswith(".tar")]


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


def _emb(spark, rows):
    """rows: list of (vec_id, embedding(list[float]), label)."""
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


class TestRound7NewOps:
    def test_cross_source_leakage_exact_matrix(self, spark, tmp_path):
        """s0 and s1 share one identical doc; s2 is disjoint → exactly
        the two directional rows, one doc / one fingerprint each."""
        from couchwarehouse_spark.plans.dedup import cross_source_leakage_matrix

        d = str(tmp_path / "sf")
        _write(
            _docs(spark, [
                (0, "shared text body here", "en", "s0"),
                (1, "shared text body here", "en", "s1"),
                (2, "unique s0 only words", "en", "s0"),
                (3, "totally different corpus", "en", "s2"),
            ]),
            d, "documents",
        )
        out = cross_source_leakage_matrix(spark, d).toPandas()
        got = {
            (r["source"], r["other_source"]):
                (r["shared_fingerprints"], r["leaked_docs"])
            for _, r in out.iterrows()
        }
        assert got == {("s0", "s1"): (1, 1), ("s1", "s0"): (1, 1)}

    def test_lsh_band_tuning_identical_docs_mass(self, spark, tmp_path):
        """3 identical docs share every signature lane → every config
        puts them in one bucket per band: candidate_mass = bands·C(3,2),
        max_bucket = 3; the lone distinct doc adds singletons only."""
        from couchwarehouse_spark.plans.dedup import lsh_band_tuning_audit

        d = str(tmp_path / "sf")
        _write(
            _docs(spark, [
                (0, "p q r s t", "en", "s0"),
                (1, "p q r s t", "en", "s0"),
                (2, "p q r s t", "en", "s0"),
                (3, "x y z w v", "en", "s0"),
            ]),
            d, "documents",
        )
        out = lsh_band_tuning_audit(spark, d).toPandas()
        assert len(out) == 4
        for _, r in out.iterrows():
            assert r["candidate_mass"] == r["bands"] * 3
            assert r["max_bucket"] == 3
            assert r["bands"] * r["rows_per_band"] == 16

    def test_positional_template_header_decile(self, spark, tmp_path):
        """A constant header token makes decile 0's type/token ratio
        collapse while organic deciles stay 1.0."""
        from couchwarehouse_spark.plans.text import positional_template_drift

        d = str(tmp_path / "sf")
        rows = [
            (i, "hdr " + " ".join(f"u{i}w{j}" for j in range(9)), "en", "s0")
            for i in range(5)
        ]
        _write(_docs(spark, rows), d, "documents")
        out = positional_template_drift(spark, d).toPandas()
        by_decile = {int(r["decile"]): r for _, r in out.iterrows()}
        assert by_decile[0]["n_tokens"] == 5
        assert by_decile[0]["n_types"] == 1
        assert by_decile[0]["type_token_ratio"] == 0.2
        assert all(by_decile[k]["type_token_ratio"] == 1.0 for k in range(1, 10))

    def test_centroid_shift_planted_delta(self, spark, tmp_path):
        """Label 0: even/odd halves identical → shift 0. Label 1: odd
        half offset by +0.3 in every dim → shift = sqrt(4·0.3²) = 0.6."""
        from couchwarehouse_spark.plans.similarity import centroid_shift_drift

        d = str(tmp_path / "sf")
        rows = []
        for i in range(8):  # label 0: same cloud both halves
            rows.append((i, [0.1, 0.2, 0.3, 0.4], 0))
        for i in range(8, 16):  # label 1: odd vec_ids shifted
            off = 0.3 if i % 2 else 0.0
            rows.append((i, [0.1 + off, 0.2 + off, 0.3 + off, 0.4 + off], 1))
        _write(_emb(spark, rows), d, "embeddings")
        out = centroid_shift_drift(spark, d).toPandas()
        got = {int(r["label"]): r for _, r in out.iterrows()}
        assert got[0]["centroid_shift"] == 0.0
        assert abs(got[1]["centroid_shift"] - 0.6) < 1e-9
        assert got[0]["n_even"] == 4 and got[0]["n_odd"] == 4

    def test_collocation_llr_dependent_pair_wins(self, spark, tmp_path):
        """A bigram that ALWAYS co-occurs ('strong glue') outscores an
        equally frequent pair whose parts also appear independently."""
        from couchwarehouse_spark.plans.text import collocation_llr_pairs

        d = str(tmp_path / "sf")
        rows = []
        # 10 docs: "strong glue" appears once per doc, never apart.
        for i in range(10):
            rows.append((i, f"strong glue f{i}a f{i}b f{i}c", "en", "s0"))
        # 10 docs: "loose pair" co-occurs, but both words also appear
        # separately (against other words) in 10 more docs.
        for i in range(10, 20):
            rows.append((i, f"loose pair g{i}a g{i}b g{i}c", "en", "s0"))
        for i in range(20, 30):
            rows.append((i, f"loose h{i}a pair h{i}b h{i}c", "en", "s0"))
        _write(_docs(spark, rows), d, "documents")
        out = collocation_llr_pairs(spark, d).toPandas()
        scores = {
            (r["w1"], r["w2"]): r["llr"] for _, r in out.iterrows()
        }
        assert ("strong", "glue") in scores and ("loose", "pair") in scores
        assert scores[("strong", "glue")] > scores[("loose", "pair")] > 0

    def test_kneser_ney_planted_backoff_and_hit(self, spark, tmp_path):
        """Hand-checked KN on a controlled split: pick real train/test
        doc ids via the SAME split gate, plant one train doc and one
        test doc, and verify the exact surprisal of a seen and an
        unseen-context transition against the formula."""
        import math

        from couchwarehouse_spark.plans.sampling import (
            TRAIN_PCT,
            VAL_PCT,
            _split_bucket,
        )
        from couchwarehouse_spark.plans.text import (
            KN_DISCOUNT_DEN,
            KN_DISCOUNT_NUM,
            kneser_ney_bigram_scores,
        )
        from pyspark.sql import functions as F

        # Find one train id and one test id with the real gate.
        buckets = {
            r["id"]: r["b"]
            for r in spark.range(200)
            .select("id", _split_bucket(F.col("id")).alias("b"))
            .collect()
        }
        train_id = next(i for i, b in buckets.items() if b < TRAIN_PCT)
        test_id = next(
            i for i, b in buckets.items() if b >= TRAIN_PCT + VAL_PCT
        )
        d = str(tmp_path / "sf")
        _write(
            _docs(spark, [
                (train_id, "a b a c", "en", "s0"),  # bigrams: ab, ba, ac
                (test_id, "a b z q", "en", "s0"),   # test: ab (hit), bz, zq
            ]),
            d, "documents",
        )
        out = kneser_ney_bigram_scores(spark, d).toPandas()
        assert len(out) == 1
        row = out.iloc[0]
        assert row["n_transitions"] == 3
        # 'b z': context 'b' seen; 'z q': context 'z' unseen → 1 backoff.
        assert row["n_ctx_backoff"] == 1
        # Hand formula. Train: c12={ab:1, ba:1, ac:1}; c1={a:2,b:1};
        # n1w1={a:2,b:1}; n1w2={b:1,a:1,c:1}; T=3 types, V=3 distinct w2.
        d_num, d_den = KN_DISCOUNT_NUM, KN_DISCOUNT_DEN
        tv1 = 3 + 3 + 1
        def p_seen(c12, c1, n1w1, n1w2):
            return (
                max(d_den * c12 - d_num, 0) * tv1 + d_num * n1w1 * (n1w2 + 1)
            ) / (d_den * c1 * tv1)
        def micro(p):
            return round(1_000_000 * -math.log(p))
        exp = (
            micro(p_seen(1, 2, 2, 1))      # a→b: hit
            + micro(p_seen(0, 1, 1, 0))    # b→z: seen ctx, unseen word
            + micro((0 + 1) / tv1)         # z→q: unseen ctx → p_cont
        )
        assert row["avg_surprisal"] == round(exp / 1_000_000 / 3, 6)


class TestRound7BatchB:
    def test_good_turing_hand_spectrum(self, spark, tmp_path):
        """Bigram spectrum N1=4, N2=2, N3=1 (from a hand-built token
        stream) → r*=2·N2/N1=1.0 at r=1, r*=3·N3/N2=1.5 at r=2; r=3
        has no N4 row; unseen mass N1/N = 4/11."""
        from couchwarehouse_spark.plans.text import good_turing_estimates

        d = str(tmp_path / "sf")
        # bigrams: xy×3, yx×2, qr×2, yq, rq, rs, st → N1=4, N2=2, N3=1
        _write(
            _docs(spark, [(0, "x y x y x y q r q r s t", "en", "s0")]),
            d, "documents",
        )
        out = good_turing_estimates(spark, d).toPandas()
        rows = {int(r["r"]): r for _, r in out.iterrows()}
        assert set(rows) == {1, 2}
        assert rows[1]["n_r"] == 4
        assert rows[1]["r_star"] == 1.0
        assert rows[2]["r_star"] == 1.5
        assert rows[1]["unseen_mass"] == round(4 / 11, 9)
        assert rows[1]["p_gt"] == round(1.0 / 11, 9)

    def test_cdc_chunk_dedup_identical_and_shifted(self, spark, tmp_path):
        """Two identical docs → every chunk duplicated exactly twice
        (dup mass = one doc's tokens). A shifted copy (same passage
        behind a different prefix) still shares interior chunks —
        the content-defined anchor property fixed-width blocks lack."""
        from couchwarehouse_spark.plans.dedup import cdc_chunk_dedup

        d = str(tmp_path / "sf")
        passage = " ".join(f"tok{i}" for i in range(64))
        _write(
            _docs(spark, [(0, passage, "en", "s0"), (1, passage, "en", "s1")]),
            d, "documents",
        )
        out = cdc_chunk_dedup(spark, d).toPandas().iloc[0]
        assert out["total_chunks"] == 2 * out["distinct_chunks"]
        assert out["dup_chunks"] == out["distinct_chunks"]
        assert out["dup_token_mass"] == 64

        d2 = str(tmp_path / "sf2")
        _write(
            _docs(spark, [
                (0, passage, "en", "s0"),
                (1, "p q r " + passage, "en", "s1"),
            ]),
            d2, "documents",
        )
        out2 = cdc_chunk_dedup(spark, d2).toPandas().iloc[0]
        assert out2["dup_token_mass"] > 0  # interior chunks realign

    def test_minhash_error_zero_on_identical(self, spark, tmp_path):
        """Identical docs: one candidate pair, all 16 lanes match,
        exact Jaccard 1.0 → zero error everywhere."""
        from couchwarehouse_spark.plans.dedup import minhash_estimate_error_audit

        d = str(tmp_path / "sf")
        text = " ".join(f"w{i}" for i in range(20))
        _write(
            _docs(spark, [(0, text, "en", "s0"), (1, text, "en", "s0")]),
            d, "documents",
        )
        out = minhash_estimate_error_audit(spark, d).toPandas().iloc[0]
        assert out["n_pairs"] == 1
        assert out["mean_estimate"] == 1.0
        assert out["mean_abs_error"] == 0.0
        assert out["max_abs_error"] == 0.0

    def test_cluster_source_mix_spans(self, spark, tmp_path):
        """One within-source pair (span 1) + one cross-source pair
        (span 2) → exactly those two histogram rows."""
        from couchwarehouse_spark.plans.dedup import dedup_cluster_source_mix

        d = str(tmp_path / "sf")
        _write(
            _docs(spark, [
                (0, "alpha beta gamma delta", "en", "s0"),
                (1, "alpha beta gamma delta", "en", "s0"),
                (2, "omega psi chi phi", "en", "s0"),
                (3, "omega psi chi phi", "en", "s1"),
                (4, "lonely unique text here", "en", "s2"),
            ]),
            d, "documents",
        )
        out = dedup_cluster_source_mix(spark, d).toPandas()
        got = {
            int(r["source_span"]): (r["n_clusters"], r["n_docs"])
            for _, r in out.iterrows()
        }
        assert got == {1: (1, 2), 2: (1, 2)}

    def test_quantile_map_shift_between_two_sources(self, spark, tmp_path):
        """s1 is s0 shifted +100 chars at every decile: target = lower
        median = s0's boundary, so s0 shifts 0 and s1 shifts −100."""
        from couchwarehouse_spark.plans.statistics import (
            quantile_normalization_map,
        )

        d = str(tmp_path / "sf")
        rows = []
        for i in range(10):
            rows.append((i, "x" * (10 * (i + 1)), "en", "s0"))
            rows.append((100 + i, "x" * (10 * (i + 1) + 100), "en", "s1"))
        _write(_docs(spark, rows), d, "documents")
        out = quantile_normalization_map(spark, d).toPandas()
        assert len(out) == 20
        s0 = out[out["source"] == "s0"]
        s1 = out[out["source"] == "s1"]
        assert (s0["shift"] == 0).all()
        assert (s1["shift"] == -100).all()
        assert (s0["source_boundary"].values == [10 * (i + 1) for i in range(10)]).all()


class TestRound7BatchC:
    def test_threshold_sweep_knee(self, spark, tmp_path):
        """One identical pair (j=1.0) + one 3-of-5 pair (j=0.6): the
        sweep keeps 2 pairs through t=60 and only the identical pair
        from t=70 up."""
        from couchwarehouse_spark.plans.dedup import jaccard_threshold_sweep

        d = str(tmp_path / "sf")
        _write(
            _docs(spark, [
                (0, "p q r s t u", "en", "s0"),  # pqr qrs rst stu
                (1, "p q r s t v", "en", "s0"),  # pqr qrs rst stv → j=0.6
                (2, "a b c d e f", "en", "s0"),
                (3, "a b c d e f", "en", "s0"),  # identical → j=1.0
            ]),
            d, "documents",
        )
        out = jaccard_threshold_sweep(spark, d).toPandas()
        got = {
            int(r["threshold_pct"]): (r["n_pairs"], r["n_docs"])
            for _, r in out.iterrows()
        }
        assert got == {
            50: (2, 4), 60: (2, 4), 70: (1, 2), 80: (1, 2), 90: (1, 2),
        }

    def test_split_balance_all_train_stratum(self, spark, tmp_path):
        """A lang whose doc ids ALL hash into train shows share 100pp
        and deviation +20pp on its train row (and no val/test rows)."""
        from pyspark.sql import functions as F

        from couchwarehouse_spark.plans.sampling import (
            TRAIN_PCT,
            _split_bucket,
        )
        from couchwarehouse_spark.plans.sampling import split_balance_audit

        buckets = {
            r["id"]: r["b"]
            for r in spark.range(500)
            .select("id", _split_bucket(F.col("id")).alias("b"))
            .collect()
        }
        train_ids = [i for i, b in buckets.items() if b < TRAIN_PCT][:3]
        d = str(tmp_path / "sf")
        _write(
            _docs(spark, [(i, f"text {i}", "zz", "s0") for i in train_ids]),
            d, "documents",
        )
        out = split_balance_audit(spark, d).toPandas()
        assert len(out) == 1
        row = out.iloc[0]
        assert (row["lang"], row["split"]) == ("zz", "train")
        assert row["n_docs"] == 3
        assert row["share_pp"] == 100.0
        assert row["deviation_pp"] == 100.0 - TRAIN_PCT

    def test_bootstrap_ci_degenerate_constant_corpus(self, spark, tmp_path):
        """All docs the same length → every replicate mean equals the
        full mean; the interval collapses to a point."""
        from couchwarehouse_spark.plans.statistics import bootstrap_mean_ci

        d = str(tmp_path / "sf")
        rows = [(i, "x" * 50, "en", "s0") for i in range(40)]
        _write(_docs(spark, rows), d, "documents")
        out = bootstrap_mean_ci(spark, d).toPandas()
        assert len(out) == 1
        row = out.iloc[0]
        assert row["full_mean"] == 50.0
        assert row["boot_lo"] == 50.0 and row["boot_hi"] == 50.0
        assert row["n_resamples"] == 20


class TestLevenshteinNearDup:
    def test_one_char_edit_qualifies(self, spark, tmp_path):
        """A single-character substitution keeps shingle similarity
        high enough to collide in a band and scores edit_dist 1; an
        unrelated doc pairs with nobody."""
        from couchwarehouse_spark.plans.dedup import levenshtein_near_dup

        d = str(tmp_path / "sf")
        base = " ".join(f"tok{i}" for i in range(64))
        mutated = base.replace("tok31", "tok3x")  # 1-char substitution
        _write(
            _docs(spark, [
                (0, base, "en", "s0"),
                (1, mutated, "en", "s0"),
                (2, " ".join(f"zz{i}" for i in range(64)), "en", "s0"),
            ]),
            d, "documents",
        )
        out = levenshtein_near_dup(spark, d).toPandas()
        assert len(out) == 1
        row = out.iloc[0]
        assert (row["doc_a"], row["doc_b"]) == (0, 1)
        assert row["edit_dist"] == 1
        assert row["similarity"] == round(1 - 1 / len(base), 4)


class TestPayloadMagicBytes:
    def test_planted_modalities_sniff_exactly(self, spark, tmp_path):
        """8 docs (2 per modality by doc_id % 4): sniffed counts match
        the plant, byte totals include the 4-byte headers, and the
        assigned-vs-detected match rate is 1.0 everywhere."""
        from couchwarehouse_spark.plans.multimodal_plan import (
            payload_magic_byte_census,
        )

        d = str(tmp_path / "sf")
        rows = [(i, f"payload body {i}", "en", "s0") for i in range(8)]
        _write(_docs(spark, rows), d, "documents")
        out = payload_magic_byte_census(spark, d).toPandas()
        got = {r["detected"]: r for _, r in out.iterrows()}
        assert set(got) == {"image/png", "image/jpeg", "audio/riff", "text/plain"}
        text_len = len("payload body 0")
        for mod, r in got.items():
            assert r["n_payloads"] == 2
            assert r["match_rate"] == 1.0
            hdr = 0 if mod == "text/plain" else 4
            assert r["total_bytes"] == 2 * (text_len + hdr)


class TestRound7BatchD:
    def test_peak_concurrency_sweep_line(self, spark, tmp_path):
        """u1 [00:00,02:00], u2 [01:00,03:00], u3 [05:00,06:00], u4
        [03:00,04:00]: peak 2, first attained 01:00; a start touching
        an end at 03:00 also counts 2 (inclusive-interval tie rule)."""
        from datetime import datetime as dt

        from couchwarehouse_spark.plans.events_windows import (
            peak_concurrency_census,
        )

        def ev(i, user, h, m=0):
            return (i, dt(2024, 3, 1, h, m), user, "click", 1.0, "{}")

        rows = [
            ev(1, 1, 0), ev(2, 1, 2),    # u1 00:00-02:00
            ev(3, 2, 1), ev(4, 2, 3),    # u2 01:00-03:00
            ev(5, 3, 5), ev(6, 3, 6),    # u3 05:00-06:00
            ev(7, 4, 3), ev(8, 4, 4),    # u4 03:00-04:00 (touches u2 end)
        ]
        d = str(tmp_path / "sf")
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = peak_concurrency_census(spark, d).toPandas()
        assert len(out) == 1
        row = out.iloc[0]
        assert row["n_users"] == 4
        assert row["peak_concurrent"] == 2
        assert row["peak_at"] == "2024-03-01 01:00:00"

    def test_linkpred_identical_vectors_exact(self, spark, tmp_path):
        """5 identical vectors: ties rank by vec_id, so every node
        links to the 3 lowest other ids; the ONLY non-adjacent pair is
        (3,4) with 3 common neighbors — the exact prediction."""
        from couchwarehouse_spark.plans.similarity import (
            graph_common_neighbors_linkpred,
        )

        d = str(tmp_path / "sf")
        vec = [0.5, 0.25, 0.125, 0.0625]
        _write(
            _emb(spark, [(i, vec, 0) for i in range(5)]), d, "embeddings"
        )
        out = graph_common_neighbors_linkpred(spark, d).toPandas()
        assert len(out) == 1
        row = out.iloc[0]
        assert (row["u"], row["w"], row["common_neighbors"]) == (3, 4, 3)
