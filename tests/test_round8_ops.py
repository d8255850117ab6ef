"""Planted-fixture golden tests for round 8.

The oracle lane proves Spark ≡ DuckDB on the shared tables; these
prove both are RIGHT on inputs whose correct output is known by
construction (SURVEY.md §5). Round 8 adds the split+transform e2e
entry (R5/R8 under the oracle gate — r7 verdict #6) and the new
operators of this round.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _write(df, sf_dir: str, name: str) -> None:
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{sf_dir}/{name}.parquet")


class TestWarehouseSplitTransformE2E:
    def test_routing_transform_and_tombstones_by_construction(
        self, spark, tmp_path
    ):
        """Six hand-built orders through the real split+transform
        pipeline: keys 7/14 amend (status → 'amended'), key 10 (a
        'large' order) tombstones OUT of its table, kinds route on the
        150k total cut, and the transform's derived columns
        (status_norm = lower(status), total_k = floor(total/1000))
        come back from the FROZEN schema — every cell checked against
        values computed by hand."""
        from couchwarehouse_spark.plans.warehouse_e2e import (
            warehouse_split_transform_e2e,
        )

        sf = str(tmp_path / "sf")
        # o_orderkey must satisfy % ST_SUBSET(9) == 0 to enter the
        # feed; keys are multiples of 9 engineered against the
        # AMEND(7) / DELETE(10) moduli:
        #   9   -> plain 'O',  total 200k -> large
        #   63  -> %7==0: amended,        total 120k -> small
        #   90  -> %10==0: tombstoned,    total 180k -> large (gone)
        #   18  -> plain 'F',  total  50k -> small
        #   27  -> plain 'O',  total 150k -> large (boundary: >= cut)
        #   126 -> %7==0 AND %9==0: amended, total 300k -> large
        rows = [
            (9, 1, "O", 200_000.0),
            (63, 2, "O", 120_000.0),
            (90, 3, "O", 180_000.0),
            (18, 4, "F", 50_000.0),
            (27, 5, "O", 150_000.0),
            (126, 6, "P", 300_000.0),
            (11, 7, "O", 999_999.0),  # not % 9 == 0: never enters the feed
        ]
        _write(
            spark.createDataFrame(
                [
                    (k, c, s, t, "1996-01-02", "1-URGENT", "c", 0, "x")
                    for k, c, s, t in rows
                ],
                "o_orderkey long, o_custkey long, o_orderstatus string, "
                "o_totalprice double, o_orderdate string, "
                "o_orderpriority string, o_clerk string, "
                "o_shippriority int, o_comment string",
            ),
            sf,
            "orders",
        )
        out = {
            (r["kind"], r["status_norm"]): (r["n_orders"], r["total_k_sum"])
            for r in warehouse_split_transform_e2e(spark, sf).collect()
        }
        assert out == {
            ("large", "o"): (2, 350),       # keys 9 (200k) + 27 (150k)
            ("large", "amended"): (1, 300),  # key 126
            ("small", "amended"): (1, 120),  # key 63
            ("small", "f"): (1, 50),         # key 18
        }


class TestStatisticsRound8:
    def test_spearman_average_tie_ranks_by_hand(self, spark, tmp_path):
        """One source, four docs with a DELIBERATE tie in n_chars:
        doubled average ranks are (2,5,5,8) vs token ranks (2,4,6,8)
        -> rho = 72/sqrt(72*80) = 0.948683 by hand."""
        from couchwarehouse_spark.plans.statistics import spearman_rank_corr

        sf = str(tmp_path / "sf")
        texts = ["t", "t t", "t t t", "t t t t"]  # token counts 1..4
        _write(
            spark.createDataFrame(
                [(i, texts[i], "en", "s0", a) for i, a in enumerate([1, 2, 2, 4])],
                "doc_id long, text string, lang string, source string, n_chars long",
            ),
            sf,
            "documents",
        )
        [row] = spearman_rank_corr(spark, sf).collect()
        assert row["n_docs"] == 4
        assert row["spearman_rho"] == 0.948683

    def test_welch_t_by_hand(self, spark, tmp_path):
        """en=(10,20) vs de=(40,60): t = 35/sqrt(125) = 3.1305,
        Welch-Satterthwaite df = 15625/10625 = 1.47."""
        from couchwarehouse_spark.plans.statistics import welch_t_doclen

        sf = str(tmp_path / "sf")
        rows = [(0, "x", "en", "s", 10), (1, "x", "en", "s", 20),
                (2, "x", "de", "s", 40), (3, "x", "de", "s", 60)]
        _write(
            spark.createDataFrame(
                rows,
                "doc_id long, text string, lang string, source string, n_chars long",
            ),
            sf,
            "documents",
        )
        [row] = welch_t_doclen(spark, sf).collect()
        assert (row["lang"], row["n_docs"]) == ("de", 2)
        assert row["mean_chars"] == 50.0
        assert row["welch_t"] == 3.1305
        assert row["welch_df"] == 1.47

    def test_anova_by_hand(self, spark, tmp_path):
        """s1=(10,20), s2=(30,50): SSB=625, SSW=250 -> F=5.0,
        eta^2=625/875=0.714286."""
        from couchwarehouse_spark.plans.statistics import anova_doclen_by_source

        sf = str(tmp_path / "sf")
        rows = [(0, "x", "en", "s1", 10), (1, "x", "en", "s1", 20),
                (2, "x", "en", "s2", 30), (3, "x", "en", "s2", 50)]
        _write(
            spark.createDataFrame(
                rows,
                "doc_id long, text string, lang string, source string, n_chars long",
            ),
            sf,
            "documents",
        )
        [row] = anova_doclen_by_source(spark, sf).collect()
        assert (row["n_groups"], row["n_docs"]) == (2, 4)
        assert row["f_stat"] == 5.0
        assert row["eta_squared"] == 0.714286

    def test_t_closeness_by_hand(self, spark, tmp_path):
        """en sources (A:3, B:1), de sources (A:1, B:3); global is
        uniform -> each group's TVD to global = 0.25."""
        from couchwarehouse_spark.plans.statistics import t_closeness_audit

        sf = str(tmp_path / "sf")
        rows = (
            [(i, "x", "en", "A", 1) for i in range(3)]
            + [(3, "x", "en", "B", 1)]
            + [(4, "x", "de", "A", 1)]
            + [(5 + i, "x", "de", "B", 1) for i in range(3)]
        )
        _write(
            spark.createDataFrame(
                rows,
                "doc_id long, text string, lang string, source string, n_chars long",
            ),
            sf,
            "documents",
        )
        out = {r["lang"]: (r["n_rows"], r["tvd_to_global"])
               for r in t_closeness_audit(spark, sf).collect()}
        assert out == {"en": (4, 0.25), "de": (4, 0.25)}

    def test_cramers_v_perfect_association(self, spark, tmp_path):
        """documents pair with lang -> source a bijection: chi2 = n,
        V = 1 exactly (zero cells included via the dense spine)."""
        import datetime

        from couchwarehouse_spark.plans.statistics import cramers_v_matrix

        sf = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                [(0, "x", "a", "x1", 1), (1, "x", "a", "x1", 1),
                 (2, "x", "b", "y1", 1), (3, "x", "b", "y1", 1)],
                "doc_id long, text string, lang string, source string, n_chars long",
            ),
            sf,
            "documents",
        )
        _write(
            spark.createDataFrame(
                [(1, 1, "O", 10.0, datetime.datetime(1996, 1, 2), "1-URGENT")],
                "o_orderkey long, o_custkey long, o_orderstatus string, "
                "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
            ),
            sf,
            "orders",
        )
        _write(
            spark.createDataFrame(
                [(1, datetime.datetime(2024, 1, 1, 9), 1, "view", 1.0, "{}")],
                "event_id long, ts timestamp, user_id long, event_type string, "
                "value double, props string",
            ),
            sf,
            "events",
        )
        out = {r["pair"]: r for r in cramers_v_matrix(spark, sf).collect()}
        doc = out["documents:lang_x_source"]
        assert (doc["n"], doc["r_levels"], doc["c_levels"]) == (4, 2, 2)
        assert doc["chi2"] == 4.0
        assert doc["cramers_v"] == 1.0


class TestGraphKernelsRound8:
    def _fixture(self, spark, tmp_path, n=10, dim=64):
        """Deterministic embeddings fixture + a numpy mirror of the
        bucketed-kNN und-edge rule (SRP planes → per-bucket cosine
        top-K, least/greatest dedup) — the same model-check pattern
        as the KN scorer's _kn_reference."""
        import numpy as np

        from couchwarehouse_spark.plans.similarity import (
            KNN_GRAPH_K,
            _ALL_PLANES,
            derive_planes,
        )

        rng = [(i * 2654435761 % 997) / 997.0 for i in range(n * dim)]
        vecs = np.array(rng, dtype=np.float64).reshape(n, dim) - 0.45
        sf = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                [(i, [float(x) for x in vecs[i]], i % 3) for i in range(n)],
                "vec_id long, embedding array<float>, label int",
            ),
            sf,
            "embeddings",
        )
        # Mirror: float32 round-trip like the parquet column, then the
        # exact bucket/top-k rule.
        v = vecs.astype(np.float32).astype(np.float64)
        planes = np.array(_ALL_PLANES[: derive_planes(n)], dtype=np.float64)
        bits = (v @ planes.T) > 0
        bucket = (bits * (1 << np.arange(planes.shape[0]))).sum(axis=1)
        edges = set()
        for i in range(n):
            cands = [
                j for j in range(n) if j != i and bucket[j] == bucket[i]
            ]
            cos = {
                j: float(v[i] @ v[j])
                / (np.linalg.norm(v[i]) * np.linalg.norm(v[j]))
                for j in cands
            }
            top = sorted(cands, key=lambda j: (-cos[j], j))[:KNN_GRAPH_K]
            for j in top:
                edges.add((i, j))
        und = {}
        for a, b in edges:
            k = (min(a, b), max(a, b))
            und[k] = und.get(k, 0) + 1
        return sf, edges, und

    def test_mutual_knn_matches_numpy_mirror(self, spark, tmp_path):
        from couchwarehouse_spark.plans.similarity import mutual_knn_pairs

        sf, edges, und = self._fixture(spark, tmp_path)
        [row] = mutual_knn_pairs(spark, sf).collect()
        n_mutual = sum(1 for c in und.values() if c == 2)
        assert row["n_directed"] == len(edges)
        assert row["n_und_pairs"] == len(und)
        assert row["n_mutual"] == n_mutual
        assert row["mutuality_rate"] == round(n_mutual / len(und), 6)

    def test_assortativity_matches_numpy_mirror(self, spark, tmp_path):
        from couchwarehouse_spark.plans.similarity import degree_assortativity

        sf, edges, und = self._fixture(spark, tmp_path)
        deg = {}
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        xs, ys = [], []
        for a, b in und:
            xs += [deg[a], deg[b]]
            ys += [deg[b], deg[a]]
        m, sx = len(xs), sum(xs)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        den = m * sxx - sx * sx
        expected = round((m * sxy - sx * sx) / den, 6) if den else None
        [row] = degree_assortativity(spark, sf).collect()
        assert row["n_edges"] == len(und)
        assert row["assortativity"] == expected

    def test_kcore_peels_to_fixpoint_on_known_graph(self, spark, tmp_path):
        """Model-check the peel itself on the fixture's und graph:
        replay KCORE_ROUNDS rounds of the degree-≥-K rule in pure
        Python and demand identical per-round censuses."""
        from couchwarehouse_spark.plans.similarity import (
            KCORE_K,
            KCORE_ROUNDS,
            kcore_decomposition,
        )

        sf, edges, und = self._fixture(spark, tmp_path, n=14)
        cur = set(und)
        expect = []
        for it in range(1, KCORE_ROUNDS + 1):
            deg = {}
            for a, b in cur:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            keep = {v for v, d in deg.items() if d >= KCORE_K}
            cur = {(a, b) for a, b in cur if a in keep and b in keep}
            expect.append((it, len(keep), len(cur)))
        got = [
            (r["iter"], r["n_core_nodes"], r["n_core_edges"])
            for r in kcore_decomposition(spark, sf).collect()
        ]
        assert got == expect


class TestMultimodalAndTextRound8:
    def test_aspect_bucket_by_hand(self, spark, tmp_path):
        """doc_id 0: w=64, h=136 -> |64*144 - 136*bw| minimized by
        9:16 (bw=81): canvas widens to ceil(136*81/144)=77 -> wait,
        64*144=9216 vs 136*81=11016: w*144 < h*81, pad side = width:
        ceil(136*81/144)*136 - 64*136 = 77*136 - 8704 = 1768."""
        from couchwarehouse_spark.plans.multimodal_plan import aspect_bucket_plan

        sf = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                [(0, "x", "en", "s0", 1)],
                "doc_id long, text string, lang string, source string, n_chars long",
            ),
            sf,
            "documents",
        )
        [row] = aspect_bucket_plan(spark, sf).collect()
        # doc_id 0 -> w = 64 + 0 = 64, h = 64 + 3*24 = 136
        # distances: 1:1 |9216-19584|=10368; 4:3 |9216-26112|=16896;
        # 3:4 |9216-14688|=5472; 16:9 |9216-34816|=25600;
        # 9:16 |9216-11016|=1800 -> 9:16 wins
        assert row["bucket"] == "9:16"
        assert row["n_images"] == 1
        assert row["total_px"] == 64 * 136
        # w*144=9216 < h*81=11016 -> pad width to ceil(136*81/144)=77
        assert row["pad_px"] == 77 * 136 - 64 * 136
        assert row["pad_share"] == round((77 * 136 - 64 * 136) / (77 * 136), 6)

    def test_vision_token_budget_by_hand(self, spark, tmp_path):
        """doc_id 0 (64x136): ceil(64/14)*ceil(136/14)+1 = 5*10+1=51;
        doc_id 1 (96x304): 7*22+1 = 155."""
        from couchwarehouse_spark.plans.multimodal_plan import vision_token_budget

        sf = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                [(0, "x", "en", "s0", 1), (1, "x", "en", "s1", 1)],
                "doc_id long, text string, lang string, source string, n_chars long",
            ),
            sf,
            "documents",
        )
        out = {r["source"]: r for r in vision_token_budget(spark, sf).collect()}
        # doc 1: w = 64+32=96, h = 64 + ((7+3)%41)*24 = 64+240=304
        assert out["s0"]["total_tokens"] == 51
        assert out["s1"]["total_tokens"] == 155
        assert out["s0"]["budget_share"] == round(51 / 206, 6)
        assert out["s1"]["max_tokens"] == 155

    def test_fog_census_by_hand(self, spark, tmp_path):
        """'banana analysis of it' -> syllables (vowel groups):
        banana=3, analysis=4, of=1, it=1; words=4, complex=2
        (banana, analysis), syll=9. fog = 0.4*(4 + 100*2/4) = 21.6."""
        from couchwarehouse_spark.plans.text import readability_fog_census

        sf = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                [(0, "banana analysis of it", "en", "s0", 21)],
                "doc_id long, text string, lang string, source string, n_chars long",
            ),
            sf,
            "documents",
        )
        [row] = readability_fog_census(spark, sf).collect()
        assert row["n_docs"] == 1
        assert row["total_words"] == 4
        assert row["complex_share"] == 0.5
        assert row["syll_per_word"] == 2.25
        assert row["fog_index_avg"] == 21.6


class TestAnalyticsRound8b:
    def test_market_basket_lift_by_hand(self, spark, tmp_path):
        """20 orders with {A,B} + 5 with {A} only: sup_ab=20, sa=25,
        sb=20, N=25 -> lift = 20*25/(25*20) = 1.0."""
        import datetime

        from couchwarehouse_spark.plans.statistics import market_basket_lift_pairs

        sf = str(tmp_path / "sf")
        li = []
        for ok in range(20):
            li += [(ok, 1, ok, 1), (ok, 2, ok, 2)]
        for ok in range(20, 25):
            li += [(ok, 1, ok, 1)]
        _write(
            spark.createDataFrame(
                [
                    (ok, pk, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                     datetime.datetime(1996, 1, 2))
                    for ok, pk, _, ln in li
                ],
                "l_orderkey long, l_partkey long, l_suppkey long, "
                "l_linenumber int, l_quantity double, l_extendedprice double, "
                "l_discount double, l_tax double, l_returnflag string, "
                "l_linestatus string, l_shipdate timestamp",
            ),
            sf,
            "lineitem",
        )
        _write(
            spark.createDataFrame(
                [(1, "p1", "BrandA", "t", 1, 1.0), (2, "p2", "BrandB", "t", 1, 1.0)],
                "p_partkey long, p_name string, p_brand string, p_type string, "
                "p_size int, p_retailprice double",
            ),
            sf,
            "part",
        )
        [row] = market_basket_lift_pairs(spark, sf).collect()
        assert (row["brand_a"], row["brand_b"], row["sup_ab"]) == (
            "BrandA", "BrandB", 20,
        )
        assert row["lift"] == 1.0

    def test_cuped_by_hand(self, spark, tmp_path):
        """4 users, pre=(100,200,300,400), post=(200,400,500,700)
        dollars: theta=1.6, rho^2=1024/1040; variant 0 adjusted mean
        430.0, variant 1 adjusted 470.0 — all by hand."""
        import datetime

        from couchwarehouse_spark.plans.statistics import cuped_adjusted_abtest

        sf = str(tmp_path / "sf")
        pre = datetime.datetime(2024, 1, 10)
        post = datetime.datetime(2024, 1, 20)
        rows, eid = [], 0
        for u, (x, y) in enumerate([(100, 200), (200, 400), (300, 500), (400, 700)]):
            rows += [(eid, pre, u, "purchase", float(x), "{}")]
            rows += [(eid + 1, post, u, "purchase", float(y), "{}")]
            eid += 2
        _write(
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, event_type string, "
                "value double, props string",
            ),
            sf,
            "events",
        )
        out = {r["variant"]: r for r in cuped_adjusted_abtest(spark, sf).collect()}
        assert out[0]["mean_post"] == 350.0
        assert out[0]["mean_adjusted"] == 430.0
        assert out[1]["mean_post"] == 550.0
        assert out[1]["mean_adjusted"] == 470.0
        assert out[0]["theta"] == 1.6
        assert out[0]["var_reduction"] == round(1024 / 1040, 6)

    def test_two_way_effects_by_hand(self, spark, tmp_path):
        """2 dows x 2 types, one event each: cell = value, row/col
        means and the interaction residual computed by hand."""
        import datetime

        from couchwarehouse_spark.plans.statistics import (
            two_way_effects_decomposition,
        )

        sf = str(tmp_path / "sf")
        # 2024-01-07 is a Sunday (dow 1), 2024-01-08 Monday (dow 2)
        sun, mon = datetime.datetime(2024, 1, 7), datetime.datetime(2024, 1, 8)
        rows = [
            (0, sun, 1, "click", 10.0, "{}"),
            (1, sun, 1, "view", 20.0, "{}"),
            (2, mon, 1, "click", 30.0, "{}"),
            (3, mon, 1, "view", 60.0, "{}"),
        ]
        _write(
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, event_type string, "
                "value double, props string",
            ),
            sf,
            "events",
        )
        out = {r["dow"]: r for r in two_way_effects_decomposition(spark, sf).collect()}
        # grand=30; sun row mean 15 -> effect -15; mon 45 -> +15
        assert out[1]["dow_effect"] == -15.0
        assert out[2]["dow_effect"] == 15.0
        # cell(sun,click)=10: 10-15-20+30=5 ; cell(sun,view)=20-15-40+30=-5
        assert out[1]["max_abs_interaction"] == 5.0
        assert out[2]["max_abs_interaction"] == 5.0

    def test_burrows_delta_two_sources_by_hand(self, spark, tmp_path):
        """Two sources 'x x y' vs 'x y y': with S=2 every unequal-
        frequency term contributes |z_a - z_b| = sqrt(2), so
        delta = 2*round_micro(sqrt 2)/30 = 0.0943."""
        from couchwarehouse_spark.plans.text import burrows_delta_stylometry

        sf = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                [(0, "x x y", "en", "sA", 5), (1, "x y y", "en", "sB", 5)],
                "doc_id long, text string, lang string, source string, n_chars long",
            ),
            sf,
            "documents",
        )
        [row] = burrows_delta_stylometry(spark, sf).collect()
        assert (row["source_a"], row["source_b"]) == ("sA", "sB")
        assert row["delta"] == round(2 * 1414214 / 1_000_000 / 30, 4)

    def test_conformal_coverage_by_hand(self, spark, tmp_path):
        """One source: 2 train docs pin the mean at 10; 9 calibration
        docs have scores 0..8 -> q-hat rank ceil(10*0.9)=9 picks score
        8 (|x-10|=8 -> q_hat=8.0); test docs at distances 5 and 20 ->
        coverage 0.5."""
        from couchwarehouse_spark.plans.sampling import (
            TRAIN_PCT,
            VAL_PCT,
            _split_bucket,
        )
        from couchwarehouse_spark.plans.statistics import (
            conformal_interval_coverage,
        )
        import pyspark.sql.functions as F

        from couchwarehouse_spark.plans.statistics import (  # noqa: F401
            CONF_ALPHA_PCT,
        )

        buckets = {
            r["id"]: r["b"]
            for r in spark.range(600)
            .select("id", _split_bucket(F.col("id")).alias("b"))
            .collect()
        }
        train_ids = [i for i, b in buckets.items() if b < TRAIN_PCT]
        val_ids = [i for i, b in buckets.items()
                   if TRAIN_PCT <= b < TRAIN_PCT + VAL_PCT]
        test_ids = [i for i, b in buckets.items() if b >= TRAIN_PCT + VAL_PCT]
        rows = [(train_ids[0], "t", "en", "s0", 8),
                (train_ids[1], "t", "en", "s0", 12)]  # mean 10
        for i in range(9):
            rows.append((val_ids[i], "t", "en", "s0", 10 + i))  # scores 0..8
        rows += [(test_ids[0], "t", "en", "s0", 15),   # score 5 <= 8: covered
                 (test_ids[1], "t", "en", "s0", 30)]   # score 20 > 8: not
        sf = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                rows,
                "doc_id long, text string, lang string, source string, n_chars long",
            ),
            sf,
            "documents",
        )
        [row] = conformal_interval_coverage(spark, sf).collect()
        assert (row["n_cal"], row["n_test"]) == (9, 2)
        assert row["q_hat"] == 8.0
        assert row["coverage"] == 0.5
        assert row["target"] == 0.9


class TestSequentialAndIRRound8:
    def test_holt_recurrence_by_hand(self, spark, tmp_path):
        """Daily counts (2,4,7,9): l2=4 b2=2; errors |7-6|=1 and
        |9-8.75|=0.25 -> mae 0.625; final level 8.875, trend 2.3125 —
        every value dyadic-exact."""
        import datetime

        from couchwarehouse_spark.plans.events_windows import holt_linear_backtest

        sf = str(tmp_path / "sf")
        rows, eid = [], 0
        for day, n in [(1, 2), (2, 4), (3, 7), (4, 9)]:
            for _ in range(n):
                rows.append(
                    (eid, datetime.datetime(2024, 1, day, 12), 1, "click",
                     1.0, "{}")
                )
                eid += 1
        _write(
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, event_type string, "
                "value double, props string",
            ),
            sf,
            "events",
        )
        [row] = holt_linear_backtest(spark, sf).collect()
        assert row["n_days"] == 4
        assert row["mae"] == 0.625
        assert row["final_level"] == 8.875
        assert row["final_trend"] == 2.3125

    def test_mmr_prefers_diverse_pick_by_hand(self, spark, tmp_path):
        """Query (2,0); candidates (1,0.25) ~ near-dup of the query
        direction and (0,1) ~ orthogonal: MMR keeps relevance order
        for picks 1-2 and scores the orthogonal pick exactly
        -0.3*sim(c3,c2) — all values checked against closed forms."""
        import math

        from couchwarehouse_spark.plans.similarity import mmr_diversified_rerank

        sf = str(tmp_path / "sf")
        vecs = {0: [2.0, 0.0], 1: [1.0, 0.5], 2: [1.0, 0.25], 3: [0.0, 1.0]}
        _write(
            spark.createDataFrame(
                [(i, v, 0) for i, v in vecs.items()],
                "vec_id long, embedding array<float>, label int",
            ),
            sf,
            "embeddings",
        )
        out = {r["rank"]: r for r in mmr_diversified_rerank(spark, sf).collect()}
        # rel: c2 = 1/sqrt(1.0625) = 0.9701.., c1 = 1/sqrt(1.25) = 0.8944..,
        # c3 = 0 -> pick1 = vec 2 (highest rel)
        assert out[1]["vec_id"] == 2
        r2 = 1 / math.sqrt(1.0625)
        assert out[1]["mmr_score"] == round(0.7 * r2, 4)
        # step 2: c1 mmr = 0.7*rel1 - 0.3*sim(c1,c2); sim = dot/(norms)
        r1 = 1 / math.sqrt(1.25)
        sim12 = (1 + 0.125) / (math.sqrt(1.25) * math.sqrt(1.0625))
        mmr1 = 0.7 * r1 - 0.3 * sim12
        # c3 mmr = 0.7*0 - 0.3*sim(c3,c2) = -0.3*0.25/sqrt(1.0625)
        mmr3 = -0.3 * (0.25 / math.sqrt(1.0625))
        assert mmr1 > mmr3
        assert out[2]["vec_id"] == 1
        assert out[2]["mmr_score"] == round(mmr1, 4)
        assert out[3]["vec_id"] == 3

    def test_prf_expands_with_feedback_terms(self, spark, tmp_path):
        """Seeds {data, table}; feedback docs contain zebra (tf/df =
        3/2) and yak (1/2) -> both expand; per-doc matched-term counts
        are then fully determined."""
        from couchwarehouse_spark.plans.relational_extra import (
            pseudo_relevance_feedback,
        )

        sf = str(tmp_path / "sf")
        docs = [
            (1, "data table zebra zebra"),
            (2, "data zebra"),
            (3, "yak yak"),
            (4, "table yak data"),
        ]
        _write(
            spark.createDataFrame(
                [(i, t, "en", "s0", len(t)) for i, t in docs],
                "doc_id long, text string, lang string, source string, n_chars long",
            ),
            sf,
            "documents",
        )
        rows = pseudo_relevance_feedback(spark, sf).collect()
        hits = {r["doc_id"]: r["n_terms_hit"] for r in rows}
        assert hits == {1: 3, 2: 2, 3: 1, 4: 3}
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(r["score"] > 0 for r in rows)

    def test_column_profile_by_hand(self, spark, tmp_path):
        import datetime

        from couchwarehouse_spark.plans.statistics import column_profile_audit

        sf = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                [
                    (1, 10, "O", 100.5, datetime.datetime(1996, 1, 2), "1-URGENT"),
                    (2, None, "F", 50.25, datetime.datetime(1996, 2, 2), "2-HIGH"),
                    (3, 10, "O", 100.5, datetime.datetime(1996, 3, 2), "2-HIGH"),
                ],
                "o_orderkey long, o_custkey long, o_orderstatus string, "
                "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
            ),
            sf,
            "orders",
        )
        out = {r["col_name"]: r for r in column_profile_audit(spark, sf).collect()}
        assert out["o_custkey"]["n_null"] == 1
        assert out["o_custkey"]["n_distinct"] == 1
        assert out["o_orderstatus"]["n_distinct"] == 2
        assert out["o_orderkey"]["min_str"] == "1"
        assert out["o_orderkey"]["max_str"] == "3"
        assert out["o_totalprice"]["n_distinct"] == 2
        assert all(r["n_rows"] == 3 for r in out.values())


class TestScalarSamplingRound8:
    def test_try_functions_null_on_error(self, spark, tmp_path):
        import datetime

        from couchwarehouse_spark.plans.scalar import try_functions

        sf = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                [
                    (1, 5, "O", 100.9, datetime.datetime(1996, 1, 2), "1-URGENT"),
                    (2, 10, "F", 77.5, datetime.datetime(1996, 1, 3), "3-MEDIUM"),
                ],
                "o_orderkey long, o_custkey long, o_orderstatus string, "
                "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
            ),
            sf,
            "orders",
        )
        out = {r["o_orderkey"]: r for r in try_functions(spark, sf).collect()}
        # '1-URGENT' is not an int -> NULL; first char '1' + 5 = 6
        assert out[1]["prio_num"] is None
        assert out[1]["safe_add"] == 6
        # floor(100.9)=100 // (5%5=0 -> NULL divisor) -> NULL, no throw
        assert out[1]["safe_div"] is None
        # custkey 10 -> 10 % 5 = 0 -> NULL divisor for row 2 as well
        assert out[2]["safe_div"] is None
        assert out[2]["safe_add"] == 13
        assert out[1]["bad_cast_default"] == -1.0

    def test_length_buckets_by_hand(self, spark, tmp_path):
        from couchwarehouse_spark.plans.sampling import (
            LB_BUCKETS,
            length_bucket_packing_plan,
        )

        sf = str(tmp_path / "sf")
        texts = [
            " ".join(["t"] * 10),    # -> bucket 64, used 10
            " ".join(["t"] * 64),    # -> bucket 64, used 64
            " ".join(["t"] * 65),    # -> bucket 128
            " ".join(["t"] * 2000),  # -> top bucket, truncated to 1024
        ]
        _write(
            spark.createDataFrame(
                [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)],
                "doc_id long, text string, lang string, source string, n_chars long",
            ),
            sf,
            "documents",
        )
        out = {r["bucket"]: r for r in length_bucket_packing_plan(spark, sf).collect()}
        assert out[64]["n_docs"] == 2
        assert out[64]["used_tokens"] == 74
        assert out[64]["padded_tokens"] == 128
        assert out[64]["pad_waste_share"] == round(1 - 74 / 128, 6)
        assert out[128]["n_docs"] == 1
        assert out[LB_BUCKETS[-1]]["n_truncated"] == 1
        assert out[LB_BUCKETS[-1]]["used_tokens"] == LB_BUCKETS[-1]


class TestJourneyAndRankingRound8:
    def test_bradley_terry_matches_python_mirror(self, spark, tmp_path):
        """Python mirror of the full BT pipeline (md5 reward, duels,
        3 nano-quantized MM rounds with normalization) on a 3-source
        fixture — same model-check pattern as the KN scorer."""
        import hashlib

        from couchwarehouse_spark.plans.sampling import (
            BON_GROUP,
            BT_ITERS,
            REWARD_SALT,
            bradley_terry_strengths,
        )

        def reward(i):
            return int(hashlib.md5(f"{REWARD_SALT}:{i}".encode()).hexdigest()[:8], 16)

        n = 24
        srcs = ["sA", "sB", "sC"]
        rows = [(i, "t", "en", srcs[i % 3], 1) for i in range(n)]
        sf = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                rows,
                "doc_id long, text string, lang string, source string, n_chars long",
            ),
            sf,
            "documents",
        )
        # mirror
        from collections import defaultdict

        duels = []
        groups = defaultdict(list)
        for i, _, _, s, _ in rows:
            groups[i // BON_GROUP].append((i, s))
        for g, members in groups.items():
            for ai in range(len(members)):
                for bi in range(len(members)):
                    (da, sa), (db, sb) = members[ai], members[bi]
                    if sa < sb:
                        win = sa if (reward(da), da) > (reward(db), db) else sb
                        lose = sb if win == sa else sa
                        duels.append((win, lose))
        wins = defaultdict(int)
        nmat = defaultdict(int)
        for w_, l_ in duels:
            wins[w_] += 1
            nmat[(min(w_, l_), max(w_, l_))] += 1
        players = sorted({p for d in duels for p in d})
        g = {p: 1.0 for p in players}
        for _ in range(BT_ITERS):
            raw = {}
            for p in players:
                den_nano = 0
                for q in players:
                    if q == p:
                        continue
                    nn = nmat.get((min(p, q), max(p, q)), 0)
                    if nn:
                        den_nano += round(1e9 * nn / (g[p] + g[q]))
                raw[p] = wins[p] / (den_nano / 1e9)
            sg = sum(raw.values())
            g = {p: raw[p] * len(players) / sg for p in players}
        out = {r["source"]: r for r in bradley_terry_strengths(spark, sf).collect()}
        for p in players:
            assert out[p]["n_wins"] == wins[p]
            assert out[p]["bt_strength"] == round(g[p], 6)

    def test_rolling_median_by_hand(self, spark, tmp_path):
        """Counts 1..9 by day: trailing-7 median at day 9 is the 4th
        smallest of {3..9} = 6; at day 3 it's ceil(3/2)=2nd of
        {1,2,3} = 2."""
        import datetime

        from couchwarehouse_spark.plans.events_windows import rolling_median_7d

        sf = str(tmp_path / "sf")
        rows, eid = [], 0
        for day in range(1, 10):
            for _ in range(day):  # count on day d = d
                rows.append(
                    (eid, datetime.datetime(2024, 1, day, 8), 1, "click", 1.0, "{}")
                )
                eid += 1
        _write(
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, event_type string, "
                "value double, props string",
            ),
            sf,
            "events",
        )
        out = {r["day"]: r for r in rolling_median_7d(spark, sf).collect()}
        assert out["2024-01-03"]["rolling_median"] == 2
        assert out["2024-01-03"]["n_in_window"] == 3
        assert out["2024-01-09"]["rolling_median"] == 6
        assert out["2024-01-09"]["n_in_window"] == 7
        assert out["2024-01-09"]["n_events"] == 9

    def test_event_trigrams_by_hand(self, spark, tmp_path):
        import datetime

        from couchwarehouse_spark.plans.events_windows import event_trigram_paths

        sf = str(tmp_path / "sf")
        seq = ["view", "click", "purchase", "view", "click"]
        rows = [
            (i, datetime.datetime(2024, 1, 1, 8, i), 1, t, 1.0, "{}")
            for i, t in enumerate(seq)
        ]
        _write(
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, event_type string, "
                "value double, props string",
            ),
            sf,
            "events",
        )
        out = {r["path"]: (r["n_occurrences"], r["n_users"])
               for r in event_trigram_paths(spark, sf).collect()}
        assert out == {
            "view > click > purchase": (1, 1),
            "click > purchase > view": (1, 1),
            "purchase > view > click": (1, 1),
        }


class TestAttributionRound8:
    def test_removal_effects_by_hand(self, spark, tmp_path):
        """u1: view>click>purchase, u2: view>error(end). Base
        conversion from START = 0.5; removing view or click kills all
        conversion (effect 1.0); removing error changes nothing
        (effect 0.0)."""
        import datetime

        from couchwarehouse_spark.plans.events_windows import (
            markov_removal_attribution,
        )

        sf = str(tmp_path / "sf")
        rows = [
            (0, datetime.datetime(2024, 1, 1, 8, 0), 1, "view", 1.0, "{}"),
            (1, datetime.datetime(2024, 1, 1, 8, 1), 1, "click", 1.0, "{}"),
            (2, datetime.datetime(2024, 1, 1, 8, 2), 1, "purchase", 1.0, "{}"),
            (3, datetime.datetime(2024, 1, 1, 9, 0), 2, "view", 1.0, "{}"),
            (4, datetime.datetime(2024, 1, 1, 9, 1), 2, "error", 1.0, "{}"),
        ]
        _write(
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, event_type string, "
                "value double, props string",
            ),
            sf,
            "events",
        )
        out = {r["channel"]: r for r in markov_removal_attribution(spark, sf).collect()}
        assert set(out) == {"view", "click", "error"}
        for ch in out:
            assert out[ch]["base_conv"] == 0.5
        assert out["view"]["removal_effect"] == 1.0
        assert out["click"]["removal_effect"] == 1.0
        assert out["error"]["removal_conv"] == 0.5
        assert out["error"]["removal_effect"] == 0.0

    def test_qte_by_hand(self, spark, tmp_path):
        """Control user-sums (10,20,30,40), treatment (15,30,45,60):
        p50 picks the 2nd smallest (20 vs 30 -> QTE 10), p90 the 4th
        (40 vs 60 -> QTE 20)."""
        import datetime

        from couchwarehouse_spark.plans.statistics import (
            quantile_treatment_effects,
        )

        sf = str(tmp_path / "sf")
        rows, eid = [], 0
        for u, val in [(0, 10), (2, 20), (4, 30), (6, 40),
                       (1, 15), (3, 30), (5, 45), (7, 60)]:
            rows.append(
                (eid, datetime.datetime(2024, 1, 5), u, "purchase",
                 float(val), "{}")
            )
            eid += 1
        _write(
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, event_type string, "
                "value double, props string",
            ),
            sf,
            "events",
        )
        out = {r["quantile_pct"]: r for r in
               quantile_treatment_effects(spark, sf).collect()}
        assert out[50]["control_value"] == 20.0
        assert out[50]["treatment_value"] == 30.0
        assert out[50]["qte"] == 10.0
        assert out[90]["qte"] == 20.0
        assert out[25]["qte"] == 5.0


class TestStreamingE2ERound8:
    def test_streaming_windows_by_hand(self, spark, tmp_path):
        """4 events straddling one 6-hour boundary: window 00:00 gets
        {click:2 (350 cents), view:1}, window 06:00 gets {view:1} —
        counted through a real multi-micro-batch stream."""
        import datetime

        from couchwarehouse_spark.plans.streaming_e2e import (
            streaming_window_counts_e2e,
        )

        sf = str(tmp_path / "sf")
        rows = [
            (0, datetime.datetime(2024, 1, 1, 1, 0), 1, "click", 1.0, "{}"),
            (1, datetime.datetime(2024, 1, 1, 2, 0), 1, "click", 2.5, "{}"),
            (2, datetime.datetime(2024, 1, 1, 5, 59), 2, "view", 1.0, "{}"),
            (3, datetime.datetime(2024, 1, 1, 6, 0), 2, "view", 1.0, "{}"),
        ]
        _write(
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, event_type string, "
                "value double, props string",
            ),
            sf,
            "events",
        )
        out = {
            (r["win_start"], r["event_type"]): (r["n_events"], r["value_cents"])
            for r in streaming_window_counts_e2e(spark, sf).collect()
        }
        assert out == {
            ("2024-01-01 00:00", "click"): (2, 350),
            ("2024-01-01 00:00", "view"): (1, 100),
            ("2024-01-01 06:00", "view"): (1, 100),
        }

    def test_streaming_dedup_exactly_once_by_hand(self, spark, tmp_path):
        """3 docs arrive 3x each across micro-batches; the state store
        must admit each doc_id exactly once."""
        from couchwarehouse_spark.plans.streaming_e2e import streaming_dedup_e2e

        sf = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                [(0, "x", "en", "sA", 10), (1, "x", "en", "sA", 20),
                 (2, "x", "en", "sB", 5)],
                "doc_id long, text string, lang string, source string, n_chars long",
            ),
            sf,
            "documents",
        )
        out = {r["source"]: (r["n_unique_docs"], r["total_chars"])
               for r in streaming_dedup_e2e(spark, sf).collect()}
        assert out == {"sA": (2, 30), "sB": (1, 5)}


class TestWarehouseStreamingIngestE2E:
    def test_streaming_ingest_by_hand(self, spark, tmp_path):
        """Four orders streamed through the real warehouse in seq
        order across micro-batches: key 63 amends, key 90 tombstones,
        keys 9/18 survive unchanged."""
        from couchwarehouse_spark.plans.streaming_e2e import (
            warehouse_streaming_ingest_e2e,
        )

        sf = str(tmp_path / "sf")
        rows = [
            (9, 1, "O", 100.0),
            (63, 2, "O", 120.0),   # % 7 == 0 -> amended
            (90, 3, "P", 180.0),   # % 10 == 0 -> tombstoned
            (18, 4, "F", 200.0),
        ]
        _write(
            spark.createDataFrame(
                [(k, c, s, t, "1996-01-02") for k, c, s, t in rows],
                "o_orderkey long, o_custkey long, o_orderstatus string, "
                "o_totalprice double, o_orderdate string",
            ),
            sf,
            "orders",
        )
        out = {r["status"]: (r["n_orders"], r["total_revenue"])
               for r in warehouse_streaming_ingest_e2e(spark, sf).collect()}
        assert out == {
            "O": (1, 100.0),
            "F": (1, 200.0),
            "amended": (1, 120.0),
        }


class TestTrendAndPairedRound8:
    def test_mann_kendall_by_hand(self, spark, tmp_path):
        """Counts (1,2,3,4) strictly rising: S = 6 pairs all +1 = 6;
        no ties -> var = 4*3*13/18; Z = 5/sqrt(26/3) = 1.6977."""
        import datetime
        import math

        from couchwarehouse_spark.plans.statistics import mann_kendall_trend

        sf = str(tmp_path / "sf")
        rows, eid = [], 0
        for day in range(1, 5):
            for _ in range(day):
                rows.append(
                    (eid, datetime.datetime(2024, 1, day, 8), 1, "click",
                     1.0, "{}")
                )
                eid += 1
        _write(
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, event_type string, "
                "value double, props string",
            ),
            sf,
            "events",
        )
        [row] = mann_kendall_trend(spark, sf).collect()
        assert (row["n_days"], row["s_stat"]) == (4, 6)
        assert row["mk_z"] == round(5 / math.sqrt(4 * 3 * 13 / 18), 4)

    def test_mcnemar_by_hand(self, spark, tmp_path):
        """u1 pre-only, u2+u3 post-only, u4 both: b=1, c=2 ->
        chi2 = 1/3."""
        import datetime

        from couchwarehouse_spark.plans.statistics import mcnemar_paired_test

        sf = str(tmp_path / "sf")
        pre = datetime.datetime(2024, 1, 10)
        post = datetime.datetime(2024, 1, 20)
        rows = [
            (0, pre, 1, "purchase", 1.0, "{}"),
            (1, post, 1, "view", 1.0, "{}"),      # u1: pre only
            (2, post, 2, "purchase", 1.0, "{}"),  # u2: post only
            (3, post, 3, "purchase", 1.0, "{}"),  # u3: post only
            (4, pre, 4, "purchase", 1.0, "{}"),
            (5, post, 4, "purchase", 1.0, "{}"),  # u4: both
        ]
        _write(
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long, event_type string, "
                "value double, props string",
            ),
            sf,
            "events",
        )
        [row] = mcnemar_paired_test(spark, sf).collect()
        assert (row["both_periods"], row["pre_only"], row["post_only"]) == (1, 1, 2)
        assert row["mcnemar_chi2"] == round(1 / 3, 4)
