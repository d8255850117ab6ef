"""Planted-fixture golden tests for round 10.

Round 10 opens by closing the r9 ADVICE item: the Benjamini-Hochberg
z denominator was unguarded for the degenerate all-convert /
none-convert corpus shapes (xx=0 or xx=nn gives 0/0) and ranked by a
then-NULLable p_micro whose NULL ordering differs between Spark
(NULLS FIRST asc) and DuckDB (NULLS LAST). Both lanes now nullif the
pooled-variance denominator and coalesce the Chernoff p to exactly
1.0 (1_000_000 micro) when the z statistic is undefined, so ranking
never sees a NULL and the step-up frontier stays integer-decided.
These tests plant exactly those shapes and assert BOTH lanes agree.
"""

from __future__ import annotations

import os


def _write(df, sf_dir: str, name: str) -> None:
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{sf_dir}/{name}.parquet")


def _events_valued(spark, rows):
    """rows: (event_id, event_type, value)."""
    from datetime import datetime

    ts = datetime(2024, 1, 1, 0, 0, 0)
    return spark.createDataFrame(
        [(i, ts, 1, et, float(v), "{}") for i, et, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _events(spark, rows):
    """rows: (event_id, ts_string, event_type)."""
    from datetime import datetime

    return spark.createDataFrame(
        [
            (i, datetime.strptime(ts, "%Y-%m-%d %H:%M:%S"), 1, et, 1.0, "{}")
            for i, ts, et in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _duck_sql(sf_dir: str, sql: str):
    """Run oracle SQL on the planted fixture dir and return a pandas
    frame (Spark writes <table>.parquet as a DIRECTORY of parts)."""
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{sf_dir}/events.parquet/*.parquet'"
    )
    out = con.sql(sql).df()
    con.close()
    return out


class TestBenjaminiHochbergDegenerate:
    def test_none_convert_yields_p1_not_crash(self, spark, tmp_path):
        """xx = 0 (no event anywhere reaches the conversion value):
        the pooled variance is 0, z is undefined -> NULL z_stat,
        p coalesced to exactly 1.0, nothing rejected, and the rank
        order is decided by event_type alone — in BOTH lanes."""
        from couchwarehouse_spark.plans.statistics import (
            benjamini_hochberg_fdr,
        )
        from tests.oracle_utils import assert_frames_match

        sf = str(tmp_path / "sf")
        _write(
            _events_valued(
                spark,
                [
                    (1, "view", 1),
                    (2, "view", 2),
                    (3, "click", 3),
                    (4, "click", 4),
                ],
            ),
            sf,
            "events",
        )
        out = benjamini_hochberg_fdr(spark, sf).toPandas()
        assert list(out["event_type"]) == ["click", "view"]
        assert out["z_stat"].isna().all()
        assert (out["p_chernoff"] == 1.0).all()
        assert (~out["rejected"]).all()
        from couchwarehouse_spark.plans import ORACLES

        assert_frames_match(
            out,
            _duck_sql(sf, ORACLES["benjamini_hochberg_fdr"]),
            "benjamini_hochberg_fdr/none_convert",
        )

    def test_all_convert_yields_p1_not_crash(self, spark, tmp_path):
        """xx = nn (every event converts): 1 - xx/nn = 0 collapses the
        pooled variance the other way; same NULL-z / p=1.0 outcome."""
        from couchwarehouse_spark.plans.statistics import (
            benjamini_hochberg_fdr,
        )
        from couchwarehouse_spark.plans import ORACLES
        from tests.oracle_utils import assert_frames_match

        sf = str(tmp_path / "sf")
        _write(
            _events_valued(
                spark,
                [
                    (1, "view", 90),
                    (2, "view", 95),
                    (3, "click", 80),
                    (4, "purchase", 70),
                ],
            ),
            sf,
            "events",
        )
        out = benjamini_hochberg_fdr(spark, sf).toPandas()
        assert out["z_stat"].isna().all()
        assert (out["p_chernoff"] == 1.0).all()
        assert (~out["rejected"]).all()
        assert_frames_match(
            out,
            _duck_sql(sf, ORACLES["benjamini_hochberg_fdr"]),
            "benjamini_hochberg_fdr/all_convert",
        )

    def test_healthy_shape_still_ranks_and_rejects(self, spark, tmp_path):
        """A lopsided conversion contrast still produces a finite z,
        a sub-alpha Chernoff p, and a rejection — and the two lanes
        agree bit-for-bit after the micro quantization."""
        from couchwarehouse_spark.plans.statistics import (
            benjamini_hochberg_fdr,
        )
        from couchwarehouse_spark.plans import ORACLES
        from tests.oracle_utils import assert_frames_match

        sf = str(tmp_path / "sf")
        rows = [(i, "hot", 99) for i in range(40)]
        rows += [(100 + i, "cold", 1) for i in range(40)]
        rows += [(200, "hot", 1), (201, "cold", 99)]
        _write(_events_valued(spark, rows), sf, "events")
        out = benjamini_hochberg_fdr(spark, sf).toPandas()
        by = {r.event_type: r for r in out.itertuples()}
        assert by["hot"].n_conv == 40 and by["cold"].n_conv == 1
        assert by["hot"].rejected and by["cold"].rejected
        assert by["hot"].p_chernoff < 0.2
        assert_frames_match(
            out,
            _duck_sql(sf, ORACLES["benjamini_hochberg_fdr"]),
            "benjamini_hochberg_fdr/healthy",
        )


def _duck_tables(sf_dir: str, sql: str, tables=("events",)):
    """Run oracle SQL against planted fixture dirs (Spark part-file
    directories) with the given tables registered as views."""
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{sf_dir}/{t}.parquet/*.parquet'"
        )
    out = con.sql(sql).df()
    con.close()
    return out


def _docs(spark, rows):
    """rows: (doc_id, text, n_chars)."""
    return spark.createDataFrame(
        [(i, t, "en", "s", n) for i, t, n in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


class TestChao1Richness:
    def test_hand_computed_estimate(self, spark, tmp_path):
        """tf over 'a a b c' + 'd d' : V=4, N=6, f1=2 (b,c), f2=2
        (a,d) -> chao1 = 4 + 2*1/(2*3) = 4.333333 -> 4.33;
        coverage = 1 - 2/6 = 0.666667."""
        from couchwarehouse_spark.plans.text import chao1_vocab_richness

        sf = str(tmp_path / "sf")
        _write(
            _docs(spark, [(1, "a a b c", 7), (2, "d d", 3)]), sf, "documents"
        )
        (r,) = chao1_vocab_richness(spark, sf).collect()
        assert (r.vocab, r.total_tokens, r.hapax_f1, r.dis_f2) == (4, 6, 2, 2)
        assert r.chao1_estimate == 4.33
        assert r.good_coverage == 0.666667


class TestHillTailIndex:
    def test_hand_computed_alpha(self, spark, tmp_path):
        """Top-101 lengths = {1000, 100 x 100}: threshold 100,
        hill_sum = ln(1000) - ln(100) = ln(10) in nano-nats,
        alpha = 100/ln(10)."""
        import math

        from couchwarehouse_spark.plans.statistics import hill_tail_index

        rows = [(0, "t", 1000)]
        rows += [(i, "t", 100) for i in range(1, 101)]
        rows += [(100 + i, "t", 10) for i in range(1, 100)]
        sf = str(tmp_path / "sf")
        _write(_docs(spark, rows), sf, "documents")
        (r,) = hill_tail_index(spark, sf).collect()
        assert r.k == 100 and r.x_thresh == 100
        expected_sum = round(1e9 * math.log(1000)) - round(1e9 * math.log(100))
        assert r.hill_sum_nano == expected_sum
        assert r.hill_alpha == round(100 * 1e9 / expected_sum, 4)

    def test_constant_corpus_yields_null_alpha(self, spark, tmp_path):
        """All-equal lengths: hill_sum = 0 -> NULL alpha, no crash."""
        from couchwarehouse_spark.plans.statistics import hill_tail_index

        sf = str(tmp_path / "sf")
        _write(
            _docs(spark, [(i, "t", 64) for i in range(150)]), sf, "documents"
        )
        (r,) = hill_tail_index(spark, sf).collect()
        assert r.hill_sum_nano == 0 and r.hill_alpha is None


class TestGrubbsOutlier:
    def test_hand_computed_g(self, spark, tmp_path):
        """Daily counts [10,10,10,22]: suspect day 4, |x-mean| = 9,
        sd = 6 -> G = 1.5."""
        from couchwarehouse_spark.plans.statistics import grubbs_outlier_test

        rows = []
        eid = 0
        for day, n in [(1, 10), (2, 10), (3, 10), (4, 22)]:
            for _ in range(n):
                eid += 1
                rows.append((eid, f"2024-03-0{day} 12:00:00", "view"))
        sf = str(tmp_path / "sf")
        _write(_events(spark, rows), sf, "events")
        (r,) = grubbs_outlier_test(spark, sf).collect()
        assert r.suspect_day == "2024-03-04"
        assert r.suspect_count == 22 and r.n_days == 4
        assert r.grubbs_g == 1.5

    def test_constant_series_null_g(self, spark, tmp_path):
        from couchwarehouse_spark.plans.statistics import grubbs_outlier_test

        rows = [
            (d * 10 + k, f"2024-03-0{d} 12:00:00", "view")
            for d in (1, 2, 3)
            for k in range(5)
        ]
        sf = str(tmp_path / "sf")
        _write(_events(spark, rows), sf, "events")
        (r,) = grubbs_outlier_test(spark, sf).collect()
        assert r.grubbs_g is None  # sd = 0


class TestLog2HistogramQuantiles:
    def test_hand_computed_buckets(self, spark, tmp_path):
        """Lengths [4,5,6,7,20,40,80,200]: p50 rank 4 -> value 7,
        bucket 2 ([4,7]); p90/p99 rank 8 -> value 200, bucket 7
        ([128,255]); every estimate's bucket contains the truth."""
        from couchwarehouse_spark.plans.statistics import (
            log2_histogram_quantiles,
        )

        vals = [4, 5, 6, 7, 20, 40, 80, 200]
        sf = str(tmp_path / "sf")
        _write(
            _docs(spark, [(i, "t", v) for i, v in enumerate(vals)]),
            sf,
            "documents",
        )
        out = {r.q_pct: r for r in log2_histogram_quantiles(spark, sf).collect()}
        assert out[50].bucket == 2
        assert (out[50].bucket_lo, out[50].bucket_hi) == (4, 7)
        assert out[50].exact_value == 7 and out[50].within_bucket
        assert out[50].sketch_estimate == 6  # 4 + 2
        for q in (90, 99):
            assert out[q].bucket == 7
            assert (out[q].bucket_lo, out[q].bucket_hi) == (128, 255)
            assert out[q].exact_value == 200 and out[q].within_bucket


class TestPermutationTestAB:
    def test_obs_diff_exact_and_lanes_agree(self, spark, tmp_path):
        """Users {1,3} (odd) spend 100.00 each, users {2,4} (even)
        spend 1.00 each: obs diff = 9900 cents -> 9_900_000_000 in
        micro-quantized cent units. The hash-indexed replicate tail
        must agree bit-for-bit with the DuckDB lane."""
        from couchwarehouse_spark.plans import ORACLES
        from couchwarehouse_spark.plans.statistics import permutation_test_ab
        from tests.oracle_utils import assert_frames_match

        rows = []
        for i, (u, v) in enumerate(
            [(1, 100.0), (2, 1.0), (3, 100.0), (4, 1.0)]
        ):
            rows.append((i, u, v))
        from datetime import datetime

        df = spark.createDataFrame(
            [
                (i, datetime(2024, 1, 1), u, "view", v, "{}")
                for i, u, v in rows
            ],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        sf = str(tmp_path / "sf")
        _write(df, sf, "events")
        out = permutation_test_ab(spark, sf).toPandas()
        r = out.iloc[0]
        assert r.n_users == 4 and r.n_replicates == 200
        assert r.obs_diff_micro == 9_900_000_000
        assert r.p_value == round((1 + r.n_ge) / 201, 6)
        assert_frames_match(
            out,
            _duck_tables(sf, ORACLES["permutation_test_ab"]),
            "permutation_test_ab/fixture",
        )


class TestPageHinkleyDrift:
    def test_level_shift_alarms_exactly_once(self, spark, tmp_path):
        """Counts [10,10,10,10,110]: increments vs the running mean
        are -2 micro-units of slack each flat day; day 5 adds
        110 - 30 - 2 = 78 -> PH gap 78.0 > lambda 50 -> alarm on day
        5 only."""
        from couchwarehouse_spark.plans.events_windows import (
            page_hinkley_drift,
        )

        rows = []
        eid = 0
        for day, n in [(1, 10), (2, 10), (3, 10), (4, 10), (5, 110)]:
            for _ in range(n):
                eid += 1
                rows.append((eid, f"2024-03-0{day} 12:00:00", "view"))
        sf = str(tmp_path / "sf")
        _write(_events(spark, rows), sf, "events")
        out = {r.day: r for r in page_hinkley_drift(spark, sf).collect()}
        assert [out[d].alarm for d in sorted(out)] == [
            False, False, False, False, True,
        ]
        assert out["2024-03-05"].ph_stat == 78.0
        assert out["2024-03-04"].ph_stat == 0.0


class TestLjungBox:
    def test_alternating_series_acf(self, spark, tmp_path):
        """Counts [1,2,1,2,1,2]: nd = [-3,3,-3,3,-3,3], den 54;
        r1 = -45/54 = -0.833333, r2 = 36/54 = 0.666667; lags with no
        pairs (6,7) produce no rows."""
        from couchwarehouse_spark.plans.events_windows import ljung_box_test

        rows = []
        eid = 0
        for day, n in enumerate([1, 2, 1, 2, 1, 2], start=1):
            for _ in range(n):
                eid += 1
                rows.append((eid, f"2024-03-0{day} 12:00:00", "view"))
        sf = str(tmp_path / "sf")
        _write(_events(spark, rows), sf, "events")
        out = {r.lag: r for r in ljung_box_test(spark, sf).collect()}
        assert sorted(out) == [1, 2, 3, 4, 5]
        assert out[1].acf_r == -0.833333
        assert out[2].acf_r == 0.666667
        assert out[1].q_stat == round(6 * 8 * (0.833333**2 / 5), 4)


class TestMccConfusionScalars:
    def test_matches_independent_reimplementation(self, spark, tmp_path):
        """Cells recomputed in numpy with the same fixed weights; MCC,
        balanced accuracy and Youden J from the textbook formulas."""
        import math

        from couchwarehouse_spark.plans.similarity import (
            CONF_THRESHOLD,
            ML_BIAS,
            ML_WEIGHTS,
            mcc_confusion_scalars,
        )

        vecs = [
            [((v * 13 + i * 7) % 21 - 10) / 10.0 for i in range(64)]
            for v in range(12)
        ]
        df = spark.createDataFrame(
            [(v, vecs[v], v % 4) for v in range(12)],
            "vec_id long, embedding array<float>, label int",
        )
        sf = str(tmp_path / "sf")
        _write(df, sf, "embeddings")
        # independent scoring at float32-cast-to-double precision
        tp = fp = fn = tn = 0
        for v in range(12):
            import struct as _struct

            emb32 = [
                _struct.unpack("f", _struct.pack("f", x))[0] for x in vecs[v]
            ]
            z = sum(a * b for a, b in zip(emb32, ML_WEIGHTS)) + ML_BIAS
            pred = 1.0 / (1.0 + math.exp(-z)) >= CONF_THRESHOLD
            true = (v % 4) % 2 == 0
            tp += true and pred
            fp += (not true) and pred
            fn += true and not pred
            tn += (not true) and not pred
        (r,) = mcc_confusion_scalars(spark, sf).collect()
        assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, fn, tn)
        denom = math.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
        if denom:
            assert r.mcc == round((tp * tn - fp * fn) / denom, 6)
        tpr, tnr = tp / (tp + fn), tn / (tn + fp)
        assert r.balanced_accuracy == round((tpr + tnr) / 2, 6)
        assert r.youden_j == round(tpr + tnr - 1, 6)


class TestCramerVonMises:
    def test_hand_computed_statistic(self, spark, tmp_path):
        """src0 lengths {1,1,2}, src1 {2,3}: cumA=[2,3,3], cumB=[0,1,2],
        diffs m*cumA-n*cumB = [4,3,0], weights [2,2,1] ->
        NUM = 2*16+2*9 = 50, T = 50/(3*2*5*5) = 0.333333."""
        from couchwarehouse_spark.plans.statistics import (
            cramer_von_mises_drift,
        )

        rows = [
            (1, "t", "src0", 1),
            (2, "t", "src0", 1),
            (3, "t", "src0", 2),
            (4, "t", "src1", 2),
            (5, "t", "src1", 3),
        ]
        df = spark.createDataFrame(
            [(i, t, "en", s, n) for i, t, s, n in rows],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
        sf = str(tmp_path / "sf")
        _write(df, sf, "documents")
        (r,) = cramer_von_mises_drift(spark, sf).collect()
        assert (r.n_a, r.n_b) == (3, 2)
        assert r.cvm_numerator == 50
        assert r.cvm_stat == 0.333333


class TestTripleItemsetSupport:
    def test_hand_computed_triples(self, spark, tmp_path):
        """Three baskets {A,B,C} + one {A,B}: the only triple has
        support 3/4; the 0.1% gate passes it."""
        from couchwarehouse_spark.plans.statistics import (
            triple_itemset_support,
        )

        part = spark.createDataFrame(
            [(1, "A"), (2, "B"), (3, "C")], "p_partkey long, p_brand string"
        )
        li_rows = []
        for ok in (10, 20, 30):
            li_rows += [(ok, 1), (ok, 2), (ok, 3)]
        li_rows += [(40, 1), (40, 2)]
        li = spark.createDataFrame(li_rows, "l_orderkey long, l_partkey long")
        sf = str(tmp_path / "sf")
        _write(part, sf, "part")
        _write(li, sf, "lineitem")
        out = triple_itemset_support(spark, sf).collect()
        assert len(out) == 1
        (r,) = out
        assert (r.brand_a, r.brand_b, r.brand_c) == ("A", "B", "C")
        assert r.sup_abc == 3 and r.support == 0.75


class TestPhashNearDup:
    def test_identical_payloads_verify_at_zero(self, spark, tmp_path):
        """Two identical texts among four docs: exactly one verified
        duplicate pair at Hamming 0; the census agrees across lanes."""
        from couchwarehouse_spark.plans import ORACLES
        from couchwarehouse_spark.plans.multimodal_plan import (
            multimodal_phash_near_dup,
        )
        from tests.oracle_utils import assert_frames_match

        rows = [
            (1, "the same payload bytes", 22),
            (2, "the same payload bytes", 22),
            (3, "something different", 19),
            (4, "another thing entirely", 22),
        ]
        sf = str(tmp_path / "sf")
        _write(_docs(spark, [(i, t, n) for i, t, n in rows]), sf, "documents")
        out = multimodal_phash_near_dup(spark, sf).toPandas()
        r = out.iloc[0]
        assert r.n_items == 4
        assert r.n_dup_pairs == 1 and r.min_hamming == 0
        assert_frames_match(
            out,
            _duck_tables(sf, ORACLES["multimodal_phash_near_dup"],
                         tables=("documents",)),
            "multimodal_phash_near_dup/fixture",
        )


class TestConstraintQuarantineE2E:
    def test_offenders_diverted_survivors_merged(self, spark, tmp_path):
        """Keys {12,24,60,84,120} (all %12==0): 24 and 120 exceed the
        cap (quarantined; 120 also tombstoned — no row either way), 60
        tombstoned, 84 amended, 12 survives as-is."""
        from couchwarehouse_spark.plans.warehouse_e2e import (
            constraint_quarantine_e2e,
        )

        orders = spark.createDataFrame(
            [
                (12, "O", 100_000.0, 1),
                (24, "O", 350_000.0, 2),
                (60, "O", 100_000.0, 3),
                (84, "O", 200_000.0, 4),
                (120, "O", 400_000.0, 5),
            ],
            "o_orderkey long, o_orderstatus string, o_totalprice double, "
            "o_custkey long",
        )
        sf = str(tmp_path / "sf")
        _write(orders, sf, "orders")
        out = {r.status: r for r in constraint_quarantine_e2e(spark, sf).collect()}
        assert out["O"].n_rows == 1 and out["O"].total_value == 100_000.0
        assert out["amended"].n_rows == 1
        assert out["amended"].total_value == 200_000.0
        assert out["__quarantined"].n_rows == 2
        assert out["__quarantined"].total_value == 750_000.0


class TestHoltWinters:
    def test_pure_weekly_seasonal_series_zero_error_after_warmup(
        self, spark, tmp_path
    ):
        """A perfectly weekly series [10,20,30,10,20,30,...] with
        season length 7 over the 3-day cycle doesn't align, so plant
        a TRUE 7-periodic series: counts = base[dow] repeated. With
        gamma-smoothing the one-step forecasts reproduce the pattern
        and MAE shrinks to near 0; we assert the recursion against an
        independent python replay."""
        from couchwarehouse_spark.plans.events_windows import (
            HW_SEASON,
            holt_winters_backtest,
        )

        base = [10, 25, 13, 40, 8, 31, 19]
        counts = base * 4  # 28 days, perfectly 7-periodic
        rows = []
        eid = 0
        for day, n in enumerate(counts, start=1):
            for _ in range(n):
                eid += 1
                rows.append((eid, f"2024-03-{day:02d} 12:00:00", "view"))
        sf = str(tmp_path / "sf")
        _write(_events(spark, rows), sf, "events")
        (r,) = holt_winters_backtest(spark, sf).collect()
        # independent replay
        m = HW_SEASON
        level = sum(counts[:m]) / float(m)
        trend = 0.0
        s = [counts[i] - level for i in range(m)]
        err_sum, n_err = 0.0, 0
        for t in range(m, len(counts)):
            fc = (level + trend) + s[0]
            err_sum += abs(counts[t] - fc)
            n_err += 1
            nl = (counts[t] - s[0]) / 2 + (level + trend) / 2
            trend = (nl - level) / 2 + trend / 2
            sn = (counts[t] - nl) / 2 + s[0] / 2
            level = nl
            s = s[1:] + [sn]
        assert r.n_days == 28
        assert r.mae == round(err_sum / n_err, 4)
        assert r.final_level == round(level, 4)
        assert r.final_trend == round(trend, 4)
        # a perfectly periodic series is learned: error is tiny
        assert r.mae < 1.0

    def test_short_series_dropped(self, spark, tmp_path):
        from couchwarehouse_spark.plans.events_windows import (
            holt_winters_backtest,
        )

        rows = [
            (d, f"2024-03-0{d} 12:00:00", "view") for d in range(1, 7)
        ]  # 6 days < season+1
        sf = str(tmp_path / "sf")
        _write(_events(spark, rows), sf, "events")
        assert holt_winters_backtest(spark, sf).count() == 0


class TestEffectiveSampleSize:
    def test_alternating_series_truncates_at_lag1(self, spark, tmp_path):
        """[1,2,1,2,1,2]: r1 < 0, so the initial-positive rule keeps
        NO lags -> ESS = n."""
        from couchwarehouse_spark.plans.events_windows import (
            effective_sample_size,
        )

        rows = []
        eid = 0
        for day, n in enumerate([1, 2, 1, 2, 1, 2], start=1):
            for _ in range(n):
                eid += 1
                rows.append((eid, f"2024-03-0{day} 12:00:00", "view"))
        sf = str(tmp_path / "sf")
        _write(_events(spark, rows), sf, "events")
        (r,) = effective_sample_size(spark, sf).collect()
        assert r.n_days == 6
        assert r.n_lags_used == 0 and r.sum_r_micro == 0
        assert r.autocorr_time == 1.0 and r.ess == 6.0

    def test_trending_series_shrinks_ess(self, spark, tmp_path):
        """A monotone ramp has strongly positive short-lag ACF: some
        lags are kept and ESS < n."""
        from couchwarehouse_spark.plans.events_windows import (
            effective_sample_size,
        )

        rows = []
        eid = 0
        for day, n in enumerate([1, 2, 4, 7, 11, 16, 22, 29], start=1):
            for _ in range(n):
                eid += 1
                rows.append((eid, f"2024-03-0{day} 12:00:00", "view"))
        sf = str(tmp_path / "sf")
        _write(_events(spark, rows), sf, "events")
        (r,) = effective_sample_size(spark, sf).collect()
        assert r.n_lags_used >= 1
        assert r.ess < r.n_days


class TestHurstExponent:
    def test_persistent_ramp_has_high_hurst(self, spark, tmp_path):
        """A monotone ramp is maximally persistent: H well above 0.5;
        32 days give 8/4/2 complete blocks."""
        from couchwarehouse_spark.plans.events_windows import (
            hurst_exponent_rs,
        )

        rows = []
        eid = 0
        for day in range(1, 33):
            for _ in range(day):  # counts 1..32
                eid += 1
                ts = f"2024-03-{day:02d} 12:00:00" if day <= 31 else "2024-04-01 12:00:00"
                rows.append((eid, ts, "view"))
        sf = str(tmp_path / "sf")
        _write(_events(spark, rows), sf, "events")
        out = {r.window_size: r for r in hurst_exponent_rs(spark, sf).collect()}
        assert sorted(out) == [4, 8, 16]
        assert out[4].n_blocks == 8
        assert out[8].n_blocks == 4
        assert out[16].n_blocks == 2
        h = out[4].hurst
        assert all(r.hurst == h for r in out.values())
        assert h > 0.7  # strongly persistent


class TestPrAucClassifier:
    def test_matches_independent_ap(self, spark, tmp_path):
        """AP recomputed independently with the documented tie-block
        convention over micro-quantized scores."""
        from couchwarehouse_spark.plans.similarity import (
            ML_BIAS,
            ML_WEIGHTS,
            pr_auc_classifier,
        )

        vecs = [
            [((v * 11 + i * 5) % 17 - 8) / 8.0 for i in range(64)]
            for v in range(10)
        ]
        df = spark.createDataFrame(
            [(v, vecs[v], v % 3) for v in range(10)],
            "vec_id long, embedding array<float>, label int",
        )
        sf = str(tmp_path / "sf")
        _write(df, sf, "embeddings")
        import struct as _struct
        from collections import defaultdict

        groups = defaultdict(lambda: [0, 0])  # score_micro -> [p, n]
        for v in range(10):
            emb32 = [
                _struct.unpack("f", _struct.pack("f", x))[0] for x in vecs[v]
            ]
            z = sum(a * b for a, b in zip(emb32, ML_WEIGHTS)) + ML_BIAS
            sm = round(1_000_000 * z)
            pos = (v % 3) % 2 == 1
            groups[sm][0] += pos
            groups[sm][1] += 1
        tp = nn = 0
        ap_sum_micro = 0
        for sm in sorted(groups, reverse=True):
            p, n = groups[sm]
            tp += p
            nn += n
            if p:
                ap_sum_micro += round(1_000_000.0 * p * tp / nn)
        n_pos = sum(p for p, _ in groups.values())
        (r,) = pr_auc_classifier(spark, sf).collect()
        assert r.n_pos == n_pos and r.n_neg == 10 - n_pos
        assert r.ap_sum_micro == ap_sum_micro
        assert r.average_precision == round(ap_sum_micro / 1e6 / n_pos, 6)


class TestTheilAtkinson:
    def test_hand_computed_indices(self, spark, tmp_path):
        """Sources with token masses 2 and 8: Theil and Atkinson from
        the textbook formulas under the same nano quantization."""
        import math

        from couchwarehouse_spark.plans.curation import (
            theil_atkinson_concentration,
        )

        df = spark.createDataFrame(
            [
                (1, "a b", "en", "s1", 3),
                (2, "a b c d e f g h", "en", "s2", 15),
            ],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
        sf = str(tmp_path / "sf")
        _write(df, sf, "documents")
        (r,) = theil_atkinson_concentration(spark, sf).collect()
        assert r.n_sources == 2 and r.total_tokens == 10
        t_nano = sum(
            round(1e9 * x * math.log(x * 2 / 10) / 10) for x in (2, 8)
        )
        assert r.theil_t == round(t_nano / 1e9, 6)
        ln_nano = sum(round(1e9 * math.log(x)) for x in (2, 8))
        atk = 1 - math.exp(ln_nano / 1e9 / 2) / 5.0
        assert r.atkinson_1 == round(atk, 6)

    def test_uniform_mix_is_zero(self, spark, tmp_path):
        from couchwarehouse_spark.plans.curation import (
            theil_atkinson_concentration,
        )

        df = spark.createDataFrame(
            [
                (1, "a b c", "en", "s1", 5),
                (2, "x y z", "en", "s2", 5),
            ],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
        sf = str(tmp_path / "sf")
        _write(df, sf, "documents")
        (r,) = theil_atkinson_concentration(spark, sf).collect()
        assert r.theil_t == 0.0 and r.atkinson_1 == 0.0


def _orders(spark, rows):
    """rows: (o_orderkey, o_orderstatus, o_totalprice, o_custkey)."""
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderstatus string, o_totalprice double, "
        "o_custkey long",
    )


class TestRestoreVersionE2E:
    def test_restore_undoes_the_incident_delete(self, spark, tmp_path):
        """Keys {13,26,91,130} (all %13==0): 130 tombstoned, 91
        amended, 26 exceeds the delete_where cut (removed in v2,
        restored in v3); final census = as if the delete never ran."""
        from couchwarehouse_spark.plans.warehouse_e2e import (
            restore_version_e2e,
        )

        sf = str(tmp_path / "sf")
        _write(
            _orders(
                spark,
                [
                    (13, "O", 100_000.0, 1),
                    (26, "O", 200_000.0, 2),
                    (91, "O", 120_000.0, 3),
                    (130, "O", 90_000.0, 4),
                ],
            ),
            sf,
            "orders",
        )
        out = {r.status: r for r in restore_version_e2e(spark, sf).collect()}
        assert out["O"].n_orders == 2
        assert out["O"].total_revenue == 300_000.0  # 26 came back
        assert out["amended"].n_orders == 1
        assert out["amended"].total_revenue == 120_000.0


class TestCloneDivergenceE2E:
    def test_branch_frozen_live_diverges(self, spark, tmp_path):
        """Keys {15,30,105}: live applies the amendment (105) and the
        tombstone (30); the branch keeps all three as inserted —
        including the tombstoned id (fan-out exclusion)."""
        from couchwarehouse_spark.plans.warehouse_e2e import (
            clone_divergence_e2e,
        )

        sf = str(tmp_path / "sf")
        _write(
            _orders(
                spark,
                [
                    (15, "O", 50_000.0, 1),
                    (30, "P", 60_000.0, 2),
                    (105, "O", 70_000.0, 3),
                ],
            ),
            sf,
            "orders",
        )
        out = {
            (r.table_name, r.status): r
            for r in clone_divergence_e2e(spark, sf).collect()
        }
        assert out[("live", "O")].n_orders == 1  # key 15
        assert out[("live", "amended")].n_orders == 1  # key 105
        assert ("live", "P") not in out  # 30 tombstoned
        assert out[("branch", "O")].n_orders == 2  # 15 + 105 pre-amend
        assert out[("branch", "P")].n_orders == 1  # 30 survives on branch


class TestOverdispersion:
    def test_hand_computed_dispersion(self, spark, tmp_path):
        """Daily counts [2,4,6]: mean 4, var 4, dispersion 1.0,
        chi2 = 2.0."""
        from couchwarehouse_spark.plans.statistics import overdispersion_index

        rows = []
        eid = 0
        for day, n in [(1, 2), (2, 4), (3, 6)]:
            for _ in range(n):
                eid += 1
                rows.append((eid, f"2024-03-0{day} 12:00:00", "view"))
        sf = str(tmp_path / "sf")
        _write(_events(spark, rows), sf, "events")
        (r,) = overdispersion_index(spark, sf).collect()
        assert r.n_days == 3
        assert r.mean_daily == 4.0 and r.var_daily == 4.0
        assert r.dispersion == 1.0 and r.chi2_stat == 2.0

    def test_single_day_nulls(self, spark, tmp_path):
        from couchwarehouse_spark.plans.statistics import overdispersion_index

        rows = [(i, "2024-03-01 12:00:00", "view") for i in range(5)]
        sf = str(tmp_path / "sf")
        _write(_events(spark, rows), sf, "events")
        (r,) = overdispersion_index(spark, sf).collect()
        assert r.var_daily is None and r.dispersion is None


class TestCaptureRecapture:
    def test_chapman_formula_exact(self, spark, tmp_path):
        """The counts are hash-determined; assert the estimate equals
        the Chapman formula over THOSE counts and the verdict matches
        the tolerance arithmetic."""
        from couchwarehouse_spark.plans.statistics import (
            CRC_TOL,
            capture_recapture_estimate,
        )

        docs = [(i, f"document body number {i}", 20) for i in range(200)]
        sf = str(tmp_path / "sf")
        _write(_docs(spark, docs), sf, "documents")
        (r,) = capture_recapture_estimate(spark, sf).collect()
        assert r.n_true == 200
        est = (r.n1 + 1) * (r.n2 + 1) / (r.m + 1) - 1
        assert r.chapman_estimate == round(est, 2)
        assert r.within_tol == (abs(est - 200) <= CRC_TOL * 200)


class TestPinballLoss:
    def test_hand_computed_loss_and_coverage(self, spark, tmp_path):
        """Lengths 1..10 in one source: p90 rank ceil(0.9*10)=9 ->
        predictor 9. Losses: y=10 -> 90, y=9 -> 0, y<9 -> 10*(9-y);
        sum = 90 + 10*(8+7+...+1) = 450 -> mean 0.45; coverage 9/10."""
        from couchwarehouse_spark.plans.statistics import pinball_loss_eval

        docs = [(i, "t", i) for i in range(1, 11)]
        sf = str(tmp_path / "sf")
        _write(_docs(spark, docs), sf, "documents")
        (r,) = pinball_loss_eval(spark, sf).collect()
        assert r.predictor == 9
        assert r.mean_pinball == 0.45
        assert r.coverage == 0.9


class TestUpdateWhereCdcE2E:
    def test_update_applies_and_snapshot_diff_matches(self, spark, tmp_path):
        """Keys {17,34,119,170}: 170 tombstoned; 17 (30k < 50k cut)
        discounted and doubled; 119 amended; 34 untouched. The
        pinned-snapshot diff row counts exactly the one update."""
        from couchwarehouse_spark.plans.warehouse_e2e import (
            update_where_cdc_e2e,
        )

        sf = str(tmp_path / "sf")
        _write(
            _orders(
                spark,
                [
                    (17, "O", 30_000.0, 1),
                    (34, "O", 100_000.0, 2),
                    (119, "O", 200_000.0, 3),
                    (170, "O", 40_000.0, 4),
                ],
            ),
            sf,
            "orders",
        )
        out = {r.status: r for r in update_where_cdc_e2e(spark, sf).collect()}
        assert out["discounted"].n_rows == 1
        assert out["discounted"].total_value == 60_000.0
        assert out["O"].n_rows == 1 and out["O"].total_value == 100_000.0
        assert out["amended"].n_rows == 1
        assert out["__cdf_updates"].n_rows == 1
        assert out["__cdf_updates"].total_value == 60_000.0


class TestCompactSmallFilesE2E:
    def test_census_doubles_and_layout_asserts_hold(self, spark, tmp_path):
        """Two disjoint-prefix waves of keys {18,36}: census is the
        doubled per-status census; the in-entry asserts prove buckets
        fragmented and compaction shrank the referenced file count."""
        from couchwarehouse_spark.plans.warehouse_e2e import (
            compact_small_files_e2e,
        )

        sf = str(tmp_path / "sf")
        rows = [
            (18 * i, "O" if i % 2 else "P", 1_000.0 * i, i)
            for i in range(1, 31)
        ]
        _write(_orders(spark, rows), sf, "orders")
        out = {r.status: r for r in compact_small_files_e2e(spark, sf).collect()}
        o_sum = sum(1_000.0 * i for i in range(1, 31) if i % 2)
        p_sum = sum(1_000.0 * i for i in range(1, 31) if i % 2 == 0)
        assert out["O"].n_rows == 30 and out["O"].total_value == 2 * o_sum
        assert out["P"].n_rows == 30 and out["P"].total_value == 2 * p_sum


class TestVacuumRetentionE2E:
    def test_head_survives_dropped_version_unreadable(self, spark, tmp_path):
        from couchwarehouse_spark.plans.warehouse_e2e import (
            vacuum_retention_e2e,
        )

        sf = str(tmp_path / "sf")
        _write(
            _orders(
                spark,
                [
                    (19, "O", 10_000.0, 1),
                    (38, "P", 20_000.0, 2),
                    (133, "O", 30_000.0, 3),
                    (190, "O", 40_000.0, 4),
                ],
            ),
            sf,
            "orders",
        )
        out = {r.status: r for r in vacuum_retention_e2e(spark, sf).collect()}
        assert out["O"].n_orders == 1 and out["O"].total_revenue == 10_000.0
        assert out["P"].n_orders == 1
        assert out["amended"].n_orders == 1
        assert out["amended"].total_revenue == 30_000.0


class TestRebucketE2E:
    def test_relayout_then_divergence(self, spark, tmp_path):
        """Keys {23,46,161,230}: rebucket to 4 buckets between the
        insert wave and the amendment/tombstone wave; 161 (=23*7)
        amended under the NEW layout, 230 tombstoned, the rest
        unchanged — and the in-entry asserts pin the layout change
        plus the old snapshot reading under its own layout."""
        from couchwarehouse_spark.plans.warehouse_e2e import rebucket_e2e

        sf = str(tmp_path / "sf")
        _write(
            _orders(
                spark,
                [
                    (23, "O", 10_000.0, 1),
                    (46, "P", 20_000.0, 2),
                    (161, "O", 30_000.0, 3),
                    (230, "O", 40_000.0, 4),
                ],
            ),
            sf,
            "orders",
        )
        out = {r.status: r for r in rebucket_e2e(spark, sf).collect()}
        assert out["O"].n_orders == 1 and out["O"].total_revenue == 10_000.0
        assert out["P"].n_orders == 1
        assert out["amended"].n_orders == 1
        assert out["amended"].total_revenue == 30_000.0
