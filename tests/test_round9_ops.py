"""Planted-fixture golden tests for round 9.

Round 9 opens by closing the four ADVICE items: degenerate input
shapes (n=1 groups, single-source ANOVA, single-day / all-tied
Mann-Kendall series, 2-day Holt series) used to throw
DIVIDE_BY_ZERO under Spark 4 ANSI while the DuckDB oracle emitted
NULL (or a 0/0 row). Both lanes now agree: NULL where the statistic
is undefined, dropped rows where the backtest has no forecasts.
These tests plant exactly those shapes and assert the NULLs / drops
by construction.
"""

from __future__ import annotations

import math
import os


def _write(df, sf_dir: str, name: str) -> None:
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{sf_dir}/{name}.parquet")


def _docs(spark, rows):
    """rows: (doc_id, lang, source, n_chars)."""
    return spark.createDataFrame(
        [(i, "t", lang, src, n) for i, lang, src, n in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
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


class TestWelchDegenerate:
    def test_n1_group_and_constant_lengths_yield_null_not_crash(
        self, spark, tmp_path
    ):
        """lang 'xx' has ONE doc (variance undefined -> NULL t and df);
        lang 'yy' has two docs with lengths CONSTANT and equal to the
        'en' baseline's constant lengths (se2 = 0 -> NULL t, NULL df).
        Means still compute exactly."""
        from couchwarehouse_spark.plans.statistics import welch_t_doclen

        sf = str(tmp_path / "sf")
        _write(
            _docs(
                spark,
                [
                    (1, "en", "s", 100),
                    (2, "en", "s", 100),
                    (3, "en", "s", 100),
                    (4, "xx", "s", 250),
                    (5, "yy", "s", 100),
                    (6, "yy", "s", 100),
                ],
            ),
            sf,
            "documents",
        )
        out = {r["lang"]: r for r in welch_t_doclen(spark, sf).collect()}
        assert set(out) == {"xx", "yy"}
        assert out["xx"]["n_docs"] == 1
        assert out["xx"]["mean_chars"] == 250.0
        assert out["xx"]["welch_t"] is None
        assert out["xx"]["welch_df"] is None
        assert out["yy"]["n_docs"] == 2
        assert out["yy"]["mean_chars"] == 100.0
        assert out["yy"]["welch_t"] is None
        assert out["yy"]["welch_df"] is None

    def test_healthy_groups_still_exact(self, spark, tmp_path):
        """Hand-computed Welch t/df on a 3-vs-2 fixture: en = {90,
        100, 110} (var 100), zz = {200, 240} (var 800). se2 = 100/3 +
        800/2 = 433.3..., t = (220-100)/sqrt(se2), df by
        Welch-Satterthwaite."""
        from couchwarehouse_spark.plans.statistics import welch_t_doclen

        sf = str(tmp_path / "sf")
        _write(
            _docs(
                spark,
                [
                    (1, "en", "s", 90),
                    (2, "en", "s", 100),
                    (3, "en", "s", 110),
                    (4, "zz", "s", 200),
                    (5, "zz", "s", 240),
                ],
            ),
            sf,
            "documents",
        )
        (r,) = welch_t_doclen(spark, sf).collect()
        se2 = 800 / 2 + 100 / 3
        t = (220 - 100) / math.sqrt(se2)
        df = se2 * se2 / ((800 / 2) ** 2 / 1 + (100 / 3) ** 2 / 2)
        assert r["lang"] == "zz"
        assert r["welch_t"] == round(t, 4)
        assert r["welch_df"] == round(df, 2)


class TestAnovaDegenerate:
    def test_single_source_yields_null_f(self, spark, tmp_path):
        """k = 1 -> (k-1) = 0 -> F undefined; eta² is 0/SST here (SST
        > 0), which is 0, not NULL."""
        from couchwarehouse_spark.plans.statistics import (
            anova_doclen_by_source,
        )

        sf = str(tmp_path / "sf")
        _write(
            _docs(spark, [(1, "en", "only", 10), (2, "en", "only", 30)]),
            sf,
            "documents",
        )
        (r,) = anova_doclen_by_source(spark, sf).collect()
        assert r["n_groups"] == 1
        assert r["f_stat"] is None
        assert r["eta_squared"] == 0.0

    def test_constant_lengths_yield_null_f_and_eta(self, spark, tmp_path):
        """Two sources, every doc the same length: SSW = SSB = SST = 0
        -> both statistics undefined -> NULL, no ANSI crash."""
        from couchwarehouse_spark.plans.statistics import (
            anova_doclen_by_source,
        )

        sf = str(tmp_path / "sf")
        _write(
            _docs(
                spark,
                [
                    (1, "en", "a", 50),
                    (2, "en", "a", 50),
                    (3, "en", "b", 50),
                    (4, "en", "b", 50),
                ],
            ),
            sf,
            "documents",
        )
        (r,) = anova_doclen_by_source(spark, sf).collect()
        assert r["n_groups"] == 2
        assert r["f_stat"] is None
        assert r["eta_squared"] is None

    def test_all_singleton_groups_yield_null_f(self, spark, tmp_path):
        """Every group n = 1 -> n_tot - k = 0 -> within-variance
        undefined -> NULL F (eta² still defined: SSW = 0 -> eta = 1)."""
        from couchwarehouse_spark.plans.statistics import (
            anova_doclen_by_source,
        )

        sf = str(tmp_path / "sf")
        _write(
            _docs(spark, [(1, "en", "a", 10), (2, "en", "b", 30)]),
            sf,
            "documents",
        )
        (r,) = anova_doclen_by_source(spark, sf).collect()
        assert r["f_stat"] is None
        assert r["eta_squared"] == 1.0


class TestMannKendallDegenerate:
    def test_single_day_and_all_tied_yield_null_z(self, spark, tmp_path):
        """'solo' is observed on ONE day (no pairs -> dropped by the
        inner join in both lanes); 'flat' has the same count every day
        (the tie term swallows the whole variance -> var18 = 0 ->
        NULL mk_z instead of ANSI DIVIDE_BY_ZERO); 'grow' (strictly
        rising) still gets its exact S and Z."""
        from couchwarehouse_spark.plans.statistics import mann_kendall_trend

        sf = str(tmp_path / "sf")
        rows = [(1, "2024-01-01 00:00:00", "solo")]
        eid = 2
        for day in (1, 2, 3):  # flat: 2 events each day
            for _ in range(2):
                rows.append((eid, f"2024-01-0{day} 00:00:00", "flat"))
                eid += 1
        for day, n in ((1, 1), (2, 2), (3, 3), (4, 4)):  # grow
            for _ in range(n):
                rows.append((eid, f"2024-01-0{day} 00:00:00", "grow"))
                eid += 1
        _write(_events(spark, rows), sf, "events")
        out = {r["event_type"]: r for r in mann_kendall_trend(spark, sf).collect()}
        # A single-day type produces zero (da < db) pairs, so the
        # inner join drops it in BOTH lanes (no S row at all).
        assert "solo" not in out
        assert out["flat"]["n_days"] == 3
        assert out["flat"]["s_stat"] == 0
        assert out["flat"]["mk_z"] is None
        # grow: all 6 pairs rising -> S = 6, no ties ->
        # var = 4*3*13/18 = 8.666..., z = (6-1)/sqrt(var)
        g = out["grow"]
        assert g["s_stat"] == 6
        assert g["mk_z"] == round(5 / math.sqrt(4 * 3 * 13 / 18), 4)


class TestHoltDegenerate:
    def test_two_day_series_dropped_in_both_lanes(self, spark, tmp_path):
        """A 2-day series initializes Holt state but never forecasts
        (MAE = 0/0): BOTH lanes drop it. The 4-day neighbor survives
        with its exact dyadic state."""
        from couchwarehouse_spark.plans.events_windows import (
            holt_linear_backtest,
        )

        sf = str(tmp_path / "sf")
        rows = []
        eid = 1
        for day, n in ((1, 3), (2, 5)):  # 'short': exactly 2 days
            for _ in range(n):
                rows.append((eid, f"2024-01-0{day} 00:00:00", "short"))
                eid += 1
        for day, n in ((1, 2), (2, 4), (3, 6), (4, 8)):  # 'ok'
            for _ in range(n):
                rows.append((eid, f"2024-01-0{day} 00:00:00", "ok"))
                eid += 1
        _write(_events(spark, rows), sf, "events")
        out = {r["event_type"]: r for r in holt_linear_backtest(spark, sf).collect()}
        assert set(out) == {"ok"}  # 'short' dropped, not crashed
        # Hand-run the alpha=beta=1/2 recurrence on y = [2,4,6,8]:
        level, trend = 4.0, 2.0
        err, n_err = 0.0, 0
        for y in (6, 8):
            f = level + trend
            err += abs(y - f)
            n_err += 1
            new_level = y / 2 + f / 2
            trend = (new_level - level) / 2 + trend / 2
            level = new_level
        r = out["ok"]
        assert r["n_days"] == 4
        assert r["mae"] == round(err / n_err, 4)
        assert r["final_level"] == round(level, 4)
        assert r["final_trend"] == round(trend, 4)
