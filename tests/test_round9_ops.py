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


class TestStreamingIntervalJoinE2E:
    def test_attribution_pairs_by_construction(self, spark, tmp_path):
        """Hand-built views/purchases: the 1h window is strict-> on the
        left edge and inclusive <= on the right; a purchase can
        attribute to SEVERAL preceding views; out-of-window and
        wrong-direction purchases never pair."""
        from couchwarehouse_spark.plans.streaming_e2e import (
            streaming_interval_join_e2e,
        )

        sf = str(tmp_path / "sf")
        rows = [
            # user 1: one view at 10:00
            (1, "2024-01-01 10:00:00", 1, "view", 0.0),
            (2, "2024-01-01 10:30:00", 1, "purchase", 10.0),   # in
            (3, "2024-01-01 11:00:00", 1, "purchase", 20.0),   # boundary: in
            (4, "2024-01-01 11:00:01", 1, "purchase", 40.0),   # out (late)
            (5, "2024-01-01 09:59:59", 1, "purchase", 80.0),   # out (before)
            # user 2: two views, one purchase inside BOTH windows
            (6, "2024-01-01 10:00:00", 2, "view", 0.0),
            (7, "2024-01-01 10:10:00", 2, "view", 0.0),
            (8, "2024-01-01 10:30:00", 2, "purchase", 5.5),
            # user 3: purchase with no view at all
            (9, "2024-01-01 10:30:00", 3, "purchase", 7.0),
        ]
        from datetime import datetime

        df = spark.createDataFrame(
            [
                (i, datetime.strptime(ts, "%Y-%m-%d %H:%M:%S"), u, et, v, "{}")
                for i, ts, u, et, v in rows
            ],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        _write(df, sf, "events")
        out = {
            r["user_id"]: (r["n_attributed"], r["purchase_cents"])
            for r in streaming_interval_join_e2e(spark, sf).collect()
        }
        assert out == {
            1: (2, 3000),   # 10.00 + 20.00 in cents
            2: (2, 1100),   # the 5.50 purchase pairs with both views
        }


class TestStreamingSessionStateE2E:
    def test_sessions_by_construction(self, spark, tmp_path):
        """user 1: events at +0, +29min (one session: 29-min gap <= 30)
        then +70min (gap 41min > 30 -> new 1-event session); user 2 has
        a single event. Histogram: two 1-event sessions (0s total) and
        one 2-event session (1740s)."""
        from couchwarehouse_spark.plans.streaming_e2e import (
            streaming_session_state_e2e,
        )
        from datetime import datetime, timedelta

        sf = str(tmp_path / "sf")
        t0 = datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            (1, t0, 1),
            (2, t0 + timedelta(minutes=29), 1),
            (3, t0 + timedelta(minutes=70), 1),
            (4, t0 + timedelta(minutes=5), 2),
        ]
        df = spark.createDataFrame(
            [(i, ts, u, "view", 1.0, "{}") for i, ts, u in rows],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        _write(df, sf, "events")
        out = {
            r["session_events"]: (r["n_sessions"], r["total_duration_sec"])
            for r in streaming_session_state_e2e(spark, sf).collect()
        }
        assert out == {1: (2, 0), 2: (1, 29 * 60)}

    def test_gap_boundary_is_strictly_greater(self, spark, tmp_path):
        """A gap of EXACTLY 30 minutes stays in the same session (the
        break condition is > gap in both lanes)."""
        from couchwarehouse_spark.plans.streaming_e2e import (
            streaming_session_state_e2e,
        )
        from datetime import datetime, timedelta

        sf = str(tmp_path / "sf")
        t0 = datetime(2024, 1, 1, 12, 0, 0)
        df = spark.createDataFrame(
            [
                (1, t0, 1, "view", 1.0, "{}"),
                (2, t0 + timedelta(minutes=30), 1, "view", 1.0, "{}"),
            ],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        _write(df, sf, "events")
        (r,) = streaming_session_state_e2e(spark, sf).collect()
        assert (r["session_events"], r["n_sessions"]) == (2, 1)


class TestZorderRelayoutE2E:
    def test_range_query_after_relayout_by_construction(self, spark, tmp_path):
        """Six hand-built orders through spool -> optimize_zorder ->
        range query: keys are multiples of ZR_SUBSET(4) engineered
        against AMEND(7)/DELETE(10); the BETWEEN [60k, 120k] range is
        boundary-inclusive on both edges; the tombstoned key vanishes
        even though its total is in range."""
        from couchwarehouse_spark.plans.warehouse_e2e import (
            zorder_relayout_e2e,
        )

        sf = str(tmp_path / "sf")
        rows = [
            (4, 1, "O", 80_000.0),     # in range
            (8, 2, "O", 200_000.0),    # out (high)
            (20, 3, "O", 100_000.0),   # %10: tombstoned (in range, gone)
            (28, 4, "O", 60_000.0),    # %7: amended; boundary low -> in
            (12, 5, "O", 120_000.0),   # boundary high -> in
            (16, 6, "F", 59_999.99),   # out (just below)
            (5, 7, "O", 90_000.0),     # not %4: never enters the feed
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
            r["status"]: (r["n_orders"], r["total_in_range"])
            for r in zorder_relayout_e2e(spark, sf).collect()
        }
        assert out == {"O": (2, 200_000.0), "amended": (1, 60_000.0)}


class TestZorderRowGroupPruning:
    def test_zorder_tightens_rowgroup_stats_for_range_pruning(
        self, spark, tmp_path
    ):
        """The PAYOFF pin for zorder_relayout_e2e: write a 1-bucket
        warehouse table with a tiny parquet block size (so files carry
        MANY row groups), snapshot per-row-group min/max stats on
        ``total`` before and after optimize_zorder(['total']), and
        count row groups a [lo, hi] range predicate cannot skip. Rows
        arrive in id-hash order, so pre-relayout every row group spans
        ~the full range (zero skipping); post-relayout the z-sort makes
        stats tight and most row groups prunable — the exact file/
        row-group skipping a 100 TB scan relies on."""
        import pyarrow.parquet as pq

        from couchwarehouse_spark.warehouse import Warehouse

        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        old_block = hconf.get("parquet.block.size")
        hconf.set("parquet.block.size", str(64 * 1024))
        try:
            n = 40_000
            docs = spark.range(n).selectExpr(
                "concat('doc', cast(id as string)) AS _id",
                "'1-x' AS _rev",
                # totals are a PERMUTATION of 0..n-1 (id-hash order ==
                # random in total), so pre-zorder row groups all span
                # ~everything
                "cast(pmod(id * 7919, 40000) as double) AS total",
            )
            feed = docs.selectExpr(
                "to_json(named_struct("
                "'seq', concat(substring(_id, 4), '-s'), "
                "'id', _id, 'doc', named_struct('_id', _id, '_rev', _rev, "
                "'total', total))) AS value"
            )
            feed_dir = str(tmp_path / "feed")
            feed.coalesce(4).write.mode("overwrite").text(feed_dir)
            wh = Warehouse(
                spark, str(tmp_path / "wh"), "zp", reset=True, n_buckets=1,
                feed_schema="_id string, _rev string, total double",
            )
            wh.spool(feed_dir)

            lo, hi = 10_000.0, 14_000.0  # 10% of the value span

            def unprunable_rowgroups() -> tuple[int, int]:
                total, hit = 0, 0
                tdir = None
                for root, _dirs, files in __import__("os").walk(
                    str(tmp_path / "wh")
                ):
                    if "_cw_bucket=" not in root:
                        continue  # skip spool scratch / manifest areas
                    for f in files:
                        if f.endswith(".parquet"):
                            path = __import__("os").path.join(root, f)
                            pf = pq.ParquetFile(path)
                            md = pf.metadata
                            cols = {
                                md.row_group(0).column(j).path_in_schema: j
                                for j in range(md.row_group(0).num_columns)
                            }
                            j = cols["total"]
                            for i in range(md.num_row_groups):
                                st = md.row_group(i).column(j).statistics
                                total += 1
                                if st.min <= hi and st.max >= lo:
                                    hit += 1
                return total, hit

            # Current manifest files only: walk is fine pre-vacuum
            # because spool committed exactly one version so far.
            before_total, before_hit = unprunable_rowgroups()
            assert before_total >= 8, (
                f"need many row groups for a meaningful pin, got {before_total}"
            )
            assert before_hit == before_total  # nothing prunable pre-relayout

            wh.optimize_zorder(["total"])
            wh.vacuum(retain_versions=1, min_age_seconds=0.0)  # drop pre-relayout files
            after_total, after_hit = unprunable_rowgroups()
            assert after_total >= 8
            # The z-sort must make the range prunable: at most half the
            # row groups may still overlap a 10% range (observed: ~1/8).
            assert after_hit <= after_total // 2, (
                f"zorder did not tighten stats: {after_hit}/{after_total} "
                f"row groups still overlap [{lo}, {hi}]"
            )

            # And the data survived the relayout byte-for-byte.
            assert wh.table().count() == n
        finally:
            if old_block is None:
                hconf.unset("parquet.block.size")
            else:
                hconf.set("parquet.block.size", old_block)


class TestStreamingStaticEnrichE2E:
    def test_enrichment_by_construction(self, spark, tmp_path):
        """Three orders, two customers, two nations: per-batch
        broadcast join against the static dim chain must credit each
        order to its customer's nation with cent-exact revenue."""
        from couchwarehouse_spark.plans.streaming_e2e import (
            streaming_static_enrich_e2e,
        )

        sf = str(tmp_path / "sf")
        _write(
            spark.createDataFrame(
                [(1, 10, "O", 100.25), (2, 10, "O", 49.75), (3, 20, "F", 10.10)],
                "o_orderkey long, o_custkey long, o_orderstatus string, "
                "o_totalprice double",
            ),
            sf,
            "orders",
        )
        _write(
            spark.createDataFrame(
                [(10, "alice", 1), (20, "bob", 2)],
                "c_custkey long, c_name string, c_nationkey int",
            ),
            sf,
            "customer",
        )
        _write(
            spark.createDataFrame(
                [(1, "FRANCE", 0), (2, "KENYA", 0)],
                "n_nationkey int, n_name string, n_regionkey int",
            ),
            sf,
            "nation",
        )
        out = {
            r["nation"]: (r["n_orders"], r["revenue_cents"])
            for r in streaming_static_enrich_e2e(spark, sf).collect()
        }
        assert out == {"FRANCE": (2, 15000), "KENYA": (1, 1010)}


class TestGiniTokenConcentration:
    def test_gini_by_construction(self, spark, tmp_path):
        """'flat' (equal lengths) -> G = 0; 'skew' [1, 1, 98] -> G =
        (2*297 - 4*100) / (3*100) = 194/300; a singleton source -> 0."""
        from couchwarehouse_spark.plans.curation import (
            gini_token_concentration,
        )

        sf = str(tmp_path / "sf")
        _write(
            _docs(
                spark,
                [
                    (1, "en", "flat", 50),
                    (2, "en", "flat", 50),
                    (3, "en", "flat", 50),
                    (4, "en", "skew", 98),
                    (5, "en", "skew", 1),
                    (6, "en", "skew", 1),
                    (7, "en", "solo", 7),
                ],
            ),
            sf,
            "documents",
        )
        out = {
            r["source"]: (r["n_docs"], r["total_chars"], r["gini"])
            for r in gini_token_concentration(spark, sf).collect()
        }
        assert out["flat"] == (3, 150, 0.0)
        assert out["skew"] == (3, 100, round(194 / 300, 6))
        assert out["solo"] == (1, 7, 0.0)


class TestAbtestPowerMde:
    @staticmethod
    def _expected_n(p: float, lift: float) -> int:
        import math

        p2 = p * (1 + lift)
        pbar = (p + p2) / 2
        num = (
            1.959964 * math.sqrt(2.0 * pbar * (1 - pbar))
            + 0.841621 * math.sqrt(p * (1 - p) + p2 * (1 - p2))
        ) ** 2
        return math.ceil(num / (p * lift) ** 2)

    def test_required_n_matches_closed_form(self, spark, tmp_path):
        """p = 0.5 exactly (one of two users converts: purchases >
        views); each grid row must equal the hand-run formula."""
        from couchwarehouse_spark.plans.statistics import abtest_power_mde
        from datetime import datetime

        sf = str(tmp_path / "sf")
        t = datetime(2024, 1, 1, 12, 0, 0)
        df = spark.createDataFrame(
            [
                (1, t, 1, "purchase", 1.0, "{}"),   # user 1: converts
                (2, t, 2, "view", 1.0, "{}"),       # user 2: does not
            ],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        _write(df, sf, "events")
        out = {
            r["lift_pct"]: r for r in abtest_power_mde(spark, sf).collect()
        }
        assert set(out) == {1, 2, 5, 10, 20}
        for lift in (1, 2, 5, 10, 20):
            r = out[lift]
            assert r["n_users"] == 2 and r["p_base"] == 0.5
            assert r["required_n_per_arm"] == self._expected_n(0.5, lift / 100)
        # sanity: smaller effects need (much) more sample
        assert (
            out[1]["required_n_per_arm"]
            > out[5]["required_n_per_arm"]
            > out[20]["required_n_per_arm"]
        )

    def test_lift_past_certainty_is_null(self, spark, tmp_path):
        """p = 1.0 (every user converts): any positive lift pushes
        p2 past 1 -> NULL required_n in both lanes, no sqrt(<0)."""
        from couchwarehouse_spark.plans.statistics import abtest_power_mde
        from datetime import datetime

        sf = str(tmp_path / "sf")
        t = datetime(2024, 1, 1, 12, 0, 0)
        df = spark.createDataFrame(
            [(1, t, 1, "purchase", 1.0, "{}"), (2, t, 2, "purchase", 1.0, "{}")],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        _write(df, sf, "events")
        rows = abtest_power_mde(spark, sf).collect()
        assert len(rows) == 5
        assert all(r["p_base"] == 1.0 for r in rows)
        assert all(r["required_n_per_arm"] is None for r in rows)


class TestSprtBoundaryScan:
    def test_path_and_decisions_by_construction(self, spark, tmp_path):
        """Day 1: 10 purchases -> cum = 10·C1 < upper bound (continue);
        day 2: +5 purchases -> 15·C1 crosses ln((1-b)/a) (accept_h1);
        day 3: one view pulls the path back under the bound — the scan
        reports the state of every day, integer-exactly."""
        from couchwarehouse_spark.plans.statistics import (
            SPRT_C0_NANO,
            SPRT_C1_NANO,
            SPRT_UPPER_NANO,
            sprt_boundary_scan,
        )
        from datetime import datetime

        sf = str(tmp_path / "sf")
        rows = []
        eid = 1
        for _ in range(10):
            rows.append((eid, datetime(2024, 1, 1, 8), 1, "purchase")); eid += 1
        for _ in range(5):
            rows.append((eid, datetime(2024, 1, 2, 8), 1, "purchase")); eid += 1
        rows.append((eid, datetime(2024, 1, 3, 8), 1, "view")); eid += 1
        rows.append((eid, datetime(2024, 1, 3, 9), 1, "error"))  # not a trial
        df = spark.createDataFrame(
            [(i, ts, u, et, 1.0, "{}") for i, ts, u, et in rows],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        _write(df, sf, "events")
        out = {r["day"]: r for r in sprt_boundary_scan(spark, sf).collect()}
        d1, d2, d3 = out["2024-01-01"], out["2024-01-02"], out["2024-01-03"]
        assert (d1["purchases"], d1["trials"]) == (10, 10)
        assert d1["cum_llr_nano"] == 10 * SPRT_C1_NANO
        assert d1["decision"] == "continue"
        assert d2["cum_llr_nano"] == 15 * SPRT_C1_NANO
        assert 15 * SPRT_C1_NANO >= SPRT_UPPER_NANO
        assert d2["decision"] == "accept_h1"
        assert (d3["purchases"], d3["trials"]) == (0, 1)  # error excluded
        assert d3["cum_llr_nano"] == 15 * SPRT_C1_NANO + SPRT_C0_NANO
        assert d3["decision"] == "continue"


class TestTemporalSplitAudit:
    def test_user_leakage_by_construction(self, spark, tmp_path):
        """u1 train-only; u2 train+test; u3 val+test; u4 test-only.
        Leakage: train 0/2, val 0/1, test 2/3 (u2 first seen in train,
        u3 first seen in val)."""
        from couchwarehouse_spark.plans.sampling import temporal_split_audit
        from datetime import datetime

        sf = str(tmp_path / "sf")
        TRAIN, VAL, TEST = (
            datetime(2024, 1, 10),
            datetime(2024, 1, 22),
            datetime(2024, 1, 28),
        )
        rows = [
            (1, TRAIN, 1), (2, TRAIN, 1),   # u1: train only (2 events)
            (3, TRAIN, 2), (4, TEST, 2),    # u2: train + test
            (5, VAL, 3), (6, TEST, 3),      # u3: val + test
            (7, TEST, 4),                   # u4: test only
        ]
        df = spark.createDataFrame(
            [(i, ts, u, "view", 1.0, "{}") for i, ts, u in rows],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        _write(df, sf, "events")
        out = {
            r["split"]: (
                r["n_events"], r["n_users"],
                r["n_users_seen_earlier"], r["user_leakage_rate"],
            )
            for r in temporal_split_audit(spark, sf).collect()
        }
        assert out == {
            "train": (3, 2, 0, 0.0),
            "val": (1, 1, 0, 0.0),
            "test": (3, 3, 2, round(2 / 3, 6)),
        }


class TestPartitionModularity:
    def test_perfect_two_community_split_is_half(self, spark, tmp_path):
        """Two well-separated 4-vector clusters (labels 0/1, opposite
        directions): every kNN edge (k=3) stays inside its cluster, so
        each cluster is a K4 (6 edges, degree sum 12), m = 12, and
        each cell contributes 6/12 - (12/24)^2 = 0.25 — the textbook
        Q = 0.5 perfect split."""
        from pyspark.sql import functions as F

        from couchwarehouse_spark.plans.similarity import partition_modularity

        sf = str(tmp_path / "sf")
        rows = []
        for i in range(4):  # cluster 0: along +e1 (tiny jitter on e2)
            rows.append((i, [1.0, 0.01 * i, 0.0, 0.0], 0))
        for i in range(4):  # cluster 1: along -e1
            rows.append((4 + i, [-1.0, 0.0, 0.01 * i, 0.0], 1))
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        _write(df, sf, "embeddings")
        out = {
            r["cell"]: r for r in partition_modularity(spark, sf).collect()
        }
        assert set(out) == {0, 1}
        for cell in (0, 1):
            r = out[cell]
            assert r["n_nodes"] == 4
            assert r["intra_edges"] == 6
            assert r["degree_sum"] == 12
            assert r["q_contribution"] == 0.25


class TestTextArtifactCensus:
    def test_detectors_by_construction(self, spark, tmp_path):
        """One doc per artifact class plus one clean doc: each detector
        fires on exactly its class, and the any-artifact rate counts
        the doc carrying two artifacts ONCE."""
        from couchwarehouse_spark.plans.text import text_artifact_census

        sf = str(tmp_path / "sf")
        rows = [
            (1, "perfectly clean prose", "a"),
            (2, "lost bytes here � and there", "a"),      # mojibake
            (3, "binary\x07noise", "a"),                        # control
            (4, "some <div class='x'>markup</div> left", "a"),  # tag
            (5, "fish &amp; chips &#39;quoted&#39;", "a"),      # entity
            (6, "<p>tag &nbsp; and entity</p>", "a"),           # both: 1 doc
            (7, "clean too", "b"),
        ]
        df = spark.createDataFrame(
            [(i, t, "en", s, len(t)) for i, t, s in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        _write(df, sf, "documents")
        out = {r["source"]: r for r in text_artifact_census(spark, sf).collect()}
        a = out["a"]
        assert a["n_docs"] == 6
        assert a["n_mojibake"] == 1
        assert a["n_control"] == 1
        assert a["n_html_tag"] == 2      # docs 4 and 6
        assert a["n_html_entity"] == 2   # docs 5 and 6
        # docs 2,3,4,5,6 carry >=1 artifact -> 5/6
        assert a["artifact_rate"] == round(5 / 6, 6)
        b = out["b"]
        assert (b["n_docs"], b["artifact_rate"]) == (1, 0.0)


class TestStreamingLeftIntervalJoinE2E:
    def test_matched_nullpadded_and_held_by_construction(self, spark, tmp_path):
        """user 1's view matches; user 2's view has no purchase and its
        1h window closed before the final watermark -> NULL-padded row
        emitted; user 3's view window was still open at stream end ->
        HELD, never emitted. Watermark = min(side maxes) - 30min."""
        from couchwarehouse_spark.plans.streaming_e2e import (
            streaming_left_interval_join_e2e,
        )
        from datetime import datetime

        sf = str(tmp_path / "sf")
        rows = [
            (1, datetime(2024, 1, 1, 10, 0), 1, "view"),
            (2, datetime(2024, 1, 1, 10, 30), 1, "purchase"),
            (3, datetime(2024, 1, 1, 10, 0), 2, "view"),      # never converts
            (4, datetime(2024, 1, 1, 23, 0), 3, "view"),      # held (window open)
            (5, datetime(2024, 1, 1, 23, 30), 4, "purchase"),  # lifts purchase max
        ]
        df = spark.createDataFrame(
            [(i, ts, u, et, 1.0, "{}") for i, ts, u, et in rows],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        _write(df, sf, "events")
        # wm = min(23:00 views, 23:30 purchases) - 30min = 22:30.
        # user 2's window closes 11:00 < 22:30 -> emitted;
        # user 3's closes 24:00 > 22:30 -> held.
        out = {
            r["user_id"]: (r["n_rows"], r["n_unconverted_views"])
            for r in streaming_left_interval_join_e2e(spark, sf).collect()
        }
        assert out == {1: (1, 0), 2: (1, 1)}


class TestEmbeddingIsotropyAudit:
    def test_collapsed_vs_symmetric_by_construction(self, spark, tmp_path):
        """label 0: two opposite unit vectors -> mean vector 0,
        anisotropy 0; label 1: two IDENTICAL unit vectors -> mean
        vector norm 1, anisotropy 1 (fully collapsed). RMS norm is 1
        for both."""
        from couchwarehouse_spark.plans.similarity import (
            embedding_isotropy_audit,
        )

        sf = str(tmp_path / "sf")
        rows = [
            (1, [1.0, 0.0], 0),
            (2, [-1.0, 0.0], 0),
            (3, [0.6, 0.8], 1),
            (4, [0.6, 0.8], 1),
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        _write(df, sf, "embeddings")
        out = {r["label"]: r for r in embedding_isotropy_audit(spark, sf).collect()}
        assert out[0]["n_vecs"] == 2
        assert out[0]["mean_vec_norm"] == 0.0
        assert out[0]["rms_norm"] == 1.0
        assert out[0]["anisotropy"] == 0.0
        assert out[1]["mean_vec_norm"] == 1.0
        assert out[1]["rms_norm"] == 1.0
        assert out[1]["anisotropy"] == 1.0
