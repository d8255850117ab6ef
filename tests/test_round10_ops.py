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
