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
