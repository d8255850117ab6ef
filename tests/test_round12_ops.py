"""Planted-fixture golden tests for round 12.

Round 12 opens by closing the r11 ADVICE items (analyze-stats victim
fold-back, Gumbel mu association) and the VERDICT follow-ups: the
Fellegi-Sunter sub-salted block pair join (FS_BLOCK_CAP), the
graph-traversal ANN lane, and the streaming state-store stress
claims. These tests plant the shapes the sf-scale oracle sims can't
isolate: a hot block big enough to force s > 1 sub-salting with the
pair census checked against a naive O(block²) reference, and the
greedy-search determinism/termination contracts.
"""

from __future__ import annotations

import os

import pytest


def _write(df, sf_dir: str, name: str) -> None:
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{sf_dir}/{name}.parquet")


class TestFellegiSunterSubSalting:
    def test_hot_block_census_matches_naive_pairs(self, spark, tmp_path):
        """120 rows in one (segment, nation) block forces
        s = ceil(120/FS_BLOCK_CAP) = 3 sub-salting; the agreement-
        pattern census must equal the naive per-block O(n²)
        enumeration — every unordered pair generated exactly once."""
        from couchwarehouse_spark.plans.dedup import (
            FS_BLOCK_CAP,
            fellegi_sunter_linkage,
        )

        assert FS_BLOCK_CAP == 50  # census below assumes 120 > 2*cap
        rows = []
        # Hot block: 120 rows, acctbal cycles 0..5k, name digit 0..9.
        for i in range(120):
            rows.append((i, f"Customer#{i % 10}", 1, "HOT", float(i % 6) * 1000.0 + 1.0))
        # Cold block: 10 rows.
        for i in range(120, 130):
            rows.append((i, f"Customer#{i % 7}", 2, "COLD", float(i % 3) * 1000.0 + 1.0))
        cust = spark.createDataFrame(
            rows,
            "c_custkey long, c_name string, c_nationkey long, "
            "c_mktsegment string, c_acctbal double",
        )
        sf = str(tmp_path / "sf")
        _write(cust, sf, "customer")

        # Naive reference census over each block.
        from collections import Counter
        from itertools import combinations

        feats = {
            k: (seg, nat, int(bal // 1000), name[-1])
            for (k, name, nat, seg, bal) in rows
        }
        expected: Counter = Counter()
        by_block: dict = {}
        for k, (seg, nat, f1, f2) in feats.items():
            by_block.setdefault((seg, nat), []).append((k, f1, f2))
        for members in by_block.values():
            for (ka, f1a, f2a), (kb, f1b, f2b) in combinations(members, 2):
                expected[(f1a == f1b, f2a == f2b)] += 1

        got = {
            (r["agree_acctbal_kilo"], r["agree_name_digit"]): r["n_pairs"]
            for r in fellegi_sunter_linkage(spark, sf).collect()
        }
        assert got == dict(expected)
        assert sum(got.values()) == 120 * 119 // 2 + 10 * 9 // 2


class TestGreedySearch:
    def test_deterministic_and_bounded(self, spark):
        """Two runs at SF_SMOKE are row-identical (every frontier and
        answer selection is (cos DESC, vec_id)-ordered), hops stay in
        [0, GS_ROUNDS], and the answer is ≤ TOP_K rows without the
        query vector."""
        from couchwarehouse_spark.plans import QUERIES
        from couchwarehouse_spark.plans.similarity import (
            GS_ROUNDS,
            QUERY_VEC_ID,
            TOP_K,
        )

        from .conftest import SF_SMOKE

        r1 = QUERIES["graph_greedy_search_topk"](spark, SF_SMOKE).collect()
        r2 = QUERIES["graph_greedy_search_topk"](spark, SF_SMOKE).collect()
        assert r1 == r2
        assert 0 < len(r1) <= TOP_K
        assert all(0 <= r["hop"] <= GS_ROUNDS for r in r1)
        assert all(r["vec_id"] != QUERY_VEC_ID for r in r1)
        # Scores arrive sorted descending with vec_id tiebreak.
        key = [(-r["cos_sim"], r["vec_id"]) for r in r1]
        assert key == sorted(key)

    def test_recall_audit_invariants(self, spark):
        from couchwarehouse_spark.plans import QUERIES

        from .conftest import SF_SMOKE

        row = QUERIES["greedy_search_recall_audit"](spark, SF_SMOKE).collect()[0]
        assert row["n_hits"] <= row["n_ann"] <= row["k"] == 10
        assert abs(row["recall_at_k"] - row["n_hits"] / 10.0) < 1e-9
