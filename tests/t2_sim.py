"""Full t2 simulation: every oracle-backed query vs DuckDB at sf0.01.

Mirrors the driver's correctness gate. Run:
    python tests/t2_sim.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod
from couchwarehouse_spark.session import get_spark
from tests.oracle_utils import assert_frames_match

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="t2_sim")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name in sorted(qs):
        t0 = time.monotonic()
        try:
            pdf = qs[name](spark, sf_dir).toPandas()
            if name in osql:
                assert_frames_match(pdf, con.sql(osql[name]).df(), name)
                status = f"OK ({len(pdf)} rows)"
            else:
                assert len(pdf) > 0, f"{name}: rows-only entry returned 0 rows"
                status = f"rows-only OK ({len(pdf)} rows)"
        except Exception as err:  # noqa: BLE001 — report every failure
            failures.append(name)
            status = f"FAIL: {err}"
        print(f"{name}: {status} [{time.monotonic() - t0:.1f}s]", flush=True)
        spark.catalog.clearCache()
    print(f"\n{len(qs) - len(failures)}/{len(qs)} green", flush=True)
    if failures:
        sys.exit("failed: " + ", ".join(failures))


if __name__ == "__main__":
    main()
