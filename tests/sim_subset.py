"""Run the t2 oracle simulation for a NAMED SUBSET of entries.

Usage: python tests/sim_subset.py name1 name2 ... [--sf /root/testdata/sf0.01]
Same gate as tests/t2_sim.py, scoped to the given names — the fast
inner loop when adding operators.
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
from tests.t2_sim import TABLES


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2:]
    spark = get_spark(app_name="sim_subset")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    unknown = [n for n in args if n not in qs]
    if unknown:
        sys.exit(f"unknown entries: {unknown}")
    failures = []
    for name in args:
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
    print(f"\n{len(args) - len(failures)}/{len(args)} green", flush=True)
    if failures:
        sys.exit("failed: " + ", ".join(failures))


if __name__ == "__main__":
    main()
