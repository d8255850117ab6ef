"""Time a fixed subset of registry queries in ONE fresh JVM with the
bench.py warm-up — the A/B probe for round-over-round bench drift.

Usage: python tools/time_subset.py [--sf /root/testdata/sf0.1] name...
Prints one JSON line {"queries": {...}, "total": N}. Run it from any
checkout (HEAD vs an older worktree) to compare code versions on the
same host minutes apart, which a full 280-query bench can't do.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")

import couchwarehouse_spark.plans.all  # noqa: F401
from couchwarehouse_spark.plans import QUERIES
from couchwarehouse_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2:]
    names = args or ["pricing_summary"]
    spark = get_spark(app_name="time_subset")
    # Same warm-up sequence as bench.py.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(100).groupBy("id").count().collect()
    for tbl in ("region", "lineitem", "orders", "events", "documents",
                "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{tbl}.parquet")).limit(1).collect()
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus", "o_orderstatus")
        .agg({"l_quantity": "avg", "l_tax": "sum"})
        .write.format("noop").mode("overwrite").save()
    )
    timings = {}
    for name in names:
        t0 = time.monotonic()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)
        spark.catalog.clearCache()
    print(json.dumps({"queries": timings,
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
