"""Profile registry entries: wall time (split into plan-construction
vs execution), Spark job count, and .explain("formatted") capture.

Usage:
    python tools/profile_entries.py [--sf DIR] [--plans OUTDIR] [--suffix S] name...
    python tools/profile_entries.py --top N          # N slowest from bench_r12_full.json

Writes OUTDIR/<name>_<suffix>.txt (default suffix "before") with the
formatted physical plan, and prints one summary line per entry:
    name  total=  build=  exec=  jobs=
`build` is the time spent CONSTRUCTING the DataFrame (this includes any
eager driver-side work the builder does — collect()s, localCheckpoint
loops, kmeans iterations); `exec` is the noop-sink write of the final
plan. The bench times build+exec together, so both matter.
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
    outdir = "plans/r12"
    suffix = "before"
    if "--sf" in args:
        i = args.index("--sf"); sf_dir = args[i + 1]; args = args[:i] + args[i + 2:]
    if "--plans" in args:
        i = args.index("--plans"); outdir = args[i + 1]; args = args[:i] + args[i + 2:]
    if "--suffix" in args:
        i = args.index("--suffix"); suffix = args[i + 1]; args = args[:i] + args[i + 2:]
    no_exec = "--no-exec" in args
    if no_exec:
        args.remove("--no-exec")
    if "--top" in args:
        i = args.index("--top"); n = int(args[i + 1]); args = args[:i] + args[i + 2:]
        bench = json.load(open("bench_r12_full.json"))
        args += [k for k, _ in sorted(bench["queries"].items(), key=lambda kv: -kv[1])[:n]]

    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="profile_entries")
    sc = spark.sparkContext
    # Warm-up mirroring bench.py so the first entry isn't cold.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for tbl in ("region", "lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{tbl}.parquet")).limit(1).collect()
    _li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    _or = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    (_li.join(_or, _li.l_orderkey == _or.o_orderkey)
        .groupBy("l_linestatus", "o_orderstatus")
        .agg({"l_quantity": "avg", "l_tax": "sum"})
        .write.format("noop").mode("overwrite").save())

    results = {}
    for name in args:
        if name not in QUERIES:
            print(f"{name}: UNKNOWN", flush=True)
            continue
        group = f"profile:{name}"
        sc.setJobGroup(group, name, interruptOnCancel=False)
        t0 = time.monotonic()
        try:
            df = QUERIES[name](spark, sf_dir)
            t1 = time.monotonic()
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(plan)
            t2 = time.monotonic()
            if not no_exec:
                df.write.format("noop").mode("overwrite").save()
            t3 = time.monotonic()
            jobs = sc.statusTracker().getJobIdsForGroup(group)
            results[name] = {
                "total": round((t1 - t0) + (t3 - t2), 3),
                "build": round(t1 - t0, 3),
                "exec": round(t3 - t2, 3),
                "jobs": len(jobs),
            }
            r = results[name]
            print(f"{name}: total={r['total']}s build={r['build']}s "
                  f"exec={r['exec']}s jobs={r['jobs']}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}"[:300], flush=True)
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
            spark.catalog.clearCache()
    print("# summary: " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
