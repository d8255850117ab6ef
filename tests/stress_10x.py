"""Manual 10x scale stress harness (VERDICT r06 ask #4): measured —
not argued — evidence that the heaviest pair/graph operators scale
quasi-linearly, and that the derived LSH geometry steps up with corpus
size.

NOT collected by pytest (no test_ prefix); run by hand:

    python tests/stress_10x.py [--copies 10] [--sf /root/testdata/sf0.1]

What it does:
- Builds a COPIES-fold corpus from the base SF dir with re-keyed ids.
  Document text is vocabulary-salted per copy (every token gets a
  _c{i} suffix), so each copy reproduces the base corpus's pair
  structure on a disjoint vocabulary — the honest linear-scale model
  (plain duplication would make every doc a 10-way near-dup cluster
  and measure the clone blowup, not scaling). Embeddings are re-keyed
  only: the SRP planes re-derive from the larger N, which is exactly
  the behavior under test.
- Times the five heaviest operators at 1x and at COPIES-x and asserts
  wall-time grows within the op's work model:
  * the four text/dedup ops are linear by construction (inverted-index
    work is per-copy-independent) → ratio ≤ copies × SLACK;
  * graph_pagerank_3iter's bucketed pair work is N·min(N, 2^p·target)
    — below bucket saturation the model ratio exceeds `copies`; the
    assert binds against the MODEL ratio × SLACK, and the model itself
    goes linear once buckets saturate (the derive_planes design).
- Asserts derive_planes(N) strictly increases from 1x to COPIES-x.
"""

from __future__ import annotations

import argparse
import functools
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The 10x pair stages need real heap; the default local-mode JVM is
# 1g. Must be set before the gateway launches (session.py NB).
os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import couchwarehouse_spark.plans.all  # noqa: F401
from couchwarehouse_spark.catalog import load_table
from couchwarehouse_spark.plans import QUERIES
from couchwarehouse_spark.plans.similarity import derive_planes
from couchwarehouse_spark.session import get_spark

LINEAR_OPS = [
    "containment_dup_pairs",
    "sparse_cosine_pairs",
    "minhash_lsh_candidates",
    "near_dup_clusters",
]
BUCKET_OPS = ["graph_pagerank_3iter"]
SLACK = 3.0  # wall-time noise allowance over the work model
ID_STRIDE = 100_000_000


def build_scaled(spark, base: str, out: str, copies: int) -> None:
    os.makedirs(out, exist_ok=True)
    docs = load_table(spark, base, "documents")

    def salt_copy(i: int) -> DataFrame:
        # Disjoint vocabulary per copy: suffix every token. Structure
        # within a copy is identical to the base corpus.
        salted = F.array_join(
            F.transform(F.split("text", " "), lambda w: F.concat(w, F.lit(f"_c{i}"))),
            " ",
        )
        return docs.select(
            (F.col("doc_id") + i * ID_STRIDE).alias("doc_id"),
            salted.alias("text"),
            "lang",
            "source",
            "n_chars",
        )

    functools.reduce(
        DataFrame.unionByName, [salt_copy(i) for i in range(copies)]
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = load_table(spark, base, "embeddings")
    functools.reduce(
        DataFrame.unionByName,
        [
            emb.select(
                (F.col("vec_id") + i * ID_STRIDE).alias("vec_id"),
                "embedding",
                "label",
            )
            for i in range(copies)
        ],
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")


def time_op(spark, name: str, sf_dir: str) -> tuple[float, int]:
    spark.catalog.clearCache()
    t0 = time.monotonic()
    n = QUERIES[name](spark, sf_dir).count()
    return time.monotonic() - t0, n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--workdir", default="/tmp/cw_stress_10x")
    args = ap.parse_args()

    spark = get_spark(app_name="stress_10x")
    big = os.path.join(args.workdir, f"x{args.copies}")
    print(f"building {args.copies}x corpus under {big} ...", flush=True)
    build_scaled(spark, args.sf, big, args.copies)

    n1 = load_table(spark, args.sf, "embeddings").count()
    nX = n1 * args.copies
    p1, pX = derive_planes(n1), derive_planes(nX)
    print(f"derive_planes: {n1} rows -> {p1} planes; {nX} rows -> {pX} planes")
    assert pX > p1, "derived LSH planes must step up with corpus size"
    # Pair-work model for the bucketed graph op: N * min(N, bucket).
    bucket1 = min(n1, max(1, n1 // (1 << p1)))
    bucketX = min(nX, max(1, nX // (1 << pX)))
    model_ratio = (nX * bucketX) / (n1 * bucket1)

    failures = []
    results = []
    for name in LINEAR_OPS + BUCKET_OPS:
        t1, r1 = time_op(spark, name, args.sf)
        tX, rX = time_op(spark, name, big)
        bound = (model_ratio if name in BUCKET_OPS else args.copies) * SLACK
        ratio = tX / max(t1, 1e-9)
        ok = ratio <= bound
        results.append((name, t1, tX, ratio, bound, r1, rX, ok))
        print(
            f"{name}: 1x {t1:.1f}s ({r1} rows) -> {args.copies}x {tX:.1f}s "
            f"({rX} rows); ratio {ratio:.1f} (bound {bound:.1f}) "
            f"{'OK' if ok else 'FAIL'}",
            flush=True,
        )
        if not ok:
            failures.append(name)

    shutil.rmtree(args.workdir, ignore_errors=True)
    if failures:
        sys.exit(f"super-linear scaling: {failures}")
    print("all operators scale within the model bound")


if __name__ == "__main__":
    main()
