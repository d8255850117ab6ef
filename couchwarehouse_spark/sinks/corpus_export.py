"""Corpus release exporter: sharded JSON-lines + a release manifest.

The last step of a training-data pipeline (after dedup/quality/split —
plans.dedup, plans.curation, plans.sampling) is WRITING the corpus in
the shape trainers consume: N deterministic shards of JSON-lines, plus
a manifest recording each shard's row count, byte size, and a content
checksum — so a consumer can verify a transfer and a re-run can prove
bit-identity. Reference scope: the reference egresses tables to
SQLite/PG/MySQL/ES (lib/*.js); this is the same "deliver the data
somewhere useful" job aimed at ML training instead of SQL serving.

Design for 100 TB:
- Shard assignment is ``pmod(xxhash64(key), n_shards)`` — a
  projection; one repartition on the shard id is the only shuffle, and
  every shard is written by exactly one task (no tiny-file spray, no
  post-write rename choreography beyond Spark's own commit protocol).
- The manifest's per-shard row/byte/checksum stats come from ONE
  aggregation over the same frame — not a re-read of what was written.
  The checksum is order-insensitive (sum of per-row md5-derived 60-bit
  hashes mod 2^61-1, summed in DECIMAL(38,0) — exact for 1e12+ rows
  per shard, no ANSI long overflow) so it is stable under task-level
  row reordering within a shard, and cheap to verify shard-locally at
  any later time.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHECKSUM_MOD = (1 << 61) - 1  # Mersenne-ish modulus, fits a signed long


def _row_hash(json_col):
    """60-bit md5-derived hash of one serialized row (engine-portable,
    same construction as plans.dedup.md5_long)."""
    return F.conv(F.substring(F.md5(json_col), 1, 15), 16, 10).cast("long")


def export_corpus(
    df: DataFrame,
    out_dir: str,
    key: str,
    n_shards: int = 16,
) -> dict:
    """Write ``df`` as ``n_shards`` JSON-lines shards plus
    ``manifest.json``. Returns the manifest dict.

    ``key`` names the stable id column shard assignment hashes on —
    the SAME doc lands in the same shard on every run (deterministic
    re-exports; rand() would not be), and co-sharding two exports by
    the same key keeps their docs aligned.
    """
    shard = F.pmod(F.xxhash64(F.col(key)), F.lit(n_shards)).cast("int")
    payload = (
        df.withColumn("_cw_shard", shard)
        .withColumn("_cw_line", F.to_json(F.struct(*[c for c in df.columns])))
        .persist()  # serialized ONCE: both the stats pass and the
        # sharded write read this frame; without the persist the
        # source scan + to_json + hashing run twice (r5 review)
    )

    # Stats and data from one frame: per-shard rows, serialized bytes,
    # and the order-insensitive checksum.
    stats = (
        payload.groupBy("_cw_shard")
        .agg(
            F.count("*").alias("rows"),
            # octet_length, NOT length: manifest bytes must match
            # on-disk file sizes for a transfer check, and length()
            # counts CODEPOINTS — wrong for any non-ASCII corpus
            # (r5 review finding). +1 per row: the JSONL newline.
            (F.sum(F.octet_length("_cw_line")) + F.count("*")).alias("bytes"),
            F.pmod(
                F.sum(_row_hash(F.col("_cw_line")).cast("decimal(38,0)")),
                F.lit(CHECKSUM_MOD).cast("decimal(38,0)"),
            )
            .cast("long")
            .alias("checksum"),
        )
        .collect()
    )

    (
        payload.select("_cw_shard", "_cw_line")
        .repartition(n_shards, "_cw_shard")
        .write.mode("overwrite")
        .partitionBy("_cw_shard")
        .text(out_dir)
    )

    payload.unpersist(blocking=False)
    manifest = {
        "format": "jsonl/sharded",
        "key": key,
        "n_shards": n_shards,
        "total_rows": int(sum(r["rows"] for r in stats)),
        "total_bytes": int(sum(r["bytes"] for r in stats)),
        "shards": {
            int(r["_cw_shard"]): {
                "rows": int(r["rows"]),
                "bytes": int(r["bytes"]),
                "checksum": int(r["checksum"]),
            }
            for r in stats
        },
    }
    tmp = os.path.join(out_dir, ".manifest.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return manifest


def verify_export(spark, out_dir: str) -> dict:
    """Re-derive every shard's stats from the written files and compare
    to the manifest — the consumer-side transfer check. Returns
    {"ok": bool, "mismatched_shards": [...]} and never trusts the
    manifest's own numbers for the comparison."""
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    # Drop any cached file listing for this path: the whole point of
    # the verify pass is to measure the files AS THEY ARE NOW, and
    # Spark's FileStatusCache otherwise pins sizes from a previous
    # read (a shorter/longer file then fails the scan instead of
    # failing the checksum).
    spark.catalog.refreshByPath(out_dir)
    lines = spark.read.text(out_dir)  # partition column _cw_shard is inferred
    redone = (
        lines.groupBy("_cw_shard")
        .agg(
            F.count("*").alias("rows"),
            (F.sum(F.octet_length("value")) + F.count("*")).alias("bytes"),
            F.pmod(
                F.sum(_row_hash(F.col("value")).cast("decimal(38,0)")),
                F.lit(CHECKSUM_MOD).cast("decimal(38,0)"),
            )
            .cast("long")
            .alias("checksum"),
        )
        .collect()
    )
    got = {
        int(r["_cw_shard"]): (int(r["rows"]), int(r["bytes"]), int(r["checksum"]))
        for r in redone
    }
    want = {
        int(k): (v["rows"], v["bytes"], v["checksum"])
        for k, v in manifest["shards"].items()
    }
    bad = sorted(k for k in set(got) | set(want) if got.get(k) != want.get(k))
    return {"ok": not bad, "mismatched_shards": bad}
