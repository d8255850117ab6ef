"""WebDataset tar-shard exporter: the multimodal training release
format (Aizman et al., "High-Performance I/O For Large-Scale Deep
Learning" — the public WebDataset convention: POSIX tar shards whose
members group by a common basename key, consumed sequentially by
dataloaders). Reference scope: the reference egresses tables to
SQLite/PG/MySQL/ES (lib/*.js); this delivers the same rows to an ML
dataloader instead of a SQL server — the binary-payload counterpart
of ``sinks/corpus_export.py``'s JSONL release.

Each sample becomes up to three tar members sharing one basename:
``{key}.txt`` (text), ``{key}.json`` (metadata), ``{key}.bin``
(opaque binary payload, X3) — the member-grouping rule dataloaders
key on.

Design for 100 TB:
- Shard assignment is ``pmod(xxhash64(key), n_shards)`` — a
  projection; ONE repartition on the shard id is the only shuffle and
  every shard is written by exactly one task (all rows of a shard
  hash to one partition; a partition holding two shard ids writes two
  tars — never two writers per tar).
- Tar writing is executor-side ``foreachPartition`` (payload bytes
  never transit the driver); only per-shard (rows, bytes) stats come
  back for the manifest. On a real cluster ``out_dir`` must be a
  shared filesystem mount — tar is a sequential container, so
  object-store targets stream through a local spool and upload, the
  standard WebDataset publishing flow.
- BIT-REPRODUCIBLE shards: members are sorted by key and every
  tarinfo carries fixed mtime/uid/gid/mode, so a re-export of the
  same frame is byte-identical — the property that makes a release
  checksum meaningful.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TAR_MODE = 0o644


def export_webdataset(
    df: DataFrame,
    out_dir: str,
    key: str,
    text_col: str | None = None,
    payload_col: str | None = None,
    n_shards: int = 8,
) -> dict:
    """Write ``df`` as ``shard-NNNNN.tar`` WebDataset shards plus
    ``manifest.json``; returns the manifest dict.

    ``key`` names the stable id column (shard assignment and member
    basenames). ``text_col`` lands as ``{key}.txt``; every remaining
    column lands in ``{key}.json``; ``payload_col`` (binary) lands as
    ``{key}.bin``.
    """
    os.makedirs(out_dir, exist_ok=True)
    meta_cols = [
        c for c in df.columns if c not in {text_col, payload_col}
    ]
    shard = F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(n_shards)).cast("int")
    prepared = (
        df.select(
            F.col(key).cast("string").alias("_cw_key"),
            shard.alias("_cw_shard"),
            (F.col(text_col).cast("string") if text_col else F.lit(None).cast("string")).alias(
                "_cw_text"
            ),
            (F.col(payload_col) if payload_col else F.lit(None).cast("binary")).alias(
                "_cw_bin"
            ),
            F.to_json(F.struct(*[F.col(c) for c in meta_cols])).alias("_cw_meta"),
        )
        .repartition(n_shards, "_cw_shard")
        .sortWithinPartitions("_cw_shard", "_cw_key")
    )

    def _write_partition(rows):
        import io
        import tarfile

        def tar_for(sid: int):
            tmp = os.path.join(out_dir, f".shard-{sid:05d}.tar.tmp.{os.getpid()}")
            return tmp, tarfile.open(tmp, "w")

        def add(tf, name: str, data: bytes):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0  # fixed → bit-reproducible shards
            info.mode = _TAR_MODE
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(data))

        current = None  # (sid, tmp_path, tarfile, n_rows)
        out = []

        def finish():
            nonlocal current
            if current is None:
                return
            sid, tmp, tf, n = current
            tf.close()
            final = os.path.join(out_dir, f"shard-{sid:05d}.tar")
            os.replace(tmp, final)
            out.append((sid, n, os.path.getsize(final)))
            current = None

        for row in rows:
            sid = row["_cw_shard"]
            if current is None or current[0] != sid:
                finish()
                tmp, tf = tar_for(sid)
                current = (sid, tmp, tf, 0)
            _, tmp, tf, n = current
            k = row["_cw_key"]
            if row["_cw_text"] is not None:
                add(tf, f"{k}.txt", row["_cw_text"].encode("utf-8"))
            add(tf, f"{k}.json", row["_cw_meta"].encode("utf-8"))
            if row["_cw_bin"] is not None:
                add(tf, f"{k}.bin", bytes(row["_cw_bin"]))
            current = (sid, tmp, tf, n + 1)
        finish()
        yield from out

    # Persisted: the row-count aggregate and the tar-writing pass read
    # the same serialized frame once each instead of re-shuffling.
    prepared = prepared.persist()
    agg = (
        prepared.groupBy("_cw_shard")
        .agg(
            F.count("*").alias("rows"),
            F.countDistinct("_cw_key").alias("distinct_keys"),
        )
        .collect()
    )
    # Fail FAST on duplicate keys: two samples sharing a basename would
    # write duplicate tar member names and only surface later as a
    # verify_webdataset rows-vs-samples mismatch. Same-shard check is
    # complete — equal keys always hash to the same shard. Piggybacks
    # on the stats aggregate: no extra pass over the frame.
    dup_shards = [int(r["_cw_shard"]) for r in agg if r["rows"] != r["distinct_keys"]]
    if dup_shards:
        prepared.unpersist(blocking=False)
        raise ValueError(
            f"export_webdataset: duplicate values in key column {key!r} "
            f"(shards {sorted(dup_shards)}); dedupe before exporting"
        )
    prepared.foreachPartition(lambda rows: list(_write_partition(rows)))
    prepared.unpersist(blocking=False)
    shards = {}
    for r in agg:
        sid = int(r["_cw_shard"])
        path = os.path.join(out_dir, f"shard-{sid:05d}.tar")
        shards[sid] = {"rows": int(r["rows"]), "bytes": os.path.getsize(path)}
    manifest = {
        "format": "webdataset/tar",
        "key": key,
        "n_shards": n_shards,
        "total_rows": sum(s["rows"] for s in shards.values()),
        "total_bytes": sum(s["bytes"] for s in shards.values()),
        "shards": shards,
    }
    tmp = os.path.join(out_dir, ".manifest.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return manifest


def verify_webdataset(out_dir: str) -> dict:
    """Consumer-side release check: every manifest shard exists with
    the recorded byte size; members group completely by key (a .txt or
    .bin member without its .json sibling is a broken sample); per-
    shard sample counts match. Returns {"ok": bool, "errors": [...],
    "samples": N}."""
    import tarfile

    errors: list[str] = []
    n_samples = 0
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    for sid_s, meta in sorted(manifest["shards"].items()):
        sid = int(sid_s)
        path = os.path.join(out_dir, f"shard-{sid:05d}.tar")
        if not os.path.isfile(path):
            errors.append(f"shard {sid}: missing")
            continue
        size = os.path.getsize(path)
        if size != meta["bytes"]:
            errors.append(f"shard {sid}: size {size} != manifest {meta['bytes']}")
        keys: dict[str, set] = {}
        with tarfile.open(path) as tf:
            for m in tf.getmembers():
                base, _, ext = m.name.rpartition(".")
                keys.setdefault(base, set()).add(ext)
        for base, exts in keys.items():
            if "json" not in exts:
                errors.append(f"shard {sid}: sample {base} lacks .json")
        if len(keys) != meta["rows"]:
            errors.append(
                f"shard {sid}: {len(keys)} samples != manifest {meta['rows']}"
            )
        n_samples += len(keys)
    return {"ok": not errors, "errors": errors, "samples": n_samples}
