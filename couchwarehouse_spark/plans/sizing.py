"""Data-volume-derived partition sizing (guide §2).

Partition counts pinned to the CPU count (``defaultParallelism``) are
tuned to neither the bench fixtures nor a production cluster: at
sf0.1 they schedule 32 tasks over KB-scale shuffles (pure per-task
overhead — the driver's 8-core runs beat its 32-core runs on the same
code), and at 100 TB they under-partition by orders of magnitude.
These helpers derive the width from the INPUT BYTES the stage actually
reads, with a floor (so compute-dense stages keep real parallelism on
tiny fixtures) and a cap (scheduler sanity). Every dial has an env
override so a cluster deploy can re-size without a code change.
"""

from __future__ import annotations

import os

# One task per this many input bytes for COMPUTE-DENSE stages (bucket
# self-joins, per-row hashing): the work per byte is orders of
# magnitude above a scan's — 1 MB of embeddings is ~2k vectors, up to
# ~4M intra-bucket cosine pairs — so the density is deliberately far
# below the 128 MB scan-split size. Production override:
# SPARK_GRAFT_PAIR_TASK_BYTES.
PAIR_TASK_BYTES = 1 << 20

# Floor: keep compute-dense stages genuinely parallel on bounded
# fixtures (a single small parquet file otherwise scans as ONE task).
WIDTH_FLOOR = 8

# Cap: scheduler sanity for the derived counts at extreme volumes.
WIDTH_CAP = 1 << 16

# Streaming/warehouse e2e state sizing: one state partition per this
# many source bytes. State partitions are per-batch state-store files
# + tasks, FIXED at the query's first run — sized UP from volume in
# production, floored at 8 on bounded fixtures (the measured r11
# sweet spot at these sizes). Override: SPARK_GRAFT_E2E_SHUFFLE
# (count) / SPARK_GRAFT_STATE_PARTITION_BYTES (density).
STATE_PARTITION_BYTES = 64 << 20
STATE_FLOOR = 8
STATE_CAP = 32768


def _input_bytes(sf_dir: str, tables: tuple[str, ...]) -> int | None:
    total = 0
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        try:
            if os.path.isfile(p):
                total += os.path.getsize(p)
            elif os.path.isdir(p):
                total += sum(
                    e.stat().st_size for e in os.scandir(p) if e.is_file()
                )
            else:
                return None  # non-local / unknown layout
        except OSError:
            return None
    return total


def data_width(
    spark,
    sf_dir: str,
    *tables: str,
    per_task_bytes: int | None = None,
    floor: int = WIDTH_FLOOR,
    cap: int = WIDTH_CAP,
) -> int:
    """Explicit repartition width for a compute-dense stage reading
    ``tables`` under ``sf_dir``: max(core count, input-bytes /
    per-task-bytes), clamped to [floor, cap]. An explicit width keeps
    the stage exempt from AQE's size-based coalescing (byte-light,
    compute-heavy rows would otherwise collapse to one task).

    The CORE-COUNT floor is a measured constraint, not a tuning
    leftover: these stages are compute-dense (pair cosine work, per-row
    hashing), so a width below the executor slot count idles cores
    during the heaviest stage — the r13 interleaved A/B of a
    bytes-only width (8 over the sf0.1 fixtures) regressed every
    iterative kNN-graph consumer 1.2-1.5x on local[32] while freeing
    nothing. With the floor, the local widths are identical to the old
    ``defaultParallelism`` pin at every bench core count, and a real
    corpus still scales the width with VOLUME (bytes/per-task dwarfs
    the slot count long before 100 TB) instead of pinning it to
    whatever the cluster happens to have. Falls back to the old pin
    when the input size cannot be read (non-local filesystem)."""
    per_task = per_task_bytes or int(
        os.environ.get("SPARK_GRAFT_PAIR_TASK_BYTES", PAIR_TASK_BYTES)
    )
    total = _input_bytes(sf_dir, tables)
    if total is None:
        return spark.sparkContext.defaultParallelism
    derived = -(-total // per_task)
    return max(floor, spark.sparkContext.defaultParallelism, min(cap, derived))


def state_partitions(sf_dir: str) -> int:
    """Shuffle/state partition count for a bounded e2e body, derived
    from the source volume under ``sf_dir`` (total dir bytes / 64 MB,
    clamped to [8, 32768]) — degrades to the measured floor of 8 on
    the local fixtures and grows with real volume. Env override
    SPARK_GRAFT_E2E_SHUFFLE wins outright."""
    env = os.environ.get("SPARK_GRAFT_E2E_SHUFFLE")
    if env:
        return int(env)
    per_part = int(
        os.environ.get("SPARK_GRAFT_STATE_PARTITION_BYTES", STATE_PARTITION_BYTES)
    )
    try:
        total = sum(
            e.stat().st_size for e in os.scandir(sf_dir) if e.is_file()
        )
    except OSError:
        return STATE_FLOOR
    return max(STATE_FLOOR, min(STATE_CAP, -(-total // per_part)))
