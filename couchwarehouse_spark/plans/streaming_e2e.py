"""D-tier Structured Streaming under the ORACLE gate.

The streaming surface (micro-batch ingest, checkpoint resume, state
stores, watermark semantics) is proven by tests/test_streaming.py
golden runs; these entries go further and put an ACTUAL
``readStream → writeStream`` execution under the driver's
DuckDB-oracle comparison — the stream must produce exactly the answer
the batch SQL states, file-split micro-batching and state-store
merges included.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from couchwarehouse_spark.catalog import load_table
from couchwarehouse_spark.plans.registry import query

SW_HOURS = 6  # tumbling-window width (epoch-aligned in both engines)
SW_FILES_PER_TRIGGER = 2  # force several micro-batches over the stage dir
SW_STAGE_FILES = 8


@query(
    "streaming_window_counts_e2e",
    oracle=f"""
    SELECT strftime(to_timestamp(CAST(floor(epoch(ts)
                                     / {SW_HOURS * 3600}) AS BIGINT)
                                 * {SW_HOURS * 3600}),
                    '%Y-%m-%d %H:%M') AS win_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events
    GROUP BY 1, 2
    ORDER BY win_start, event_type
    """,
)
def streaming_window_counts_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1+D4 under the oracle gate: stage the events table as
    {SW_STAGE_FILES} parquet files, stream them back with
    ``maxFilesPerTrigger={SW_FILES_PER_TRIGGER}`` (so the run is a
    REAL multi-micro-batch execution whose windowed aggregation state
    merges across triggers, not a single-batch replay), aggregate
    into epoch-aligned {SW_HOURS}-hour tumbling windows, and sink to
    an in-memory table the entry returns. The DuckDB oracle states
    the same aggregation relationally — a hash match certifies the
    streaming engine's incremental state arithmetic end to end.

    Complete output mode keeps every window's state in the store (no
    watermark eviction), so the final emission is exactly the batch
    answer regardless of file/batch arrival order; the files arrive
    in hash order, i.e. genuinely out of event-time order, which is
    the point. Watermark-DROP semantics (a different contract —
    deliberately lossy) are covered by ``event_lateness_census`` and
    the streaming golden tests.

    Exactness: counts and cent-quantized value sums are integers; the
    window start is integer epoch floor arithmetic in both engines.

    Scale: this is the standard production shape — per-trigger work
    is one partial agg into the state store keyed by (window, type);
    state size is bounded by windows·types, not events. The stage
    write is the test harness, not the operator.
    """
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"cw_stream_{tag}")
    stage = os.path.join(base, "in")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    ev.repartition(SW_STAGE_FILES).write.mode("overwrite").parquet(stage)

    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", SW_FILES_PER_TRIGGER)
        .parquet(stage)
    )
    agg = stream.groupBy(
        F.window("ts", f"{SW_HOURS} hours").alias("win"), "event_type"
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("value_cents"),
    )
    qname = f"cw_stream_out_{tag}"
    q = (
        agg.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(qname)
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm").alias(
                "win_start"
            ),
            "event_type",
            "n_events",
            "value_cents",
        )
        .orderBy("win_start", "event_type")
    )


SD_COPIES = 3  # each doc id arrives this many times across the stream


@query(
    "streaming_dedup_e2e",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_unique_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def streaming_dedup_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 stateful streaming dedup under the oracle gate: stage the
    documents table {SD_COPIES}× (every doc id arrives repeatedly,
    spread across files so duplicates land in DIFFERENT micro-
    batches), stream it back through ``dropDuplicates('doc_id')`` —
    Spark's keyed dedup STATE STORE — and aggregate the survivors per
    source. The oracle is simply the batch answer over the original
    table: a hash match proves the state store admitted each key
    exactly once across micro-batch boundaries, which is precisely
    the exactly-once ingest guarantee the warehouse's latest-wins
    merge provides in batch (operators/upsert.py).

    Exactness: survivor rows are byte-identical copies of the
    original rows, so any duplicate admitted or survivor lost flips
    integer counts.

    Scale: dedup state is one entry per key — the unbounded-state
    caveat is real at 100 TB, where production adds a watermark over
    an arrival-time column to age keys out (documented trade-off;
    the bounded-state lane is the warehouse's bucketed merge).
    """
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"cw_sdedup_{tag}")
    stage = os.path.join(base, "in")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    copies = d
    for _ in range(SD_COPIES - 1):
        copies = copies.unionByName(d)
    copies.repartition(SW_STAGE_FILES).write.mode("overwrite").parquet(stage)

    stream = (
        spark.readStream.schema("doc_id long, source string, n_chars long")
        .option("maxFilesPerTrigger", SW_FILES_PER_TRIGGER)
        .parquet(stage)
    )
    deduped = stream.dropDuplicates(["doc_id"])
    agg = deduped.groupBy("source").agg(
        F.count("*").cast("long").alias("n_unique_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    qname = f"cw_sdedup_out_{tag}"
    q = (
        agg.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname).orderBy("source")
