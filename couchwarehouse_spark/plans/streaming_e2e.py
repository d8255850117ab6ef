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


WI_SUBSET = 9  # streaming-ingest e2e feeds only o_orderkey % 9 == 0
# (coprime with AMEND=7 and DELETE=10; volume is not the cost here —
# the batch count is, so the stage is 4 files / 2 micro-batches:
# every amendment and tombstone lands AFTER its insert's batch has
# committed through the streaming checkpoint)
WI_FILES_PER_TRIGGER = 2
WI_STAGE_FILES = 4

from couchwarehouse_spark.plans.warehouse_e2e import (  # noqa: E402
    AMEND,
    DELETE,
    FEED_DOC_DDL,
)
from couchwarehouse_spark.streaming.ingest import monitor_warehouse  # noqa: E402
from couchwarehouse_spark.warehouse import Warehouse  # noqa: E402


@query(
    "warehouse_streaming_ingest_e2e",
    oracle=f"""
    SELECT CASE WHEN o_orderkey % {{amend}} = 0 THEN 'amended'
                ELSE o_orderstatus END        AS status,
           CAST(count(*) AS BIGINT)           AS n_orders,
           round(sum(o_totalprice), 2)        AS total_revenue
    FROM orders
    WHERE o_orderkey % {{subset}} = 0 AND o_orderkey % {{delete}} <> 0
    GROUP BY 1
    """.format(amend=AMEND, delete=DELETE, subset=WI_SUBSET),
)
def warehouse_streaming_ingest_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/D2/D3 through the REAL warehouse under the oracle gate: the
    derived insert+amend+tombstone changes feed lands as
    {WI_STAGE_FILES} seq-ORDERED files (a CouchDB changes feed is
    seq-ordered, and a landing-zone tailer writes pages in feed
    order), ``monitor_warehouse`` streams them in with
    ``maxFilesPerTrigger={WI_FILES_PER_TRIGGER}`` — so inserts,
    amendments, and tombstones for the same id arrive in DIFFERENT
    foreachBatch micro-batches and the latest-wins/delete semantics
    must hold ACROSS the streaming checkpoint boundary, not within
    one batch — and the entry queries the final conformed table. The
    oracle states the post-ETL answer straight from ``orders``; the
    batch twin is ``warehouse_e2e_pipeline`` (same kernel, one
    spool).

    Scale: each micro-batch is the bounded bucket-pruned merge the
    batch lane runs; the streaming checkpoint adds offset-exact
    resume. The stage write is harness, not operator.
    """
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"cw_wstream_{tag}")
    feed_dir = os.path.join(base, "feed")
    wh_dir = os.path.join(base, "wh")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % WI_SUBSET == 0
    )
    doc = F.struct(
        F.concat(F.lit("order"), F.col("o_orderkey").cast("string")).alias("_id"),
        F.lit("1-x").alias("_rev"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total"),
        F.struct(F.col("o_custkey").alias("id")).alias("customer"),
    )
    amended = F.struct(
        doc["_id"].alias("_id"),
        F.lit("2-x").alias("_rev"),
        F.lit("amended").alias("status"),
        doc["total"].alias("total"),
        doc["customer"].alias("customer"),
    )

    def env(seq_col, doc_col, deleted: bool):
        fields = [
            F.concat(seq_col.cast("string"), F.lit("-seq")).alias("seq"),
            F.concat(F.lit("order"), F.col("o_orderkey").cast("string")).alias("id"),
        ]
        if deleted:
            fields.append(F.lit(True).alias("deleted"))
        if doc_col is not None:
            fields.append(doc_col.alias("doc"))
        return F.struct(
            seq_col.cast("long").alias("sortseq"),
            F.to_json(F.struct(*fields)).alias("value"),
        )

    envs = F.array(
        env(F.col("o_orderkey"), doc, False),
        F.when(
            F.col("o_orderkey") % AMEND == 0,
            env(F.col("o_orderkey") + F.lit(1_000_000_000), amended, False),
        ),
        F.when(
            F.col("o_orderkey") % DELETE == 0,
            env(F.col("o_orderkey") + F.lit(2_000_000_000), None, True),
        ),
    )
    feed = orders.select(
        F.explode(F.filter(envs, lambda x: x.isNotNull())).alias("e")
    ).select("e.sortseq", "e.value")
    # Seq-ordered landing files: ascending range partitions land in
    # ascending part-file NAMES — but FileStreamSource orders by
    # MODIFICATION TIME, and the parallel write finishes files in
    # arbitrary order (observed: the lowest-seq insert file landing
    # after the tombstone batch resurrected its deleted ids — the
    # latest-wins merge deletes the row and a feed replayed out of
    # order re-inserts it; a real _changes tail is seq-ordered, which
    # is exactly what this models). Publish the staged files into the
    # landing dir with explicitly monotonic mtimes so the stream
    # drains them in feed order, the way a tailer writes pages.
    stage_tmp = os.path.join(base, "feed_stage")
    (
        feed.repartitionByRange(WI_STAGE_FILES, "sortseq")
        .sortWithinPartitions("sortseq")
        .select("value")
        .write.mode("overwrite")
        .text(stage_tmp)
    )
    os.makedirs(feed_dir, exist_ok=True)
    parts = sorted(
        f for f in os.listdir(stage_tmp)
        if f.startswith("part-") and f.endswith(".txt")
    )
    import time as _time

    t0 = _time.time()
    for i, f in enumerate(parts):
        dst = os.path.join(feed_dir, f)
        shutil.copyfile(os.path.join(stage_tmp, f), dst)
        os.utime(dst, (t0 + i, t0 + i))

    wh = Warehouse(spark, wh_dir, "strorders", reset=True, feed_schema=FEED_DOC_DDL)
    q = monitor_warehouse(
        wh,
        feed_dir,
        ckpt,
        available_now=True,
        max_files_per_trigger=WI_FILES_PER_TRIGGER,
    )
    q.awaitTermination()

    return (
        wh.table()
        .groupBy("status")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.sum("total"), 2).alias("total_revenue"),
        )
    )
