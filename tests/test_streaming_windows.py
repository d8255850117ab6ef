"""D4 in the STREAMING lane: watermarked event-time windows over a
file stream (the batch entries in plans/events_windows.py share the
same window expressions), plus the reference-lifecycle start() API
and scale-path approximate aggregates.
"""

from __future__ import annotations

import json
import os
import random

from pyspark.sql import functions as F

from couchwarehouse_spark.warehouse import Warehouse

from .fixtures import envelope, order_doc


def test_streaming_tumbling_window_with_watermark(spark, tmp_path):
    src = str(tmp_path / "ev")
    os.makedirs(src)
    rows = [
        {"ts": "2024-01-01 10:05:00", "event_type": "view", "value": 1.0},
        {"ts": "2024-01-01 10:20:00", "event_type": "view", "value": 2.0},
        {"ts": "2024-01-01 11:10:00", "event_type": "click", "value": 3.0},
        {"ts": "2024-01-01 10:59:00", "event_type": "view", "value": 4.0},  # late, in horizon
    ]
    with open(os.path.join(src, "a.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("ts STRING, event_type STRING, value DOUBLE")
        .json(src)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(F.date_format("w.start", "HH:mm").alias("start"), "event_type", "n", "total")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["start"], r["event_type"]): (r["n"], r["total"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    assert got[("10:00", "view")] == (3, 7.0)  # late event landed in its window
    assert got[("11:00", "click")] == (1, 3.0)


def test_warehouse_start_lifecycle(spark, tmp_path):
    """Reference start(): spool the landing zone, return last seq."""
    rng = random.Random(41)
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    with open(os.path.join(feed_dir, "p1.json"), "w") as f:
        for i in range(4):
            f.write(json.dumps(envelope(i + 1, order_doc(i, rng))) + "\n")

    wh = Warehouse(spark, str(tmp_path / "wh"), "startdata")
    last = wh.start(feed_dir)
    assert last.startswith("4-")
    assert wh.table().count() == 4


def test_approx_count_distinct_scale_path(spark):
    """The documented 100 TB alternative to exact count(DISTINCT)
    (see agg_stats): HLL sketch within its standard error."""
    from couchwarehouse_spark.catalog import load_table

    from .conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem")
    exact = li.select(F.countDistinct("l_suppkey")).collect()[0][0]
    approx = li.select(F.approx_count_distinct("l_suppkey", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.06  # 3σ of rsd=2%


def test_write_elasticsearch_fallback(spark, tmp_path):
    from couchwarehouse_spark.sinks.elasticsearch import write_elasticsearch

    df = spark.createDataFrame([("a", "x")], "id string, v string")
    lane = write_elasticsearch(df, "idx", fallback_path=str(tmp_path / "bulk"))
    assert lane == "bulk-file"
    assert spark.read.text(str(tmp_path / "bulk")).count() == 2


class TestDropDuplicatesWithinWatermarkSemantics:
    """Round-10 pins for the probed ``dropDuplicatesWithinWatermark``
    semantics the ``streaming_dedup_watermark_e2e`` oracle relies on
    (each probed empirically before the entry was written):

    1. an exact-ts duplicate is NEVER re-admitted — while the key's
       state lives it is deduplicated, and once the state expired the
       duplicate is necessarily below the watermark (expiry < wm
       implies ts < wm) and dropped as late input;
    2. a re-stamped retry whose key state is still live is dropped;
    3. a re-stamped retry arriving after an INTERVENING batch whose
       cleanup ran with the watermark past the key's expiry is
       re-admitted (state bounded — the operator's reason to exist).
    """

    def _run(self, spark, tmp_path, batches, delay="1 hour"):
        import shutil
        import time

        base = str(tmp_path / "wm")
        stage = os.path.join(base, "in")
        os.makedirs(stage)
        t0 = time.time()
        for i, rows in enumerate(batches):
            df = spark.createDataFrame(rows, "k string, ts timestamp")
            tmp = os.path.join(base, f"f{i}")
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            for f in os.listdir(tmp):
                if f.endswith(".parquet"):
                    dst = os.path.join(stage, f"file{i}_{f}")
                    shutil.copyfile(os.path.join(tmp, f), dst)
                    os.utime(dst, (t0 + i, t0 + i))
        stream = (
            spark.readStream.schema("k string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
            .withWatermark("ts", delay)
            .dropDuplicatesWithinWatermark(["k"])
        )
        qname = f"wmpin_{abs(hash(base)) % 10_000_000}"
        q = (
            stream.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            (r.k, r.ts) for r in spark.table(qname).collect()
        )

    def test_exact_ts_duplicate_never_readmitted(self, spark, tmp_path):
        from datetime import datetime, timedelta

        t0 = datetime(2024, 1, 1)
        h = lambda n: t0 + timedelta(hours=n)  # noqa: E731
        out = self._run(
            spark,
            tmp_path,
            [
                [("A", h(0)), ("B", h(10))],  # wm -> 9h after this batch
                # A's state (expiry 1h) is evicted by now, but the
                # exact-ts duplicate is below the watermark -> late;
                # B's duplicate is within state lifetime -> deduped.
                [("A", h(0)), ("B", h(10)), ("C", h(20))],
            ],
        )
        assert out == [("A", h(0)), ("B", h(10)), ("C", h(20))]

    def test_restamped_retry_within_lifetime_dropped(self, spark, tmp_path):
        from datetime import datetime, timedelta

        t0 = datetime(2024, 1, 1)
        h = lambda n: t0 + timedelta(hours=n)  # noqa: E731
        out = self._run(
            spark,
            tmp_path,
            [
                [("B", h(10))],
                # retry at 10h30: state expiry 11h, wm 9h -> dropped
                [("B", h(10.5)), ("Z", h(20))],
            ],
        )
        assert out == [("B", h(10)), ("Z", h(20))]

    def test_restamped_retry_after_eviction_readmitted(self, spark, tmp_path):
        from datetime import datetime, timedelta

        t0 = datetime(2024, 1, 1)
        h = lambda n: t0 + timedelta(hours=n)  # noqa: E731
        out = self._run(
            spark,
            tmp_path,
            [
                [("A", h(0)), ("B", h(10))],  # wm -> 9h
                [("F", h(11))],  # cleanup with wm 9h evicts A (expiry 1h)
                # A re-admitted (state gone, 12h >= wm 10h);
                # B still live (expiry 11h > wm 10h) -> dropped
                [("A", h(12)), ("B", h(12)), ("Z", h(20))],
            ],
        )
        assert out == [("A", h(0)), ("A", h(12)), ("B", h(10)),
                       ("F", h(11)), ("Z", h(20))]
