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
