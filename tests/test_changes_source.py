"""Custom ``couchdb_changes`` Python data source (R1/R2): batch and
micro-batch streaming reads with offset tracking and rate limiting.
"""

from __future__ import annotations

import json
import os
import random

import pytest
from pyspark.sql import functions as F

from couchwarehouse_spark.sources.changes_source import ChangesFeedDataSource

from .fixtures import envelope, order_doc


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(ChangesFeedDataSource)
    return spark


def _write_page(feed_dir, name, envs):
    os.makedirs(feed_dir, exist_ok=True)
    with open(os.path.join(feed_dir, name), "w") as f:
        for e in envs:
            f.write(json.dumps(e) + "\n")


def test_batch_read(registered, tmp_path):
    spark = registered
    rng = random.Random(51)
    feed = str(tmp_path / "feed")
    _write_page(feed, "p1.json", [envelope(i + 1, order_doc(i, rng)) for i in range(5)])
    _write_page(feed, "p2.json", [envelope(6, None, doc_id="order00000", deleted=True)])

    df = spark.read.format("couchdb_changes").option("path", feed).load()
    assert df.columns == ["seq", "id", "deleted", "doc"]
    assert df.count() == 6
    assert df.filter("deleted").count() == 1
    # doc is raw JSON — parseable downstream with the frozen schema.
    one = df.filter(F.col("id") == "order00001").collect()[0]
    assert json.loads(one["doc"])["_id"] == "order00001"


def test_stream_read_with_rate_limit(registered, tmp_path):
    spark = registered
    rng = random.Random(52)
    feed = str(tmp_path / "feed")
    for p in range(3):
        _write_page(
            feed, f"p{p}.json",
            [envelope(p * 10 + i + 1, order_doc(p * 10 + i, rng)) for i in range(4)],
        )

    stream = (
        spark.readStream.format("couchdb_changes")
        .option("path", feed)
        .option("maxPagesPerBatch", "1")  # R3 slow mode: one page per batch
        .load()
    )
    # Python streaming sources don't support Trigger.AvailableNow —
    # run on a processing-time trigger (the monitor mode anyway) and
    # stop once the feed is drained.
    import time

    q = (
        stream.writeStream.format("memory")
        .queryName("changes_out")
        .outputMode("append")
        .trigger(processingTime="1 seconds")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.sql("SELECT count(*) n FROM changes_out").collect()[0]["n"] >= 12:
                break
            time.sleep(1)
        assert spark.sql("SELECT count(*) n FROM changes_out").collect()[0]["n"] == 12
        # Rate limit: no micro-batch carried more than one page (4 rows).
        row_batches = [p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0]
        assert row_batches and max(row_batches) <= 4
    finally:
        q.stop()


def test_spool_survives_corrupt_feed_lines(spark, tmp_path):
    """PERMISSIVE JSON parsing turns malformed feed lines into all-null
    envelopes; the ingest filter must drop them explicitly so they
    never reach schema discovery or the merge — the good changes on
    the same page still land and the checkpoint advances to their max
    seq."""
    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "page1.jsonl").write_text(
        '{"seq":"1-a","id":"doc1","doc":{"_id":"doc1","_rev":"1-x","name":"alice"}}\n'
        "THIS IS NOT JSON {{{\n"
        '{"seq":"2-a","id":"doc2","doc":{"_id":"doc2","_rev":"1-x","name":"bob"}}\n'
        '{"seq":"3-a"\n'  # truncated envelope
    )
    from couchwarehouse_spark.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"), "robustdb", reset=True)
    last = wh.spool(str(feed))
    assert last == "2-a"
    rows = {r["id"]: r["name"] for r in wh.table().collect()}
    assert rows == {"doc1": "alice", "doc2": "bob"}
