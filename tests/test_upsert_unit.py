"""Unit tests for the merge kernel (R11/R12) and multimodal plumbing
(X3) on hand-built frames.
"""

from __future__ import annotations

from couchwarehouse_spark.multimodal import (
    FEATURE_DIM,
    _fake_features,
    extract_features,
    media_struct,
)
from couchwarehouse_spark.operators.upsert import (
    SEQ_COL,
    latest_wins,
    merge_batch,
)

from pyspark.sql import functions as F


def _frame(spark, rows):
    return spark.createDataFrame(rows, f"id string, v string, {SEQ_COL} long")


def test_latest_wins_picks_highest_seq(spark):
    df = _frame(spark, [("a", "v1", 1), ("a", "v2", 5), ("a", "v3", 3), ("b", "x", 2)])
    got = {r["id"]: r["v"] for r in latest_wins(df).collect()}
    assert got == {"a": "v2", "b": "x"}


def test_merge_batch_upsert_delete_recreate(spark):
    state = _frame(spark, [("a", "old", 1), ("b", "keep", 2)])
    upserts = _frame(spark, [("a", "new", 10), ("c", "created", 11)])
    tombs = spark.createDataFrame([("b", 12), ("c", 5)], f"id string, {SEQ_COL} long")
    # b deleted at seq 12 (after its state seq 2) → gone.
    # c tombstone at seq 5 but re-created at seq 11 → survives.
    got = {r["id"]: r["v"] for r in merge_batch(state, upserts, tombs).collect()}
    assert got == {"a": "new", "c": "created"}


def test_merge_batch_idempotent_replay(spark):
    state = _frame(spark, [("a", "v", 5)])
    replay = _frame(spark, [("a", "v", 5)])  # same batch again
    got = merge_batch(state, replay, None).collect()
    assert len(got) == 1 and got[0]["v"] == "v"


def test_multimodal_feature_determinism(spark):
    assert _fake_features(b"abc") == _fake_features(b"abc")
    assert _fake_features(b"abc") != _fake_features(b"abd")
    assert len(_fake_features(b"")) == FEATURE_DIM

    df = spark.createDataFrame([(1, "hello"), (2, "")], "doc_id long, text string")
    with_media = df.withColumn(
        "media", media_struct(F.encode("text", "utf-8"), F.lit("text/plain"))
    )
    feats = {r["doc_id"]: r for r in extract_features(with_media).collect()}
    assert feats[1]["n_bytes"] == 5
    assert feats[2]["n_bytes"] == 0
    assert feats[1]["feature"] == _fake_features(b"hello")


def test_decode_stub_raises():
    import pytest

    from couchwarehouse_spark.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(None)
