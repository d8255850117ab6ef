"""Bucketed co-located join: the join plan must contain NO shuffle."""

from __future__ import annotations

import pytest

from couchwarehouse_spark.catalog import load_table
from couchwarehouse_spark.operators.bucketing import colocated_join, write_bucketed

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "cw_orders_bucketed", "o_orderkey", n_buckets=8)
    write_bucketed(lineitem, "cw_lineitem_bucketed", "o_orderkey", n_buckets=8)
    yield "cw_orders_bucketed", "cw_lineitem_bucketed"
    spark.sql("DROP TABLE IF EXISTS cw_orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS cw_lineitem_bucketed")


def test_colocated_join_has_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    # Disable broadcast so the plan shows the big-table strategy this
    # demo exists for (at sf0.001 everything fits under the broadcast
    # threshold; at real scale neither side would).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, left, right, on="o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # the whole point: zero shuffle
        n = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    expected = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    assert n == expected


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    """Aggregating on the bucket key reuses the bucket partitioning."""
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("o_orderkey").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _bucket_files(path: str, b: int = 0) -> dict[str, bytes]:
    """name -> content for every parquet part in one bucket dir."""
    import os

    bdir = os.path.join(path, f"_cw_bucket={b}")
    return {
        fn: open(os.path.join(bdir, fn), "rb").read()
        for fn in sorted(os.listdir(bdir))
        if fn.endswith(".parquet")
    }


def test_merge_keeps_untouched_files_byte_identical(spark, tmp_path):
    """File-level merge pruning: within an affected bucket, a part
    file whose id min/max range misses every batch id must survive
    the merge byte-identical (same name, same bytes) — only
    intersecting files are rewritten. n_buckets=1 forces every batch
    into one bucket so the file-level (not bucket-level) pruning is
    what's under test."""
    from couchwarehouse_spark.warehouse import Warehouse

    from .fixtures import envelope, person_doc, write_feed
    import random

    rng = random.Random(43)
    wh = Warehouse(spark, str(tmp_path / "wh"), "filemerge", n_buckets=1)
    path = wh._table_path("_default")

    # Batch 1: ids aaa* — lands as the bucket's first file(s).
    def doc(i, prefix):
        d = person_doc(i, rng)
        d["_id"] = f"{prefix}{i:04d}"
        return d

    feed1 = write_feed(
        str(tmp_path / "f1"), [envelope(i + 1, doc(i, "aaa")) for i in range(5)]
    )
    wh.spool(feed1)
    gen1 = _bucket_files(path)
    assert gen1

    # Batch 2: ids zzz* — same bucket, but every aaa-file's id range
    # misses them: those files must not be rewritten.
    feed2 = write_feed(
        str(tmp_path / "f2"), [envelope(i + 6, doc(i, "zzz")) for i in range(5)]
    )
    wh.spool(feed2)
    gen2 = _bucket_files(path)
    for name, blob in gen1.items():
        assert gen2[name] == blob, f"{name} was rewritten"
    assert len(gen2) > len(gen1)  # zzz rows arrived in new file(s)
    assert wh.table().count() == 10

    # Batch 3: update one zzz id — aaa files still byte-identical,
    # at least one zzz file rewritten, update visible.
    upd = doc(2, "zzz")
    upd["name"] = "updated"
    feed3 = write_feed(str(tmp_path / "f3"), [envelope(11, upd)])
    wh.spool(feed3)
    gen3 = _bucket_files(path)
    for name, blob in gen1.items():
        assert gen3[name] == blob, f"{name} was rewritten by batch 3"
    assert wh.table().count() == 10
    assert (
        wh.table().filter("id = 'zzz0002'").collect()[0]["name"] == "updated"
    )
    # And a delete: aaa0001 goes away; every OTHER aaa row intact.
    feed4 = write_feed(
        str(tmp_path / "f4"),
        [envelope(12, None, doc_id="aaa0001", deleted=True)],
    )
    wh.spool(feed4)
    assert wh.table().count() == 9
    assert wh.table().filter("id like 'aaa%'").count() == 4
