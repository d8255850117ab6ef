"""Bucketed (co-located) joins — the shuffle-elimination strategy for
repeated large-fact joins (SURVEY.md scale stance).

At 100 TB the dominant cost of orders ⋈ lineitem is shuffling both
fact tables on the join key for EVERY query. Bucketing pays that
shuffle once at write time: both tables hash-partitioned into the
same number of buckets on the key, so every later join (and groupBy
on the key) runs Exchange-free — each task zips bucket i with
bucket i.

Plain helper over ``DataFrameWriter.bucketBy``; tests assert the
resulting join plan contains NO Exchange on either side. Delta/
Iceberg replace this with clustering/sort-order metadata, same idea.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    Sorting within buckets additionally removes the Sort from
    sort-merge joins — the join becomes a pure zip of pre-sorted
    bucket files.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    With matching bucket counts Catalyst plans a SortMergeJoin with
    ZERO Exchange operators — verified by tests/test_bucketing.py.
    """
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
