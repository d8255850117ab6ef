"""Skew operators (salted agg/join) and partition-pruning writes."""

from __future__ import annotations

from pyspark.sql import functions as F

from couchwarehouse_spark.catalog import load_table
from couchwarehouse_spark.operators.skew import salted_aggregate, salted_join

from .conftest import SF_SMOKE


def test_salted_aggregate_matches_plain(spark):
    ev = load_table(spark, SF_SMOKE, "events").select("event_type", "value")
    plain = {
        r["event_type"]: (r["n"], round(r["s"], 6))
        for r in ev.groupBy("event_type")
        .agg(F.count("value").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    salted = {
        r["event_type"]: (r["n"], round(r["s"], 6))
        for r in salted_aggregate(
            ev, "event_type", {"n": ("value", "count"), "s": ("value", "sum")}, n_salts=8
        ).collect()
    }
    assert salted == plain


def test_salted_aggregate_spreads_the_shuffle(spark):
    """Phase-1 shuffle key is (key, salt): the exchange must hash on
    both columns — that IS the skew spread."""
    ev = load_table(spark, SF_SMOKE, "events").select("event_type", "value")
    out = salted_aggregate(ev, "event_type", {"n": ("value", "count")}, n_salts=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_cw_salt" in plan  # salt participates in the first exchange


def test_salted_join_matches_plain(spark):
    ev = load_table(spark, SF_SMOKE, "events").select("event_type", "value")
    dim = spark.sql(
        "SELECT * FROM VALUES ('view', 1.0D), ('click', 2.0D), ('purchase', 3.0D), "
        "('signup', 4.0D), ('error', 5.0D) AS t(event_type, weight)"
    )
    plain = (
        ev.join(dim, "event_type")
        .agg(F.round(F.sum(F.col("value") * F.col("weight")), 4).alias("x"))
        .collect()[0]["x"]
    )
    salted = (
        salted_join(ev, dim, on="event_type", n_salts=8)
        .agg(F.round(F.sum(F.col("value") * F.col("weight")), 4).alias("x"))
        .collect()[0]["x"]
    )
    assert salted == plain


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Date-partitioned layout + a date filter → the scan must list
    only matching partitions (PartitionFilters, not a full scan)."""
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "events_by_day")
    ev.write.mode("overwrite").partitionBy("day").parquet(path)

    some_day = ev.select("day").orderBy("day").limit(1).collect()[0]["day"]
    q = spark.read.parquet(path).filter(F.col("day") == some_day)
    plan = q._sc._jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in plan
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "day" in pf_line  # the filter reached partition pruning
    # And pruning actually limits what is read:
    n_days = ev.select("day").distinct().count()
    assert q.count() < ev.count() or n_days == 1
