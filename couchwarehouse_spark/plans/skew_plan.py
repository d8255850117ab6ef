"""Skew-safe aggregation entry: events.event_type has FIVE distinct
values — a real skew case (5 hot keys vs 32+ reducers). The salted
two-phase plan computes identical results while spreading each hot
key over n_salts reducers; the oracle is the plain GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from couchwarehouse_spark.catalog import load_table
from couchwarehouse_spark.operators.skew import salted_aggregate
from couchwarehouse_spark.plans.registry import query


@query(
    "salted_skew_aggregate",
    oracle="""
    SELECT event_type,
           count(value) AS n_events,
           round(sum(value), 2) AS total_value,
           round(max(value), 2) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def salted_skew_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation on a 5-value key (skew technique).

    A plain groupBy(event_type) uses at most 5 reducers however many
    cores exist; the salted plan's first shuffle has 5×16 keys — full
    parallelism — and the second merges 16 tiny partials per key.
    Value-identical to the oracle's plain GROUP BY by construction
    (sum/count/max are algebraic). Note the oracle counts
    ``count(value)`` — ``salted_aggregate``'s count is a per-column
    (non-null) count, not ``count(*)``.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    out = salted_aggregate(
        ev,
        "event_type",
        {
            "n_events": ("value", "count"),
            "_sum_value": ("value", "sum"),
            "_max_value": ("value", "max"),
        },
        n_salts=16,
    )
    return out.select(
        "event_type",
        "n_events",
        F.round("_sum_value", 2).alias("total_value"),
        F.round("_max_value", 2).alias("max_value"),
    )
