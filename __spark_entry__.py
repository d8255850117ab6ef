"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`couchwarehouse_spark.plans` — the registry of
implemented operators from SURVEY.md §2. The driver's verify runs
``entry(spark)`` as a smoke check, runs each ``queries()[name]`` at
sf=0.01 and compares against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Importing the plan modules populates the registry.
import couchwarehouse_spark.plans.all  # noqa: F401
from couchwarehouse_spark.plans import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys → rows-only check."""
    return dict(ORACLES)
