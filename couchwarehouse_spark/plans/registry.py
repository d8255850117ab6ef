"""Registry wiring SURVEY.md §2 operators to the driver contract.

Each implemented operator registers a callable ``(spark, sf_dir) ->
DataFrame`` plus (when SQL-expressible) the equivalent ANSI SQL that
DuckDB runs on the same parquet for the correctness oracle. Column
names must match between the two lanes — alias everything.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle.

    ``oracle=None`` marks a genuinely non-SQL-expressible op — the
    driver then records a weaker rows-only check for it.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
