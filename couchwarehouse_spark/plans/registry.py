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


# DataFrames persisted INSIDE a query body (some operators reuse an
# intermediate across several subtrees and cannot unpersist it before
# returning their lazy result). Registered here so the next query
# invocation releases them — callers that run many queries in one
# session (the driver gate, pytest, bench) never accumulate caches.
#
# ORDERING CONSTRAINT: release happens on ENTRY to every registered
# query, including nested calls (near_dup_clusters → ngram_jaccard_
# pairs). A query body must therefore invoke other registered queries
# BEFORE its own scoped_persist/scoped_register calls, or the nested
# entry would release the caller's still-needed frames.
_SCOPED_PERSISTS: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` until the NEXT registered query is invoked."""
    out = df.persist()
    _SCOPED_PERSISTS.append(out)
    return out


def scoped_register(df: DataFrame) -> DataFrame:
    """Register an ALREADY-persisted frame for next-query release."""
    _SCOPED_PERSISTS.append(df)
    return df


def release_scoped() -> None:
    while _SCOPED_PERSISTS:
        try:
            _SCOPED_PERSISTS.pop().unpersist()
        except Exception:
            pass  # session already stopped


from contextlib import contextmanager


@contextmanager
def scoped_shuffle(spark: SparkSession, n: int):
    """Scope ``spark.sql.shuffle.partitions`` for a harness-bound e2e
    body. Streaming state partitions are FIXED at a query's first run
    from this conf, and every partition is a per-batch state-store
    file + task; batch warehouse merges over bounded fixtures pay the
    same fixed per-task cost. The session default returns on exit —
    production sizing goes UP with volume, this scopes the harness,
    not the design."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def query_scoped_shuffle(
    name: str,
    oracle: str | None = None,
    *,
    partitions: int | Callable[[str], int],
) -> Callable[[QueryFn], QueryFn]:
    """Register a query whose BODY runs under ``scoped_shuffle`` (the
    returned lazy DataFrame — a small post-run aggregate — evaluates
    under the restored session default). ``partitions`` may be a
    callable of ``sf_dir`` so the count derives from the input volume
    at call time rather than a constant fixed at import time."""

    def deco(fn: QueryFn) -> QueryFn:
        def scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
            n = partitions(sf_dir) if callable(partitions) else partitions
            with scoped_shuffle(spark, n):
                return fn(spark, sf_dir)

        scoped.__name__ = fn.__name__
        scoped.__doc__ = fn.__doc__
        scoped.__module__ = fn.__module__  # family introspection
        scoped.__wrapped__ = fn
        return query(name, oracle)(scoped)

    return deco


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle.

    ``oracle=None`` marks a genuinely non-SQL-expressible op — the
    driver then records a weaker rows-only check for it.
    """

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_scoped()
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco
