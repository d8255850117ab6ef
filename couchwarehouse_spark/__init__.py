"""couchwarehouse_spark — a PySpark-native analytics engine with the
capabilities of glynnbird/couchwarehouse (reference: /root/reference).

The reference is a CouchDB→SQL-warehouse ETL (spool + monitor the
`_changes` feed into SQLite/PostgreSQL/MySQL/Elasticsearch) whose query
surface is the target database's SQL. Here Spark is both the ETL
runtime (DataFrame / Structured Streaming) and the warehouse
(Spark SQL / Catalyst), so the query surface is implemented natively.

Layout:
  session      — SparkSession builder tuned for local[N] and cluster use
  catalog      — testdata table loading / view registration
  warehouse    — end-to-end ETL orchestration (spool → discover →
                 conform → merge → SQL) with checkpoints and reset
  multimodal   — binary media columns + Arrow feature-extraction (X3)
  operators/   — document kernel (flatten/schema/conform/DDL), upsert/
                 tombstone merge, checkpoint store, bucketed joins
  functions/   — Mango selector→Column compiler, scalar helpers
  sources/     — changes-feed batch reader (split/design-doc/transform)
  sinks/       — JDBC adapters, Elasticsearch bulk lane + full-text
  plans/       — the query registry: 50+ operators from SURVEY.md §2,
                 each a (spark_query, duckdb_oracle) pair
  streaming/   — structured-streaming ingest (AvailableNow spool /
                 monitor), stateful ops, progress listeners
"""

from couchwarehouse_spark.session import get_spark

__version__ = "0.1.0"

# The reference exports {start, stop} (reference index.js:257-260) and
# DOCUMENTS query() without exporting it (a reference bug, see
# SURVEY.md §2.A R17) — here all three are real. `start` mirrors
# `couchwarehouse.start(opts)`: spool the feed into the warehouse,
# optionally keep monitoring; the returned Warehouse exposes
# `.query(sql, substitutions)` and owns its monitor handles
# (``wh.stop()``), so concurrent monitors on different warehouses
# are each stoppable. The module-level handle below only backs the
# zero-argument ``stop()`` convenience, tracking the MOST RECENT
# monitor; ``start`` never orphans an earlier one — it keeps its
# handles on that monitor's own Warehouse.
_ACTIVE_WH = None


def start(
    database: str,
    feed: str,
    url: str | None = None,
    warehouse_dir: str = "./couchwarehouse",
    split: str | None = None,
    transform=None,
    doc_transform=None,
    query: dict | None = None,
    reset: bool = False,
    monitor: bool = False,
    verbose: bool = True,
    spark=None,
):
    """Programmatic entry point (reference ``couchwarehouse.start``,
    index.js:181-255): spool ``feed`` (tailing ``url`` over HTTP
    first when given) into the warehouse; with ``monitor=True`` keep
    a streaming query tailing the landing dir — stop it with
    ``wh.stop()`` / :func:`stop`. Returns the
    :class:`~.warehouse.Warehouse`."""
    global _ACTIVE_WH
    from couchwarehouse_spark.warehouse import Warehouse

    spark = spark or get_spark(app_name=f"couchwarehouse_{database}")
    wh = Warehouse(
        spark,
        warehouse_dir,
        database,
        split=split,
        transform=transform,
        doc_transform=doc_transform,
        selector=query,
        reset=reset,
        verbose=verbose,
    )
    last_seq = None
    client = None
    if url is not None:
        from couchwarehouse_spark.sources.http_changes import (
            ChangesHTTPClient,
            spool_to_dir,
        )

        client = ChangesHTTPClient(url, database, selector=query)
        last_seq = spool_to_dir(client, feed)
    if monitor:
        if client is not None:
            # Keep longpolling CouchDB on a daemon thread while the
            # streaming query tails the landing dir (reference
            # monitorChanges, index.js:143-170); wh.stop() ends both.
            import threading

            from couchwarehouse_spark.sources.http_changes import monitor_to_dir

            wh._tailer_stop = threading.Event()
            threading.Thread(
                target=monitor_to_dir,
                args=(client, feed, last_seq, wh._tailer_stop.is_set),
                daemon=True,
            ).start()
        wh.start(feed, monitor=True)
        _ACTIVE_WH = wh
    else:
        wh.spool(feed)
    return wh


def stop(wh=None) -> None:
    """Stop a monitor started by :func:`start` (reference ``stop``,
    index.js:173-179) — the streaming query AND the HTTP tailer
    thread, when one is running. Pass the Warehouse returned by
    ``start`` to stop that specific monitor (equivalent to
    ``wh.stop()``); with no argument, stops the most recently started
    one. No-op when nothing is monitoring."""
    global _ACTIVE_WH
    if wh is None:
        wh, _ACTIVE_WH = _ACTIVE_WH, None
    elif wh is _ACTIVE_WH:
        _ACTIVE_WH = None
    if wh is not None:
        wh.stop()


__all__ = ["get_spark", "start", "stop", "__version__"]
