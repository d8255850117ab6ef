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

__all__ = ["get_spark", "__version__"]
