"""couchwarehouse_spark — a PySpark-native analytics engine with the
capabilities of glynnbird/couchwarehouse (reference: /root/reference).

The reference is a CouchDB→SQL-warehouse ETL (spool + monitor the
`_changes` feed into SQLite/PostgreSQL/MySQL/Elasticsearch) whose query
surface is the target database's SQL. Here Spark is both the ETL
runtime (DataFrame / Structured Streaming) and the warehouse
(Spark SQL / Catalyst), so the query surface is implemented natively.

Layout:
  session     — SparkSession builder tuned for local[N] and cluster use
  catalog     — testdata table loading / view registration
  operators/  — document-model kernel (flatten, schema, conform, mango,
                upsert) and scale extensions (dedup, similarity, text)
  sources/    — changes-feed reader, warehouse API, external sinks
  plans/      — the query surface (queries + DuckDB oracle SQL)
  streaming/  — structured-streaming ingest & event-time windows
"""

from couchwarehouse_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
