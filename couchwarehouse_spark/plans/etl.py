"""Oracle-backed query entries exercising the document-ETL kernel
(SURVEY.md §2.A) against the driver's testdata tables.

Each entry routes through the REAL operator implementation
(operators.document / operators.upsert / functions.mango), not a
reimplementation — so a green hash here certifies the same code the
Warehouse pipeline runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from couchwarehouse_spark.catalog import load_table
from couchwarehouse_spark.functions.mango import compile_selector
from couchwarehouse_spark.operators.document import (
    conform_frame,
    flatten_frame,
    seq_number_col,
)
from couchwarehouse_spark.operators.upsert import apply_deletes, latest_wins
from couchwarehouse_spark.plans.registry import query


@query(
    "latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, event_type, round(value, 2) AS value,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts
    FROM (
      SELECT user_id, event_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins upsert semantics (R11; reference lib/sqlite.js:82
    ``REPLACE INTO``) as a query: each user's highest-seq event wins.

    Runs the actual ``operators.upsert.latest_wins`` window dedup —
    the exact merge the Warehouse applies per changes batch. Scale:
    one shuffle on the (high-cardinality) key, no skew, state per
    window partition = one user's events.
    """
    ev = load_table(spark, sf_dir, "events")
    latest = latest_wins(ev, key="user_id", seq="event_id")
    return latest.select(
        "user_id",
        "event_id",
        "event_type",
        F.round("value", 2).alias("value"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
    )


@query(
    "delete_propagation",
    oracle="""
    WITH latest AS (
      SELECT * FROM (
        SELECT user_id, event_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT user_id, event_id, event_type
    FROM latest
    WHERE user_id NOT IN (SELECT user_id FROM latest WHERE event_type = 'error')
    """,
)
def delete_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone delete propagation (R12; reference lib/sqlite.js:95-98)
    as a query: treat users whose LATEST event is an error as
    tombstoned and anti-join them out of the state — the literal
    ``operators.upsert.apply_deletes`` broadcast anti-join.
    """
    ev = load_table(spark, sf_dir, "events")
    latest = latest_wins(ev, key="user_id", seq="event_id").select(
        "user_id", "event_id", "event_type"
    )
    tombstones = latest.filter(F.col("event_type") == "error").select("user_id")
    return apply_deletes(latest, tombstones, key="user_id")


@query(
    "flatten_props",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def flatten_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flatten (R6) on real nested data: parse the events' JSON props
    into a struct, flatten it to a ``props_k`` wide column via the
    actual ``operators.document.flatten_frame`` projection, aggregate.

    Scale: ``from_json`` + struct-field access is all JVM-side
    expression work inside whole-stage codegen — no Python, no extra
    pass.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.from_json("props", "k DOUBLE").alias("props")
    )
    flat = flatten_frame(ev)  # → event_type, props_k
    return flat.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.avg("props_k"), 4).alias("avg_k"),
    )


@query(
    "conform_projection",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           count(CAST(NULL AS VARCHAR)) AS n_missing,
           round(avg(n_chars), 2) AS avg_chars
    FROM documents
    GROUP BY lang
    """,
)
def conform_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen-schema conformance (R13; reference lib/sqlite.js:87-92):
    project documents onto a frozen schema that drops ``source``/
    ``doc_id`` (extra → dropped) and adds ``missing_field``
    (absent → typed NULL), via the actual ``conform_frame``.
    """
    docs = load_table(spark, sf_dir, "documents")
    frozen = {
        "lang": "string",
        "n_chars": "number",
        "missing_field": "string",
    }
    conformed = conform_frame(docs, frozen)
    return conformed.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.count("missing_field").alias("n_missing"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )


@query(
    "seq_extraction",
    oracle="""
    SELECT count(*) AS n,
           CAST(sum(CAST(regexp_replace(concat(CAST(event_id AS VARCHAR), '-9f8a2c'), '-.*$', '') AS BIGINT)) AS BIGINT) AS seq_sum,
           max(CAST(regexp_replace(concat(CAST(event_id AS VARCHAR), '-9f8a2c'), '-.*$', '') AS BIGINT)) AS seq_max
    FROM events
    WHERE event_type = 'click'
    """,
)
def seq_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-token numeric extraction (R15; reference index.js:30-32
    ``'47-1abc2' → 47``) via the actual ``seq_number_col`` expression,
    applied to synthesised CouchDB-style seq tokens.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    tok = F.concat(F.col("event_id").cast("string"), F.lit("-9f8a2c"))
    seq = seq_number_col(tok)
    return ev.agg(
        F.count("*").alias("n"),
        F.sum(seq).alias("seq_sum"),
        F.max(seq).alias("seq_max"),
    )


MANGO_SELECTOR = {
    "$or": [
        {"event_type": {"$in": ["view", "click"]}, "value": {"$gte": 150.0}},
        {"event_type": "signup"},
    ]
}


@query(
    "mango_selector_filter",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events
    WHERE (event_type IN ('view', 'click') AND value >= 150.0)
       OR event_type = 'signup'
    GROUP BY event_type
    """,
)
def mango_selector_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mango selector → Catalyst predicate (R4; reference
    index.js:101-104 forwards the selector for server-side filtering —
    here the compiled predicate pushes into the parquet scan).

    Exercises ``$or``, ``$in``, ``$gte`` and implicit AND/EQ through
    the actual ``functions.mango.compile_selector``.
    """
    ev = load_table(spark, sf_dir, "events")
    pred = compile_selector(MANGO_SELECTOR)
    return (
        ev.filter(pred)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@query(
    "snapshot_cdc",
    oracle="""
    WITH thr AS (SELECT max(event_id) // 2 AS t FROM events),
    old_state AS (
      SELECT user_id, event_id FROM (
        SELECT user_id, event_id,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events, thr WHERE event_id <= thr.t
      ) WHERE rn = 1
    ),
    new_all AS (
      SELECT user_id, event_id, event_type FROM (
        SELECT user_id, event_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ),
    new_state AS (
      SELECT user_id, event_id FROM new_all
      WHERE user_id NOT IN (SELECT user_id FROM new_all WHERE event_type = 'error')
    )
    SELECT * FROM (
      SELECT coalesce(o.user_id, n.user_id) AS user_id,
             CASE WHEN o.user_id IS NULL THEN 'insert'
                  WHEN n.user_id IS NULL THEN 'delete'
                  WHEN o.event_id != n.event_id THEN 'update' END AS change_type,
             o.event_id AS old_seq, n.event_id AS new_seq
      FROM old_state o FULL OUTER JOIN new_state n ON o.user_id = n.user_id
    ) WHERE change_type IS NOT NULL
    """,
)
def snapshot_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two warehouse states via the real
    ``operators.upsert.snapshot_diff`` (ETL-kernel companion — the
    change feed the reference's ES/JDBC sinks would apply to follow
    the warehouse, reference lib/elasticsearch.js:16-44 upsert/delete
    per change).

    The "old" state is the latest-wins merge over the first half of
    the feed (event_id ≤ max/2); the "new" state is the full merge
    with error-tombstoned users deleted — so all three change classes
    (insert / update / delete) appear and are hash-checked.

    Scale: the halfway threshold is a broadcast one-row aggregate
    (no driver round-trip); the diff itself is one full-outer join on
    the key comparing seq stamps only — O(1) per key regardless of
    row width, and only changed keys survive.
    """
    from couchwarehouse_spark.operators.upsert import snapshot_diff

    ev = load_table(spark, sf_dir, "events")
    thr = ev.agg(F.expr("max(event_id) DIV 2").alias("_thr"))
    old_half = ev.join(F.broadcast(thr), F.col("event_id") <= F.col("_thr")).drop(
        "_thr"
    )
    old_state = latest_wins(old_half, key="user_id", seq="event_id")
    new_all = latest_wins(ev, key="user_id", seq="event_id")
    tombs = new_all.filter(F.col("event_type") == "error").select("user_id")
    new_state = apply_deletes(new_all, tombs, key="user_id")
    return snapshot_diff(old_state, new_state, key="user_id", seq="event_id")


@query(
    "incremental_agg_maintenance",
    oracle="""
    WITH thr AS (SELECT max(event_id) // 2 AS t FROM events),
    new_all AS (
      SELECT user_id, event_id, event_type FROM (
        SELECT user_id, event_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ),
    new_state AS (
      SELECT user_id, event_type FROM new_all
      WHERE user_id NOT IN (SELECT user_id FROM new_all WHERE event_type = 'error')
    )
    SELECT event_type, count(*) AS n_users
    FROM new_state
    GROUP BY event_type
    """,
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance over the upsert
    stream: a per-event_type user count of the warehouse state is kept
    current by applying ONLY the CDC delta (insert→+1 at the new type,
    delete→-1 at the old type, update→-1 old / +1 new), never
    recomputing from the full state. The oracle recomputes the view
    directly from the final state — a green hash certifies delta
    maintenance ≡ full recompute, the invariant an incremental sink
    (the reference's ES/JDBC followers, lib/elasticsearch.js:16-44)
    relies on.

    Scale: the delta path touches old_agg (|distinct types| rows) +
    the changed keys only — for a 100 TB state with a 0.1% daily
    churn that is a 1000× smaller input than recompute. The changed-
    key joins are keyed on user_id against the two states, and the
    final merge is a union of tiny per-type deltas.
    """
    from couchwarehouse_spark.operators.upsert import snapshot_diff

    ev = load_table(spark, sf_dir, "events")
    thr = ev.agg(F.expr("max(event_id) DIV 2").alias("_thr"))
    old_half = ev.join(F.broadcast(thr), F.col("event_id") <= F.col("_thr")).drop(
        "_thr"
    )
    old_state = latest_wins(old_half, key="user_id", seq="event_id")
    new_all = latest_wins(ev, key="user_id", seq="event_id")
    tombs = new_all.filter(F.col("event_type") == "error").select("user_id")
    new_state = apply_deletes(new_all, tombs, key="user_id")

    # The maintained view's base: aggregate of the OLD state.
    base = old_state.groupBy("event_type").agg(
        F.count("*").cast("long").alias("delta")
    )

    # CDC delta → per-type +1/-1 contributions. Changed keys join back
    # to the states to learn each key's old/new group.
    diff = snapshot_diff(old_state, new_state, key="user_id", seq="event_id")
    minus = (
        diff.filter(F.col("change_type").isin("delete", "update"))
        .join(old_state.select("user_id", "event_type"), "user_id")
        .groupBy("event_type")
        .agg((-F.count("*")).cast("long").alias("delta"))
    )
    plus = (
        diff.filter(F.col("change_type").isin("insert", "update"))
        .join(new_state.select("user_id", "event_type"), "user_id")
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("delta"))
    )

    merged = (
        base.unionByName(minus)
        .unionByName(plus)
        .groupBy("event_type")
        .agg(F.sum("delta").cast("long").alias("n_users"))
        .filter(F.col("n_users") > 0)
    )
    return merged
