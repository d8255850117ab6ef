"""Skew-safe aggregation entry: events.event_type has FIVE distinct
values — a real skew case (5 hot keys vs 32+ reducers). The salted
two-phase plan computes identical results while spreading each hot
key over n_salts reducers; the oracle is the plain GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from couchwarehouse_spark.catalog import load_table
from couchwarehouse_spark.operators.skew import SALT_COL, salted_aggregate, salted_join
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


@query(
    "salted_skew_join",
    oracle="""
    SELECT e.event_type,
           CAST(count(*) AS BIGINT)            AS n_events,
           round(CAST(sum(CAST(e.value AS DECIMAL(18,6)) * m.weight) AS DOUBLE), 2)
                                               AS weighted_value
    FROM events e
    JOIN (SELECT 'click' AS event_type, CAST(1.0 AS DECIMAL(3,1)) AS weight UNION ALL
          SELECT 'view', 0.1 UNION ALL
          SELECT 'purchase', 10.0 UNION ALL
          SELECT 'signup', 5.0 UNION ALL
          SELECT 'error', 0.0) m
      ON e.event_type = m.event_type
    GROUP BY e.event_type
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew JOIN on a 5-value key (the join-side companion of
    ``salted_skew_aggregate``): events join a tiny per-type weight dim
    on event_type — a textbook hot-key join (5 keys; a plain
    shuffle-hash join puts ~20% of 100 TB on ONE reducer). The salted
    plan replicates the dim n_salts× and joins on (key, salt), so
    each hot key spreads over 16 tasks; results are value-identical
    to the oracle's plain join by construction.

    When the dim is THIS small, broadcast is the first answer (see
    nation_revenue) — salting is for when the big side must shuffle
    anyway (e.g. the join feeds a same-key aggregate, as here) or the
    dim exceeds broadcast but keys are hot. The weighted sum rides
    the salted exchange: phase-1 partials per (key, salt), phase-2
    merges 16 tiny rows per key — no unsalted whole-key shuffle ever
    happens.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    weights = spark.sql(
        """SELECT * FROM VALUES ('click', 1.0), ('view', 0.1),
           ('purchase', 10.0), ('signup', 5.0), ('error', 0.0)
           AS m(event_type, weight)"""
    )
    joined = salted_join(ev, weights, on="event_type", n_salts=16, keep_salt=True)
    partial = joined.groupBy("event_type", SALT_COL).agg(
        F.count("*").alias("_n"),
        # DECIMAL product: exact partial sums in any merge order, so
        # the salted two-phase total is bit-identical to the oracle's
        # single-pass sum (a double sum's last ulp depends on order).
        F.sum(
            F.col("value").cast("decimal(18,6)")
            * F.col("weight").cast("decimal(3,1)")
        ).alias("_wv"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("_n").alias("n_events"),
        F.round(F.sum("_wv").cast("double"), 2).alias("weighted_value"),
    )


def _skew_audit_sql(key: str) -> str:
    return f"""
    SELECT '{key}' AS key_col,
           CAST(count(*) AS BIGINT)   AS n_keys,
           CAST(sum(c) AS BIGINT)     AS n_rows,
           CAST(max(c) AS BIGINT)     AS max_rows,
           round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top1_share,
           round(CAST(sum((2 * rk - n - 1) * c) AS DOUBLE)
                 / (CAST(count(*) AS BIGINT) * sum(c)), 6) AS gini
    FROM (
      SELECT c, row_number() OVER (ORDER BY c, k) AS rk,
             count(*) OVER () AS n
      FROM (SELECT {key} AS k, CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1)
    )
    """


@query(
    "key_skew_audit",
    oracle=" UNION ALL ".join(_skew_audit_sql(k) for k in ("event_type", "user_id")),
)
def key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostics (the MEASURE step before choosing
    the salting/AQE levers the ``salted_*`` entries apply): per
    candidate key column, the per-key row-count distribution — key
    cardinality, max key size, top-1 share, and the Gini coefficient
    of the count distribution (0 = perfectly even reducers, → 1 = one
    hot key owns the shuffle). ``event_type`` (5 hot keys) audits as
    skewed-by-cardinality; ``user_id`` as healthy — the numbers that
    justify ``salted_skew_aggregate``'s plan.

    Scale: each audit is a per-key count (map-side combined, one
    shuffle on the key) followed by stats over the |keys|-row count
    table — the sort behind the Gini rank touches key-cardinality
    rows, never the corpus. Gini is integer-exact: the numerator
    Σ(2·rank − n − 1)·cᵢ over counts sorted ascending is integer
    arithmetic; one division at emit.
    """
    ev = load_table(spark, sf_dir, "events")
    outs = []
    for key in ("event_type", "user_id"):
        counts = (
            ev.groupBy(F.col(key).cast("string").alias("k"))
            .agg(F.count("*").alias("c"))
        )
        from pyspark.sql import Window

        rk = F.row_number().over(Window.orderBy("c", "k"))
        ranked = counts.select("c", rk.alias("rk"), F.count("*").over(
            Window.partitionBy()
        ).alias("n"))
        outs.append(
            ranked.agg(
                F.lit(key).alias("key_col"),
                F.count("*").alias("n_keys"),
                F.sum("c").alias("n_rows"),
                F.max("c").alias("max_rows"),
                F.round(F.max("c").cast("double") / F.sum("c"), 6).alias(
                    "top1_share"
                ),
                F.round(
                    F.sum((2 * F.col("rk") - F.col("n") - 1) * F.col("c")).cast(
                        "double"
                    )
                    / (F.count("*") * F.sum("c")),
                    6,
                ).alias("gini"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


CH_SHARDS_OLD = 8
CH_SHARDS_NEW = 9
_CH_RING_SQL_OLD = "[" + ", ".join(
    f"CAST(('0x' || substr(md5('shard:' || {i}), 1, 8)) AS BIGINT)"
    for i in range(CH_SHARDS_OLD)
) + "]"
_CH_RING_SQL_NEW = "[" + ", ".join(
    f"CAST(('0x' || substr(md5('shard:' || {i}), 1, 8)) AS BIGINT)"
    for i in range(CH_SHARDS_NEW)
) + "]"


@query(
    "consistent_hash_rebalance",
    oracle=f"""
    WITH keys AS (
      SELECT DISTINCT CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
                                           1, 8)) AS BIGINT) AS h
      FROM orders
    ),
    assign AS (
      SELECT h,
             h % {CH_SHARDS_OLD} AS mod_old,
             h % {CH_SHARDS_NEW} AS mod_new,
             coalesce(list_min(list_filter({_CH_RING_SQL_OLD},
                                           p -> p >= h)),
                      list_min({_CH_RING_SQL_OLD})) AS ring_old,
             coalesce(list_min(list_filter({_CH_RING_SQL_NEW},
                                           p -> p >= h)),
                      list_min({_CH_RING_SQL_NEW})) AS ring_new
      FROM keys
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN mod_old <> mod_new THEN 1 ELSE 0 END)
                AS BIGINT) AS moved_mod,
           CAST(sum(CASE WHEN ring_old <> ring_new THEN 1 ELSE 0 END)
                AS BIGINT) AS moved_ring,
           round(CAST(sum(CASE WHEN mod_old <> mod_new THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 4) AS frac_moved_mod,
           round(CAST(sum(CASE WHEN ring_old <> ring_new THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 4) AS frac_moved_ring
    FROM assign
    """,
)
def consistent_hash_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hashing rebalance audit (Karger et al. 1997 — the
    reason shard counts can grow without reshuffling the world):
    assign every distinct customer key to {CH_SHARDS_OLD} shards,
    then to {CH_SHARDS_NEW}, under (a) modulo hashing and (b) a hash
    ring (key goes to the first shard point clockwise-above its
    hash), and count how many keys MOVE. Modulo moves ~n/(n+1) of all
    keys (~89% here); the ring moves only the new shard's arc
    (~1/(n+1) ≈ 11%) — the measured, oracle-checked version of the
    partitioning-stability argument this repo's bucketed layouts rely
    on at resharding time.

    Exactness: md5-derived key hashes and shard ring points are
    identical integers in both lanes; ring assignment is a pure
    integer expression (min point >= h, wrapping to the global min);
    every output is an integer count or one rounded ratio.

    Scale: pure projection over the distinct-key table — the ring is
    a LITERAL array folded into the expression (shard counts are
    never data-sized); one 3-counter aggregate ends the plan.
    """
    o = load_table(spark, sf_dir, "orders")
    keys = o.select(
        F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("h")
    ).distinct()

    def ring_points(n: int):
        import hashlib

        return [
            int(hashlib.md5(f"shard:{i}".encode()).hexdigest()[:8], 16)
            for i in range(n)
        ]

    def ring_assign(h, pts: list[int]):
        arr = F.array(*[F.lit(p) for p in sorted(pts)])
        above = F.filter(arr, lambda p: p >= h)
        return F.coalesce(
            F.array_min(above), F.array_min(arr)
        )

    old_pts, new_pts = ring_points(CH_SHARDS_OLD), ring_points(CH_SHARDS_NEW)
    assign = keys.select(
        (F.col("h") % CH_SHARDS_OLD).alias("mod_old"),
        (F.col("h") % CH_SHARDS_NEW).alias("mod_new"),
        ring_assign(F.col("h"), old_pts).alias("ring_old"),
        ring_assign(F.col("h"), new_pts).alias("ring_new"),
    )
    return assign.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum((F.col("mod_old") != F.col("mod_new")).cast("int"))
        .cast("long")
        .alias("moved_mod"),
        F.sum((F.col("ring_old") != F.col("ring_new")).cast("int"))
        .cast("long")
        .alias("moved_ring"),
        F.round(
            F.sum((F.col("mod_old") != F.col("mod_new")).cast("int")).cast(
                "double"
            )
            / F.count("*"),
            4,
        ).alias("frac_moved_mod"),
        F.round(
            F.sum((F.col("ring_old") != F.col("ring_new")).cast("int")).cast(
                "double"
            )
            / F.count("*"),
            4,
        ).alias("frac_moved_ring"),
    )
