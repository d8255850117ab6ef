"""Relational query surface (SURVEY.md §2.B) over the testdata tables.

The reference delegates this whole surface to the target database
("your database can be queried using SQL", reference README.md:14,68;
the cross-table LEFT JOIN demo at reference README.md:219-226 is the
headline feature); here it is native Spark SQL / DataFrame. Every
query is declarative — Catalyst does pushdown, pruning, join
selection; aggregates are rounded in BOTH lanes so double summation
order can't flip the oracle's value hash.

Scale stance (100 TB): dimension tables (region/nation/bands) are
explicitly broadcast; fact-fact joins shuffle on their join keys and
rely on AQE for skew; top-k uses TakeOrderedAndProject (no global
sort); window functions partition on high-cardinality keys so state
per partition stays small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from couchwarehouse_spark.catalog import load_table, register_views
from couchwarehouse_spark.plans.registry import query

# Fixed predicate constants shared by the Spark and oracle lanes.
BIG_ORDER_THRESHOLD = 450_000.0


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship TPC-H-Q1-shaped scan→filter→hash-agg→sort.

    The warehouse aggregation surface the reference promises
    (reference README.md:68 "aggregations, joins and much more").
    Scale: single scan, partial+final HashAggregate on 6 grouping
    values — no skew possible; filter and 7-column projection push
    into the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "top_revenue_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total_price,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT top-k (S5/S6; reference README.md:36,53 LIMIT demos).

    Scale: orderBy().limit() compiles to TakeOrderedAndProject — each
    partition keeps a 10-row heap, only 10×partitions rows reach the
    driver-side merge. No global sort at any scale. Tie-broken by the
    unique o_orderkey so the result set is deterministic.
    """
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("total_price"),
            # Dates emitted as formatted strings: raw timestamp columns
            # hash differently across engines' serializations.
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .orderBy(F.col("total_price").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           count(*)                        AS n_rows,
           count(DISTINCT l_suppkey)       AS n_suppliers,
           round(min(l_extendedprice), 2)  AS min_price,
           round(max(l_extendedprice), 2)  AS max_price,
           round(sum(l_quantity), 2)       AS sum_qty,
           round(avg(l_discount), 4)       AS avg_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full aggregate family: COUNT/COUNT DISTINCT/MIN/MAX/SUM/AVG (S7).

    Scale: count(DISTINCT) triggers Spark's two-phase expand+agg; at
    100 TB swap in approx_count_distinct for a single-pass HLL sketch
    (documented alternative, exactness kept here for the oracle).
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        )
    )


@query(
    "distinct_segments",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a two-column projection (S14).

    Scale: dropDuplicates is a hash aggregate on the distinct keys —
    partial dedup map-side, tiny shuffle (|segments| × |nations|).
    """
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_nationkey")
        .dropDuplicates()
    )


@query(
    "nation_revenue",
    oracle="""
    SELECT r_name, n_name,
           count(*)                    AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way equi-join orders⋈customer⋈nation⋈region + agg (S10).

    The reference's README demos exactly this cross-table join shape
    (reference README.md:219-226). Scale: nation (25 rows) and region
    (5 rows) are explicitly broadcast — zero shuffle for the dim side;
    orders⋈customer shuffles on the customer key once, then the
    aggregate reuses that partitioning.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "customer_order_gaps",
    oracle=f"""
    SELECT c_mktsegment, count(*) AS n_customers_without_big_order
    FROM customer
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > {BIG_ORDER_THRESHOLD}) big
      ON c_custkey = big.o_custkey
    WHERE big.o_orderkey IS NULL
    GROUP BY c_mktsegment
    """,
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN + IS NULL predicate (S10 left outer + S4).

    Customers with no order above the threshold — the classic outer-
    join-then-null-probe. Scale: the filtered right side shrinks
    before the join (predicate pushdown), the join shuffles on the
    customer key; Catalyst can rewrite the null-probe to an anti-join.
    """
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > BIG_ORDER_THRESHOLD
    )
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left")
        .filter(F.col("o_orderkey").isNull())
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers_without_big_order"))
    )


@query(
    "big_spenders_semi",
    oracle=f"""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > {BIG_ORDER_THRESHOLD})
    """,
)
def big_spenders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — customers with ≥1 big order (S11).

    Scale: semi-join never duplicates the left side and stops probing
    at first match; Spark builds the (filtered, small) right side as
    a broadcast when it fits.
    """
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > BIG_ORDER_THRESHOLD
    )
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "no_big_order_anti",
    oracle=f"""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > {BIG_ORDER_THRESHOLD})
    GROUP BY c_mktsegment
    """,
)
def no_big_order_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (S11) — also the delete-propagation primitive.

    The reference deletes warehouse rows by id on tombstone changes
    (reference lib/sqlite.js:95-98); in Spark that is exactly this
    anti-join of state vs tombstones (see operators.upsert).
    """
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > BIG_ORDER_THRESHOLD
    )
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "price_band_join",
    oracle="""
    SELECT band, count(*) AS n_parts, round(avg(p_retailprice), 2) AS avg_price
    FROM part
    JOIN (VALUES ('band0', 0.0, 920.0), ('band1', 920.0, 940.0),
                 ('band2', 940.0, 960.0), ('band3', 960.0, 980.0),
                 ('band4', 980.0, 1e18)) AS bands(band, lo, hi)
      ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band
    """,
)
def price_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join of a fact table against interval bounds (S12).

    Scale: the band table is tiny and explicitly broadcast, so the
    non-equi condition runs as BroadcastNestedLoopJoin — each part row
    tests 5 intervals locally, no shuffle. Never theta-join two large
    sides; bucket one side first.
    """
    part = load_table(spark, sf_dir, "part")
    # VALUES relation, not createDataFrame: a Python-built DataFrame
    # scans an ExistingRDD through a Python worker on EVERY execution;
    # the parsed literal is pure JVM (LocalRelation) and free.
    bands = F.broadcast(
        spark.sql(
            """
            SELECT * FROM VALUES
              ('band0', 0.0D, 920.0D), ('band1', 920.0D, 940.0D),
              ('band2', 940.0D, 960.0D), ('band3', 960.0D, 980.0D),
              ('band4', 980.0D, 1e18D)
            AS bands(band, lo, hi)
            """
        )
    )
    return (
        part.join(
            bands,
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
        )
    )


@query(
    "asof_last_view",
    oracle="""
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS last_view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (S12): each purchase matched to the user's most
    recent view at-or-before it.

    Spark lacks a native ASOF JOIN, so this uses the scalable
    union+window formulation: tag both streams, union, then
    last(view_ts, ignorenulls) over (partition by user order by ts,
    tag) — one shuffle on user_id, no per-row range probe. This is
    O(n log n) per user and survives any scale; the naive
    join-then-max is O(n²) per key and does not.
    """
    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(0).alias("tag"), F.lit(None).cast("long").alias("event_id")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("tag"), "event_id"
    )
    merged = views.unionByName(purchases)
    # Views sort before purchases at the same timestamp → ">=" semantics.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "last_view_ts",
        F.last(F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    return carried.filter(F.col("tag") == 1).select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.date_format("last_view_ts", "yyyy-MM-dd HH:mm:ss").alias("last_view_ts"),
    )


@query(
    "set_union_nations",
    oracle="""
    SELECT n_name FROM nation WHERE n_regionkey = 0
    UNION
    SELECT n_name FROM nation WHERE n_regionkey = 1
    """,
)
def set_union_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two filtered scans (S13)."""
    nation = load_table(spark, sf_dir, "nation")
    a = nation.filter(F.col("n_regionkey") == 0).select("n_name")
    b = nation.filter(F.col("n_regionkey") == 1).select("n_name")
    return a.union(b).distinct()


@query(
    "set_intersect_brands",
    oracle="""
    SELECT p_brand FROM part WHERE p_size > 25
    INTERSECT
    SELECT p_brand FROM part WHERE p_retailprice > 905
    """,
)
def set_intersect_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of two derived sets (S13). Thresholds calibrated to
    the testdata (retail prices top out near 920-1000 depending on SF) so the result is
    non-empty at every SF — an empty set would pass trivially."""
    part = load_table(spark, sf_dir, "part")
    a = part.filter(F.col("p_size") > 25).select("p_brand")
    b = part.filter(F.col("p_retailprice") > 905).select("p_brand")
    return a.intersect(b)


@query(
    "set_except_nations",
    oracle="""
    SELECT n_name FROM nation
    EXCEPT
    SELECT n_name FROM nation WHERE n_regionkey = 0
    """,
)
def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — nations outside region 0 (S13)."""
    nation = load_table(spark, sf_dir, "nation")
    a = nation.select("n_name")
    b = nation.filter(F.col("n_regionkey") == 0).select("n_name")
    # subtract == EXCEPT DISTINCT, matching the SQL EXCEPT in the oracle.
    return a.subtract(b)


@query(
    "rollup_priority_status",
    oracle="""
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL')   AS status,
           count(*)                         AS n_orders,
           round(sum(o_totalprice), 2)      AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def rollup_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (S9).

    NULL grouping keys are labelled 'ALL' in both lanes so the value
    hash is stable. Scale: rollup expands each row to (levels+1)
    aggregate streams — still one shuffle, grouping count is tiny.
    """
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "revenue",
        )
    )


@query(
    "cube_flag_status",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*)                      AS n_items,
           round(sum(l_quantity), 2)     AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over all grouping combinations (S9)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "sum_qty",
        )
    )


GROUPING_SETS_SQL = """
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL')   AS status,
           count(*)                         AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""


@query("grouping_sets_orders", oracle=GROUPING_SETS_SQL)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL passthrough lane (S9 + R17).

    The reference exposes raw SQL passthrough as its query API
    (reference lib/sqlite.js:123-134, README.md:306-328); here the
    exact same SQL text runs through spark.sql() and DuckDB.
    """
    register_views(spark, sf_dir)
    return spark.sql(GROUPING_SETS_SQL)


@query(
    "window_top_orders",
    oracle="""
    SELECT *
    FROM (
      SELECT o_custkey,
             o_orderkey,
             round(o_totalprice, 2) AS total_price,
             row_number() OVER w AS rn,
             rank()       OVER w AS rnk,
             round(lag(o_totalprice)  OVER w, 2) AS prev_price,
             round(lead(o_totalprice) OVER w, 2) AS next_price,
             round(sum(o_totalprice)  OVER (PARTITION BY o_custkey
                                            ORDER BY o_totalprice DESC, o_orderkey
                                            ROWS UNBOUNDED PRECEDING), 2) AS running_sum
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    )
    WHERE rn <= 3
    """,
)
def window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + analytic + framed window functions, top-3 per key (S15).

    row_number/rank/lag/lead/running-sum over (customer, price desc)
    with the unique o_orderkey as tie-breaker — window order must be
    total or the result is nondeterministic. Scale: one shuffle on
    o_custkey; each partition's window state is the customer's own
    orders only. This is also the latest-wins upsert shape (R11).
    """
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
            F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
            F.round(F.sum("o_totalprice").over(wf), 2).alias("running_sum"),
        )
        .filter(F.col("rn") <= 3)
    )


CTE_SQL = """
    WITH nation_avg AS (
      SELECT c_nationkey, avg(c_acctbal) AS nation_avg_bal
      FROM customer
      GROUP BY c_nationkey
    )
    SELECT c_nationkey,
           count(*) AS n_above_avg,
           round(avg(c_acctbal - nation_avg_bal), 2) AS avg_excess
    FROM customer
    JOIN nation_avg USING (c_nationkey)
    WHERE c_acctbal > nation_avg_bal
      AND c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    GROUP BY c_nationkey
"""


@query("cte_above_avg_customers", oracle=CTE_SQL)
def cte_above_avg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + scalar subquery through the SQL lane (S16 + R17).

    Same ANSI text in both engines. Catalyst inlines the CTE, turns
    the scalar subquery into a broadcast-joined single-row plan, and
    reuses the customer scan. Scale: the CTE aggregate shuffles once
    on c_nationkey (25 groups) and broadcasts back.
    """
    register_views(spark, sf_dir)
    return spark.sql(CTE_SQL)
