"""Additional relational surface: recursive CTE, RANGE window frames,
full-text relevance search (S15/S16/S19 completions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from couchwarehouse_spark.catalog import load_table, register_views
from couchwarehouse_spark.plans.registry import query, scoped_persist
from couchwarehouse_spark.sinks.elasticsearch import full_text_search

# Same ANSI text runs in spark.sql AND DuckDB — the R17 passthrough
# seam exercised with the hardest SQL feature both engines share.
RECURSIVE_SPINE_SQL = """
    WITH RECURSIVE months(m) AS (
      SELECT DATE '1992-01-01'
      UNION ALL
      SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
      WHERE m < DATE '1998-12-01'
    ),
    revenue AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
             round(sum(o_totalprice), 2) AS monthly_revenue,
             count(*) AS n_orders
      FROM orders
      GROUP BY 1
    )
    SELECT strftime(months.m, '%Y-%m') AS month,
           coalesce(monthly_revenue, 0.0) AS monthly_revenue,
           coalesce(n_orders, 0) AS n_orders
    FROM months LEFT JOIN revenue ON months.m = revenue.m
"""

# Spark uses date_format, DuckDB strftime — one token differs, the
# rest of the text is shared verbatim.
_SPARK_SPINE_SQL = RECURSIVE_SPINE_SQL.replace(
    "strftime(months.m, '%Y-%m')", "date_format(months.m, 'yyyy-MM')"
)


@query("recursive_cte_month_spine", oracle=RECURSIVE_SPINE_SQL)
def recursive_cte_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE calendar spine + gap-filling LEFT JOIN (S16).

    The classic warehouse report shape: a generated month axis joined
    to actual revenue so empty months surface as zeros. Exercises
    Spark 4's WITH RECURSIVE through the SQL passthrough lane (R17);
    DuckDB runs the same text. Scale: the spine is 84 rows — broadcast;
    the aggregate is one shuffle on month.
    """
    register_views(spark, sf_dir)
    return spark.sql(_SPARK_SPINE_SQL)


@query(
    "range_frame_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW), 2) AS revenue_90d
    FROM orders
    WHERE o_custkey < 50
    """,
)
def range_frame_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (S15): per customer, the rolling 90-day
    revenue ending at each order — a VALUE-based frame (all orders
    within 90 days = 7,776,000 s), not a row-count frame; ties in the
    ordering column are handled identically by definition.

    Scale: one shuffle on o_custkey; frame evaluation is a sliding
    pointer over each partition's sorted orders.
    """
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-90 * 86400, Window.currentRow)
    )
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("revenue_90d"),
        )
    )


FT_QUERY = "data table"


@query(
    "full_text_relevance",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             (length(lower(text)) - length(replace(lower(text), 'data', ''))) / 4.0
           + (length(lower(text)) - length(replace(lower(text), 'table', ''))) / 5.0
               AS _score
      FROM documents
    )
    SELECT doc_id, lang, round(_score, 2) AS score
    FROM scored
    WHERE _score > 0
    ORDER BY _score DESC, doc_id
    LIMIT 15
    """,
)
def full_text_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-text search fallback (S19): the reference delegates search
    to Elasticsearch (reference README.md:147-148 ``?q=name:"York"``);
    natively it's term matching + tf relevance ranking — the actual
    ``sinks.elasticsearch.full_text_search`` operator, top-15 with a
    deterministic tiebreak.
    """
    d = load_table(spark, sf_dir, "documents")
    hits = full_text_search(d, "text", FT_QUERY)
    return (
        hits.orderBy(F.col("_score").desc(), "doc_id")
        .limit(15)
        .select("doc_id", "lang", F.round("_score", 2).alias("score"))
    )


@query(
    "order_cohort_full_outer",
    oracle="""
    WITH y95 AS (SELECT o_custkey, count(*) AS n_1995 FROM orders
                 WHERE year(o_orderdate) = 1995 GROUP BY o_custkey),
         y96 AS (SELECT o_custkey, count(*) AS n_1996 FROM orders
                 WHERE year(o_orderdate) = 1996 GROUP BY o_custkey)
    SELECT CASE WHEN n_1995 IS NOT NULL AND n_1996 IS NOT NULL THEN 'both'
                WHEN n_1995 IS NOT NULL THEN 'only_1995'
                ELSE 'only_1996' END        AS cohort,
           count(*)                         AS n_customers,
           CAST(coalesce(sum(n_1995), 0) AS BIGINT) AS orders_1995,
           CAST(coalesce(sum(n_1996), 0) AS BIGINT) AS orders_1996
    FROM y95 FULL OUTER JOIN y96 USING (o_custkey)
    GROUP BY 1
    """,
)
def order_cohort_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (S10 completeness): customer retention cohorts —
    who ordered in 1995, 1996, or both. The outer join is the only
    join flavor that keeps unmatched rows from BOTH sides, which is
    exactly what a year-over-year reconciliation needs.

    Scale: both inputs are pre-aggregated to one row per customer
    BEFORE the join (partial aggregation upstream of the shuffle), so
    the full-outer join is key-to-key on already-reduced sides — never
    outer-join raw fact tables when an aggregate precedes the compare.
    """
    orders = load_table(spark, sf_dir, "orders")
    y95 = (
        orders.filter(F.year("o_orderdate") == 1995)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_1995"))
    )
    y96 = (
        orders.filter(F.year("o_orderdate") == 1996)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_1996"))
    )
    joined = y95.join(y96, "o_custkey", "full_outer")
    cohort = (
        F.when(F.col("n_1995").isNotNull() & F.col("n_1996").isNotNull(), "both")
        .when(F.col("n_1995").isNotNull(), "only_1995")
        .otherwise("only_1996")
    )
    return joined.groupBy(cohort.alias("cohort")).agg(
        F.count("*").alias("n_customers"),
        F.coalesce(F.sum("n_1995"), F.lit(0)).alias("orders_1995"),
        F.coalesce(F.sum("n_1996"), F.lit(0)).alias("orders_1996"),
    )


@query(
    "balance_distribution_ranks",
    oracle="""
    SELECT n_name, s_name, s_acctbal,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WINDOW w AS (PARTITION BY n_name ORDER BY s_acctbal, s_suppkey)
    """,
)
def balance_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank analytics (S15 completion): percent_rank and
    cume_dist of each supplier's account balance within its nation.

    Both ranks are single divisions of exact integer rank/row counts
    ((rank−1)/(n−1), rows≤x/n), so the doubles agree bit-for-bit
    across engines; the tie-break on s_suppkey pins the row order.
    Scale: partitioned by nation — 25 independent window partitions,
    each sorted locally after the hash exchange; no global sort.
    """
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy("s_acctbal", "s_suppkey")
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            "s_name",
            "s_acctbal",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
    )


@query(
    "priority_multiset_diff",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS surplus
    FROM (
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
      EXCEPT ALL
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    )
    GROUP BY o_orderpriority
    """,
)
def priority_multiset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (S13 multiset completion): per-priority surplus of
    open orders over fulfilled ones — bag difference keeps
    max(0, n_open − n_fulfilled) copies per value, unlike EXCEPT
    which collapses to distinct membership.

    Spark's exceptAll plan is a partial-aggregated count-difference
    generate (no row-by-row anti join), so both sides reduce to
    ~5 priority counts before the exchange — exactly how a bag
    difference should execute over billions of rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    open_p = orders.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    done_p = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return open_p.exceptAll(done_p).groupBy("o_orderpriority").count().select(
        "o_orderpriority", F.col("count").alias("surplus")
    )


@query(
    "unpivot_order_metrics",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority,
             CAST(count(*) AS DOUBLE)          AS n_orders,
             round(sum(o_totalprice), 2)       AS total_price,
             round(avg(o_totalprice), 2)       AS avg_price
      FROM orders
      GROUP BY o_orderpriority
    )
    UNPIVOT m ON n_orders, total_price, avg_price
    INTO NAME metric VALUE value
    """,
)
def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (S-surface completion, the inverse of
    ``pivot_status_by_priority``): wide per-priority metrics stacked
    to (priority, metric, value) rows — the reshape reporting layers
    ask of a warehouse.

    Scale: unpivot is a pure projection (``expand``: one input row →
    |metrics| output rows, no shuffle); the only exchange is the
    upstream priority aggregate.
    """
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy("o_orderpriority").agg(
        F.count("*").cast("double").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )
    return m.unpivot(
        ["o_orderpriority"],
        ["n_orders", "total_price", "avg_price"],
        "metric",
        "value",
    )


# Same ANSI text runs in spark.sql AND DuckDB (the R17 passthrough
# seam): a correlated EXISTS + a correlated scalar subquery — the
# decorrelation workout.
CORRELATED_EXISTS_SQL = """
    SELECT c_mktsegment,
           count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS total_balance
    FROM customer c
    WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
              AND o.o_totalprice > (
                    SELECT avg(o2.o_totalprice) FROM orders o2
                    WHERE o2.o_custkey = o.o_custkey
              )
          )
    GROUP BY c_mktsegment
"""


@query("correlated_exists_orders", oracle=CORRELATED_EXISTS_SQL)
def correlated_exists_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with a nested correlated scalar subquery
    (S16 depth): customers holding an urgent order priced above their
    OWN average order value — identical ANSI text in both engines.

    Scale: Catalyst decorrelates both subqueries into aggregates +
    joins on o_custkey (no per-row re-execution — the naive nested-
    loop reading of this SQL); the per-customer average is a hash
    aggregate feeding a join, same shuffle key throughout.
    """
    register_views(spark, sf_dir)
    return spark.sql(CORRELATED_EXISTS_SQL)


# Same ANSI text in both engines: top-2 orders PER customer via a
# correlated LATERAL subquery with ORDER BY + LIMIT.
LATERAL_TOPN_SQL = """
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    WHERE c.c_custkey <= 100
"""


@query("lateral_topn_per_customer", oracle=LATERAL_TOPN_SQL)
def lateral_topn_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with LIMIT (S16 depth): each
    customer's two most expensive orders — the top-N-per-group idiom
    written as a lateral join instead of a window.

    Scale: Catalyst decorrelates the per-row subquery into a
    ``WindowGroupLimit`` — a PARTIAL group-limit runs before the
    o_custkey exchange (each map task keeps ≤2 rows per key), then the
    final limit after; no per-customer re-execution and no full
    per-group sort crosses the wire. Deterministic by the (price,
    orderkey) tiebreak.
    """
    register_views(spark, sf_dir)
    return spark.sql(LATERAL_TOPN_SQL)


BM25_K1 = 1.2
BM25_B = 0.75

# Robertson idf as used by Lucene: ln(1 + (N - df + 0.5)/(df + 0.5)).
# Both lanes build avgdl from EXACT integer sums (one division), and
# tf/df/dl/N are all integers — the only float work is the final
# per-term expression, written identically in both dialects.
_BM25_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS dl,
             len(list_filter(string_split(text, ' '), x -> x = 'data'))  AS tf1,
             len(list_filter(string_split(text, ' '), x -> x = 'table')) AS tf2
      FROM documents
    ),
    g AS (
      SELECT count(*) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS sum_dl,
             count(*) FILTER (tf1 > 0) AS df1,
             count(*) FILTER (tf2 > 0) AS df2
      FROM t
    ),
    scored AS (
      SELECT doc_id, lang,
             ln(1 + (n_docs - df1 + 0.5) / (df1 + 0.5))
               * (tf1 * ({BM25_K1} + 1))
               / (tf1 + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl * n_docs / CAST(sum_dl AS DOUBLE)))
           + ln(1 + (n_docs - df2 + 0.5) / (df2 + 0.5))
               * (tf2 * ({BM25_K1} + 1))
               / (tf2 + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl * n_docs / CAST(sum_dl AS DOUBLE)))
               AS _score,
             tf1 + tf2 AS _hits
      FROM t, g
    )
    SELECT doc_id, lang, round(_score, 4) AS score
    FROM scored WHERE _hits > 0
    ORDER BY _score DESC, doc_id
    LIMIT 15
"""


@query("bm25_relevance", oracle=_BM25_ORACLE)
def bm25_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking for the full-text lane (S19 upgrade over the tf
    scorer in ``full_text_relevance``): Robertson idf with tf
    saturation (k1) and length normalization (b) — what Elasticsearch
    actually scores with (its default similarity), so this is the
    native equivalent of the reference's delegated search
    (reference README.md:147-148).

    Determinism: tf/df/dl/N are integers; avgdl enters as the exact
    integer sum_dl with ONE division; the float scoring expression is
    written identically in both lanes and rounded to 4 decimals.

    Scale: per-doc tf/dl is a pure projection over the scan; the
    corpus statistics (N, sum_dl, df per term) are a ONE-ROW aggregate
    broadcast back via crossJoin — two passes total, no shuffle wider
    than one row, top-15 via TakeOrderedAndProject heaps.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    t = d.select(
        "doc_id",
        "lang",
        F.size(toks).alias("dl"),
        F.size(F.filter(toks, lambda x: x == "data")).alias("tf1"),
        F.size(F.filter(toks, lambda x: x == "table")).alias("tf2"),
    )
    g = t.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
        F.count_if(F.col("tf1") > 0).alias("df1"),
        F.count_if(F.col("tf2") > 0).alias("df2"),
    )

    def bm25_term(tf: str, df: str):
        idf = F.log(
            1 + (F.col("n_docs") - F.col(df) + 0.5) / (F.col(df) + 0.5)
        )
        norm = F.col(tf) + BM25_K1 * (
            1
            - BM25_B
            + BM25_B
            * F.col("dl")
            * F.col("n_docs")
            / F.col("sum_dl").cast("double")
        )
        return idf * (F.col(tf) * (BM25_K1 + 1)) / norm

    scored = t.crossJoin(F.broadcast(g)).select(
        "doc_id",
        "lang",
        (bm25_term("tf1", "df1") + bm25_term("tf2", "df2")).alias("_score"),
        (F.col("tf1") + F.col("tf2")).alias("_hits"),
    )
    return (
        scored.filter(F.col("_hits") > 0)
        .orderBy(F.col("_score").desc(), "doc_id")
        .limit(15)
        .select("doc_id", "lang", F.round("_score", 4).alias("score"))
    )


ZBITS = 8  # 8 bits per dimension -> 16-bit z-values, 64 prefix cells

# Bit-interleave (Morton/Z-order) of two quantized dimensions,
# written once per dialect over integer ops only.
_Z_SQL = " | ".join(
    f"(((bx >> {i}) & 1) << {2 * i + 1}) | (((by >> {i}) & 1) << {2 * i})"
    for i in range(ZBITS)
)


@query(
    "zorder_layout_cells",
    oracle=f"""
    WITH mx AS (
      SELECT max(o_orderkey) // {2**ZBITS} + 1 AS sx,
             max(o_custkey)  // {2**ZBITS} + 1 AS sy
      FROM orders
    ),
    q AS (
      SELECT o_orderkey // sx AS bx, o_custkey // sy AS by
      FROM orders, mx
    ),
    z AS (SELECT bx, by, {_Z_SQL} AS zval FROM q)
    SELECT zval >> {2 * ZBITS - 6} AS zprefix,
           count(*) AS n_rows,
           count(DISTINCT bx) AS n_bx,
           count(DISTINCT by) AS n_by,
           min(zval) AS min_z,
           max(zval) AS max_z
    FROM z
    GROUP BY 1
    """,
)
def zorder_layout_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout audit — the multi-dimensional data
    clustering a lakehouse writer applies so range predicates on
    EITHER dimension prune files (Delta OPTIMIZE ZORDER BY /
    Iceberg sort orders; public Morton-code technique). Quantize
    (o_orderkey, o_custkey) to 8-bit cells, interleave the bits, and
    census the 64 z-prefix cells: each prefix pins the top THREE bits
    of BOTH dimensions, confining every cell to a 32-slab of each
    (n_bx, n_by ≤ 32 by construction, while a naive concatenated sort
    would leave the second dimension unbounded at 256) — the locality
    property that makes the layout prune on either predicate.

    To materialize the layout, ``repartitionByRange(zval)`` + write;
    this entry certifies the z-value arithmetic and the locality
    census under the oracle (everything integer — quantization steps
    are exact ceil-divisions broadcast from a one-row aggregate).

    Scale: quantization + interleave is a pure projection; the census
    is one hash aggregate on 64 cells with two small exact distincts.
    """
    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(
        F.expr(f"max(o_orderkey) DIV {2**ZBITS} + 1").alias("sx"),
        F.expr(f"max(o_custkey) DIV {2**ZBITS} + 1").alias("sy"),
    )
    q = o.crossJoin(F.broadcast(mx)).select(
        F.expr("o_orderkey DIV sx").alias("bx"),
        F.expr("o_custkey DIV sy").alias("by"),
    )
    zval = F.lit(0).cast("long")
    for i in range(ZBITS):
        zval = zval.bitwiseOR(
            F.shiftleft(F.shiftright(F.col("bx"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(F.col("by"), i).bitwiseAND(F.lit(1)), 2 * i)
        )
    z = q.select("bx", "by", zval.alias("zval"))
    return z.groupBy(
        F.shiftright("zval", 2 * ZBITS - 6).alias("zprefix")
    ).agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("bx").alias("n_bx"),
        F.countDistinct("by").alias("n_by"),
        F.min("zval").alias("min_z"),
        F.max("zval").alias("max_z"),
    )


SKY_CELLS = 256  # price-grid cells for the distributed skyline prune


@query(
    "skyline_cheap_early_orders",
    oracle="""
    WITH g AS (
      SELECT o_totalprice AS p, min(o_orderdate) AS d
      FROM orders GROUP BY o_totalprice
    ),
    pr AS (
      SELECT p, d,
             min(d) OVER (ORDER BY p
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pm
      FROM g
    )
    SELECT o.o_orderkey,
           o.o_totalprice,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate
    FROM orders o
    JOIN pr ON pr.p = o.o_totalprice
    WHERE o.o_orderdate = pr.d AND (pr.pm IS NULL OR pr.d < pr.pm)
    ORDER BY o.o_totalprice, o.o_orderkey
    """,
)
def skyline_cheap_early_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) — the classic SKYLINE OF
    operator (Börzsönyi et al. 2001): orders not dominated on
    (cheaper, earlier). The ORACLE derives the frontier with the
    exact O(n log n) sort/prefix-min identity (a row survives iff it
    holds its price group's min date AND that min strictly precedes
    every cheaper group's min — the naive NOT-EXISTS pair semantics
    is asserted against it on planted fixtures in
    tests/test_round6b_ops.py); the engine implements the
    DISTRIBUTED plan: a price-grid prune first — per price cell,
    the minimum date; a row survives the prune only if its date
    precedes every strictly-cheaper CELL's minimum (a ≤SKY_CELLS-row
    broadcast) — then the exact dominance test runs as a broadcast
    anti-join over the SURVIVORS only. The prune is lossless
    (any row it removes is dominated by the prior cell's minimum
    row, which has strictly smaller price and ≤ date) and collapses
    the candidate set to ~O(cells + skyline): the O(n²) pair test
    never touches the corpus. Same two-phase local-prune/global-
    verify shape published for parallel skylines.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    bounds = o.agg(
        F.min("o_totalprice").alias("mn"),
        F.expr(f"(max(o_totalprice) - min(o_totalprice)) / {SKY_CELLS}").alias("st"),
    )
    cell = F.when(F.col("st") <= 0, F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("o_totalprice") - F.col("mn")) / F.col("st")),
            F.lit(SKY_CELLS - 1),
        )
    ).cast("int")
    with_cell = o.crossJoin(F.broadcast(bounds)).withColumn("cell", cell)
    cell_min = (
        with_cell.groupBy("cell").agg(F.min("o_orderdate").alias("cd"))
    )
    w = Window.orderBy("cell").rowsBetween(Window.unboundedPreceding, -1)
    prior = cell_min.select(
        "cell", F.min("cd").over(w).alias("prior_min_date")
    )
    cand = (
        with_cell.join(F.broadcast(prior), "cell")
        .filter(
            F.col("prior_min_date").isNull()
            | (F.col("o_orderdate") < F.col("prior_min_date"))
        )
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )
    from couchwarehouse_spark.plans.registry import scoped_persist

    cand = scoped_persist(cand)
    b = cand.select(
        F.col("o_totalprice").alias("bp"), F.col("o_orderdate").alias("bd")
    )
    dominated = (
        (F.col("bp") <= F.col("o_totalprice"))
        & (F.col("bd") <= F.col("o_orderdate"))
        & (
            (F.col("bp") < F.col("o_totalprice"))
            | (F.col("bd") < F.col("o_orderdate"))
        )
    )
    return (
        cand.join(F.broadcast(b), dominated, "left_anti")
        .select(
            "o_orderkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .orderBy("o_totalprice", "o_orderkey")
    )


KS_SRC_A, KS_SRC_B = "src0", "src1"


@query(
    "ks_drift_doclen",
    oracle=f"""
    WITH a AS (
      SELECT n_chars AS v, count(*) AS c FROM documents
      WHERE source = '{KS_SRC_A}' GROUP BY n_chars
    ),
    b AS (
      SELECT n_chars AS v, count(*) AS c FROM documents
      WHERE source = '{KS_SRC_B}' GROUP BY n_chars
    ),
    merged AS (
      SELECT coalesce(a.v, b.v) AS v,
             coalesce(a.c, 0) AS ca, coalesce(b.c, 0) AS cb
      FROM a FULL OUTER JOIN b ON a.v = b.v
    ),
    cum AS (
      SELECT v,
             sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_a,
             sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_b,
             sum(ca) OVER () AS ta, sum(cb) OVER () AS tb
      FROM merged
    )
    SELECT CAST(max(abs(cum_a * tb - cum_b * ta)) AS BIGINT) AS ks_numerator,
           CAST(min(ta * tb) AS BIGINT)                      AS ks_denominator,
           round(max(abs(cum_a * tb - cum_b * ta))
                 / CAST(min(ta * tb) AS DOUBLE), 6)          AS ks_statistic
    FROM cum
    """,
)
def ks_drift_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between two
    sources' document-length distributions (the distribution-shift
    monitor a data pipeline runs between crawl snapshots or mixture
    revisions — TVD's order-aware cousin: KS sees a LOCATION shift
    that identical histograms-of-buckets would hide). INTEGER-EXACT:
    D = max|ECDF_a - ECDF_b| is computed as max|cum_a·T_b - cum_b·T_a|
    over the merged support, divided by T_a·T_b only in the final
    rounded display column.

    Scale: per-source length histograms collapse via hash aggregate
    (support-sized, not corpus-sized); the ECDF cumsum window runs
    over the merged SUPPORT (distinct lengths — bounded by the value
    domain, not the row count), which is the standard place a
    single-partition window is acceptable; one row out.
    """
    d = load_table(spark, sf_dir, "documents")
    a = (
        d.filter(F.col("source") == KS_SRC_A)
        .groupBy(F.col("n_chars").alias("v"))
        .agg(F.count("*").alias("ca"))
    )
    b = (
        d.filter(F.col("source") == KS_SRC_B)
        .groupBy(F.col("n_chars").alias("v"))
        .agg(F.count("*").alias("cb"))
    )
    merged = (
        a.join(b, "v", "full_outer")
        .select(
            "v",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = merged.select(
        F.sum("ca").over(wc).alias("cum_a"),
        F.sum("cb").over(wc).alias("cum_b"),
        F.sum("ca").over(wt).alias("ta"),
        F.sum("cb").over(wt).alias("tb"),
    )
    diff = F.abs(F.col("cum_a") * F.col("tb") - F.col("cum_b") * F.col("ta"))
    return cum.agg(
        F.max(diff).alias("ks_numerator"),
        F.min(F.col("ta") * F.col("tb")).alias("ks_denominator"),
        F.round(
            F.max(diff) / F.min(F.col("ta") * F.col("tb")).cast("double"), 6
        ).alias("ks_statistic"),
    )


# RFM quartiles: ntile(4) under TOTAL orders (metric, customer key) so
# both engines assign identical tiles (ntile over a partial order is
# engine-dependent at ties; a total order cannot be).
RFM_SQL = """
    WITH cust AS (
      SELECT o_custkey,
             max(o_orderdate)                  AS last_order,
             count(*)                          AS frequency,
             CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS monetary
      FROM orders
      GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey, frequency, monetary,
             ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS r_q,
             ntile(4) OVER (ORDER BY frequency DESC, o_custkey)  AS f_q,
             ntile(4) OVER (ORDER BY monetary DESC, o_custkey)   AS m_q
      FROM cust
    )
    SELECT r_q, f_q, m_q,
           CAST(count(*) AS BIGINT)            AS n_customers,
           CAST(sum(frequency) AS BIGINT)      AS total_orders,
           round(sum(monetary), 2)             AS total_monetary
    FROM scored
    GROUP BY r_q, f_q, m_q
"""


@query("rfm_segmentation", oracle=RFM_SQL)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation —
    the classic marketing-analytics quartile grid (Hughes 1994; every
    warehouse's first segmentation query): per-customer last order
    date, order count, and total spend, each cut into quartiles by
    ``ntile(4)``, then the 4×4×4 segment census. Same ANSI text in
    both lanes (R17 passthrough); tiles are assigned under TOTAL
    orders (tie-broken by customer key) so the grid is
    engine-identical, and per-customer monetary is rounded BEFORE the
    segment sum so the final sum adds identical doubles.

    Scale note: the three ntile windows are unpartitioned (global
    rank) — fine at dim-table cardinality (customers), and the exact
    formulation the oracle needs; the 100 TB substitution is quantile
    cuts from ``approx_percentile`` applied as projections, same
    downstream census.
    """
    register_views(spark, sf_dir)
    return spark.sql(RFM_SQL)


# FK edges of the star schema: (edge name, child table, child key,
# parent table, parent key). One row per edge in the audit.
FK_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]

_FK_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{name}' AS fk_edge,
           CAST(count(*) AS BIGINT) AS n_child_rows,
           CAST(sum(CASE WHEN p.{pk} IS NULL AND c.{ck} IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
           CAST(sum(CASE WHEN c.{ck} IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_keys
    FROM {child} c LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
      ON c.{ck} = p.{pk}
    """
    for name, child, ck, parent, pk in FK_EDGES
)


@query(
    "referential_integrity_audit",
    oracle=f"SELECT * FROM ({_FK_ORACLE}) ORDER BY fk_edge",
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan census over every FK edge of the star schema
    — the referential-integrity DQ gate (the check constraint engines
    like DuckDB/PG enforce declaratively; a lakehouse has to AUDIT it,
    cf. Delta constraints / dbt relationship tests). One row per edge:
    child cardinality, orphaned children (non-null key with no parent),
    and NULL keys (counted separately — a NULL FK is 'unknown', not an
    orphan, per ANSI MATCH SIMPLE semantics).

    Scale: each edge is one LEFT join of the child against the
    DISTINCT parent-key projection — dimension keys broadcast (nation,
    region, customer, supplier, part), and the one fact-fact edge
    (lineitem->orders) is an equi hash join on the already
    co-partitionable order key; the reduce is a partial-aggregated
    3-counter sum. Edges are independent unions — at 1000 executors
    they run concurrently.
    """
    out = None
    for name, child, ck, parent, pk in FK_EDGES:
        c = load_table(spark, sf_dir, child).select(F.col(ck).alias("k"))
        p = (
            load_table(spark, sf_dir, parent)
            .select(F.col(pk).alias("k"))
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        row = (
            c.join(p, "k", "left")
            .agg(
                F.lit(name).alias("fk_edge"),
                F.count("*").alias("n_child_rows"),
                F.sum(
                    (F.col("_hit").isNull() & F.col("k").isNotNull()).cast("int")
                )
                .cast("long")
                .alias("n_orphans"),
                F.sum(F.col("k").isNull().cast("int")).cast("long").alias(
                    "n_null_keys"
                ),
            )
            .select("fk_edge", "n_child_rows", "n_orphans", "n_null_keys")
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fk_edge")


LAG_BUCKET_DAYS = 30  # shipping-lag histogram bucket width


@query(
    "shipping_lag_census",
    oracle=f"""
    SELECT o.o_orderpriority AS priority,
           CAST(floor(date_diff('day', o.o_orderdate, l.l_shipdate)
                / {LAG_BUCKET_DAYS}) AS BIGINT) AS lag_bucket,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           CAST(min(date_diff('day', o.o_orderdate, l.l_shipdate)) AS BIGINT)
             AS min_lag_days,
           CAST(max(date_diff('day', o.o_orderdate, l.l_shipdate)) AS BIGINT)
             AS max_lag_days
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def shipping_lag_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency histogram per order priority ({LAG_BUCKET_DAYS}-day
    buckets) — the fulfillment-SLA census (TPC-H Q4's question asked
    distributionally): how long after the order date do its line items
    actually ship, and does priority buy anything? The fact-to-fact
    join every operational dashboard starts from.

    Exactness: day arithmetic on DATE columns is integer in both
    engines; bucket = floor(lag / width) on integers.

    Scale: ONE equi hash join lineitem⋈orders on the order key — the
    natural co-partition key both tables should be bucketed by (and
    are, in the warehouse lane) — then a small (priority × bucket)
    hash aggregate with map-side partials. Only the 3 needed columns
    scan (pushed projection).
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.floor(lag / LAG_BUCKET_DAYS).cast("long").alias("lag_bucket"),
        )
        .agg(
            F.count("*").alias("n_lineitems"),
            F.min(lag).cast("long").alias("min_lag_days"),
            F.max(lag).cast("long").alias("max_lag_days"),
        )
        .orderBy("priority", "lag_bucket")
    )


STAR_HEAD = 50  # exported head rows (deterministic key order)


@query(
    "star_flatten_export",
    oracle=f"""
    SELECT l.l_orderkey, l.l_linenumber,
           o.o_orderdate, o.o_orderpriority,
           c.c_mktsegment,
           cn.n_name AS cust_nation, cr.r_name AS cust_region,
           p.p_brand, p.p_type,
           s.s_name AS supplier_name, sn.n_name AS supp_nation,
           round(l.l_extendedprice * (1 - l.l_discount), 2) AS net_price
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
    JOIN region cr   ON cn.n_regionkey = cr.r_regionkey
    JOIN part p      ON l.l_partkey = p.p_partkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
    ORDER BY l.l_orderkey, l.l_linenumber
    LIMIT {STAR_HEAD}
    """,
)
def star_flatten_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full star-schema denormalization — the 7-way dimension join
    producing the WIDE fact extract every BI export / feature-store
    materialization runs (TPC-H's whole schema in one plan): lineitem
    ⋈ orders ⋈ customer ⋈ nation ⋈ region ⋈ part ⋈ supplier ⋈ nation,
    with the derived net price. The join-PLANNING showcase: Catalyst
    must broadcast every dimension and keep the two facts on the
    order-key hash join.

    Scale: customer/part/supplier/nation/region all broadcast (AQE
    sizes them); the only shuffle join is lineitem⋈orders on the
    co-partitionable order key; every scan is column-pruned to the
    exported fields. The head is a bounded TopK — production exports
    drop the LIMIT and write partitioned parquet with the same plan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"),
        F.col("n_regionkey").alias("cn_region"),
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "o_orderdate",
            "o_orderpriority",
            "c_mktsegment",
            "cust_nation",
            F.col("r_name").alias("cust_region"),
            "p_brand",
            "p_type",
            F.col("s_name").alias("supplier_name"),
            "supp_nation",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
            ).alias("net_price"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(STAR_HEAD)
    )


# Candidate functional dependencies to audit: (name, table, det, dep).
FD_CANDIDATES = [
    ("nation->region", "nation", "n_nationkey", "n_regionkey"),
    ("custkey->nationkey", "customer", "c_custkey", "c_nationkey"),
    ("custkey->mktsegment", "customer", "c_custkey", "c_mktsegment"),
    ("orderpriority->orderstatus", "orders", "o_orderpriority", "o_orderstatus"),
    ("partbrand->parttype", "part", "p_brand", "p_type"),
]

_FD_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{name}' AS fd,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_keys,
           round(CAST(sum(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS violation_rate
    FROM (
      SELECT {det}, count(DISTINCT {dep}) AS ndep
      FROM {table} GROUP BY {det}
    )
    """
    for name, table, det, dep in FD_CANDIDATES
)


@query(
    "functional_dependency_audit",
    oracle=f"SELECT * FROM ({_FD_ORACLE}) ORDER BY fd",
)
def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit (the profiling step behind
    normalization and dbt `unique`/`accepted_values`-style contracts,
    cf. TANE/Metanome FD discovery): for each candidate X→Y, how many
    X keys map to MORE than one Y — 0 violating keys certifies the
    dependency (safe to normalize Y out / join on X alone); a nonzero
    rate quantifies how far the data is from it. True FDs here
    (nation→region, custkey→*) audit at zero; the deliberately-false
    candidates (priority→status, brand→type) show the measure.

    Exactness: per-key distinct counts and the violation census are
    exact integers; one division per FD, rounded once.

    Scale: each candidate is one (det)-keyed count-distinct aggregate
    (two-level partial agg — the k_anonymity_audit shape) reduced to
    three counters; candidates are independent unions and run
    concurrently.
    """
    out = None
    for name, table, det, dep in FD_CANDIDATES:
        t = load_table(spark, sf_dir, table)
        per = t.groupBy(det).agg(F.countDistinct(dep).alias("ndep"))
        viol = F.sum((F.col("ndep") > 1).cast("int")).cast("long")
        row = per.agg(
            F.lit(name).alias("fd"),
            F.count("*").alias("n_keys"),
            viol.alias("n_violating_keys"),
            F.round(viol.cast("double") / F.count("*"), 6).alias(
                "violation_rate"
            ),
        ).select("fd", "n_keys", "n_violating_keys", "violation_rate")
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fd")


SPX_CUT = 150_000.0  # a 'high-value' order


@query(
    "simpsons_paradox_scan",
    oracle=f"""
    WITH o AS (
      SELECT c.c_mktsegment AS seg,
             o_orderpriority = '1-URGENT' AS urgent,
             CASE WHEN o_totalprice > {SPX_CUT} THEN 1 ELSE 0 END AS hi
      FROM orders JOIN customer c ON o_custkey = c_custkey
    ),
    strata AS (
      SELECT seg,
             CAST(sum(CASE WHEN urgent THEN 1 ELSE 0 END) AS BIGINT) AS n_u,
             CAST(sum(CASE WHEN urgent THEN hi ELSE 0 END) AS BIGINT) AS x_u,
             CAST(sum(CASE WHEN urgent THEN 0 ELSE 1 END) AS BIGINT) AS n_o,
             CAST(sum(CASE WHEN urgent THEN 0 ELSE hi END) AS BIGINT) AS x_o
      FROM o GROUP BY seg
    ),
    agg AS (
      SELECT CAST(sum(x_u) AS BIGINT) AS xu, CAST(sum(n_u) AS BIGINT) AS nu,
             CAST(sum(x_o) AS BIGINT) AS xo, CAST(sum(n_o) AS BIGINT) AS no
      FROM strata
    )
    SELECT seg, n_u, x_u, n_o, x_o,
           x_u * n_o > x_o * n_u AS urgent_better_here,
           (x_u * n_o > x_o * n_u) = (agg.xu * agg.no > agg.xo * agg.nu)
             AS agrees_with_aggregate
    FROM strata CROSS JOIN agg
    ORDER BY seg
    """,
)
def simpsons_paradox_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox scan (Simpson 1951; the aggregation trap
    behind the Berkeley-admissions case): does 'urgent orders are
    likelier to be high-value' hold in AGGREGATE but flip inside
    market segments (or vice versa)? One row per stratum with its own
    direction and whether it agrees with the pooled direction — any
    FALSE in the last column means per-segment mix, not the headline
    rate, is driving the aggregate, and every dashboard built on the
    pooled number is lying. The stats-literacy audit run before
    shipping any rate comparison.

    Exactness: every direction test is the CROSS-MULTIPLIED integer
    compare x_u·n_o vs x_o·n_u — no rate is ever materialized as a
    float, so no engine can disagree at a boundary.

    Scale: one broadcast join (customer dim) → |segments|-group
    4-counter aggregate; the pooled row broadcasts back over the
    stratum table.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        (F.col("o_orderpriority") == "1-URGENT").alias("urgent"),
        (F.col("o_totalprice") > SPX_CUT).cast("int").alias("hi"),
    )
    strata = j.groupBy("seg").agg(
        F.sum(F.col("urgent").cast("int")).cast("long").alias("n_u"),
        F.sum(F.when(F.col("urgent"), F.col("hi")).otherwise(0))
        .cast("long")
        .alias("x_u"),
        F.sum((~F.col("urgent")).cast("int")).cast("long").alias("n_o"),
        F.sum(F.when(~F.col("urgent"), F.col("hi")).otherwise(0))
        .cast("long")
        .alias("x_o"),
    )
    strata = scoped_persist(strata)
    agg = strata.agg(
        F.sum("x_u").alias("xu"),
        F.sum("n_u").alias("nu"),
        F.sum("x_o").alias("xo"),
        F.sum("n_o").alias("no"),
    )
    here = F.col("x_u") * F.col("n_o") > F.col("x_o") * F.col("n_u")
    pooled = F.col("xu") * F.col("no") > F.col("xo") * F.col("nu")
    return (
        strata.crossJoin(F.broadcast(agg))
        .select(
            "seg",
            "n_u",
            "x_u",
            "n_o",
            "x_o",
            here.alias("urgent_better_here"),
            (here == pooled).alias("agrees_with_aggregate"),
        )
        .orderBy("seg")
    )


PRF_SEEDS = ("data", "table")  # the original query
PRF_FB_DOCS = 10  # pseudo-relevant feedback depth
PRF_EXP_TERMS = 2  # expansion terms mined from the feedback docs
PRF_TOP = 15

_PRF_ORACLE = f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS MATERIALIZED (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok
      GROUP BY 1, 2
    ),
    dl AS MATERIALIZED (
      SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS sum_dl
      FROM dl
    ),
    df AS MATERIALIZED (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    contrib AS (
      SELECT tf.doc_id, tf.term,
             CAST(round(1000000 *
               ln(1 + (g.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * ({BM25_K1} + 1))
               / (tf.tf + {BM25_K1} * (1 - {BM25_B}
                  + {BM25_B} * dl.dl * g.n_docs / CAST(g.sum_dl AS DOUBLE)))
             ) AS BIGINT) AS c_micro
      FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN g
    ),
    fb AS MATERIALIZED (
      SELECT doc_id FROM contrib
      WHERE term IN {PRF_SEEDS}
      GROUP BY doc_id
      ORDER BY CAST(sum(c_micro) AS BIGINT) DESC, doc_id
      LIMIT {PRF_FB_DOCS}
    ),
    exp_terms AS MATERIALIZED (
      SELECT tf.term, CAST(sum(tf.tf) AS BIGINT) AS tf_fb
      FROM tf JOIN fb USING (doc_id) JOIN df USING (term)
      WHERE tf.term NOT IN {PRF_SEEDS}
      GROUP BY tf.term, df.df
      ORDER BY CAST(sum(tf.tf) AS DOUBLE) / df.df DESC, tf.term
      LIMIT {PRF_EXP_TERMS}
    ),
    qterms AS (
      SELECT term FROM exp_terms
      UNION ALL
      SELECT unnest(['data', 'table'])
    ),
    final AS (
      SELECT c.doc_id, CAST(sum(c.c_micro) AS BIGINT) AS s_micro,
             CAST(count(*) AS BIGINT) AS n_terms_hit
      FROM contrib c JOIN qterms q ON c.term = q.term
      GROUP BY c.doc_id
    )
    SELECT f.doc_id, d.lang, f.n_terms_hit,
           round(CAST(f.s_micro AS DOUBLE) / 1000000, 4) AS score
    FROM final f JOIN documents d USING (doc_id)
    ORDER BY f.s_micro DESC, f.doc_id
    LIMIT {PRF_TOP}
"""


@query("pseudo_relevance_feedback", oracle=_PRF_ORACLE)
def pseudo_relevance_feedback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance feedback retrieval (Rocchio'71 lineage, the
    two-pass query expansion every serious lexical engine ships):
    score the seed query with BM25 over an exploded inverted index,
    take the top-{PRF_FB_DOCS} docs as pseudo-relevant, mine the
    {PRF_EXP_TERMS} highest tf/df terms they contain, and re-score
    with the expanded query. Upgrades ``bm25_relevance`` (static
    per-term columns) to DYNAMIC terms — the inverted-index join
    shape a real search engine uses, where the query terms are data,
    not schema.

    Exactness: tf/df/dl/N are exact integers; each term's BM25
    contribution micro-quantizes BEFORE the per-doc reduce (a raw
    float sum over joined term rows would be join-order sensitive —
    the repo-wide ln-reduce rule), so ranking compares integer sums
    with doc_id tiebreaks; expansion-term ranking compares the
    rational tf/df with a term tiebreak.

    Scale: the index build is one explode + (doc,term) hash agg; df
    and the one-row corpus stats broadcast back; phase-1 scoring
    touches only seed-term postings (join on the term key); phase-2
    only the ≤4 query terms' postings. The corpus is scanned once —
    everything else is posting-list-sized.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = scoped_persist(
        tok.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    )
    # dl rides the doc_id exchange the scoring join needed anyway
    # (guide §2.4 shared exchange): the previous dl = groupBy(doc_id)
    # aggregate + join re-shuffled tf a second time; a whole-partition
    # window sum produces the identical integer on one exchange. The
    # one-row corpus stats likewise fold into a single aggregate over
    # tf (n_docs = distinct doc_id, sum_dl = Σtf — the same integers).
    g = tf.agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.sum("tf").cast("long").alias("sum_dl"),
    )
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    norm = F.col("tf") + BM25_K1 * (
        1
        - BM25_B
        + BM25_B * F.col("dl") * F.col("n_docs") / F.col("sum_dl").cast("double")
    )
    contrib = scoped_persist(
        tf.withColumn(
            "dl", F.sum("tf").over(Window.partitionBy("doc_id")).cast("long")
        )
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(g))
        .select(
            "doc_id",
            "term",
            F.round(1_000_000 * idf * (F.col("tf") * (BM25_K1 + 1)) / norm)
            .cast("long")
            .alias("c_micro"),
        )
    )
    fb = (
        contrib.filter(F.col("term").isin(*PRF_SEEDS))
        .groupBy("doc_id")
        .agg(F.sum("c_micro").cast("long").alias("s"))
        .orderBy(F.col("s").desc(), "doc_id")
        .limit(PRF_FB_DOCS)
        .select("doc_id")
    )
    exp_terms = (
        tf.join(F.broadcast(fb), "doc_id")
        .filter(~F.col("term").isin(*PRF_SEEDS))
        .groupBy("term")
        .agg(F.sum("tf").cast("long").alias("tf_fb"))
        .join(F.broadcast(df), "term")
        .orderBy(
            (F.col("tf_fb").cast("double") / F.col("df")).desc(), "term"
        )
        .limit(PRF_EXP_TERMS)
        .select("term")
    )
    seeds_sql = ", ".join(f"('{t}')" for t in PRF_SEEDS)
    qterms = exp_terms.unionByName(
        spark.sql(f"SELECT * FROM VALUES {seeds_sql} AS t(term)")
    )
    final = (
        contrib.join(F.broadcast(qterms), "term")
        .groupBy("doc_id")
        .agg(
            F.sum("c_micro").cast("long").alias("s_micro"),
            F.count("*").cast("long").alias("n_terms_hit"),
        )
    )
    return (
        final.join(d.select("doc_id", "lang"), "doc_id")
        .orderBy(F.col("s_micro").desc(), "doc_id")
        .limit(PRF_TOP)
        .select(
            "doc_id",
            "lang",
            "n_terms_hit",
            F.round(F.col("s_micro").cast("double") / 1_000_000, 4).alias("score"),
        )
    )


LM_MU = 300.0  # Dirichlet smoothing mass (docs are 10-99 tokens)

_LM_DIRICHLET_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS dl,
             len(list_filter(string_split(text, ' '), x -> x = 'data'))  AS tf1,
             len(list_filter(string_split(text, ' '), x -> x = 'table')) AS tf2
      FROM documents
    ),
    g AS (
      SELECT CAST(sum(dl) AS BIGINT) AS c_len,
             CAST(sum(tf1) AS BIGINT) AS cf1,
             CAST(sum(tf2) AS BIGINT) AS cf2
      FROM t
    ),
    scored AS (
      SELECT doc_id, lang,
             ln((tf1 + {LM_MU} * cf1 / CAST(c_len AS DOUBLE)) / (dl + {LM_MU}))
           + ln((tf2 + {LM_MU} * cf2 / CAST(c_len AS DOUBLE)) / (dl + {LM_MU}))
               AS _score,
             tf1 + tf2 AS _hits
      FROM t CROSS JOIN g
    )
    SELECT doc_id, lang, round(_score, 4) AS score
    FROM scored WHERE _hits > 0
    ORDER BY _score DESC, doc_id
    LIMIT 15
"""


@query("lm_dirichlet_relevance", oracle=_LM_DIRICHLET_ORACLE)
def lm_dirichlet_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty 2001 — the language-modeling ranking family next to
    ``bm25_relevance``'s probabilistic one; Lucene ships it as
    LMDirichletSimilarity): score(q, d) = Σ_t ln((tf + μ·P(t|C)) /
    (dl + μ)), where the collection model P(t|C) = cf_t/|C| backs off
    rare terms and μ absorbs document-length variance. Completes the
    S19 full-text surface with the second of the two standard
    similarity families.

    Determinism: tf/dl/cf/|C| are integers; the two-term score is one
    fixed float dag written identically in both lanes (no float
    REDUCE — the per-doc score is a 2-term expression, the bm25
    precedent), rounded once; ranking ties break on doc_id.

    Scale: identical shape to BM25 — per-doc stats are a scan
    projection, collection stats are a ONE-ROW broadcast, top-15 is a
    TakeOrderedAndProject heap.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    t = d.select(
        "doc_id",
        "lang",
        F.size(toks).alias("dl"),
        F.size(F.filter(toks, lambda x: x == "data")).alias("tf1"),
        F.size(F.filter(toks, lambda x: x == "table")).alias("tf2"),
    )
    g = t.agg(
        F.sum("dl").cast("long").alias("c_len"),
        F.sum("tf1").cast("long").alias("cf1"),
        F.sum("tf2").cast("long").alias("cf2"),
    )

    def lm_term(tf: str, cf: str):
        return F.log(
            (F.col(tf) + LM_MU * F.col(cf) / F.col("c_len").cast("double"))
            / (F.col("dl") + LM_MU)
        )

    scored = t.crossJoin(F.broadcast(g)).select(
        "doc_id",
        "lang",
        (lm_term("tf1", "cf1") + lm_term("tf2", "cf2")).alias("_score"),
        (F.col("tf1") + F.col("tf2")).alias("_hits"),
    )
    return (
        scored.filter(F.col("_hits") > 0)
        .orderBy(F.col("_score").desc(), "doc_id")
        .limit(15)
        .select("doc_id", "lang", F.round("_score", 4).alias("score"))
    )


CF_TOP = 20


@query(
    "item_cooccurrence_cf",
    oracle=f"""
    WITH bi AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ic AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
           FROM bi GROUP BY l_partkey),
    co AS (
      SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
             CAST(count(*) AS BIGINT) AS c_ab
      FROM bi a JOIN bi b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT co.item_a, co.item_b, co.c_ab,
           ca.c AS c_a, cb.c AS c_b,
           round(co.c_ab / sqrt(CAST(ca.c AS DOUBLE) * cb.c), 6)
             AS cosine_sim
    FROM co JOIN ic ca ON co.item_a = ca.l_partkey
            JOIN ic cb ON co.item_b = cb.l_partkey
    ORDER BY co.c_ab / sqrt(CAST(ca.c AS DOUBLE) * cb.c) DESC,
             co.item_a, co.item_b
    LIMIT {CF_TOP}
    """,
)
def item_cooccurrence_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering by basket co-occurrence
    (Sarwar et al. 2001 / the Amazon item-to-item paper, Linden 2003
    — "customers who bought X also bought Y" computed OFFLINE as
    item-pair similarity, the recommender shape that scales because
    items, not users, are the join key): distinct (order, part)
    baskets, pair counts within each order, cosine over the binary
    incidence c_ab/sqrt(c_a·c_b), top-{20} pairs.

    Exactness: all three counts are integers; the similarity is ONE
    float expression (sqrt over exactly-representable integers)
    written identically in both lanes, ordered with a full integer
    tie-break and rounded once.

    Scale: the pair join keys on the ORDER (baskets are small — pair
    work is sum |basket|², never items x items); item counts attach
    by item-keyed broadcastable joins; top-k is a heap. This is the
    classic market-basket shape shared with
    ``market_basket_lift_pairs`` but ranked by cosine geometry
    rather than lift.
    """
    li = load_table(spark, sf_dir, "lineitem")
    bi = li.select("l_orderkey", "l_partkey").distinct()
    bi = scoped_persist(bi)  # pair-join sides + item counts
    ic = bi.groupBy("l_partkey").agg(F.count("*").cast("long").alias("c"))
    a = bi.select("l_orderkey", F.col("l_partkey").alias("item_a"))
    b = bi.select("l_orderkey", F.col("l_partkey").alias("item_b"))
    co = (
        a.join(b, "l_orderkey")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("c_ab"))
    )
    ca = ic.select(F.col("l_partkey").alias("item_a"), F.col("c").alias("c_a"))
    cb = ic.select(F.col("l_partkey").alias("item_b"), F.col("c").alias("c_b"))
    sim = F.col("c_ab") / F.sqrt(F.col("c_a").cast("double") * F.col("c_b"))
    return (
        co.join(ca, "item_a")
        .join(cb, "item_b")
        .orderBy(sim.desc(), "item_a", "item_b")
        .limit(CF_TOP)
        .select(
            "item_a", "item_b", "c_ab", "c_a", "c_b",
            F.round(sim, 6).alias("cosine_sim"),
        )
    )


LM_JM_LAMBDA = 0.5  # Jelinek-Mercer mixture weight on the doc model


_LM_JM_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS dl,
             len(list_filter(string_split(text, ' '), x -> x = 'data'))  AS tf1,
             len(list_filter(string_split(text, ' '), x -> x = 'table')) AS tf2
      FROM documents
    ),
    g AS (
      SELECT CAST(sum(dl) AS BIGINT) AS c_len,
             CAST(sum(tf1) AS BIGINT) AS cf1,
             CAST(sum(tf2) AS BIGINT) AS cf2
      FROM t
    ),
    scored AS (
      SELECT doc_id, lang,
             ln(1 + ({1 - LM_JM_LAMBDA} * tf1 / CAST(dl AS DOUBLE))
                    / ({LM_JM_LAMBDA} * cf1 / CAST(c_len AS DOUBLE)))
           + ln(1 + ({1 - LM_JM_LAMBDA} * tf2 / CAST(dl AS DOUBLE))
                    / ({LM_JM_LAMBDA} * cf2 / CAST(c_len AS DOUBLE)))
               AS _score,
             tf1 + tf2 AS _hits
      FROM t CROSS JOIN g
    )
    SELECT doc_id, lang, round(_score, 4) AS score
    FROM scored WHERE _hits > 0
    ORDER BY _score DESC, doc_id
    LIMIT 15
"""


@query("lm_jelinek_mercer_relevance", oracle=_LM_JM_ORACLE)
def lm_jelinek_mercer_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Jelinek-Mercer smoothing (Zhai
    & Lafferty 2001; Lucene's LMJelinekMercerSimilarity) — the THIRD
    standard similarity family next to ``bm25_relevance`` and
    ``lm_dirichlet_relevance``: score(q, d) = Σ_t ln(1 +
    ((1−λ)·tf/dl) / (λ·P(t|C))). Linear interpolation smooths with a
    CONSTANT collection weight where Dirichlet's is length-adaptive —
    the preferred family for verbose queries (Zhai & Lafferty's own
    finding), and the last of the Lucene trio, completing the S19
    full-text surface.

    Determinism: tf/dl/cf/|C| are integers; each term is one fixed
    float dag written identically in both lanes (no float reduce —
    the bm25/dirichlet precedent), rounded once; ranking ties break
    on doc_id.

    Scale: identical shape to its two siblings — per-doc stats are a
    scan projection, collection stats a ONE-ROW broadcast, top-15 a
    TakeOrderedAndProject heap.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    t = d.select(
        "doc_id",
        "lang",
        F.size(toks).alias("dl"),
        F.size(F.filter(toks, lambda x: x == "data")).alias("tf1"),
        F.size(F.filter(toks, lambda x: x == "table")).alias("tf2"),
    )
    g = t.agg(
        F.sum("dl").cast("long").alias("c_len"),
        F.sum("tf1").cast("long").alias("cf1"),
        F.sum("tf2").cast("long").alias("cf2"),
    )

    def jm_term(tf: str, cf: str):
        return F.log(
            1
            + ((1 - LM_JM_LAMBDA) * F.col(tf) / F.col("dl").cast("double"))
            / (LM_JM_LAMBDA * F.col(cf) / F.col("c_len").cast("double"))
        )

    scored = t.crossJoin(F.broadcast(g)).select(
        "doc_id",
        "lang",
        (jm_term("tf1", "cf1") + jm_term("tf2", "cf2")).alias("_score"),
        (F.col("tf1") + F.col("tf2")).alias("_hits"),
    )
    return (
        scored.filter(F.col("_hits") > 0)
        .orderBy(F.col("_score").desc(), "doc_id")
        .limit(15)
        .select("doc_id", "lang", F.round("_score", 4).alias("score"))
    )
