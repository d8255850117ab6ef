"""Statistical aggregate surface: exact percentiles, moments/
correlation, and PIVOT — warehouse staples beyond basic SUM/AVG
(S7 extensions; reference README.md:68 "aggregations ... and much
more" delegated to the target engine's SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from couchwarehouse_spark.catalog import load_table, register_views
from couchwarehouse_spark.plans.registry import query, scoped_persist
from couchwarehouse_spark.plans.sizing import data_width


PERCENTILE_SQL = """
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rp,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           max(CASE WHEN rp = CAST(ceil(0.50 * n) AS BIGINT) THEN l_extendedprice END) AS p50_price,
           max(CASE WHEN rp = CAST(ceil(0.90 * n) AS BIGINT) THEN l_extendedprice END) AS p90_price,
           max(CASE WHEN rp = CAST(ceil(0.99 * n) AS BIGINT) THEN l_extendedprice END) AS p99_price
    FROM ranked
    GROUP BY l_returnflag
"""


@query("percentile_stats", oracle=PERCENTILE_SQL)
def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (p50/p90/p99) per group — element at rank
    ⌈q·n⌉ under a total order, so the result is an actual data value
    and IDENTICAL across engines (interpolated percentiles differ in
    the last ulp between implementations and flip under rounding; a
    discrete definition cannot). Same ANSI text runs in both lanes
    (R17 passthrough).

    Scale note: this window formulation sorts each partition; at
    100 TB use ``approx_percentile`` (t-digest sketch, mergeable
    map-side) — exact ranks kept here for the oracle.
    """
    register_views(spark, sf_dir)
    return spark.sql(PERCENTILE_SQL)


@query(
    "moment_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 2)             AS price_stddev,
           round(var_samp(l_quantity), 4)                     AS qty_var,
           round(corr(l_quantity, l_extendedprice), 4)        AS qty_price_corr,
           round(covar_samp(l_discount, l_tax), 6) + 0.0      AS disc_tax_covar
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregates: stddev/variance/correlation/covariance
    — single-pass, mergeable (Welford-style partial states), so they
    scale exactly like SUM: partial map-side, merge at the exchange.

    The near-zero covariance gets ``+ 0.0`` after rounding in BOTH
    lanes: a covariance a hair below zero rounds to IEEE -0.0 on one
    engine and +0.0 on the other (observed: DuckDB -0.0 vs Spark 0.0
    on the N flag), and the driver's value hash distinguishes the two
    zeros. ``-0.0 + 0.0`` is +0.0 by IEEE 754, normalizing both.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        (F.round(F.covar_samp("l_discount", "l_tax"), 6) + F.lit(0.0)).alias(
            "disc_tax_covar"
        ),
    )


ORDER_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@query(
    "pivot_status_by_priority",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT)        AS urgent,
           CAST(count(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT)          AS high,
           CAST(count(*) FILTER (o_orderpriority = '3-MEDIUM') AS BIGINT)        AS medium,
           CAST(count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS not_specified,
           CAST(count(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT)           AS low
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts, status × priority as a cross-tab.

    ``groupBy().pivot(col, values)`` with EXPLICIT pivot values — at
    scale never let Spark scan for distinct pivot values first (that
    is an extra pass over the data); the oracle states the same table
    as conditional counts.
    """
    o = load_table(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", ORDER_PRIORITIES)
        .agg(F.count(F.lit(1)))  # star is invalid inside pivot
        .na.fill(0)
    )
    return pivoted.select(
        "o_orderstatus",
        F.col("`1-URGENT`").alias("urgent"),
        F.col("`2-HIGH`").alias("high"),
        F.col("`3-MEDIUM`").alias("medium"),
        F.col("`4-NOT SPECIFIED`").alias("not_specified"),
        F.col("`5-LOW`").alias("low"),
    )


@query(
    "spend_quartiles_ntile",
    oracle="""
    WITH spend AS (
      SELECT c_mktsegment, c_custkey, CAST(count(*) AS BIGINT) AS n_orders,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spent
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_mktsegment, c_custkey
    ),
    q AS (
      SELECT c_mktsegment,
             ntile(4) OVER (PARTITION BY c_mktsegment
                            ORDER BY spent DESC, c_custkey) AS quartile,
             n_orders, spent
      FROM spend
    )
    SELECT c_mktsegment, quartile,
           count(*)                    AS n_customers,
           CAST(sum(n_orders) AS BIGINT) AS total_orders,
           round(CAST(sum(spent) AS DOUBLE), 2) AS total_spent
    FROM q
    GROUP BY c_mktsegment, quartile
    """,
)
def spend_quartiles_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quartile segmentation (S15 ranking-family completeness):
    customers bucketed into spend quartiles within their market
    segment, then rolled up per (segment, quartile) — the standard
    customer-value segmentation query.

    Deterministic tie-break (spent DESC, custkey) and an EXACT
    decimal sort key so both engines cut quartile boundaries
    identically — a double sum's last-ulp wobble could flip a rounded
    key and shift an ntile cut. Scale: the window partitions on
    the low-cardinality segment but ranks customers, so the heavy
    lifting is the upstream per-customer aggregate (full shuffle on
    custkey); the quartile window then runs over already-reduced rows.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    spend = (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            # DECIMAL, not DOUBLE: the quartile cut is an exact integer
            # comparison downstream, so the sort key must be identical
            # across engines — decimal sums are exact (prices carry two
            # decimals), double sums differ in the last ulp with
            # aggregation order and can flip a rounded key.
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spent"),
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("spent").desc(), F.col("c_custkey")
    )
    return (
        spend.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("c_mktsegment", "quartile")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("n_orders").alias("total_orders"),
            F.round(F.sum("spent").cast("double"), 2).alias("total_spent"),
        )
    )


@query(
    "regression_price_qty",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           round(regr_slope(l_extendedprice, l_quantity), 4)      AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4)  AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)         AS r2
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def regression_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI linear-regression aggregates (statistics depth): per
    return flag, OLS slope/intercept/R² of price on quantity via the
    standard ``regr_*`` family — single-pass, mergeable
    (covariance-style partial states), so they scale exactly like SUM.
    Both engines implement the same ANSI definitions; outputs rounded
    past the partial-merge summation-order ulp.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
            "intercept"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
    )


APPROX_TOL = 0.05  # matches Spark's default HLL++ relative standard deviation


@query(
    "approx_distinct_audit",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact,
           abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey))
             <= {APPROX_TOL} * count(DISTINCT o_custkey) AS within_tol
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def approx_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based distinct counting with a TOLERANCE oracle (the
    scale path for count-distinct): each engine runs ITS OWN HLL
    sketch and asserts its estimate lands within {5}% of the exact
    count — the oracle checks the deterministic parts (exact count +
    the tolerance verdict) rather than demanding bit-equal sketches
    across engines, which is how approximate operators stay under the
    correctness gate without weakening it to rows-only. At 100 TB the
    sketch is the ONLY viable distinct count: mergeable fixed-size
    state, no distinct-shuffle of the key space.

    Margin-checked like COSINE_DUP_THRESHOLD: Spark runs rsd=0.02
    (default 0.05 is one SIGMA, and its observed per-group error
    reaches ~10% on this data — over the 5% gate); at rsd=0.02 the
    measured max error is ≤0.9% (Spark) / ≤1.7% (DuckDB) across every
    SF, ≥3x headroom under the verdict threshold.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_exact"),
        (
            F.abs(
                F.approx_count_distinct("o_custkey", 0.02)
                - F.countDistinct("o_custkey")
            )
            <= F.lit(APPROX_TOL) * F.countDistinct("o_custkey")
        ).alias("within_tol"),
    )


@query(
    "hll_union_audit",
    oracle=f"""
    SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact,
           abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey))
             <= {APPROX_TOL} * count(DISTINCT o_custkey) AS within_tol
    FROM orders
    """,
)
def hll_union_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting (the 100 TB distinct-count
    shape made explicit): per-shard HLL sketches built with
    ``hll_sketch_agg``, UNIONED with ``hll_union_agg``, then estimated
    — the exact dataflow a 1000-executor distinct count runs (each
    executor ships a KB sketch, never its keys; sketches also persist
    per partition/day and re-merge for any rollup without rescanning).
    Tolerance oracle as in ``approx_distinct_audit``: each engine's
    estimate must land within {5}% of the exact count (measured merged
    error ≤1.0% at every SF — 5x headroom); DuckDB states the same
    verdict over its own single-pass sketch.
    """
    o = load_table(spark, sf_dir, "orders")
    halves = o.groupBy((F.col("o_orderkey") % 2).alias("half")).agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    est = halves.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = o.agg(F.countDistinct("o_custkey").alias("n_exact"))
    return exact.crossJoin(F.broadcast(est)).select(
        "n_exact",
        (
            F.abs(F.col("est") - F.col("n_exact"))
            <= F.lit(APPROX_TOL) * F.col("n_exact")
        ).alias("within_tol"),
    )


PCTL_TOL = 0.01  # 1% relative tolerance for the t-digest/GK audit


@query(
    "approx_percentile_audit",
    oracle=f"""
    SELECT l_returnflag,
           count(*) AS n_rows,
           abs(approx_quantile(l_extendedprice, 0.5) - quantile_cont(l_extendedprice, 0.5))
             <= {PCTL_TOL} * quantile_cont(l_extendedprice, 0.5) AS p50_within_tol,
           abs(approx_quantile(l_extendedprice, 0.9) - quantile_cont(l_extendedprice, 0.9))
             <= {PCTL_TOL} * quantile_cont(l_extendedprice, 0.9) AS p90_within_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def approx_percentile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles under a TOLERANCE oracle (same
    contract as ``approx_distinct_audit``): each engine runs ITS OWN
    approximate quantile (Spark: Greenwald-Khanna via
    ``percentile_approx``; DuckDB: t-digest) and asserts the estimate
    lands within 1% of its own exact quantile. Only integers and
    verdict booleans cross engines, so no interpolated float ever
    needs to be bit-equal. Measured max relative error ≤0.073% on
    both engines at every SF — ≥13x headroom under the gate.

    This is the 100 TB percentile shape: mergeable fixed-size sketch
    state, partial-aggregated map-side — unlike the exact rank window
    of ``percentile_stats``, which sorts each group on one reducer
    and exists for the oracle, not for scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # ARRAY quantile form: ONE buffered exact-percentile aggregate and
    # ONE GK sketch serve both cut points — the two-calls-per-quantile
    # form pays the (memory-heavy) exact buffer twice per group.
    exact = F.expr("percentile(l_extendedprice, array(0.5, 0.9))")
    approx = F.expr("percentile_approx(l_extendedprice, array(0.5, 0.9), 10000)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            exact.alias("_ex"),
            approx.alias("_ap"),
        )
        .select(
            "l_returnflag",
            "n_rows",
            (
                F.abs(F.col("_ap")[0] - F.col("_ex")[0])
                <= PCTL_TOL * F.col("_ex")[0]
            ).alias("p50_within_tol"),
            (
                F.abs(F.col("_ap")[1] - F.col("_ex")[1])
                <= PCTL_TOL * F.col("_ex")[1]
            ).alias("p90_within_tol"),
        )
    )


WINSOR_LO = 0.05
WINSOR_HI = 0.95

_WINSOR_ORACLE = f"""
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rp,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ),
    cuts AS (
      SELECT l_returnflag,
             max(CASE WHEN rp = CAST(ceil({WINSOR_LO} * n) AS BIGINT)
                      THEN l_extendedprice END) AS lo,
             max(CASE WHEN rp = CAST(ceil({WINSOR_HI} * n) AS BIGINT)
                      THEN l_extendedprice END) AS hi
      FROM ranked GROUP BY l_returnflag
    )
    SELECT r.l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (r.l_extendedprice < c.lo) AS BIGINT) AS n_floor,
           CAST(count(*) FILTER (r.l_extendedprice > c.hi) AS BIGINT) AS n_ceil,
           round(CAST(sum(CAST(greatest(least(r.l_extendedprice, c.hi), c.lo)
                               AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4)
             AS winsorized_mean
    FROM ranked r JOIN cuts c USING (l_returnflag)
    GROUP BY r.l_returnflag
"""


@query("winsorized_stats", oracle=_WINSOR_ORACLE)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clamped-tail) statistics: per group, clamp values
    below the p05 / above the p95 DISCRETE percentile to the cut value
    and report the robust mean plus how many rows each tail clamped —
    the outlier-robust aggregate a curation pass uses where a raw mean
    would be dominated by a corrupt tail.

    Determinism: cuts are actual data values at rank ⌈q·n⌉ (see
    percentile_stats — discrete, so identical across engines); the
    clamped sum runs in DECIMAL (prices carry 2 decimals → exact),
    and the single final division is the only float op.

    Scale: the cuts table is |groups| rows → broadcast back onto the
    scan; at 100 TB replace the exact-rank window with
    approx_percentile cuts (sketch, map-side mergeable) under the same
    output contract. The window sort here exists for the oracle's
    exactness, like percentile_stats.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rp"),
        F.count("*").over(wn).alias("n"),
    )
    cuts = ranked.groupBy("l_returnflag").agg(
        F.max(
            F.when(
                F.col("rp") == F.ceil(WINSOR_LO * F.col("n")).cast("long"),
                F.col("l_extendedprice"),
            )
        ).alias("lo"),
        F.max(
            F.when(
                F.col("rp") == F.ceil(WINSOR_HI * F.col("n")).cast("long"),
                F.col("l_extendedprice"),
            )
        ).alias("hi"),
    )
    # Clamp from the RAW scan, not the ranked frame: the window sort
    # exists only to find the two cut values; re-using `ranked` here
    # would run the per-group sort a second time for rows that no
    # longer need their rank.
    clamped = li.select("l_returnflag", "l_extendedprice").join(
        F.broadcast(cuts), "l_returnflag"
    ).select(
        "l_returnflag",
        "l_extendedprice",
        (F.col("l_extendedprice") < F.col("lo")).alias("floored"),
        (F.col("l_extendedprice") > F.col("hi")).alias("ceiled"),
        F.greatest(F.least("l_extendedprice", "hi"), F.col("lo"))
        .cast("decimal(18,2)")
        .alias("wz"),
    )
    return clamped.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.count_if("floored").alias("n_floor"),
        F.count_if("ceiled").alias("n_ceil"),
        F.round(F.sum("wz").cast("double") / F.count("*"), 4).alias(
            "winsorized_mean"
        ),
    )


PMI_MIN_SUPPORT = 3  # co-occurrence count floor (noise gate)
PMI_TOP_K = 20


@query(
    "cooccurrence_pmi_pairs",
    oracle=f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM li),
    ca AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c FROM li GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(count(*) AS BIGINT) AS c_ab
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= {PMI_MIN_SUPPORT}
    )
    SELECT part_a, part_b, c_ab,
           round(ln(c_ab * CAST(n.n_orders AS DOUBLE) / (x.c * y.c)), 6) AS pmi
    FROM pairs
    JOIN ca x ON part_a = x.l_partkey
    JOIN ca y ON part_b = y.l_partkey
    CROSS JOIN n
    ORDER BY ln(c_ab * CAST(n.n_orders AS DOUBLE) / (x.c * y.c)) DESC,
             part_a, part_b
    LIMIT {PMI_TOP_K}
    """,
)
def cooccurrence_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information pair mining over order baskets
    (statistics — the co-occurrence kernel under word-embedding
    training, market-basket lift, and feature-association audits):
    part pairs sharing an order, support-floored at
    {PMI_MIN_SUPPORT}, ranked by PMI = ln(c_ab·N / (c_a·c_b)); the
    top-{PMI_TOP_K} strongest associations.

    Scale: pair generation is a self-join keyed on the BASKET id, so
    pair work is Σ basket_size² — bounded per order, never corpus-
    quadratic; the distinct projection first collapses duplicate
    (order, part) rows map-side. Marginals reduce the deduped posting
    table; the pair census partial-aggregates before its shuffle;
    everything after the HAVING gate is broadcast-joinable-sized at
    any SF, and emit is a TakeOrderedAndProject heap. All inputs to
    the single ln() are exact integers, so both engines order and
    round the same doubles.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    li = scoped_persist(li)  # feeds marginals, the pair join, and N
    n_row = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    ca = li.groupBy("l_partkey").agg(F.count("*").alias("c"))
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= PMI_MIN_SUPPORT)
    )
    pmi = F.log(
        F.col("c_ab") * F.col("n_orders").cast("double") / (F.col("ca_a") * F.col("ca_b"))
    )
    return (
        pairs.join(
            ca.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("ca_a")),
            "part_a",
        )
        .join(
            ca.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("ca_b")),
            "part_b",
        )
        .crossJoin(F.broadcast(n_row))
        .withColumn("_pmi", pmi)
        .orderBy(F.col("_pmi").desc(), "part_a", "part_b")
        .limit(PMI_TOP_K)
        .select("part_a", "part_b", "c_ab", F.round("_pmi", 6).alias("pmi"))
    )


CMS_DEPTH = 4     # independent hash rows
CMS_WIDTH = 256   # counters per row
CMS_TOP_K = 20    # audited heavy hitters


@query(
    "count_min_sketch_audit",
    oracle=f"""
    WITH counts AS (
      SELECT term, count(*) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY term
    ),
    cells AS (
      SELECT r,
             CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || term), 1, 8))
                  AS BIGINT) % {CMS_WIDTH} AS col,
             CAST(sum(c) AS BIGINT) AS counter
      FROM counts, range({CMS_DEPTH}) t(r)
      GROUP BY 1, 2
    ),
    top AS (
      SELECT term, c FROM counts ORDER BY c DESC, term LIMIT {CMS_TOP_K}
    )
    SELECT top.term,
           top.c                    AS true_count,
           min(cells.counter)       AS cms_estimate,
           min(cells.counter) - top.c AS overestimate
    FROM top CROSS JOIN range({CMS_DEPTH}) t(r)
    JOIN cells
      ON cells.r = t.r
     AND cells.col = CAST(('0x' || substr(md5(CAST(t.r AS VARCHAR) || ':' || top.term), 1, 8))
                          AS BIGINT) % {CMS_WIDTH}
    GROUP BY top.term, top.c
    ORDER BY true_count DESC, term
    """,
)
def count_min_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch build + audit (Cormode & Muthukrishnan 2005 —
    the streaming frequency sketch under heavy-hitter detection and
    join-size estimation at 100 TB): build a {CMS_DEPTH}×{CMS_WIDTH}
    sketch over the corpus term stream with md5-derived row hashes,
    then audit the top-{CMS_TOP_K} true heavy hitters: the CMS
    estimate (min over rows of the hashed counter) must NEVER
    underestimate, and the overestimate column shows the collision
    error the width bounds by N/width. Deterministic hashes make even
    this approximate structure exactly oracle-checkable.

    Scale: the sketch is CMS_DEPTH hash aggregates expressed as one —
    the term stream collapses to (term, c) with map-side combine, the
    per-row fan-out is a {CMS_DEPTH}-element explode of the already-
    vocabulary-sized table, and the sketch itself is ≤ D·W = 1024
    rows — broadcastable to wherever the estimate is consumed. The
    audit joins the top-k probe against those 1024 rows.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    counts = scoped_persist(counts)
    rows = F.explode(F.array(*[F.lit(r) for r in range(CMS_DEPTH)])).alias("r")

    def cms_col(r_col, term_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(r_col.cast("string"), F.lit(":"), term_col)),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % CMS_WIDTH
        )

    cells = (
        counts.select("term", "c", rows)
        .select("r", cms_col(F.col("r"), F.col("term")).alias("col"), "c")
        .groupBy("r", "col")
        .agg(F.sum("c").alias("counter"))
    )
    top = counts.orderBy(F.col("c").desc(), "term").limit(CMS_TOP_K)
    probes = top.select("term", "c", rows).select(
        "term", "c", "r", cms_col(F.col("r"), F.col("term")).alias("col")
    )
    return (
        probes.join(F.broadcast(cells), ["r", "col"])
        .groupBy(F.col("term"), F.col("c").alias("true_count"))
        .agg(F.min("counter").alias("cms_estimate"))
        .select(
            "term",
            "true_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("true_count")).alias("overestimate"),
        )
        .orderBy(F.col("true_count").desc(), "term")
    )


BLOOM_M = 4096  # filter bits
BLOOM_K = 3     # hash functions


@query(
    "bloom_filter_build_audit",
    oracle=f"""
    WITH keys AS (SELECT DISTINCT md5(text) AS fp FROM documents),
    bits AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || fp), 1, 8))
                  AS BIGINT) % {BLOOM_M} AS bit
      FROM keys, range({BLOOM_K}) t(j)
    )
    SELECT (SELECT count(*) FROM keys)  AS n_keys,
           (SELECT count(*) FROM bits)  AS n_bits_set,
           {BLOOM_M}                    AS m_bits,
           {BLOOM_K}                    AS k_hashes,
           round(pow((SELECT count(*) FROM bits) / CAST({BLOOM_M} AS DOUBLE),
                     {BLOOM_K}), 6)     AS fp_rate_est
    """,
)
def bloom_filter_build_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter construction audit (Bloom 1970 — the membership
    sketch under benchmark decontamination and anti-join pre-filters
    at 100 TB, where shipping a few KB of bits replaces shuffling a
    key column): hash every distinct document fingerprint through
    BLOOM_K md5-derived hash functions into BLOOM_M bits, and report
    the exact bit occupancy plus the classic (n_set/m)^k false-
    positive estimate — the number that says whether the filter is
    sized right BEFORE it gates a corpus-wide join. Deterministic
    hashes make the whole structure exactly oracle-checkable.

    Scale: fingerprints collapse via hash-distinct (map-side partial
    dedup), the k-way fan-out explodes the already-deduped key set,
    and the bit set is a second distinct over ≤ m integers — the
    filter itself is m bits, broadcastable by construction. One row
    out.
    """
    d = load_table(spark, sf_dir, "documents")
    keys = (
        d.repartition(data_width(spark, sf_dir, "documents"))
        .select(F.md5("text").alias("fp"))
        .distinct()
    )
    keys = scoped_persist(keys)
    js = F.explode(F.array(*[F.lit(j) for j in range(BLOOM_K)])).alias("j")
    bits = (
        keys.select("fp", js)
        .select(
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("j").cast("string"), F.lit(":"), F.col("fp"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % BLOOM_M
            ).alias("bit")
        )
        .distinct()
    )
    n_keys = keys.agg(F.count("*").alias("n_keys"))
    n_bits = bits.agg(F.count("*").alias("n_bits_set"))
    return (
        n_keys.crossJoin(n_bits)
        .select(
            "n_keys",
            "n_bits_set",
            F.lit(BLOOM_M).cast("int").alias("m_bits"),
            F.lit(BLOOM_K).cast("int").alias("k_hashes"),
            F.round(
                F.pow(F.col("n_bits_set") / F.lit(float(BLOOM_M)), F.lit(BLOOM_K)),
                6,
            ).alias("fp_rate_est"),
        )
    )


KS_A, KS_B = "src0", "src1"
CHI2_TOP_K = 20
CHI2_MIN_COUNT = 5  # classic chi-square validity floor per cell probe


@query(
    "chi2_term_keyness",
    oracle=f"""
    WITH tc AS (
      SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    st AS (SELECT source, term, count(*) AS a FROM tc GROUP BY source, term),
    src_tot AS (SELECT source, CAST(sum(a) AS BIGINT) AS ts FROM st GROUP BY source),
    term_tot AS (SELECT term, CAST(sum(a) AS BIGINT) AS tt FROM st GROUP BY term),
    n AS (SELECT CAST(sum(a) AS BIGINT) AS n FROM st),
    cells AS (
      SELECT st.source, st.term, st.a,
             src_tot.ts - st.a AS b,
             term_tot.tt - st.a AS c,
             n.n - src_tot.ts - term_tot.tt + st.a AS d,
             n.n AS n
      FROM st
      JOIN src_tot USING (source)
      JOIN term_tot USING (term)
      CROSS JOIN n
    )
    SELECT source, term, a, b, c, d,
           round(CAST(n AS DOUBLE)
                 * CAST(a * d - b * c AS DOUBLE)
                 * CAST(a * d - b * c AS DOUBLE)
                 / ((a + b) * (c + d))
                 / ((a + c) * (b + d)), 4) AS chi2
    FROM cells
    WHERE a >= {CHI2_MIN_COUNT}
    ORDER BY chi2 DESC, term, source
    LIMIT {CHI2_TOP_K}
    """,
)
def chi2_term_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square keyness (Dunning/Rayson corpus-linguistics staple —
    which terms are statistically OVER-represented in one source vs
    the rest): per (source, term), the 2×2 contingency cells a/b/c/d
    and χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)), top-CHI2_TOP_K.
    High-χ² terms are domain markers — the evidence a mixture
    re-weighting or a domain-classifier feature list reads. The
    contingency cells stay INTEGER; χ² is computed with one fixed
    parenthesization (cast-to-double of N and (ad−bc), two integer
    denominator products) so both engines produce the identical
    double, and a ≥ CHI2_MIN_COUNT applies the classic small-cell
    validity floor.

    Scale: one word-count shuffle to (source, term); source totals
    are a |sources|-row broadcast, term totals reduce the count
    table itself; everything after is a projection; top-k is a
    per-partition heap. The integer cell products fit comfortably in
    longs at audit scale; re-scale (per-million counts) before the
    cast if N·ad exceeds 2⁶³ on a full corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    st = (
        d.repartition(data_width(spark, sf_dir, "documents"))
        .select("source", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("a"))
    )
    st = scoped_persist(st)
    src_tot = st.groupBy("source").agg(F.sum("a").alias("ts"))
    term_tot = st.groupBy("term").agg(F.sum("a").alias("tt"))
    n = st.agg(F.sum("a").alias("n"))
    cells = (
        st.join(F.broadcast(src_tot), "source")
        .join(term_tot, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "term",
            "a",
            (F.col("ts") - F.col("a")).alias("b"),
            (F.col("tt") - F.col("a")).alias("c"),
            (F.col("n") - F.col("ts") - F.col("tt") + F.col("a")).alias("d"),
            "n",
        )
    )
    dd = (F.col("a") * F.col("d") - F.col("b") * F.col("c")).cast("double")
    chi2 = F.round(
        F.col("n").cast("double")
        * dd
        * dd
        / ((F.col("a") + F.col("b")) * (F.col("c") + F.col("d")))
        / ((F.col("a") + F.col("c")) * (F.col("b") + F.col("d"))),
        4,
    )
    return (
        cells.filter(F.col("a") >= CHI2_MIN_COUNT)
        .select("source", "term", "a", "b", "c", "d", chi2.alias("chi2"))
        .orderBy(F.col("chi2").desc(), "term", "source")
        .limit(CHI2_TOP_K)
    )


@query(
    "mannwhitney_drift_doclen",
    oracle=f"""
    WITH a AS (
      SELECT n_chars AS v, count(*) AS ca FROM documents
      WHERE source = '{KS_A}' GROUP BY n_chars
    ),
    b AS (
      SELECT n_chars AS v, count(*) AS cb FROM documents
      WHERE source = '{KS_B}' GROUP BY n_chars
    ),
    merged AS (
      SELECT coalesce(a.v, b.v) AS v,
             coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
      FROM a FULL OUTER JOIN b ON a.v = b.v
    ),
    cum AS (
      SELECT v, ca, cb,
             sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS prev_a,
             sum(ca) OVER () AS ta, sum(cb) OVER () AS tb
      FROM merged
    )
    SELECT CAST(sum(cb * (2 * coalesce(prev_a, 0) + ca)) AS BIGINT)
                                            AS u2_statistic,
           CAST(min(ta) AS BIGINT)          AS n_a,
           CAST(min(tb) AS BIGINT)          AS n_b,
           round(sum(cb * (2 * coalesce(prev_a, 0) + ca))
                 / CAST(2 * min(ta) * min(tb) AS DOUBLE), 6)
                                            AS auc
    FROM cum
    """,
)
def mannwhitney_drift_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U between two sources' document-length
    distributions — the rank-sum drift test that complements
    ``ks_drift_doclen``: KS finds the largest LOCAL gap, U measures
    the global stochastic ordering (its normalization U/(n_a·n_b) is
    exactly the AUC "probability a random B doc is longer than a
    random A doc", ties counted half). INTEGER-EXACT via the
    doubled statistic: U2 = Σ_v c_b(v)·(2·|A < v| + c_a(v)) sums the
    per-value win/tie census in integers; only the final AUC display
    is a rounded double.

    Scale: identical shape to the KS entry — per-source histograms
    via hash aggregate, one window over the merged SUPPORT (value
    domain, not row count), one row out.
    """
    d = load_table(spark, sf_dir, "documents")
    a = (
        d.filter(F.col("source") == KS_A)
        .groupBy(F.col("n_chars").alias("v"))
        .agg(F.count("*").alias("ca"))
    )
    b = (
        d.filter(F.col("source") == KS_B)
        .groupBy(F.col("n_chars").alias("v"))
        .agg(F.count("*").alias("cb"))
    )
    merged = a.join(b, "v", "full_outer").select(
        "v",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    wp = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    wt = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = merged.select(
        "ca",
        "cb",
        F.coalesce(F.sum("ca").over(wp), F.lit(0)).alias("prev_a"),
        F.sum("ca").over(wt).alias("ta"),
        F.sum("cb").over(wt).alias("tb"),
    )
    u2 = F.sum(F.col("cb") * (2 * F.col("prev_a") + F.col("ca")))
    return cum.agg(
        u2.alias("u2_statistic"),
        F.min("ta").alias("n_a"),
        F.min("tb").alias("n_b"),
        F.round(
            u2 / (F.lit(2) * F.min("ta") * F.min("tb")).cast("double"), 6
        ).alias("auc"),
    )


@query(
    "cms_join_size_audit",
    oracle=f"""
    WITH ca AS (SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1),
    cb AS (SELECT c_custkey AS k, count(*) AS c FROM customer GROUP BY 1),
    cells_a AS (
      SELECT r,
             CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 8))
                  AS BIGINT) % {CMS_WIDTH} AS col,
             CAST(sum(c) AS BIGINT) AS ctr
      FROM ca CROSS JOIN range({CMS_DEPTH}) t(r) GROUP BY 1, 2
    ),
    cells_b AS (
      SELECT r,
             CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 8))
                  AS BIGINT) % {CMS_WIDTH} AS col,
             CAST(sum(c) AS BIGINT) AS ctr
      FROM cb CROSS JOIN range({CMS_DEPTH}) t(r) GROUP BY 1, 2
    ),
    per_row AS (
      SELECT cells_a.r, CAST(sum(cells_a.ctr * cells_b.ctr) AS BIGINT) AS est
      FROM cells_a JOIN cells_b USING (r, col)
      GROUP BY cells_a.r
    ),
    actual AS (
      SELECT CAST(sum(ca.c * cb.c) AS BIGINT) AS n
      FROM ca JOIN cb USING (k)
    )
    SELECT (SELECT min(est) FROM per_row)              AS estimated_join_size,
           (SELECT n FROM actual)                      AS actual_join_size,
           (SELECT min(est) FROM per_row)
             - (SELECT n FROM actual)                  AS overestimate
    """,
)
def cms_join_size_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based JOIN-SIZE estimation audit (the AGMS/CMS inner-
    product estimator behind cost-based join ordering: |A ⋈ B| =
    Σ_k c_A(k)·c_B(k), estimated as min over sketch rows of the
    sketch inner product — Cormode & Muthukrishnan 2005, §4.2).
    Both sides' key histograms are sketched into {CMS_DEPTH}×
    {CMS_WIDTH} counters with the SAME hash family; the estimate is
    provably ≥ the true size (collisions only add), and the audit
    reports estimate, exact size, and the gap — the number that says
    whether a W-wide sketch is enough to order YOUR joins.
    Deterministic md5 hashes make the whole estimator exactly
    oracle-checkable.

    Scale: each side collapses to its key histogram (hash agg,
    map-side combine), sketches are ≤ D·W rows each — the inner
    product is a join of two 1024-row tables, broadcastable; the
    exact size is a count-table join, never a row-level join. This
    is precisely how a planner estimates a join it cannot afford to
    run.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    ca = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").alias("c")
    )
    cb = customer.groupBy(F.col("c_custkey").alias("k")).agg(
        F.count("*").alias("c")
    )
    ca, cb = scoped_persist(ca), scoped_persist(cb)
    rows = F.explode(F.array(*[F.lit(r) for r in range(CMS_DEPTH)])).alias("r")

    def sketch(counts):
        return (
            counts.select("k", "c", rows)
            .select(
                "r",
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.col("r").cast("string"),
                                    F.lit(":"),
                                    F.col("k").cast("string"),
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % CMS_WIDTH
                ).alias("col"),
                "c",
            )
            .groupBy("r", "col")
            .agg(F.sum("c").alias("ctr"))
        )
    per_row = (
        sketch(ca)
        .join(sketch(cb).withColumnRenamed("ctr", "ctr_b"), ["r", "col"])
        .groupBy("r")
        .agg(F.sum(F.col("ctr") * F.col("ctr_b")).alias("est"))
        .agg(F.min("est").alias("estimated_join_size"))
    )
    actual = (
        ca.join(cb.withColumnRenamed("c", "c_b"), "k")
        .agg(F.sum(F.col("c") * F.col("c_b")).alias("actual_join_size"))
    )
    return per_row.crossJoin(F.broadcast(actual)).select(
        "estimated_join_size",
        "actual_join_size",
        (F.col("estimated_join_size") - F.col("actual_join_size")).alias(
            "overestimate"
        ),
    )


# Robust-outlier census: discrete medians (element at rank ⌈n/2⌉, the
# percentile_stats argument — interpolated medians differ in the last
# ulp between engines; a data value cannot), then the classic
# |x − median| > 3·MAD robust z-score gate (Hampel identifier,
# public knowledge; the robust alternative to mean±3σ, which a single
# extreme order can drag arbitrarily).
MAD_SQL = """
    WITH ranked AS (
      SELECT o_orderstatus, o_totalprice,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice, o_orderkey) AS rp,
             count(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM orders
    ),
    med AS (
      SELECT o_orderstatus,
             max(CASE WHEN rp = CAST(ceil(0.5 * n) AS BIGINT)
                      THEN o_totalprice END) AS med
      FROM ranked GROUP BY o_orderstatus
    ),
    dev AS (
      SELECT o.o_orderstatus, o.o_orderkey,
             abs(o.o_totalprice - m.med) AS adev, m.med AS med
      FROM orders o JOIN med m ON o.o_orderstatus = m.o_orderstatus
    ),
    devranked AS (
      SELECT o_orderstatus, adev, med,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY adev, o_orderkey) AS rp,
             count(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM dev
    ),
    mad AS (
      SELECT o_orderstatus, max(med) AS med,
             max(CASE WHEN rp = CAST(ceil(0.5 * n) AS BIGINT)
                      THEN adev END) AS mad
      FROM devranked GROUP BY o_orderstatus
    )
    SELECT d.o_orderstatus,
           CAST(count(*) AS BIGINT)     AS n_orders,
           round(max(m.med), 2)         AS median_price,
           round(max(m.mad), 2)         AS mad,
           CAST(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT)              AS n_outliers,
           round(CAST(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS outlier_rate
    FROM dev d JOIN mad m ON d.o_orderstatus = m.o_orderstatus
    GROUP BY d.o_orderstatus
"""


@query("mad_outlier_census", oracle=MAD_SQL)
def mad_outlier_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier census per order status —
    the robust anomaly gate (|x − med| > 3·MAD) a pipeline runs on
    value columns where a handful of corrupt rows would poison a
    mean/stddev gate. Same ANSI text in both lanes (R17 passthrough);
    medians are DISCRETE ranks so every compared quantity is an
    actual data value and the 3·MAD comparison is a single IEEE
    product on both engines.

    Scale note: the two rank windows sort each status partition —
    exact-rank medians kept for the oracle; the 100 TB substitution
    is ``approx_percentile(0.5)`` (t-digest, mergeable map-side) for
    both median and MAD, same downstream comparison.
    """
    register_views(spark, sf_dir)
    return spark.sql(MAD_SQL)


# Benford's-law expected first-digit shares log10(1 + 1/d), inlined as
# literals so both lanes share identical constants (no engine log10).
_BENFORD = {
    1: 0.30103, 2: 0.176091, 3: 0.124939, 4: 0.09691, 5: 0.079181,
    6: 0.066947, 7: 0.057992, 8: 0.051153, 9: 0.045757,
}
_BENFORD_SQL_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {e!r}" for d, e in _BENFORD.items()
) + " END"


@query(
    "benford_first_digit_audit",
    oracle=f"""
    WITH cents AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
      FROM orders WHERE o_totalprice > 0
    ),
    digits AS (
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM cents
    ),
    obs AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n_orders FROM digits GROUP BY digit
    ),
    tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS n FROM obs)
    SELECT digit, n_orders,
           round(CAST(n_orders AS DOUBLE) / tot.n, 6)      AS observed_share,
           {_BENFORD_SQL_CASE}                             AS benford_share,
           round((n_orders - ({_BENFORD_SQL_CASE}) * tot.n)
                 * (n_orders - ({_BENFORD_SQL_CASE}) * tot.n)
                 / (({_BENFORD_SQL_CASE}) * tot.n), 6)     AS chi2_term
    FROM obs CROSS JOIN tot
    ORDER BY digit
    """,
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit over order totals —
    the classic data-quality / fabrication screen (Benford 1938,
    Nigrini's forensic-accounting use): natural multi-scale amounts
    follow P(d) = log10(1 + 1/d); synthetic, truncated, or fabricated
    columns don't, and the per-digit χ² terms localize the deviation.
    A pipeline runs this on money-like and count-like columns as an
    ingest sanity gate.

    Engine-exactness: the value is first made INTEGER CENTS with
    ``floor(x·100 + 0.5)`` (DuckDB CAST rounds while Spark's
    truncates, so neither engine's double→int cast is used); the
    leading digit is then the first character of the integer's decimal
    string — identical strings on both engines. Benford shares are
    inlined literals, so the χ² arithmetic sees identical doubles.

    Scale: scan → per-row digit projection → one 9-group hash
    aggregate with map-side partials; the grand total attaches as a
    one-row broadcast. Word-count shape, no window, no join.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("long")
    obs = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n_orders")
    )
    tot = obs.agg(F.sum("n_orders").alias("n"))
    benford = F.create_map(
        *[F.lit(x) for kv in _BENFORD.items() for x in kv]
    )[F.col("digit")]
    exp_n = benford * F.col("n")
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_orders",
            F.round(F.col("n_orders").cast("double") / F.col("n"), 6).alias(
                "observed_share"
            ),
            benford.alias("benford_share"),
            F.round(
                (F.col("n_orders") - exp_n) * (F.col("n_orders") - exp_n) / exp_n, 6
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


@query(
    "burstiness_fano_census",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, day
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS ss
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n_days, s AS n_events,
           round(CAST(s AS DOUBLE) / n_days, 6) AS mean_daily,
           round(CAST(n_days * ss - s * s AS DOUBLE) / (n_days * s), 6)
             AS fano_factor
    FROM m
    ORDER BY event_type
    """,
)
def burstiness_fano_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean ratio, population form) of the
    DAILY event-count series per event type — the burstiness dial for
    stream capacity planning: a Poisson arrival process sits at 1;
    campaign-driven or incident-driven types sit far above, and that
    ratio is what sizes shuffle-partition headroom and watermark
    buffers for the streaming lane.

    Exactness: Var/Mean = (n·Σc² − (Σc)²)/(n·Σc) — every term an
    exact integer; ONE division, rounded once (the winsorized_stats /
    moment_stats cross-multiplication idiom, no float accumulation).

    Scale: two stacked hash aggregates (day grid, then |types| rows),
    both map-side combined; nothing else moves.
    """
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("c"))
    )
    m = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    return m.select(
        "event_type",
        "n_days",
        F.col("s").alias("n_events"),
        F.round(F.col("s").cast("double") / F.col("n_days"), 6).alias("mean_daily"),
        F.round(
            (F.col("n_days") * F.col("ss") - F.col("s") * F.col("s")).cast("double")
            / (F.col("n_days") * F.col("s")),
            6,
        ).alias("fano_factor"),
    ).orderBy("event_type")


@query(
    "jackknife_source_sensitivity",
    oracle="""
    WITH per AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_s,
             CAST(sum(n_chars) AS BIGINT) AS t_s
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(n_s) AS BIGINT) AS n, CAST(sum(t_s) AS BIGINT) AS t
      FROM per
    )
    SELECT source, n_s AS n_docs,
           round(CAST(t AS DOUBLE) / n, 6) AS mean_all,
           round(CAST(t - t_s AS DOUBLE) / (n - n_s), 6) AS mean_without,
           round(CAST(t - t_s AS DOUBLE) / (n - n_s)
                 - CAST(t AS DOUBLE) / n, 6) AS jackknife_delta
    FROM per CROSS JOIN tot
    ORDER BY source
    """,
)
def jackknife_source_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-SOURCE-out jackknife of mean document length — the
    deterministic influence audit (Quenouille/Tukey jackknife over
    groups): how much would the corpus statistic move if a whole
    source were dropped? Large |delta| flags sources that dominate a
    metric — the first question when a mixture change shifts an eval.
    Group-level jackknife needs no resampling RNG, so it is exactly
    reproducible — the bootstrap's auditable sibling.

    Exactness: leave-out means are ratios of exact integer sums
    ((T−T_s)/(N−N_s)); each output is one division, rounded once.

    Scale: one |sources|-group aggregate; the grand total attaches as
    a one-row broadcast. The corpus is scanned ONCE.
    """
    d = load_table(spark, sf_dir, "documents")
    # per feeds TWO consumers (the output rows and the grand total):
    # persist so the corpus scans once, not once per consumer.
    per = scoped_persist(
        d.groupBy("source").agg(
            F.count("*").alias("n_s"), F.sum("n_chars").alias("t_s")
        )
    )
    tot = per.agg(F.sum("n_s").alias("n"), F.sum("t_s").alias("t"))
    mean_all = F.col("t").cast("double") / F.col("n")
    mean_wo = (F.col("t") - F.col("t_s")).cast("double") / (
        F.col("n") - F.col("n_s")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_s").alias("n_docs"),
            F.round(mean_all, 6).alias("mean_all"),
            F.round(mean_wo, 6).alias("mean_without"),
            F.round(mean_wo - mean_all, 6).alias("jackknife_delta"),
        )
        .orderBy("source")
    )


@query(
    "gini_source_concentration",
    oracle="""
    WITH per AS (
      SELECT source, CAST(sum(n_chars) AS BIGINT) AS x
      FROM documents GROUP BY source
    ),
    ranked AS (
      SELECT x, row_number() OVER (ORDER BY x, source) AS i,
             count(*) OVER () AS n,
             CAST(sum(x) OVER () AS BIGINT) AS t
      FROM per
    )
    SELECT CAST(max(n) AS BIGINT) AS n_sources,
           CAST(max(t) AS BIGINT) AS total_chars,
           round(CAST(2 * sum(i * x) AS DOUBLE) / (max(n) * max(t))
                 - CAST(max(n) + 1 AS DOUBLE) / max(n), 6) AS gini
    FROM ranked
    """,
)
def gini_source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of character mass across sources — the
    corpus-concentration dial (Lorenz 1905/Gini 1912, the
    data-governance twin of domain_mixture_weights): 0 = every source
    contributes equally, →1 = one source dominates. High concentration
    is what temperature sampling and per-source caps exist to fix;
    this is the single number that says whether you need them.

    Exactness: G = 2·Σ(i·xᵢ)/(n·T) − (n+1)/n over ranks of the
    ascending sort — Σ(i·x) is an exact integer sum; one division
    pair, rounded once.

    Scale: one |sources|-group aggregate; the rank window runs over
    the SOURCE table (handfuls of rows), never documents.
    """
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(F.sum("n_chars").alias("x"))
    w = Window.orderBy("x", "source")
    ranked = per.select(
        "x",
        F.row_number().over(w).alias("i"),
        F.count("*").over(Window.partitionBy()).alias("n"),
        F.sum("x").over(Window.partitionBy()).alias("t"),
    )
    return ranked.agg(
        F.max("n").cast("long").alias("n_sources"),
        F.max("t").cast("long").alias("total_chars"),
        F.round(
            (2 * F.sum(F.col("i") * F.col("x"))).cast("double")
            / (F.max("n") * F.max("t"))
            - (F.max("n") + 1).cast("double") / F.max("n"),
            6,
        ).alias("gini"),
    )


EQD_BUCKETS = 8  # equi-depth histogram bucket count


@query(
    "equidepth_histogram_bounds",
    oracle=f"""
    WITH ranked AS (
      SELECT o_totalprice,
             row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rp,
             count(*) OVER () AS n
      FROM orders
    ),
    bounds AS (
      SELECT CAST(ceil(CAST(rp AS DOUBLE) * {EQD_BUCKETS} / n) AS BIGINT)
               AS bucket,
             o_totalprice
      FROM ranked
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(o_totalprice) AS lower_bound,
           max(o_totalprice) AS upper_bound
    FROM bounds
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def equidepth_histogram_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equi-height) histogram of order totals — THE
    optimizer statistic behind selectivity estimation (Piatetsky-
    Shapiro & Connell 1984; what ANALYZE ... FOR COLUMNS builds):
    {EQD_BUCKETS} buckets of equal row count with their value
    boundaries. Skew moves the BOUNDS, not the counts — exactly why
    equi-depth beats equi-width for range-predicate estimates, and
    the artifact describe_stats() would feed a cost model.

    Exactness: bucket of rank r is ⌈r·B/n⌉ under a total order
    (deterministic tie-break), so boundaries are actual data values —
    engine-identical.

    Scale note: the rank window is a global sort — exact bounds kept
    for the oracle; the 100 TB substitution is approx_percentile's
    t-digest at the same B cut points, same downstream shape.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    ranked = o.select(
        "o_totalprice",
        F.row_number().over(w).alias("rp"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    bucket = F.ceil(
        F.col("rp").cast("double") * EQD_BUCKETS / F.col("n")
    ).cast("long")
    return (
        ranked.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_totalprice").alias("lower_bound"),
            F.max("o_totalprice").alias("upper_bound"),
        )
        .orderBy("bucket")
    )


@query(
    "mutual_information_audit",
    oracle="""
    WITH cell AS (
      SELECT o_orderpriority AS a, o_orderstatus AS b,
             CAST(count(*) AS BIGINT) AS c
      FROM orders GROUP BY 1, 2
    ),
    terms AS (
      SELECT a, b, c,
             CAST(sum(c) OVER (PARTITION BY a) AS BIGINT) AS ca,
             CAST(sum(c) OVER (PARTITION BY b) AS BIGINT) AS cb,
             CAST(sum(c) OVER () AS BIGINT) AS n
      FROM cell
    )
    SELECT CAST(max(n) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_cells,
           round(CAST(sum(CAST(round(1000000 * c * ln(
                   (CAST(c AS DOUBLE) * n) / (CAST(ca AS DOUBLE) * cb)
                 )) AS BIGINT)) AS DOUBLE) / 1000000 / max(n), 6)
             AS mi_nats
    FROM terms
    """,
)
def mutual_information_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(priority; status) from the exact
    contingency table — the feature-selection / leakage screen
    (Cover & Thomas; what MI-based filters and the G-test both reduce
    to): near 0 nats means the columns are independent (dropping one
    costs nothing, joining on both wins nothing); large MI on a
    (feature, label) pair before a split is the classic
    target-leakage alarm. Σ p(a,b)·ln(p(a,b)/(p(a)p(b))).

    Exactness: each cell's c·ln(cN/(c_a·c_b)) quantizes to integer
    micro-nats once (the source_kl_divergence idiom — marginals are
    window sums over the CELL table, all integers); the reduce is an
    integer sum; one division, rounded once.

    Scale: one |A|×|B|-group hash aggregate with map-side partials;
    every window runs over the contingency CELLS (dozens of rows),
    never the fact table.
    """
    o = load_table(spark, sf_dir, "orders")
    cell = o.groupBy(
        F.col("o_orderpriority").alias("a"), F.col("o_orderstatus").alias("b")
    ).agg(F.count("*").alias("c"))
    wa, wb, wall = (
        Window.partitionBy("a"),
        Window.partitionBy("b"),
        Window.partitionBy(),
    )
    terms = cell.select(
        "c",
        F.sum("c").over(wall).alias("n"),
        F.round(
            1_000_000
            * F.col("c")
            * F.log(
                (F.col("c").cast("double") * F.sum("c").over(wall))
                / (
                    F.sum("c").over(wa).cast("double")
                    * F.sum("c").over(wb)
                )
            )
        )
        .cast("long")
        .alias("mi_micro"),
    )
    return terms.agg(
        F.max("n").cast("long").alias("n_rows"),
        F.count("*").alias("n_cells"),
        F.round(
            F.sum("mi_micro").cast("double") / 1_000_000 / F.max("n"), 6
        ).alias("mi_nats"),
    )


@query(
    "abtest_two_proportion_z",
    oracle="""
    WITH assign AS (
      SELECT user_id, user_id % 2 = 0 AS in_a,
             CAST(CASE WHEN
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             THEN 1 ELSE 0 END AS BIGINT) AS converted
      FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN in_a THEN converted ELSE 0 END) AS BIGINT) AS x_a,
             CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN in_a THEN 0 ELSE converted END) AS BIGINT) AS x_b
      FROM assign
    )
    SELECT n_a, x_a, n_b, x_b,
           round(CAST(x_a AS DOUBLE) / n_a, 6) AS p_a,
           round(CAST(x_b AS DOUBLE) / n_b, 6) AS p_b,
           round((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
                 / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                        * (1 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 6) AS z_stat
    FROM cells
    """,
)
def abtest_two_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion pooled z-test — THE A/B-test readout (the
    two-sample binomial z with pooled variance every experimentation
    platform reports): per-user conversion (any purchase) under a
    deterministic 50/50 assignment (user_id parity — the hash-bucket
    stand-in for a real experiment key), reduced to the four counts
    and the z statistic. |z| > 1.96 is the classic 95% call; on
    parity-assigned synthetic data it should hover near 0 — which is
    exactly the A/A-test sanity check experimentation platforms run.

    Exactness: all four cells are integer sums (conversion is one
    integer comparison per user); ONE float
    expression forms the z on identical doubles, rounded once.

    Scale: one user-keyed aggregate (partial max) then a single
    4-counter global sum. Nothing else moves.
    """
    e = load_table(spark, sf_dir, "events")
    assign = (
        e.groupBy("user_id")
        .agg(
            (
                F.sum((F.col("event_type") == "purchase").cast("int"))
                > F.sum((F.col("event_type") == "view").cast("int"))
            )
            .cast("long")
            .alias("converted")
        )
        .select((F.col("user_id") % 2 == 0).alias("in_a"), "converted")
    )
    cells = assign.agg(
        F.sum(F.col("in_a").cast("int")).cast("long").alias("n_a"),
        F.sum(F.when(F.col("in_a"), F.col("converted")).otherwise(0))
        .cast("long")
        .alias("x_a"),
        F.sum((~F.col("in_a")).cast("int")).cast("long").alias("n_b"),
        F.sum(F.when(~F.col("in_a"), F.col("converted")).otherwise(0))
        .cast("long")
        .alias("x_b"),
    )
    pa = F.col("x_a").cast("double") / F.col("n_a")
    pb = F.col("x_b").cast("double") / F.col("n_b")
    pool = (F.col("x_a") + F.col("x_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (pa - pb) / F.sqrt(
        pool * (1 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return cells.select(
        "n_a", "x_a", "n_b", "x_b",
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        F.round(z, 6).alias("z_stat"),
    )


@query(
    "theil_sen_trend",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY day
    ),
    idx AS (
      SELECT c, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
      FROM daily
    ),
    slopes AS (
      SELECT CAST(round(1000000.0 * (b.c - a.c) / (b.i - a.i)) AS BIGINT)
               AS s_micro
      FROM idx a JOIN idx b ON b.i > a.i
    ),
    ranked AS (
      SELECT s_micro,
             row_number() OVER (ORDER BY s_micro) AS rp,
             count(*) OVER () AS n
      FROM slopes
    )
    SELECT CAST(max(n) AS BIGINT) AS n_pairs,
           round(CAST(max(CASE WHEN rp = CAST(ceil(0.5 * n) AS BIGINT)
                              THEN s_micro END) AS DOUBLE) / 1000000, 6)
             AS slope_per_day,
           CAST(min(s_micro) AS BIGINT) AS min_slope_micro,
           CAST(max(s_micro) AS BIGINT) AS max_slope_micro
    FROM ranked
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of the daily event-count series: the
    MEDIAN of all pairwise slopes (Theil 1950/Sen 1968) — the trend
    estimator a single outlier day cannot drag (OLS's breakdown point
    is one bad point; Theil-Sen tolerates ~29%). The slope the
    capacity planner trusts when incident days pollute the series;
    complements regression_price_qty's parametric OLS and
    cusum_changepoint_scan's level-shift view.

    Exactness: each pairwise slope Δc/Δi quantizes to integer MICRO
    units once (one division of exact integers, identically rounded
    in both engines); the median is the DISCRETE rank ⌈n/2⌉ element,
    so the reported slope is an actual pairwise value.

    Scale: pairwise slopes are |days|²/2 over the TINY daily table
    (one partial-aggregated count upstream) — at a year of days that
    is ~66k pairs, nothing. The event stream itself is touched once.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("c")
    )
    idx = daily.select(
        "c", F.row_number().over(Window.orderBy("day")).cast("long").alias("i")
    )
    idx = scoped_persist(idx)
    a = idx.select(F.col("c").alias("ca"), F.col("i").alias("ia"))
    b = idx.select(F.col("c").alias("cb"), F.col("i").alias("ib"))
    slopes = (
        a.join(b, F.col("ib") > F.col("ia"))
        .select(
            F.round(
                F.lit(1_000_000.0)
                * (F.col("cb") - F.col("ca"))
                / (F.col("ib") - F.col("ia"))
            )
            .cast("long")
            .alias("s_micro")
        )
    )
    w = Window.orderBy("s_micro")
    ranked = slopes.select(
        "s_micro",
        F.row_number().over(w).alias("rp"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    return ranked.agg(
        F.max("n").cast("long").alias("n_pairs"),
        F.round(
            F.max(
                F.when(
                    F.col("rp") == F.ceil(F.lit(0.5) * F.col("n")).cast("long"),
                    F.col("s_micro"),
                )
            ).cast("double")
            / 1_000_000,
            6,
        ).alias("slope_per_day"),
        F.min("s_micro").cast("long").alias("min_slope_micro"),
        F.max("s_micro").cast("long").alias("max_slope_micro"),
    )


@query(
    "shrunk_rate_estimates",
    oracle="""
    WITH per AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN value >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS x
      FROM events GROUP BY event_type
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS g,
             CAST(sum(CAST(round(1000000.0 * x / n) AS BIGINT)) AS DOUBLE)
               / count(*) / 1000000 AS mu,
             CAST(sum(CAST(round(1000000.0 * x / n) AS BIGINT)
                    * CAST(round(1000000.0 * x / n) AS BIGINT)) AS DOUBLE)
               / count(*) / 1e12 AS m2
      FROM per
    ),
    prior AS (
      SELECT mu,
             CASE WHEN m2 - mu * mu > 0
                  THEN mu * (1 - mu) / (m2 - mu * mu) - 1
                  ELSE 100.0 END AS k
      FROM mom
    )
    SELECT event_type, n, x,
           round(CAST(x AS DOUBLE) / n, 6) AS raw_rate,
           round((x + prior.mu * GREATEST(prior.k, 0))
                 / (n + GREATEST(prior.k, 0)), 6) AS shrunk_rate
    FROM per CROSS JOIN prior
    ORDER BY event_type
    """,
)
def shrunk_rate_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes (beta-binomial) shrinkage of per-group rates —
    the James-Stein-flavored estimator behind every 'adjusted rating'
    column (Robinson's baseball-averages exposition; what you publish
    instead of raw rates when group sizes differ wildly): the
    high-value-event rate per event type, shrunk toward the grand
    mean with strength k from the method-of-moments prior
    k = μ(1−μ)/Var(p) − 1. Small groups move a lot, big groups barely
    — exactly the behavior a per-source quality dashboard needs.

    Exactness: the cells (x, n) are exact integers; μ, Var, k, and
    each shrunk rate are ONE deterministic double expression over
    those integers evaluated identically in both engines (group count
    is tiny and the mean-of-rates is summed over the same ordered
    aggregation in both lanes — |groups| = 5 here, associativity-safe
    at this width), rounded once per output.

    Scale: one |types|-group aggregate with partial combine; the
    prior is a one-row broadcast over the group table.
    """
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum((F.col("value") >= 50).cast("int")).cast("long").alias("x"),
    )
    per = scoped_persist(per)
    # Per-group rates quantize to integer MICRO units BEFORE the
    # prior's sums, so mu/m2 are ratios of exact integers — float
    # accumulation order can never shift the prior between engines.
    pq = F.round(F.lit(1_000_000.0) * F.col("x") / F.col("n")).cast("long")
    mom = per.agg(
        F.count("*").alias("g"),
        (F.sum(pq).cast("double") / F.count("*") / 1_000_000).alias("mu"),
        (F.sum(pq * pq).cast("double") / F.count("*") / 1e12).alias("m2"),
    )
    k = F.when(
        F.col("m2") - F.col("mu") * F.col("mu") > 0,
        F.col("mu") * (1 - F.col("mu")) / (F.col("m2") - F.col("mu") * F.col("mu"))
        - 1,
    ).otherwise(F.lit(100.0))
    prior = mom.select("mu", k.alias("k"))
    kpos = F.greatest(F.col("k"), F.lit(0.0))
    return (
        per.crossJoin(F.broadcast(prior))
        .select(
            "event_type",
            "n",
            "x",
            F.round(F.col("x").cast("double") / F.col("n"), 6).alias("raw_rate"),
            F.round(
                (F.col("x") + F.col("mu") * kpos) / (F.col("n") + kpos), 6
            ).alias("shrunk_rate"),
        )
        .orderBy("event_type")
    )


PSI_BINS = 10  # decile bins from the reference (train) distribution


@query(
    "psi_drift_audit",
    oracle=f"""
    WITH lab AS (
      SELECT n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 100 < 80 AS is_ref
      FROM documents
    ),
    ranked AS (
      SELECT n_chars,
             CAST(ceil(CAST(row_number() OVER (ORDER BY n_chars) AS DOUBLE)
                  * {PSI_BINS} / count(*) OVER ()) AS BIGINT) AS b
      FROM lab WHERE is_ref
    ),
    edges AS (
      SELECT b, max(n_chars) AS hi FROM ranked WHERE b < {PSI_BINS}
      GROUP BY b
    ),
    per_val AS (
      SELECT is_ref, n_chars, CAST(count(*) AS BIGINT) AS rows_n
      FROM lab GROUP BY is_ref, n_chars
    ),
    val_bin AS (
      SELECT p.is_ref, p.rows_n,
             CAST(coalesce(min(e.b), {PSI_BINS}) AS BIGINT) AS bin
      FROM per_val p LEFT JOIN edges e ON p.n_chars <= e.hi
      GROUP BY p.is_ref, p.n_chars, p.rows_n
    ),
    cells AS (
      SELECT bin,
             CAST(sum(CASE WHEN is_ref THEN rows_n ELSE 0 END) AS BIGINT) AS rc,
             CAST(sum(CASE WHEN is_ref THEN 0 ELSE rows_n END) AS BIGINT) AS cc
      FROM val_bin GROUP BY bin
    ),
    tot AS (
      SELECT CAST(sum(rc) AS BIGINT) AS rn, CAST(sum(cc) AS BIGINT) AS cn
      FROM cells
    ),
    terms AS (
      SELECT bin, rc, cc,
             CAST(round(1000000000.0
               * (CAST(rc AS DOUBLE) / tot.rn - CAST(cc AS DOUBLE) / tot.cn)
               * ln((CAST(GREATEST(rc, 1) AS DOUBLE) * tot.cn)
                  / (CAST(GREATEST(cc, 1) AS DOUBLE) * tot.rn))
             ) AS BIGINT) AS psi_nano
      FROM cells CROSS JOIN tot
    )
    SELECT CAST(count(*) AS BIGINT) AS n_bins,
           CAST(sum(rc) AS BIGINT) AS n_ref,
           CAST(sum(cc) AS BIGINT) AS n_cur,
           round(CAST(sum(psi_nano) AS DOUBLE) / 1e9, 6) AS psi
    FROM terms
    """,
)
def psi_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index (the model-monitoring standard every
    scorecard/ML-ops platform reports; <0.1 stable, >0.25 act):
    doc-length distribution of the md5-gated 80% 'reference' slice vs
    the 20% 'current' slice, binned by the REFERENCE's own deciles
    (discrete-rank edges — the defining PSI construction: bins come
    from the baseline, drift shows as mass leaving them). PSI =
    Σ (p−q)·ln(p/q); on same-population gates it sits near 0 — the
    built-in A/A reading — and the operator is the template: point
    'current' at tomorrow's batch and the number becomes the alarm.

    Exactness: bin edges are actual reference values at discrete
    ranks; cell counts are integers; each bin's term quantizes to
    integer NANO units once (GREATEST(·,1) is the standard
    empty-bin guard, applied identically in both lanes).

    Scale: the rank window builds edges over the reference ONCE
    (its 100 TB substitution is approx_percentile at the same
    cuts); binning is a ≤{PSI_BINS}-row broadcast range lookup; the
    reduce is a {PSI_BINS}-cell census.
    """
    d = load_table(spark, sf_dir, "documents")
    gate = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
        < 80
    )
    lab = d.select("n_chars", gate.alias("is_ref"))
    lab = scoped_persist(lab)
    ref = lab.filter(F.col("is_ref"))
    w = Window.orderBy("n_chars")
    ranked = ref.select(
        "n_chars",
        F.ceil(
            F.row_number().over(w).cast("double")
            * PSI_BINS
            / F.count("*").over(Window.partitionBy())
        )
        .cast("long")
        .alias("b"),
    )
    edges = (
        ranked.filter(F.col("b") < PSI_BINS)
        .groupBy("b")
        .agg(F.max("n_chars").alias("hi"))
    )
    # Bin per distinct VALUE (with its true row count), not per row —
    # the edge range-join fans each probe across every edge it is ≤,
    # so binning rows directly would multiply mass.
    per_val = lab.groupBy("is_ref", "n_chars").agg(F.count("*").alias("rows"))
    val_bin = (
        per_val.join(F.broadcast(edges), F.col("n_chars") <= F.col("hi"), "left")
        .groupBy("is_ref", "n_chars", "rows")
        .agg(F.coalesce(F.min("b"), F.lit(PSI_BINS)).alias("bin"))
    )
    cells = val_bin.groupBy("bin").agg(
        F.sum(F.when(F.col("is_ref"), F.col("rows")).otherwise(0))
        .cast("long")
        .alias("rc"),
        F.sum(F.when(~F.col("is_ref"), F.col("rows")).otherwise(0))
        .cast("long")
        .alias("cc"),
    )
    tot = cells.agg(F.sum("rc").alias("rn"), F.sum("cc").alias("cn"))
    p = F.col("rc").cast("double") / F.col("rn")
    q = F.col("cc").cast("double") / F.col("cn")
    ratio = (
        F.greatest(F.col("rc"), F.lit(1)).cast("double") * F.col("cn")
    ) / (F.greatest(F.col("cc"), F.lit(1)).cast("double") * F.col("rn"))
    terms = cells.crossJoin(F.broadcast(tot)).select(
        "rc",
        "cc",
        F.round(F.lit(1_000_000_000.0) * (p - q) * F.log(ratio))
        .cast("long")
        .alias("psi_nano"),
    )
    return terms.agg(
        F.count("*").alias("n_bins"),
        F.sum("rc").cast("long").alias("n_ref"),
        F.sum("cc").cast("long").alias("n_cur"),
        F.round(F.sum("psi_nano").cast("double") / 1e9, 6).alias("psi"),
    )


KT_MOD = 10  # doc_id % 10 == 0 joins the rank-correlation sample


@query(
    "kendall_tau_rank_corr",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS a,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS b
      FROM documents WHERE doc_id % {KT_MOD} = 0
    ),
    pairs AS (
      SELECT CASE WHEN (x.a - y.a) * (x.b - y.b) > 0 THEN 1 ELSE 0 END AS conc,
             CASE WHEN (x.a - y.a) * (x.b - y.b) < 0 THEN 1 ELSE 0 END AS disc
      FROM s x JOIN s y ON x.doc_id < y.doc_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(conc) AS BIGINT) AS concordant,
           CAST(sum(disc) AS BIGINT) AS discordant,
           CAST(count(*) - sum(conc) - sum(disc) AS BIGINT) AS tied,
           round(CAST(sum(conc) - sum(disc) AS DOUBLE) / count(*), 6)
             AS tau_a
    FROM pairs
    """,
)
def kendall_tau_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-a rank correlation (Kendall 1938) between document
    length in CHARACTERS and in TOKENS over a hash-thinned sample —
    the nonparametric rank-agreement standard (robust where Pearson
    is not; the metric used to compare ranking systems, e.g. two
    quality scorers). Near +1 here by construction (longer texts have
    more tokens), and the tied-pair count exposes granularity loss —
    the readout that matters when replacing an expensive ranker with
    a cheap proxy.

    Exactness: concordance is the sign of an integer PRODUCT
    (aᵢ−aⱼ)(bᵢ−bⱼ) — no rank computation, no floats; τ is one
    division of integer counts, rounded once.

    Scale: the pair join is over the deterministic 1/{KT_MOD} sample
    (quadratic in the SAMPLE, linear in the corpus — the standard τ
    estimator posture); the reduce is a 3-counter partial-aggregated
    sum.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % KT_MOD == 0
    )
    s = d.select(
        "doc_id",
        F.col("n_chars").alias("a"),
        F.size(F.split("text", " ")).cast("long").alias("b"),
    )
    s = scoped_persist(s)
    x = s.select(
        F.col("doc_id").alias("i"), F.col("a").alias("ax"), F.col("b").alias("bx")
    )
    y = s.select(
        F.col("doc_id").alias("j"), F.col("a").alias("ay"), F.col("b").alias("by")
    )
    prod = (F.col("ax") - F.col("ay")) * (F.col("bx") - F.col("by"))
    pairs = x.join(y, F.col("i") < F.col("j")).select(
        (prod > 0).cast("int").alias("conc"), (prod < 0).cast("int").alias("disc")
    )
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.sum("conc").cast("long").alias("concordant"),
        F.sum("disc").cast("long").alias("discordant"),
        (F.count("*") - F.sum("conc") - F.sum("disc"))
        .cast("long")
        .alias("tied"),
        F.round(
            (F.sum("conc") - F.sum("disc")).cast("double") / F.count("*"), 6
        ).alias("tau_a"),
    )


@query(
    "quantile_normalization_map",
    oracle="""
    WITH ranked AS (
      SELECT source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS rp,
             count(*) OVER (PARTITION BY source) AS n
      FROM documents
    ),
    bounds AS (
      SELECT source, decile,
             CAST(max(n_chars) AS BIGINT) AS source_boundary
      FROM (SELECT source, n_chars,
                   CAST(ceil(CAST(rp AS DOUBLE) * 10 / n) AS BIGINT) AS decile
            FROM ranked)
      GROUP BY source, decile
    ),
    med AS (
      SELECT decile, source_boundary,
             row_number() OVER (PARTITION BY decile
                                ORDER BY source_boundary, source) AS rs,
             count(*) OVER (PARTITION BY decile) AS k
      FROM bounds
    ),
    target AS (
      SELECT decile, source_boundary AS target_boundary
      FROM med WHERE rs = CAST(ceil(k / 2.0) AS BIGINT)
    )
    SELECT b.source, b.decile, b.source_boundary, t.target_boundary,
           t.target_boundary - b.source_boundary AS shift
    FROM bounds b JOIN target t USING (decile)
    ORDER BY b.source, b.decile
    """,
)
def quantile_normalization_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile-normalization map (statistics × curation —
    the quantile-normalization idea from microarray preprocessing,
    Bolstad et al. 2003, applied to doc length): each source's decile
    boundaries of n_chars, the cross-source DISCRETE-median boundary
    per decile as the alignment target, and the shift between them.
    Sources whose length distribution sits far from the consensus map
    (large |shift| across deciles) need length-aware caps before a
    mixture treats their token counts as comparable — the actionable
    per-decile version of what ``ks_drift_doclen`` detects as one
    number.

    Exactness: decile of rank r is ⌈r·10/n⌉ under a total order
    (the ``equidepth_histogram_bounds`` rule); boundaries are actual
    data values; the target is the lower discrete median (rank
    ⌈k/2⌉) — no interpolation anywhere, so both engines agree
    bit-for-bit on every emitted integer.

    Scale: the rank window partitions BY SOURCE (parallel across
    sources, never a global sort); the median window runs over the
    |sources|×10 boundary table. The 100 TB substitution is
    approx_percentile per source at the same cut points, same
    downstream shape.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = d.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("rp"),
        F.count("*").over(Window.partitionBy("source")).alias("n"),
    )
    decile = F.ceil(F.col("rp").cast("double") * 10 / F.col("n")).cast("long")
    bounds = (
        ranked.select("source", decile.alias("decile"), "n_chars")
        .groupBy("source", "decile")
        .agg(F.max("n_chars").alias("source_boundary"))
    )
    bounds = scoped_persist(bounds)  # feeds the median AND the emit join
    wm = Window.partitionBy("decile").orderBy("source_boundary", "source")
    med = bounds.select(
        "decile",
        "source_boundary",
        F.row_number().over(wm).alias("rs"),
        F.count("*").over(Window.partitionBy("decile")).alias("k"),
    )
    target = med.filter(
        F.col("rs") == F.ceil(F.col("k") / 2.0).cast("long")
    ).select("decile", F.col("source_boundary").alias("target_boundary"))
    return (
        bounds.join(F.broadcast(target), "decile")
        .select(
            "source",
            "decile",
            "source_boundary",
            "target_boundary",
            (F.col("target_boundary") - F.col("source_boundary")).alias(
                "shift"
            ),
        )
        .orderBy("source", "decile")
    )


BOOT_B = 20  # deterministic half-subsample replicates


@query(
    "bootstrap_mean_ci",
    oracle=f"""
    WITH grid AS (SELECT unnest(range(0, {BOOT_B})) AS b),
    member AS (
      SELECT g.b, d.n_chars
      FROM documents d CROSS JOIN grid g
      WHERE CAST(('0x' || substr(md5(CAST(g.b AS VARCHAR) || ':' ||
                  CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
    ),
    means AS (
      SELECT b, round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS m
      FROM member GROUP BY b
    ),
    ranked AS (
      SELECT m, row_number() OVER (ORDER BY m, b) AS rk,
             count(*) OVER () AS k
      FROM means
    ),
    full_m AS (
      SELECT round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS fm
      FROM documents
    )
    SELECT full_m.fm AS full_mean,
           CAST(max(k) AS BIGINT) AS n_resamples,
           min(CASE WHEN rk = CAST(ceil(0.1 * k) AS BIGINT) THEN m END)
             AS boot_lo,
           min(CASE WHEN rk = CAST(ceil(0.9 * k) AS BIGINT) THEN m END)
             AS boot_hi
    FROM ranked CROSS JOIN full_m
    GROUP BY full_m.fm
    """,
)
def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic subsampling CI for the mean doc length
    (statistics — Politis-Romano subsampling, the resampling scheme
    that distributes cleanly): {BOOT_B} half-subsamples gated by a
    salted content hash (doc d joins replicate b iff
    md5(b:doc_id) is even — no RNG, bit-identical across engines and
    runs), each replicate's mean, and the discrete 10th/90th-rank
    replicate means as the interval. The spread prices how much the
    corpus mean would move under resampling — the error bar every
    per-source mean comparison silently needs; classic bootstrap's
    with-replacement multiplicities don't distribute deterministically,
    the documented reason for the subsampling variant.

    Exactness: membership is a hash gate; each replicate mean is one
    integer-sum division rounded 6; interval endpoints are DISCRETE
    ranks over the {BOOT_B}-row means table — no interpolation.

    Scale: one scan fans each row into its (expected {BOOT_B}/2)
    member replicates via an in-row array filter + explode (never a
    corpus×B join); per-replicate means are a {BOOT_B}-group hash
    aggregate with map-side combine; the rank window runs over
    {BOOT_B} rows.
    """
    d = load_table(spark, sf_dir, "documents")
    bs = F.sequence(F.lit(0), F.lit(BOOT_B - 1))

    def gate(b):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        b.cast("string"), F.lit(":"), F.col("doc_id").cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        return h % 2 == 0

    member = d.select(
        "n_chars", F.explode(F.filter(bs, gate)).alias("b")
    )
    means = member.groupBy("b").agg(
        F.round(F.sum("n_chars").cast("double") / F.count("*"), 6).alias("m")
    )
    w = Window.orderBy("m", "b")
    ranked = means.select(
        "m",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy()).alias("k"),
    )
    full_m = d.agg(
        F.round(F.sum("n_chars").cast("double") / F.count("*"), 6).alias(
            "full_mean"
        )
    )
    lo = F.ceil(0.1 * F.col("k")).cast("long")
    hi = F.ceil(0.9 * F.col("k")).cast("long")
    return (
        ranked.crossJoin(F.broadcast(full_m))
        .groupBy("full_mean")
        .agg(
            F.max("k").alias("n_resamples"),
            F.min(F.when(F.col("rk") == lo, F.col("m"))).alias("boot_lo"),
            F.min(F.when(F.col("rk") == hi, F.col("m"))).alias("boot_hi"),
        )
        .select("full_mean", "n_resamples", "boot_lo", "boot_hi")
    )


@query(
    "spearman_rank_corr",
    oracle="""
    WITH s AS (
      SELECT source, CAST(n_chars AS BIGINT) AS a,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS b
      FROM documents
    ),
    r AS (
      SELECT source,
             2 * rank() OVER (PARTITION BY source ORDER BY a)
               + count(*) OVER (PARTITION BY source, a) - 1 AS ra,
             2 * rank() OVER (PARTITION BY source ORDER BY b)
               + count(*) OVER (PARTITION BY source, b) - 1 AS rb
      FROM s
    ),
    g AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(ra) AS BIGINT) AS sa, CAST(sum(rb) AS BIGINT) AS sb,
             CAST(sum(ra * rb) AS BIGINT) AS sab,
             CAST(sum(ra * ra) AS BIGINT) AS saa,
             CAST(sum(rb * rb) AS BIGINT) AS sbb
      FROM r GROUP BY source
    )
    SELECT source, n AS n_docs,
           round(CAST(n * sab - sa * sb AS DOUBLE)
                 / nullif(sqrt(CAST(n * saa - sa * sa AS DOUBLE))
                          * sqrt(CAST(n * sbb - sb * sb AS DOUBLE)), 0),
                 6) AS spearman_rho
    FROM g
    ORDER BY source
    """,
)
def spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation WITH tie handling (Pearson over
    average ranks — the textbook definition when ties exist; the
    companion to ``kendall_tau_rank_corr``'s tau-a): per source,
    rank doc length and token count, correlate the ranks. Monotone-
    association drift across sources is a data-mix smell the linear
    ``corr`` misses.

    Exactness: average tie ranks are half-integers, so BOTH lanes
    carry 2·rank = 2·rank() + tie_count − 1 (integers); all five
    reduce sums are integer; the single float expression (one
    division, two sqrts over exactly-representable < 2^53 integers)
    is evaluated in the same op order by both engines and rounded
    once.

    Scale: two window ranks per source partition + one hash agg —
    rank windows over per-source partitions parallelize across
    sources; no cross-source shuffle beyond the groupBy.
    """
    d = load_table(spark, sf_dir, "documents")
    s = d.select(
        "source",
        F.col("n_chars").cast("long").alias("a"),
        F.size(F.split("text", " ")).cast("long").alias("b"),
    )
    wa = Window.partitionBy("source").orderBy("a")
    wb = Window.partitionBy("source").orderBy("b")
    r = s.select(
        "source",
        (2 * F.rank().over(wa)
         + F.count("*").over(Window.partitionBy("source", "a")) - 1)
        .cast("long").alias("ra"),
        (2 * F.rank().over(wb)
         + F.count("*").over(Window.partitionBy("source", "b")) - 1)
        .cast("long").alias("rb"),
    )
    g = r.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("ra").cast("long").alias("sa"),
        F.sum("rb").cast("long").alias("sb"),
        F.sum(F.col("ra") * F.col("rb")).cast("long").alias("sab"),
        F.sum(F.col("ra") * F.col("ra")).cast("long").alias("saa"),
        F.sum(F.col("rb") * F.col("rb")).cast("long").alias("sbb"),
    )
    num = (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")).cast("double")
    den = F.nullif(
        F.sqrt((F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).cast("double"))
        * F.sqrt((F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double")),
        F.lit(0.0),
    )
    return (
        g.select(
            "source",
            F.col("n").alias("n_docs"),
            F.round(num / den, 6).alias("spearman_rho"),
        )
        .orderBy("source")
    )


WELCH_BASELINE_LANG = "en"  # every other lang tests against this


@query(
    "welch_t_doclen",
    oracle=f"""
    WITH g AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_chars) AS BIGINT) AS s1,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
      FROM documents GROUP BY lang
    ),
    m AS (
      SELECT lang, n,
             CAST(s1 AS DOUBLE) / n AS mean,
             (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
               / nullif(n - 1, 0) AS var
      FROM g
    ),
    base AS (SELECT n AS n0, mean AS m0, var AS v0 FROM m
             WHERE lang = '{WELCH_BASELINE_LANG}')
    SELECT m.lang, m.n AS n_docs,
           round(m.mean, 4) AS mean_chars,
           round((m.mean - b.m0)
                 / nullif(sqrt(m.var / m.n + b.v0 / b.n0), 0), 4) AS welch_t,
           round(((m.var / m.n + b.v0 / b.n0)
                  * (m.var / m.n + b.v0 / b.n0))
                 / nullif((m.var / m.n) * (m.var / m.n) / nullif(m.n - 1, 0)
                          + (b.v0 / b.n0) * (b.v0 / b.n0)
                            / nullif(b.n0 - 1, 0), 0),
                 2) AS welch_df
    FROM m CROSS JOIN base b
    WHERE m.lang <> '{WELCH_BASELINE_LANG}'
    ORDER BY m.lang
    """,
)
def welch_t_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test (Welch 1947 — the default
    two-sample mean test; Student's equal-variance form is the
    special case nobody's data satisfies) of document length for
    every language against the 'en' baseline, with the
    Welch–Satterthwaite effective degrees of freedom. The continuous
    companion to ``abtest_two_proportion_z``.

    Exactness: per-group n, Σx, Σx² are exact integer aggregates
    (n_chars < 2^31 keeps Σx² inside long); mean/variance/t/df are
    one fixed dag of float ops over those integers — identical
    expression order in both engines, each output rounded once.

    Scale: one hash agg to ~|langs| rows, then a broadcast of the
    single baseline row — nothing after the agg is data-sized.
    """
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("lang").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    # n = 1 → (n-1) = 0: NULL variance (propagates to NULL t/df),
    # mirroring the oracle's nullif, instead of ANSI DIVIDE_BY_ZERO.
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n")
    ) / F.nullif(F.col("n") - 1, F.lit(0))
    m = g.select("lang", "n", mean.alias("mean"), var.alias("var"))
    base = m.filter(F.col("lang") == WELCH_BASELINE_LANG).select(
        F.col("n").alias("n0"), F.col("mean").alias("m0"), F.col("var").alias("v0")
    )
    se2 = F.col("var") / F.col("n") + F.col("v0") / F.col("n0")
    # Constant doc lengths in both groups → se2 = 0 and the df
    # denominator = 0: nullif both (oracle mirrors).
    df = (se2 * se2) / F.nullif(
        (F.col("var") / F.col("n")) * (F.col("var") / F.col("n"))
        / F.nullif(F.col("n") - 1, F.lit(0))
        + (F.col("v0") / F.col("n0")) * (F.col("v0") / F.col("n0"))
        / F.nullif(F.col("n0") - 1, F.lit(0)),
        F.lit(0.0),
    )
    return (
        m.filter(F.col("lang") != WELCH_BASELINE_LANG)
        .crossJoin(F.broadcast(base))
        .select(
            "lang",
            F.col("n").alias("n_docs"),
            F.round("mean", 4).alias("mean_chars"),
            F.round(
                (F.col("mean") - F.col("m0"))
                / F.nullif(F.sqrt(se2), F.lit(0.0)),
                4,
            ).alias("welch_t"),
            F.round(df, 2).alias("welch_df"),
        )
        .orderBy("lang")
    )


@query(
    "anova_doclen_by_source",
    oracle="""
    WITH g AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_chars) AS BIGINT) AS s1,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
      FROM documents GROUP BY source
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS n_tot,
             CAST(sum(s1) AS BIGINT) AS s1_tot,
             CAST(sum(s2) AS BIGINT) AS s2_tot,
             CAST(sum(CAST(round(1000000 * (CAST(s1 AS DOUBLE) * s1 / n))
                           AS BIGINT)) AS DOUBLE) / 1000000 AS group_sq
      FROM g
    )
    SELECT k AS n_groups, n_tot AS n_docs,
           round((group_sq - CAST(s1_tot AS DOUBLE) * s1_tot / n_tot)
                 / nullif(k - 1, 0)
                 / nullif((CAST(s2_tot AS DOUBLE) - group_sq)
                          / nullif(n_tot - k, 0), 0),
                 4) AS f_stat,
           round((group_sq - CAST(s1_tot AS DOUBLE) * s1_tot / n_tot)
                 / nullif(CAST(s2_tot AS DOUBLE)
                          - CAST(s1_tot AS DOUBLE) * s1_tot / n_tot, 0),
                 6) AS eta_squared
    FROM t
    """,
)
def anova_doclen_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F across sources on document length (Fisher's
    between/within variance ratio) plus η² effect size — "do the
    sources even differ before I reweight them?" is the first
    question a mixture designer asks, and F/η² answer it with one
    pass. Completes the drift-test battery (KS, Mann-Whitney, χ²,
    PSI, Welch) with the k-group omnibus test.

    Exactness: only n, Σx, Σx² per group are data-sized aggregates
    (exact integers); SSB/SSW arithmetic is a fixed float dag over
    them. The one cross-group float reduce (Σ s1²/n) quantizes each
    term to integer micro-units first — an associative integer sum
    that cannot flip on partitioning or hash-agg emit order (the
    repo-wide ln-reduce idiom, applied to a rational term).

    Scale: hash agg to |sources| rows; everything after is
    constant-sized.
    """
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("s2"),
    )
    t = g.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n").cast("long").alias("n_tot"),
        F.sum("s1").cast("long").alias("s1_tot"),
        F.sum("s2").cast("long").alias("s2_tot"),
        (
            F.sum(
                F.round(
                    1_000_000
                    * (F.col("s1").cast("double") * F.col("s1") / F.col("n"))
                ).cast("long")
            ).cast("double")
            / 1_000_000
        ).alias("group_sq"),
    )
    ssb = F.col("group_sq") - F.col("s1_tot").cast("double") * F.col("s1_tot") / F.col("n_tot")
    ssw = F.col("s2_tot").cast("double") - F.col("group_sq")
    sst = (
        F.col("s2_tot").cast("double")
        - F.col("s1_tot").cast("double") * F.col("s1_tot") / F.col("n_tot")
    )
    # Degenerate shapes (k = 1, every group n = 1, constant lengths)
    # zero the (k-1) / (n_tot-k) / ssw / sst denominators: nullif each
    # so both lanes emit NULL instead of ANSI DIVIDE_BY_ZERO.
    return t.select(
        F.col("k").alias("n_groups"),
        F.col("n_tot").alias("n_docs"),
        F.round(
            ssb
            / F.nullif(F.col("k") - 1, F.lit(0))
            / F.nullif(
                ssw / F.nullif(F.col("n_tot") - F.col("k"), F.lit(0)),
                F.lit(0.0),
            ),
            4,
        ).alias("f_stat"),
        F.round(ssb / F.nullif(sst, F.lit(0.0)), 6).alias("eta_squared"),
    )


@query(
    "t_closeness_audit",
    oracle="""
    WITH cell AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY lang, source
    ),
    lg AS (SELECT lang, CAST(sum(c) AS BIGINT) AS ng FROM cell GROUP BY lang),
    sg AS (SELECT source, CAST(sum(c) AS BIGINT) AS cs FROM cell GROUP BY source),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cell),
    terms AS (
      SELECT lg.lang, lg.ng, tot.n,
             abs(coalesce(cell.c, 0) * tot.n - sg.cs * lg.ng) AS num
      FROM lg CROSS JOIN sg CROSS JOIN tot
      LEFT JOIN cell ON cell.lang = lg.lang AND cell.source = sg.source
    )
    SELECT lang, CAST(min(ng) AS BIGINT) AS n_rows,
           round(CAST(sum(num) AS DOUBLE) / (2 * min(ng) * min(n)), 6)
             AS tvd_to_global
    FROM terms
    GROUP BY lang
    ORDER BY lang
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness (Li, Machanavajjhala & Venkitasubramanian ICDE'07 —
    the refinement of k-anonymity/l-diversity this repo already
    carries): for each quasi-identifier group (lang), the total
    variation distance between the group's sensitive-attribute
    (source) distribution and the global one. A group whose
    distribution sits far from the corpus average leaks attribute
    information even when it is k-anonymous and l-diverse; releases
    require max TVD ≤ t.

    Exactness: TVD per group = Σ|c_gs·n − c_s·n_g| / (2·n_g·n) —
    the numerator is an exact integer sum (counts ≤ 10⁵ keep every
    product < 2^53), one division at the end.

    Scale: one (lang, source) hash agg, two marginal aggs, and a
    |langs|×|sources| dense spine (tiny) left-joined back — no
    data-sized shuffle after the first agg.
    """
    d = load_table(spark, sf_dir, "documents")
    cell = d.groupBy("lang", "source").agg(F.count("*").cast("long").alias("c"))
    cell = scoped_persist(cell)
    lg = cell.groupBy("lang").agg(F.sum("c").cast("long").alias("ng"))
    sg = cell.groupBy("source").agg(F.sum("c").cast("long").alias("cs"))
    tot = cell.agg(F.sum("c").cast("long").alias("n"))
    terms = (
        lg.crossJoin(F.broadcast(sg))
        .crossJoin(F.broadcast(tot))
        .join(cell, ["lang", "source"], "left")
        .select(
            "lang",
            "ng",
            "n",
            F.abs(
                F.coalesce(F.col("c"), F.lit(0)) * F.col("n")
                - F.col("cs") * F.col("ng")
            ).alias("num"),
        )
    )
    return (
        terms.groupBy("lang")
        .agg(
            F.min("ng").cast("long").alias("n_rows"),
            F.round(
                F.sum("num").cast("double") / (2 * F.min("ng") * F.min("n")), 6
            ).alias("tvd_to_global"),
        )
        .orderBy("lang")
    )


def _cramers_block(table: str, a_expr: str, b_expr: str, label: str) -> str:
    """One Cramér's-V oracle block: χ² over the DENSE r×c spine
    (zero cells contribute rr·cc/n), each cell term nano-quantized
    before the integer reduce."""
    return f"""
    SELECT '{label}' AS pair, n, r_levels, c_levels,
           round(chi2, 4) AS chi2,
           round(sqrt(chi2 / nullif(n * least(r_levels - 1, c_levels - 1),
                                    0)), 4)
             AS cramers_v
    FROM (
      WITH cell AS (
        SELECT {a_expr} AS a, {b_expr} AS b, CAST(count(*) AS BIGINT) AS c
        FROM {table} GROUP BY 1, 2
      ),
      ra AS (SELECT a, CAST(sum(c) AS BIGINT) AS rr FROM cell GROUP BY a),
      cb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cc FROM cell GROUP BY b),
      tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cell),
      terms AS (
        SELECT tot.n,
               CAST(round(1000000000 *
                 (CAST(coalesce(cell.c, 0) * tot.n - ra.rr * cb.cc AS DOUBLE)
                  * CAST(coalesce(cell.c, 0) * tot.n - ra.rr * cb.cc AS DOUBLE)
                  / CAST(tot.n * ra.rr * cb.cc AS DOUBLE))) AS BIGINT) AS t
        FROM ra CROSS JOIN cb CROSS JOIN tot
        LEFT JOIN cell ON cell.a = ra.a AND cell.b = cb.b
      )
      SELECT CAST(min(n) AS BIGINT) AS n,
             (SELECT CAST(count(*) AS BIGINT) FROM ra) AS r_levels,
             (SELECT CAST(count(*) AS BIGINT) FROM cb) AS c_levels,
             CAST(sum(t) AS DOUBLE) / 1000000000 AS chi2
      FROM terms
    )
    """


@query(
    "cramers_v_matrix",
    oracle=" UNION ALL ".join(
        [
            _cramers_block("documents", "lang", "source", "documents:lang_x_source"),
            _cramers_block(
                "orders",
                "o_orderstatus",
                "o_orderpriority",
                "orders:status_x_priority",
            ),
            _cramers_block(
                "events", "event_type", "hour(ts)", "events:type_x_hour"
            ),
        ]
    )
    + " ORDER BY pair",
)
def cramers_v_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association strength for categorical column PAIRS
    across three tables (lang×source, order status×priority, event
    type×hour-of-day) — the normalized-χ² profiling sweep a schema
    auditor runs to find which dimensions actually co-vary (V≈0
    independent, V≈1 determined), complementing the significance-only
    ``chi2_term_keyness`` and the entropy-based
    ``mutual_information_audit``.

    Exactness: χ² over the DENSE level spine (zero cells contribute
    rr·cc/n — dropping them understates χ²); every cell term is the
    same fixed float dag over exact sub-2^53 integers in both
    engines, nano-quantized before the integer reduce; V takes one
    sqrt of the quantized total.

    Scale: per pair, one (a,b) hash agg + two marginal aggs; the
    dense spine is |levels|² (tiny — categorical columns), broadcast
    left-joined to observed cells; nothing after the first agg is
    data-sized.
    """
    def pair_block(df: DataFrame, a: str, b, label: str) -> DataFrame:
        src = df.select(F.col(a).alias("a"), b.alias("b"))
        cell = scoped_persist(
            src.groupBy("a", "b").agg(F.count("*").cast("long").alias("c"))
        )
        ra = cell.groupBy("a").agg(F.sum("c").cast("long").alias("rr"))
        cb = cell.groupBy("b").agg(F.sum("c").cast("long").alias("cc"))
        tot = cell.agg(F.sum("c").cast("long").alias("n"))
        d = (
            F.coalesce(F.col("c"), F.lit(0)) * F.col("n")
            - F.col("rr") * F.col("cc")
        ).cast("double")
        t = F.round(
            1_000_000_000
            * (d * d / (F.col("n") * F.col("rr") * F.col("cc")).cast("double"))
        ).cast("long")
        terms = (
            ra.crossJoin(F.broadcast(cb))
            .crossJoin(F.broadcast(tot))
            .join(cell, ["a", "b"], "left")
            .select("n", t.alias("t"))
        )
        r_l = ra.agg(F.count("*").cast("long").alias("r_levels"))
        c_l = cb.agg(F.count("*").cast("long").alias("c_levels"))
        agg = terms.agg(
            F.min("n").cast("long").alias("n"),
            (F.sum("t").cast("double") / 1_000_000_000).alias("chi2"),
        )
        return (
            agg.crossJoin(F.broadcast(r_l))
            .crossJoin(F.broadcast(c_l))
            .select(
                F.lit(label).alias("pair"),
                "n",
                "r_levels",
                "c_levels",
                F.round("chi2", 4).alias("chi2"),
                F.round(
                    F.sqrt(
                        F.col("chi2")
                        / F.nullif(
                            (
                                F.col("n")
                                * F.least(
                                    F.col("r_levels") - 1, F.col("c_levels") - 1
                                )
                            ).cast("double"),
                            F.lit(0.0),
                        )
                    ),
                    4,
                ).alias("cramers_v"),
            )
        )

    docs = load_table(spark, sf_dir, "documents")
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    return (
        pair_block(docs, "lang", F.col("source"), "documents:lang_x_source")
        .unionByName(
            pair_block(
                orders,
                "o_orderstatus",
                F.col("o_orderpriority"),
                "orders:status_x_priority",
            )
        )
        .unionByName(
            pair_block(events, "event_type", F.hour("ts"), "events:type_x_hour")
        )
        .orderBy("pair")
    )


BASKET_MIN_SUP = 20  # pairs must co-occur in at least this many orders
BASKET_TOP_K = 15


@query(
    "market_basket_lift_pairs",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_baskets FROM items),
    sup1 AS (SELECT brand, CAST(count(*) AS BIGINT) AS s FROM items
             GROUP BY brand),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             CAST(count(*) AS BIGINT) AS sup_ab
      FROM items a JOIN items b ON a.ok = b.ok AND a.brand < b.brand
      GROUP BY 1, 2
      HAVING count(*) >= {BASKET_MIN_SUP}
    ),
    scored AS (
      SELECT p.brand_a, p.brand_b, p.sup_ab,
             round(CAST(p.sup_ab * n.n_baskets AS DOUBLE)
                   / (sa.s * sb.s), 6) AS lift
      FROM pairs p
      JOIN sup1 sa ON p.brand_a = sa.brand
      JOIN sup1 sb ON p.brand_b = sb.brand
      CROSS JOIN n
    )
    SELECT brand_a, brand_b, sup_ab, lift FROM scored
    ORDER BY lift DESC, brand_a, brand_b
    LIMIT {BASKET_TOP_K}
    """,
)
def market_basket_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining (the Apriori/association-rules k=2
    kernel, Agrawal & Srikant VLDB'94): brand pairs that co-occur in
    the same order, filtered by minimum support, ranked by lift =
    P(a,b)/(P(a)·P(b)). Lift > 1 flags genuinely associated items the
    raw co-count conflates with popularity — the same statistic
    ``cooccurrence_pmi_pairs`` computes log-scaled over text windows,
    here in its canonical relational form over order baskets.

    Exactness: supports are exact integer counts; lift is one float
    division of sub-2^53 integer products, rounded once; top-k
    ordering uses the raw lift with a (brand_a, brand_b) tiebreak.

    Scale: the basket self-join keys on the order id, so pair work is
    Σ per-basket |items|² — bounded by basket size (≤7 lineitems in
    TPC-H), never |catalog|²; the brand dimension broadcasts into the
    item build; supports are broadcast back into the pair scoring;
    TakeOrderedAndProject caps the result.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    items = scoped_persist(
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    n = items.agg(F.countDistinct("ok").cast("long").alias("n_baskets"))
    sup1 = items.groupBy("brand").agg(F.count("*").cast("long").alias("s"))
    a = items.select("ok", F.col("brand").alias("brand_a"))
    b = items.select("ok", F.col("brand").alias("brand_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").cast("long").alias("sup_ab"))
        .filter(F.col("sup_ab") >= BASKET_MIN_SUP)
    )
    sa = F.broadcast(sup1.select(F.col("brand").alias("brand_a"), F.col("s").alias("sa")))
    sb = F.broadcast(sup1.select(F.col("brand").alias("brand_b"), F.col("s").alias("sb")))
    return (
        pairs.join(sa, "brand_a")
        .join(sb, "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "sup_ab",
            F.round(
                (F.col("sup_ab") * F.col("n_baskets")).cast("double")
                / (F.col("sa") * F.col("sb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "brand_a", "brand_b")
        .limit(BASKET_TOP_K)
    )


CUPED_BOUNDARY = "2024-01-16"  # pre-period: Jan 1-15; post: Jan 16-30
CUPED_METRIC = "purchase"  # the per-user metric is purchase value


@query(
    "cuped_adjusted_abtest",
    oracle=f"""
    WITH pv AS (
      SELECT user_id,
             CAST(sum(CASE WHEN ts < TIMESTAMP '{CUPED_BOUNDARY}'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '{CUPED_BOUNDARY}'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS y
      FROM events WHERE event_type = '{CUPED_METRIC}'
      GROUP BY user_id
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pv
    ),
    th AS (
      SELECT n, sx,
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / nullif(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx, 0)
               AS theta,
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / nullif((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * (CAST(n AS DOUBLE) * syy
                         - CAST(sy AS DOUBLE) * sy), 0) AS var_reduction
      FROM g
    ),
    v AS (
      SELECT user_id % 2 AS variant,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(x) AS BIGINT) AS vx, CAST(sum(y) AS BIGINT) AS vy
      FROM pv GROUP BY 1
    )
    SELECT v.variant, v.n_users,
           round(CAST(v.vy AS DOUBLE) / v.n_users / 100, 4) AS mean_post,
           round((CAST(v.vy AS DOUBLE)
                  - th.theta * (CAST(v.vx AS DOUBLE)
                                - CAST(v.n_users AS DOUBLE) * th.sx / th.n))
                 / v.n_users / 100, 4) AS mean_adjusted,
           round(th.theta, 6) AS theta,
           round(th.var_reduction, 6) AS var_reduction
    FROM v CROSS JOIN th
    ORDER BY v.variant
    """,
)
def cuped_adjusted_abtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi & Walker WSDM'13 —
    the industry-standard experiment sensitivity booster): per-user
    purchase value in a PRE-experiment window becomes the control
    covariate X for the post-window metric Y; θ = cov(X,Y)/var(X) is
    fit pooled, each variant's adjusted mean is Ȳ_v − θ(X̄_v − X̄),
    and var_reduction = ρ² is the fraction of metric variance the
    covariate removes — the number that decides how much smaller the
    experiment can be. Variants are the deterministic user_id parity.

    Exactness: event values quantize to integer cents BEFORE any
    reduce (a raw-double per-user sum would be partition-order
    sensitive); all five moment sums are exact integers (cents ≤ 10⁷
    keep every product < 2^63); θ, ρ², and the adjusted means are one
    fixed float dag over them, each output rounded once.

    Scale: one hash agg to |users|, one to the 2-variant frame, a
    broadcast one-row θ join — post-agg nothing is data-sized.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == CUPED_METRIC
    )
    cents = F.round(F.col("value") * 100).cast("long")
    boundary = F.lit(CUPED_BOUNDARY).cast("timestamp")
    pv = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < boundary, cents).otherwise(0))
        .cast("long").alias("x"),
        F.sum(F.when(F.col("ts") >= boundary, cents).otherwise(0))
        .cast("long").alias("y"),
    )
    pv = scoped_persist(pv)
    g = pv.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    nd = F.col("n").cast("double")
    cov_n = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    varx_n = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vary_n = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    th = g.select(
        "n",
        "sx",
        (cov_n / F.nullif(varx_n, F.lit(0.0))).alias("theta"),
        (cov_n * cov_n / F.nullif(varx_n * vary_n, F.lit(0.0))).alias(
            "var_reduction"
        ),
    )
    v = pv.groupBy((F.col("user_id") % 2).alias("variant")).agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("vx"),
        F.sum("y").cast("long").alias("vy"),
    )
    return (
        v.crossJoin(F.broadcast(th))
        .select(
            "variant",
            "n_users",
            F.round(F.col("vy").cast("double") / F.col("n_users") / 100, 4).alias(
                "mean_post"
            ),
            F.round(
                (
                    F.col("vy").cast("double")
                    - F.col("theta")
                    * (
                        F.col("vx").cast("double")
                        - F.col("n_users").cast("double") * F.col("sx") / F.col("n")
                    )
                )
                / F.col("n_users")
                / 100,
                4,
            ).alias("mean_adjusted"),
            F.round("theta", 6).alias("theta"),
            F.round("var_reduction", 6).alias("var_reduction"),
        )
        .orderBy("variant")
    )


from couchwarehouse_spark.plans.sampling import (  # noqa: E402
    _SPLIT_SQL,
    TRAIN_PCT,
    VAL_PCT,
)

CONF_ALPHA_PCT = 10  # 90% target coverage; q̂ rank = ceil((n+1)(1-α))


@query(
    "conformal_interval_coverage",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS x,
             {{split}} AS b
      FROM documents
    ),
    mu AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_tr,
             CAST(sum(x) AS BIGINT) AS sx
      FROM s WHERE b < {{tr}} GROUP BY source
    ),
    cal AS (
      SELECT s.source, abs(s.x * mu.n_tr - mu.sx) AS num,
             row_number() OVER (PARTITION BY s.source
                                ORDER BY abs(s.x * mu.n_tr - mu.sx),
                                         s.doc_id) AS rk,
             count(*) OVER (PARTITION BY s.source) AS n_cal
      FROM s JOIN mu ON s.source = mu.source
      WHERE s.b >= {{tr}} AND s.b < {{tr}} + {{va}}
    ),
    qhat AS (
      SELECT source, CAST(max(n_cal) AS BIGINT) AS n_cal,
             CAST(max(CASE WHEN rk = CAST(ceil((n_cal + 1)
                                 * (100 - {CONF_ALPHA_PCT}) / 100.0) AS BIGINT)
                      THEN num END) AS BIGINT) AS q_num
      FROM cal GROUP BY source
    ),
    test AS (
      SELECT s.source,
             CAST(count(*) AS BIGINT) AS n_test,
             CAST(sum(CASE WHEN q.q_num IS NULL
                                OR abs(s.x * mu.n_tr - mu.sx) <= q.q_num
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
      FROM s
      JOIN mu ON s.source = mu.source
      JOIN qhat q ON s.source = q.source
      WHERE s.b >= {{tr}} + {{va}}
      GROUP BY s.source
    )
    SELECT t.source, q.n_cal, t.n_test,
           round(CAST(q.q_num AS DOUBLE) / mu.n_tr, 4) AS q_hat,
           round(CAST(t.n_covered AS DOUBLE) / t.n_test, 6) AS coverage,
           {100 - CONF_ALPHA_PCT} / 100.0 AS target
    FROM test t JOIN qhat q ON t.source = q.source
    JOIN mu ON t.source = mu.source
    ORDER BY t.source
    """.format(
        split=_SPLIT_SQL, tr=TRAIN_PCT, va=VAL_PCT
    ),
)
def conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction audit (Vovk's conformal framework in
    its modern split form, Lei et al. JASA'18): per source, fit the
    trivial mean model on TRAIN, take calibration nonconformity
    scores |x − μ̂| on VAL, set q̂ = the ⌈(n+1)(1−α)⌉-th smallest
    score (q̂ = ∞, i.e. cover-everything, when the rank exceeds the
    calibration size — the finite-sample rule), and measure empirical
    TEST coverage of μ̂ ± q̂ — the
    finite-sample guarantee says coverage ≥ 1−α, and THIS audit is
    how a production scoring pipeline proves its intervals honestly.
    Uses the repo's deterministic md5 split gate (train/val/test).

    Exactness: within a source every score shares the denominator
    n_train, so |x·n_tr − Σx| ranks scores as exact INTEGERS — the
    quantile pick and the coverage comparisons never touch a float;
    the emitted q̂ divides once for display.

    Scale: per-source rank window over the calibration slice only
    (VAL is ~10% of the corpus, partitioned by source); TRAIN
    reduces to |sources| rows broadcast into both passes; TEST is a
    filter + integer comparison + hash agg.
    """
    from couchwarehouse_spark.plans.sampling import _hash_bucket

    d = load_table(spark, sf_dir, "documents")
    b = _hash_bucket(F.col("doc_id"), 100)
    s = d.select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("x"), b.alias("b")
    )
    s = scoped_persist(s)
    mu = (
        s.filter(F.col("b") < TRAIN_PCT)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_tr"),
            F.sum("x").cast("long").alias("sx"),
        )
    )
    mu_b = F.broadcast(mu)
    num = F.abs(F.col("x") * F.col("n_tr") - F.col("sx"))
    w = Window.partitionBy("source").orderBy(num, "doc_id")
    cal = (
        s.filter((F.col("b") >= TRAIN_PCT) & (F.col("b") < TRAIN_PCT + VAL_PCT))
        .join(mu_b, "source")
        .select(
            "source",
            num.alias("num"),
            F.row_number().over(w).alias("rk"),
            F.count("*").over(Window.partitionBy("source")).alias("n_cal"),
        )
    )
    target_rank = F.ceil(
        (F.col("n_cal") + 1) * (100 - CONF_ALPHA_PCT) / 100.0
    ).cast("long")
    qhat = cal.groupBy("source").agg(
        F.max("n_cal").cast("long").alias("n_cal"),
        F.max(F.when(F.col("rk") == target_rank, F.col("num")))
        .cast("long")
        .alias("q_num"),
    )
    test = (
        s.filter(F.col("b") >= TRAIN_PCT + VAL_PCT)
        .join(mu_b, "source")
        .join(F.broadcast(qhat), "source")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum(
                (F.col("q_num").isNull() | (num <= F.col("q_num"))).cast("int")
            ).cast("long").alias("n_covered"),
        )
    )
    return (
        test.join(F.broadcast(qhat), "source")
        .join(mu_b, "source")
        .select(
            "source",
            "n_cal",
            "n_test",
            F.round(F.col("q_num").cast("double") / F.col("n_tr"), 4).alias(
                "q_hat"
            ),
            F.round(F.col("n_covered").cast("double") / F.col("n_test"), 6).alias(
                "coverage"
            ),
            F.lit((100 - CONF_ALPHA_PCT) / 100.0).alias("target"),
        )
        .orderBy("source")
    )


@query(
    "two_way_effects_decomposition",
    oracle="""
    WITH ev AS (
      SELECT dayofweek(ts) + 1 AS dow, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    cell AS (
      SELECT dow, event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s
      FROM ev GROUP BY 1, 2
    ),
    rowm AS (SELECT dow, CAST(sum(n) AS BIGINT) AS n,
                    CAST(sum(s) AS BIGINT) AS s FROM cell GROUP BY dow),
    colm AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n,
                    CAST(sum(s) AS BIGINT) AS s FROM cell GROUP BY event_type),
    g AS (SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS s
          FROM cell),
    resid AS (
      SELECT cell.dow,
             abs(CAST(cell.s AS DOUBLE) / cell.n
                 - CAST(rowm.s AS DOUBLE) / rowm.n
                 - CAST(colm.s AS DOUBLE) / colm.n
                 + CAST(g.s AS DOUBLE) / g.n) AS r
      FROM cell JOIN rowm USING (dow) JOIN colm USING (event_type) CROSS JOIN g
    )
    SELECT rowm.dow, rowm.n AS n_events,
           round((CAST(rowm.s AS DOUBLE) / rowm.n
                  - CAST(g.s AS DOUBLE) / g.n) / 100, 4) AS dow_effect,
           round((SELECT max(r) FROM resid WHERE resid.dow = rowm.dow) / 100, 4)
             AS max_abs_interaction
    FROM rowm CROSS JOIN g
    ORDER BY rowm.dow
    """,
)
def two_way_effects_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive two-way effects decomposition of event value over
    day-of-week × event-type (the median-polish-shaped profiling
    table, one pass instead of iterations): each weekday's main
    effect against the grand mean, plus the largest interaction
    residual |cell − row − col + grand| that weekday carries — a big
    residual means "this metric does NOT decompose additively here"
    (e.g. purchases spike only on weekend evenings), which is exactly
    what a seasonality-naive forecaster needs flagged.

    Exactness: values quantize to integer cents before any reduce;
    every mean is one division of exact integer sums in a fixed dag —
    both engines produce bit-identical doubles, so even the max-
    residual argmax agrees; outputs round once. Weekday numbering is
    pinned to Spark's 1=Sunday..7=Saturday (DuckDB's 0-based
    dayofweek is shifted in the oracle).

    Scale: one (dow,type) hash agg over the scan — the two marginals
    and the grand total reduce the ≤35-cell frame; everything after
    the first agg is constant-sized.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.dayofweek("ts").alias("dow"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cell = scoped_persist(
        ev.groupBy("dow", "event_type").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("s"),
        )
    )
    rowm = cell.groupBy("dow").agg(
        F.sum("n").cast("long").alias("rn"), F.sum("s").cast("long").alias("rs")
    )
    colm = cell.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("cn"), F.sum("s").cast("long").alias("cs")
    )
    g = cell.agg(
        F.sum("n").cast("long").alias("gn"), F.sum("s").cast("long").alias("gs")
    )
    mean = lambda s, n: F.col(s).cast("double") / F.col(n)  # noqa: E731
    resid = (
        cell.join(F.broadcast(rowm), "dow")
        .join(F.broadcast(colm), "event_type")
        .crossJoin(F.broadcast(g))
        .select(
            "dow",
            F.abs(
                mean("s", "n") - mean("rs", "rn") - mean("cs", "cn")
                + mean("gs", "gn")
            ).alias("r"),
        )
        .groupBy("dow")
        .agg(F.max("r").alias("max_r"))
    )
    return (
        rowm.crossJoin(F.broadcast(g))
        .join(F.broadcast(resid), "dow")
        .select(
            "dow",
            F.col("rn").alias("n_events"),
            F.round((mean("rs", "rn") - mean("gs", "gn")) / 100, 4).alias(
                "dow_effect"
            ),
            F.round(F.col("max_r") / 100, 4).alias("max_abs_interaction"),
        )
        .orderBy("dow")
    )


PROFILE_COLS = [
    ("o_orderkey", "o_orderkey"),
    ("o_custkey", "o_custkey"),
    ("o_orderstatus", "o_orderstatus"),
    ("o_totalprice", "o_totalprice"),
    ("o_orderpriority", "o_orderpriority"),
]


@query(
    "column_profile_audit",
    oracle=" UNION ALL ".join(
        f"""
    SELECT '{name}' AS col_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN {expr} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           CAST(count(DISTINCT {expr}) AS BIGINT) AS n_distinct,
           CAST(min({expr}) AS VARCHAR) AS min_str,
           CAST(max({expr}) AS VARCHAR) AS max_str
    FROM orders"""
        for name, expr in PROFILE_COLS
    )
    + " ORDER BY col_name",
)
def column_profile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile (the stats table every optimizer
    and data-quality dashboard starts from): per column — row count,
    null count, exact NDV, min and max (stringified so one schema
    carries every type). The exact companion to
    ``approx_distinct_audit``: this is what the sketch is audited
    against, and the profile a warehouse publishes in its catalog.

    Exactness: counts/NDV are exact integers; min/max stringification
    pins doubles via the same float→string rule in both lanes
    (values in orders stringify identically).

    Scale: ONE pass — all five columns profile in a single grouping
    of the scan (count/min/max are map-side combined; the exact NDVs
    are per-column distinct aggregates Spark plans as one
    expand+partial-agg). At 100 TB swap exact NDV for the HLL
    sketch audited by ``approx_distinct_audit``; min/max/null stay
    exact at any scale.
    """
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for name, _ in PROFILE_COLS:
        c = F.col(name)
        aggs += [
            F.sum(c.isNull().cast("int")).cast("long").alias(f"null_{name}"),
            F.countDistinct(c).cast("long").alias(f"ndv_{name}"),
            F.min(c).cast("string").alias(f"min_{name}"),
            F.max(c).cast("string").alias(f"max_{name}"),
        ]
    wide = o.agg(*aggs)  # ONE scan; the NDVs plan as a single Expand
    stack = ", ".join(
        f"'{name}', null_{name}, ndv_{name}, min_{name}, max_{name}"
        for name, _ in PROFILE_COLS
    )
    return (
        wide.selectExpr(
            "n_rows",
            f"stack({len(PROFILE_COLS)}, {stack}) AS "
            "(col_name, n_null, n_distinct, min_str, max_str)",
        )
        .select("col_name", "n_rows", "n_null", "n_distinct", "min_str", "max_str")
        .orderBy("col_name")
    )


QTE_QUANTILES = [25, 50, 75, 90]  # percent ranks compared across variants


@query(
    "quantile_treatment_effects",
    oracle=f"""
    WITH m AS (
      SELECT user_id % 2 AS variant,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_type = '{CUPED_METRIC}'
      GROUP BY user_id
    ),
    ranked AS (
      SELECT variant, cents,
             row_number() OVER (PARTITION BY variant ORDER BY cents) AS rk,
             count(*) OVER (PARTITION BY variant) AS n
      FROM m
    ),
    q AS (
      SELECT variant, qp,
             max(CASE WHEN rk = CAST(ceil(qp * n / 100.0) AS BIGINT)
                      THEN cents END) AS qv
      FROM ranked
      CROSS JOIN (SELECT unnest({list(QTE_QUANTILES)}) AS qp)
      GROUP BY variant, qp
    )
    SELECT a.qp AS quantile_pct,
           round(a.qv / 100.0, 2) AS control_value,
           round(b.qv / 100.0, 2) AS treatment_value,
           round((b.qv - a.qv) / 100.0, 2) AS qte
    FROM q a JOIN q b ON a.qp = b.qp AND a.variant = 0 AND b.variant = 1
    ORDER BY quantile_pct
    """,
)
def quantile_treatment_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects (the distributional companion to
    ``cuped_adjusted_abtest``'s mean shift — Doksum 1974's quantile
    difference): per-user purchase value at the 25/50/75/90th
    percentile in each variant, and the per-quantile lift. A
    treatment that only moves the p90 whale tail looks identical to a
    broad shift in a means-only readout; QTE is how experimenters
    tell them apart.

    Exactness: per-user metrics quantize to integer cents; quantiles
    are DISCRETE ranks (the ⌈q·n⌉-th smallest actual value, the repo
    percentile rule) — integers end to end, one display division.

    Scale: one hash agg to |users|, one rank window per variant
    partition, a 4-row quantile spine — nothing data-sized after the
    first agg.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == CUPED_METRIC
    )
    m = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents")
    ).select((F.col("user_id") % 2).alias("variant"), "cents")
    w = Window.partitionBy("variant").orderBy("cents")
    ranked = m.select(
        "variant",
        "cents",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy("variant")).alias("n"),
    )
    qspine = spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(f"({q})" for q in QTE_QUANTILES)
        + " AS t(qp)"
    )
    q = (
        ranked.crossJoin(F.broadcast(qspine))
        .groupBy("variant", "qp")
        .agg(
            F.max(
                F.when(
                    F.col("rk")
                    == F.ceil(F.col("qp") * F.col("n") / 100.0).cast("long"),
                    F.col("cents"),
                )
            ).alias("qv")
        )
    )
    a = q.filter(F.col("variant") == 0).select("qp", F.col("qv").alias("qa"))
    b = q.filter(F.col("variant") == 1).select("qp", F.col("qv").alias("qb"))
    return (
        a.join(b, "qp")
        .select(
            F.col("qp").alias("quantile_pct"),
            F.round(F.col("qa") / 100.0, 2).alias("control_value"),
            F.round(F.col("qb") / 100.0, 2).alias("treatment_value"),
            F.round((F.col("qb") - F.col("qa")) / 100.0, 2).alias("qte"),
        )
        .orderBy("quantile_pct")
    )


@query(
    "mann_kendall_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type,
             CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sg
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.d < b.d
    ),
    s AS (
      SELECT event_type, CAST(sum(sg) AS BIGINT) AS s_stat,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM pairs GROUP BY event_type
    ),
    ties AS (
      SELECT event_type, CAST(sum(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT)
               AS tie_term,
             CAST(sum(tc) AS BIGINT) AS n
      FROM (SELECT event_type, y, count(*) AS tc FROM daily GROUP BY 1, 2)
      GROUP BY event_type
    )
    SELECT s.event_type, ties.n AS n_days, s.s_stat,
           round((s.s_stat - CASE WHEN s.s_stat > 0 THEN 1
                                  WHEN s.s_stat < 0 THEN -1 ELSE 0 END)
                 / nullif(sqrt((ties.n * (ties.n - 1) * (2 * ties.n + 5)
                                - ties.tie_term) / 18.0), 0), 4) AS mk_z
    FROM s JOIN ties USING (event_type)
    ORDER BY s.event_type
    """,
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test (Mann 1945 / Kendall — THE
    nonparametric monotone-trend test, the hypothesis-test companion
    to ``theil_sen_trend``'s slope estimate): S = Σ sign(y_j − y_i)
    over all day pairs per event type, variance with the exact tie
    correction, continuity-corrected Z. Works on any monotone trend
    without assuming linearity or normality — the right first test
    for "is this metric drifting?".

    Exactness: S, the pair count, and the tie-corrected variance
    numerator are exact integers; Z is one division + sqrt over them,
    rounded once.

    Scale: the pair join is over the |types|·|days| series table
    (tiny after the first hash agg), never over raw events — same
    shape as ``rolling_median_7d``.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count("*").cast("long").alias("y"))
    )
    daily = scoped_persist(daily)
    a = daily.select("event_type", F.col("d").alias("da"), F.col("y").alias("ya"))
    b = daily.select("event_type", F.col("d").alias("db"), F.col("y").alias("yb"))
    sg = (
        F.when(F.col("yb") > F.col("ya"), 1)
        .when(F.col("yb") < F.col("ya"), -1)
        .otherwise(0)
    )
    s = (
        a.join(b, "event_type")
        .filter(F.col("da") < F.col("db"))
        .select("event_type", sg.alias("sg"))
        .groupBy("event_type")
        .agg(F.sum("sg").cast("long").alias("s_stat"))
    )
    tc = daily.groupBy("event_type", "y").agg(F.count("*").alias("tc"))
    ties = tc.groupBy("event_type").agg(
        F.sum(F.col("tc") * (F.col("tc") - 1) * (2 * F.col("tc") + 5))
        .cast("long")
        .alias("tie_term"),
        F.sum("tc").cast("long").alias("n"),
    )
    cc = (
        F.when(F.col("s_stat") > 0, 1)
        .when(F.col("s_stat") < 0, -1)
        .otherwise(0)
    )
    var18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term")
    ) / 18.0
    return (
        s.join(ties, "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            "s_stat",
            # var18 = 0 (single day, or all daily counts tied) → NULL,
            # not DIVIDE_BY_ZERO under ANSI; oracle mirrors the nullif.
            F.round(
                (F.col("s_stat") - cc) / F.nullif(F.sqrt(var18), F.lit(0.0)), 4
            ).alias("mk_z"),
        )
        .orderBy("event_type")
    )


MCN_BOUNDARY = "2024-01-16"  # same pre/post split as CUPED


@query(
    "mcnemar_paired_test",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             max(CASE WHEN ts < TIMESTAMP '{MCN_BOUNDARY}'
                      AND event_type = 'purchase' THEN 1 ELSE 0 END) AS pre,
             max(CASE WHEN ts >= TIMESTAMP '{MCN_BOUNDARY}'
                      AND event_type = 'purchase' THEN 1 ELSE 0 END) AS post
      FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN pre = 1 AND post = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS both_periods,
           CAST(sum(CASE WHEN pre = 1 AND post = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS pre_only,
           CAST(sum(CASE WHEN pre = 0 AND post = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS post_only,
           round(CAST((sum(CASE WHEN pre = 1 AND post = 0 THEN 1 ELSE 0 END)
                       - sum(CASE WHEN pre = 0 AND post = 1 THEN 1 ELSE 0 END))
                      * (sum(CASE WHEN pre = 1 AND post = 0 THEN 1 ELSE 0 END)
                         - sum(CASE WHEN pre = 0 AND post = 1 THEN 1 ELSE 0 END))
                      AS DOUBLE)
                 / nullif(sum(CASE WHEN pre = 1 AND post = 0 THEN 1 ELSE 0 END)
                          + sum(CASE WHEN pre = 0 AND post = 1 THEN 1 ELSE 0 END),
                          0), 4) AS mcnemar_chi2
    FROM u
    """,
)
def mcnemar_paired_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test (1947) for PAIRED binary outcomes: did each
    user purchase in the pre vs post period? Only the discordant
    users carry information — χ² = (b−c)²/(b+c) over pre-only (b) and
    post-only (c) converters. The paired design removes between-user
    variance entirely, which is why pre/post product changes are
    tested this way rather than with the two-proportion z-test
    (``abtest_two_proportion_z``) that ignores the pairing.

    Exactness: the 2×2 concordance cells are exact integers; χ² is
    one integer-product division, rounded once (nullif-guarded when
    no user switched).

    Scale: one hash agg to |users| with two boolean max aggregates,
    then a single global reduce.
    """
    boundary = F.lit(MCN_BOUNDARY).cast("timestamp")
    is_purchase = F.col("event_type") == "purchase"
    u = load_table(spark, sf_dir, "events").groupBy("user_id").agg(
        F.max(((F.col("ts") < boundary) & is_purchase).cast("int")).alias("pre"),
        F.max(((F.col("ts") >= boundary) & is_purchase).cast("int")).alias("post"),
    )
    b = F.sum(((F.col("pre") == 1) & (F.col("post") == 0)).cast("int")).cast("long")
    c = F.sum(((F.col("pre") == 0) & (F.col("post") == 1)).cast("int")).cast("long")
    return u.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum(((F.col("pre") == 1) & (F.col("post") == 1)).cast("int"))
        .cast("long")
        .alias("both_periods"),
        b.alias("pre_only"),
        c.alias("post_only"),
        F.round(
            ((b - c) * (b - c)).cast("double")
            / F.nullif((b + c).cast("double"), F.lit(0.0)),
            4,
        ).alias("mcnemar_chi2"),
    )


PW_Z_ALPHA = 1.959964  # two-sided alpha = 0.05
PW_Z_BETA = 0.841621  # power = 0.80
PW_LIFTS = (1, 2, 5, 10, 20)  # relative MDE grid, percent


@query(
    "abtest_power_mde",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST(CASE WHEN
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             THEN 1 ELSE 0 END AS BIGINT) AS converted
      FROM events GROUP BY user_id
    ),
    base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(converted) AS BIGINT) AS conv_users
      FROM u
    ),
    grid AS (SELECT * FROM (VALUES {", ".join(f"({L})" for L in PW_LIFTS)})
             AS t(lift_pct))
    SELECT g.lift_pct, b.n_users,
           round(p, 6) AS p_base,
           CASE WHEN p * (1 + g.lift_pct / 100.0) < 1 THEN
             CAST(ceil(
               power({PW_Z_ALPHA} * sqrt(2.0
                       * ((p + p * (1 + g.lift_pct / 100.0)) / 2)
                       * (1 - (p + p * (1 + g.lift_pct / 100.0)) / 2))
                     + {PW_Z_BETA} * sqrt(p * (1 - p)
                       + p * (1 + g.lift_pct / 100.0)
                         * (1 - p * (1 + g.lift_pct / 100.0))), 2)
               / power(p * g.lift_pct / 100.0, 2)
             ) AS BIGINT)
           END AS required_n_per_arm
    FROM base b CROSS JOIN grid g
    CROSS JOIN (SELECT CAST(conv_users AS DOUBLE) / n_users AS p FROM base)
    ORDER BY g.lift_pct
    """,
)
def abtest_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test POWER ANALYSIS — the question every experiment design
    starts with: at the observed baseline conversion rate (the same
    purchases-beat-views per-user conversion
    ``abtest_two_proportion_z`` reads out), how many users per arm
    does it take to detect a +1/2/5/10/20% relative lift at
    alpha = 0.05 (two-sided) with 80% power? Standard
    two-proportion formula n = (z_a·sqrt(2·p̄q̄) + z_b·sqrt(p1q1 +
    p2q2))² / Δ² with the normal quantiles as LITERAL constants
    (1.959964, 0.841621) — no CDF evaluation anywhere, so both
    engines run the identical +,·,/,sqrt,ceil dag (sqrt is IEEE
    correctly-rounded; exp/ln never appear). The design-time
    companion to ``abtest_two_proportion_z``'s readout.

    Exactness: the baseline (n_users, conv_users) is an exact integer
    pair; each grid row is one fixed float expression over it,
    identical operation order in both lanes.

    Scale: one user-keyed aggregate (partial max) to two counters,
    then a 5-row literal grid broadcast — nothing after the agg is
    data-sized.
    """
    e = load_table(spark, sf_dir, "events")
    base = (
        e.groupBy("user_id")
        .agg(
            (
                F.sum((F.col("event_type") == "purchase").cast("int"))
                > F.sum((F.col("event_type") == "view").cast("int"))
            )
            .cast("long")
            .alias("converted")
        )
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("converted").cast("long").alias("conv_users"),
        )
    )
    grid = spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(f"({L})" for L in PW_LIFTS)
        + " AS t(lift_pct)"
    )
    p = F.col("conv_users").cast("double") / F.col("n_users")
    p2 = p * (1 + F.col("lift_pct") / 100.0)
    pbar = (p + p2) / 2
    # A lift that pushes p2 past 1 has no binomial meaning: NULL in
    # both lanes (also keeps the sqrt arguments non-negative).
    n_req = F.when(
        p2 < 1,
        F.ceil(
            F.pow(
                PW_Z_ALPHA * F.sqrt(2.0 * pbar * (1 - pbar))
                + PW_Z_BETA * F.sqrt(p * (1 - p) + p2 * (1 - p2)),
                F.lit(2),
            )
            / F.pow(p * F.col("lift_pct") / 100.0, F.lit(2))
        ).cast("long"),
    )
    return (
        base.crossJoin(F.broadcast(grid))
        .select(
            "lift_pct",
            "n_users",
            F.round(p, 6).alias("p_base"),
            n_req.alias("required_n_per_arm"),
        )
        .orderBy("lift_pct")
    )


# Wald SPRT literals, precomputed to integer NANO-NATS so the daily
# log-likelihood increments are exact integer products in both lanes:
# H0: p = 0.45 vs H1: p = 0.55 on the purchases-vs-views daily mix,
# alpha = beta = 0.05.
SPRT_C1_NANO = 200_670_695  # ln(0.55/0.45) * 1e9, rounded
SPRT_C0_NANO = -200_670_695  # ln(0.45/0.55) * 1e9, rounded
SPRT_UPPER_NANO = 2_944_438_979  # ln((1-beta)/alpha) * 1e9
SPRT_LOWER_NANO = -2_944_438_979  # ln(beta/(1-alpha)) * 1e9


@query(
    "sprt_boundary_scan",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type IN ('purchase', 'view')
                           THEN 1 ELSE 0 END) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    path AS (
      SELECT d, x, n,
             CAST(sum(x * {SPRT_C1_NANO} + (n - x) * {SPRT_C0_NANO})
                  OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum_llr_nano
      FROM daily
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, x AS purchases, n AS trials,
           cum_llr_nano,
           CASE WHEN cum_llr_nano >= {SPRT_UPPER_NANO} THEN 'accept_h1'
                WHEN cum_llr_nano <= {SPRT_LOWER_NANO} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM path
    ORDER BY day
    """,
)
def sprt_boundary_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's Sequential Probability Ratio Test (Wald 1945) over the
    daily purchase-share series — the always-valid sequential monitor
    behind every "peek early without p-hacking" experimentation
    feature: each day adds x·ln(p1/p0) + (n−x)·ln(q1/q0) to the
    running log-likelihood ratio, and the run stops the first day the
    path crosses ln((1−β)/α) above (accept H1) or ln(β/(1−α)) below
    (accept H0). Reports the full decision path.

    Exactness: the four transcendental constants are precomputed
    integer NANO-NAT literals, so every daily increment is an exact
    integer product and the cumulative path is an associative integer
    sum — the repo's ln-reduce idiom applied to a sequential test; no
    float enters until never.

    Scale: one hash agg to |days| rows, one ordered prefix sum over
    that tiny series (single partition of days — the series, not the
    events, is what's windowed).
    """
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum((F.col("event_type") == "purchase").cast("int"))
            .cast("long")
            .alias("x"),
            F.sum(F.col("event_type").isin("purchase", "view").cast("int"))
            .cast("long")
            .alias("n"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum(
        F.col("x") * SPRT_C1_NANO + (F.col("n") - F.col("x")) * SPRT_C0_NANO
    ).over(w).cast("long")
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("x").alias("purchases"),
        F.col("n").alias("trials"),
        cum.alias("cum_llr_nano"),
    ).select(
        "day",
        "purchases",
        "trials",
        "cum_llr_nano",
        F.when(F.col("cum_llr_nano") >= SPRT_UPPER_NANO, "accept_h1")
        .when(F.col("cum_llr_nano") <= SPRT_LOWER_NANO, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Round 9 additions: multiple-testing control, variance homogeneity,
# inter-rater agreement, KMV distinct sketch, survival analysis, and
# two causal-inference estimators (DiD, IPW).
# ---------------------------------------------------------------------------

BH_ALPHA_MICRO = 200_000  # alpha = 0.2 in micro units
BH_CONV_VALUE = 50  # an event "converts" when value >= 50


@query(
    "benjamini_hochberg_fdr",
    oracle=f"""
    WITH per AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN value >= {BH_CONV_VALUE} THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM events GROUP BY event_type
    ),
    g AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                 CAST(sum(x) AS BIGINT) AS xx FROM per),
    zs AS (
      SELECT event_type, n, x,
             (CAST(x AS DOUBLE) / n
              - CAST(xx - x AS DOUBLE) / nullif(nn - n, 0))
             / nullif(sqrt((CAST(xx AS DOUBLE) / nn)
                           * (1 - CAST(xx AS DOUBLE) / nn)
                           * (1.0 / n + 1.0 / nullif(nn - n, 0))), 0) AS z
      FROM per CROSS JOIN g
    ),
    pb AS (
      SELECT event_type, n, x, z,
             least(coalesce(CAST(round(1000000 * 2 * exp(-(z * z) / 2))
                                 AS BIGINT), 1000000),
                   1000000) AS p_micro
      FROM zs
    ),
    ranked AS (
      SELECT *, CAST(row_number() OVER (ORDER BY p_micro, event_type)
                     AS BIGINT) AS i,
             CAST(count(*) OVER () AS BIGINT) AS m
      FROM pb
    ),
    kk AS (
      SELECT *, max(CASE WHEN p_micro * m <= {BH_ALPHA_MICRO} * i THEN i END)
                  OVER () AS k
      FROM ranked
    )
    SELECT event_type, n AS n_events, x AS n_conv,
           round(z, 4) AS z_stat,
           round(p_micro / 1000000.0, 6) AS p_chernoff,
           i AS bh_rank, i <= coalesce(k, 0) AS rejected
    FROM kk ORDER BY bh_rank
    """,
)
def benjamini_hochberg_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control (Benjamini & Hochberg
    1995 — THE multiple-testing correction every experimentation and
    data-quality platform applies when it runs one test per segment):
    each event type's conversion rate (value >= {50}) is z-tested
    against the pooled rest, p-values come from the sub-Gaussian
    Chernoff bound min(1, 2·exp(-z²/2)) (a valid CONSERVATIVE
    p-value that both engines can compute without an erf/normal-CDF
    builtin), and the step-up rule rejects H0 for every rank i <=
    max{{ j : p_(j) <= alpha·j/m }}.

    Exactness: the test cells are integer sums; z is one fixed float
    dag over them; the p-value is quantized to integer micro units
    BEFORE ranking, so the BH ordering, the step-up comparison
    p_micro·m <= ALPHA_MICRO·j, and the rejection frontier are all
    integer arithmetic — no float comparison decides a row. The
    degenerate all-convert / none-convert shapes (xx=0 or xx=nn) zero
    the pooled variance: both lanes nullif that denominator (NULL z)
    and coalesce p to exactly 1.0, so ranking never sees a NULL whose
    sort position differs between engines (r9 ADVICE; fixtures in
    tests/test_round10_ops.py).

    Scale: one hash agg to |event types| rows; the BH scan is a
    window over that already-tiny frame (m tests, not m rows of
    data). At a million segments the same plan holds — the window
    sorts m test STATISTICS, never events.
    """
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("value") >= BH_CONV_VALUE).cast("int"))
        .cast("long")
        .alias("x"),
    )
    g = per.agg(
        F.sum("n").cast("long").alias("nn"), F.sum("x").cast("long").alias("xx")
    )
    zs = per.crossJoin(F.broadcast(g))
    z = (
        F.col("x").cast("double") / F.col("n")
        - (F.col("xx") - F.col("x")).cast("double")
        / F.nullif(F.col("nn") - F.col("n"), F.lit(0))
    ) / F.nullif(
        F.sqrt(
            (F.col("xx").cast("double") / F.col("nn"))
            * (1 - F.col("xx").cast("double") / F.col("nn"))
            * (1.0 / F.col("n") + 1.0 / F.nullif(F.col("nn") - F.col("n"), F.lit(0)))
        ),
        F.lit(0.0),
    )
    pb = zs.select(
        "event_type", "n", "x", z.alias("z"),
        F.least(
            F.coalesce(
                F.round(1_000_000 * 2 * F.exp(-(z * z) / 2)).cast("long"),
                F.lit(1_000_000).cast("long"),
            ),
            F.lit(1_000_000).cast("long"),
        ).alias("p_micro"),
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = pb.select(
        "*",
        F.row_number()
        .over(Window.partitionBy().orderBy("p_micro", "event_type"))
        .cast("long")
        .alias("i"),
        F.count("*").over(w_all).cast("long").alias("m"),
    )
    kk = ranked.select(
        "*",
        F.max(
            F.when(
                F.col("p_micro") * F.col("m") <= BH_ALPHA_MICRO * F.col("i"),
                F.col("i"),
            )
        )
        .over(w_all)
        .alias("k"),
    )
    return kk.select(
        "event_type",
        F.col("n").alias("n_events"),
        F.col("x").alias("n_conv"),
        F.round("z", 4).alias("z_stat"),
        F.round(F.col("p_micro") / 1_000_000.0, 6).alias("p_chernoff"),
        F.col("i").alias("bh_rank"),
        (F.col("i") <= F.coalesce(F.col("k"), F.lit(0))).alias("rejected"),
    ).orderBy("bh_rank")


@query(
    "brown_forsythe_variance",
    oracle="""
    WITH med AS (
      SELECT lang, CAST(round(2 * quantile_cont(n_chars, 0.5)) AS BIGINT)
               AS med2
      FROM documents GROUP BY lang
    ),
    z AS (
      SELECT d.lang, abs(2 * d.n_chars - m.med2) AS z
      FROM documents d JOIN med m ON d.lang = m.lang
    ),
    g AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(z) AS BIGINT) AS sg,
             CAST(sum(z * z) AS BIGINT) AS qg
      FROM z GROUP BY lang
    ),
    tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(sum(sg) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS k FROM g),
    terms AS (
      SELECT CAST(round(1000000 * (CAST(qg AS DOUBLE)
                                   - CAST(sg AS DOUBLE) * sg / ng))
                  AS BIGINT) AS w_micro,
             CAST(round(1000000 * (CAST(sg AS DOUBLE)
                                   - CAST(ng AS DOUBLE) * s / n)
                                * (CAST(sg AS DOUBLE)
                                   - CAST(ng AS DOUBLE) * s / n) / ng)
                  AS BIGINT) AS b_micro
      FROM g CROSS JOIN tot
    ),
    agg AS (SELECT CAST(sum(w_micro) AS BIGINT) AS w,
                   CAST(sum(b_micro) AS BIGINT) AS b FROM terms)
    SELECT t.k AS k_groups, t.n AS n_docs,
           round(((t.n - t.k) / CAST(nullif(t.k - 1, 0) AS DOUBLE))
                 * (b / CAST(nullif(w, 0) AS DOUBLE)), 4) AS bf_stat
    FROM agg CROSS JOIN tot t
    """,
)
def brown_forsythe_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test for variance homogeneity across languages
    (Brown & Forsythe 1974 — Levene's test with the group MEDIAN
    center, the robust default; the precondition check behind ANOVA's
    equal-variance assumption, see ``anova_doclen_by_source``):
    deviations z_ij = |x_ij - med_g| feed a one-way ANOVA F statistic.

    Exactness: medians of integers interpolate to half-integers, so
    BOTH lanes carry 2·median and z_ij = |2x - med2| stays INTEGER;
    per-group n/Σz/Σz² are integer aggregates; each group's within/
    between term is quantized to micro units and the cross-group
    reduce is an integer sum (the micro-nat idiom applied to sums of
    squares) — no float accumulation order anywhere.

    Scale: the per-group median is the one exact-sort step (oracle
    shape; swap approx_percentile at 100 TB), the deviation pass is a
    broadcast-join projection, and everything after is a |langs|-row
    frame.
    """
    d = load_table(spark, sf_dir, "documents")
    med = d.groupBy("lang").agg(
        F.round(2 * F.expr("percentile(n_chars, 0.5)")).cast("long").alias("med2")
    )
    z = d.join(F.broadcast(med), "lang").select(
        "lang", F.abs(2 * F.col("n_chars") - F.col("med2")).alias("z")
    )
    g = z.groupBy("lang").agg(
        F.count("*").cast("long").alias("ng"),
        F.sum("z").cast("long").alias("sg"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("qg"),
    )
    tot = g.agg(
        F.sum("ng").cast("long").alias("n"),
        F.sum("sg").cast("long").alias("s"),
        F.count("*").cast("long").alias("k"),
    )
    dev = F.col("sg").cast("double") - F.col("ng").cast("double") * F.col("s") / F.col("n")
    terms = g.crossJoin(F.broadcast(tot)).select(
        F.round(
            1_000_000
            * (F.col("qg").cast("double") - F.col("sg").cast("double") * F.col("sg") / F.col("ng"))
        )
        .cast("long")
        .alias("w_micro"),
        F.round(1_000_000 * dev * dev / F.col("ng")).cast("long").alias("b_micro"),
    )
    agg = terms.agg(
        F.sum("w_micro").cast("long").alias("w"),
        F.sum("b_micro").cast("long").alias("b"),
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        F.col("k").alias("k_groups"),
        F.col("n").alias("n_docs"),
        F.round(
            ((F.col("n") - F.col("k")) / F.nullif(F.col("k") - 1, F.lit(0)).cast("double"))
            * (F.col("b") / F.nullif(F.col("w"), F.lit(0)).cast("double")),
            4,
        ).alias("bf_stat"),
    )


KAPPA_CHARS = 300  # rater A: doc is "long-form" when n_chars >= 300
KAPPA_TOKS = 60    # rater B: doc is "long-form" when token count >= 60


@query(
    "cohens_kappa_raters",
    oracle=f"""
    WITH r AS (
      SELECT CASE WHEN n_chars >= {KAPPA_CHARS} THEN 1 ELSE 0 END AS ra,
             CASE WHEN len(string_split(text, ' ')) >= {KAPPA_TOKS}
                  THEN 1 ELSE 0 END AS rb
      FROM documents
    ),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(ra * rb) AS BIGINT) AS n11,
             CAST(sum(ra * (1 - rb)) AS BIGINT) AS n10,
             CAST(sum((1 - ra) * rb) AS BIGINT) AS n01,
             CAST(sum((1 - ra) * (1 - rb)) AS BIGINT) AS n00
      FROM r
    )
    SELECT n, n11, n10, n01, n00,
           round(CAST(n11 + n00 AS DOUBLE) / n, 6) AS po,
           round((CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                  + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
                 / (CAST(n AS DOUBLE) * n), 6) AS pe,
           round((CAST(n11 + n00 AS DOUBLE) / n
                  - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                     + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
                    / (CAST(n AS DOUBLE) * n))
                 / nullif(1 - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                               + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
                              / (CAST(n AS DOUBLE) * n), 0), 6) AS kappa
    FROM c
    """,
)
def cohens_kappa_raters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa inter-rater agreement (Cohen 1960 — the
    chance-corrected agreement statistic every labeling/annotation
    pipeline reports before trusting a heuristic labeler): two
    deterministic document "raters" (char-length >= {300} vs
    token-count >= {60}) produce a 2x2 confusion table; kappa =
    (p_o - p_e)/(1 - p_e) corrects raw agreement for the agreement
    chance alone would produce. The QA gate for weak-supervision
    label functions at corpus scale.

    Exactness: all four cells are integer sums; p_o/p_e/kappa are ONE
    fixed float dag over those integers written identically in both
    lanes, each output rounded once; 1 - p_e = 0 (degenerate
    all-one-cell table) yields NULL via nullif, not a crash.

    Scale: a single projection + one 4-counter global aggregate —
    map-side combined, nothing data-sized crosses the wire.
    """
    d = load_table(spark, sf_dir, "documents")
    r = d.select(
        (F.col("n_chars") >= KAPPA_CHARS).cast("int").alias("ra"),
        (F.size(F.split("text", " ")) >= KAPPA_TOKS).cast("int").alias("rb"),
    )
    c = r.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("ra") * F.col("rb")).cast("long").alias("n11"),
        F.sum(F.col("ra") * (1 - F.col("rb"))).cast("long").alias("n10"),
        F.sum((1 - F.col("ra")) * F.col("rb")).cast("long").alias("n01"),
        F.sum((1 - F.col("ra")) * (1 - F.col("rb"))).cast("long").alias("n00"),
    )
    po = (F.col("n11") + F.col("n00")).cast("double") / F.col("n")
    pe = (
        (F.col("n11") + F.col("n10")).cast("double") * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")).cast("double") * (F.col("n10") + F.col("n00"))
    ) / (F.col("n").cast("double") * F.col("n"))
    return c.select(
        "n", "n11", "n10", "n01", "n00",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / F.nullif(1 - pe, F.lit(0)), 6).alias("kappa"),
    )


KMV_K = 128     # sketch size (k-th minimum value)
KMV_TOL = 0.20  # verdict tolerance; measured max rel-err 8.9% (sf0.01)
_KMV_2_32 = 4294967296.0  # hash universe size as a double


@query(
    "kmv_distinct_audit",
    oracle=f"""
    WITH keys AS (SELECT DISTINCT CAST(l_partkey AS VARCHAR) AS w
                  FROM lineitem),
    h AS (SELECT DISTINCT CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT)
                   AS hv
          FROM keys),
    kth AS (SELECT CAST(max(hv) AS BIGINT) AS hk
            FROM (SELECT hv FROM h ORDER BY hv LIMIT {KMV_K})),
    ex AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM keys)
    SELECT e.n_exact, t.hk AS kth_hash,
           round(({KMV_K} - 1) * {_KMV_2_32} / t.hk, 2) AS kmv_estimate,
           abs(({KMV_K} - 1) * {_KMV_2_32} / t.hk - e.n_exact)
             <= {KMV_TOL} * e.n_exact AS within_tol
    FROM ex e CROSS JOIN kth t
    """,
)
def kmv_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002;
    the KMV/theta-sketch family behind Apache DataSketches): hash
    every key into [0, 2^32), keep the K smallest hash values, and
    estimate D = (K-1)·2^32/h_(K). Completes the sketch battery next
    to HLL (``hll_union_audit``), CMS and Bloom — KMV is the one that
    also supports set EXPRESSIONS (intersection/difference sizes) by
    sketch combination, which HLL cannot.

    Exactness: md5-derived hashes are identical integers in both
    lanes, so h_(K) itself crosses the oracle as a BIGINT — the
    sketch is exactly checked, not tolerance-checked; only the
    truth-vs-estimate VERDICT uses the {20}% tolerance (measured max
    relative error 8.9% at sf0.01 with K={128}, ~2.2x headroom; KMV
    sd is D/sqrt(K-2) ~ 8.9%).

    Scale: the K smallest values are a TakeOrdered HEAP (sort+limit,
    partial per partition, K rows merged at the driver) — never a
    global sort; at 100 TB per-partition KMV states merge by keeping
    the K smallest of the union, the same mergeable-sketch shape as
    the HLL entry.
    """
    li = load_table(spark, sf_dir, "lineitem")
    keys = li.select(F.col("l_partkey").cast("string").alias("w")).distinct()
    keys = scoped_persist(keys)
    h = keys.select(
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long").alias("hv")
    ).distinct()
    kth = (
        h.orderBy("hv")
        .limit(KMV_K)
        .agg(F.max("hv").cast("long").alias("hk"))
    )
    ex = keys.agg(F.count("*").cast("long").alias("n_exact"))
    est = (KMV_K - 1) * F.lit(_KMV_2_32) / F.col("hk")
    return ex.crossJoin(F.broadcast(kth)).select(
        "n_exact",
        F.col("hk").alias("kth_hash"),
        F.round(est, 2).alias("kmv_estimate"),
        (F.abs(est - F.col("n_exact")) <= KMV_TOL * F.col("n_exact")).alias(
            "within_tol"
        ),
    )


KM_VALUE_MIN = 200  # the "event": first purchase with value >= 200


@query(
    "kaplan_meier_survival",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST(min(ts) AS DATE) AS f,
             CAST(max(ts) AS DATE) AS l,
             CAST(min(CASE WHEN event_type = 'purchase'
                            AND value >= {KM_VALUE_MIN} THEN ts END)
                  AS DATE) AS p
      FROM events GROUP BY user_id
    ),
    obs AS (
      SELECT CASE WHEN p IS NOT NULL THEN date_diff('day', f, p)
                  ELSE date_diff('day', f, l) END AS t,
             CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS e
      FROM u
    ),
    grid AS (
      SELECT t, CAST(sum(e) AS BIGINT) AS d, CAST(count(*) AS BIGINT) AS c
      FROM obs GROUP BY t
    ),
    risk AS (
      SELECT t, d,
             (SELECT CAST(count(*) AS BIGINT) FROM obs)
               - coalesce(CAST(sum(c) OVER (ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                          AS BIGINT), 0) AS n
      FROM grid
    ),
    steps AS (
      SELECT t, n, d,
             CASE WHEN d < n THEN CAST(round(1000000000 *
                    ln(CAST(n - d AS DOUBLE) / n)) AS BIGINT) END AS term_nano,
             CASE WHEN d >= n THEN 1 ELSE 0 END AS absorb
      FROM risk
    ),
    cum AS (
      SELECT t, n, d,
             CAST(sum(term_nano) OVER (ORDER BY t) AS BIGINT) AS cum_nano,
             max(absorb) OVER (ORDER BY t) AS ab
      FROM steps
    )
    SELECT t AS t_days, n AS n_at_risk, d AS n_events,
           round(cum_nano / 1000000000.0, 6) AS log_survival_nats
    FROM cum WHERE d > 0 AND ab = 0
    ORDER BY t_days
    """,
)
def kaplan_meier_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival estimator (Kaplan & Meier
    1958 — THE survival curve under right censoring; here: per-user
    days from first event to first big purchase (value >= {200}),
    censored at the user's last observed day when no such purchase
    occurs — the conversion-latency curve with dropouts handled
    correctly, unlike a naive duration histogram which biases toward
    fast converters). Companion to ``churn_hazard_table`` (discrete
    hazards) with the cumulative-survival product made exact.

    Exactness: at-risk counts and death counts are integers; each
    step's ln(1 - d/n) is quantized ONCE to integer nano-nats and the
    cumulative product becomes a cumulative INTEGER sum in log space
    (the Kneser-Ney nano-nat idiom) — the result column is
    log-survival in nats, so no cross-libm exp() ever crosses the
    oracle; rows at/after the absorbing step (d = n, survival 0) are
    excluded in both lanes by the same cumulative flag.

    Scale: one user-keyed agg, a ~|distinct durations| grid (bounded
    by the observation window in days), and windows over that tiny
    grid — the heavy reduce is the first groupBy only.
    """
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("f"),
        F.to_date(F.max("ts")).alias("l"),
        F.to_date(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= KM_VALUE_MIN),
                    F.col("ts"),
                )
            )
        ).alias("p"),
    )
    obs = u.select(
        F.when(F.col("p").isNotNull(), F.datediff("p", "f"))
        .otherwise(F.datediff("l", "f"))
        .cast("long")
        .alias("t"),
        F.when(F.col("p").isNotNull(), 1).otherwise(0).alias("e"),
    )
    obs = scoped_persist(obs)
    grid = obs.groupBy("t").agg(
        F.sum("e").cast("long").alias("d"), F.count("*").cast("long").alias("c")
    )
    total = obs.agg(F.count("*").cast("long").alias("nn"))
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        grid.crossJoin(F.broadcast(total))
        .select(
            "t",
            "d",
            (
                F.col("nn")
                - F.coalesce(F.sum("c").over(w_prev).cast("long"), F.lit(0))
            ).alias("n"),
        )
    )
    steps = risk.select(
        "t",
        "n",
        "d",
        F.when(
            F.col("d") < F.col("n"),
            F.round(
                1_000_000_000
                * F.log((F.col("n") - F.col("d")).cast("double") / F.col("n"))
            ).cast("long"),
        ).alias("term_nano"),
        F.when(F.col("d") >= F.col("n"), 1).otherwise(0).alias("absorb"),
    )
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    cum = steps.select(
        "t",
        "n",
        "d",
        F.sum("term_nano").over(w_cum).cast("long").alias("cum_nano"),
        F.max("absorb").over(w_cum).alias("ab"),
    )
    return (
        cum.filter((F.col("d") > 0) & (F.col("ab") == 0))
        .select(
            F.col("t").alias("t_days"),
            F.col("n").alias("n_at_risk"),
            F.col("d").alias("n_events"),
            F.round(F.col("cum_nano") / 1_000_000_000.0, 6).alias(
                "log_survival_nats"
            ),
        )
        .orderBy("t_days")
    )


DID_SPLIT_DAY = 15  # post-period starts min_day + 15 (Jan data: mid-month)


@query(
    "did_estimator",
    oracle=f"""
    WITH cut AS (SELECT CAST(min(ts) AS DATE) + {DID_SPLIT_DAY} AS c
                 FROM events),
    base AS (
      SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS t,
             CASE WHEN CAST(ts AS DATE) >= cut.c THEN 1 ELSE 0 END AS post,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events CROSS JOIN cut
    ),
    cells AS (
      SELECT CAST(sum(CASE WHEN t = 1 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
             CAST(sum(CASE WHEN t = 1 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
             CAST(sum(CASE WHEN t = 0 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
             CAST(sum(CASE WHEN t = 0 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
             CAST(sum(CASE WHEN t = 1 AND post = 1 THEN cents ELSE 0 END) AS BIGINT) AS s11,
             CAST(sum(CASE WHEN t = 1 AND post = 0 THEN cents ELSE 0 END) AS BIGINT) AS s10,
             CAST(sum(CASE WHEN t = 0 AND post = 1 THEN cents ELSE 0 END) AS BIGINT) AS s01,
             CAST(sum(CASE WHEN t = 0 AND post = 0 THEN cents ELSE 0 END) AS BIGINT) AS s00
      FROM base
    )
    SELECT n11, n10, n01, n00,
           round(s11 / (100.0 * nullif(n11, 0)), 6) AS mean_treat_post,
           round(s10 / (100.0 * nullif(n10, 0)), 6) AS mean_treat_pre,
           round(s01 / (100.0 * nullif(n01, 0)), 6) AS mean_ctrl_post,
           round(s00 / (100.0 * nullif(n00, 0)), 6) AS mean_ctrl_pre,
           round(s11 / (100.0 * nullif(n11, 0)) - s10 / (100.0 * nullif(n10, 0))
                 - s01 / (100.0 * nullif(n01, 0)) + s00 / (100.0 * nullif(n00, 0)),
                 6) AS did_estimate
    FROM cells
    """,
)
def did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences treatment-effect estimator (Card &
    Krueger 1994 lineage — THE quasi-experimental workhorse when a
    change ships to one cohort at a known date): treatment = odd
    user_id (the deterministic hash-bucket stand-in), post-period =
    days >= min_day + {15}; DiD = (treat_post - treat_pre) -
    (ctrl_post - ctrl_pre) over event value, which differences away
    both the stable cohort gap and the common time trend. Completes
    the causal battery next to CUPED (variance reduction) and QTE
    (distributional effects).

    Exactness: values quantize to integer cents at the scan; all
    eight cells are integer sums; the four means and the DiD are one
    fixed float dag over those integers, each rounded once; empty
    cells give NULL (nullif), not a crash.

    Scale: ONE pass, one 8-counter global aggregate (map-side
    combined) after a broadcast of the 1-row date cut — no shuffle
    wider than a row.
    """
    e = load_table(spark, sf_dir, "events")
    cut = e.agg(F.date_add(F.to_date(F.min("ts")), DID_SPLIT_DAY).alias("c"))
    base = e.crossJoin(F.broadcast(cut)).select(
        F.when(F.col("user_id") % 2 == 1, 1).otherwise(0).alias("t"),
        F.when(F.to_date("ts") >= F.col("c"), 1).otherwise(0).alias("post"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )

    def cell(t: int, post: int, col, zero=0):
        return (
            F.sum(
                F.when((F.col("t") == t) & (F.col("post") == post), col).otherwise(
                    zero
                )
            )
            .cast("long")
        )

    cells = base.agg(
        cell(1, 1, F.lit(1)).alias("n11"),
        cell(1, 0, F.lit(1)).alias("n10"),
        cell(0, 1, F.lit(1)).alias("n01"),
        cell(0, 0, F.lit(1)).alias("n00"),
        cell(1, 1, F.col("cents")).alias("s11"),
        cell(1, 0, F.col("cents")).alias("s10"),
        cell(0, 1, F.col("cents")).alias("s01"),
        cell(0, 0, F.col("cents")).alias("s00"),
    )

    def mean(s: str, n: str):
        return F.col(s) / (100.0 * F.nullif(F.col(n), F.lit(0)))

    return cells.select(
        "n11", "n10", "n01", "n00",
        F.round(mean("s11", "n11"), 6).alias("mean_treat_post"),
        F.round(mean("s10", "n10"), 6).alias("mean_treat_pre"),
        F.round(mean("s01", "n01"), 6).alias("mean_ctrl_post"),
        F.round(mean("s00", "n00"), 6).alias("mean_ctrl_pre"),
        F.round(
            mean("s11", "n11") - mean("s10", "n10")
            - mean("s01", "n01") + mean("s00", "n00"),
            6,
        ).alias("did_estimate"),
    )


@query(
    "ipw_treatment_effect",
    oracle="""
    WITH base AS (
      SELECT event_type AS stratum,
             CASE WHEN user_id % 3 = 0
                   OR (event_type IN ('purchase', 'signup')
                       AND user_id % 3 = 1)
                  THEN 1 ELSE 0 END AS t,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    s AS (
      SELECT stratum, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(t) AS BIGINT) AS nt,
             CAST(sum(t * cents) AS BIGINT) AS yt,
             CAST(sum((1 - t) * cents) AS BIGINT) AS yc
      FROM base GROUP BY stratum
    ),
    terms AS (
      SELECT n, nt, yt, yc,
             CAST(round(10000.0 * yt * n / nullif(nt, 0)) AS BIGINT)
               AS m1_cmicro,
             CAST(round(10000.0 * yc * n / nullif(n - nt, 0)) AS BIGINT)
               AS m0_cmicro
      FROM s
    )
    SELECT CAST(count(*) AS BIGINT) AS n_strata,
           CAST(sum(n) AS BIGINT) AS n_events,
           round((CAST(sum(m1_cmicro) AS DOUBLE) - sum(m0_cmicro))
                 / 1000000.0 / sum(n), 6) AS ate_ipw,
           round(CAST(sum(yt) AS DOUBLE) / (100.0 * nullif(sum(nt), 0))
                 - CAST(sum(yc) AS DOUBLE)
                   / (100.0 * nullif(sum(n - nt), 0)), 6) AS ate_naive
    FROM terms
    """,
)
def ipw_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect (Horvitz
    & Thompson 1952 / Rosenbaum & Rubin 1983 — the standard
    de-confounder when assignment probability varies by stratum):
    assignment here is DELIBERATELY confounded with event type
    (purchase/signup strata are treated at 2/3, others at 1/3), so
    the naive treated-minus-control mean is biased toward expensive
    strata; weighting each observation by 1/p(stratum) — equivalently
    summing the per-stratum Horvitz-Thompson terms y_t·n_s/n_t —
    recovers the stratification-adjusted ATE. The demonstrated gap
    between ate_ipw and ate_naive IS the confounding.

    Exactness: per-stratum n/n_t/Σy are integer aggregates (cents);
    each stratum's HT term is quantized to cent-micro units and the
    cross-stratum reduce is an INTEGER sum; degenerate strata (no
    treated or no control rows) yield NULL terms via nullif and drop
    from the sums identically in both lanes.

    Scale: one stratum-keyed hash agg (|event types| groups), then a
    |strata|-row reduce — the IPW estimator never touches row-level
    weights at all.
    """
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        F.col("event_type").alias("stratum"),
        F.when(
            (F.col("user_id") % 3 == 0)
            | (
                F.col("event_type").isin("purchase", "signup")
                & (F.col("user_id") % 3 == 1)
            ),
            1,
        )
        .otherwise(0)
        .alias("t"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    s = base.groupBy("stratum").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("t").cast("long").alias("nt"),
        F.sum(F.col("t") * F.col("cents")).cast("long").alias("yt"),
        F.sum((1 - F.col("t")) * F.col("cents")).cast("long").alias("yc"),
    )
    terms = s.select(
        "n", "nt", "yt", "yc",
        F.round(
            10000.0 * F.col("yt") * F.col("n") / F.nullif(F.col("nt"), F.lit(0))
        )
        .cast("long")
        .alias("m1_cmicro"),
        F.round(
            10000.0
            * F.col("yc")
            * F.col("n")
            / F.nullif(F.col("n") - F.col("nt"), F.lit(0))
        )
        .cast("long")
        .alias("m0_cmicro"),
    )
    return terms.agg(
        F.count("*").cast("long").alias("n_strata"),
        F.sum("n").cast("long").alias("n_events"),
        F.round(
            (F.sum("m1_cmicro").cast("double") - F.sum("m0_cmicro"))
            / 1_000_000.0
            / F.sum("n"),
            6,
        ).alias("ate_ipw"),
        F.round(
            F.sum("yt").cast("double") / (100.0 * F.nullif(F.sum("nt"), F.lit(0)))
            - F.sum("yc").cast("double")
            / (100.0 * F.nullif(F.sum(F.col("n") - F.col("nt")), F.lit(0))),
            6,
        ).alias("ate_naive"),
    )


FLEISS_TERM = "data"  # rater C: doc mentions the term


@query(
    "fleiss_kappa_multirater",
    oracle=f"""
    WITH r AS (
      SELECT (CASE WHEN n_chars >= {KAPPA_CHARS} THEN 1 ELSE 0 END
              + CASE WHEN len(string_split(text, ' ')) >= {KAPPA_TOKS}
                     THEN 1 ELSE 0 END
              + CASE WHEN list_contains(string_split(text, ' '),
                                        '{FLEISS_TERM}')
                     THEN 1 ELSE 0 END) AS npos
      FROM documents
    ),
    terms AS (
      SELECT CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(npos * npos + (3 - npos) * (3 - npos) - 3)
                  AS BIGINT) AS s_agree,
             CAST(sum(npos) AS BIGINT) AS s_pos
      FROM r
    )
    SELECT n_items,
           round(CAST(s_agree AS DOUBLE) / (6 * n_items), 6) AS p_bar,
           round((CAST(s_pos AS DOUBLE) / (3 * n_items))
                   * (CAST(s_pos AS DOUBLE) / (3 * n_items))
                 + (1 - CAST(s_pos AS DOUBLE) / (3 * n_items))
                   * (1 - CAST(s_pos AS DOUBLE) / (3 * n_items)), 6) AS p_e,
           round((CAST(s_agree AS DOUBLE) / (6 * n_items)
                  - ((CAST(s_pos AS DOUBLE) / (3 * n_items))
                       * (CAST(s_pos AS DOUBLE) / (3 * n_items))
                     + (1 - CAST(s_pos AS DOUBLE) / (3 * n_items))
                       * (1 - CAST(s_pos AS DOUBLE) / (3 * n_items))))
                 / nullif(1 - ((CAST(s_pos AS DOUBLE) / (3 * n_items))
                       * (CAST(s_pos AS DOUBLE) / (3 * n_items))
                     + (1 - CAST(s_pos AS DOUBLE) / (3 * n_items))
                       * (1 - CAST(s_pos AS DOUBLE) / (3 * n_items))), 0), 6)
             AS fleiss_kappa
    FROM terms
    """,
)
def fleiss_kappa_multirater(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa for MULTI-rater agreement (Fleiss 1971 — the
    generalization of Cohen's two-rater kappa to any fixed rater
    count; the standard readout when 3+ labeling heuristics or
    annotators vote per item): three deterministic binary raters
    (char length, token count, term presence) vote on every document;
    per-item agreement P_i = (Σ_j n_ij² - n)/(n(n-1)) with n = 3
    averages to P̄, chance agreement P_e = Σ_j p_j², kappa =
    (P̄ - P_e)/(1 - P_e).

    Exactness: with binary categories, Σ_j n_ij² = npos² + (3-npos)²
    is integer per item, so BOTH the agreement numerator and the
    marginal totals are single integer sums; P̄/P_e/kappa are one
    fixed float dag over three integers, rounded once.

    Scale: one projection + one 2-counter global aggregate — the
    kappa of a billion-document triple-labeler run costs one scan.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    npos = (
        (F.col("n_chars") >= KAPPA_CHARS).cast("int")
        + (F.size(toks) >= KAPPA_TOKS).cast("int")
        + F.array_contains(toks, FLEISS_TERM).cast("int")
    )
    terms = d.select(npos.alias("npos")).agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum(
            F.col("npos") * F.col("npos")
            + (3 - F.col("npos")) * (3 - F.col("npos"))
            - 3
        )
        .cast("long")
        .alias("s_agree"),
        F.sum("npos").cast("long").alias("s_pos"),
    )
    p_bar = F.col("s_agree").cast("double") / (6 * F.col("n_items"))
    p_pos = F.col("s_pos").cast("double") / (3 * F.col("n_items"))
    p_e = p_pos * p_pos + (1 - p_pos) * (1 - p_pos)
    return terms.select(
        "n_items",
        F.round(p_bar, 6).alias("p_bar"),
        F.round(p_e, 6).alias("p_e"),
        F.round((p_bar - p_e) / F.nullif(1 - p_e, F.lit(0)), 6).alias(
            "fleiss_kappa"
        ),
    )


@query(
    "logrank_test",
    oracle=f"""
    WITH u AS (
      SELECT user_id, user_id % 2 AS grp,
             CAST(min(ts) AS DATE) AS f,
             CAST(max(ts) AS DATE) AS l,
             CAST(min(CASE WHEN event_type = 'purchase'
                            AND value >= {KM_VALUE_MIN} THEN ts END)
                  AS DATE) AS p
      FROM events GROUP BY user_id
    ),
    obs AS (
      SELECT grp,
             CASE WHEN p IS NOT NULL THEN date_diff('day', f, p)
                  ELSE date_diff('day', f, l) END AS t,
             CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS e
      FROM u
    ),
    grid AS (
      SELECT t,
             CAST(sum(e) AS BIGINT) AS d,
             CAST(sum(e * grp) AS BIGINT) AS d1,
             CAST(count(*) AS BIGINT) AS c,
             CAST(sum(grp) AS BIGINT) AS c1
      FROM obs GROUP BY t
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS nn,
                   CAST(sum(grp) AS BIGINT) AS nn1 FROM obs),
    risk AS (
      SELECT t, d, d1,
             nn - coalesce(CAST(sum(c) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS BIGINT), 0) AS n,
             nn1 - coalesce(CAST(sum(c1) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS BIGINT), 0) AS n1
      FROM grid CROSS JOIN tot
    ),
    terms AS (
      SELECT d, d1,
             CAST(round(1000000 * d * CAST(n1 AS DOUBLE) / n) AS BIGINT)
               AS e1_micro,
             CAST(round(1000000 * d * (CAST(n1 AS DOUBLE) / n)
                        * (1 - CAST(n1 AS DOUBLE) / n)
                        * (n - d) / nullif(n - 1, 0)) AS BIGINT) AS v_micro
      FROM risk WHERE d > 0
    )
    SELECT CAST(max(tt.nn1) AS BIGINT) AS n_treat,
           CAST(max(tt.nn - tt.nn1) AS BIGINT) AS n_ctrl,
           CAST(sum(d1) AS BIGINT) AS observed_treat,
           round(CAST(sum(e1_micro) AS DOUBLE) / 1000000, 6)
             AS expected_treat,
           round((CAST(sum(d1) AS DOUBLE)
                  - CAST(sum(e1_micro) AS DOUBLE) / 1000000)
                 * (CAST(sum(d1) AS DOUBLE)
                    - CAST(sum(e1_micro) AS DOUBLE) / 1000000)
                 / nullif(CAST(sum(v_micro) AS DOUBLE) / 1000000, 0), 4)
             AS logrank_chi2
    FROM terms CROSS JOIN tot tt
    """,
)
def logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test comparing two survival curves (Mantel 1966 /
    Peto & Peto 1972 — THE two-sample test under right censoring,
    the inferential companion to ``kaplan_meier_survival``'s
    estimator): treatment = odd user_id, same time-to-big-purchase
    framing; at each death time the treated group's observed deaths
    are compared to the hypergeometric expectation d·n1/n, and
    chi2 = (O1-E1)²/V with the standard variance term
    d·(n1/n)(1-n1/n)(n-d)/(n-1).

    Exactness: at-risk and death counts (overall and per group) are
    integers from ONE grid pass; each time's expectation and variance
    term is quantized to micro units and the across-times reduce is
    an INTEGER sum; the final chi2 is one fixed float dag over those
    sums. A single-at-risk time (n = 1) yields a NULL variance term
    via nullif and drops identically in both lanes.

    Scale: one user-keyed agg, a |distinct durations| grid with the
    same cumulative at-risk window as the KM entry (now carrying the
    group breakdown in the same pass), and a 4-sum reduce.
    """
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("f"),
        F.to_date(F.max("ts")).alias("l"),
        F.to_date(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= KM_VALUE_MIN),
                    F.col("ts"),
                )
            )
        ).alias("p"),
    ).withColumn("grp", F.col("user_id") % 2)
    obs = u.select(
        "grp",
        F.when(F.col("p").isNotNull(), F.datediff("p", "f"))
        .otherwise(F.datediff("l", "f"))
        .cast("long")
        .alias("t"),
        F.when(F.col("p").isNotNull(), 1).otherwise(0).alias("e"),
    )
    obs = scoped_persist(obs)
    grid = obs.groupBy("t").agg(
        F.sum("e").cast("long").alias("d"),
        F.sum(F.col("e") * F.col("grp")).cast("long").alias("d1"),
        F.count("*").cast("long").alias("c"),
        F.sum("grp").cast("long").alias("c1"),
    )
    tot = obs.agg(
        F.count("*").cast("long").alias("nn"),
        F.sum("grp").cast("long").alias("nn1"),
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = grid.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        "d1",
        (
            F.col("nn")
            - F.coalesce(F.sum("c").over(w_prev).cast("long"), F.lit(0))
        ).alias("n"),
        (
            F.col("nn1")
            - F.coalesce(F.sum("c1").over(w_prev).cast("long"), F.lit(0))
        ).alias("n1"),
    )
    p1 = F.col("n1").cast("double") / F.col("n")
    terms = risk.filter(F.col("d") > 0).select(
        "d",
        "d1",
        F.round(1_000_000 * F.col("d") * p1).cast("long").alias("e1_micro"),
        F.round(
            1_000_000
            * F.col("d")
            * p1
            * (1 - p1)
            * (F.col("n") - F.col("d"))
            / F.nullif(F.col("n") - 1, F.lit(0))
        )
        .cast("long")
        .alias("v_micro"),
    )
    o1 = F.sum("d1").cast("double")
    e1 = F.sum("e1_micro").cast("double") / 1_000_000
    return terms.crossJoin(F.broadcast(tot)).agg(
        F.max("nn1").cast("long").alias("n_treat"),
        F.max(F.col("nn") - F.col("nn1")).cast("long").alias("n_ctrl"),
        F.sum("d1").cast("long").alias("observed_treat"),
        F.round(e1, 6).alias("expected_treat"),
        F.round(
            (o1 - e1) * (o1 - e1)
            / F.nullif(F.sum("v_micro").cast("double") / 1_000_000, F.lit(0.0)),
            4,
        ).alias("logrank_chi2"),
    )


@query(
    "cochrans_q_test",
    oracle=f"""
    WITH r AS (
      SELECT CASE WHEN n_chars >= {KAPPA_CHARS} THEN 1 ELSE 0 END AS r1,
             CASE WHEN len(string_split(text, ' ')) >= {KAPPA_TOKS}
                  THEN 1 ELSE 0 END AS r2,
             CASE WHEN list_contains(string_split(text, ' '),
                                     '{FLEISS_TERM}')
                  THEN 1 ELSE 0 END AS r3
      FROM documents
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r1) AS BIGINT) AS c1,
             CAST(sum(r2) AS BIGINT) AS c2,
             CAST(sum(r3) AS BIGINT) AS c3,
             CAST(sum(r1 + r2 + r3) AS BIGINT) AS sr,
             CAST(sum((r1 + r2 + r3) * (r1 + r2 + r3)) AS BIGINT) AS sr2
      FROM r
    )
    SELECT n AS n_items, c1, c2, c3,
           round(2 * (3 * (CAST(c1 AS DOUBLE) * c1 + CAST(c2 AS DOUBLE) * c2
                           + CAST(c3 AS DOUBLE) * c3)
                      - CAST(sr AS DOUBLE) * sr)
                 / nullif(3 * CAST(sr AS DOUBLE) - sr2, 0), 4) AS cochran_q
    FROM g
    """,
)
def cochrans_q_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test for k related binary raters (Cochran 1950 —
    the k-sample extension of McNemar, see ``mcnemar_paired_test``:
    do the THREE labeling heuristics of ``fleiss_kappa_multirater``
    flag at the same RATE, or is one systematically stricter?):
    Q = (k-1)·(k·ΣC_j² - (ΣC_j)²)/(k·ΣR_i - ΣR_i²) with k = 3,
    column totals C_j per rater and row sums R_i per document.
    Chi-square with k-1 df under H0 — kappa asks "do they agree",
    Q asks "are their marginals exchangeable"; both gates run before
    trusting a voting labeler ensemble.

    Exactness: every C_j, ΣR_i, ΣR_i² is an integer sum from ONE
    scan; Q is one fixed float dag, nullif-guarded for the degenerate
    all-identical-rows table.

    Scale: a single projection + one 6-counter global aggregate.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    r1 = (F.col("n_chars") >= KAPPA_CHARS).cast("int")
    r2 = (F.size(toks) >= KAPPA_TOKS).cast("int")
    r3 = F.array_contains(toks, FLEISS_TERM).cast("int")
    g = d.select(
        r1.alias("r1"), r2.alias("r2"), r3.alias("r3")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("r1").cast("long").alias("c1"),
        F.sum("r2").cast("long").alias("c2"),
        F.sum("r3").cast("long").alias("c3"),
        F.sum(F.col("r1") + F.col("r2") + F.col("r3")).cast("long").alias("sr"),
        F.sum(
            (F.col("r1") + F.col("r2") + F.col("r3"))
            * (F.col("r1") + F.col("r2") + F.col("r3"))
        )
        .cast("long")
        .alias("sr2"),
    )
    csq = (
        F.col("c1").cast("double") * F.col("c1")
        + F.col("c2").cast("double") * F.col("c2")
        + F.col("c3").cast("double") * F.col("c3")
    )
    return g.select(
        F.col("n").alias("n_items"),
        "c1", "c2", "c3",
        F.round(
            2
            * (3 * csq - F.col("sr").cast("double") * F.col("sr"))
            / F.nullif(
                3 * F.col("sr").cast("double") - F.col("sr2"), F.lit(0.0)
            ),
            4,
        ).alias("cochran_q"),
    )


@query(
    "friedman_rank_test",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY day, event_type
    ),
    grid AS (
      SELECT d.day, t.event_type, coalesce(x.c, 0) AS c
      FROM (SELECT DISTINCT day FROM daily) d
      CROSS JOIN (SELECT DISTINCT event_type FROM daily) t
      LEFT JOIN daily x ON x.day = d.day AND x.event_type = t.event_type
    ),
    ranked AS (
      SELECT day, event_type,
             2 * rank() OVER (PARTITION BY day ORDER BY c)
               + count(*) OVER (PARTITION BY day, c) - 1 AS r2
      FROM grid
    ),
    pert AS (
      SELECT event_type, CAST(sum(r2) AS BIGINT) AS r2_sum
      FROM ranked GROUP BY event_type
    ),
    dims AS (
      SELECT CAST(count(DISTINCT day) AS BIGINT) AS n,
             CAST(count(DISTINCT event_type) AS BIGINT) AS k
      FROM grid
    )
    SELECT d.n AS n_blocks, d.k AS k_treatments,
           round(3.0 * (SELECT sum(r2_sum * r2_sum) FROM pert)
                 / (d.n * d.k * (d.k + 1)) - 3.0 * d.n * (d.k + 1), 4)
             AS friedman_chi2
    FROM dims d
    """,
)
def friedman_rank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test (Friedman 1937 — the nonparametric
    repeated-measures ANOVA: are the k event types' daily volumes
    exchangeable across days, or does some type systematically
    dominate?): each day is a block, types are ranked by count within
    the day (average ranks on ties), and chi2 = 12/(n·k·(k+1))·ΣR_j²
    - 3n(k+1) over the per-type rank sums. Complements ANOVA
    (parametric, on means) and Mann-Kendall (single-series trend).

    Exactness: the block grid zero-fills missing (day, type) cells
    identically in both lanes; average tie ranks carry as the INTEGER
    2·rank + tie_count - 1 (the spearman idiom), so rank sums and
    ΣR2_j² are exact integers — with R2 = 2R the statistic reduces to
    3·ΣR2_j²/(nk(k+1)) - 3n(k+1), one fixed float dag.

    Scale: one (day, type) hash agg; the rank window partitions per
    day over k rows; everything after is a k-row frame.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count("*").cast("long").alias("c"))
    daily = scoped_persist(daily)
    days = daily.select("day").distinct()
    types = daily.select("event_type").distinct()
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(daily, ["day", "event_type"], "left")
        .select("day", "event_type", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    ranked = grid.select(
        "event_type",
        (
            2 * F.rank().over(Window.partitionBy("day").orderBy("c"))
            + F.count("*").over(Window.partitionBy("day", "c"))
            - 1
        )
        .cast("long")
        .alias("r2"),
    )
    pert = ranked.groupBy("event_type").agg(
        F.sum("r2").cast("long").alias("r2_sum")
    )
    sums = pert.agg(
        F.sum(F.col("r2_sum") * F.col("r2_sum")).cast("long").alias("s2"),
        F.count("*").cast("long").alias("k"),
    )
    dims = daily.agg(F.countDistinct("day").cast("long").alias("n"))
    return sums.crossJoin(F.broadcast(dims)).select(
        F.col("n").alias("n_blocks"),
        F.col("k").alias("k_treatments"),
        F.round(
            3.0 * F.col("s2") / (F.col("n") * F.col("k") * (F.col("k") + 1))
            - 3.0 * F.col("n") * (F.col("k") + 1),
            4,
        ).alias("friedman_chi2"),
    )


KMV_SET_MOD = 50   # set A: parts in orders with key % 50 = 0; B: = 1
KMV_SET_TOL = 0.25  # measured max intersection rel-err 8.8% -> ~2.8x headroom


@query(
    "kmv_set_operations",
    oracle=f"""
    WITH li AS (SELECT l_orderkey, CAST(l_partkey AS VARCHAR) AS w
                FROM lineitem WHERE l_orderkey % {KMV_SET_MOD} IN (0, 1)),
    h AS (
      SELECT CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) AS hv,
             max(CASE WHEN l_orderkey % {KMV_SET_MOD} = 0
                      THEN 1 ELSE 0 END) AS ina,
             max(CASE WHEN l_orderkey % {KMV_SET_MOD} = 1
                      THEN 1 ELSE 0 END) AS inb
      FROM li GROUP BY 1
    ),
    k AS (SELECT * FROM h ORDER BY hv LIMIT {KMV_K}),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS kk,
             CAST(sum(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS k_int,
             CAST(max(hv) AS BIGINT) AS hk
      FROM k
    ),
    ex AS (
      SELECT CAST(sum(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_int,
             CAST(count(*) AS BIGINT) AS n_union
      FROM h
    )
    SELECT e.n_union, e.n_int AS n_intersection_exact,
           a.k_int, a.hk AS kth_hash,
           round(CAST(a.k_int AS DOUBLE) / a.kk, 4) AS jaccard_est,
           round((CAST(a.k_int AS DOUBLE) / a.kk)
                 * ((a.kk - 1) * {_KMV_2_32} / a.hk), 2)
             AS intersection_est,
           abs((CAST(a.k_int AS DOUBLE) / a.kk)
               * ((a.kk - 1) * {_KMV_2_32} / a.hk) - e.n_int)
             <= {KMV_SET_TOL} * e.n_int AS within_tol
    FROM ex e CROSS JOIN agg a
    """,
)
def kmv_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET EXPRESSIONS (Beyer et al. 2007, "On synopses
    for distinct-value estimation under multiset operations" — the
    capability that distinguishes KMV/theta sketches from HLL, cf.
    ``kmv_distinct_audit``): the K minimum hashes of A∪B are a
    UNIFORM SAMPLE of the union, so the fraction of them belonging to
    both sets estimates Jaccard(A, B), and intersection-size =
    jaccard x union-KMV-estimate. Sets here: parts bought in two
    disjoint 1/{50} order slices.

    Exactness: membership flags ride each distinct hash (integer
    max-flags); the K-smallest heap, k_int, and h_(K) all cross the
    oracle as exact integers — only the truth-vs-estimate verdict is
    tolerance-checked ({25}%, measured max error 8.8% across SFs,
    ~2.8x headroom).

    Scale: same TakeOrdered heap as the base KMV entry, now carrying
    two membership bits — at 100 TB each side sketches independently
    (K smallest + flags merge associatively), which is exactly how
    theta sketches ship set algebra across a cluster.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") % KMV_SET_MOD).isin(0, 1)
    )
    h = (
        li.select(
            F.conv(
                F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 8),
                16,
                10,
            )
            .cast("long")
            .alias("hv"),
            (F.col("l_orderkey") % KMV_SET_MOD == 0).cast("int").alias("a"),
            (F.col("l_orderkey") % KMV_SET_MOD == 1).cast("int").alias("b"),
        )
        .groupBy("hv")
        .agg(F.max("a").alias("ina"), F.max("b").alias("inb"))
    )
    h = scoped_persist(h)
    agg = (
        h.orderBy("hv")
        .limit(KMV_K)
        .agg(
            F.count("*").cast("long").alias("kk"),
            F.sum(
                F.when((F.col("ina") == 1) & (F.col("inb") == 1), 1).otherwise(0)
            )
            .cast("long")
            .alias("k_int"),
            F.max("hv").cast("long").alias("hk"),
        )
    )
    ex = h.agg(
        F.sum(
            F.when((F.col("ina") == 1) & (F.col("inb") == 1), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_int"),
        F.count("*").cast("long").alias("n_union"),
    )
    jac = F.col("k_int").cast("double") / F.col("kk")
    inter = jac * ((F.col("kk") - 1) * F.lit(_KMV_2_32) / F.col("hk"))
    return ex.crossJoin(F.broadcast(agg)).select(
        "n_union",
        F.col("n_int").alias("n_intersection_exact"),
        "k_int",
        F.col("hk").alias("kth_hash"),
        F.round(jac, 4).alias("jaccard_est"),
        F.round(inter, 2).alias("intersection_est"),
        (F.abs(inter - F.col("n_int")) <= KMV_SET_TOL * F.col("n_int")).alias(
            "within_tol"
        ),
    )


QINI_CONV_VALUE = 100  # a user "converts" on any purchase >= this
QINI_BINS = 10


@query(
    "qini_uplift_curve",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS t,
             CAST(max(CASE WHEN event_type = 'purchase'
                            AND value >= {QINI_CONV_VALUE}
                           THEN 1 ELSE 0 END) AS BIGINT) AS y,
             CAST(('0x' || substr(md5('uplift:' || CAST(user_id AS VARCHAR)),
                                  1, 8)) AS BIGINT) AS s
      FROM events GROUP BY user_id
    ),
    binned AS (
      SELECT CAST(s * {QINI_BINS} // 4294967296 AS INTEGER) AS decile, t, y
      FROM u
    ),
    per AS (
      SELECT decile,
             CAST(sum(t) AS BIGINT) AS nt,
             CAST(sum(1 - t) AS BIGINT) AS nc,
             CAST(sum(t * y) AS BIGINT) AS yt,
             CAST(sum((1 - t) * y) AS BIGINT) AS yc
      FROM binned GROUP BY decile
    ),
    cum AS (
      SELECT decile,
             CAST(sum(nt) OVER w AS BIGINT) AS cnt,
             CAST(sum(nc) OVER w AS BIGINT) AS cnc,
             CAST(sum(yt) OVER w AS BIGINT) AS cyt,
             CAST(sum(yc) OVER w AS BIGINT) AS cyc
      FROM per
      WINDOW w AS (ORDER BY decile)
    )
    SELECT decile, cnt AS n_treat_cum, cnc AS n_ctrl_cum,
           cyt AS conv_treat_cum, cyc AS conv_ctrl_cum,
           round(cyt - CAST(cyc AS DOUBLE) * cnt / nullif(cnc, 0), 4)
             AS qini
    FROM cum ORDER BY decile
    """,
)
def qini_uplift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini uplift curve (Radcliffe 2007 — THE evaluation curve for
    uplift/heterogeneous-treatment-effect models, the causal analogue
    of the ROC: at each score decile, incremental conversions =
    treated conversions minus control conversions scaled to the
    treated exposure): users ranked by a deterministic uplift score
    (md5 — the stand-in for a trained uplift model), treatment = odd
    user_id, conversion = any purchase >= {100}. A flat curve means
    the score carries no targeting signal — which is the correct
    A/A-style expectation for a random score, and exactly what the
    curve certifies before a real model earns rollout.

    Exactness: per-decile treated/control counts and conversions are
    integer sums; the cumulative window runs over 10 rows; the Qini
    value is one fixed float dag per decile, nullif-guarded for an
    empty control prefix.

    Scale: one user-keyed agg, then decile aggregation — the curve of
    a billion-user experiment is a 10-row frame.
    """
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= QINI_CONV_VALUE),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("y"),
    ).select(
        F.when(F.col("user_id") % 2 == 1, 1).otherwise(0).alias("t"),
        "y",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("uplift:"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("s"),
    )
    per = (
        u.select(
            F.expr(f"CAST(s * {QINI_BINS} DIV 4294967296 AS INTEGER)").alias(
                "decile"
            ),
            "t",
            "y",
        )
        .groupBy("decile")
        .agg(
            F.sum("t").cast("long").alias("nt"),
            F.sum(1 - F.col("t")).cast("long").alias("nc"),
            F.sum(F.col("t") * F.col("y")).cast("long").alias("yt"),
            F.sum((1 - F.col("t")) * F.col("y")).cast("long").alias("yc"),
        )
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "decile",
        F.sum("nt").over(w).cast("long").alias("cnt"),
        F.sum("nc").over(w).cast("long").alias("cnc"),
        F.sum("yt").over(w).cast("long").alias("cyt"),
        F.sum("yc").over(w).cast("long").alias("cyc"),
    )
    return cum.select(
        "decile",
        F.col("cnt").alias("n_treat_cum"),
        F.col("cnc").alias("n_ctrl_cum"),
        F.col("cyt").alias("conv_treat_cum"),
        F.col("cyc").alias("conv_ctrl_cum"),
        F.round(
            F.col("cyt")
            - F.col("cyc").cast("double")
            * F.col("cnt")
            / F.nullif(F.col("cnc"), F.lit(0)),
            4,
        ).alias("qini"),
    ).orderBy("decile")


HL_GROUP_LANG = "en"  # shift of this lang's doc lengths vs the rest


@query(
    "hodges_lehmann_shift",
    oracle=f"""
    WITH xh AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
                FROM documents WHERE lang = '{HL_GROUP_LANG}' GROUP BY v),
    yh AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
           FROM documents WHERE lang <> '{HL_GROUP_LANG}' GROUP BY v),
    diffs AS (
      SELECT xh.v - yh.v AS d, CAST(sum(xh.c * yh.c) AS BIGINT) AS w
      FROM xh CROSS JOIN yh GROUP BY 1
    ),
    cum AS (
      SELECT d, CAST(sum(w) OVER (ORDER BY d) AS BIGINT) AS cw,
             CAST(sum(w) OVER () AS BIGINT) AS n
      FROM diffs
    )
    SELECT CAST(max(n) AS BIGINT) AS n_pairs,
           CAST(min(CASE WHEN 2 * cw >= n THEN d END) AS BIGINT) AS hl_shift
    FROM cum
    """,
)
def hodges_lehmann_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann two-sample shift estimator (Hodges & Lehmann
    1963 — the robust location difference that goes WITH the
    Mann-Whitney test, cf. ``mannwhitney_drift_doclen``: the median
    of all pairwise differences x_i - y_j; unlike the difference of
    means it shrugs off heavy tails, unlike the difference of medians
    it is efficient): how much longer are '{HL_GROUP_LANG}' documents
    than the rest, robustly.

    Exactness: the n_x·n_y pairwise differences are NEVER
    materialized — both lanes convolve the two integer VALUE
    HISTOGRAMS (difference d with weight c_x·c_y), and the estimate
    is the discrete lower-median: the smallest d whose cumulative
    weight reaches ⌈n/2⌉ (2·cw >= n in integers). A BIGINT crosses
    the oracle; no floats exist in this plan at all.

    Scale: two histogram aggregates (bounded by the value domain, not
    the row count), a |domain|² weighted convolution, and a window
    over the |distinct differences| table — the pairwise median of a
    trillion pairs costs two scans, which is exactly how it must work
    at 100 TB.
    """
    d = load_table(spark, sf_dir, "documents")
    xh = (
        d.filter(F.col("lang") == HL_GROUP_LANG)
        .groupBy(F.col("n_chars").alias("vx"))
        .agg(F.count("*").cast("long").alias("cx"))
    )
    yh = (
        d.filter(F.col("lang") != HL_GROUP_LANG)
        .groupBy(F.col("n_chars").alias("vy"))
        .agg(F.count("*").cast("long").alias("cy"))
    )
    diffs = (
        xh.crossJoin(F.broadcast(yh))
        .groupBy((F.col("vx") - F.col("vy")).cast("long").alias("d"))
        .agg(F.sum(F.col("cx") * F.col("cy")).cast("long").alias("w"))
    )
    w_cum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = diffs.select(
        "d",
        F.sum("w").over(w_cum).cast("long").alias("cw"),
        F.sum("w").over(w_all).cast("long").alias("n"),
    )
    return cum.agg(
        F.max("n").cast("long").alias("n_pairs"),
        F.min(F.when(2 * F.col("cw") >= F.col("n"), F.col("d")))
        .cast("long")
        .alias("hl_shift"),
    )


@query(
    "cliff_delta_effect",
    oracle=f"""
    WITH v AS (
      SELECT n_chars AS val,
             CASE WHEN lang = '{HL_GROUP_LANG}' THEN 1 ELSE 0 END AS x
      FROM documents
    ),
    g AS (
      SELECT val, CAST(sum(x) AS BIGINT) AS p,
             CAST(sum(1 - x) AS BIGINT) AS q
      FROM v GROUP BY val
    ),
    cum AS (
      SELECT p, q,
             coalesce(CAST(sum(q) OVER (ORDER BY val
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      AS BIGINT), 0) AS q_below
      FROM g
    )
    SELECT CAST(sum(p) AS BIGINT) AS n_x,
           CAST(sum(q) AS BIGINT) AS n_y,
           CAST(sum(p * (2 * q_below + q)) AS BIGINT) AS u2_stat,
           round(CAST(sum(p * (2 * q_below + q)) AS DOUBLE)
                 / nullif(CAST(sum(p) AS DOUBLE) * sum(q), 0) - 1, 6)
             AS cliff_delta
    FROM cum
    """,
)
def cliff_delta_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta ordinal effect size (Cliff 1993 — the
    significance-free companion every Mann-Whitney p-value should
    ship with: P(x > y) - P(x < y), in [-1, 1], readable as "how
    often does a random '{HL_GROUP_LANG}' doc outsize a random
    other"): the magnitude statistic for the same group-vs-rest
    doc-length comparison as ``hodges_lehmann_shift``, computed
    WITHOUT materializing pairs via delta = 2U/(n_x·n_y) - 1 on the
    tie-exact rank U statistic.

    Exactness: the grouped-score cumulative formulation of
    ``roc_auc_rank`` — U·2 = Σ_v p_v·(2·q_below + q_v) over distinct
    integer lengths handles ties exactly in pure integer arithmetic;
    one division at emit.

    Scale: N rows collapse to |distinct lengths|; the cumulative
    window runs over that collapsed table. No pair join exists in
    this plan at any scale.
    """
    d = load_table(spark, sf_dir, "documents")
    g = d.select(
        F.col("n_chars").alias("val"),
        (F.col("lang") == HL_GROUP_LANG).cast("int").alias("x"),
    ).groupBy("val").agg(
        F.sum("x").cast("long").alias("p"),
        F.sum(1 - F.col("x")).cast("long").alias("q"),
    )
    w_below = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, -1)
    cum = g.select(
        "p",
        "q",
        F.coalesce(F.sum("q").over(w_below).cast("long"), F.lit(0)).alias(
            "q_below"
        ),
    )
    u2 = F.sum(F.col("p") * (2 * F.col("q_below") + F.col("q"))).cast("long")
    return cum.agg(
        F.sum("p").cast("long").alias("n_x"),
        F.sum("q").cast("long").alias("n_y"),
        u2.alias("u2_stat"),
        F.round(
            u2.cast("double")
            / F.nullif(F.sum("p").cast("double") * F.sum("q"), F.lit(0.0))
            - 1,
            6,
        ).alias("cliff_delta"),
    )


@query(
    "runs_test_randomness",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY day
    ),
    med AS (SELECT CAST(round(2 * quantile_cont(x, 0.5)) AS BIGINT) AS med2
            FROM daily),
    signed AS (
      SELECT day, CASE WHEN 2 * x > med2 THEN 1 ELSE 0 END AS s
      FROM daily CROSS JOIN med
      WHERE 2 * x <> med2
    ),
    runs AS (
      SELECT s,
             CASE WHEN lag(s) OVER (ORDER BY day) IS NULL
                   OR lag(s) OVER (ORDER BY day) <> s
                  THEN 1 ELSE 0 END AS new_run
      FROM signed
    ),
    g AS (
      SELECT CAST(sum(s) AS BIGINT) AS n1,
             CAST(sum(1 - s) AS BIGINT) AS n2,
             CAST(sum(new_run) AS BIGINT) AS r
      FROM runs
    )
    SELECT n1 + n2 AS n_days_used, n1 AS n_above, n2 AS n_below,
           r AS n_runs,
           round((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / nullif(sqrt((2.0 * n1 * n2)
                               * (2.0 * n1 * n2 - n1 - n2)
                               / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                                  * (n1 + n2 - 1))), 0), 4) AS runs_z
    FROM g
    """,
)
def runs_test_randomness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test (Wald & Wolfowitz 1940 — the
    randomness audit: does daily volume wander above/below its median
    like coin flips, or does it clump into regimes?): the daily
    series is signed against the grand median (median days dropped),
    runs of equal sign are counted, and too FEW runs (negative z)
    means trending/regime behavior — the cheap screen run before the
    heavier CUSUM/EWMA change detectors in this module's family.

    Exactness: the 2·median trick keeps sign decisions integer
    (2x vs med2 — no float threshold); run boundaries come from an
    integer lag comparison; n1/n2/R are integer sums; z is one fixed
    float dag, nullif-guarded for the degenerate one-sign series.

    Scale: one date hash agg, then windows over the |days| grid.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("x")
    )
    med = daily.agg(
        F.round(2 * F.expr("percentile(x, 0.5)")).cast("long").alias("med2")
    )
    signed = (
        daily.crossJoin(F.broadcast(med))
        .filter(2 * F.col("x") != F.col("med2"))
        .select(
            "day",
            F.when(2 * F.col("x") > F.col("med2"), 1).otherwise(0).alias("s"),
        )
    )
    lag_s = F.lag("s").over(Window.orderBy("day"))
    runs = signed.select(
        "s",
        F.when(lag_s.isNull() | (lag_s != F.col("s")), 1).otherwise(0).alias(
            "new_run"
        ),
    )
    g = runs.agg(
        F.sum("s").cast("long").alias("n1"),
        F.sum(1 - F.col("s")).cast("long").alias("n2"),
        F.sum("new_run").cast("long").alias("r"),
    )
    n = F.col("n1") + F.col("n2")
    two_nn = 2.0 * F.col("n1") * F.col("n2")
    mu = two_nn / n + 1
    sigma = F.sqrt(
        two_nn * (two_nn - n) / (n.cast("double") * n * (n - 1))
    )
    return g.select(
        n.alias("n_days_used"),
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        F.col("r").alias("n_runs"),
        F.round((F.col("r") - mu) / F.nullif(sigma, F.lit(0.0)), 4).alias(
            "runs_z"
        ),
    )


@query(
    "kruskal_wallis_doclen",
    oracle="""
    WITH vc AS (
      SELECT lang, n_chars AS v, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY lang, v
    ),
    vh AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv FROM vc GROUP BY v),
    cum AS (
      SELECT v, cv,
             coalesce(CAST(sum(cv) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      AS BIGINT), 0) AS below
      FROM vh
    ),
    rg AS (
      SELECT vc.lang, CAST(sum(vc.c) AS BIGINT) AS ng,
             CAST(sum(vc.c * (2 * cum.below + cum.cv + 1)) AS BIGINT) AS r2
      FROM vc JOIN cum ON vc.v = cum.v
      GROUP BY vc.lang
    ),
    tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS k FROM rg),
    ties AS (SELECT CAST(sum(cv * cv * cv - cv) AS BIGINT) AS t3 FROM vh),
    terms AS (
      SELECT CAST(round(1000000 * CAST(r2 AS DOUBLE) * r2 / ng) AS BIGINT)
               AS t_micro
      FROM rg
    ),
    agg AS (SELECT CAST(sum(t_micro) AS BIGINT) AS s FROM terms)
    SELECT t.k AS k_groups, t.n AS n_docs,
           round(3.0 * (CAST(a.s AS DOUBLE) / 1000000)
                 / (CAST(t.n AS DOUBLE) * (t.n + 1)) - 3.0 * (t.n + 1), 4)
             AS h_stat,
           round((3.0 * (CAST(a.s AS DOUBLE) / 1000000)
                  / (CAST(t.n AS DOUBLE) * (t.n + 1)) - 3.0 * (t.n + 1))
                 / nullif(1 - CAST(ti.t3 AS DOUBLE)
                              / (CAST(t.n AS DOUBLE) * t.n * t.n - t.n), 0),
                 4) AS h_adjusted
    FROM agg a CROSS JOIN tot t CROSS JOIN ties ti
    """,
)
def kruskal_wallis_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test (Kruskal & Wallis 1952 — the k-sample
    rank ANOVA: do the languages' document-length DISTRIBUTIONS
    differ, without normality assumptions?): completes the
    nonparametric ladder — Mann-Whitney (2 unpaired samples),
    Friedman (k paired blocks), and now k unpaired groups — with the
    standard tie correction H/(1 - Σ(t³-t)/(N³-N)).

    Exactness: ranks are NEVER assigned row-by-row — per-group rank
    sums come from the VALUE HISTOGRAM (each distinct value's
    doubled average rank is the integer 2·below + c_v + 1, the
    spearman tie idiom applied corpus-wide), so R2_g, the tie term,
    and N/k are exact integers; each group's R2²/n_g quantizes to
    micro units and reduces by integer sum; H is one fixed float dag.

    Scale: two histogram aggregates (value-domain-sized), a window
    over distinct values, and a |groups|-row reduce — no global
    row-level sort exists in this plan, which is what makes a rank
    test runnable on 100 TB at all.
    """
    d = load_table(spark, sf_dir, "documents")
    vc = d.groupBy("lang", F.col("n_chars").alias("v")).agg(
        F.count("*").cast("long").alias("c")
    )
    vc = scoped_persist(vc)
    vh = vc.groupBy("v").agg(F.sum("c").cast("long").alias("cv"))
    w_below = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = vh.select(
        "v",
        "cv",
        F.coalesce(F.sum("cv").over(w_below).cast("long"), F.lit(0)).alias(
            "below"
        ),
    )
    rg = (
        vc.join(cum, "v")
        .groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("ng"),
            F.sum(
                F.col("c") * (2 * F.col("below") + F.col("cv") + 1)
            )
            .cast("long")
            .alias("r2"),
        )
    )
    rg = scoped_persist(rg)
    tot = rg.agg(
        F.sum("ng").cast("long").alias("n"), F.count("*").cast("long").alias("k")
    )
    ties = vh.agg(
        F.sum(F.col("cv") * F.col("cv") * F.col("cv") - F.col("cv"))
        .cast("long")
        .alias("t3")
    )
    terms = rg.select(
        F.round(
            1_000_000 * F.col("r2").cast("double") * F.col("r2") / F.col("ng")
        )
        .cast("long")
        .alias("t_micro")
    )
    agg = terms.agg(F.sum("t_micro").cast("long").alias("s"))
    h = (
        3.0
        * (F.col("s").cast("double") / 1_000_000)
        / (F.col("n").cast("double") * (F.col("n") + 1))
        - 3.0 * (F.col("n") + 1)
    )
    corr = 1 - F.col("t3").cast("double") / (
        F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n")
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("k").alias("k_groups"),
            F.col("n").alias("n_docs"),
            F.round(h, 4).alias("h_stat"),
            F.round(h / F.nullif(corr, F.lit(0.0)), 4).alias("h_adjusted"),
        )
    )


@query(
    "wasserstein_doclen_drift",
    oracle=f"""
    WITH xh AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
                FROM documents WHERE lang = '{HL_GROUP_LANG}' GROUP BY v),
    yh AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
           FROM documents WHERE lang <> '{HL_GROUP_LANG}' GROUP BY v),
    grid AS (
      SELECT v, coalesce(xh.c, 0) AS cx, coalesce(yh.c, 0) AS cy
      FROM xh FULL OUTER JOIN yh USING (v)
    ),
    cum AS (
      SELECT v,
             CAST(sum(cx) OVER (ORDER BY v) AS BIGINT) AS fx,
             CAST(sum(cy) OVER (ORDER BY v) AS BIGINT) AS fy,
             lead(v) OVER (ORDER BY v) - v AS gap
      FROM grid
    ),
    tot AS (SELECT CAST(sum(cx) AS BIGINT) AS nx,
                   CAST(sum(cy) AS BIGINT) AS ny FROM grid)
    SELECT t.nx AS n_x, t.ny AS n_y,
           CAST(sum(abs(fx * t.ny - fy * t.nx) * gap) AS BIGINT)
             AS w1_numerator,
           round(CAST(sum(abs(fx * t.ny - fy * t.nx) * gap) AS DOUBLE)
                 / (CAST(t.nx AS DOUBLE) * t.ny), 6) AS wasserstein_1
    FROM cum CROSS JOIN tot t
    WHERE gap IS NOT NULL
    GROUP BY t.nx, t.ny
    """,
)
def wasserstein_doclen_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-Wasserstein (earth-mover) distance between two document-
    length distributions (Monge 1781 / Kantorovich 1942; the drift
    metric modern ML monitoring prefers over KS and PSI because it is
    magnitude-aware — it reports HOW FAR mass moved, not just that it
    moved): W1 = ∫|F_X - F_Y| over the '{HL_GROUP_LANG}'-vs-rest
    length marginals, computed on the merged distinct-value grid as
    Σ |F_X·n_y - F_Y·n_x|·gap / (n_x·n_y).

    Exactness: the cross-multiplied CDF difference |fx·n_y - fy·n_x|
    and the value gaps are INTEGERS, so the W1 numerator crosses the
    oracle as a BIGINT — one division at emit. No float ever
    accumulates.

    Scale: two value histograms, one full-outer merge on the value
    grid, one cumulative window over distinct values — row counts
    never enter after the histogram aggregates (the same
    histogram-not-rows discipline as ``hodges_lehmann_shift``).
    """
    d = load_table(spark, sf_dir, "documents")
    xh = (
        d.filter(F.col("lang") == HL_GROUP_LANG)
        .groupBy(F.col("n_chars").alias("v"))
        .agg(F.count("*").cast("long").alias("cx"))
    )
    yh = (
        d.filter(F.col("lang") != HL_GROUP_LANG)
        .groupBy(F.col("n_chars").alias("v"))
        .agg(F.count("*").cast("long").alias("cy"))
    )
    grid = (
        xh.join(yh, "v", "full_outer")
        .select(
            "v",
            F.coalesce(F.col("cx"), F.lit(0)).alias("cx"),
            F.coalesce(F.col("cy"), F.lit(0)).alias("cy"),
        )
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_lead = Window.orderBy("v")
    cum = grid.select(
        F.sum("cx").over(w_cum).cast("long").alias("fx"),
        F.sum("cy").over(w_cum).cast("long").alias("fy"),
        (F.lead("v").over(w_lead) - F.col("v")).alias("gap"),
    )
    tot = grid.agg(
        F.sum("cx").cast("long").alias("nx"),
        F.sum("cy").cast("long").alias("ny"),
    )
    term = (
        F.abs(F.col("fx") * F.col("ny") - F.col("fy") * F.col("nx"))
        * F.col("gap")
    )
    return (
        cum.filter(F.col("gap").isNotNull())
        .crossJoin(F.broadcast(tot))
        .groupBy("nx", "ny")
        .agg(F.sum(term).cast("long").alias("w1_numerator"))
        .select(
            F.col("nx").alias("n_x"),
            F.col("ny").alias("n_y"),
            "w1_numerator",
            F.round(
                F.col("w1_numerator").cast("double")
                / (F.col("nx").cast("double") * F.col("ny")),
                6,
            ).alias("wasserstein_1"),
        )
    )


# ---------------------------------------------------------------------------
# Round 10 additions: heavy-tail index, outlier inference, log-bucketed
# quantile sketch, and a deterministic cluster permutation test.
# ---------------------------------------------------------------------------

HILL_K = 100  # order statistics used by the Hill estimator


@query(
    "hill_tail_index",
    oracle=f"""
    WITH topk AS (
      SELECT n_chars AS x,
             CAST(round(1000000000 * ln(n_chars)) AS BIGINT) AS ln_nano
      FROM documents ORDER BY n_chars DESC LIMIT {HILL_K} + 1
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) - 1 AS k_eff,
             CAST(min(x) AS BIGINT) AS x_thresh,
             CAST(min(ln_nano) AS BIGINT) AS ln_thresh_nano,
             CAST(sum(ln_nano) AS BIGINT) AS ln_sum_nano
      FROM topk
    )
    SELECT CAST(k_eff AS BIGINT) AS k, x_thresh,
           CAST(ln_sum_nano - ln_thresh_nano
                - k_eff * ln_thresh_nano AS BIGINT) AS hill_sum_nano,
           round(k_eff * 1000000000.0
                 / nullif(ln_sum_nano - ln_thresh_nano
                          - k_eff * ln_thresh_nano, 0), 4) AS hill_alpha
    FROM s
    WHERE k_eff > 0
    """,
)
def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the tail index (Hill 1975 — THE estimator of
    the Pareto exponent alpha behind every heavy-tail audit: document
    lengths, token frequencies, user activity; alpha <= 2 means
    infinite variance, the regime where mean-based pipeline budgets
    break): over the k = {100} largest order statistics,
    1/alpha = (1/k)·sum ln(x_(i)/x_(k+1)).

    Exactness: the top-(k+1) is a MULTISET of values — well-defined
    under ties without any row identity — so both lanes take the same
    k+1 largest lengths; each ln(x) is quantized to integer nano-nats
    before the sum (the repo's ln-reduce idiom), the threshold term
    subtracts exactly (one copy of the minimum is the (k+1)-th order
    statistic), and alpha is one float division off the integer
    hill_sum, nullif-guarded for the all-equal corpus where the sum
    is 0 (alpha undefined). The reported ``k`` is the EFFECTIVE order
    count |top| − 1 (r10 ADVICE: a corpus shorter than k+1 rows would
    otherwise mislabel the estimate with a k it never used); the
    zero-/one-row corpus emits no row rather than a meaningless
    alpha.

    Scale: the k+1 largest values are a TakeOrdered HEAP (partial
    per partition, k+1 rows merged), then a one-row aggregate — the
    tail of a petabyte corpus costs a top-k.
    """
    d = load_table(spark, sf_dir, "documents")
    topk = (
        d.select(
            F.col("n_chars").alias("x"),
            F.round(1_000_000_000 * F.log(F.col("n_chars")))
            .cast("long")
            .alias("ln_nano"),
        )
        .orderBy(F.col("x").desc())
        .limit(HILL_K + 1)
    )
    s = topk.agg(
        (F.count("*").cast("long") - F.lit(1)).alias("k_eff"),
        F.min("x").cast("long").alias("x_thresh"),
        F.min("ln_nano").cast("long").alias("ln_thresh_nano"),
        F.sum("ln_nano").cast("long").alias("ln_sum_nano"),
    )
    hill_sum = (
        F.col("ln_sum_nano")
        - F.col("ln_thresh_nano")
        - F.col("k_eff") * F.col("ln_thresh_nano")
    )
    return s.filter(F.col("k_eff") > 0).select(
        F.col("k_eff").cast("long").alias("k"),
        "x_thresh",
        hill_sum.cast("long").alias("hill_sum_nano"),
        F.round(
            F.col("k_eff") * 1_000_000_000.0 / F.nullif(hill_sum, F.lit(0)), 4
        ).alias("hill_alpha"),
    )


@query(
    "grubbs_outlier_test",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY day
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(x * x) AS BIGINT) AS q
      FROM daily
    ),
    dev AS (
      SELECT day, x, n, s, q, abs(n * x - s) AS ndev
      FROM daily CROSS JOIN tot
    ),
    best AS (SELECT * FROM dev ORDER BY ndev DESC, day LIMIT 1)
    SELECT strftime(day, '%Y-%m-%d') AS suspect_day,
           x AS suspect_count, n AS n_days,
           round((CAST(ndev AS DOUBLE) / n)
                 / nullif(sqrt((q - CAST(s AS DOUBLE) * s / n)
                               / nullif(n - 1, 0)), 0), 4) AS grubbs_g
    FROM best
    """,
)
def grubbs_outlier_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' maximum-normed-residual test (Grubbs 1950 — the
    classical "is the single worst point an outlier?" screen, the
    one-shot complement to the rolling ``mad_outlier_census``):
    G = max|x_i − mean| / sd over the daily event-count series,
    reported with the suspect day.

    Exactness: the ARGMAX is decided on the integer |n·x_i − S|
    (mean cleared of division — no float picks the row), tie-broken
    on the day; n/S/Q are integer aggregates and G itself is one
    float dag rounded once, nullif-guarded for the constant series
    (sd = 0 -> NULL G) and the one-day series (n-1 = 0).

    Scale: one date hash agg, a broadcast one-row total, and a top-1
    heap over |days| candidates.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("x")
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
    )
    dev = daily.crossJoin(F.broadcast(tot)).select(
        "*", F.abs(F.col("n") * F.col("x") - F.col("s")).alias("ndev")
    )
    best = dev.orderBy(F.col("ndev").desc(), "day").limit(1)
    sd = F.sqrt(
        (F.col("q") - F.col("s").cast("double") * F.col("s") / F.col("n"))
        / F.nullif(F.col("n") - 1, F.lit(0))
    )
    return best.select(
        F.date_format("day", "yyyy-MM-dd").alias("suspect_day"),
        F.col("x").alias("suspect_count"),
        F.col("n").alias("n_days"),
        F.round(
            (F.col("ndev").cast("double") / F.col("n"))
            / F.nullif(sd, F.lit(0.0)),
            4,
        ).alias("grubbs_g"),
    )


LOG2_Q_PCTS = (50, 90, 99)  # audited quantiles, integer percents


@query(
    "log2_histogram_quantiles",
    oracle=f"""
    WITH vh AS (
      SELECT CAST(n_chars AS BIGINT) AS x, CAST(count(*) AS BIGINT) AS cnt
      FROM documents GROUP BY n_chars
    ),
    vcum AS (
      SELECT x, CAST(sum(cnt) OVER (ORDER BY x) AS BIGINT) AS vc FROM vh
    ),
    bh AS (
      SELECT CAST(length(bin(x)) - 1 AS BIGINT) AS bucket,
             CAST(sum(cnt) AS BIGINT) AS n_b
      FROM vh GROUP BY 1
    ),
    bcum AS (
      SELECT bucket, CAST(sum(n_b) OVER (ORDER BY bucket) AS BIGINT) AS bc
      FROM bh
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    grid AS (
      SELECT CAST(q AS BIGINT) AS q_pct,
             CAST((CAST(q AS BIGINT) * n + 99) // 100 AS BIGINT) AS target
      FROM tot CROSS JOIN unnest([{', '.join(str(q) for q in LOG2_Q_PCTS)}]) AS u(q)
    ),
    pick AS (
      SELECT g.q_pct, g.target, CAST(min(b.bucket) AS BIGINT) AS bucket
      FROM grid g JOIN bcum b ON b.bc >= g.target
      GROUP BY g.q_pct, g.target
    ),
    exact AS (
      SELECT g.q_pct, CAST(min(v.x) AS BIGINT) AS exact_value
      FROM grid g JOIN vcum v ON v.vc >= g.target
      GROUP BY g.q_pct
    )
    SELECT p.q_pct, p.bucket,
           CAST((1::BIGINT << p.bucket) AS BIGINT) AS bucket_lo,
           CAST((1::BIGINT << (p.bucket + 1)) - 1 AS BIGINT) AS bucket_hi,
           CAST((1::BIGINT << p.bucket)
                + ((1::BIGINT << p.bucket) >> 1) AS BIGINT) AS sketch_estimate,
           e.exact_value,
           e.exact_value BETWEEN (1::BIGINT << p.bucket)
                             AND (1::BIGINT << (p.bucket + 1)) - 1
             AS within_bucket
    FROM pick p JOIN exact e ON p.q_pct = e.q_pct
    ORDER BY p.q_pct
    """,
)
def log2_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-bucketed quantile sketch audit (the DDSketch idea — Masson
    et al. 2019 — at gamma = 2: bucket index floor(log2 x), constant
    RELATIVE error, buckets merge by addition across
    partitions/shards, the property exact quantiles lack): estimate
    p50/p90/p99 of document length from the log2 bucket histogram and
    certify each estimate's bucket CONTAINS the true order statistic.

    Exactness: the bucket index is length(bin(x)) − 1 — exact integer
    bit arithmetic in both engines, no float log; ranks are integer
    ceil((q·n + 99)/100); both the sketch pick (min bucket whose
    cumulative count reaches the rank) and the true quantile (min
    value whose cumulative count reaches it) are integer joins over
    collapsed histograms; the 1.5·2^b estimate is shift arithmetic.

    Scale: per-partition log2 histograms merge by addition (the
    mergeable-sketch shape, like KMV/HLL/CMS here); the windows run
    over the distinct-value and distinct-bucket tables — bounded by
    the value domain, never the corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    vh = d.groupBy(F.col("n_chars").cast("long").alias("x")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    vh = scoped_persist(vh)
    w_v = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    vcum = vh.select("x", F.sum("cnt").over(w_v).cast("long").alias("vc"))
    bh = vh.groupBy(
        (F.length(F.bin(F.col("x"))) - 1).cast("long").alias("bucket")
    ).agg(F.sum("cnt").cast("long").alias("n_b"))
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    bcum = bh.select(
        "bucket", F.sum("n_b").over(w_b).cast("long").alias("bc")
    )
    tot = vh.agg(F.sum("cnt").cast("long").alias("n"))
    grid = (
        spark.range(1)
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            F.explode(
                F.array(*[F.lit(q).cast("long") for q in LOG2_Q_PCTS])
            ).alias("q_pct"),
        )
        .select(
            "q_pct",
            # Integral `div`, not float `/` + cast: matches DuckDB's
            # `//` exactly at all magnitudes (r10 ADVICE — truncated
            # float division diverges past 2^53).
            F.expr("(q_pct * n + 99) div 100").cast("long").alias("target"),
        )
    )
    pick = (
        F.broadcast(grid)
        .join(bcum, F.col("bc") >= F.col("target"))
        .groupBy("q_pct", "target")
        .agg(F.min("bucket").cast("long").alias("bucket"))
    )
    exact = (
        F.broadcast(grid)
        .join(vcum, F.col("vc") >= F.col("target"))
        .groupBy("q_pct")
        .agg(F.min("x").cast("long").alias("exact_value"))
    )
    lo = F.expr("shiftleft(1L, cast(bucket as int))")
    hi = F.expr("shiftleft(1L, cast(bucket + 1 as int))") - 1
    return (
        pick.join(exact, "q_pct")
        .select(
            "q_pct",
            "bucket",
            lo.cast("long").alias("bucket_lo"),
            hi.cast("long").alias("bucket_hi"),
            (lo + F.expr("shiftright(shiftleft(1L, cast(bucket as int)), 1)"))
            .cast("long")
            .alias("sketch_estimate"),
            "exact_value",
            F.col("exact_value").between(lo, hi).alias("within_bucket"),
        )
        .orderBy("q_pct")
    )


PERM_R = 200  # permutation replicates (deterministic, hash-indexed)


@query(
    "permutation_test_ab",
    oracle=f"""
    WITH pu AS (
      SELECT user_id, user_id % 2 AS g,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS m
      FROM events GROUP BY user_id
    ),
    obs AS (
      SELECT CAST(abs(round(1000000.0 *
               (sum(CASE WHEN g = 0 THEN m ELSE 0 END)
                  / CAST(nullif(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END), 0)
                         AS DOUBLE)
              - sum(CASE WHEN g = 1 THEN m ELSE 0 END)
                  / CAST(nullif(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END), 0)
                         AS DOUBLE)))) AS BIGINT) AS obs_micro,
             CAST(count(*) AS BIGINT) AS n_users
      FROM pu
    ),
    reps AS (
      SELECT r.r,
             CAST(abs(round(1000000.0 *
               (sum(CASE WHEN a THEN m ELSE 0 END)
                  / CAST(nullif(sum(CASE WHEN a THEN 1 ELSE 0 END), 0)
                         AS DOUBLE)
              - sum(CASE WHEN NOT a THEN m ELSE 0 END)
                  / CAST(nullif(sum(CASE WHEN NOT a THEN 1 ELSE 0 END), 0)
                         AS DOUBLE)))) AS BIGINT) AS stat_micro
      FROM pu CROSS JOIN unnest(range(0, {PERM_R})) AS r(r),
           LATERAL (SELECT substr(md5(CAST(pu.user_id AS VARCHAR) || '|'
                                       || CAST(r.r AS VARCHAR)), 1, 1)
                           IN ('0','1','2','3','4','5','6','7') AS a) la
      GROUP BY r.r
    ),
    tail AS (
      SELECT CAST(sum(CASE WHEN stat_micro >= o.obs_micro THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_ge
      FROM reps CROSS JOIN obs o
    )
    SELECT o.n_users, CAST({PERM_R} AS BIGINT) AS n_replicates,
           o.obs_micro AS obs_diff_micro, t.n_ge,
           round((1.0 + t.n_ge) / (1 + {PERM_R}), 6) AS p_value
    FROM obs o CROSS JOIN tail t
    """,
)
def permutation_test_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster permutation test (Fisher 1935 randomization inference;
    clusters = USERS so within-user correlation never inflates
    significance — the mistake event-level permutation makes): the
    observed |mean per-user spend difference| between the user_id
    parity groups is ranked against {200} re-randomizations, each
    re-assigning whole users via a hash bit, giving the exact-test
    p-value (1 + #{{stat_r >= obs}})/(R+1) with zero distributional
    assumptions — the inference the z/t tests in this module make
    parametrically (``abtest_two_proportion_z``, ``welch_t_doclen``).

    Exactness: replicate assignments are md5(user||'|'||r) first-hex
    bits — identical in both engines, no RNG; per-user metrics are
    integer cents; each replicate's statistic is one fixed float dag
    quantized to integer micro units BEFORE the tail comparison, so
    the count n_ge and the p-value are integer-decided. The
    group-empty degenerate (all users one side — impossible at n>40
    but guarded anyway) nullifs to a NULL statistic which counts as
    not-exceeding in both engines' CASE.

    Scale: the replicate grid is a map-side fan-out (R rows per user,
    no shuffle until the R-keyed partial agg); state is R partial
    sums per partition, and the whole test reduces to an R-row frame.
    At a billion users the same plan holds — R·|users| is scan-bound,
    which is why production uses R in the hundreds (Monte-Carlo /
    approximate-permutation regime, p resolution 1/(R+1)).
    """
    e = load_table(spark, sf_dir, "events")
    pu = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("m")
    )
    pu = pu.select("user_id", (F.col("user_id") % 2 == 0).alias("a0"), "m")
    pu = scoped_persist(pu)

    def diff_micro(flag):
        mean = lambda f: F.sum(F.when(f, F.col("m")).otherwise(0)) / F.nullif(  # noqa: E731
            F.sum(f.cast("int")), F.lit(0)
        ).cast("double")
        return F.abs(F.round(1_000_000.0 * (mean(flag) - mean(~flag)))).cast(
            "long"
        )

    obs = pu.agg(
        diff_micro(F.col("a0")).alias("obs_micro"),
        F.count("*").cast("long").alias("n_users"),
    )
    reps = (
        pu.crossJoin(F.broadcast(spark.range(PERM_R).select(F.col("id").alias("r"))))
        .select(
            "r",
            "m",
            F.substring(
                F.md5(
                    F.concat(
                        F.col("user_id").cast("string"),
                        F.lit("|"),
                        F.col("r").cast("string"),
                    )
                ),
                1,
                1,
            )
            .isin(*"01234567")
            .alias("a"),
        )
        .groupBy("r")
        .agg(diff_micro(F.col("a")).alias("stat_micro"))
    )
    tail = reps.crossJoin(F.broadcast(obs.select("obs_micro"))).agg(
        F.sum(
            F.when(F.col("stat_micro") >= F.col("obs_micro"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_ge")
    )
    return obs.crossJoin(F.broadcast(tail)).select(
        "n_users",
        F.lit(PERM_R).cast("long").alias("n_replicates"),
        F.col("obs_micro").alias("obs_diff_micro"),
        "n_ge",
        F.round((1.0 + F.col("n_ge")) / (1 + PERM_R), 6).alias("p_value"),
    )


@query(
    "cramer_von_mises_drift",
    oracle=f"""
    WITH a AS (
      SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS ca
      FROM documents WHERE source = '{KS_A}' GROUP BY 1
    ),
    b AS (
      SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS cb
      FROM documents WHERE source = '{KS_B}' GROUP BY 1
    ),
    merged AS (
      SELECT coalesce(a.v, b.v) AS v,
             coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
      FROM a FULL OUTER JOIN b ON a.v = b.v
    ),
    cum AS (
      SELECT ca, cb,
             CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cum_a,
             CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cum_b,
             CAST(sum(ca) OVER () AS BIGINT) AS n_a,
             CAST(sum(cb) OVER () AS BIGINT) AS n_b
      FROM merged
    )
    SELECT CAST(min(n_a) AS BIGINT) AS n_a,
           CAST(min(n_b) AS BIGINT) AS n_b,
           CAST(sum((ca + cb) * (n_b * cum_a - n_a * cum_b)
                              * (n_b * cum_a - n_a * cum_b)) AS BIGINT)
             AS cvm_numerator,
           round(sum((ca + cb) * (n_b * cum_a - n_a * cum_b)
                                * (n_b * cum_a - n_a * cum_b))
                 / (CAST(min(n_a) AS DOUBLE) * min(n_b)
                    * (min(n_a) + min(n_b)) * (min(n_a) + min(n_b))), 6)
             AS cvm_stat
    FROM cum
    """,
)
def cramer_von_mises_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises drift statistic (Anderson 1962,
    discrete/tied generalization): T = (nm/N²)·sum_k w_k·(F_a(v_k) −
    F_b(v_k))² with combined-point-mass weights w_k — the INTEGRATED
    squared CDF distance. Completes this module's two-sample drift
    triad: KS (``ks_drift_doclen``) reacts to the largest LOCAL gap,
    Mann-Whitney/AUC (``mannwhitney_drift_doclen``) to stochastic
    ordering (and cancels out symmetric shape changes), CvM to
    accumulated distance everywhere — the one that catches a variance
    change KS under-weights and U misses entirely.

    Exactness: clearing denominators gives the integer numerator
    NUM = sum_k (c_a+c_b)_k · (m·cumA_k − n·cumB_k)², which crosses
    the oracle as a BIGINT; T = NUM/(n·m·N²) is one float division
    rounded once. The cleared products approach BIGINT range once
    group sizes reach ~1e4-1e5 (|m·cumA − n·cumB| ≤ n·m, squared,
    times N), and Spark's non-ANSI longs would WRAP silently where
    DuckDB raises — so the entry guards loudly and symmetrically
    (r10 ADVICE): an in-plan ``assert_true`` on the double-precision
    bound N·(n·m)² < 9e18 raises in the Spark lane exactly where the
    oracle lane's checked BIGINT cast would; past that scale the
    documented move is shard-level audits that keep per-group sizes
    bounded.

    Scale: the same collapsed-support shape as the KS entry —
    per-source value histograms via hash aggregate, one window over
    the merged value DOMAIN, one row out.
    """
    d = load_table(spark, sf_dir, "documents")
    a = (
        d.filter(F.col("source") == KS_A)
        .groupBy(F.col("n_chars").alias("v"))
        .agg(F.count("*").cast("long").alias("ca"))
    )
    b = (
        d.filter(F.col("source") == KS_B)
        .groupBy(F.col("n_chars").alias("v"))
        .agg(F.count("*").cast("long").alias("cb"))
    )
    merged = a.join(b, "v", "full_outer").select(
        "v",
        F.coalesce("ca", F.lit(0)).cast("long").alias("ca"),
        F.coalesce("cb", F.lit(0)).cast("long").alias("cb"),
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = merged.select(
        "ca",
        "cb",
        F.sum("ca").over(w_cum).cast("long").alias("cum_a"),
        F.sum("cb").over(w_cum).cast("long").alias("cum_b"),
        F.sum("ca").over(w_all).cast("long").alias("n_a"),
        F.sum("cb").over(w_all).cast("long").alias("n_b"),
    )
    diff = F.col("n_b") * F.col("cum_a") - F.col("n_a") * F.col("cum_b")
    num_raw = F.sum((F.col("ca") + F.col("cb")) * diff * diff)
    # Loud, symmetric overflow guard (r10 ADVICE): NUM <= N*(n_a*n_b)^2;
    # check that bound in double precision and raise where DuckDB's
    # checked BIGINT arithmetic would, instead of wrapping silently.
    na_d = F.min("n_a").cast("double")
    nb_d = F.min("n_b").cast("double")
    guard = F.assert_true(
        (na_d + nb_d) * na_d * na_d * nb_d * nb_d < F.lit(9.0e18),
        F.lit(
            "cramer_von_mises_drift: integer numerator would overflow "
            "BIGINT at these group sizes; shard the audit"
        ),
    )
    # No `otherwise`: with one, both branches are equal and Catalyst's
    # SimplifyConditionals folds the CASE away, deleting the assert.
    # assert_true returns NULL whenever it does not throw, so this
    # one-armed CASE always yields num_raw — but the predicate stays.
    num = F.when(guard.isNull(), num_raw)
    return cum.agg(
        F.min("n_a").cast("long").alias("n_a"),
        F.min("n_b").cast("long").alias("n_b"),
        num.cast("long").alias("cvm_numerator"),
        F.round(
            num
            / (
                F.min("n_a").cast("double")
                * F.min("n_b")
                * (F.min("n_a") + F.min("n_b"))
                * (F.min("n_a") + F.min("n_b"))
            ),
            6,
        ).alias("cvm_stat"),
    )


TRIPLE_TOP_K = 15  # reported head of the frequent-triple lattice


@query(
    "triple_itemset_support",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_baskets FROM items),
    triples AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b, c.brand AS brand_c,
             CAST(count(*) AS BIGINT) AS sup_abc
      FROM items a
      JOIN items b ON a.ok = b.ok AND a.brand < b.brand
      JOIN items c ON b.ok = c.ok AND b.brand < c.brand
      GROUP BY 1, 2, 3
    )
    SELECT brand_a, brand_b, brand_c, sup_abc,
           round(CAST(sup_abc AS DOUBLE) / n.n_baskets, 6) AS support
    FROM triples CROSS JOIN n
    WHERE sup_abc * 1000 >= n.n_baskets
    ORDER BY sup_abc DESC, brand_a, brand_b, brand_c
    LIMIT {TRIPLE_TOP_K}
    """,
)
def triple_itemset_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets at >= 0.1% support — the Apriori k=3 level
    (Agrawal & Srikant VLDB'94) above ``market_basket_lift_pairs``'
    pairs: which brand TRIPLES co-occur in the same order often
    enough to matter (bundle design, co-retrieval, prompt-mixture
    co-occurrence all ask this at k>2, where pair statistics no
    longer determine the answer).

    Candidate generation is BASKET-LOCAL: each order's distinct
    brands collect into one sorted array and the C(|basket|,3)
    combinations enumerate inside the row (nested ``transform`` over
    index ``sequence``s — no self-join ever materializes a candidate
    row before its basket is in hand), so the only shuffles are the
    basket collect and the triple count. The level-wise Apriori
    candidate PRUNE becomes worthwhile when baskets are large (social
    feeds, long sessions); for bounded baskets like order lines the
    in-row enumeration is strictly cheaper and is what production
    FP-growth/Apriori implementations do below their tree thresholds.

    Exactness: supports are exact integer counts; the 0.1% gate is
    the integer comparison sup·1000 >= n; the support ratio is one
    rounded division; ordering ties break on the brand triple.

    Scale: per-basket work is C(|basket|,3) with |basket| <= line
    count (<= 7 in TPC-H); the triple-count shuffle is map-side
    combined into <= |brands|³ groups; TakeOrderedAndProject caps
    output.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    items = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == part.p_partkey,
    ).select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
    baskets = items.groupBy("ok").agg(
        F.sort_array(F.collect_set("brand")).alias("bs")
    )
    baskets = scoped_persist(baskets)
    n = baskets.agg(F.count("*").cast("long").alias("n_baskets"))
    combos = baskets.filter(F.size("bs") >= 3).select(
        F.explode(
            F.expr(
                """flatten(transform(sequence(0, size(bs) - 3), i ->
                     flatten(transform(sequence(i + 1, size(bs) - 2), j ->
                       transform(sequence(j + 1, size(bs) - 1), k ->
                         struct(bs[i] AS brand_a, bs[j] AS brand_b,
                                bs[k] AS brand_c))))))"""
            )
        ).alias("t")
    )
    triples = combos.groupBy("t.brand_a", "t.brand_b", "t.brand_c").agg(
        F.count("*").cast("long").alias("sup_abc")
    )
    return (
        triples.crossJoin(F.broadcast(n))
        .filter(F.col("sup_abc") * 1000 >= F.col("n_baskets"))
        .select(
            "brand_a",
            "brand_b",
            "brand_c",
            "sup_abc",
            F.round(
                F.col("sup_abc").cast("double") / F.col("n_baskets"), 6
            ).alias("support"),
        )
        .orderBy(F.col("sup_abc").desc(), "brand_a", "brand_b", "brand_c")
        .limit(TRIPLE_TOP_K)
    )


@query(
    "overdispersion_index",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s, CAST(sum(x * x) AS BIGINT) AS q
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           round(CAST(s AS DOUBLE) / n, 4) AS mean_daily,
           round((q - CAST(s AS DOUBLE) * s / n) / nullif(n - 1, 0), 4)
             AS var_daily,
           round(((q - CAST(s AS DOUBLE) * s / n) / nullif(n - 1, 0))
                 / nullif(CAST(s AS DOUBLE) / n, 0), 4) AS dispersion,
           round((n - 1) * ((q - CAST(s AS DOUBLE) * s / n) / nullif(n - 1, 0))
                 / nullif(CAST(s AS DOUBLE) / n, 0), 4) AS chi2_stat
    FROM g ORDER BY event_type
    """,
)
def overdispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion screen for count series (the variance-to-mean
    dispersion index; Cox & Lewis 1966): a Poisson arrival process
    has var/mean = 1, so dispersion >> 1 on the per-type daily counts
    says the Poisson error bars every naive rate monitor assumes are
    WRONG and a negative-binomial (or the ``burstiness_fano_census``
    lens, which applies the same Fano factor to token gaps) is
    needed; (n−1)·dispersion is the classical chi-square statistic
    for H0: Poisson.

    Exactness: n/S/Q are integer aggregates per type; every reported
    number is a fixed float dag over them, nullif-guarded for the
    one-day and zero-mean degenerate shapes, rounded once.

    Scale: one date hash agg, one per-type reduce — series-sized.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count("*").cast("long").alias("x")
    )
    g = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (F.col("q") - F.col("s").cast("double") * F.col("s") / F.col("n")) / F.nullif(
        F.col("n") - 1, F.lit(0)
    )
    disp = var / F.nullif(mean, F.lit(0.0))
    return g.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(mean, 4).alias("mean_daily"),
        F.round(var, 4).alias("var_daily"),
        F.round(disp, 4).alias("dispersion"),
        F.round((F.col("n") - 1) * disp, 4).alias("chi2_stat"),
    ).orderBy("event_type")


CRC_TOL = 0.15  # Chapman estimator tolerance vs the true count


@query(
    "capture_recapture_estimate",
    oracle=f"""
    WITH marks AS (
      SELECT substr(md5('a' || text), 1, 1)
               IN ('0','1','2','3','4','5','6','7') AS c1,
             substr(md5('b' || text), 1, 1)
               IN ('0','1','2','3','4','5','6','7') AS c2
      FROM documents
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_true,
             CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN c1 AND c2 THEN 1 ELSE 0 END) AS BIGINT) AS m
      FROM marks
    )
    SELECT n_true, n1, n2, m,
           round(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1, 2)
             AS chapman_estimate,
           abs(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1 - n_true)
             <= {CRC_TOL} * n_true AS within_tol
    FROM s
    """,
)
def capture_recapture_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture population estimate (Lincoln-Petersen with
    Chapman's 1951 bias correction — the mark-recapture idea crawl
    and dedup planning borrow from ecology: two independent partial
    crawls of the same corpus estimate the UNSEEN total as
    (n1+1)(n2+1)/(m+1) − 1 from their overlap m, answering "how many
    documents exist that neither crawl saw?" without ever seeing
    them; the same two-occasion logic as ``source_overlap_matrix``'s
    contamination census, pointed at totals instead): two
    deterministic hash-marked pseudo-captures (salted md5 bits,
    p = 1/2 each, independent by salt) over the documents corpus,
    with the estimate certified against the TRUE count.

    Exactness: capture marks are identical hash predicates in both
    engines; n1/n2/m are exact integer sums; the estimate is one
    float dag over them and the tolerance verdict is the same
    comparison in both lanes (Chapman sd here is ~2.5% — {CRC_TOL:.0%}
    gives ~6-sigma headroom).

    Scale: one projection + one global conditional aggregate — four
    longs per partition cross the exchange; no joins, no windows.
    """
    d = load_table(spark, sf_dir, "documents")

    def mark(salt: str):
        return F.substring(
            F.md5(F.concat(F.lit(salt), F.col("text"))), 1, 1
        ).isin(*"01234567")

    marks = d.select(mark("a").alias("c1"), mark("b").alias("c2"))
    s = marks.agg(
        F.count("*").cast("long").alias("n_true"),
        F.sum(F.col("c1").cast("int")).cast("long").alias("n1"),
        F.sum(F.col("c2").cast("int")).cast("long").alias("n2"),
        F.sum((F.col("c1") & F.col("c2")).cast("int")).cast("long").alias("m"),
    )
    est = (F.col("n1") + 1).cast("double") * (F.col("n2") + 1) / (F.col("m") + 1) - 1
    return s.select(
        "n_true",
        "n1",
        "n2",
        "m",
        F.round(est, 2).alias("chapman_estimate"),
        (F.abs(est - F.col("n_true")) <= CRC_TOL * F.col("n_true")).alias(
            "within_tol"
        ),
    )


PINBALL_Q_PCT = 90  # evaluated quantile level, integer percent


@query(
    "pinball_loss_eval",
    oracle=f"""
    WITH vh AS (
      SELECT CAST(n_chars AS BIGINT) AS x, CAST(count(*) AS BIGINT) AS cnt
      FROM documents GROUP BY n_chars
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vh),
    vcum AS (
      SELECT x, CAST(sum(cnt) OVER (ORDER BY x) AS BIGINT) AS vc FROM vh
    ),
    pred AS (
      SELECT CAST(min(x) AS BIGINT) AS yhat
      FROM vcum CROSS JOIN tot
      WHERE vc >= ({PINBALL_Q_PCT} * n + 99) // 100
    ),
    loss AS (
      SELECT d.source,
             CASE WHEN d.n_chars >= p.yhat
                  THEN {PINBALL_Q_PCT} * (d.n_chars - p.yhat)
                  ELSE (100 - {PINBALL_Q_PCT}) * (p.yhat - d.n_chars)
             END AS l_cent,
             CASE WHEN d.n_chars <= p.yhat THEN 1 ELSE 0 END AS covered,
             p.yhat
      FROM documents d CROSS JOIN pred p
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(yhat) AS BIGINT) AS predictor,
           round(CAST(sum(l_cent) AS DOUBLE) / (100 * count(*)), 4)
             AS mean_pinball,
           round(CAST(sum(covered) AS DOUBLE) / count(*), 4) AS coverage
    FROM loss GROUP BY source ORDER BY source
    """,
)
def pinball_loss_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss evaluation at tau = 0.9 (Koenker &
    Bassett 1978 — THE proper scoring rule for quantile forecasts;
    what an SLA predictor "p90 document length / p90 latency" must be
    judged by, since MAE/MSE reward the wrong target): the global
    exact p90 serves as the one-number predictor and each source
    scores it with mean pinball loss plus empirical coverage — the
    per-source breakdown showing exactly which sources a global
    quantile misserves (the heterogeneity argument behind
    ``quantile_normalization_map``).

    Exactness: the predictor is the exact order statistic off the
    value histogram (integer rank ceil((q·n+99)/100)); per-doc losses
    stay INTEGER in centi-units (tau·100 = {PINBALL_Q_PCT} vs
    {100 - PINBALL_Q_PCT}); the per-source reduce sums integers and
    divides once.

    Scale: histogram + one broadcast one-row predictor + one
    per-source aggregate; the windows run over the distinct-value
    table only.
    """
    d = load_table(spark, sf_dir, "documents")
    vh = d.groupBy(F.col("n_chars").cast("long").alias("x")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    tot = vh.agg(F.sum("cnt").cast("long").alias("n"))
    w_v = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    vcum = vh.select("x", F.sum("cnt").over(w_v).cast("long").alias("vc"))
    pred = (
        vcum.crossJoin(F.broadcast(tot))
        # Integral `div` mirrors the oracle's `//` exactly at all
        # magnitudes (r10 ADVICE — float `/` + cast truncates wrong
        # past 2^53).
        .filter(F.col("vc") >= F.expr(f"({PINBALL_Q_PCT} * n + 99) div 100"))
        .agg(F.min("x").cast("long").alias("yhat"))
    )
    loss = d.crossJoin(F.broadcast(pred)).select(
        "source",
        "yhat",
        F.when(
            F.col("n_chars") >= F.col("yhat"),
            PINBALL_Q_PCT * (F.col("n_chars") - F.col("yhat")),
        )
        .otherwise((100 - PINBALL_Q_PCT) * (F.col("yhat") - F.col("n_chars")))
        .cast("long")
        .alias("l_cent"),
        (F.col("n_chars") <= F.col("yhat")).cast("int").alias("covered"),
    )
    return (
        loss.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("yhat").cast("long").alias("predictor"),
            F.round(
                F.sum("l_cent").cast("double") / (100 * F.count("*")), 4
            ).alias("mean_pinball"),
            F.round(F.sum("covered").cast("double") / F.count("*"), 4).alias(
                "coverage"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round 11 additions: normality screen, stratified odds ratio, AR(2)
# fit, EVT peaks-over-threshold fit, and the SRM assignment guardrail.
# ---------------------------------------------------------------------------


@query(
    "jarque_bera_normality",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY day
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s1,
             CAST(sum(x * x) AS BIGINT) AS s2
      FROM daily
    ),
    z AS (
      SELECT n,
             (x - CAST(s1 AS DOUBLE) / n)
               / nullif(sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / n) / n), 0) AS z
      FROM daily CROSS JOIN tot
    ),
    q AS (
      SELECT CAST(min(n) AS BIGINT) AS n,
             CAST(sum(CAST(round(1000000 * z * z * z) AS BIGINT))
                  AS BIGINT) AS z3_micro,
             CAST(sum(CAST(round(1000000 * z * z * z * z) AS BIGINT))
                  AS BIGINT) AS z4_micro
      FROM z
    )
    SELECT n AS n_days, z3_micro, z4_micro,
           round(z3_micro / (1000000.0 * n), 4) AS skewness,
           round(z4_micro / (1000000.0 * n), 4) AS kurtosis,
           round((n / 6.0)
                 * (pow(z3_micro / (1000000.0 * n), 2)
                    + pow(z4_micro / (1000000.0 * n) - 3, 2) / 4), 4) AS jb_stat,
           (n / 6.0) * (pow(z3_micro / (1000000.0 * n), 2)
                        + pow(z4_micro / (1000000.0 * n) - 3, 2) / 4)
             <= 5.991464 AS looks_normal
    FROM q
    """,
)
def jarque_bera_normality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality screen over the daily event-count series
    (Jarque & Bera 1980 — the moment-based omnibus test: JB =
    n/6·(S² + (K−3)²/4) ~ chi²(2) under normality; the gate before
    anything downstream assumes Gaussian residuals — control charts,
    z-intervals, Grubbs). Complements ``grubbs_outlier_test`` (single
    worst point) with a WHOLE-SHAPE verdict.

    Exactness: n/S1/S2 are integer aggregates; each day's
    standardized residual z = (x − S1/n)/sqrt((S2 − S1²/n)/n) is one
    fixed IEEE dag (division and sqrt are correctly rounded, so both
    engines produce the identical double), its cube/fourth power
    quantize to integer micro units BEFORE the sum (the ln-reduce
    idiom applied to polynomial terms), and skewness/kurtosis/JB are
    one float dag off the two integer sums. v^1.5 is avoided
    entirely by standardizing per term. |z| stays O(10), so the
    micro-quantized powers are far from BIGINT range at any corpus
    size. The constant series (sd = 0) nullif-guards to NULL moments
    in both lanes rather than a 0/0 NaN whose propagation differs.

    Scale: one date hash agg, a broadcast one-row moment total, and
    a second one-row reduce over the collapsed daily grid.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("x")
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
    )
    z = daily.crossJoin(F.broadcast(tot)).select(
        "n",
        (
            (F.col("x") - F.col("s1").cast("double") / F.col("n"))
            / F.nullif(
                F.sqrt(
                    (
                        F.col("s2")
                        - F.col("s1").cast("double") * F.col("s1") / F.col("n")
                    )
                    / F.col("n")
                ),
                F.lit(0.0),
            )
        ).alias("z"),
    )
    q = z.agg(
        F.min("n").cast("long").alias("n"),
        F.sum(F.round(1_000_000 * F.col("z") * F.col("z") * F.col("z")).cast("long"))
        .cast("long")
        .alias("z3_micro"),
        F.sum(
            F.round(
                1_000_000 * F.col("z") * F.col("z") * F.col("z") * F.col("z")
            ).cast("long")
        )
        .cast("long")
        .alias("z4_micro"),
    )
    skew = F.col("z3_micro") / (1_000_000.0 * F.col("n"))
    kurt = F.col("z4_micro") / (1_000_000.0 * F.col("n"))
    jb = (F.col("n") / 6.0) * (
        F.pow(skew, 2) + F.pow(kurt - 3, 2) / 4
    )
    return q.select(
        F.col("n").alias("n_days"),
        "z3_micro",
        "z4_micro",
        F.round(skew, 4).alias("skewness"),
        F.round(kurt, 4).alias("kurtosis"),
        F.round(jb, 4).alias("jb_stat"),
        (jb <= 5.991464).alias("looks_normal"),
    )


MH_EXPOSED_LANG = "en"  # exposure arm for the stratified 2x2 tables


@query(
    "mantel_haenszel_or",
    oracle=f"""
    WITH vh AS (
      SELECT CAST(n_chars AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS cnt
      FROM documents GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vh),
    vcum AS (
      SELECT v, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS vc FROM vh
    ),
    med AS (
      SELECT CAST(min(v) AS BIGINT) AS m
      FROM vcum CROSS JOIN tot WHERE vc >= (50 * n + 99) // 100
    ),
    cells AS (
      SELECT source,
             CAST(count(*) FILTER (lang = '{MH_EXPOSED_LANG}' AND n_chars >= m)
                  AS BIGINT) AS a,
             CAST(count(*) FILTER (lang = '{MH_EXPOSED_LANG}' AND n_chars < m)
                  AS BIGINT) AS b,
             CAST(count(*) FILTER (lang <> '{MH_EXPOSED_LANG}' AND n_chars >= m)
                  AS BIGINT) AS c,
             CAST(count(*) FILTER (lang <> '{MH_EXPOSED_LANG}' AND n_chars < m)
                  AS BIGINT) AS d
      FROM documents CROSS JOIN med
      GROUP BY source
    ),
    terms AS (
      SELECT CAST(count(*) AS BIGINT) AS n_strata,
             CAST(sum(CAST(round(1000000.0 * a * d / (a + b + c + d))
                           AS BIGINT)) AS BIGINT) AS num_micro,
             CAST(sum(CAST(round(1000000.0 * b * c / (a + b + c + d))
                           AS BIGINT)) AS BIGINT) AS den_micro,
             CAST(sum(a) AS BIGINT) AS pa, CAST(sum(b) AS BIGINT) AS pb,
             CAST(sum(c) AS BIGINT) AS pc, CAST(sum(d) AS BIGINT) AS pd
      FROM cells
    )
    SELECT n_strata, num_micro, den_micro,
           round(CAST(num_micro AS DOUBLE) / nullif(den_micro, 0), 4)
             AS or_mantel_haenszel,
           round(CAST(pa * pd AS DOUBLE) / nullif(pb * pc, 0), 4)
             AS or_crude_pooled
    FROM terms
    """,
)
def mantel_haenszel_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel pooled odds ratio (Mantel & Haenszel 1959 —
    THE stratified 2x2 estimator: association between exposure
    (lang = '{MH_EXPOSED_LANG}') and outcome (doc length ≥ global
    median) pooled ACROSS source strata, weighting each stratum by
    b·c/n). Reported beside the crude pooled OR: the gap between
    them is confounding-by-source made visible — the 2x2 counterpart
    of ``simpsons_paradox_scan``'s continuous decomposition.

    Exactness: the median threshold is the exact rank-⌈n/2⌉ order
    statistic off the value histogram (integral div rank, both
    lanes); the 2x2 cells are integer conditional counts; each
    stratum's a·d/n and b·c/n quantize ONCE to micro units and the
    cross-stratum reduce is an integer sum; both ORs are one float
    division, nullif-guarded for empty denominators.

    Scale: one histogram + one broadcast scalar median + one
    per-source conditional aggregate — strata count bounds every
    later frame.
    """
    d = load_table(spark, sf_dir, "documents")
    vh = d.groupBy(F.col("n_chars").cast("long").alias("v")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    tot = vh.agg(F.sum("cnt").cast("long").alias("n"))
    w_v = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    vcum = vh.select("v", F.sum("cnt").over(w_v).cast("long").alias("vc"))
    med = (
        vcum.crossJoin(F.broadcast(tot))
        .filter(F.col("vc") >= F.expr("(50 * n + 99) div 100"))
        .agg(F.min("v").cast("long").alias("m"))
    )
    exposed = F.col("lang") == MH_EXPOSED_LANG
    outcome = F.col("n_chars") >= F.col("m")
    cells = (
        d.crossJoin(F.broadcast(med))
        .groupBy("source")
        .agg(
            F.count_if(exposed & outcome).cast("long").alias("a"),
            F.count_if(exposed & ~outcome).cast("long").alias("b"),
            F.count_if(~exposed & outcome).cast("long").alias("c"),
            F.count_if(~exposed & ~outcome).cast("long").alias("d"),
        )
    )
    n_i = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    terms = cells.agg(
        F.count("*").cast("long").alias("n_strata"),
        F.sum(F.round(1_000_000.0 * F.col("a") * F.col("d") / n_i).cast("long"))
        .cast("long")
        .alias("num_micro"),
        F.sum(F.round(1_000_000.0 * F.col("b") * F.col("c") / n_i).cast("long"))
        .cast("long")
        .alias("den_micro"),
        F.sum("a").cast("long").alias("pa"),
        F.sum("b").cast("long").alias("pb"),
        F.sum("c").cast("long").alias("pc"),
        F.sum("d").cast("long").alias("pd"),
    )
    return terms.select(
        "n_strata",
        "num_micro",
        "den_micro",
        F.round(
            F.col("num_micro").cast("double") / F.nullif(F.col("den_micro"), F.lit(0)),
            4,
        ).alias("or_mantel_haenszel"),
        F.round(
            (F.col("pa") * F.col("pd")).cast("double")
            / F.nullif(F.col("pb") * F.col("pc"), F.lit(0)),
            4,
        ).alias("or_crude_pooled"),
    )


@query(
    "yule_walker_ar2",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY day
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
      FROM daily
    ),
    y AS (
      SELECT CAST(n * x - s AS BIGINT) AS y,
             CAST(lead(n * x - s, 1) OVER (ORDER BY day) AS BIGINT) AS y1,
             CAST(lead(n * x - s, 2) OVER (ORDER BY day) AS BIGINT) AS y2
      FROM daily CROSS JOIN tot
    ),
    c AS (
      SELECT CAST(sum(y * y) AS BIGINT) AS c0,
             CAST(sum(y * y1) AS BIGINT) AS c1,
             CAST(sum(y * y2) AS BIGINT) AS c2
      FROM y
    )
    SELECT c0 AS c0_num, c1 AS c1_num, c2 AS c2_num,
           round((CAST(c1 AS DOUBLE) / c0)
                 * (1 - CAST(c2 AS DOUBLE) / c0)
                 / nullif(1 - pow(CAST(c1 AS DOUBLE) / c0, 2), 0), 6) AS phi1,
           round((CAST(c2 AS DOUBLE) / c0
                  - pow(CAST(c1 AS DOUBLE) / c0, 2))
                 / nullif(1 - pow(CAST(c1 AS DOUBLE) / c0, 2), 0), 6) AS phi2
    FROM c
    """,
)
def yule_walker_ar2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(2) fit by the Yule-Walker equations over the daily event-
    count series (Yule 1927 / Walker 1931 — the classical
    autoregression solve from sample autocovariances: phi1 =
    r1(1−r2)/(1−r1²), phi2 = (r2−r1²)/(1−r1²); the model selection
    rung above ``event_autocorrelation``'s raw ACF and the
    forecasting complement to ``holt_linear_backtest``).

    Exactness: the mean clears WITHOUT division via y_i = n·x_i − S
    (integer, the Hurst/Grubbs idiom), so every lagged
    autocovariance numerator c_k = Σ y_i·y_{i+k} is an exact BIGINT
    that crosses the oracle (the shared n² factor cancels in every
    ratio); phi1/phi2 are one float dag off the three integers,
    nullif-guarded for the degenerate |r1| = 1 series. Truncated
    (non-circular) lags: the lead() rows past the end drop from each
    sum in both lanes.

    Scale: one date hash agg, then a 2-lag window over the collapsed
    daily grid — bounded by the calendar, never the event count.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("x")
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"), F.sum("x").cast("long").alias("s")
    )
    w = Window.orderBy("day")
    y = daily.crossJoin(F.broadcast(tot)).select(
        (F.col("n") * F.col("x") - F.col("s")).cast("long").alias("y"),
        F.lead(F.col("n") * F.col("x") - F.col("s"), 1)
        .over(w)
        .cast("long")
        .alias("y1"),
        F.lead(F.col("n") * F.col("x") - F.col("s"), 2)
        .over(w)
        .cast("long")
        .alias("y2"),
    )
    c = y.agg(
        F.sum(F.col("y") * F.col("y")).cast("long").alias("c0"),
        F.sum(F.col("y") * F.col("y1")).cast("long").alias("c1"),
        F.sum(F.col("y") * F.col("y2")).cast("long").alias("c2"),
    )
    r1 = F.col("c1").cast("double") / F.col("c0")
    r2 = F.col("c2").cast("double") / F.col("c0")
    den = F.nullif(1 - F.pow(r1, 2), F.lit(0.0))
    return c.select(
        F.col("c0").alias("c0_num"),
        F.col("c1").alias("c1_num"),
        F.col("c2").alias("c2_num"),
        F.round(r1 * (1 - r2) / den, 6).alias("phi1"),
        F.round((r2 - F.pow(r1, 2)) / den, 6).alias("phi2"),
    )


GPD_U_PCT = 95  # peaks-over-threshold: exceedances above the exact p95


@query(
    "gpd_pot_tail_fit",
    oracle=f"""
    WITH vh AS (
      SELECT CAST(n_chars AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS cnt
      FROM documents GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vh),
    vcum AS (
      SELECT v, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS vc FROM vh
    ),
    th AS (
      SELECT CAST(min(v) AS BIGINT) AS u
      FROM vcum CROSS JOIN tot WHERE vc >= ({GPD_U_PCT} * n + 99) // 100
    ),
    exc AS (
      SELECT v - u AS z, cnt,
             CAST(coalesce(sum(cnt) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cum_prev
      FROM vh CROSS JOIN th WHERE v > u
    ),
    s AS (
      SELECT CAST(min(u) AS BIGINT) AS u,
             CAST(sum(cnt) AS BIGINT) AS n_exceed,
             CAST(sum(z * cnt) AS BIGINT) AS b0_num,
             CAST(sum(z * (cnt * cum_prev + (cnt * (cnt - 1)) // 2))
                  AS BIGINT) AS b1_num
      FROM exc CROSS JOIN th
    )
    SELECT u, n_exceed, b0_num, b1_num,
           round(2 - (CAST(b0_num AS DOUBLE) / n_exceed)
                 / nullif(CAST(b0_num AS DOUBLE) / n_exceed
                          - 2.0 * b1_num
                            / nullif(n_exceed * (n_exceed - 1.0), 0), 0),
                 4) AS gpd_xi,
           round(2 * (CAST(b0_num AS DOUBLE) / n_exceed)
                   * (b1_num / nullif(n_exceed * (n_exceed - 1.0), 0))
                 / nullif(CAST(b0_num AS DOUBLE) / n_exceed
                          - 2.0 * b1_num
                            / nullif(n_exceed * (n_exceed - 1.0), 0), 0),
                 4) AS gpd_sigma
    FROM s
    """,
)
def gpd_pot_tail_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized Pareto peaks-over-threshold fit by probability-
    weighted moments (Hosking & Wallis 1987 — THE other extreme-value
    method beside ``hill_tail_index``'s block-free Hill estimator:
    model the exceedances z = x − u above a high threshold u as
    GPD(xi, sigma); xi > 0 is the heavy-tail regime, and
    sigma/(1−xi) + u estimates the tail mean — the capacity number a
    pipeline budgeter actually wants). u is the exact p95 order
    statistic.

    Exactness: u comes off the value histogram at the integral-div
    rank; exceedances are integers; b0's numerator is Σ z·cnt and
    b1's uses the TIE-EXACT rank-weight identity Σ_{{j in group}}
    (j−1) = cnt·cum_prev + C(cnt,2) — a pure integer per distinct
    value, so both PWM numerators cross the oracle as BIGINTs and
    xi/sigma are one float dag (PWM: xi = 2 − b0/(b0 − 2·b1),
    sigma = 2·b0·b1/(b0 − 2·b1)), nullif-guarded at b0 = 2·b1 AND at
    the single-exceedance corpus (n(n−1) = 0 — Spark ANSI raises on
    the division where DuckDB yields inf; the shared nullif makes
    both lanes emit NULL).

    Scale: histogram + broadcast scalar threshold + one window over
    the exceedance VALUE DOMAIN (≤ distinct lengths above p95) —
    the tail of a petabyte corpus reduces to its value support.
    """
    d = load_table(spark, sf_dir, "documents")
    vh = d.groupBy(F.col("n_chars").cast("long").alias("v")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    vh = scoped_persist(vh)
    tot = vh.agg(F.sum("cnt").cast("long").alias("n"))
    w_v = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    vcum = vh.select("v", F.sum("cnt").over(w_v).cast("long").alias("vc"))
    th = (
        vcum.crossJoin(F.broadcast(tot))
        .filter(F.col("vc") >= F.expr(f"({GPD_U_PCT} * n + 99) div 100"))
        .agg(F.min("v").cast("long").alias("u"))
    )
    w_prev = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    exc = (
        vh.crossJoin(F.broadcast(th))
        .filter(F.col("v") > F.col("u"))
        .select(
            "u",
            (F.col("v") - F.col("u")).alias("z"),
            "cnt",
            F.coalesce(F.sum("cnt").over(w_prev), F.lit(0))
            .cast("long")
            .alias("cum_prev"),
        )
    )
    s = exc.agg(
        F.min("u").cast("long").alias("u"),
        F.sum("cnt").cast("long").alias("n_exceed"),
        F.sum(F.col("z") * F.col("cnt")).cast("long").alias("b0_num"),
        F.sum(
            F.col("z")
            * (
                F.col("cnt") * F.col("cum_prev")
                + F.expr("(cnt * (cnt - 1)) div 2")
            )
        )
        .cast("long")
        .alias("b1_num"),
    )
    b0 = F.col("b0_num").cast("double") / F.col("n_exceed")
    b1 = F.col("b1_num") / F.nullif(
        F.col("n_exceed") * (F.col("n_exceed") - 1.0), F.lit(0.0)
    )
    den = F.nullif(b0 - 2.0 * b1, F.lit(0.0))
    return s.select(
        "u",
        "n_exceed",
        "b0_num",
        "b1_num",
        F.round(2 - b0 / den, 4).alias("gpd_xi"),
        F.round(2 * b0 * b1 / den, 4).alias("gpd_sigma"),
    )


SRM_CHI2_CRIT = 3.841459  # chi^2(1) at alpha = 0.05


@query(
    "srm_guardrail_check",
    oracle=f"""
    WITH users AS (SELECT DISTINCT user_id FROM events),
    arms AS (
      SELECT CASE WHEN substring(md5(concat('srm|',
                    CAST(user_id AS VARCHAR))), 1, 1)
                  IN ('0','1','2','3','4','5','6','7')
             THEN 1 ELSE 0 END AS a
      FROM users
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a) AS BIGINT) AS n_a
      FROM arms
    )
    SELECT n AS n_users, n_a, CAST(n - n_a AS BIGINT) AS n_b,
           round(CAST((2 * n_a - n) * (2 * n_a - n) AS DOUBLE) / n, 4)
             AS chi2_stat,
           CAST((2 * n_a - n) * (2 * n_a - n) AS DOUBLE) / n
             > {SRM_CHI2_CRIT} AS srm_detected
    FROM s
    """,
)
def srm_guardrail_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail (Fabijan et al. KDD'19 — the
    first check every experimentation platform runs BEFORE reading a
    metric: under a 50/50 split, chi² = (n_A − n_B)²/n against
    chi²(1); a triggered SRM means the assignment or logging pipeline
    is broken and every downstream p-value — the z-test, CUPED, the
    permutation test — is void). Deterministic md5 bucketing stands
    in for the production assignment log, as in
    ``permutation_test_ab``/``capture_recapture_estimate``.

    Exactness: the chi² numerator is the exact integer (2·n_A − n)²;
    one float division, one literal-threshold comparison — both
    lanes state the identical verdict boolean.

    Scale: a distinct on user_id and one global conditional sum —
    two longs cross the exchange; no joins, no windows.
    """
    e = load_table(spark, sf_dir, "events")
    arms = (
        e.select("user_id")
        .distinct()
        .select(
            F.substring(
                F.md5(F.concat(F.lit("srm|"), F.col("user_id").cast("string"))),
                1,
                1,
            )
            .isin(*"01234567")
            .cast("int")
            .alias("a")
        )
    )
    s = arms.agg(
        F.count("*").cast("long").alias("n"), F.sum("a").cast("long").alias("n_a")
    )
    dev = 2 * F.col("n_a") - F.col("n")
    chi2 = (dev * dev).cast("double") / F.col("n")
    return s.select(
        F.col("n").alias("n_users"),
        "n_a",
        (F.col("n") - F.col("n_a")).cast("long").alias("n_b"),
        F.round(chi2, 4).alias("chi2_stat"),
        (chi2 > SRM_CHI2_CRIT).alias("srm_detected"),
    )


# ---------------------------------------------------------------------------
# Round 11, second wave: exact isotonic calibration, ordered-trend and
# serial-correlation tests, the EVT block-maxima fit, and the
# delta-method ratio metric.
# ---------------------------------------------------------------------------

PAV_BINS = 100  # calibration grid: score = (user_id % PAV_BINS) / PAV_BINS


@query(
    "isotonic_calibration_pav",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(user_id % {PAV_BINS} AS BIGINT) AS bin,
             CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS converted
      FROM events GROUP BY user_id
    ),
    bins AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(converted) AS BIGINT) AS k
      FROM per_user GROUP BY bin
    ),
    cum AS (
      SELECT bin, n, k,
             CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
             CAST(sum(k) OVER (ORDER BY bin) AS BIGINT) AS ck
      FROM bins
    ),
    intervals AS (
      SELECT h.bin AS h, l.bin AS l,
             (l.ck - h.ck + h.k) * 1.0 / (l.cn - h.cn + h.n) AS avg_rate
      FROM cum h JOIN cum l ON h.bin <= l.bin
    ),
    inner_min AS (
      SELECT i.bin, v.h, min(v.avg_rate) AS m
      FROM cum i JOIN intervals v ON v.h <= i.bin AND v.l >= i.bin
      GROUP BY i.bin, v.h
    ),
    fit AS (SELECT bin, max(m) AS iso FROM inner_min GROUP BY bin)
    SELECT b.bin,
           round(b.bin * 1.0 / {PAV_BINS}, 4) AS score,
           b.n, b.k,
           round(b.k * 1.0 / b.n, 6) AS raw_rate,
           round(f.iso, 6) AS isotonic_rate
    FROM bins b JOIN fit f USING (bin)
    ORDER BY b.bin
    """,
)
def isotonic_calibration_pav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT isotonic regression for score calibration (Barlow et al.
    1972; Zadrozny & Elkan KDD'02 made it THE classifier-calibration
    tool): fit the monotone step function closest in L2 to the
    per-bin conversion rates. Instead of the sequential
    pool-adjacent-violators sweep (driver-bound), this uses PAV's
    closed-form MINIMAX characterization — fit(i) = max_{{h<=i}}
    min_{{l>=i}} avg(y[h..l]) — which is pure relational algebra over
    the CALIBRATION GRID: O(B²) weighted interval averages off two
    cumulative sums, B = {PAV_BINS}. The monotone upgrade of
    ``score_calibration_bins``' raw reliability table.

    Exactness: bin counts and cumulative sums are integers; every
    interval average is ONE IEEE division of two integers — identical
    in both engines — and min/max over identical doubles is
    order-free, so the fit is bit-exact with no quantization needed;
    display rounds once.

    Scale: the corpus collapses to B bins; the interval lattice is
    B(B+1)/2 rows joined to B grid points — bounded by the score
    resolution, never the event count. The classic sequential PAV is
    O(B) but inherently serial; B² here is embarrassingly parallel
    and B is a calibration-resolution constant.
    """
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int"))
        .cast("long")
        .alias("converted")
    ).select(
        (F.col("user_id") % PAV_BINS).cast("long").alias("bin"), "converted"
    )
    bins = per_user.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("converted").cast("long").alias("k"),
    )
    bins = scoped_persist(bins)
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "bin",
        "n",
        "k",
        F.sum("n").over(w).cast("long").alias("cn"),
        F.sum("k").over(w).cast("long").alias("ck"),
    )
    cum = scoped_persist(cum)
    h = cum.select(
        F.col("bin").alias("h"), F.col("n").alias("hn"), F.col("k").alias("hk"),
        F.col("cn").alias("hcn"), F.col("ck").alias("hck"),
    )
    low = cum.select(
        F.col("bin").alias("l"), F.col("cn").alias("lcn"), F.col("ck").alias("lck")
    )
    intervals = h.join(low, F.col("h") <= F.col("l")).select(
        "h",
        "l",
        (
            (F.col("lck") - F.col("hck") + F.col("hk"))
            * F.lit(1.0)
            / (F.col("lcn") - F.col("hcn") + F.col("hn"))
        ).alias("avg_rate"),
    )
    grid = cum.select(F.col("bin"))
    inner_min = (
        grid.join(
            intervals, (F.col("h") <= F.col("bin")) & (F.col("l") >= F.col("bin"))
        )
        .groupBy("bin", "h")
        .agg(F.min("avg_rate").alias("m"))
    )
    fit = inner_min.groupBy("bin").agg(F.max("m").alias("iso"))
    return (
        bins.join(fit, "bin")
        .orderBy("bin")
        .select(
            "bin",
            F.round(F.col("bin") * 1.0 / PAV_BINS, 4).alias("score"),
            "n",
            "k",
            F.round(F.col("k") * 1.0 / F.col("n"), 6).alias("raw_rate"),
            F.round(F.col("iso"), 6).alias("isotonic_rate"),
        )
    )


@query(
    "cochran_armitage_trend",
    oracle="""
    WITH g AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS k
      FROM documents GROUP BY source
    ),
    scored AS (
      SELECT n, k,
             CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT) AS w
      FROM g
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(n) AS BIGINT) AS nn, CAST(sum(k) AS BIGINT) AS kk,
             CAST(sum(w * n) AS BIGINT) AS swn,
             CAST(sum(w * k) AS BIGINT) AS swk,
             CAST(sum(w * w * n) AS BIGINT) AS swwn
      FROM scored
    )
    SELECT n_groups, nn AS n_total, kk AS k_total,
           CAST(nn * swk - kk * swn AS BIGINT) AS trend_num,
           round(CAST(nn * swk - kk * swn AS DOUBLE)
                   * (nn * swk - kk * swn)
                 * nn
                 / nullif(CAST(kk AS DOUBLE) * (nn - kk)
                          * (nn * swwn - swn * swn), 0), 4) AS chi2_trend,
           CAST(nn * swk - kk * swn AS DOUBLE)
             * (nn * swk - kk * swn) * nn
             / nullif(CAST(kk AS DOUBLE) * (nn - kk)
                      * (nn * swwn - swn * swn), 0) > 3.841459
             AS trend_detected
    FROM s
    """,
)
def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test (Cochran 1954 / Armitage 1955 —
    THE test for a monotone trend in proportions across ORDERED
    groups; the 2xk upgrade of the pairwise two-proportion z): does
    the English-document share trend across the source ladder
    (sources ordered lexicographically, integer scores 0..k−1)?
    Catches ordered drift a plain chi-square homogeneity test
    dilutes across its k−1 degrees of freedom.

    Exactness: the trend numerator N·Σwk − K·Σwn and the variance
    pieces are pure BIGINT arithmetic off six integer aggregates
    (the numerator crosses the oracle raw); chi² is one float
    division against chi²(1), nullif-guarded for the degenerate
    all-converted / single-group shapes.

    Scale: one per-source conditional aggregate + a k-row window —
    group count bounds everything after the first reduce.
    """
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.count_if(F.col("lang") == "en").cast("long").alias("k"),
    )
    scored = g.select(
        "n",
        "k",
        (F.row_number().over(Window.orderBy("source")) - 1)
        .cast("long")
        .alias("w"),
    )
    s = scored.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("k").cast("long").alias("kk"),
        F.sum(F.col("w") * F.col("n")).cast("long").alias("swn"),
        F.sum(F.col("w") * F.col("k")).cast("long").alias("swk"),
        F.sum(F.col("w") * F.col("w") * F.col("n")).cast("long").alias("swwn"),
    )
    num = F.col("nn") * F.col("swk") - F.col("kk") * F.col("swn")
    chi2 = (
        num.cast("double")
        * num
        * F.col("nn")
        / F.nullif(
            F.col("kk").cast("double")
            * (F.col("nn") - F.col("kk"))
            * (F.col("nn") * F.col("swwn") - F.col("swn") * F.col("swn")),
            F.lit(0.0),
        )
    )
    return s.select(
        "n_groups",
        F.col("nn").alias("n_total"),
        F.col("kk").alias("k_total"),
        num.cast("long").alias("trend_num"),
        F.round(chi2, 4).alias("chi2_trend"),
        (chi2 > 3.841459).alias("trend_detected"),
    )


@query(
    "durbin_watson",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY day
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
      FROM daily
    ),
    y AS (
      SELECT CAST(n * x - s AS BIGINT) AS y,
             CAST(lag(n * x - s, 1) OVER (ORDER BY day) AS BIGINT) AS yp
      FROM daily CROSS JOIN tot
    ),
    s2 AS (
      SELECT CAST(sum(y * y) AS BIGINT) AS ss,
             CAST(sum((y - yp) * (y - yp)) AS BIGINT) AS sd
      FROM y
    )
    SELECT ss AS resid_ss_num, sd AS diff_ss_num,
           round(CAST(sd AS DOUBLE) / nullif(ss, 0), 4) AS dw_stat,
           CAST(sd AS DOUBLE) / nullif(ss, 0) < 1.0 AS positive_autocorr
    FROM s2
    """,
)
def durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson serial-correlation statistic over the daily
    event-count residuals (Durbin & Watson 1950 — the regression
    diagnostic read before trusting any i.i.d.-based interval:
    DW ≈ 2(1−ρ₁); DW → 0 under positive autocorrelation, → 4 under
    negative). The single-number companion to ``ljung_box_test``'s
    multi-lag portmanteau and the diagnostic that says whether
    ``effective_sample_size``'s correction is even needed.

    Exactness: residuals clear the mean without division via
    y = n·x − S (integer); both the residual sum of squares and the
    lag-difference sum of squares are exact BIGINTs that cross the
    oracle (the shared n² factor cancels in the ratio); DW is one
    float division, nullif-guarded for the constant series. The
    first day's lag is NULL and drops from the difference sum in
    both lanes.

    Scale: one date hash agg + a 1-lag window over the collapsed
    daily grid.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("x")
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"), F.sum("x").cast("long").alias("s")
    )
    w = Window.orderBy("day")
    y = daily.crossJoin(F.broadcast(tot)).select(
        (F.col("n") * F.col("x") - F.col("s")).cast("long").alias("y"),
        F.lag(F.col("n") * F.col("x") - F.col("s"), 1)
        .over(w)
        .cast("long")
        .alias("yp"),
    )
    s2 = y.agg(
        F.sum(F.col("y") * F.col("y")).cast("long").alias("ss"),
        F.sum((F.col("y") - F.col("yp")) * (F.col("y") - F.col("yp")))
        .cast("long")
        .alias("sd"),
    )
    dw = F.col("sd").cast("double") / F.nullif(F.col("ss"), F.lit(0))
    return s2.select(
        F.col("ss").alias("resid_ss_num"),
        F.col("sd").alias("diff_ss_num"),
        F.round(dw, 4).alias("dw_stat"),
        (dw < 1.0).alias("positive_autocorr"),
    )


LN2 = 0.6931471805599453  # literal ln 2: no engine-libm ln in the dag
EULER_GAMMA = 0.5772156649015329  # Euler-Mascheroni, same reason


@query(
    "gumbel_block_maxima_fit",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY day
    ),
    blocks AS (
      SELECT date_trunc('month', day) AS block,
             CAST(max(x) AS BIGINT) AS m
      FROM daily GROUP BY 1
    ),
    mh AS (
      SELECT m, CAST(count(*) AS BIGINT) AS cnt FROM blocks GROUP BY m
    ),
    ranked AS (
      SELECT m, cnt,
             CAST(coalesce(sum(cnt) OVER (ORDER BY m
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cum_prev
      FROM mh
    ),
    s AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS nb,
             CAST(sum(m * cnt) AS BIGINT) AS b0_num,
             CAST(sum(m * (cnt * cum_prev + (cnt * (cnt - 1)) // 2))
                  AS BIGINT) AS b1_num
      FROM ranked
    )
    SELECT nb AS n_blocks, b0_num, b1_num,
           round((2.0 * b1_num / nullif(nb * (nb - 1.0), 0)
                  - CAST(b0_num AS DOUBLE) / nb) / {LN2}, 4) AS gumbel_beta,
           round(CAST(b0_num AS DOUBLE) / nb
                 - {EULER_GAMMA}
                   * ((2.0 * b1_num / nullif(nb * (nb - 1.0), 0)
                       - CAST(b0_num AS DOUBLE) / nb) / {LN2}), 4) AS gumbel_mu
    FROM s
    """,
)
def gumbel_block_maxima_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel fit of MONTHLY block maxima by probability-weighted
    moments (Hosking, Wallis & Wood 1985: beta = (2b₁ − b₀)/ln 2,
    mu = b₀ − gamma·beta) — the third classical extreme-value method,
    completing this module's EVT triad: ``hill_tail_index`` (order
    statistics), ``gpd_pot_tail_fit`` (exceedances), and now block
    maxima — the load-planning fit behind "what daily peak should we
    provision for?".

    Exactness: block maxima are integer aggregates on the daily
    grid; b₀/b₁ numerators use the same tie-exact rank-weight
    identity as the GPD entry and cross the oracle as BIGINTs; ln 2
    and the Euler-Mascheroni constant enter as shared LITERALS so no
    engine-libm transcendental sits in the dag; beta/mu are one
    float dag, nullif-guarded for the single-block series.

    Scale: date agg → month agg → value-domain window over distinct
    maxima — bounded by the calendar.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("x")
    )
    blocks = daily.groupBy(F.date_trunc("month", "day").alias("block")).agg(
        F.max("x").cast("long").alias("m")
    )
    mh = blocks.groupBy("m").agg(F.count("*").cast("long").alias("cnt"))
    w_prev = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, -1)
    ranked = mh.select(
        "m",
        "cnt",
        F.coalesce(F.sum("cnt").over(w_prev), F.lit(0))
        .cast("long")
        .alias("cum_prev"),
    )
    s = ranked.agg(
        F.sum("cnt").cast("long").alias("nb"),
        F.sum(F.col("m") * F.col("cnt")).cast("long").alias("b0_num"),
        F.sum(
            F.col("m")
            * (
                F.col("cnt") * F.col("cum_prev")
                + F.expr("(cnt * (cnt - 1)) div 2")
            )
        )
        .cast("long")
        .alias("b1_num"),
    )
    b0 = F.col("b0_num").cast("double") / F.col("nb")
    b1 = F.col("b1_num") * 2.0 / F.nullif(
        F.col("nb") * (F.col("nb") - 1.0), F.lit(0.0)
    )
    beta = (b1 - b0) / LN2
    return s.select(
        F.col("nb").alias("n_blocks"),
        "b0_num",
        "b1_num",
        F.round(beta, 4).alias("gumbel_beta"),
        F.round(b0 - EULER_GAMMA * beta, 4).alias("gumbel_mu"),
    )


@query(
    "ratio_metric_delta_method",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM per_user
    )
    SELECT n AS n_users, sx AS sum_cents, sy AS sum_events,
           round(CAST(sx AS DOUBLE) / sy, 6) AS ratio_cents_per_event,
           round(sqrt(greatest(
                   (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                   - 2 * (CAST(sx AS DOUBLE) / sy)
                     * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
                   + (CAST(sx AS DOUBLE) / sy) * (CAST(sx AS DOUBLE) / sy)
                     * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n),
                   0))
                 / nullif(CAST(sy AS DOUBLE) / n, 0) / n, 6) AS se_delta
    FROM s
    """,
)
def ratio_metric_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method standard error for a RATIO metric (Fieller/
    Deng et al. KDD'18 "Applying the Delta Method in Metric
    Analytics" — the estimator every experimentation platform uses
    for revenue-per-session-style metrics, where the unit of
    analysis (user) differs from the metric denominator (event) and
    the naive per-event variance is wrong because events within a
    user correlate): R = ΣX/ΣY over user-level (X, Y) pairs,
    se(R) = sqrt(Sxx' − 2R·Sxy' + R²·Syy') / (ȳ·n), with the
    centered sums taken user-level.

    Exactness: revenue quantizes to integer cents per event BEFORE
    any aggregation; the six user-level power sums are exact BIGINTs
    (cents² bounded well inside BIGINT at any realistic corpus);
    ratio and the delta variance are ONE shared float dag off those
    integers — identical IEEE in both lanes; ``greatest(·, 0)``
    clamps the tiny-negative float cancellation case identically.

    Scale: one per-user aggregate then one global reduce — six longs
    per partition cross the exchange; no joins, no windows.
    """
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("x"),
        F.count("*").cast("long").alias("y"),
    )
    s = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    r = F.col("sx").cast("double") / F.col("sy")
    cxx = F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("n")
    cxy = F.col("sxy") - F.col("sx").cast("double") * F.col("sy") / F.col("n")
    cyy = F.col("syy") - F.col("sy").cast("double") * F.col("sy") / F.col("n")
    var_core = F.greatest(cxx - 2 * r * cxy + r * r * cyy, F.lit(0.0))
    se = F.sqrt(var_core) / F.nullif(
        F.col("sy").cast("double") / F.col("n"), F.lit(0.0)
    ) / F.col("n")
    return s.select(
        F.col("n").alias("n_users"),
        F.col("sx").alias("sum_cents"),
        F.col("sy").alias("sum_events"),
        F.round(r, 6).alias("ratio_cents_per_event"),
        F.round(se, 6).alias("se_delta"),
    )


@query(
    "energy_distance_drift",
    oracle=f"""
    WITH a AS (
      SELECT CAST(n_chars AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS ca
      FROM documents WHERE source = '{KS_A}' GROUP BY 1
    ),
    b AS (
      SELECT CAST(n_chars AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS cb
      FROM documents WHERE source = '{KS_B}' GROUP BY 1
    ),
    merged AS (
      SELECT coalesce(a.v, b.v) AS v,
             coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
      FROM a FULL OUTER JOIN b ON a.v = b.v
    ),
    cum AS (
      SELECT v, ca, cb,
             CAST(coalesce(sum(ca) OVER w, 0) AS BIGINT) AS calt,
             CAST(coalesce(sum(cb) OVER w, 0) AS BIGINT) AS cblt,
             CAST(coalesce(sum(v * ca) OVER w, 0) AS BIGINT) AS salt,
             CAST(coalesce(sum(v * cb) OVER w, 0) AS BIGINT) AS sblt
      FROM merged
      WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING)
    ),
    s AS (
      SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
             CAST(max(v) AS BIGINT) AS vmax,
             CAST(sum(ca * (v * cblt - sblt) + cb * (v * calt - salt))
                  AS BIGINT) AS sab,
             CAST(2 * sum(ca * (v * calt - salt)) AS BIGINT) AS saa,
             CAST(2 * sum(cb * (v * cblt - sblt)) AS BIGINT) AS sbb
      FROM cum
    )
    SELECT n_a, n_b, sab, saa, sbb,
           round(2.0 * sab / (n_a * CAST(n_b AS DOUBLE))
                 - CAST(saa AS DOUBLE) / (n_a * CAST(n_a AS DOUBLE))
                 - CAST(sbb AS DOUBLE) / (n_b * CAST(n_b AS DOUBLE)), 6)
             AS energy_distance
    FROM s
    """,
)
def energy_distance_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample ENERGY distance (Szekely & Rizzo 2004: E = 2·E|X−Y|
    − E|X−X'| − E|Y−Y'| — zero iff the distributions are equal,
    sensitive to ANY difference, the characteristic-function-complete
    member of this module's drift suite beside KS (largest local
    gap), CvM (integrated squared gap), Wasserstein (transport cost)
    and Mann-Whitney (stochastic order)).

    Exactness WITHOUT a pair join: every all-pairs absolute-difference
    sum collapses to cumulative count/sum windows over the merged
    VALUE DOMAIN — for the element at v, the pairs it dominates
    contribute v·(#smaller) − (sum of smaller) — so sab/saa/sbb are
    exact BIGINTs that cross the oracle (n_a·n_b, n_a², n_b² pair
    sums computed in O(|domain|)); E is one float dag off three
    integers. A loud symmetric guard (the CvM idiom) raises before
    the cleared products could exceed BIGINT.

    Scale: per-source histograms, one full-outer domain merge, one
    ordered window — bounded by distinct lengths, never the corpus;
    the naive formulation is an n² pair join, this is the 100 TB
    form.
    """
    d = load_table(spark, sf_dir, "documents")
    a = (
        d.filter(F.col("source") == KS_A)
        .groupBy(F.col("n_chars").cast("long").alias("v"))
        .agg(F.count("*").cast("long").alias("ca"))
    )
    b = (
        d.filter(F.col("source") == KS_B)
        .groupBy(F.col("n_chars").cast("long").alias("v"))
        .agg(F.count("*").cast("long").alias("cb"))
    )
    merged = a.join(b, "v", "full_outer").select(
        "v",
        F.coalesce("ca", F.lit(0)).cast("long").alias("ca"),
        F.coalesce("cb", F.lit(0)).cast("long").alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = merged.select(
        "v",
        "ca",
        "cb",
        F.coalesce(F.sum("ca").over(w), F.lit(0)).cast("long").alias("calt"),
        F.coalesce(F.sum("cb").over(w), F.lit(0)).cast("long").alias("cblt"),
        F.coalesce(F.sum(F.col("v") * F.col("ca")).over(w), F.lit(0))
        .cast("long")
        .alias("salt"),
        F.coalesce(F.sum(F.col("v") * F.col("cb")).over(w), F.lit(0))
        .cast("long")
        .alias("sblt"),
    )
    sab_raw = F.sum(
        F.col("ca") * (F.col("v") * F.col("cblt") - F.col("sblt"))
        + F.col("cb") * (F.col("v") * F.col("calt") - F.col("salt"))
    )
    saa_raw = 2 * F.sum(F.col("ca") * (F.col("v") * F.col("calt") - F.col("salt")))
    sbb_raw = 2 * F.sum(F.col("cb") * (F.col("v") * F.col("cblt") - F.col("sblt")))
    na_d = F.sum("ca").cast("double")
    nb_d = F.sum("cb").cast("double")
    vmax_d = F.max("v").cast("double")
    guard = F.assert_true(
        (na_d + nb_d) * (na_d + nb_d) * vmax_d < F.lit(4.5e18),
        F.lit(
            "energy_distance_drift: pair-sum numerators would overflow "
            "BIGINT at these group sizes; shard the audit"
        ),
    )
    # One-armed CASE (no otherwise): equal branches would let Catalyst
    # fold the assert away — the cramer_von_mises_drift lesson.
    sab = F.when(guard.isNull(), sab_raw)
    s = cum.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        sab.cast("long").alias("sab"),
        saa_raw.cast("long").alias("saa"),
        sbb_raw.cast("long").alias("sbb"),
    )
    return s.select(
        "n_a",
        "n_b",
        "sab",
        "saa",
        "sbb",
        F.round(
            2.0 * F.col("sab") / (F.col("n_a") * F.col("n_b").cast("double"))
            - F.col("saa").cast("double")
            / (F.col("n_a") * F.col("n_a").cast("double"))
            - F.col("sbb").cast("double")
            / (F.col("n_b") * F.col("n_b").cast("double")),
            6,
        ).alias("energy_distance"),
    )


GAINS_POS_MIN = 16  # positive = a heavy purchaser (>= 16 purchase events)


@query(
    "gains_decile_table",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             md5(concat('score|', CAST(user_id AS VARCHAR))) AS score,
             CAST(CASE WHEN count(*) FILTER (event_type = 'purchase')
                       >= {GAINS_POS_MIN} THEN 1 ELSE 0 END AS BIGINT) AS pos
      FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT pos,
             CAST(row_number() OVER (ORDER BY score DESC, user_id)
                  AS BIGINT) AS r,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM per_user
    ),
    dec AS (
      SELECT ((r - 1) * 10) // n AS decile, pos, n FROM ranked
    ),
    g AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(pos) AS BIGINT) AS n_pos, CAST(min(n) AS BIGINT) AS n
      FROM dec GROUP BY decile
    ),
    c AS (
      SELECT decile, n_users, n_pos, n,
             CAST(sum(n_pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
             CAST(sum(n_pos) OVER () AS BIGINT) AS total_pos
      FROM g
    )
    SELECT decile, n_users, n_pos,
           round(CAST(cum_pos AS DOUBLE) / nullif(total_pos, 0), 6)
             AS cum_capture,
           round((CAST(n_pos AS DOUBLE) / n_users)
                 / nullif(CAST(total_pos AS DOUBLE) / n, 0), 6) AS lift
    FROM c
    ORDER BY decile
    """,
)
def gains_decile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-gains / decile-lift table (the classic model-triage
    report every targeting campaign reads before ROC: rank users by
    model score, cut into deciles, report each decile's capture of
    all positives and its lift over the base rate; the deterministic
    md5 pseudo-score stands in for the production model exactly as in
    ``roc_auc_rank``/``srm_guardrail_check``). Complements
    ``qini_uplift_curve`` (incremental effect) and ``roc_auc_rank``
    (threshold-free discrimination) with the capacity-planning view:
    "mail the top 2 deciles, get what fraction of converters?".

    Exactness: the rank is a total order (score, user_id) so deciles
    are deterministic; the decile index is integral ``div``
    arithmetic (the r10-ADVICE idiom); counts, positives, and
    cumulative sums are BIGINTs; capture and lift divide once,
    nullif-guarded for the no-positives corpus.

    Scale: the corpus reduces to the USER table first; the global
    rank is one range-partitioned sort of user-sized data (the cost
    of any ORDER BY export), and everything after is a 10-row frame.
    """
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        (
            F.count_if(F.col("event_type") == "purchase") >= GAINS_POS_MIN
        )
        .cast("long")
        .alias("pos")
    ).select(
        "user_id",
        F.md5(F.concat(F.lit("score|"), F.col("user_id").cast("string"))).alias(
            "score"
        ),
        "pos",
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = per_user.select(
        "pos",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), "user_id"))
        .cast("long")
        .alias("r"),
        F.count("*").over(w_all).cast("long").alias("n"),
    )
    dec = ranked.select(
        F.expr("((r - 1) * 10) div n").alias("decile"), "pos", "n"
    )
    g = dec.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.min("n").cast("long").alias("n"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select(
        "decile",
        "n_users",
        "n_pos",
        "n",
        F.sum("n_pos").over(w_cum).cast("long").alias("cum_pos"),
        F.sum("n_pos").over(w_all).cast("long").alias("total_pos"),
    )
    return c.select(
        "decile",
        "n_users",
        "n_pos",
        F.round(
            F.col("cum_pos").cast("double")
            / F.nullif(F.col("total_pos"), F.lit(0)),
            6,
        ).alias("cum_capture"),
        F.round(
            (F.col("n_pos").cast("double") / F.col("n_users"))
            / F.nullif(F.col("total_pos").cast("double") / F.col("n"), F.lit(0.0)),
            6,
        ).alias("lift"),
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# Round 12: nonparametric/effect-size/association batch.
# ---------------------------------------------------------------------------


@query(
    "wilcoxon_signed_rank",
    oracle="""
    WITH per AS (
      SELECT o_custkey AS cust,
             CAST(sum(CASE WHEN month(o_orderdate) % 2 = 1
                      THEN CAST(round(o_totalprice * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN month(o_orderdate) % 2 = 0
                      THEN CAST(round(o_totalprice * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS y,
             CAST(sum(CASE WHEN month(o_orderdate) % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_odd,
             CAST(sum(CASE WHEN month(o_orderdate) % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_even
      FROM orders GROUP BY 1
    ),
    d AS (
      SELECT x - y AS d, abs(x - y) AS ad FROM per
      WHERE n_odd > 0 AND n_even > 0 AND x <> y
    ),
    h AS (SELECT ad, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY ad),
    r AS (
      SELECT ad,
             CAST(2 * coalesce(sum(c) OVER (ORDER BY ad
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + c + 1 AS BIGINT) AS mr2
      FROM h
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN d.d > 0 THEN r.mr2 ELSE 0 END) AS BIGINT)
               AS w2
      FROM d JOIN r USING (ad)
    )
    SELECT n AS n_pairs,
           round(w2 / 2.0, 1) AS w_plus,
           round((w2 - n * (n + 1) / 2.0)
                 / nullif(sqrt(n * (n + 1.0) * (2 * n + 1) / 6.0), 0), 4)
             AS z_score
    FROM s
    """,
)
def wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test (Wilcoxon 1945 — THE paired
    nonparametric location test; the paired sibling of this module's
    Mann-Whitney two-sample entry): each customer's odd-month vs
    even-month spend (integer cents) forms a matched pair; zero
    differences drop (the standard convention), |d| gets tie-exact
    MIDRANKS from the |d|-value histogram (2·midrank = 2·cum_prev +
    tied + 1 stays integral), and W+ sums the positive-difference
    ranks. The normal approximation z = (W+ − n(n+1)/4) /
    sqrt(n(n+1)(2n+1)/24) is reported on the doubled-integer scale
    (shared float dag, no tie-variance correction — stated, and
    identical in both lanes).

    Exactness: spend quantizes to cents BEFORE differencing; W2 =
    2·W+ is an exact integer from the midrank join; the z dag is the
    only float math and runs once over three integers.

    Scale: one per-customer hash agg, one |d|-histogram window over
    the distinct-difference domain (value-collapsed, not row-sized),
    one broadcast-size join back. Nothing row-sized after the agg.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    odd = F.month("o_orderdate") % 2 == 1
    per = o.groupBy("o_custkey").agg(
        F.sum(F.when(odd, cents).otherwise(F.lit(0))).cast("long").alias("x"),
        F.sum(F.when(~odd, cents).otherwise(F.lit(0))).cast("long").alias("y"),
        F.sum(odd.cast("int")).cast("long").alias("n_odd"),
        F.sum((~odd).cast("int")).cast("long").alias("n_even"),
    )
    d = per.filter(
        (F.col("n_odd") > 0) & (F.col("n_even") > 0) & (F.col("x") != F.col("y"))
    ).select(
        (F.col("x") - F.col("y")).alias("d"),
        F.abs(F.col("x") - F.col("y")).alias("ad"),
    )
    d = scoped_persist(d)
    h = d.groupBy("ad").agg(F.count("*").cast("long").alias("c"))
    w_prev = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    r = h.select(
        "ad",
        (
            2 * F.coalesce(F.sum("c").over(w_prev), F.lit(0))
            + F.col("c")
            + 1
        )
        .cast("long")
        .alias("mr2"),
    )
    s = d.join(r, "ad").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("d") > 0, F.col("mr2")).otherwise(F.lit(0)))
        .cast("long")
        .alias("w2"),
    )
    n = F.col("n")
    return s.select(
        n.alias("n_pairs"),
        F.round(F.col("w2") / 2.0, 1).alias("w_plus"),
        F.round(
            (F.col("w2") - n * (n + 1) / 2.0)
            / F.nullif(
                F.sqrt(n * (n + 1.0) * (2 * n + 1) / 6.0), F.lit(0.0)
            ),
            4,
        ).alias("z_score"),
    )


KW_RATERS = 3  # nation rankings by customer count / total / max balance


@query(
    "kendall_w_concordance",
    oracle=f"""
    WITH nat AS (
      SELECT c_nationkey AS item,
             CAST(count(*) AS BIGINT) AS m1,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS m2,
             CAST(max(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS m3
      FROM customer GROUP BY 1
    ),
    u AS (
      SELECT item, 1 AS rater, m1 AS v FROM nat
      UNION ALL SELECT item, 2, m2 FROM nat
      UNION ALL SELECT item, 3, m3 FROM nat
    ),
    h AS (SELECT rater, v, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY 1, 2),
    r AS (
      SELECT rater, v,
             CAST(2 * coalesce(sum(c) OVER (PARTITION BY rater ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + c + 1 AS BIGINT) AS mr2
      FROM h
    ),
    ri AS (
      SELECT u.item, CAST(sum(r.mr2) AS BIGINT) AS r2
      FROM u JOIN r ON u.rater = r.rater AND u.v = r.v
      GROUP BY 1
    ),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(r2 * r2) AS BIGINT) AS sr2 FROM ri)
    SELECT n AS n_items,
           CAST({KW_RATERS} AS BIGINT) AS m_raters,
           round((3.0 * sr2 - 3.0 * {KW_RATERS * KW_RATERS} * n * (n + 1) * (n + 1))
                 / nullif({KW_RATERS * KW_RATERS} * 1.0 * n * (n * n - 1), 0), 6)
             AS kendall_w
    FROM s
    """,
)
def kendall_w_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance W (Kendall & Babington
    Smith 1939 — "do m rankings agree?"): three deterministic raters
    rank the nations (customer count, total balance cents, max
    balance cents); W = (12·ΣR² − 3m²n(n+1)²) / (m²n(n²−1)) over the
    per-item rank sums. Completes the agreement ladder beside
    Cohen's/Fleiss' kappa (categorical raters) and Friedman (the test
    whose effect size W is). Midranks on the DOUBLED integer scale
    (12ΣR² = 3ΣR2²) keep ties exact; the classical no-tie-correction
    form is stated and identical in both lanes.

    Exactness: metrics quantize to cents before ranking; rank sums
    and ΣR2² are exact integers (25 items → tiny); W is one float
    division.

    Scale: one customer hash agg to |nations| rows; everything after
    is constant-size.
    """
    c = load_table(spark, sf_dir, "customer")
    bal = F.round(F.col("c_acctbal") * 100).cast("long")
    nat = c.groupBy(F.col("c_nationkey").alias("item")).agg(
        F.count("*").cast("long").alias("m1"),
        F.sum(bal).cast("long").alias("m2"),
        F.max(bal).cast("long").alias("m3"),
    )
    nat = scoped_persist(nat)
    u = (
        nat.select("item", F.lit(1).alias("rater"), F.col("m1").alias("v"))
        .unionByName(
            nat.select("item", F.lit(2).alias("rater"), F.col("m2").alias("v"))
        )
        .unionByName(
            nat.select("item", F.lit(3).alias("rater"), F.col("m3").alias("v"))
        )
    )
    u = scoped_persist(u)
    h = u.groupBy("rater", "v").agg(F.count("*").cast("long").alias("c"))
    w_prev = (
        Window.partitionBy("rater")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = h.select(
        "rater",
        "v",
        (2 * F.coalesce(F.sum("c").over(w_prev), F.lit(0)) + F.col("c") + 1)
        .cast("long")
        .alias("mr2"),
    )
    ri = u.join(r, ["rater", "v"]).groupBy("item").agg(
        F.sum("mr2").cast("long").alias("r2")
    )
    s = ri.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("r2") * F.col("r2")).cast("long").alias("sr2"),
    )
    n = F.col("n")
    m2 = KW_RATERS * KW_RATERS
    return s.select(
        n.alias("n_items"),
        F.lit(KW_RATERS).cast("long").alias("m_raters"),
        F.round(
            (3.0 * F.col("sr2") - 3.0 * m2 * n * (n + 1) * (n + 1))
            / F.nullif(m2 * 1.0 * n * (n * n - 1), F.lit(0.0)),
            6,
        ).alias("kendall_w"),
    )


@query(
    "negative_binomial_mom_fit",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s1,
             CAST(sum(x * x) AS BIGINT) AS s2
      FROM daily
    )
    SELECT n AS n_days,
           round(CAST(s1 AS DOUBLE) / n, 4) AS mean_daily,
           round((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                 / nullif(n - 1, 0), 4) AS var_daily,
           round((CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                 / nullif((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                          / nullif(n - 1, 0)
                          - CAST(s1 AS DOUBLE) / n, 0), 4) AS nb_r,
           round((CAST(s1 AS DOUBLE) / n)
                 / nullif((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                          / nullif(n - 1, 0), 0), 6) AS nb_p
    FROM s
    """,
)
def negative_binomial_mom_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial fit of the daily event-count distribution by
    method of moments (r = m²/(v−m), p = m/v — the overdispersed
    count model Poisson can't be): turns this module's
    ``overdispersion_index`` SCREEN into an actual fitted model, the
    capacity-planning distribution for "how bursty are arrivals
    really". Underdispersed data (v ≤ m) yields NULL r — the honest
    answer, stated by the shared nullif.

    Exactness: day counts and their power sums are exact integers;
    mean/variance/r/p are one shared float dag.

    Scale: date hash agg → one global reduce of three longs.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("x")
    )
    s = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
    )
    n = F.col("n")
    mean = F.col("s1").cast("double") / n
    var = (
        F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / n
    ) / F.nullif(n - 1, F.lit(0))
    return s.select(
        n.alias("n_days"),
        F.round(mean, 4).alias("mean_daily"),
        F.round(var, 4).alias("var_daily"),
        F.round(mean * mean / F.nullif(var - mean, F.lit(0.0)), 4).alias("nb_r"),
        F.round(mean / F.nullif(var, F.lit(0.0)), 6).alias("nb_p"),
    )


CD_BASELINE_LANG = "en"  # effect sizes against the same baseline as welch_t


@query(
    "cohens_d_effect_size",
    oracle=f"""
    WITH g AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_chars) AS BIGINT) AS s1,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
      FROM documents GROUP BY lang
    ),
    m AS (
      SELECT lang, n,
             CAST(s1 AS DOUBLE) / n AS mean,
             (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
               / nullif(n - 1, 0) AS var
      FROM g
    ),
    base AS (SELECT n AS n0, mean AS m0, var AS v0 FROM m
             WHERE lang = '{CD_BASELINE_LANG}')
    SELECT m.lang, m.n AS n_docs,
           round((m.mean - b.m0)
                 / nullif(sqrt(((m.n - 1) * m.var + (b.n0 - 1) * b.v0)
                               / nullif(m.n + b.n0 - 2, 0)), 0), 4)
             AS cohens_d,
           round((m.mean - b.m0)
                 / nullif(sqrt(((m.n - 1) * m.var + (b.n0 - 1) * b.v0)
                               / nullif(m.n + b.n0 - 2, 0)), 0)
                 * (1.0 - 3.0 / (4.0 * (m.n + b.n0) - 9.0)), 4)
             AS hedges_g
    FROM m CROSS JOIN base b
    WHERE m.lang <> '{CD_BASELINE_LANG}'
    ORDER BY m.lang
    """,
)
def cohens_d_effect_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d and Hedges' g (small-sample-corrected) standardized
    mean differences of document length per language vs the 'en'
    baseline — the EFFECT SIZE companion to ``welch_t_doclen``: a
    t-statistic says "significant", d/g say "by how many pooled
    standard deviations", which is what a corpus-balance decision
    actually needs. Pooled-variance form; g = d·(1 − 3/(4N−9)).

    Exactness: the same exact integer power sums as the t entry; the
    pooled-SD dag is shared expression-for-expression.

    Scale: identical shape to welch_t_doclen — one hash agg + one
    broadcast baseline row.
    """
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("lang").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n")
    ) / F.nullif(F.col("n") - 1, F.lit(0))
    m = g.select("lang", "n", mean.alias("mean"), var.alias("var"))
    base = m.filter(F.col("lang") == CD_BASELINE_LANG).select(
        F.col("n").alias("n0"),
        F.col("mean").alias("m0"),
        F.col("var").alias("v0"),
    )
    pooled_sd = F.sqrt(
        ((F.col("n") - 1) * F.col("var") + (F.col("n0") - 1) * F.col("v0"))
        / F.nullif(F.col("n") + F.col("n0") - 2, F.lit(0))
    )
    d_stat = (F.col("mean") - F.col("m0")) / F.nullif(pooled_sd, F.lit(0.0))
    corr = 1.0 - 3.0 / (4.0 * (F.col("n") + F.col("n0")) - 9.0)
    return (
        m.filter(F.col("lang") != CD_BASELINE_LANG)
        .crossJoin(F.broadcast(base))
        .select(
            "lang",
            F.col("n").alias("n_docs"),
            F.round(d_stat, 4).alias("cohens_d"),
            F.round(d_stat * corr, 4).alias("hedges_g"),
        )
        .orderBy("lang")
    )


@query(
    "max_drawdown_series",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100) AS BIGINT)
                      WHEN event_type = 'error'
                      THEN -CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS pnl
      FROM events GROUP BY 1
    ),
    c AS (
      SELECT day, CAST(sum(pnl) OVER (ORDER BY day) AS BIGINT) AS cum
      FROM daily
    ),
    p AS (
      SELECT day, cum,
             CAST(max(cum) OVER (ORDER BY day) AS BIGINT) AS peak
      FROM c
    ),
    d AS (SELECT day, peak - cum AS dd FROM p)
    SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
           CAST((SELECT max(dd) FROM d) AS BIGINT) AS max_drawdown_cents,
           strftime((SELECT min(day) FROM d
                     WHERE dd = (SELECT max(dd) FROM d)),
                    '%Y-%m-%d') AS trough_day
    """,
)
def max_drawdown_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative daily PnL series (purchases
    credit, errors debit, integer cents): running peak minus current
    cumulative, maximized — the standard worst-regression-from-peak
    risk statistic, and the sequential-metric sibling of the
    changepoint/control-chart entries (CUSUM alarms on drift; max
    drawdown quantifies the realized worst excursion). Trough day is
    the FIRST day attaining the maximum (deterministic tie).

    Exactness: cents-quantized integer cumsums and running maxima —
    no float anywhere.

    Scale: date hash agg collapses events to one row per day; the two
    prefix windows run on the collapsed daily series (calendar-sized,
    the module's sequential-detector discipline).
    """
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", cents)
            .when(F.col("event_type") == "error", -cents)
            .otherwise(F.lit(0))
        )
        .cast("long")
        .alias("pnl")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    d = daily.select(
        "day", F.sum("pnl").over(w).cast("long").alias("cum")
    ).select(
        "day",
        (F.max("cum").over(w) - F.col("cum")).cast("long").alias("dd"),
    )
    d = scoped_persist(d)
    worst = d.orderBy(F.col("dd").desc(), "day").limit(1).select(
        F.col("dd").alias("max_drawdown_cents"),
        F.date_format("day", "yyyy-MM-dd").alias("trough_day"),
    )
    return d.agg(F.count("*").cast("long").alias("n_days")).crossJoin(
        F.broadcast(worst)
    )


@query(
    "theil_u_uncertainty",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS y, o_orderstatus AS x,
             CAST(count(*) AS BIGINT) AS nxy
      FROM orders GROUP BY 1, 2
    ),
    mx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM cells GROUP BY x),
    my AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM cells GROUP BY y),
    tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM cells),
    mi AS (
      SELECT CAST(sum(CAST(round(1000000 * nxy *
               ln((CAST(nxy AS DOUBLE) * n) / (CAST(nx AS DOUBLE) * ny))
             ) AS BIGINT)) AS BIGINT) AS mi_micro
      FROM cells JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
    ),
    hx AS (
      SELECT CAST(sum(CAST(round(1000000 * nx *
               ln(CAST(n AS DOUBLE) / nx)) AS BIGINT)) AS BIGINT) AS hx_micro
      FROM mx CROSS JOIN tot
    )
    SELECT tot.n AS n_orders,
           round(CAST(mi.mi_micro AS DOUBLE) / 1000000 / tot.n, 6) AS mi_nats,
           round(CAST(hx.hx_micro AS DOUBLE) / 1000000 / tot.n, 6)
             AS h_status_nats,
           round(CAST(mi.mi_micro AS DOUBLE) / nullif(hx.hx_micro, 0), 6)
             AS theil_u
    FROM mi CROSS JOIN hx CROSS JOIN tot
    """,
)
def theil_u_uncertainty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's uncertainty coefficient U(status | priority) =
    I(X;Y)/H(X) (Theil 1970) — the ASYMMETRIC categorical association
    this module's Cramér's V can't express: "how much of the status
    entropy does knowing the priority remove?" (V is symmetric and
    chi-square-based; U is information-based and directional — the
    difference matters when one variable is a cause candidate).

    Exactness: every n·ln(·) term quantizes ONCE to integer
    micro-nats from exact integer counts (the KL idiom); MI and H(X)
    cross the lanes as integer sums and U is a ratio of those two
    integers.

    Scale: one (priority, status) cell agg — a |statuses|×|priorities|
    contingency table; everything downstream is constant-size.
    """
    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("y"), F.col("o_orderstatus").alias("x")
    ).agg(F.count("*").cast("long").alias("nxy"))
    cells = scoped_persist(cells)
    mx = cells.groupBy("x").agg(F.sum("nxy").cast("long").alias("nx"))
    my = cells.groupBy("y").agg(F.sum("nxy").cast("long").alias("ny"))
    tot = cells.agg(F.sum("nxy").cast("long").alias("n"))
    mi = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.round(
                    1_000_000
                    * F.col("nxy")
                    * F.log(
                        (F.col("nxy").cast("double") * F.col("n"))
                        / (F.col("nx").cast("double") * F.col("ny"))
                    )
                ).cast("long")
            )
            .cast("long")
            .alias("mi_micro")
        )
    )
    hx = mx.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.round(
                1_000_000
                * F.col("nx")
                * F.log(F.col("n").cast("double") / F.col("nx"))
            ).cast("long")
        )
        .cast("long")
        .alias("hx_micro")
    )
    return (
        mi.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n").alias("n_orders"),
            F.round(
                F.col("mi_micro").cast("double") / 1_000_000 / F.col("n"), 6
            ).alias("mi_nats"),
            F.round(
                F.col("hx_micro").cast("double") / 1_000_000 / F.col("n"), 6
            ).alias("h_status_nats"),
            F.round(
                F.col("mi_micro").cast("double")
                / F.nullif(F.col("hx_micro"), F.lit(0)),
                6,
            ).alias("theil_u"),
        )
    )


HB_BASELINE_LANG = "en"  # Hellinger/BC against the same baseline
HB_BUCKET = 128  # doclen histogram grid (integer division, both lanes)
HB_BUCKET_CAP = 63


@query(
    "hellinger_doclen_drift",
    oracle=f"""
    WITH h AS (
      SELECT lang, least(n_chars // {HB_BUCKET}, {HB_BUCKET_CAP}) AS b,
             CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    ),
    t AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
    terms AS (
      SELECT o.lang,
             CAST(round(1000000000 * sqrt(
               (CAST(o.c AS DOUBLE) / ot.n) * (CAST(e.c AS DOUBLE) / et.n)
             )) AS BIGINT) AS t_nano
      FROM h o
      JOIN h e ON o.b = e.b AND e.lang = '{HB_BASELINE_LANG}'
      JOIN t ot ON ot.lang = o.lang
      JOIN t et ON et.lang = '{HB_BASELINE_LANG}'
      WHERE o.lang <> '{HB_BASELINE_LANG}'
    )
    SELECT lang,
           round(CAST(sum(t_nano) AS DOUBLE) / 1000000000, 6)
             AS bhattacharyya,
           round(sqrt(greatest(
             1.0 - CAST(sum(t_nano) AS DOUBLE) / 1000000000, 0)), 6)
             AS hellinger
    FROM terms
    GROUP BY lang
    ORDER BY lang
    """,
)
def hellinger_doclen_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bhattacharyya coefficient and Hellinger distance between each
    language's document-length distribution and the 'en' baseline —
    the bounded geometric drift measure completing the divergence
    shelf (KL unbounded/asymmetric, JS smoothed-symmetric, TVD L1,
    Wasserstein transport; Hellinger is the one with metric axioms
    AND a closed form from the histograms). BC = Σ√(p·q) over a fixed
    integer-division length grid; buckets missing on either side
    contribute exactly 0, so the inner histogram join is complete.

    Exactness: grid and counts are integers; each √(p·q) term —
    IEEE-exact sqrt over identically-associated rationals — quantizes
    ONCE to nano units and the per-language reduce is an INTEGER sum;
    H = √(max(1−BC, 0)) guards the rounding overshoot identically.

    Scale: one histogram agg to |langs|·64 rows; the pair join is
    grid-keyed and constant-size.
    """
    d = load_table(spark, sf_dir, "documents")
    h = d.groupBy(
        "lang",
        F.least(
            F.expr(f"n_chars div {HB_BUCKET}"), F.lit(HB_BUCKET_CAP)
        ).alias("b"),
    ).agg(F.count("*").cast("long").alias("c"))
    h = scoped_persist(h)
    t = h.groupBy("lang").agg(F.sum("c").cast("long").alias("n"))
    e = (
        h.filter(F.col("lang") == HB_BASELINE_LANG)
        .select("b", F.col("c").alias("ce"))
        .crossJoin(
            F.broadcast(
                t.filter(F.col("lang") == HB_BASELINE_LANG).select(
                    F.col("n").alias("ne")
                )
            )
        )
    )
    terms = (
        h.filter(F.col("lang") != HB_BASELINE_LANG)
        .join(F.broadcast(e), "b")
        .join(F.broadcast(t), "lang")
        .select(
            "lang",
            F.round(
                1_000_000_000
                * F.sqrt(
                    (F.col("c").cast("double") / F.col("n"))
                    * (F.col("ce").cast("double") / F.col("ne"))
                )
            )
            .cast("long")
            .alias("t_nano"),
        )
    )
    bc = F.sum("t_nano").cast("double") / 1_000_000_000
    return (
        terms.groupBy("lang")
        .agg(
            F.round(bc, 6).alias("bhattacharyya"),
            F.round(
                F.sqrt(F.greatest(1.0 - bc, F.lit(0.0))), 6
            ).alias("hellinger"),
        )
        .orderBy("lang")
    )


@query(
    "anderson_darling_drift",
    oracle=f"""
    WITH a AS (
      SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS ca
      FROM documents WHERE source = '{KS_A}' GROUP BY 1
    ),
    b AS (
      SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS cb
      FROM documents WHERE source = '{KS_B}' GROUP BY 1
    ),
    merged AS (
      SELECT coalesce(a.v, b.v) AS v,
             coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
      FROM a FULL OUTER JOIN b ON a.v = b.v
    ),
    cum AS (
      SELECT ca, cb,
             CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cum_a,
             CAST(sum(ca + cb) OVER (ORDER BY v) AS BIGINT) AS cum_t,
             CAST(sum(ca) OVER () AS BIGINT) AS n_a,
             CAST(sum(cb) OVER () AS BIGINT) AS n_b
      FROM merged
    ),
    terms AS (
      SELECT n_a, n_b,
             CAST(round(1000000.0
               * ((ca + cb) * ((n_a + n_b) * cum_a - n_a * cum_t)
                            * ((n_a + n_b) * cum_a - n_a * cum_t))
               / (cum_t * ((n_a + n_b) - cum_t))) AS BIGINT) AS t_micro
      FROM cum
      WHERE cum_t < n_a + n_b
    )
    SELECT CAST(min(n_a) AS BIGINT) AS n_a,
           CAST(min(n_b) AS BIGINT) AS n_b,
           CAST(sum(t_micro) AS BIGINT) AS ad_micro_sum,
           round(CAST(sum(t_micro) AS DOUBLE) / 1000000
                 / (CAST(min(n_a) AS DOUBLE) * min(n_b)), 6) AS ad_stat
    FROM terms
    """,
)
def anderson_darling_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling drift statistic in the discrete/
    tied form (Pettitt 1976; the A²_akN shape of Scholz-Stephens
    1987 for k=2 without continuity correction): A² = (1/(n·m)) ·
    Σ_j h_j·(N·M_j − n·H_j)² / (H_j·(N−H_j)) over the pooled distinct
    values (the H_j = N endpoint drops — its weight is 0/0 and
    contributes nothing in the continuous limit). COMPLETES the
    two-sample drift family: KS reacts to the largest local CDF gap,
    CvM to the accumulated squared gap with uniform weight, AD
    re-weights by 1/(H(N−H)) — maximal at the TAILS, so it catches
    the tail drift both siblings under-weight (the reason
    goodness-of-fit practice prefers AD).

    Exactness: every term's numerator h·(N·M − n·H)² and denominator
    H·(N−H) are exact BIGINTs from the shared cumulative-histogram
    scaffold (literally the CvM entry's frame with pooled cumulative
    H replacing cum_b); the single float division per term quantizes
    ONCE to integer micro-units and the reduce is an integer sum.
    The same loud symmetric overflow guard as CvM: per-term numerator
    ≤ N·(n·m)², asserted in-plan where DuckDB's checked BIGINT would
    raise.

    Scale: per-source value histograms via hash aggregate, one window
    over the merged value DOMAIN (collapsed support, not rows), one
    row out.
    """
    d = load_table(spark, sf_dir, "documents")
    a = (
        d.filter(F.col("source") == KS_A)
        .groupBy(F.col("n_chars").alias("v"))
        .agg(F.count("*").cast("long").alias("ca"))
    )
    b = (
        d.filter(F.col("source") == KS_B)
        .groupBy(F.col("n_chars").alias("v"))
        .agg(F.count("*").cast("long").alias("cb"))
    )
    merged = a.join(b, "v", "full_outer").select(
        "v",
        F.coalesce("ca", F.lit(0)).cast("long").alias("ca"),
        F.coalesce("cb", F.lit(0)).cast("long").alias("cb"),
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = merged.select(
        "ca",
        "cb",
        F.sum("ca").over(w_cum).cast("long").alias("cum_a"),
        F.sum(F.col("ca") + F.col("cb")).over(w_cum).cast("long").alias("cum_t"),
        F.sum("ca").over(w_all).cast("long").alias("n_a"),
        F.sum("cb").over(w_all).cast("long").alias("n_b"),
    )
    nn = F.col("n_a") + F.col("n_b")
    diff = nn * F.col("cum_a") - F.col("n_a") * F.col("cum_t")
    t_micro = F.round(
        1_000_000.0
        * ((F.col("ca") + F.col("cb")) * diff * diff)
        / (F.col("cum_t") * (nn - F.col("cum_t")))
    ).cast("long")
    terms = cum.filter(F.col("cum_t") < nn).select(
        "n_a", "n_b", t_micro.alias("t_micro")
    )
    na_d = F.min("n_a").cast("double")
    nb_d = F.min("n_b").cast("double")
    guard = F.assert_true(
        (na_d + nb_d) * na_d * na_d * nb_d * nb_d < F.lit(9.0e18),
        F.lit(
            "anderson_darling_drift: per-term integer numerator would "
            "overflow BIGINT at these group sizes; shard the audit"
        ),
    )
    # One-armed CASE (see cramer_von_mises_drift): assert_true yields
    # NULL when it does not throw, so the sum always passes through
    # while Catalyst cannot fold the predicate away.
    s_raw = F.sum("t_micro")
    s = F.when(guard.isNull(), s_raw)
    return terms.agg(
        F.min("n_a").cast("long").alias("n_a"),
        F.min("n_b").cast("long").alias("n_b"),
        s.cast("long").alias("ad_micro_sum"),
        F.round(
            s.cast("double") / 1_000_000 / (F.min("n_a").cast("double") * F.min("n_b")),
            6,
        ).alias("ad_stat"),
    )
