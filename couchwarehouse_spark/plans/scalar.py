"""Scalar function family entries (SURVEY.md §2.C) — string, date,
JSON, math, array, conditional, and the UDF surface, each with a
DuckDB oracle.

The reference's scalar surface is (a) its JS transform hook
(reference index.js:46-49; README.md:178-196 example uses delete/
trim/join) and (b) the full scalar library of the target warehouse DB
(reference README.md:14,68). Here: built-in ``pyspark.sql.functions``
everywhere — whole-stage-codegen'd, pushdown-transparent; Python
appears only in the two explicitly-UDF entries and is Arrow-batched.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from couchwarehouse_spark.catalog import load_table
from couchwarehouse_spark.functions.scalars import acctbal_bucket, sanitize_col
from couchwarehouse_spark.plans.registry import query


@query(
    "string_functions",
    oracle="""
    SELECT c_custkey,
           upper(trim(c_name))                                   AS name_upper,
           length(c_name)                                        AS name_len,
           substring(c_name, 1, 8)                               AS name_prefix,
           concat_ws('/', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           regexp_replace(c_name, '[0-9]', '#', 'g')             AS name_masked,
           replace(concat('seg-', c_mktsegment), '-', '')        AS sanitized
    FROM customer
    WHERE c_name LIKE 'Customer%'
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family (§2.C): trim/upper/length/substring/concat_ws/
    regexp_replace/LIKE — the reference transform example's exact
    vocabulary (reference README.md:182-186) plus the identifier
    sanitiser (R16) as a column expression.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_name").like("Customer%")).select(
        "c_custkey",
        F.upper(F.trim("c_name")).alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("/", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
        F.regexp_replace("c_name", "[0-9]", "#").alias("name_masked"),
        sanitize_col(F.concat(F.lit("seg-"), F.col("c_mktsegment"))).alias("sanitized"),
    )


@query(
    "date_functions",
    oracle="""
    SELECT year(o_orderdate)                                    AS o_year,
           month(o_orderdate)                                   AS o_month,
           strftime(o_orderdate, '%Y-%m')                       AS year_month,
           count(*)                                             AS n_orders,
           CAST(sum(CASE WHEN dayofweek(o_orderdate) IN (0, 6) THEN 1 ELSE 0 END) AS BIGINT) AS weekend_orders,
           max(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-08-02')) AS max_age_days,
           min(strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d')) AS min_due_date
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (§2.C): year/month/date_format/dayofweek/
    datediff/date_add. Docs carry ISO date strings in the reference
    (e.g. ``saleDate`` in reference test/samplechanges2.txt) — the
    warehouse exposes real date arithmetic on top.

    Note: Spark dayofweek is 1=Sunday..7=Saturday, DuckDB dayofweek
    is 0=Sunday..6=Saturday — both lanes express "weekend" in their
    own dialect. Derived dates are emitted as formatted strings so
    both engines hash identically.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
            F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.when(F.dayofweek("o_orderdate").isin(1, 7), 1).otherwise(0)
            ).alias("weekend_orders"),
            F.max(F.datediff(F.lit("1998-08-02").cast("date"), F.col("o_orderdate"))).alias(
                "max_age_days"
            ),
            F.min(
                F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd")
            ).alias("min_due_date"),
        )
    )


@query(
    "json_functions",
    oracle="""
    SELECT event_type,
           count(*)                                                   AS n,
           round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS INTEGER))    AS max_k,
           min(CAST(to_json(struct_pack(t := event_type)) AS VARCHAR)) AS tagged
    FROM events
    GROUP BY event_type
    """,
)
def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family (§2.C): get_json_object extraction + to_json
    construction — the reference stores arrays as JSON text
    (lib/flatten.js:45) and our schemaless lane parses doc JSON, so
    both directions matter.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg(k.cast("double")), 4).alias("avg_k"),
        F.max(k.cast("int")).alias("max_k"),
        F.min(F.to_json(F.struct(F.col("event_type").alias("t")))).alias("tagged"),
    )


@query(
    "math_functions",
    oracle="""
    SELECT l_returnflag,
           round(sum(sqrt(l_quantity)), 2)              AS sum_sqrt_qty,
           round(sum(pow(l_discount, 2)), 4)            AS sum_disc_sq,
           round(CAST(sum(CAST(round(1000000 * ln(l_extendedprice)) AS BIGINT))
                 AS DOUBLE) / 1000000, 2)               AS sum_ln_price,
           round(sum(abs(l_quantity - 25.0)), 2)        AS sum_abs_dev,
           CAST(sum(CAST(floor(l_tax * 100) AS BIGINT)) AS BIGINT)     AS sum_floor_tax,
           CAST(sum(CAST(ceil(l_discount * 100) AS BIGINT)) AS BIGINT) AS sum_ceil_disc,
           round(max(l_quantity % 7), 2)                AS max_mod
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (§2.C): sqrt/pow/ln/abs/floor/ceil/mod — all JVM
    expressions; note Spark ``log`` and DuckDB ``ln`` are both natural
    log (DuckDB ``log`` is base-10 — dialect trap documented here).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.sqrt("l_quantity")), 2).alias("sum_sqrt_qty"),
        F.round(F.sum(F.pow("l_discount", F.lit(2))), 4).alias("sum_disc_sq"),
        # ln terms quantize to integer micro-nats before the sum (the
        # ngram_entropy_rate idiom): transcendental-valued floats never
        # enter a float reduce, so the 2-dp result is order-proof.
        F.round(
            F.sum(
                F.round(1_000_000 * F.log(F.col("l_extendedprice"))).cast("long")
            ).cast("double")
            / 1_000_000,
            2,
        ).alias("sum_ln_price"),
        F.round(F.sum(F.abs(F.col("l_quantity") - 25.0)), 2).alias("sum_abs_dev"),
        F.sum(F.floor(F.col("l_tax") * 100).cast("long")).alias("sum_floor_tax"),
        F.sum(F.ceil(F.col("l_discount") * 100).cast("long")).alias("sum_ceil_disc"),
        F.round(F.max(F.col("l_quantity") % 7), 2).alias("max_mod"),
    )


@query(
    "array_functions",
    oracle="""
    SELECT lang,
           count(*)                                         AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN list_contains(string_split(text, ' '), 'data')
                    THEN 1 ELSE 0 END) AS BIGINT)           AS docs_with_data,
           min(string_split(text, ' ')[1])                  AS min_first_token
    FROM documents
    GROUP BY lang
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family (§2.C): split/size/array_contains/element_at over
    real text — the typed lane the reference flattens away
    (lib/flatten.js:45) kept as first-class arrays here.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(toks)).alias("total_tokens"),
        F.sum(F.when(F.array_contains(toks, "data"), 1).otherwise(0)).alias(
            "docs_with_data"
        ),
        F.min(F.element_at(toks, 1)).alias("min_first_token"),
    )


@query(
    "conditional_functions",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END                                  AS bucket,
           count(*)                                              AS n_customers,
           round(sum(coalesce(nullif(c_acctbal, 0.0), -1.0)), 2) AS adjusted_sum,
           CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_segments
    FROM customer
    GROUP BY 1
    """,
)
def conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null family (§2.C): when/otherwise, coalesce,
    nullif, IS NULL — the null-conform semantics (R13) as expressions.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy(acctbal_bucket("c_acctbal").alias("bucket")).agg(
        F.count("*").alias("n_customers"),
        F.round(
            F.sum(F.coalesce(F.nullif(F.col("c_acctbal"), F.lit(0.0)), F.lit(-1.0))), 2
        ).alias("adjusted_sum"),
        F.sum(F.when(F.col("c_mktsegment").isNull(), 1).otherwise(0)).alias(
            "null_segments"
        ),
    )


@query(
    "scalar_kitchen_sink",
    oracle="""
    SELECT year(o_orderdate)                                   AS o_year,
           count(*)                                            AS n_orders,
           CAST(sum(CASE WHEN dayofweek(o_orderdate) IN (0, 6) THEN 1 ELSE 0 END) AS BIGINT) AS weekend_orders,
           round(sum(sqrt(o_totalprice)), 2)                   AS sum_sqrt_price,
           round(CAST(sum(CAST(round(1000000 * ln(o_totalprice)) AS BIGINT))
                 AS DOUBLE) / 1000000, 2)                      AS sum_ln_price,
           max(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-08-02')) AS max_age_days,
           CAST(sum(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_orders,
           round(sum(coalesce(nullif(floor(o_totalprice % 7), 0.0), -1.0)), 2) AS adjusted_mod_sum,
           min(strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d')) AS min_due_date
    FROM orders
    GROUP BY 1
    """,
)
def scalar_kitchen_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combined date + math + conditional families (§2.C C-date,
    C-math, C-cond) in ONE oracle-checked projection, so all three
    function families carry a driver CORRECTNESS row inside its
    50-entry window; the per-family entries (``date_functions``,
    ``math_functions``, ``conditional_functions``) remain registered
    for depth. Same reference surface: the target warehouse's scalar
    library (reference README.md:14,68).
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.count("*").alias("n_orders"),
        F.sum(
            F.when(F.dayofweek("o_orderdate").isin(1, 7), 1).otherwise(0)
        ).alias("weekend_orders"),
        F.round(F.sum(F.sqrt("o_totalprice")), 2).alias("sum_sqrt_price"),
        F.round(
            F.sum(
                F.round(1_000_000 * F.log(F.col("o_totalprice"))).cast("long")
            ).cast("double")
            / 1_000_000,
            2,
        ).alias("sum_ln_price"),
        F.max(
            F.datediff(F.lit("1998-08-02").cast("date"), F.col("o_orderdate"))
        ).alias("max_age_days"),
        F.sum(
            F.when(F.col("o_orderpriority").like("1%"), 1).otherwise(0)
        ).alias("urgent_orders"),
        F.round(
            F.sum(
                F.coalesce(
                    F.nullif(
                        F.floor(F.col("o_totalprice") % 7).cast("double"), F.lit(0.0)
                    ),
                    F.lit(-1.0),
                )
            ),
            2,
        ).alias("adjusted_mod_sum"),
        F.min(
            F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd")
        ).alias("min_due_date"),
    )


@F.pandas_udf(T.DoubleType())
def _disc_price_udf(price: pd.Series, discount: pd.Series) -> pd.Series:
    # Arrow-vectorized: whole columns per batch, no per-row Python.
    return price * (1.0 - discount)


@query(
    "pandas_udf_disc_price",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pandas_udf_disc_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF surface (§2.C C-udf): scalar ``pandas_udf`` computing the
    discounted price, verified against plain-SQL arithmetic — the
    reference's transform hook is exactly this per-value escape hatch
    (reference index.js:46-49).

    Scale note: the built-in expression (see ``pricing_summary``) is
    the fast path; this entry exists to certify the Arrow UDF plumbing
    (~10-100× faster than row-at-a-time Python UDFs).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.withColumn("disc_price", _disc_price_udf("l_extendedprice", "l_discount"))
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("disc_price"), 2).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@query(
    "grouped_demean_applyinpandas",
    oracle="""
    SELECT l_returnflag,
           round(var_pop(l_extendedprice), 2) AS price_variance,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def grouped_demean_applyinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF surface (§2.C C-udf): ``groupBy().applyInPandas`` grouped-map
    — demean each group's prices in pandas, then aggregate the squared
    residuals, which must equal SQL ``var_pop``. Certifies the grouped
    Arrow path (the custom-stateful-operator seam, D5's batch analog).

    Scale: one shuffle on the grouping key; each group must fit in one
    executor's memory as a pandas frame — fine for bounded keys like
    returnflag; for high-cardinality keys use window functions instead.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["resid"] = pdf["l_extendedprice"] - pdf["l_extendedprice"].mean()
        return pdf[["l_returnflag", "resid"]]

    residuals = li.groupBy("l_returnflag").applyInPandas(
        demean, "l_returnflag string, resid double"
    )
    return residuals.groupBy("l_returnflag").agg(
        F.round(F.sum(F.col("resid") * F.col("resid")) / F.count("*"), 2).alias(
            "price_variance"
        ),
        F.count("*").alias("n"),
    )


@query(
    "map_functions",
    oracle="""
    WITH t AS (
      SELECT lang,
             list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 3) AS ks
      FROM documents
    )
    SELECT lang,
           CAST(sum(len(ks)) AS BIGINT)                    AS total_keys,
           CAST(sum(list_sum(list_transform(ks, k -> len(k)))) AS BIGINT)
                                                           AS total_key_len,
           CAST(sum(CASE WHEN list_contains(ks, 'the') THEN 1 ELSE 0 END) AS BIGINT)
                                                           AS docs_keyed_the,
           CAST(sum(len(list_filter(ks, k -> len(k) > 4))) AS BIGINT)
                                                           AS long_keys
    FROM t
    GROUP BY lang
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family (§2.C array/map lane): build a per-document map
    (first three distinct tokens in sorted order → their lengths) with
    ``map_from_arrays``, then drive ``map_keys`` / ``map_values`` /
    ``element_at`` / ``map_filter`` — the typed key-value lane the
    reference's flatten collapses to JSON text (lib/flatten.js:45).

    Outputs are scalars (map column types don't hash portably across
    engines), so the oracle states the same numbers via list ops —
    the semantics, not the representation, are what's checked. All
    map expressions are JVM built-ins inside codegen.
    """
    d = load_table(spark, sf_dir, "documents")
    ks = F.slice(F.array_sort(F.array_distinct(F.split("text", " "))), 1, 3)
    m = F.map_from_arrays(ks, F.transform(ks, lambda k: F.length(k)))
    t = d.select("lang", m.alias("m"))
    vals = F.map_values(F.col("m"))
    return t.groupBy("lang").agg(
        F.sum(F.size(F.map_keys(F.col("m")))).alias("total_keys"),
        F.sum(F.aggregate(vals, F.lit(0), lambda a, v: a + v)).cast("long").alias(
            "total_key_len"
        ),
        F.sum(
            F.when(F.element_at(F.col("m"), "the").isNotNull(), 1).otherwise(0)
        ).alias("docs_keyed_the"),
        F.sum(
            F.size(F.map_filter(F.col("m"), lambda k, v: v > 4))
        ).alias("long_keys"),
    )


@F.pandas_udf(T.DoubleType())
def _weighted_median_udaf(value: pd.Series, weight: pd.Series) -> float:
    # Series → scalar = GROUPED_AGG: the whole (pre-reduced) group
    # arrives as one Arrow batch. Exact order statistics over
    # (value, count) pairs — identical to the median of the expanded
    # multiset: for even totals, the mean of the two central values.
    df = pd.DataFrame({"v": value, "w": weight}).sort_values("v")
    cum = df["w"].cumsum()
    total = int(cum.iloc[-1])
    lo_pos = (total + 1) // 2  # 1-based central position(s)
    hi_pos = total // 2 + 1
    lo = df["v"][cum >= lo_pos].iloc[0]
    hi = df["v"][cum >= hi_pos].iloc[0]
    return (float(lo) + float(hi)) / 2.0


@F.pandas_udf(T.LongType())
def _weight_sum_udaf(weight: pd.Series) -> int:
    # Spark disallows mixing grouped-agg pandas UDFs with built-in
    # aggregates in one agg(), so the row count rides the same lane.
    return int(weight.sum())


@query(
    "grouped_agg_median_qty",
    oracle="""
    SELECT l_returnflag,
           median(CAST(l_quantity AS BIGINT)) AS median_qty,
           CAST(count(*) AS BIGINT)           AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def grouped_agg_median_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF surface (§2.C C-udf completion): GROUPED_AGG ``pandas_udf``
    computing an exact median — but over a PRE-REDUCED input, which is
    the pattern that makes custom reductions viable at 100 TB.

    A grouped-agg UDF cannot partial-aggregate, so feeding it raw rows
    ships every row of a group through one Arrow batch to one task.
    Instead the JVM hash-aggregate first collapses lineitem to
    (returnflag, quantity) → count — partial aggregation, tiny
    exchange — and the UDAF computes the exact weighted median from
    ≤|distinct quantities| pairs per group. Same answer as DuckDB's
    row-level median (interpolated central order statistics),
    bit-for-bit, at a fraction of the transfer.
    """
    li = load_table(spark, sf_dir, "lineitem")
    reduced = (
        li.select("l_returnflag", F.col("l_quantity").cast("long").alias("qty"))
        .groupBy("l_returnflag", "qty")
        .agg(F.count("*").alias("w"))
    )
    return reduced.groupBy("l_returnflag").agg(
        _weighted_median_udaf(F.col("qty"), F.col("w")).alias("median_qty"),
        _weight_sum_udaf(F.col("w")).alias("n"),
    )


@query(
    "variant_json_functions",
    oracle="""
    SELECT event_type,
           count(*)                                                    AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           max(CAST(json_extract_string(props, '$.k') AS INTEGER))     AS max_k,
           CAST(sum(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT)                 AS n_missing
    FROM events
    GROUP BY event_type
    """,
)
def variant_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schemaless lane on Spark 4's VARIANT type (§2.C JSON family,
    modern form): ``parse_json`` once into a binary variant column,
    then typed ``variant_get`` path extraction — the engine-native
    answer to the reference's JSON-text storage (lib/flatten.js:45):
    no re-parse per extraction, open schema preserved.

    Scale: parse is a projection; variant extraction is JVM-side and
    columnar — at 100 TB this replaces repeated ``get_json_object``
    string scans (one parse, many typed reads). ``try_variant_get``
    probes an absent path without erroring.
    """
    ev = load_table(spark, sf_dir, "events")
    vr = ev.select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.variant_get("v", "$.k", "int")
    missing = F.try_variant_get("v", "$.missing", "string")
    return vr.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.sum(F.when(missing.isNull(), 1).otherwise(0)).alias("n_missing"),
    )


MIN_RUN_LEN = 2
_UDTF_CALL_SEQ = 0  # monotonic suffix for per-call view/UDTF names


@query(
    "udtf_token_runs",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    w AS (
      SELECT doc_id, unnest(toks) AS tok,
             generate_subscripts(toks, 1) - 1 AS pos
      FROM t
    ),
    flagged AS (
      SELECT doc_id, tok, pos,
             CASE WHEN lag(tok) OVER w IS DISTINCT FROM tok THEN 1 ELSE 0 END
               AS is_head
      FROM w
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    runs AS (
      SELECT doc_id, tok, pos,
             sum(is_head) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged
    )
    SELECT doc_id, any_value(tok) AS token,
           CAST(min(pos) AS BIGINT)  AS start_pos,
           CAST(count(*) AS BIGINT)  AS run_len
    FROM runs
    GROUP BY doc_id, run_id
    HAVING count(*) >= {MIN_RUN_LEN}
    """,
)
def udtf_token_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (§2.C C-udf — the table-function corner of the UDF
    surface, completing pandas_udf / applyInPandas / UDAF): run-length
    encode each document's token stream, emitting one row per maximal
    run of a repeated token (the stutter artifacts a cleaning pass
    strips). A UDTF maps ONE input row to MANY output rows with
    imperative per-row logic — the case built-in arrays handle
    awkwardly and lateral-join engines express as table functions.

    Scale: the UDTF is a per-row flatMap — embarrassingly parallel,
    no shuffle, no state across rows; Arrow moves the batches. The
    oracle states the same runs via gaps-and-islands SQL (two windows
    + aggregate), which is ALSO how you'd write it shuffle-free if the
    tokens arrived pre-exploded. Python-in-the-loop is the cost of the
    imperative form — the declared UDF-surface demo trade (see module
    docstring); everything else in this module stays JVM-side.
    """
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="doc_id: bigint, token: string, start_pos: bigint, run_len: bigint",
        useArrow=True,  # Arrow-batched UDTF: no row-at-a-time pickling
    )
    class TokenRuns:
        def eval(self, doc_id, text: str):
            toks = text.split(" ")
            start = 0
            for i in range(1, len(toks) + 1):
                if i == len(toks) or toks[i] != toks[start]:
                    if i - start >= MIN_RUN_LEN:
                        yield doc_id, toks[start], start, i - start
                    start = i

    d = load_table(spark, sf_dir, "documents")
    # Per-call unique view/UDTF names: the registrations are
    # session-global, so a fixed name would let concurrent or
    # interleaved invocations in one SparkSession clobber each
    # other's input view (r5 review finding).
    global _UDTF_CALL_SEQ
    _UDTF_CALL_SEQ += 1
    view = f"_udtf_docs_in_{_UDTF_CALL_SEQ}"
    fn = f"token_runs_{_UDTF_CALL_SEQ}"
    d.select("doc_id", "text").createOrReplaceTempView(view)
    spark.udtf.register(fn, TokenRuns)
    return spark.sql(
        f"SELECT r.doc_id, r.token, r.start_pos, r.run_len "
        f"FROM {view} d, LATERAL {fn}(d.doc_id, d.text) r"
    )


@query(
    "sql_udf_functions",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS net_revenue,
           CAST(sum(CASE WHEN l_quantity >= 40 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bulk
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def sql_udf_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar functions (Spark 4's ``CREATE FUNCTION ...
    RETURN <expr>`` — SQL UDFs, the C-udf family's declarative end):
    ``net_price`` and an ``is_bulk`` tier gate are DEFINED IN SQL and
    used in an aggregate over lineitem. Unlike Python UDFs these
    inline into Catalyst at resolution time — full codegen, pushdown,
    and null semantics for free, which is exactly why they are the
    first choice for shared business logic at 100 TB (the reference's
    users would put these in the target engine; DuckDB's equivalent
    is CREATE MACRO — the oracle states the same logic inline, since
    the CONTRACT is the result, not the definition syntax).

    Scale: after inlining, the plan is identical to writing the
    expressions by hand — one partial-aggregated scan; the function
    registry adds zero runtime cost.
    """
    from couchwarehouse_spark.catalog import register_views

    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION is_bulk(q DOUBLE) "
        "RETURNS INT RETURN CASE WHEN q >= 40 THEN 1 ELSE 0 END"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n_items,
               round(sum(net_price(l_extendedprice, l_discount)), 2)
                 AS net_revenue,
               CAST(sum(is_bulk(l_quantity)) AS BIGINT) AS n_bulk
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "try_functions",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(o_orderpriority AS INTEGER)            AS prio_num,
           CAST(floor(o_totalprice) AS BIGINT)
             // nullif(o_custkey % 5, 0)                   AS safe_div,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
             + o_custkey                                   AS safe_add,
           coalesce(TRY_CAST('x' || o_orderstatus AS DOUBLE), -1.0)
                                                           AS bad_cast_default
    FROM orders
    WHERE o_orderkey <= 40
    ORDER BY o_orderkey
    """,
)
def try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe scalar surface (C-cond extension): Spark 4
    runs under ANSI SQL semantics where bad casts and division by
    zero THROW — ``try_cast``/``try_divide``/``try_add`` are the
    sanctioned NULL-on-error escapes every production pipeline needs
    at the ingest edge (the reference inherits JS coercion, which
    never throws; this is the Spark-native equivalent surface).
    ``o_orderpriority`` ('1-URGENT'…) try_casts to NULL as a whole
    but its first character parses — both paths exercised, plus a
    guarded integer division and a coalesce default.

    Scale: pure projection — whole-stage codegen, no shuffle, no UDF.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 40)
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").try_cast("int").alias("prio_num"),
        F.floor(
            F.try_divide(
                F.floor("o_totalprice").cast("bigint"),
                F.nullif(F.col("o_custkey") % 5, F.lit(0)),
            )
        ).cast("long").alias("safe_div"),
        F.try_add(
            F.substring("o_orderpriority", 1, 1).try_cast("bigint"),
            F.col("o_custkey"),
        ).alias("safe_add"),
        F.coalesce(
            F.concat(F.lit("x"), F.col("o_orderstatus")).try_cast("double"),
            F.lit(-1.0),
        ).alias("bad_cast_default"),
    ).orderBy("o_orderkey")
