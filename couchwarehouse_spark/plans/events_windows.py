"""D4 — event-time windows over the ``events`` table: tumbling,
sliding, session (SURVEY.md §2.D).

The reference has no event-time ops (its only time axis is the
changes-feed seq); these are the Spark-native windowed aggregations a
warehouse needs for the ``events`` stream table. Batch mode here
(same ``window()``/``session_window()`` expressions power the
streaming lane in streaming.ingest — identical semantics, plus
watermarks there).

Scale: window assignment is a projection (no shuffle); the aggregate
shuffles on (window, keys) — partial aggregation collapses rows
map-side. Session windows shuffle on user_id and sort within the
partition — state is one user's events, never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from couchwarehouse_spark.catalog import load_table
from couchwarehouse_spark.plans.registry import query, scoped_persist

TS_FMT = "yyyy-MM-dd HH:mm:ss"
DUCK_FMT = "%Y-%m-%d %H:%M:%S"


@query(
    "tumbling_window_counts",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{DUCK_FMT}') AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows × event_type (D4).

    ``window(ts, '1 hour')`` assigns each row to exactly one bucket —
    a pure projection; the aggregate is an ordinary hash agg on
    (window, type). Window start is emitted as a formatted string so
    both engines hash identically.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "sliding_window_counts",
    oracle=f"""
    WITH assigned AS (
      SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
               AS window_start,
             value
      FROM events
    )
    SELECT strftime(window_start, '{DUCK_FMT}') AS window_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM assigned
    GROUP BY 1
    """,
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows, 1-hour length / 30-minute slide (D4).

    Each event lands in length/slide = 2 overlapping windows —
    Spark's ``window(ts, '1 hour', '30 minutes')`` expands exactly
    like the oracle's 2-way unnest of 30-minute-grid starts. Row
    amplification is the length/slide ratio: keep it small at scale
    or aggregate per-slide first and roll up.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", TS_FMT).alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "session_window_stats",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL '10 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered
    )
    SELECT user_id,
           strftime(min(ts), '{DUCK_FMT}') AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS session_value
    FROM sessions
    GROUP BY user_id, session_no
    """,
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 10-minute inactivity gap, per user (D4).

    Spark's native ``session_window(ts, '10 minutes')`` — windows
    merge while events arrive within the gap. The oracle derives the
    identical sessions with the classic gaps-and-islands lag/cumsum
    SQL, so this checks Spark's session semantics against first
    principles. Scale: shuffle on user_id only; session state is
    per-user and bounded by the gap (watermark evicts it in the
    streaming lane).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
            F.min("ts").alias("first_ts"),
        )
        .select(
            "user_id",
            F.date_format("first_ts", TS_FMT).alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@query(
    "event_conversion_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS vt FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS ct
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click'
        AND e.ts >= v.vt AND e.ts <= v.vt + INTERVAL 24 HOUR
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS pt
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts >= c.ct AND e.ts <= c.ct + INTERVAL 24 HOUR
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_viewed,
           (SELECT count(*) FROM c) AS n_clicked_after_view,
           (SELECT count(*) FROM p) AS n_purchased_after_click
    """,
)
def event_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the event stream: users who
    viewed, then clicked within 24 h of their first view, then
    purchased within 24 h of that first qualifying click — the
    product-analytics staple that exercises ordered event-time
    semantics beyond plain windows (D4 companion).

    Scale: three hash aggregates keyed on user_id with equi-joins
    between stages; each stage's survivor set only shrinks, so the
    later joins broadcast. No window over the full stream, no
    per-user sort — min-timestamps via partial-aggregated ``min``.
    """
    ev = load_table(spark, sf_dir, "events")
    # v and c each feed TWO consumers (their own stage count and the
    # next stage's join) — persist so the events scan and stage aggs
    # run once, not once per consumer in the final crossJoin tree.
    v = scoped_persist(
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    day = F.expr("INTERVAL 24 HOURS")
    c = scoped_persist(
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") >= F.col("vt")) & (F.col("ts") <= F.col("vt") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") >= F.col("ct")) & (F.col("ts") <= F.col("ct") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_after_click")))
    )


@query(
    "cohort_retention",
    oracle="""
    WITH e AS (
      SELECT user_id, date_trunc('week', ts) AS wk FROM events
    ),
    f AS (SELECT user_id, min(wk) AS cw FROM e GROUP BY user_id),
    a AS (SELECT DISTINCT user_id, wk FROM e)
    SELECT strftime(f.cw, '%Y-%m-%d')                        AS cohort_week,
           CAST(date_diff('day', f.cw, a.wk) / 7 AS INTEGER) AS week_offset,
           count(*)                                          AS n_active
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix (D4/event analytics): users
    grouped by first-activity week, counted active at each week
    offset — the classic retention triangle product analytics runs on
    an events stream.

    Scale: two hash aggregates (per-user first week; distinct (user,
    week) activity), then an UNHINTED join on user_id — the cohort
    table is one row per user, far smaller than the event stream, so
    AQE broadcasts it while it fits and falls back to a user_id-keyed
    shuffle join beyond that; the final reduce is on the tiny
    (cohort, offset) grid. ``count(*)`` suffices for distinct users
    because the activity table is already (user, week)-unique and a
    user has exactly one cohort. Week arithmetic is day-exact (both
    engines truncate weeks to Monday; offsets are exact multiples of
    7 days).
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("user_id", F.date_trunc("week", "ts").alias("wk"))
    f = e.groupBy("user_id").agg(F.min("wk").alias("cw"))
    a = e.distinct()
    return (
        a.join(f, "user_id")
        .groupBy(
            # Emitted as a string: Spark DATE → pandas object vs
            # DuckDB DATE → datetime64 breaks the dtype compare
            # (date_format / strftime — one token differs per lane).
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("wk", "cw") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count("*").alias("n_active"))
    )


ANOMALY_TRAIL = 24  # trailing window (hours) for the rate baseline
ANOMALY_TOP = 10


@query(
    "event_rate_anomaly",
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, count(*) AS n
      FROM events GROUP BY 1
    ),
    scored AS (
      SELECT h, n,
             avg(n)         OVER w AS mu,
             stddev_samp(n) OVER w AS sd,
             count(*)       OVER w AS n_base
      FROM hourly
      WINDOW w AS (ORDER BY h ROWS BETWEEN {ANOMALY_TRAIL} PRECEDING
                                       AND 1 PRECEDING)
    )
    SELECT strftime(h, '%Y-%m-%d %H') AS hour,
           n                          AS n_events,
           round((n - mu) / sd, 4)    AS z_score
    FROM scored
    WHERE n_base = {ANOMALY_TRAIL} AND sd > 0
    ORDER BY abs((n - mu) / sd) DESC, h
    LIMIT {ANOMALY_TOP}
    """,
)
def event_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate anomaly scan (D4/observability): hourly event counts
    z-scored against the trailing {24}-hour baseline; top-{10} most
    anomalous hours. The alerting query an ingest pipeline runs over
    its own event stream (rate spike = upstream replay; dip = stalled
    feed).

    Scale: the corpus reduces to the HOURLY GRID first (one hash
    aggregate, partial map-side) — the trailing window then runs over
    rows-per-hour, thousands of rows per YEAR, so the single-ordered-
    window concern never applies; warm-up hours (incomplete baseline)
    and zero-variance baselines are excluded in both lanes rather
    than scored against undefined denominators.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select(F.date_trunc("hour", "ts").alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy("h").rowsBetween(-ANOMALY_TRAIL, -1)
    scored = hourly.select(
        "h",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sd"),
        F.count("*").over(w).alias("n_base"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return (
        scored.filter((F.col("n_base") == ANOMALY_TRAIL) & (F.col("sd") > 0))
        .orderBy(F.abs(z).desc(), "h")
        .limit(ANOMALY_TOP)
        .select(
            F.date_format("h", "yyyy-MM-dd HH").alias("hour"),
            F.col("n").alias("n_events"),
            F.round(z, 4).alias("z_score"),
        )
    )


@query(
    "scd2_user_state_history",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ), intervals AS (
      SELECT user_id, event_type AS state, ts AS vf,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
      FROM marked
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, state,
           strftime(vf, '{DUCK_FMT}') AS valid_from,
           coalesce(strftime(vt, '{DUCK_FMT}'), 'current') AS valid_to,
           vt IS NULL AS is_current
    FROM intervals
    """,
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 history (Kimball dimension
    modeling) derived from the ``events`` change stream: each user's
    ``event_type`` is treated as a tracked attribute, consecutive
    duplicates are compressed (lag-based change detection), and each
    surviving change opens a validity interval closed by the next
    change (lead) — the standard warehouse pattern for auditable
    attribute history, here built declaratively instead of the
    row-at-a-time UPDATE/INSERT dance. Complements the warehouse's
    latest-wins merge (operators/upsert.py): latest-wins keeps the
    current state, SCD2 keeps every state with its validity window.

    Scale: two windows over the SAME partitioning (user_id) and the
    SAME ordering — one shuffle on the high-cardinality user key, the
    second window reuses the sort (no second exchange); per-partition
    state is one user's events. No joins, no Python.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    changes = marked.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    closed = changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("vf"),
        F.lead("ts").over(w).alias("vt"),
    )
    return closed.select(
        "user_id",
        "state",
        F.date_format("vf", TS_FMT).alias("valid_from"),
        F.coalesce(F.date_format("vt", TS_FMT), F.lit("current")).alias("valid_to"),
        F.col("vt").isNull().alias("is_current"),
    )


LOCF_USER_MOD = 10  # gap-fill audits 1-in-10 users: the spine explode
# multiplies rows (users × hours), so the entry bounds its output while
# every mechanism (spine, join, LOCF window) still runs at full width.


@query(
    "event_locf_gap_fill",
    oracle=f"""
    WITH e AS (SELECT * FROM events WHERE user_id % {LOCF_USER_MOD} = 0),
    hourly AS (
      SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS h,
             round(sum(value), 2) AS v, count(*) AS n
      FROM e GROUP BY 1, 2
    ),
    bounds AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1),
    spine AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS h
      FROM bounds
    ),
    joined AS (
      SELECT s.user_id, s.h, hourly.v, hourly.n
      FROM spine s LEFT JOIN hourly ON s.user_id = hourly.user_id AND s.h = hourly.h
    )
    SELECT user_id,
           strftime(h, '{DUCK_FMT}') AS hour,
           coalesce(n, 0) AS n_events,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_locf,
           v IS NULL AS gap_filled
    FROM joined
    """,
)
def event_locf_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill with last-observation-carried-forward
    (TimescaleDB's ``locf`` / Pandas ``ffill``, distributed): build
    each user's dense hourly spine between their first and last
    active hour (``sequence`` + ``explode`` — a projection, no
    shuffle), left-join the observed hourly aggregates onto it, and
    fill silent hours with the most recent observed value via
    ``last(ignorenulls=True)`` over an unbounded-preceding window.
    The downstream consumer (rate monitors, per-user state charts,
    feature snapshots for training) sees a gapless series with
    ``gap_filled`` marking imputed rows.

    Scale: the spine explode multiplies rows before the join, so the
    join key (user_id, hour) stays co-partitioned with the aggregate;
    the LOCF window shuffles once on the high-cardinality user key
    with per-partition state = one user's hours. No Python anywhere.
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % LOCF_USER_MOD == 0
    )
    hourly = (
        e.groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.round(F.sum("value"), 2).alias("v"),
            F.count("*").alias("n"),
        )
    )
    bounds = hourly.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    joined = spine.join(hourly, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.date_format("h", TS_FMT).alias("hour"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.last("v", ignorenulls=True).over(w).alias("v_locf"),
        F.col("v").isNull().alias("gap_filled"),
    )


DEBOUNCE_GAP_SECONDS = 3600  # calibrated: 14/184/1788 intra-burst
# gaps at sf0.001/0.01/0.1 (and zero gaps exactly ON the boundary at
# any SF, so the > decision is engine-stable); a 5s web-click window
# would be vacuously empty on this synthetic feed's hour-scale traffic


@query(
    "event_debounce",
    oracle=f"""
    WITH g AS (
      SELECT user_id, event_type, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                          > {DEBOUNCE_GAP_SECONDS} * CAST(1000000 AS BIGINT)
                  THEN 1 ELSE 0 END AS is_burst_head
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    ),
    isl AS (
      SELECT user_id, event_type,
             sum(is_burst_head) OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS burst_id
      FROM g
    )
    SELECT user_id, event_type,
           CAST(count(*) AS BIGINT)                 AS n_events,
           CAST(count(DISTINCT burst_id) AS BIGINT) AS n_kept,
           CAST(count(*) - count(DISTINCT burst_id) AS BIGINT) AS n_suppressed
    FROM isl
    GROUP BY user_id, event_type
    HAVING count(*) > count(DISTINCT burst_id)
    """,
)
def event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event debouncing via gaps-and-islands (D4 depth): collapse
    bursts of same-(user, type) events separated by ≤{DEBOUNCE_GAP_SECONDS}s
    into one kept event — duplicate-click / retry-storm suppression,
    the telemetry cousin of dedup. A burst head starts wherever the
    gap from the previous event exceeds the threshold; the running sum
    of heads numbers the islands; one event survives per island.

    Scale: two windows over the SAME (user_id, event_type) partition
    key — one exchange + one in-partition sort serve both (Spark
    reuses the sort; no second shuffle) — then a hash aggregate on the
    same key. Per-partition state is one user's one-type events. The
    streaming twin is applyInPandasWithState with a last-ts register
    (streaming/stateful.py).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    heads = ev.select(
        "user_id",
        "event_type",
        "event_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            # Microsecond-exact gap (unix_timestamp truncates to whole
            # seconds: a 3600.8s gap would read 3600 here while the
            # oracle's fractional epoch_us exceeded the threshold).
            # ts is TIMESTAMP_NTZ; the cast is a pure reinterpretation
            # under the session's pinned UTC timezone (session.py).
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
                > DEBOUNCE_GAP_SECONDS * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("is_burst_head"),
    )
    # SAME total order as the head-flag window ((ts, event_id)): a
    # running sum ordered differently would renumber tied-ts rows
    # relative to their head flags — phantom islands on simultaneous
    # events and (ts, value)-tie nondeterminism (r5 review finding,
    # reproduced: tied-ts bursts returned no suppression row at all).
    wrun = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    isl = heads.select(
        "user_id",
        "event_type",
        F.sum("is_burst_head").over(wrun).alias("burst_id"),
    )
    return (
        isl.groupBy("user_id", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("burst_id").alias("n_kept"),
            (F.count("*") - F.countDistinct("burst_id")).alias("n_suppressed"),
        )
        .filter(F.col("n_suppressed") > 0)
    )


PIT_WINDOW_US = 86_400_000_000  # 24h trailing feature window, microseconds


@query(
    "point_in_time_features",
    oracle=f"""
    WITH e AS (SELECT *, epoch_us(ts) AS ts_us FROM events),
    feats AS (
      SELECT event_id, event_type,
             CAST(count(CASE WHEN event_type = 'view' THEN 1 END)
                  OVER w AS BIGINT)  AS n_views_24h,
             CAST(count(CASE WHEN event_type = 'click' THEN 1 END)
                  OVER w AS BIGINT)  AS n_clicks_24h,
             CAST(count(CASE WHEN event_type = 'error' THEN 1 END)
                  OVER w AS BIGINT)  AS n_errors_24h,
             round(coalesce(sum(value) OVER w, 0), 2) AS sum_value_24h
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                   RANGE BETWEEN {PIT_WINDOW_US} PRECEDING
                         AND 1 PRECEDING)
    )
    SELECT event_id, n_views_24h, n_clicks_24h, n_errors_24h, sum_value_24h
    FROM feats WHERE event_type = 'purchase'
    """,
)
def point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature backfill (D4 × feature store):
    for every purchase (the label event), trailing-24h behavioral
    features — view/click/error counts and value sum — computed over
    STRICTLY PRIOR events only. The microsecond range frame ends at
    1 µs before the label, so the label row and any same-instant
    events are excluded: no training-serving leakage, the property
    feature stores call point-in-time correctness and ASOF backfills
    approximate.

    Scale: ONE window over the (user_id)-partitioned, time-ordered
    stream computes every feature — one exchange + one sort serve all
    four aggregates (same-frame expressions share the window buffer);
    purchases filter AFTER, so there is no per-label range probe and
    no self-join. Frame width is bounded by a user's 24h activity,
    not corpus size. The streaming twin is the watermarked interval
    join (streaming/joins.py) with the same 24h bound.
    """
    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-PIT_WINDOW_US, -1)
    )
    feats = ev.select(
        "event_id",
        "event_type",
        F.count(F.when(F.col("event_type") == "view", 1)).over(w).alias("n_views_24h"),
        F.count(F.when(F.col("event_type") == "click", 1))
        .over(w)
        .alias("n_clicks_24h"),
        F.count(F.when(F.col("event_type") == "error", 1))
        .over(w)
        .alias("n_errors_24h"),
        F.round(F.coalesce(F.sum("value").over(w), F.lit(0.0)), 2).alias(
            "sum_value_24h"
        ),
    )
    return feats.filter(F.col("event_type") == "purchase").drop("event_type")


WAU_DAYS = 7  # trailing window for weekly-active-users


@query(
    "rolling_active_users",
    oracle=f"""
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    bounds AS (SELECT min(d) AS d0, max(d) AS d1 FROM du),
    contrib AS (
      SELECT unnest(generate_series(d, d + INTERVAL {WAU_DAYS - 1} DAY,
                                    INTERVAL 1 DAY)) AS wday,
             user_id
      FROM du
    ),
    wau AS (
      SELECT CAST(wday AS DATE) AS day, count(DISTINCT user_id) AS wau
      FROM contrib GROUP BY 1
    ),
    dau AS (SELECT d AS day, count(DISTINCT user_id) AS dau FROM du GROUP BY 1)
    SELECT strftime(day, '%Y-%m-%d')          AS day,
           CAST(coalesce(dau.dau, 0) AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT)              AS wau,
           round(coalesce(dau.dau, 0) / CAST(wau.wau AS DOUBLE), 6) AS stickiness
    FROM wau LEFT JOIN dau USING (day) CROSS JOIN bounds
    WHERE day BETWEEN bounds.d0 AND bounds.d1
    """,
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day (D4 — the sliding DISTINCT
    aggregate, which plain window frames cannot express because
    count(DISTINCT) isn't frame-able): each (day, user) activity pair
    is exploded onto the {WAU_DAYS} window-end days it keeps the user
    "active" for, then distinct-counted per day — DAU/WAU and the
    stickiness ratio, the retention dashboard numbers.

    Scale: the corpus collapses FIRST to distinct (day, user) pairs
    (one map-side-combined aggregate — bounded by users × days, not
    events); the ×{WAU_DAYS} explosion happens on that deduped pair
    table; the per-day distinct is a two-level aggregate on
    (day, user). No frame ever holds a user set in memory and no day
    sees more than its window's pairs. Day-spine bounds ride in as a
    broadcast one-row frame.
    """
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    du = scoped_persist(du)  # feeds contrib, dau AND the bounds probe
    bounds = du.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    contrib = du.select(
        F.explode(
            F.sequence(
                F.col("d"), F.date_add("d", WAU_DAYS - 1), F.expr("INTERVAL 1 DAY")
            )
        ).alias("day"),
        "user_id",
    )
    wau = contrib.distinct().groupBy("day").agg(F.count("*").alias("wau"))
    dau = du.groupBy(F.col("d").alias("day")).agg(F.count("*").alias("dau"))
    return (
        wau.join(dau, "day", "left")
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("day").between(F.col("d0"), F.col("d1")))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("dau", F.lit(0)).alias("dau"),
            "wau",
            F.round(
                F.coalesce("dau", F.lit(0)) / F.col("wau").cast("double"), 6
            ).alias("stickiness"),
        )
    )


ATTRIB_LOOKBACK_S = 86400  # last-touch attribution window (24 h)


@query(
    "conversion_attribution",
    oracle=f"""
    WITH touched AS (
      SELECT user_id, ts, event_type,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_type,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_ts
      FROM events
    )
    SELECT CASE WHEN touch_ts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(touch_ts)
                     <= CAST({ATTRIB_LOOKBACK_S} AS BIGINT) * 1000000
                THEN touch_type ELSE 'organic' END AS attributed_to,
           count(*)                                AS n_conversions,
           count(DISTINCT user_id)                 AS n_users
    FROM touched
    WHERE event_type = 'purchase'
    GROUP BY 1
    ORDER BY attributed_to
    """,
)
def conversion_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution (D4 — the marketing/funnel
    twin of the as-of join): every ``purchase`` is attributed to the
    most recent PRECEDING non-purchase event by the same user within
    a 24 h lookback, else ``organic``. The census per attributed
    touch type is the number a growth team reads daily; the same
    shape (latest prior state as of an event) backs feature
    attribution and label provenance in training pipelines.

    Scale: ONE user-keyed window pass computes the last prior touch
    for every event (no self-join, no range join — `last_value
    IGNORE NULLS` over rows-between), then a filter to conversions
    and a tiny (touch_type) aggregate. Microsecond-exact lookback
    comparison on both engines (unix_micros/epoch_us), so a
    boundary-straddling touch can't diverge.
    """
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    np_ts = F.when(F.col("event_type") != "purchase", F.col("ts"))
    touched = e.select(
        "user_id",
        "ts",
        "event_type",
        F.last(non_purchase, ignorenulls=True).over(w).alias("touch_type"),
        F.last(np_ts, ignorenulls=True).over(w).alias("touch_ts"),
    )
    in_window = F.col("touch_ts").isNotNull() & (
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.unix_micros(F.col("touch_ts").cast("timestamp"))
        <= ATTRIB_LOOKBACK_S * 1_000_000
    )
    return (
        touched.filter(F.col("event_type") == "purchase")
        .select(
            F.when(in_window, F.col("touch_type"))
            .otherwise(F.lit("organic"))
            .alias("attributed_to"),
            "user_id",
        )
        .groupBy("attributed_to")
        .agg(
            F.count("*").alias("n_conversions"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("attributed_to")
    )


LATE_BUCKETS_S = (0, 60, 600, 3600)  # lateness histogram edges (seconds)


@query(
    "event_lateness_census",
    oracle="""
    WITH arr AS (
      SELECT ts,
             max(ts) OVER (ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS watermark_ts
      FROM events
    ),
    late AS (
      SELECT CASE
               WHEN watermark_ts IS NULL
                 OR epoch_us(watermark_ts) - epoch_us(ts) <= 0 THEN 'on_time'
               WHEN epoch_us(watermark_ts) - epoch_us(ts)
                    <= CAST(60 AS BIGINT) * 1000000 THEN 'late_1m'
               WHEN epoch_us(watermark_ts) - epoch_us(ts)
                    <= CAST(600 AS BIGINT) * 1000000 THEN 'late_10m'
               WHEN epoch_us(watermark_ts) - epoch_us(ts)
                    <= CAST(3600 AS BIGINT) * 1000000 THEN 'late_1h'
               ELSE 'late_over_1h'
             END AS lateness,
             epoch_us(watermark_ts) - epoch_us(ts) AS lag_us
      FROM arr
    )
    SELECT lateness,
           count(*) AS n_events,
           CAST(max(CASE WHEN lag_us > 0 THEN lag_us ELSE 0 END) AS BIGINT)
                    AS max_lag_us
    FROM late
    GROUP BY lateness
    ORDER BY lateness
    """,
)
def event_lateness_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness census (D4 — the measurement that SIZES a
    streaming watermark): treating arrival order as the ingestion
    sequence (event_id) and the running max event-time as the
    would-be watermark, classify every event by how far BEHIND that
    watermark it arrived — on time, within 1 m / 10 m / 1 h, or
    beyond. ``withWatermark('1 hour')`` silently DROPS the last
    bucket; this census is how you pick the delay with evidence
    instead of folklore (late data beyond the watermark is exactly
    what D3's latest-wins merge must absorb).

    Scale: one global arrival-ordered running-max window. In batch
    audit form this is a single-partition pass by definition (one
    total arrival order — the census is usually run per ingestion
    shard); the streaming twin gets the same number for free from
    ``StreamingQueryProgress.eventTime`` watermark lag. Microsecond-
    exact comparisons both engines.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, -1)
    arr = e.select(
        "ts", F.max("ts").over(w).alias("watermark_ts")
    )
    lag_us = F.unix_micros(F.col("watermark_ts").cast("timestamp")) - F.unix_micros(
        F.col("ts").cast("timestamp")
    )
    lateness = (
        F.when(F.col("watermark_ts").isNull() | (lag_us <= 0), "on_time")
        .when(lag_us <= 60 * 1_000_000, "late_1m")
        .when(lag_us <= 600 * 1_000_000, "late_10m")
        .when(lag_us <= 3600 * 1_000_000, "late_1h")
        .otherwise("late_over_1h")
    )
    return (
        arr.select(lateness.alias("lateness"), lag_us.alias("lag_us"))
        .groupBy("lateness")
        .agg(
            F.count("*").alias("n_events"),
            F.max(
                F.when(F.col("lag_us") > 0, F.col("lag_us")).otherwise(F.lit(0))
            ).alias("max_lag_us"),
        )
        .orderBy("lateness")
    )


@query(
    "markov_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    totals AS (
      SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_total
      FROM trans GROUP BY prev_type
    )
    SELECT t.prev_type, t.next_type,
           CAST(t.n AS BIGINT) AS n_transitions,
           round(CAST(t.n AS DOUBLE) / tot.row_total, 6) AS p_transition
    FROM trans t JOIN totals tot USING (prev_type)
    """,
)
def markov_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (D4 analytics): P(next event type | current), the
    user-journey kernel under funnel design, anomaly scoring
    (improbable transitions), and synthetic-session generation.
    Transitions are counted within each user's ts-ordered stream
    (ties broken by event_id so the chain is deterministic); each
    row-stochastic probability is ONE division of two exact integers.

    Scale: the lag window partitions by user_id — millions of small
    independent partitions, the shape Spark windows parallelize
    perfectly (no global sort); the transition count is a
    |types|²-group hash aggregate with map-side partials, and the
    row-normalizing totals table is |types| rows, broadcast back.
    One shuffle on user_id, one on the tiny transition key.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n")
    )
    totals = trans.groupBy("prev_type").agg(F.sum("n").alias("row_total"))
    return (
        trans.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "next_type",
            F.col("n").alias("n_transitions"),
            F.round(F.col("n").cast("double") / F.col("row_total"), 6).alias(
                "p_transition"
            ),
        )
    )


FUNNEL_RE = "v.*c.*p"  # view ... click ... purchase, in order
DOUBLE_ERROR_RE = "ee"  # two consecutive errors


@query(
    "event_pattern_regex_census",
    oracle=f"""
    WITH seqs AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS seq
      FROM events GROUP BY user_id
    )
    SELECT substr(seq, 1, 1) AS first_event,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN regexp_matches(seq, '{FUNNEL_RE}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_funnel,
           CAST(sum(CASE WHEN regexp_matches(seq, '{DOUBLE_ERROR_RE}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_double_error,
           CAST(sum(len(seq)) AS BIGINT) AS total_events
    FROM seqs
    GROUP BY 1
    """,
)
def event_pattern_regex_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern census over per-user event streams (D4): each
    user's ts-ordered event-type initials become one string; regexes
    over it answer MATCH_RECOGNIZE-style questions — how many users
    complete the view→click→purchase funnel IN ORDER (with anything
    between), how many hit back-to-back errors — grouped by how the
    journey STARTED. The regex-over-sequence-string encoding is the
    classic poor-man's sequence mining (SQL MATCH_RECOGNIZE's row
    pattern semantics, which Spark lacks natively) and stays entirely
    declarative.

    Determinism: the per-user string is built under the total order
    (ts, event_id) in BOTH engines (Spark: sort_array over structs —
    collect_list alone has no order guarantee; DuckDB: ordered
    string_agg); all outputs are integers.

    Scale: one user-keyed aggregate builds the sequences (per-user
    strings are session-sized); the census is a second tiny aggregate
    on the first-letter key. A user's whole history must fit one
    row — true for bounded event streams; unbounded journeys get
    windowed sessionization first (session_window_stats).
    """
    ev = load_table(spark, sf_dir, "events")
    seqs = (
        ev.select(
            "user_id",
            F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("c")).alias(
                "s"
            ),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.sort_array(F.collect_list("s")), lambda s: s["c"]), ""
            ).alias("seq")
        )
    )
    return (
        seqs.groupBy(F.substring("seq", 1, 1).alias("first_event"))
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.col("seq").rlike(FUNNEL_RE).cast("int")).cast("long").alias(
                "n_funnel"
            ),
            F.sum(F.col("seq").rlike(DOUBLE_ERROR_RE).cast("int"))
            .cast("long")
            .alias("n_double_error"),
            F.sum(F.length("seq")).alias("total_events"),
        )
    )


@query(
    "scd2_point_in_time_join",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    dim AS (
      SELECT user_id, event_type AS state,
             epoch_us(ts) AS vf_us,
             coalesce(epoch_us(lead(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)),
               9223372036854775807) AS vt_us
      FROM marked
      WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    fact AS (
      SELECT user_id, epoch_us(ts) - 1 AS lookup_us
      FROM events WHERE event_type = 'purchase'
    )
    SELECT coalesce(d.state, 'none') AS prior_state,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(count(DISTINCT f.user_id) AS BIGINT) AS n_users
    FROM fact f
    LEFT JOIN dim d
      ON f.user_id = d.user_id
     AND d.vf_us <= f.lookup_us AND f.lookup_us < d.vt_us
    GROUP BY 1
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup against the SCD2 history (the
    Kimball fact-to-Type-2-dimension join): for every purchase, find
    the state interval that was valid ONE MICROSECOND BEFORE the
    purchase — "what state was the user in when they bought" — and
    report the prior-state census. The 1 µs offset is the leakage
    guard (the purchase's own interval must not answer for itself),
    the same frame-exclusive trick as ``point_in_time_features``; a
    first-ever-event purchase has no prior interval and reports
    'none' (LEFT join).

    Exactness: interval bounds and lookups compare as integer
    MICROSECONDS (epoch_us/unix_micros — engine-identical), the open
    'current' interval as MAX_LONG.

    Scale: the join is an EQUI join on user_id with the interval
    containment as a residual filter — a plain hash join (each user's
    dimension rows are few), never an unbounded theta join; both
    windows building the dimension share one user-keyed sort. This is
    how a fact stream joins an SCD2 dimension at any scale: co-hash on
    the entity key, test intervals per entity.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    dim = (
        marked.filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("vf_us"),
            F.coalesce(
                F.unix_micros(F.lead("ts").over(w).cast("timestamp")),
                F.lit((1 << 63) - 1),
            ).alias("vt_us"),
        )
    )
    fact = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        (F.unix_micros(F.col("ts").cast("timestamp")) - 1).alias("lookup_us"),
    )
    joined = fact.join(
        dim,
        (fact["user_id"] == dim["user_id"])
        & (dim["vf_us"] <= fact["lookup_us"])
        & (fact["lookup_us"] < dim["vt_us"]),
        "left",
    )
    return joined.groupBy(
        F.coalesce(dim["state"], F.lit("none")).alias("prior_state")
    ).agg(
        F.count("*").alias("n_purchases"),
        F.countDistinct(fact["user_id"]).cast("long").alias("n_users"),
    )


@query(
    "user_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    seq AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
      FROM days
    ),
    runs AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS len
      FROM seq GROUP BY user_id, grp
    ),
    best AS (SELECT user_id, max(len) AS streak_days FROM runs GROUP BY user_id)
    SELECT streak_days, CAST(count(*) AS BIGINT) AS n_users
    FROM best GROUP BY streak_days ORDER BY streak_days
    """,
)
def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user, reduced to the
    streak-length histogram — the gaps-and-islands engagement kernel
    (day − row_number() is constant exactly across consecutive days),
    the distributed form of the classic "current streak" interview
    query and the retention siblings' (cohort_retention,
    rolling_active_users) long-run companion.

    Exactness: calendar-day truncation, integer day arithmetic and
    integer counts end to end — nothing floating anywhere.

    Scale: ONE user-keyed exchange serves the whole pipeline — the
    explicit user_id repartition ahead of the (user, day) dedup is
    deliberately a SUBSET of the dedup keys, which still satisfies its
    clustering requirement, so the dedup aggregate, the row_number
    window, and the run/best aggregates all reuse that partitioning
    (pinned in test_plan_shapes). No self-join — the naive streak
    formulation joins events to events on day±1; this plan touches
    each row once.
    """
    e = load_table(spark, sf_dir, "events")
    days = (
        e.select("user_id", F.col("ts").cast("date").alias("day"))
        .repartition("user_id")
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    seq = days.withColumn("grp", F.date_sub("day", F.row_number().over(w)))
    runs = seq.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    best = runs.groupBy("user_id").agg(F.max("len").alias("streak_days"))
    return (
        best.groupBy("streak_days")
        .agg(F.count("*").alias("n_users"))
        .orderBy("streak_days")
    )


@query(
    "markov_conditional_entropy",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type AS next_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    terms AS (
      SELECT prev_type, n,
             CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS row_total,
             CAST(round(1000000 * n * ln(
               CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE) / n
             )) AS BIGINT) AS h_micro
      FROM trans
    )
    SELECT prev_type,
           CAST(min(row_total) AS BIGINT) AS n_transitions,
           CAST(count(*) AS BIGINT) AS n_next_types,
           round(CAST(sum(h_micro) AS DOUBLE) / 1000000 / min(row_total), 6)
             AS h_next_nats
    FROM terms
    GROUP BY prev_type
    ORDER BY prev_type
    """,
)
def markov_conditional_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional next-event entropy H(next | current) per current
    state, from the SAME per-user transition chains as
    markov_transition_matrix — the journey-predictability dial: a
    state near 0 nats has a deterministic next step (good prefetch /
    cache candidate); a state near ln(|types|) is anarchic (no model
    will predict it). Σ p·ln(1/p) with p = n/row_total.

    Exactness: each transition's n·ln(total/n) term is quantized to
    integer MICRO-NATS once (the source_kl_divergence / DSIR idiom),
    so the per-state reduce is an integer sum; one division, rounded
    once.

    Scale: one user-keyed lag window → |types|²-group hash aggregate;
    the per-state total is a window over that TINY matrix (≤ |types|²
    rows), not over events. Nothing event-sized shuffles twice.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n")
    )
    tw = Window.partitionBy("prev_type")
    terms = trans.select(
        "prev_type",
        F.sum("n").over(tw).alias("row_total"),
        F.round(
            1_000_000
            * F.col("n")
            * F.log(F.sum("n").over(tw).cast("double") / F.col("n"))
        )
        .cast("long")
        .alias("h_micro"),
    )
    return (
        terms.groupBy("prev_type")
        .agg(
            F.min("row_total").alias("n_transitions"),
            F.count("*").alias("n_next_types"),
            F.round(
                F.sum("h_micro").cast("double") / 1_000_000 / F.min("row_total"),
                6,
            ).alias("h_next_nats"),
        )
        .orderBy("prev_type")
    )


@query(
    "funnel_latency_percentiles",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS vt FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id,
             min(epoch_us(e.ts) - epoch_us(v.vt)) AS lat_us
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= v.vt
      GROUP BY e.user_id
    ),
    ranked AS (
      SELECT lat_us,
             row_number() OVER (ORDER BY lat_us, user_id) AS rp,
             count(*) OVER () AS n
      FROM p
    )
    SELECT CAST(max(n) AS BIGINT) AS n_converted,
           CAST(max(CASE WHEN rp = CAST(ceil(0.50 * n) AS BIGINT)
                         THEN lat_us END) AS BIGINT) AS p50_latency_us,
           CAST(max(CASE WHEN rp = CAST(ceil(0.90 * n) AS BIGINT)
                         THEN lat_us END) AS BIGINT) AS p90_latency_us,
           CAST(max(CASE WHEN rp = CAST(ceil(0.99 * n) AS BIGINT)
                         THEN lat_us END) AS BIGINT) AS p99_latency_us
    FROM ranked
    """,
)
def funnel_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert percentiles: each user's latency from FIRST
    view to their FIRST subsequent purchase, reduced to discrete-rank
    p50/p90/p99 — the question after event_conversion_funnel answers
    'how many': how LONG does conversion take (SLA for nudge timing,
    attribution-window sizing — the 24 h lookbacks elsewhere in this
    module should cover ~p99 of real latencies; this measures that).

    Exactness: latencies are integer MICROSECONDS (epoch_us /
    unix_micros, the event_debounce idiom); percentiles are discrete
    ranks (⌈q·n⌉ under a total order), so every output is an actual
    data value — identical across engines.

    Scale: two user-keyed hash aggregates + one equi join (the
    survivor set only shrinks, AQE broadcasts it); the rank window
    runs over the CONVERTED-USERS table (funnel-tail sized), never
    the event stream.
    """
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    lat = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("vt"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("vt").cast("timestamp"))
            ).alias("lat_us")
        )
    )
    w = Window.orderBy("lat_us", "user_id")
    ranked = lat.select(
        "lat_us",
        F.row_number().over(w).alias("rp"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )

    def at(q):
        return F.max(
            F.when(
                F.col("rp") == F.ceil(F.lit(q) * F.col("n")).cast("long"),
                F.col("lat_us"),
            )
        ).cast("long")

    return ranked.agg(
        F.max("n").cast("long").alias("n_converted"),
        at(0.50).alias("p50_latency_us"),
        at(0.90).alias("p90_latency_us"),
        at(0.99).alias("p99_latency_us"),
    )


ACF_MAX_LAG = 7  # autocorrelation lags reported (days)


@query(
    "event_autocorrelation",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY day
    ),
    lagk AS (
      SELECT k.lag AS lag, d.c AS x, l.c AS y
      FROM (SELECT unnest(range(1, {ACF_MAX_LAG} + 1)) AS lag) k
      JOIN daily d ON TRUE
      JOIN daily l ON l.day = d.day + CAST(k.lag AS INTEGER)
    ),
    m AS (
      SELECT lag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM lagk GROUP BY lag
    )
    SELECT lag, n AS n_pairs,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                 6) AS acf
    FROM m
    ORDER BY lag
    """,
)
def event_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..{ACF_MAX_LAG} autocorrelation of the daily event-count
    series — the seasonality detector (Box-Jenkins ACF): a spike at
    lag 7 is weekly rhythm, slow decay is trend, white noise hovers
    near 0 — what decides whether the anomaly gates elsewhere in this
    module need seasonal baselines. Pearson r between the series and
    its k-day shift, pairs matched on exact calendar dates (gaps
    excluded, both engines identically).

    Exactness: all five sufficient statistics (Σx Σy Σx² Σy² Σxy) are
    exact integer sums per lag; ONE float expression (the normalized
    ratio) evaluates on identical doubles in both engines, rounded
    once — the moment_stats discipline.

    Scale: the daily series is |days| rows (one partial-aggregated
    count); the lag join and per-lag reduce run over that tiny series
    × {ACF_MAX_LAG} lags. Nothing event-sized moves twice.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("c")
    )
    daily = scoped_persist(daily)
    lags = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    d = daily.select(F.col("day").alias("d0"), F.col("c").alias("x"))
    l = daily.select(F.col("day").alias("d1"), F.col("c").alias("y"))
    lagk = (
        d.crossJoin(F.broadcast(lags))
        .join(l, F.col("d1") == F.date_add(F.col("d0"), F.col("lag")))
    )
    n, sx, sy = F.count("*"), F.sum("x"), F.sum("y")
    sxx = F.sum(F.col("x") * F.col("x"))
    syy = F.sum(F.col("y") * F.col("y"))
    sxy = F.sum(F.col("x") * F.col("y"))
    num = n.cast("double") * sxy - sx.cast("double") * sy
    den = F.sqrt(
        (n.cast("double") * sxx - sx.cast("double") * sx)
        * (n.cast("double") * syy - sy.cast("double") * sy)
    )
    return (
        lagk.groupBy("lag")
        .agg(n.alias("n_pairs"), F.round(num / den, 6).alias("acf"))
        .orderBy("lag")
    )


@query(
    "cusum_changepoint_scan",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY day
    ),
    pre AS (
      SELECT day, c,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k,
             CAST(sum(c) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS pfx,
             CAST(count(*) OVER () AS BIGINT) AS n,
             CAST(sum(c) OVER () AS BIGINT) AS t
      FROM daily
    ),
    s AS (
      SELECT day, k, n, t,
             abs(n * pfx - k * t) AS s_abs,
             -- single-integer argmax key: peak first, EARLIEST day on
             -- ties (k < 1e6 always; s_abs * 1e6 stays in BIGINT)
             abs(n * pfx - k * t) * 1000000 - k AS akey
      FROM pre
    )
    SELECT CAST(max(n) AS BIGINT) AS n_days,
           strftime(max_by(day, akey), '%Y-%m-%d') AS changepoint_day,
           CAST(max_by(k, akey) AS BIGINT) AS changepoint_rank,
           round(CAST(max(s_abs) AS DOUBLE) / (max(n) * max(t)), 6)
             AS cusum_peak_share
    FROM s
    """,
)
def cusum_changepoint_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over the daily event-count series (Page
    1954; the binary-segmentation pivot every drift monitor computes):
    the day k maximizing |Σ_{i≤k}(cᵢ − mean)| is the single best
    level-shift estimate, and the normalized peak says how sharp the
    break is (≈0 for a flat series). The alarm that tells a pipeline
    'ingest volume changed regime HERE — resegment your baselines'.

    Exactness: the CUSUM is kept SCALED BY n: n·prefix_k − k·total is
    an exact integer identical to n·Σ(cᵢ−mean) — no division enters
    until the single reported share, and the argmax is tie-broken to
    the earliest day in both engines.

    Scale: one day-keyed partial-aggregated count; every window and
    the argmax run over the |days| series.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("c")
    )
    w = Window.orderBy("day")
    pre = daily.select(
        "day",
        F.row_number().over(w).cast("long").alias("k"),
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("pfx"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("n"),
        F.sum("c").over(Window.partitionBy()).alias("t"),
    )
    s_scaled = F.col("n") * F.col("pfx") - F.col("k") * F.col("t")
    s = pre.select(
        "day",
        "k",
        "n",
        "t",
        F.abs(s_scaled).alias("s_abs"),
        (F.abs(s_scaled) * 1_000_000 - F.col("k")).alias("akey"),
    )
    return s.agg(
        F.max("n").cast("long").alias("n_days"),
        F.date_format(F.max_by("day", F.col("akey")), "yyyy-MM-dd").alias(
            "changepoint_day"
        ),
        F.max_by("k", F.col("akey")).cast("long").alias("changepoint_rank"),
        F.round(
            F.max("s_abs").cast("double") / (F.max("n") * F.max("t")), 6
        ).alias("cusum_peak_share"),
    )


@query(
    "churn_hazard_table",
    oracle="""
    WITH life AS (
      SELECT user_id,
             date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
               AS lifetime_days
      FROM events GROUP BY user_id
    ),
    d AS (
      SELECT lifetime_days AS t, CAST(count(*) AS BIGINT) AS d_t
      FROM life GROUP BY lifetime_days
    ),
    tot AS (SELECT CAST(sum(d_t) AS BIGINT) AS n FROM d),
    haz AS (
      SELECT t, d_t,
             tot.n - CAST(coalesce(sum(d_t) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS n_at_risk
      FROM d CROSS JOIN tot
    )
    SELECT t AS lifetime_days, n_at_risk, d_t AS n_ended,
           round(CAST(d_t AS DOUBLE) / n_at_risk, 6) AS hazard
    FROM haz
    ORDER BY t
    LIMIT 30
    """,
)
def churn_hazard_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time hazard table of user lifetimes (observed span
    from first to last event, in days) — the Kaplan-Meier / life-table
    input (Kaplan & Meier 1958): at each lifetime t, how many users
    were still 'at risk' and how many ended exactly there; hazard =
    d_t / n_t. The survival curve is the running product of
    (1 − hazard) — kept OUT of the query so every reported number
    stays one exact integer division (the product is one
    driver-side fold over ≤30 rows). The retention sibling of
    cohort_retention: that one fixes calendar cohorts; this one is
    calendar-free time-to-churn.

    Exactness: lifetimes are integer day spans; n_at_risk is the
    reverse cumulative sum N − Σ_{s<t} d_s — exact integers; one
    division per row, rounded once.

    Scale: one user-keyed min/max aggregate (partial-combined), then
    every window runs over the |distinct lifetimes| table. Head is a
    bounded TopK.
    """
    e = load_table(spark, sf_dir, "events")
    life = e.groupBy("user_id").agg(
        F.datediff(
            F.max(F.col("ts")).cast("date"), F.min(F.col("ts")).cast("date")
        ).alias("t")
    )
    d = life.groupBy("t").agg(F.count("*").alias("d_t"))
    tot = d.agg(F.sum("d_t").alias("n"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    haz = (
        d.crossJoin(F.broadcast(tot))
        .select(
            "t",
            "d_t",
            (F.col("n") - F.coalesce(F.sum("d_t").over(w), F.lit(0))).alias(
                "n_at_risk"
            ),
        )
    )
    return (
        haz.select(
            F.col("t").alias("lifetime_days"),
            "n_at_risk",
            F.col("d_t").alias("n_ended"),
            F.round(F.col("d_t").cast("double") / F.col("n_at_risk"), 6).alias(
                "hazard"
            ),
        )
        .orderBy("lifetime_days")
        .limit(30)
    )


SNAIVE_LAG = 7  # seasonal-naive horizon: forecast today = 7 days ago


@query(
    "seasonal_naive_backtest",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY day
    ),
    paired AS (
      SELECT a.day, a.c AS actual, f.c AS forecast
      FROM daily a JOIN daily f ON a.day = f.day + {SNAIVE_LAG}
    ),
    err AS (
      SELECT actual, forecast,
             abs(actual - forecast) AS ae,
             CAST(round(1000000.0 * abs(actual - forecast)
                  / actual) AS BIGINT) AS ape_micro
      FROM paired WHERE actual > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(CAST(sum(ae) AS DOUBLE) / count(*), 6) AS mae,
           round(CAST(sum(ape_micro) AS DOUBLE) / count(*) / 1000000, 6)
             AS mape,
           CAST(max(ae) AS BIGINT) AS worst_abs_error
    FROM err
    """,
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's event
    count with the value {SNAIVE_LAG} days earlier and score MAE /
    MAPE / worst error — the BASELINE every forecasting effort must
    beat (Hyndman's forecasting texts make it the benchmark; M-series
    competitions report skill relative to it). If a fancy model can't
    beat seasonal-naive on this table, the capacity plan shouldn't
    use it; run this first.

    Exactness: absolute errors are integers; per-day APE quantizes to
    integer micro units once (one division of exact integers per day);
    both means are integer sums with one final division each.

    Scale: one day-keyed partial-aggregated count; the self-join and
    reduce run over the |days| series.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("c")
    )
    daily = scoped_persist(daily)
    a = daily.select(F.col("day").alias("d0"), F.col("c").alias("actual"))
    f = daily.select(F.col("day").alias("d1"), F.col("c").alias("forecast"))
    paired = a.join(
        f, F.col("d0") == F.date_add(F.col("d1"), SNAIVE_LAG)
    ).filter(F.col("actual") > 0)
    ae = F.abs(F.col("actual") - F.col("forecast"))
    ape_micro = F.round(F.lit(1_000_000.0) * ae / F.col("actual")).cast("long")
    err = paired.select(ae.alias("ae"), ape_micro.alias("ape_micro"))
    return err.agg(
        F.count("*").alias("n_days"),
        F.round(F.sum("ae").cast("double") / F.count("*"), 6).alias("mae"),
        F.round(
            F.sum("ape_micro").cast("double") / F.count("*") / 1_000_000, 6
        ).alias("mape"),
        F.max("ae").cast("long").alias("worst_abs_error"),
    )


@query(
    "peak_concurrency_census",
    oracle="""
    WITH iv AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             min(ts) AS s, max(ts) AS e
      FROM events
      GROUP BY user_id, CAST(ts AS DATE)
    ),
    pts AS (
      SELECT day, s AS t, 1 AS delta, user_id FROM iv
      UNION ALL
      SELECT day, e AS t, -1 AS delta, user_id FROM iv
    ),
    run AS (
      SELECT day, t, delta,
             sum(delta) OVER (PARTITION BY day
                              ORDER BY t, delta DESC, user_id
                              ROWS UNBOUNDED PRECEDING) AS running
      FROM pts
    ),
    pk AS (
      SELECT day, CAST(max(running) AS BIGINT) AS peak_concurrent
      FROM run GROUP BY day
    )
    SELECT strftime(r.day, '%Y-%m-%d') AS day,
           CAST(count(*) / 2 AS BIGINT)  AS n_users,
           pk.peak_concurrent,
           strftime(min(CASE WHEN r.running = pk.peak_concurrent THEN r.t END),
                    '{DUCK_FMT}')        AS peak_at
    FROM run r JOIN pk USING (day)
    GROUP BY r.day, pk.peak_concurrent
    ORDER BY day
    """.format(DUCK_FMT=DUCK_FMT),
)
def peak_concurrency_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-concurrency sweep line (D4 — the interval-stacking kernel
    behind 'max simultaneous users/sessions/connections'): each user's
    daily activity interval [first event, last event] becomes a +1
    start point and a −1 end point; the running sum over the day's
    ordered points is the instantaneous concurrency, its max the
    day's peak, and the first time it is attained the peak moment.
    The capacity-planning number a serving/ingest layer is actually
    sized by — means and totals hide exactly this. Tie rule: starts
    sort before ends at the same instant (delta DESC), so touching
    intervals count as concurrent — the inclusive-interval convention,
    deterministic in both engines.

    Exactness: boundary points and running sums are integers over a
    total order with a full tie-break (t, delta, user); the peak
    moment is a min over equal-peak instants.

    Scale: interval extraction is one (user, day) hash aggregate;
    the sweep's window partitions BY DAY over 2 points per active
    user — boundary points, never raw events, cross the exchange;
    the 100 TB refinement for a hot day is pre-aggregating equal
    (t, delta) points map-side, which this shape already admits.
    """
    ev = load_table(spark, sf_dir, "events")
    iv = ev.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    pts = iv.select(
        "day", F.col("s").alias("t"), F.lit(1).alias("delta"), "user_id"
    ).unionAll(
        iv.select(
            "day", F.col("e").alias("t"), F.lit(-1).alias("delta"), "user_id"
        )
    )
    w = (
        Window.partitionBy("day")
        .orderBy(F.col("t"), F.col("delta").desc(), F.col("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select(
        "day", "t", "delta", F.sum("delta").over(w).alias("running")
    )
    run = scoped_persist(run)  # feeds the peak AND the peak-moment agg
    pk = run.groupBy("day").agg(F.max("running").alias("peak_concurrent"))
    return (
        run.join(pk, "day")
        .groupBy("day", "peak_concurrent")
        .agg(
            (F.count("*") / 2).cast("long").alias("n_users"),
            F.date_format(
                F.min(
                    F.when(
                        F.col("running") == F.col("peak_concurrent"),
                        F.col("t"),
                    )
                ),
                TS_FMT,
            ).alias("peak_at"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_users",
            "peak_concurrent",
            "peak_at",
        )
        .orderBy("day")
    )


@query(
    "holt_linear_backtest",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, y,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n_days
      FROM daily
    ),
    rec AS (
      SELECT i2.event_type, 2 AS rn, i2.n_days,
             CAST(i2.y AS DOUBLE) AS l,
             CAST(i2.y - i1.y AS DOUBLE) AS b,
             CAST(0 AS DOUBLE) AS err_sum, 0 AS n_err
      FROM idx i1 JOIN idx i2
        ON i1.event_type = i2.event_type AND i1.rn = 1 AND i2.rn = 2
      UNION ALL
      SELECT r.event_type, r.rn + 1, r.n_days,
             i.y / 2.0 + (r.l + r.b) / 2,
             (i.y / 2.0 + (r.l + r.b) / 2 - r.l) / 2 + r.b / 2,
             r.err_sum + abs(i.y - (r.l + r.b)),
             r.n_err + 1
      FROM rec r JOIN idx i
        ON i.event_type = r.event_type AND i.rn = r.rn + 1
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           round(err_sum / n_err, 4) AS mae,
           round(l, 4) AS final_level,
           round(b, 4) AS final_trend
    FROM rec WHERE rn = n_days AND n_days >= 3
    ORDER BY event_type
    """,
)
def holt_linear_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (Holt 1957) backtest over the
    per-type daily event series, the trend-aware upgrade of
    ``seasonal_naive_backtest``: with α = β = 1/2 each day's one-step
    forecast is l+b, and the reported MAE is the walk-forward error
    from day 3 on. A genuinely SEQUENTIAL recurrence — the class of
    operator Spark's relational algebra cannot express — run as an
    Arrow ``applyInPandas`` per series (the custom-stateful-operator
    seam, D5's batch analog), with the DuckDB oracle unrolling the
    same recurrence as a recursive CTE.

    Exactness: α = β = 1/2 makes every state value a DYADIC rational
    of the integer daily counts; the magnitudes (counts < 2^13,
    ≤ ~60 halvings) keep every intermediate exactly representable in
    a double, so the Python loop and the recursive CTE produce
    bit-identical states and error sums — no quantization needed,
    the only rounding is the 4-dp display.

    Scale: the shuffle is one hash agg to |types|·|days| rows; each
    pandas group is a single bounded series (days, not events). For
    millions of series this exact shape fans out across executors —
    per-series state never leaves its group.
    """
    import pandas as pd

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count("*").cast("long").alias("y"))
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        y = pdf["y"].tolist()
        # < 3 days: the walk-forward loop never runs, so err_sum/n_err
        # would be 0/0 — drop the series in BOTH lanes (oracle has the
        # matching n_days >= 3 filter).
        if len(y) < 3:
            return pd.DataFrame(
                columns=["event_type", "n_days", "mae", "final_level",
                         "final_trend"]
            )
        level, trend = float(y[1]), float(y[1] - y[0])
        err_sum, n_err = 0.0, 0
        for t in range(2, len(y)):
            forecast = level + trend
            err_sum += abs(y[t] - forecast)
            n_err += 1
            new_level = y[t] / 2.0 + forecast / 2
            trend = (new_level - level) / 2 + trend / 2
            level = new_level
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_days": [len(y)],
                "mae": [round(err_sum / n_err, 4)],
                "final_level": [round(level, 4)],
                "final_trend": [round(trend, 4)],
            }
        )

    return (
        daily.groupBy("event_type")
        .applyInPandas(
            holt,
            "event_type string, n_days long, mae double, final_level double, "
            "final_trend double",
        )
        .orderBy("event_type")
    )


RM_WINDOW_DAYS = 7  # trailing window (inclusive) for the rolling median


@query(
    "rolling_median_7d",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    win AS (
      SELECT cur.event_type, cur.d, cur.y,
             past.y AS py, past.d AS pd
      FROM daily cur JOIN daily past
        ON cur.event_type = past.event_type
       AND past.d BETWEEN cur.d - {RM_WINDOW_DAYS - 1} AND cur.d
    ),
    ranked AS (
      SELECT event_type, d, y, py,
             row_number() OVER (PARTITION BY event_type, d
                                ORDER BY py, pd) AS rk,
             count(*) OVER (PARTITION BY event_type, d) AS n_in_win
      FROM win
    )
    SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
           CAST(max(y) AS BIGINT) AS n_events,
           CAST(max(n_in_win) AS BIGINT) AS n_in_window,
           CAST(max(CASE WHEN rk = CAST(ceil(n_in_win / 2.0) AS BIGINT)
                         THEN py END) AS BIGINT) AS rolling_median
    FROM ranked
    GROUP BY event_type, d
    ORDER BY event_type, day
    """,
)
def rolling_median_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day rolling MEDIAN of the daily event count per
    type — the robust baseline every ops dashboard overlays on a
    spiky series (a rolling mean is dragged by the spike it should
    flag; cf. ``mad_outlier_census`` for the same robustness argument
    in the cross-sectional case). Exact discrete median (the
    ⌈n/2⌉-th smallest actual value), not an interpolation.

    Spark has no exact median over a sliding window — the expansion
    is an explicit self-join on the bounded day-range key (the
    standard range-join formulation; at most {RM_WINDOW_DAYS} rows
    per (type, day)) followed by an in-window rank.

    Exactness: counts are integers; the median is an element of the
    data (discrete rank ⌈n/2⌉ with a (value, day) tiebreak) — nothing
    floats anywhere.

    Scale: the series table is |types|·|days| (tiny after the first
    hash agg); the ≤7-fold range self-join and rank windows operate
    on that, never on raw events.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count("*").cast("long").alias("y"))
    )
    daily = scoped_persist(daily)
    cur = daily.select("event_type", "d", "y")
    past = daily.select(
        F.col("event_type").alias("pt"), F.col("d").alias("pd"), F.col("y").alias("py")
    )
    win = cur.join(
        past,
        (F.col("event_type") == F.col("pt"))
        & (F.col("pd") >= F.date_sub(F.col("d"), RM_WINDOW_DAYS - 1))
        & (F.col("pd") <= F.col("d")),
    )
    w = Window.partitionBy("event_type", "d").orderBy("py", "pd")
    ranked = win.select(
        "event_type",
        "d",
        "y",
        "py",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy("event_type", "d")).alias("n_in_win"),
    )
    med_rank = F.ceil(F.col("n_in_win") / 2.0).cast("long")
    return (
        ranked.groupBy(
            "event_type", F.date_format("d", "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.max("y").cast("long").alias("n_events"),
            F.max("n_in_win").cast("long").alias("n_in_window"),
            F.max(F.when(F.col("rk") == med_rank, F.col("py")))
            .cast("long")
            .alias("rolling_median"),
        )
        .orderBy("event_type", "day")
    )


TRIGRAM_TOP = 15


@query(
    "event_trigram_paths",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n_occurrences DESC, path
    LIMIT {TRIGRAM_TOP}
    """,
)
def event_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event TRIGRAM paths per user journey (the Sankey/flow
    census product analytics runs beyond the first-order
    ``markov_transition_matrix`` — second-order structure like
    view > click > purchase vs view > click > error is invisible to
    a transition matrix): sliding 3-event windows over each user's
    time-ordered stream, counted with both occurrence and distinct-
    user support.

    Exactness: pure integer counts; event ordering pinned by
    (ts, event_id) so simultaneous events cannot reorder across
    engines.

    Scale: one window over user partitions (the same shuffle every
    sessionization here rides), hash agg on the path string, top-15
    via TakeOrderedAndProject.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(" > ", "event_type", "e2", "e3").alias("path"),
            "user_id",
        )
        .groupBy("path")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy(F.col("n_occurrences").desc(), "path")
        .limit(TRIGRAM_TOP)
    )


ATTR_K = 6  # absorption horizon (steps); unrolled in both lanes
ATTR_CONV = "purchase"  # the converting event type

_ATTR_BASE_CTE = f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER w AS prev_t,
             lead(event_type) OVER w AS next_t
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    trans AS MATERIALIZED (
      SELECT s, t FROM (
        SELECT CASE WHEN prev_t IS NULL OR prev_t = '{ATTR_CONV}'
                    THEN '_start' ELSE prev_t END AS s,
               CASE WHEN event_type = '{ATTR_CONV}' THEN '_conv'
                    ELSE event_type END AS t
        FROM seq
        UNION ALL
        SELECT event_type, '_null'
        FROM seq
        WHERE next_t IS NULL AND event_type <> '{ATTR_CONV}'
      ) WHERE s <> '{ATTR_CONV}'
    ),
    tp AS MATERIALIZED (
      SELECT s, t, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(count(*)) OVER (PARTITION BY s) AS BIGINT) AS ns
      FROM trans GROUP BY s, t
    ),
    channels AS MATERIALIZED (
      SELECT DISTINCT s AS ch FROM tp WHERE s <> '_start'
    ),
    scen AS MATERIALIZED (
      SELECT '_base' AS scenario FROM (VALUES (1))
      UNION ALL SELECT ch FROM channels
    ),
    states AS MATERIALIZED (
      SELECT DISTINCT s AS st FROM tp
    ),
    v0 AS MATERIALIZED (
      SELECT scenario, st, CAST(0 AS DOUBLE) AS v
      FROM scen CROSS JOIN states
    )
"""


def _attr_round_sql(i: int) -> str:
    prev, cur = f"v{i - 1}", f"v{i}"
    return f"""
    {cur} AS MATERIALIZED (
      SELECT p.scenario, tp.s AS st,
             CAST(sum(CAST(round(1000000000 * (tp.n / CAST(tp.ns AS DOUBLE)) *
               CASE WHEN tp.t = '_conv' THEN 1.0
                    WHEN tp.t = '_null' THEN 0.0
                    WHEN tp.t = p.scenario THEN 0.0
                    ELSE coalesce(pv.v, 0.0) END) AS BIGINT))
               AS DOUBLE) / 1000000000 AS v
      FROM tp
      JOIN scen p ON TRUE
      LEFT JOIN {prev} pv ON pv.scenario = p.scenario AND pv.st = tp.t
      GROUP BY p.scenario, tp.s
    )"""


@query(
    "markov_removal_attribution",
    oracle=_ATTR_BASE_CTE
    + ","
    + ",".join(_attr_round_sql(i) for i in range(1, ATTR_K + 1))
    + f"""
    SELECT c.ch AS channel,
           round(b.v, 6) AS base_conv,
           round(r.v, 6) AS removal_conv,
           round(1 - r.v / nullif(b.v, 0), 6) AS removal_effect
    FROM channels c
    JOIN v{ATTR_K} b ON b.scenario = '_base' AND b.st = '_start'
    JOIN v{ATTR_K} r ON r.scenario = c.ch AND r.st = '_start'
    ORDER BY channel
    """,
)
def markov_removal_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov attribution with REMOVAL EFFECTS (Anderl et
    al. 2014 — the data-driven alternative to last-touch rules that
    ``conversion_attribution`` implements): build the user-journey
    transition chain (START → channels → CONV/NULL, converting events
    absorb and restart the journey), compute the START→conversion
    probability within {ATTR_K} steps, then for each channel re-run
    the absorption with that channel's state knocked out (visits to
    it become NULL). removal_effect = 1 − p_removed/p_base is the
    channel's attribution weight — a channel can have few last
    touches yet a huge removal effect if journeys route through it.

    All {1 + ATTR_K} value frames carry EVERY (scenario, state) pair
    — base plus one scenario per channel — so one join chain computes
    all removals simultaneously instead of |channels| separate
    absorption runs.

    Exactness: transition probabilities are exact-integer ratios
    evaluated in the same dag; each step's Σ p·v quantizes every term
    to integer nano before the reduce (float-sum order independence);
    one guarded division at the end.

    Scale: ONE window over user partitions builds transitions; the
    chain state is |scenarios|·|states| rows (tiny) regardless of
    corpus size — the iteration cost is {ATTR_K} broadcast joins on
    that frame, linear lineage (pagerank-style, no checkpoint
    needed).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_t"),
        F.lead("event_type").over(w).alias("next_t"),
    )
    s_col = F.when(
        F.col("prev_t").isNull() | (F.col("prev_t") == ATTR_CONV), "_start"
    ).otherwise(F.col("prev_t"))
    t_col = F.when(F.col("event_type") == ATTR_CONV, "_conv").otherwise(
        F.col("event_type")
    )
    trans = (
        seq.select(s_col.alias("s"), t_col.alias("t"))
        .unionByName(
            seq.filter(
                F.col("next_t").isNull() & (F.col("event_type") != ATTR_CONV)
            ).select(F.col("event_type").alias("s"), F.lit("_null").alias("t"))
        )
        .filter(F.col("s") != ATTR_CONV)
    )
    tp = trans.groupBy("s", "t").agg(F.count("*").cast("long").alias("n"))
    tp = tp.withColumn(
        "ns", F.sum("n").over(Window.partitionBy("s")).cast("long")
    )
    tp = scoped_persist(tp)
    channels = tp.filter(F.col("s") != "_start").select(
        F.col("s").alias("ch")
    ).distinct()
    channels = scoped_persist(channels)
    scen = channels.select(F.col("ch").alias("scenario")).unionByName(
        spark.sql("SELECT '_base' AS scenario")
    )
    states = tp.select(F.col("s").alias("st")).distinct()
    v = scen.crossJoin(states).select("scenario", "st", F.lit(0.0).alias("v"))
    for _ in range(ATTR_K):
        pv = v.select(
            F.col("scenario").alias("pscen"),
            F.col("st").alias("pt"),
            F.col("v").alias("pv"),
        )
        masked = (
            F.when(F.col("t") == "_conv", F.lit(1.0))
            .when(F.col("t") == "_null", F.lit(0.0))
            .when(F.col("t") == F.col("scenario"), F.lit(0.0))
            .otherwise(F.coalesce(F.col("pv"), F.lit(0.0)))
        )
        v = (
            tp.crossJoin(F.broadcast(scen))
            .join(
                F.broadcast(pv),
                (F.col("pscen") == F.col("scenario")) & (F.col("pt") == F.col("t")),
                "left",
            )
            .groupBy("scenario", F.col("s").alias("st"))
            .agg(
                (
                    F.sum(
                        F.round(
                            1_000_000_000
                            * (F.col("n") / F.col("ns").cast("double"))
                            * masked
                        ).cast("long")
                    ).cast("double")
                    / 1_000_000_000
                ).alias("v")
            )
        )
    base = v.filter(
        (F.col("scenario") == "_base") & (F.col("st") == "_start")
    ).select(F.col("v").alias("base_v"))
    rem = v.filter(F.col("st") == "_start").select(
        F.col("scenario").alias("channel"), F.col("v").alias("rem_v")
    )
    return (
        channels.select(F.col("ch").alias("channel"))
        .join(rem, "channel")
        .crossJoin(F.broadcast(base))
        .select(
            "channel",
            F.round("base_v", 6).alias("base_conv"),
            F.round("rem_v", 6).alias("removal_conv"),
            F.round(
                1 - F.col("rem_v") / F.nullif(F.col("base_v"), F.lit(0.0)), 6
            ).alias("removal_effect"),
        )
        .orderBy("channel")
    )


# EWMA control chart with lambda = 1/2 — DYADIC, so the recursion is
# exact integer arithmetic when carried scaled: with E_1 = x_1 and
# E_t = (x_t + E_{t-1})/2, the scaled series M_t = 2^{t-1}·E_t obeys
# M_t = x_1 + sum_{i=2..t} x_i·2^{i-2} — a plain cumulative sum of
# integer terms. Asymptotic 3-sigma limits use sqrt(lambda/(2-lambda))
# = sqrt(1/3).
EWMA_L = 3.0  # control-limit width in sigmas


@query(
    "ewma_control_chart",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY day
    ),
    idx AS (
      SELECT day, x,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
      FROM daily
    ),
    scaled AS (
      SELECT day, x, i,
             CAST(sum(CASE WHEN i = 1 THEN x
                           ELSE x * CAST(power(2, i - 2) AS BIGINT) END)
                  OVER (ORDER BY i) AS BIGINT) AS m
      FROM idx
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s1,
             CAST(sum(x * x) AS BIGINT) AS s2
      FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, x AS n_events,
           round(m / power(2, i - 1), 6) AS ewma,
           abs(m / power(2, i - 1) - CAST(s1 AS DOUBLE) / n)
             > {EWMA_L} * sqrt((CAST(s2 AS DOUBLE)
                                - CAST(s1 AS DOUBLE) * s1 / n)
                               / nullif(n - 1, 0))
               * sqrt(1.0 / 3) AS out_of_control
    FROM scaled CROSS JOIN stats
    ORDER BY day
    """,
)
def ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart over daily event volume (Roberts 1959 — the
    small-shift detector SPC runs next to the Shewhart chart and
    CUSUM, see ``cusum_changepoint_scan``: the exponentially weighted
    mean reacts to sustained drifts that single-day 3-sigma rules
    miss). Smoothing lambda = 1/2 — chosen DYADIC so the recursion
    E_t = (x_t + E_{{t-1}})/2 carries exactly: scaled by 2^(t-1) it is
    a plain cumulative INTEGER sum M_t = x_1 + sum x_i·2^(i-2), and
    the chart value is one exact division per row. Limits are the
    asymptotic mu-hat +/- 3·sigma-hat·sqrt(lambda/(2-lambda)).

    Exactness: daily counts, the scaled cumulative sum, and the
    moment sums are all integers (2^(i-2) is exact in a double far
    past any observation window); ewma and the verdict are one fixed
    float dag per row, rounded/compared identically in both lanes.

    Scale: one date-keyed hash agg, then a window over the
    |days|-row grid and a 3-counter broadcast — the chart of a
    billion-event stream costs one scan. The scaled integer stays
    < 2^62 for windows up to ~45 days at a billion events/day; longer
    windows restart the scaling epoch (the recursion forgets the past
    geometrically, so epochs splice exactly).
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("x")
    )
    idx = daily.select(
        "day",
        "x",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("i"),
    )
    term = F.when(F.col("i") == 1, F.col("x")).otherwise(
        F.col("x") * F.pow(F.lit(2.0), F.col("i") - 2).cast("long")
    )
    scaled = idx.select(
        "day",
        "x",
        "i",
        F.sum(term)
        .over(Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("m"),
    )
    stats = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
    )
    ewma = F.col("m") / F.pow(F.lit(2.0), F.col("i") - 1)
    mu = F.col("s1").cast("double") / F.col("n")
    sd = F.sqrt(
        (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("n"))
        / F.nullif(F.col("n") - 1, F.lit(0))
    )
    return (
        scaled.crossJoin(F.broadcast(stats))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("x").alias("n_events"),
            F.round(ewma, 6).alias("ewma"),
            (
                F.abs(ewma - mu)
                > EWMA_L * sd * F.sqrt(F.lit(1.0) / 3)
            ).alias("out_of_control"),
        )
        .orderBy("day")
    )


XCORR_MAX_LAG = 3
XCORR_X, XCORR_Y = "view", "purchase"  # does X volume lead Y volume?


@query(
    "lead_lag_xcorr",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CASE WHEN event_type = '{XCORR_X}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = '{XCORR_Y}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY day
    ),
    lags AS (SELECT unnest(range(0, {XCORR_MAX_LAG + 1})) AS lag),
    pairs AS (
      SELECT l.lag, a.x, b.y
      FROM lags l
      JOIN daily a ON true
      JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)
    ),
    g AS (
      SELECT lag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag_days, n AS n_days,
           round((n * sxy - sx * sy)
                 / nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0), 6)
             AS xcorr
    FROM g ORDER BY lag_days
    """,
)
def lead_lag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between two event streams (the
    sample cross-correlation function at non-negative lags — does
    today's {XCORR_X} volume predict {XCORR_Y} volume k days out?
    The screening statistic behind Granger-style lead-lag analysis
    and marketing-mix lag estimation): Pearson r between x_t and
    y_(t+k) for k = 0..{XCORR_MAX_LAG} over the daily series.

    Exactness: both daily series are integer counts from ONE pass;
    per-lag n/Σx/Σy/Σxy/Σx²/Σy² are integer sums over the lag-joined
    pairs; each lag's r is one fixed float dag (two exact sqrts)
    rounded once — the ``spearman_rank_corr`` determinism recipe on
    the raw counts. Degenerate lags (constant series) yield NULL via
    nullif.

    Scale: the heavy reduce is the daily aggregate; the lag join
    operates on the |days| grid x (max_lag+1) — nothing row-level
    crosses it. At 100 TB this is the pattern for cheap cross-series
    dependency scans over any pre-aggregated KPI table.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum((F.col("event_type") == XCORR_X).cast("int"))
        .cast("long")
        .alias("x"),
        F.sum((F.col("event_type") == XCORR_Y).cast("int"))
        .cast("long")
        .alias("y"),
    )
    daily = scoped_persist(daily)
    lags = spark.range(0, XCORR_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.select("day", "x")
    b = daily.select(F.col("day").alias("day_b"), "y")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("day_b") == F.date_add(F.col("day"), F.col("lag")))
    )
    g = pairs.groupBy("lag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.nullif(
        F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
        * F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")),
        F.lit(0.0),
    )
    return g.select(
        F.col("lag").cast("long").alias("lag_days"),
        F.col("n").alias("n_days"),
        F.round(num / den, 6).alias("xcorr"),
    ).orderBy("lag_days")


WAU_WINDOW = 7  # trailing window (days) for the "monthly" active set


@query(
    "dau_wau_stickiness",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day),
    wau AS (
      SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
      FROM days d JOIN ud u
        ON u.day BETWEEN d.day - {WAU_WINDOW - 1} AND d.day
      GROUP BY d.day
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day, dau.dau, wau.wau,
           round(CAST(dau.dau AS DOUBLE) / wau.wau, 4) AS stickiness
    FROM days d JOIN dau ON d.day = dau.day JOIN wau ON d.day = wau.day
    ORDER BY d.day
    """,
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness (the engagement ratio product dashboards
    lead with — what share of the week's active users showed up
    today; Facebook's classic DAU/MAU compressed to this dataset's
    {7}-day window): per day, distinct daily actives over distinct
    trailing-{7}-day actives.

    Exactness: both counts are exact distincts over the (day, user)
    table; the ratio is one division rounded once.

    Scale: the sliding DISTINCT is the famously non-mergeable op —
    this exact formulation joins the |days| spine to the
    user-day table (bounded: days x daily-actives) and is the ORACLE
    shape; at 100 TB swap per-day HLL sketches merged over the
    window (``hll_union_audit`` is the building block — sketch
    unions are exactly what make sliding actives cheap).
    """
    e = load_table(spark, sf_dir, "events")
    ud = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    ud = scoped_persist(ud)
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    wau = (
        days.select(F.col("day").alias("d"))
        .join(
            ud,
            (F.col("day") >= F.date_sub(F.col("d"), WAU_WINDOW - 1))
            & (F.col("day") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
        .withColumnRenamed("d", "day")
    )
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 4).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


# Day-of-week index both engines agree on: days since Monday
# 2024-01-01, mod 7 — no dialect dayofweek() convention enters.
_DOW_ANCHOR = "2024-01-01"


@query(
    "dow_seasonality_strength",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY day
    ),
    dowed AS (
      SELECT ((date_diff('day', DATE '{_DOW_ANCHOR}', day) % 7) + 7) % 7
               AS dow, x
      FROM daily
    ),
    g AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(x) AS BIGINT) AS sg,
             CAST(sum(x * x) AS BIGINT) AS qg
      FROM dowed GROUP BY dow
    ),
    tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(sum(sg) AS BIGINT) AS s,
                   CAST(sum(qg) AS BIGINT) AS q FROM g),
    terms AS (
      SELECT CAST(round(1000000 * (CAST(sg AS DOUBLE) - CAST(ng AS DOUBLE) * s / n)
                                * (CAST(sg AS DOUBLE) - CAST(ng AS DOUBLE) * s / n)
                                / ng) AS BIGINT) AS b_micro
      FROM g CROSS JOIN tot
    ),
    agg AS (SELECT CAST(sum(b_micro) AS BIGINT) AS b FROM terms),
    peak AS (
      SELECT dow AS peak_dow, round(CAST(sg AS DOUBLE) / ng, 4) AS peak_mean
      FROM g ORDER BY CAST(sg AS DOUBLE) / ng DESC, dow LIMIT 1
    )
    SELECT t.n AS n_days,
           round((CAST(a.b AS DOUBLE) / 1000000)
                 / nullif(CAST(t.q AS DOUBLE) - CAST(t.s AS DOUBLE) * t.s / t.n,
                          0), 6) AS eta_squared,
           p.peak_dow, p.peak_mean
    FROM agg a CROSS JOIN tot t CROSS JOIN peak p
    """,
)
def dow_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality strength (the eta-squared variance
    decomposition behind "how weekly is this metric?" — the share of
    daily-volume variance explained by day-of-week, the first number
    an STL-style decomposition reports and the gate before seasonal
    adjustment or the seasonal-naive forecast of
    ``seasonal_naive_backtest`` makes sense): between-group sum of
    squares over day-of-week groups divided by total sum of squares.

    Exactness: the day-of-week index is pure integer date arithmetic
    (days since a Monday anchor mod 7 — no engine dayofweek()
    convention crosses the oracle); per-group n/Σx/Σx² are integer
    sums; each group's between-term quantizes to micro units and
    reduces by integer sum (the Brown-Forsythe idiom); the peak day
    is an integer-tie-broken top-1.

    Scale: one date hash agg to |days| rows, a 7-group reduce,
    nothing else.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("x")
    )
    dow = (
        (F.datediff(F.col("day"), F.lit(_DOW_ANCHOR).cast("date")) % 7) + 7
    ) % 7
    g = daily.select(dow.alias("dow"), "x").groupBy("dow").agg(
        F.count("*").cast("long").alias("ng"),
        F.sum("x").cast("long").alias("sg"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("qg"),
    )
    g = scoped_persist(g)
    tot = g.agg(
        F.sum("ng").cast("long").alias("n"),
        F.sum("sg").cast("long").alias("s"),
        F.sum("qg").cast("long").alias("q"),
    )
    dev = F.col("sg").cast("double") - F.col("ng").cast("double") * F.col("s") / F.col("n")
    terms = g.crossJoin(F.broadcast(tot)).select(
        F.round(1_000_000 * dev * dev / F.col("ng")).cast("long").alias("b_micro")
    )
    agg = terms.agg(F.sum("b_micro").cast("long").alias("b"))
    peak = (
        g.orderBy((F.col("sg").cast("double") / F.col("ng")).desc(), "dow")
        .limit(1)
        .select(
            F.col("dow").alias("peak_dow"),
            F.round(F.col("sg").cast("double") / F.col("ng"), 4).alias(
                "peak_mean"
            ),
        )
    )
    sst = F.col("q").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n")
    return (
        agg.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(peak))
        .select(
            F.col("n").alias("n_days"),
            F.round(
                (F.col("b").cast("double") / 1_000_000)
                / F.nullif(sst, F.lit(0.0)),
                6,
            ).alias("eta_squared"),
            "peak_dow",
            "peak_mean",
        )
    )


@query(
    "binary_segmentation_split",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY day
    ),
    idx AS (
      SELECT day, x,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
             CAST(sum(x) OVER (ORDER BY day) AS BIGINT) AS sl
      FROM daily
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS s FROM daily),
    cand AS (
      SELECT day, i, sl, t.n, t.s,
             CAST(round(1000000.0
               * (t.n * sl - i * t.s) * (t.n * sl - i * t.s)
               / (CAST(t.n AS DOUBLE) * i * (t.n - i))) AS BIGINT)
               AS gain_micro
      FROM idx CROSS JOIN tot t
      WHERE i < t.n
    ),
    best AS (
      SELECT * FROM cand ORDER BY gain_micro DESC, day LIMIT 1
    )
    SELECT strftime(day, '%Y-%m-%d') AS split_after_day,
           n AS n_days,
           round(gain_micro / 1000000.0, 4) AS between_ss_gain,
           round(CAST(sl AS DOUBLE) / i, 4) AS mean_left,
           round(CAST(s - sl AS DOUBLE) / (n - i), 4) AS mean_right
    FROM best
    """,
)
def binary_segmentation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-segmentation changepoint detection, first split (Scott
    & Knott 1974 / the recursion inside every segmentation library:
    place one breakpoint where the between-segment sum of squares
    (n_L·n_R/n)·(mean_L - mean_R)² is maximized): the OFFLINE
    changepoint locator complementing this module's ONLINE detectors
    (CUSUM reacts as data streams, EWMA smooths; binary segmentation
    answers "where, in hindsight, did the level shift?"). Recursing
    on each side yields the full segmentation — one plan re-run per
    segment.

    Exactness: with prefix sums S_L over integer daily counts, the
    gain rewrites as (n·S_L - i·S)²/(n·i·(n-i)) — an integer
    numerator per candidate, quantized ONCE to micro units for the
    argmax, tie-broken on the day; means are single divisions.

    Scale: one date hash agg, one cumulative window over the |days|
    grid, and a top-1 heap over |days| candidates — the split of a
    billion-event year costs its daily rollup.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("x")
    )
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    idx = daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("i"),
        F.sum("x").over(w_cum).cast("long").alias("sl"),
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"), F.sum("x").cast("long").alias("s")
    )
    num = F.col("n") * F.col("sl") - F.col("i") * F.col("s")
    cand = (
        idx.crossJoin(F.broadcast(tot))
        .filter(F.col("i") < F.col("n"))
        .select(
            "day",
            "i",
            "sl",
            "n",
            "s",
            F.round(
                1_000_000.0
                * num
                * num
                / (
                    F.col("n").cast("double")
                    * F.col("i")
                    * (F.col("n") - F.col("i"))
                )
            )
            .cast("long")
            .alias("gain_micro"),
        )
    )
    best = cand.orderBy(F.col("gain_micro").desc(), "day").limit(1)
    return best.select(
        F.date_format("day", "yyyy-MM-dd").alias("split_after_day"),
        F.col("n").alias("n_days"),
        F.round(F.col("gain_micro") / 1_000_000.0, 4).alias("between_ss_gain"),
        F.round(F.col("sl").cast("double") / F.col("i"), 4).alias("mean_left"),
        F.round(
            (F.col("s") - F.col("sl")).cast("double") / (F.col("n") - F.col("i")),
            4,
        ).alias("mean_right"),
    )


PH_DELTA_MICRO = 2_000_000  # Page-Hinkley slack delta = 2 count units
PH_LAMBDA_MICRO = 50_000_000  # alarm threshold lambda = 50 count units


@query(
    "page_hinkley_drift",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY day
    ),
    run AS (
      SELECT day, x,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
             CAST(sum(x) OVER (ORDER BY day) AS BIGINT) AS s
      FROM daily
    ),
    inc AS (
      SELECT day, x,
             CAST(round(1000000.0 * (x - CAST(s AS DOUBLE) / i)) AS BIGINT)
               - {PH_DELTA_MICRO} AS inc_micro
      FROM run
    ),
    m AS (
      SELECT day, x,
             CAST(sum(inc_micro) OVER (ORDER BY day) AS BIGINT) AS m_micro
      FROM inc
    ),
    ph AS (
      SELECT day, x, m_micro,
             CAST(m_micro - min(m_micro) OVER (ORDER BY day) AS BIGINT)
               AS ph_micro
      FROM m
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, x AS n_events,
           round(ph_micro / 1000000.0, 4) AS ph_stat,
           ph_micro > {PH_LAMBDA_MICRO} AS alarm
    FROM ph ORDER BY day
    """,
)
def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley drift detector over the daily event-count series
    (Page 1954 / the PH test every streaming-ML library ships for
    concept drift — river, MOA): the cumulative deviation from the
    RUNNING mean, m_t = sum(x_i − mean_{{1..i}} − delta), alarms when
    it exceeds its own running minimum by lambda. Complements this
    module's CUSUM (fixed reference level) and EWMA (smoothed control
    limits): PH self-calibrates to the series' own evolving mean, the
    usual choice when no in-control baseline exists.

    Exactness: the running mean is cleared through the prefix sum
    (S_i/i — one float division per day, quantized to integer micro
    units BEFORE the cumulative sum), so m_t, its running minimum,
    the PH gap and the alarm comparison are all integer arithmetic —
    the detector's path never accumulates float error.

    Scale: one date hash agg, then three stacked windows over the
    |days| grid — the collapsed-series shape shared by every
    sequential detector in this module; a year of a billion events is
    365 window rows.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("x")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    run = daily.select(
        "day",
        "x",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("i"),
        F.sum("x").over(w).cast("long").alias("s"),
    )
    inc = run.select(
        "day",
        "x",
        (
            F.round(
                1_000_000.0 * (F.col("x") - F.col("s").cast("double") / F.col("i"))
            ).cast("long")
            - PH_DELTA_MICRO
        ).alias("inc_micro"),
    )
    m = inc.select(
        "day", "x", F.sum("inc_micro").over(w).cast("long").alias("m_micro")
    )
    ph = m.select(
        "day",
        "x",
        (F.col("m_micro") - F.min("m_micro").over(w)).cast("long").alias("ph_micro"),
    )
    return ph.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("x").alias("n_events"),
        F.round(F.col("ph_micro") / 1_000_000.0, 4).alias("ph_stat"),
        (F.col("ph_micro") > PH_LAMBDA_MICRO).alias("alarm"),
    ).orderBy("day")


LB_MAX_LAG = 7  # Ljung-Box portmanteau over lags 1..7 (one week)


@query(
    "ljung_box_test",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY day
    ),
    idx AS (
      SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i, x
      FROM daily
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS s FROM daily),
    nd AS (
      SELECT i, CAST(t.n * x - t.s AS BIGINT) AS nd, t.n
      FROM idx CROSS JOIN tot t
    ),
    den AS (SELECT CAST(sum(nd * nd) AS BIGINT) AS den FROM nd),
    r AS (
      SELECT k.k,
             CAST(round(1000000.0 * sum(a.nd * b.nd) / any_value(d.den))
                  AS BIGINT) AS r_micro,
             any_value(a.n) AS n
      FROM unnest(range(1, {LB_MAX_LAG} + 1)) AS k(k)
      JOIN nd a ON TRUE
      JOIN nd b ON b.i = a.i - k.k
      CROSS JOIN den d
      GROUP BY k.k
    )
    SELECT CAST(k AS BIGINT) AS lag,
           round(r_micro / 1000000.0, 6) AS acf_r,
           round(n * (n + 2.0)
                 * sum((r_micro / 1000000.0) * (r_micro / 1000000.0)
                       / (n - k)) OVER (ORDER BY k), 4) AS q_stat
    FROM r ORDER BY lag
    """,
)
def ljung_box_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test (Ljung & Box 1978 — the standard
    "is anything left in the residuals?" check after any forecast
    fit, e.g. this module's ``holt_linear_backtest`` /
    ``seasonal_naive_backtest``): Q_k = n(n+2)·sum_{{j<=k}}
    r_j²/(n−j) over the daily series' autocorrelations at lags
    1..{LB_MAX_LAG}, reported cumulatively per lag. Complements
    ``event_autocorrelation`` (which reports the ACF) by adding the
    aggregate INFERENCE statistic chi-square-distributed under the
    white-noise null.

    Exactness: with nd_t = n·x_t − S, each r_k's numerator
    sum(nd_t·nd_{{t−k}}) and shared denominator sum(nd²) are exact
    integers (the n² mean-clearing factors cancel); r_k is quantized
    to integer micro units before Q's float dag, which is one
    cumulative window rounded once.

    Scale: the lag pairing is a |days|×{LB_MAX_LAG} self-join of the
    collapsed daily grid — series-sized, never event-sized.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("x")
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).cast("long").alias("i"),
        "x",
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"), F.sum("x").cast("long").alias("s")
    )
    nd = idx.crossJoin(F.broadcast(tot)).select(
        "i", (F.col("n") * F.col("x") - F.col("s")).cast("long").alias("nd"), "n"
    )
    nd = scoped_persist(nd)
    den = nd.agg(F.sum(F.col("nd") * F.col("nd")).cast("long").alias("den"))
    kgrid = spark.range(1, LB_MAX_LAG + 1).select(F.col("id").alias("k"))
    a = nd.crossJoin(F.broadcast(kgrid)).select(
        "k", (F.col("i") - F.col("k")).alias("j"), F.col("nd").alias("nd_a"), "n"
    )
    b = nd.select(F.col("i").alias("j"), F.col("nd").alias("nd_b"))
    r = (
        a.join(b, "j")
        .crossJoin(F.broadcast(den))
        .groupBy("k")
        .agg(
            F.round(
                1_000_000.0 * F.sum(F.col("nd_a") * F.col("nd_b")) / F.first("den")
            )
            .cast("long")
            .alias("r_micro"),
            F.first("n").alias("n"),
        )
    )
    w_cum = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    rr = F.col("r_micro") / 1_000_000.0
    return r.select(
        F.col("k").cast("long").alias("lag"),
        F.round(rr, 6).alias("acf_r"),
        F.round(
            F.col("n")
            * (F.col("n") + 2.0)
            * F.sum(rr * rr / (F.col("n") - F.col("k"))).over(w_cum),
            4,
        ).alias("q_stat"),
    ).orderBy("lag")


HW_SEASON = 7  # Holt-Winters season length (day-of-week)


@query(
    "holt_winters_backtest",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, y,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n_days
      FROM daily
    ),
    init AS (
      SELECT event_type, CAST(sum(y) AS DOUBLE) / {HW_SEASON} AS l,
             any_value(n_days) AS n_days
      FROM idx WHERE rn <= {HW_SEASON} GROUP BY event_type
    ),
    rec AS (
      SELECT p.event_type, {HW_SEASON} AS rn, p.n_days, p.l,
             CAST(0 AS DOUBLE) AS b,
             (SELECT list(i.y - p.l ORDER BY i.rn) FROM idx i
              WHERE i.event_type = p.event_type AND i.rn <= {HW_SEASON}) AS s,
             CAST(0 AS DOUBLE) AS err_sum, 0 AS n_err
      FROM init p
      UNION ALL
      SELECT r.event_type, r.rn + 1, r.n_days,
             (i.y - r.s[1]) / 2 + (r.l + r.b) / 2,
             ((i.y - r.s[1]) / 2 + (r.l + r.b) / 2 - r.l) / 2 + r.b / 2,
             list_append(r.s[2:{HW_SEASON}],
                         (i.y - ((i.y - r.s[1]) / 2 + (r.l + r.b) / 2)) / 2
                         + r.s[1] / 2),
             r.err_sum + abs(i.y - ((r.l + r.b) + r.s[1])),
             r.n_err + 1
      FROM rec r JOIN idx i
        ON i.event_type = r.event_type AND i.rn = r.rn + 1
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           round(err_sum / n_err, 4) AS mae,
           round(l, 4) AS final_level,
           round(b, 4) AS final_trend
    FROM rec WHERE rn = n_days AND n_days >= {HW_SEASON + 1}
    ORDER BY event_type
    """,
)
def holt_winters_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters triple exponential smoothing (Winters
    1960) backtest over the per-type daily series — the SEASONAL
    upgrade of ``holt_linear_backtest``: level, trend AND a
    {HW_SEASON}-slot day-of-week seasonal state evolve together
    (alpha = beta = gamma = 1/2), and the walk-forward one-step MAE
    is scored from day {HW_SEASON + 1} on. Like Holt, a genuinely
    sequential recurrence Spark's relational algebra cannot express —
    run as an Arrow ``applyInPandas`` per series; the DuckDB oracle
    unrolls the identical recurrence as a recursive CTE whose rows
    CARRY the rotating seasonal state as a LIST column.

    Exactness: both lanes execute the IDENTICAL IEEE operation
    sequence — one integer seven-day sum then a single /7 for the
    initial level, then only subtractions, exact halvings and
    additions in matching association order — so the states and
    error sums agree bit-for-bit; the only rounding is the 4-dp
    display. Series shorter than {HW_SEASON + 1} days drop in both
    lanes (no step ever runs).

    Scale: one hash agg to |types|x|days| rows; each pandas group is
    one bounded series — for millions of series the groups fan out
    across executors and the {HW_SEASON}-slot state never leaves its
    group (the same bounded-state argument as the streaming session
    entry, in batch form).
    """
    import pandas as pd

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count("*").cast("long").alias("y"))
    )

    def hw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        y = pdf["y"].tolist()
        m = HW_SEASON
        if len(y) < m + 1:
            return pd.DataFrame(
                columns=["event_type", "n_days", "mae", "final_level",
                         "final_trend"]
            )
        level = sum(y[:m]) / float(m)
        trend = 0.0
        s = [y[i] - level for i in range(m)]
        err_sum, n_err = 0.0, 0
        for t in range(m, len(y)):
            forecast = (level + trend) + s[0]
            err_sum += abs(y[t] - forecast)
            n_err += 1
            new_level = (y[t] - s[0]) / 2 + (level + trend) / 2
            trend = (new_level - level) / 2 + trend / 2
            s_new = (y[t] - new_level) / 2 + s[0] / 2
            level = new_level
            s = s[1:] + [s_new]
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_days": [len(y)],
                "mae": [round(err_sum / n_err, 4)],
                "final_level": [round(level, 4)],
                "final_trend": [round(trend, 4)],
            }
        )

    return (
        daily.groupBy("event_type")
        .applyInPandas(
            hw,
            "event_type string, n_days long, mae double, final_level double, "
            "final_trend double",
        )
        .orderBy("event_type")
    )


@query(
    "effective_sample_size",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY day
    ),
    idx AS (
      SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i, x
      FROM daily
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS s FROM daily),
    nd AS (
      SELECT i, CAST(t.n * x - t.s AS BIGINT) AS nd, t.n
      FROM idx CROSS JOIN tot t
    ),
    den AS (SELECT CAST(sum(nd * nd) AS BIGINT) AS den FROM nd),
    r AS (
      SELECT k.k,
             CAST(round(1000000.0 * sum(a.nd * b.nd) / any_value(d.den))
                  AS BIGINT) AS r_micro,
             any_value(a.n) AS n
      FROM unnest(range(1, {LB_MAX_LAG} + 1)) AS k(k)
      JOIN nd a ON TRUE
      JOIN nd b ON b.i = a.i - k.k
      CROSS JOIN den d
      GROUP BY k.k
    ),
    kept AS (
      SELECT k, r_micro, n,
             min(r_micro) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS prefix_min
      FROM r
    )
    SELECT CAST(min(n) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN prefix_min > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lags_used,
           CAST(coalesce(sum(CASE WHEN prefix_min > 0 THEN r_micro END), 0)
                AS BIGINT) AS sum_r_micro,
           round(1 + 2 * coalesce(sum(CASE WHEN prefix_min > 0
                                           THEN r_micro END), 0)
                     / 1000000.0, 4) AS autocorr_time,
           round(min(n) / (1 + 2 * coalesce(sum(CASE WHEN prefix_min > 0
                                                     THEN r_micro END), 0)
                               / 1000000.0), 2) AS ess
    FROM kept
    """,
)
def effective_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size under autocorrelation (the MCMC/
    time-series ESS: n/(1 + 2·sum r_k) — how many INDEPENDENT
    observations the daily series is actually worth; the number every
    "is this week's metric significant?" test silently assumes equals
    n): autocorrelations come from the same integer-exact machinery
    as ``ljung_box_test``, and the sum uses Geyer-style
    initial-positive truncation (lags included only while every
    prefix autocorrelation is positive), which both regularizes the
    estimator and keeps the denominator provably >= 1.

    Exactness: the truncation decision is an integer prefix-min over
    micro-quantized r_k — no float comparison decides inclusion; the
    final ESS is one float dag over the included integer sum, rounded
    once.

    Scale: the lag pairing is a |days|x{LB_MAX_LAG} self-join of the
    collapsed daily grid; everything after is a {LB_MAX_LAG}-row
    frame.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("x")
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).cast("long").alias("i"),
        "x",
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"), F.sum("x").cast("long").alias("s")
    )
    nd = idx.crossJoin(F.broadcast(tot)).select(
        "i", (F.col("n") * F.col("x") - F.col("s")).cast("long").alias("nd"), "n"
    )
    nd = scoped_persist(nd)
    den = nd.agg(F.sum(F.col("nd") * F.col("nd")).cast("long").alias("den"))
    kgrid = spark.range(1, LB_MAX_LAG + 1).select(F.col("id").alias("k"))
    a = nd.crossJoin(F.broadcast(kgrid)).select(
        "k", (F.col("i") - F.col("k")).alias("j"), F.col("nd").alias("nd_a"), "n"
    )
    b = nd.select(F.col("i").alias("j"), F.col("nd").alias("nd_b"))
    r = (
        a.join(b, "j")
        .crossJoin(F.broadcast(den))
        .groupBy("k")
        .agg(
            F.round(
                1_000_000.0 * F.sum(F.col("nd_a") * F.col("nd_b")) / F.first("den")
            )
            .cast("long")
            .alias("r_micro"),
            F.first("n").alias("n"),
        )
    )
    w_pre = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    kept = r.select(
        "k", "r_micro", "n", F.min("r_micro").over(w_pre).alias("prefix_min")
    )
    inc = F.when(F.col("prefix_min") > 0, F.col("r_micro"))
    sum_r = F.coalesce(F.sum(inc), F.lit(0)).cast("long")
    tau = 1 + 2 * sum_r / 1_000_000.0
    return kept.agg(
        F.min("n").cast("long").alias("n_days"),
        F.sum((F.col("prefix_min") > 0).cast("int")).cast("long").alias("n_lags_used"),
        sum_r.alias("sum_r_micro"),
        F.round(tau, 4).alias("autocorr_time"),
        F.round(F.min("n") / tau, 2).alias("ess"),
    )


HURST_WINDOWS = (4, 8, 16)  # dyadic R/S block sizes


@query(
    "hurst_exponent_rs",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY day
    ),
    idx AS (
      SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i, x,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM daily
    ),
    blocks AS (
      SELECT w.w, (i - 1) // w.w AS b, ((i - 1) % w.w) + 1 AS j, x, n
      FROM idx CROSS JOIN unnest([{', '.join(str(w) for w in HURST_WINDOWS)}])
               AS w(w)
      WHERE (i - 1) // w.w < n // w.w
    ),
    z AS (
      SELECT w, b, j, x,
             CAST(w * sum(x) OVER (PARTITION BY w, b ORDER BY j)
                  - j * sum(x) OVER (PARTITION BY w, b) AS BIGINT) AS z_num,
             CAST(sum(x) OVER (PARTITION BY w, b) AS BIGINT) AS sb,
             CAST(sum(x * x) OVER (PARTITION BY w, b) AS BIGINT) AS qb
      FROM blocks
    ),
    per_block AS (
      SELECT w, b,
             CAST(max(z_num) - min(z_num) AS BIGINT) AS r_num,
             min(sb) AS sb, min(qb) AS qb, min(w) AS w_
      FROM z GROUP BY w, b
    ),
    rs AS (
      SELECT w,
             CAST(round(1000000.0 * r_num
                        / sqrt(CAST(w * qb - sb * sb AS DOUBLE)))
                  AS BIGINT) AS rs_micro
      FROM per_block WHERE w * qb - sb * sb > 0
    ),
    per_w AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n_blocks,
             CAST(sum(rs_micro) AS BIGINT) AS sum_rs_micro
      FROM rs GROUP BY w
    )
    SELECT CAST(w AS BIGINT) AS window_size, n_blocks,
           round(sum_rs_micro / n_blocks / 1000000.0, 4) AS rs_avg,
           round((ln(max(CASE WHEN w = {HURST_WINDOWS[-1]}
                         THEN CAST(sum_rs_micro AS DOUBLE) / n_blocks END)
                     OVER ())
                  - ln(max(CASE WHEN w = {HURST_WINDOWS[0]}
                           THEN CAST(sum_rs_micro AS DOUBLE) / n_blocks END)
                       OVER ()))
                 / ({len(HURST_WINDOWS) - 1} * ln(2)), 4) AS hurst
    FROM per_w
    ORDER BY window_size
    """,
)
def hurst_exponent_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range analysis (Hurst 1951 /
    Mandelbrot-Wallis R/S — the long-range-dependence dial: H = 0.5
    is memoryless, H > 0.5 persistent trends, H < 0.5 mean-reverting;
    the property that decides whether daily load is forecastable and
    whether ``effective_sample_size``'s short-lag truncation is even
    adequate): for each dyadic block size w in {HURST_WINDOWS}, the
    series splits into complete blocks, each block's range of
    cumulative mean-deviations is rescaled by its own sd, block R/S
    values average per size, and H is the ln-ln slope — exactly
    (ln RS_16 − ln RS_4)/(2·ln 2) for the equally-log-spaced grid.

    Exactness: within each block the deviations clear the mean
    through w·cum_j − j·S_b (integer), so the range numerator is an
    integer and w·Q − S_b² puts the sd under one exact sqrt; each
    block's R/S quantizes to integer micro units BEFORE the per-size
    average (no float reduce); constant blocks (zero sd) drop in both
    lanes by the integer predicate; the slope is one fixed float dag
    rounded once.

    Scale: everything runs on the collapsed daily grid fanned out
    3x — windows partition by (size, block), bounded by the series,
    never the events.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("x")
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).cast("long").alias("i"),
        "x",
        F.count("*").over(w_all).cast("long").alias("n"),
    )
    grid = F.explode(F.array(*[F.lit(w).cast("long") for w in HURST_WINDOWS]))
    blocks = (
        idx.select("i", "x", "n", grid.alias("w"))
        # Integral `div` for the block index, matching the oracle's
        # `//` exactly at all magnitudes (r10 ADVICE — float `/` +
        # cast('long') truncates wrong past 2^53).
        .filter(F.expr("(i - 1) div w") < F.expr("n div w"))
        .select(
            "w",
            F.expr("(i - 1) div w").cast("long").alias("b"),
            (((F.col("i") - 1) % F.col("w")) + 1).alias("j"),
            "x",
        )
    )
    w_cum = Window.partitionBy("w", "b").orderBy("j").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_blk = Window.partitionBy("w", "b")
    z = blocks.select(
        "w",
        "b",
        (
            F.col("w") * F.sum("x").over(w_cum) - F.col("j") * F.sum("x").over(w_blk)
        )
        .cast("long")
        .alias("z_num"),
        F.sum("x").over(w_blk).cast("long").alias("sb"),
        F.sum(F.col("x") * F.col("x")).over(w_blk).cast("long").alias("qb"),
    )
    per_block = z.groupBy("w", "b").agg(
        (F.max("z_num") - F.min("z_num")).cast("long").alias("r_num"),
        F.min("sb").alias("sb"),
        F.min("qb").alias("qb"),
    )
    rs = per_block.filter(
        F.col("w") * F.col("qb") - F.col("sb") * F.col("sb") > 0
    ).select(
        "w",
        F.round(
            1_000_000.0
            * F.col("r_num")
            / F.sqrt(
                (F.col("w") * F.col("qb") - F.col("sb") * F.col("sb")).cast(
                    "double"
                )
            )
        )
        .cast("long")
        .alias("rs_micro"),
    )
    per_w = rs.groupBy("w").agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.sum("rs_micro").cast("long").alias("sum_rs_micro"),
    )
    avg = F.col("sum_rs_micro").cast("double") / F.col("n_blocks")
    hi = F.max(
        F.when(F.col("w") == HURST_WINDOWS[-1], avg)
    ).over(w_all)
    lo = F.max(
        F.when(F.col("w") == HURST_WINDOWS[0], avg)
    ).over(w_all)
    import math as _math

    return per_w.select(
        F.col("w").cast("long").alias("window_size"),
        "n_blocks",
        F.round(avg / 1_000_000.0, 4).alias("rs_avg"),
        F.round(
            (F.log(hi) - F.log(lo))
            / ((len(HURST_WINDOWS) - 1) * _math.log(2)),
            4,
        ).alias("hurst"),
    ).orderBy("window_size")


HL_WEEKS = 7  # half-life: one halving per 7 days
HL_CLAMP = 30  # clamp: weights below 2^-30 are zero-for-budgeting


@query(
    "half_life_decayed_popularity",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    mx AS (SELECT max(day) AS m FROM daily),
    w AS (
      SELECT event_type, c,
             least(date_diff('day', day, m) // {HL_WEEKS}, {HL_CLAMP})
               AS weeks_ago
      FROM daily CROSS JOIN mx
    ),
    s AS (
      SELECT event_type,
             CAST(sum(c) AS BIGINT) AS n_events,
             CAST(sum(c * (1::BIGINT << ({HL_CLAMP} - weeks_ago)))
                  AS BIGINT) AS decayed_num
      FROM w GROUP BY event_type
    ),
    tot AS (SELECT CAST(sum(decayed_num) AS BIGINT) AS t FROM s)
    SELECT event_type, n_events, decayed_num,
           round(decayed_num / CAST(1::BIGINT << {HL_CLAMP} AS DOUBLE), 6)
             AS decayed_count,
           round(CAST(decayed_num AS DOUBLE) / t, 6) AS decayed_share
    FROM s CROSS JOIN tot
    ORDER BY event_type
    """,
)
def half_life_decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-decayed popularity (the exponentially-decayed counter
    behind every trending/"hot items" surface — Cormode et al.'s
    time-decayed sketches; a {HL_WEEKS}-day half-life): each event
    contributes 2^(−weeks_ago), so last week counts double this
    metric's view of the week before, and the ranking follows
    RECENCY-weighted volume instead of all-time volume.

    Exactness: the decay base is DYADIC, so every weight is an exact
    power of two — the reduce is Σ c·2^(clamp − weeks_ago), a pure
    BIGINT shift-and-add whose numerator crosses the oracle raw (the
    Holt/EWMA dyadic idiom applied to time decay); weeks_ago is an
    integral `div` of day differences, identical in both engines;
    weights below 2^−{HL_CLAMP} clamp to the floor weight (they are
    budget-invisible anyway), which also bounds the numerator at
    n_events·2^{HL_CLAMP} — far inside BIGINT for any realistic
    corpus. The two display ratios divide once.

    Scale: one (type, day) hash agg collapses the corpus to the
    calendar grid; the decay reduce and shares are grid-sized; at
    100 TB the decayed counter is maintained incrementally by adding
    each day's partial and halving weekly — same arithmetic, same
    exactness.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    mx = daily.agg(F.max("day").alias("m"))
    w = daily.crossJoin(F.broadcast(mx)).select(
        "event_type",
        "c",
        F.least(
            F.expr(f"datediff(m, day) div {HL_WEEKS}"), F.lit(HL_CLAMP)
        ).alias("weeks_ago"),
    )
    s = w.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.sum(
            F.col("c")
            * F.expr(f"shiftleft(1L, {HL_CLAMP} - cast(weeks_ago as int))")
        )
        .cast("long")
        .alias("decayed_num"),
    )
    tot = s.agg(F.sum("decayed_num").cast("long").alias("t"))
    return (
        s.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "n_events",
            "decayed_num",
            F.round(
                F.col("decayed_num") / float(1 << HL_CLAMP), 6
            ).alias("decayed_count"),
            F.round(
                F.col("decayed_num").cast("double") / F.col("t"), 6
            ).alias("decayed_share"),
        )
        .orderBy("event_type")
    )
