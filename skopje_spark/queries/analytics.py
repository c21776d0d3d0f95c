"""Event-analytics queries: sessionization, funnels, retention cohorts.

The query shapes a product-analytics user would run through the
reference's ``fetch_stmt`` delegation (SURVEY §2B) — all window-function
compositions, no UDFs, every step shuffle-planned on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from skopje_spark.queries import register
from skopje_spark.queries.rounding import dround, dround_sql
from skopje_spark.tables import load_table

SESSION_GAP_MIN = 30


@register(
    "q_sessionize_gaps",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_no
      FROM flagged
    )
    SELECT user_id, session_no, MIN(ts) AS session_start,
           MAX(ts) AS session_end, COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    ORDER BY user_id, session_no
    """,
    tags=("analytics", "sessionize", "window"),
)
def q_sessionize_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: a session boundary is a
    > 30 min silence; session number = running sum of boundary flags.

    The window-composition alternative to the built-in session_window
    (q_window_session): works in any plain-SQL engine, keeps event
    grain available mid-query, one shuffle on user_id shared by both
    windows."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    boundary = (
        F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
        > SESSION_GAP_MIN * 60
    )
    flagged = e.withColumn(
        "new_session",
        F.when(boundary | F.lag("ts").over(w).isNull(), 1).otherwise(0),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = flagged.withColumn("session_no", F.sum("new_session").over(wrun))
    return (
        numbered.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "session_no")
    )


@register(
    "q_funnel_stages",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchase_after_click
    """,
    tags=("analytics", "funnel"),
)
def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: each stage's
    earliest qualifying event must be strictly after the previous
    stage's. Three keyed aggregates + two equi-joins on user_id — the
    shuffles co-partition, so stages pipeline on the same key."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after_click")))
    )


@register(
    "q_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events
      GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             datediff('day', f.cohort_day, CAST(e.ts AS DATE)) // 7 AS week_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           week_offset, COUNT(*) AS n_active_users
    FROM activity
    GROUP BY cohort_day, week_offset
    ORDER BY cohort_day, week_offset
    """,
    tags=("analytics", "retention", "cohort"),
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users bucketed by first-seen day,
    counted distinct per week offset. first-seen is a keyed aggregate
    joined back on user_id (co-partitioned with the activity scan)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.floor(
                F.datediff(F.to_date("ts"), F.col("cohort_day")) / 7
            ).alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "week_offset",
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .orderBy("cohort_day", "week_offset")
    )


@register(
    "q_fill_forward",
    oracle="""
    SELECT user_id, event_id,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value
    FROM events
    """,
    tags=("analytics", "window", "gapfill"),
)
def q_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (LOCF — last observation carried forward): every
    event carries the value of the user's most recent *purchase*,
    null until the first one. `last(..., ignorenulls)` over a running
    row frame — the standard sparse-to-dense imputation for feature
    timelines and slowly-updating reference values.

    Scale: one shuffle on user_id (shared shape with the other event
    windows), running frame evaluated in a single pass per partition.
    """
    e = load_table(spark, sf_dir, "events")
    obs = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.last(obs, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


@register(
    "q_ewma_smoothing",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT a.user_id, a.event_id,
           {dround_sql(
               "SUM(CASE WHEN b.rn = 1 THEN POWER(0.8, a.rn - 1) * b.value "
               "ELSE 0.2 * POWER(0.8, a.rn - b.rn) * b.value END)", 6)}
             AS ewma_val
    FROM seq a JOIN seq b ON a.user_id = b.user_id AND b.rn <= a.rn
    GROUP BY a.user_id, a.event_id
    """,
    tags=("analytics", "ewma", "timeseries", "udaf"),
)
def q_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values over time (α = 0.2,
    operators/stats.py:ewma — Arrow applyInPandas recurrence, one
    shuffle on the key). The oracle expands the recurrence into its
    closed-form weighted sum (y_i = (1-α)^i·x_0 + Σ α(1-α)^(i-j)x_j)
    with a per-user self-join — an independent derivation, so a wrong
    fold order or α handling mismatches; float drift between the
    recurrence and the closed form is dround-absorbed."""
    from skopje_spark.operators.stats import ewma

    ev = load_table(spark, sf_dir, "events")
    sm = ewma(
        ev, ["user_id"], ["ts", "event_id"], "value", alpha=0.2, out_col="ewma_raw"
    )
    return sm.select(
        "user_id", "event_id", dround(F.col("ewma_raw"), 6).alias("ewma_val")
    )


@register(
    "q_outlier_mad",
    oracle=f"""
    WITH med AS (
      SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
      FROM lineitem GROUP BY l_returnflag
    ),
    dev AS (
      SELECT l.l_returnflag, l.l_extendedprice, med.med,
             ABS(l.l_extendedprice - med.med) AS adev
      FROM lineitem l JOIN med USING (l_returnflag)
    ),
    mad AS (
      SELECT l_returnflag, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY l_returnflag
    )
    SELECT dev.l_returnflag,
           {dround_sql('ANY_VALUE(dev.med)', 2)} AS med,
           {dround_sql('ANY_VALUE(mad.mad)', 2)} AS mad,
           COUNT(*) FILTER (
             WHERE {dround_sql('dev.adev', 6)}
                   > {dround_sql('3 * 1.4826 * mad.mad', 6)}
           ) AS n_outliers,
           COUNT(*) AS n_rows
    FROM dev JOIN mad USING (l_returnflag)
    GROUP BY dev.l_returnflag
    """,
    tags=("analytics", "outlier", "mad", "robust-stats"),
)
def q_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation: per
    group, med = median(x), mad = median(|x − med|), outlier ⇔
    |x − med| > 3·1.4826·mad (1.4826 scales MAD to σ under
    normality). The robust alternative to z-scores — one extreme
    value cannot drag the threshold. Two scans of the corpus (the
    inherent two passes: one to reach each percentile stage), with
    the tiny per-group med/mad tables localCheckpointed so neither
    percentile subtree is re-derived by a later branch; at scale swap
    the exact medians for the KLL sketch path (operators/sketches.py)
    without changing the contract. Both the deviation and the
    threshold are rounded to 6 dp BEFORE the comparison, so the
    outlier count cannot desync on a last-ulp interpolation
    difference between the engines' percentile implementations."""
    l = load_table(spark, sf_dir, "lineitem")
    med = (
        l.groupBy("l_returnflag")
        .agg(F.percentile("l_extendedprice", 0.5).alias("med"))
        .localCheckpoint(eager=True)  # G rows; reused by both passes
    )
    dev = l.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag",
        "med",
        F.abs(F.col("l_extendedprice") - F.col("med")).alias("adev"),
    )
    mad = (
        dev.groupBy("l_returnflag")
        .agg(F.percentile("adev", 0.5).alias("mad"))
        .localCheckpoint(eager=True)  # G rows
    )
    return (
        dev.join(F.broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            dround(F.first("med"), 2).alias("med"),
            dround(F.first("mad"), 2).alias("mad"),
            F.count_if(
                dround(F.col("adev"), 6)
                > dround(F.lit(3.0) * F.lit(1.4826) * F.col("mad"), 6)
            ).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q_feature_standardize",
    oracle=f"""
    WITH stats AS (
      SELECT l_returnflag,
             AVG(l_extendedprice) AS mu,
             stddev_samp(l_extendedprice) AS sigma
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_orderkey, l.l_linenumber,
           {dround_sql('(l.l_extendedprice - stats.mu) / stats.sigma', 6)} AS price_z
    FROM lineitem l JOIN stats USING (l_returnflag)
    """,
    tags=("analytics", "standardize", "zscore", "feature-prep"),
)
def q_feature_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise z-score standardization — the feature-prep
    transform applied before any distance-based model sees a column:
    one tiny per-group (mu, sigma) aggregate broadcast back onto the
    rows, a narrow map afterwards. Spark avg/stddev_samp and DuckDB's
    agree to the last few ulps; the emitted z is rounded once."""
    l = load_table(spark, sf_dir, "lineitem")
    stats = l.groupBy("l_returnflag").agg(
        F.avg("l_extendedprice").alias("mu"),
        F.stddev_samp("l_extendedprice").alias("sigma"),
    )
    return l.join(F.broadcast(stats), "l_returnflag").select(
        "l_orderkey",
        "l_linenumber",
        dround(
            (F.col("l_extendedprice") - F.col("mu")) / F.col("sigma"), 6
        ).alias("price_z"),
    )


@register(
    "q_event_transitions",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    pairs AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n,
           {dround_sql('CAST(n AS DOUBLE)'
                       ' / SUM(n) OVER (PARTITION BY prev_type)', 6)} AS p
    FROM pairs ORDER BY prev_type, next_type
    """,
    tags=("analytics", "markov", "transitions", "window"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: (prev_type → next_type) counts and row-normalized
    probabilities — the "what do users do next" report and the input
    to any sequence-model sanity check on behavioral data.

    Plan: ONE shuffle on user_id for the lag window (same key every
    event query here shares), then a map-side-combined count whose
    output is |types|² rows; the probability normalization windows
    over that tiny aggregate, not the events. Ordering ties broken by
    event_id so both engines see the same sequence."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        dround(F.col("n").cast("double") / F.sum("n").over(wp), 6).alias("p"),
    ).orderBy("prev_type", "next_type")


@register(
    "q_funnel_timing",
    oracle=f"""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    conv AS (
      SELECT v.user_id,
             epoch_us(CAST(v.t1 AS TIMESTAMP)) AS u1,
             epoch_us(CAST(c.t2 AS TIMESTAMP)) AS u2,
             epoch_us(CAST(p.t3 AS TIMESTAMP)) AS u3
      FROM v JOIN c ON v.user_id = c.user_id
             JOIN p ON v.user_id = p.user_id
    )
    SELECT COUNT(*) AS n_converted,
           {dround_sql('SUM(u2 - u1) / COUNT(*) / 1000000.0', 6)}
             AS avg_view_to_click_s,
           {dround_sql('SUM(u3 - u2) / COUNT(*) / 1000000.0', 6)}
             AS avg_click_to_purchase_s
    FROM conv
    """,
    tags=("analytics", "funnel", "timing"),
)
def q_funnel_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert for the full view → click → purchase funnel:
    mean stage delays over CONVERTING users only. Determinism across
    engines without trusting double summation order: delays are exact
    integer MICROSECONDS (``unix_micros`` ≡ DuckDB ``epoch_us``),
    summed as bigints (order-independent), divided once, rounded
    once. The three stage aggregates reuse q_funnel_stages' shape —
    all shuffles co-partition on user_id."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    conv = (
        v.join(c, "user_id").join(p, "user_id")
        .select(
            (F.unix_micros("t2") - F.unix_micros("t1")).alias("d12"),
            (F.unix_micros("t3") - F.unix_micros("t2")).alias("d23"),
        )
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        dround(
            F.sum("d12") / F.count(F.lit(1)) / F.lit(1000000.0), 6
        ).alias("avg_view_to_click_s"),
        dround(
            F.sum("d23") / F.count(F.lit(1)) / F.lit(1000000.0), 6
        ).alias("avg_click_to_purchase_s"),
    )
