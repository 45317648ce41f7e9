"""Time-window and temporal-join queries over the ``events`` table.

These are the batch twins of the Structured Streaming operators in
:mod:`sinker_spark.streaming` — Spark's ``window``/``session_window``
functions are identical in batch and streaming plans (only watermarks and
state stores differ), so the DuckDB oracle validates the exact windowing
semantics the streaming layer uses. The reference itself has no window
operators (SURVEY.md §2, "absent categories") — its poll loop recomputes
whole views — but its view language (full Postgres SQL) includes them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sinker_spark.catalog import load_tables
from sinker_spark.operators.asof import asof_join
from sinker_spark.queries import query
from sinker_spark.queries.helpers import dsum, dsum_expr


@query(
    "tumbling_hourly_events",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M') AS hour_start,
           event_type,
           COUNT(*) AS n_events,
           {dsum_expr('value')} AS sum_value
    FROM events GROUP BY 1, 2""",
    doc="tumbling window agg (Spark window(); streaming twin adds withWatermark) — hour × event_type",
    tags=("window-tumbling",),
)
def tumbling_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "sliding_window_events",
    oracle="""
    WITH starts AS (
      SELECT event_id, ts,
             unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE]) AS w_start
      FROM events
    )
    SELECT strftime(w_start, '%Y-%m-%d %H:%M') AS window_start, COUNT(*) AS n_events
    FROM starts
    WHERE ts >= w_start AND ts < w_start + INTERVAL 60 MINUTE
    GROUP BY 1""",
    doc="sliding window (1h window / 30min slide): each event lands in 2 windows; Spark window() with slideDuration",
    tags=("window-sliding",),
)
def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"), "n_events")
    )


@query(
    "session_windows_per_user",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, 1)
    ), numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_no""",
    doc="session windows (30min gap): Spark session_window(); oracle via gaps-and-islands. Session end = last event + gap (Spark semantics)",
    tags=("window-session",),
)
def session_windows_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


@query(
    "asof_last_signup_before_purchase",
    oracle="""
    SELECT p.event_id, p.user_id,
           strftime((SELECT MAX(s.ts) FROM events s
                     WHERE s.user_id = p.user_id AND s.event_type = 'signup'
                       AND s.ts <= p.ts), '%Y-%m-%d %H:%M:%S') AS asof_ts_s
    FROM events p WHERE p.event_type = 'purchase'""",
    doc="as-of join (operators/asof.py): for each purchase, the user's most recent signup at-or-before it; one shuffle + carry-forward window instead of a correlated per-row lookup",
    tags=("join-asof",),
)
def asof_last_signup_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    signups = ev.where(F.col("event_type") == "signup").select("user_id", "ts")
    joined = asof_join(purchases, signups, key="user_id", left_ts="ts", right_ts="ts")
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss").alias("asof_ts_s"),
    )


@query(
    "latest_event_per_user_type",
    oracle="""
    SELECT user_id, event_type, event_id, value FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) t WHERE rn = 1""",
    doc="streaming last-write-wins compaction (A15 max-LSN-per-id pattern, bulk_action_generator.py:37-38 ordering semantics) as a batch query",
    tags=("streaming-semantics", "B16"),
)
def latest_event_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
    )


_GAPFILL_SPARK = """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE)
               / CAST(COUNT(value) AS DOUBLE) AS v
      FROM events WHERE user_id < 50 GROUP BY user_id, date_trunc('hour', ts)),
    spine AS (
      SELECT user_id, explode(sequence(mn, mx, INTERVAL 1 HOUR)) AS h
      FROM (SELECT user_id, MIN(h) AS mn, MAX(h) AS mx
            FROM hourly GROUP BY user_id)),
    joined AS (
      SELECT s.user_id, s.h, hr.v FROM spine s
      LEFT JOIN hourly hr ON s.user_id = hr.user_id AND s.h = hr.h)
    SELECT user_id, date_format(h, 'yyyy-MM-dd HH:mm') AS hour_start,
           ROUND(last_value(v) IGNORE NULLS OVER (
             PARTITION BY user_id ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v_locf,
           v IS NULL AS was_gap
    FROM joined"""

_GAPFILL_ORACLE = """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE)
               / CAST(COUNT(value) AS DOUBLE) AS v
      FROM events WHERE user_id < 50 GROUP BY user_id, date_trunc('hour', ts)),
    spine AS (
      SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
      FROM (SELECT user_id, MIN(h) AS mn, MAX(h) AS mx
            FROM hourly GROUP BY user_id)),
    joined AS (
      SELECT s.user_id, s.h, hr.v FROM spine s
      LEFT JOIN hourly hr ON s.user_id = hr.user_id AND s.h = hr.h)
    SELECT user_id, strftime(h, '%Y-%m-%d %H:%M') AS hour_start,
           ROUND(last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v_locf,
           v IS NULL AS was_gap
    FROM joined"""


def _register_gapfill():
    from sinker_spark.catalog import register_views

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_GAPFILL_SPARK)

    fn.__name__ = "gapfill_locf_hourly"
    query(
        "gapfill_locf_hourly",
        oracle=_GAPFILL_ORACLE,
        doc=(
            "hypertable-style gap filling: per-user hourly spine "
            "(sequence+explode between each user's first and last active "
            "hour) left-joined to hourly averages, gaps filled by "
            "last-observation-carried-forward (last_value IGNORE NULLS "
            "over a running frame) with a was_gap marker — the "
            "time_bucket_gapfill/locf pattern; spine generation is "
            "per-user and the fill window shuffles once on user_id"
        ),
        tags=("gapfill", "locf", "window-value", "hypertable"),
    )(fn)


_register_gapfill()


@query(
    "ts_subsequence_match",
    oracle="""
    WITH wins AS (
      SELECT user_id, ts, event_id,
             list(CAST(value AS DOUBLE)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS win
      FROM events),
    f AS (SELECT user_id, ts, event_id, win FROM wins WHERE len(win) = 8),
    m1 AS (SELECT user_id, ts, event_id, win,
                  list_reduce(win, (a, b) -> a + b) / 8 AS m FROM f),
    m2 AS (SELECT user_id, ts, event_id, win, m,
                  sqrt(list_reduce(list_transform(win, x -> (x - m) * (x - m)),
                                   (a, b) -> a + b) / 8) AS s
           FROM m1),
    p1 AS (SELECT CAST([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0] AS DOUBLE[]) AS pat,
                  list_reduce(CAST([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0] AS DOUBLE[]),
                              (a, b) -> a + b) / 8 AS pm),
    p2 AS (SELECT pat, pm,
                  sqrt(list_reduce(list_transform(pat, x -> (x - pm) * (x - pm)),
                                   (a, b) -> a + b) / 8) AS ps
           FROM p1)
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, event_id,
           round(sqrt(list_reduce(
             list_transform(range(1, 9),
               i -> ((win[i] - m) / s - (pat[i] - pm) / ps)
                  * ((win[i] - m) / s - (pat[i] - pm) / ps)),
             (a, b) -> a + b)), 6) AS zdist
    FROM m2 CROSS JOIN p2
    WHERE s > 0
    ORDER BY zdist, user_id, ts, event_id
    LIMIT 20""",
    doc=(
        "time-series subsequence similarity search (operators/timeseries."
        "sliding_znorm_match; EDBT'19 streaming-similarity shape): top-20 "
        "8-point sliding windows per user series closest to an up-trend "
        "pattern under z-normalized Euclidean distance — one key shuffle, "
        "HOF distance folds in codegen, TakeOrderedAndProject top-k; "
        "bit-identical fold order on both engines"
    ),
    tags=("timeseries", "similarity-subsequence", "window-frame", "hof"),
)
def ts_subsequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sinker_spark.operators.timeseries import sliding_znorm_match

    t = load_tables(spark, sf_dir)
    out = sliding_znorm_match(t["events"], [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0], k=20)
    return out.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "event_id",
        "zdist",
    )


@query(
    "scd2_user_event_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS NULL
                       OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    versioned AS (
      SELECT user_id, event_type, ts,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS version
      FROM ordered
    ),
    runs AS (
      SELECT user_id, CAST(version AS INT) AS version,
             MIN(event_type) AS event_type,
             MIN(ts) AS vf, CAST(COUNT(*) AS INT) AS n_events
      FROM versioned GROUP BY user_id, version
    )
    SELECT user_id, version, event_type,
           strftime(vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           strftime(lead(vf) OVER (PARTITION BY user_id ORDER BY version),
                    '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
           lead(vf) OVER (PARTITION BY user_id ORDER BY version) IS NULL AS is_current,
           n_events
    FROM runs""",
    doc=(
        "SCD Type-2 reconstruction from an event log: consecutive "
        "same-value runs collapse into versioned validity intervals "
        "(valid_from, valid_to, is_current) per user — the warehouse "
        "history-table shape the CDC lanes feed; two windows + one "
        "aggregation, all partitioned by the entity key (one shuffle)"
    ),
    tags=("scd2", "window-frames", "cdc"),
)
def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        1,
    ).otherwise(0)
    versioned = t["events"].select(
        "user_id", "event_type", "ts", F.sum(chg).over(w).alias("version")
    )
    runs = versioned.groupBy("user_id", "version").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts").alias("vf"),
        F.count("*").cast("int").alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return runs.select(
        "user_id",
        F.col("version").cast("int").alias("version"),
        "event_type",
        F.date_format("vf", fmt).alias("valid_from"),
        F.date_format(F.lead("vf").over(wv), fmt).alias("valid_to"),
        F.lead("vf").over(wv).isNull().alias("is_current"),
        "n_events",
    )


@query(
    "cohort_retention_matrix",
    oracle="""
    WITH signup AS (
      SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
    )
    SELECT strftime(s.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', s.cohort_week, a.week) / 7 AS INT) AS weeks_since,
           CAST(COUNT(DISTINCT s.user_id) AS BIGINT) AS n_active
    FROM signup s JOIN activity a ON a.user_id = s.user_id
    WHERE a.week >= s.cohort_week
    GROUP BY s.cohort_week, weeks_since""",
    doc=(
        "cohort retention matrix: users cohorted by first-signup week, "
        "counted distinct in each subsequent activity week — the classic "
        "product-analytics rollup; signup side is one filtered aggregation, "
        "activity side a distinct projection, one join on the user key "
        "(both engines truncate weeks to Monday)"
    ),
    tags=("cohort", "retention", "funnel"),
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    signup = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.date_trunc("week", "ts")).alias("cohort_week"))
    )
    activity = ev.select("user_id", F.date_trunc("week", "ts").alias("week")).distinct()
    return (
        signup.join(activity, "user_id")
        .where(F.col("week") >= F.col("cohort_week"))
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("int").alias("weeks_since"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


from sinker_spark.catalog import register_views  # noqa: E402


def _sql(name: str, spark_sql: str, oracle: str, doc: str = "", tags: tuple[str, ...] = ()):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(spark_sql)

    fn.__name__ = name
    fn.__doc__ = doc
    query(name, oracle=oracle, doc=doc, tags=tags)(fn)
    return fn


# --- linear interpolation between surrounding observations ---------------
# The gap-fill sibling beyond LOCF: each purchase event gets the value
# linearly interpolated between the user's surrounding click events.
# Shape identical in both engines (one user-keyed window shuffle); only
# the IGNORE NULLS placement and epoch spelling differ, so the two texts
# are generated from one template.

_INTERP_BODY = """
    WITH e AS (
      SELECT event_id, user_id, event_type, value, {epoch} AS t
      FROM events),
    w AS (
      SELECT event_id, user_id, event_type, t,
             {lv_t} OVER wprev AS prev_t,
             {lv_v} OVER wprev AS prev_v,
             {fv_t} OVER wnext AS next_t,
             {fv_v} OVER wnext AS next_v
      FROM e
      WINDOW wprev AS (PARTITION BY user_id ORDER BY t, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             wnext AS (PARTITION BY user_id ORDER BY t, event_id
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
    SELECT event_id, user_id,
           ROUND(prev_v + (next_v - prev_v)
                 * (CAST(t - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE)), 6)
             AS interp_value
    FROM w
    WHERE event_type = 'purchase' AND prev_t IS NOT NULL AND next_t IS NOT NULL
"""

_CLICK_T = "CASE WHEN event_type = 'click' THEN t END"
_CLICK_V = "CASE WHEN event_type = 'click' THEN value END"

_sql(
    "interpolate_purchase_values",
    spark_sql=_INTERP_BODY.format(
        epoch="unix_micros(CAST(ts AS TIMESTAMP))",
        lv_t=f"last_value({_CLICK_T}) IGNORE NULLS",
        lv_v=f"last_value({_CLICK_V}) IGNORE NULLS",
        fv_t=f"first_value({_CLICK_T}) IGNORE NULLS",
        fv_v=f"first_value({_CLICK_V}) IGNORE NULLS",
    ),
    oracle=_INTERP_BODY.format(
        epoch="epoch_us(ts)",
        lv_t=f"last_value({_CLICK_T} IGNORE NULLS)",
        lv_v=f"last_value({_CLICK_V} IGNORE NULLS)",
        fv_t=f"first_value({_CLICK_T} IGNORE NULLS)",
        fv_v=f"first_value({_CLICK_V} IGNORE NULLS)",
    ),
    doc=(
        "linear interpolation across event gaps (the LOCF lane's exact "
        "sibling): each purchase gets the value interpolated between the "
        "user's surrounding clicks — IGNORE-NULLS frame windows find both "
        "neighbors in ONE user-keyed shuffle (no self-join, no explode); "
        "the interpolation fraction is integer-microsecond arithmetic "
        "(unix_micros ≡ DuckDB epoch_us, exact) with one rounded IEEE "
        "multiply-add"
    ),
    tags=("timeseries-interpolate", "window-frames", "gap-fill"),
)


@query(
    "markov_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    c AS (
      SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    ),
    tot AS (SELECT event_type, SUM(n) AS t FROM c GROUP BY event_type)
    SELECT c.event_type, c.next_type, c.n,
           round(CAST(c.n AS DOUBLE) / tot.t, 6) AS p
    FROM c JOIN tot ON c.event_type = tot.event_type""",
    doc=(
        "first-order Markov transition matrix over user event streams: "
        "P(next event type | current), from per-user lead() sequences "
        "(ties broken by event_id so the sequence is deterministic). One "
        "user-keyed window shuffle + a type×type aggregate (≤ |types|² "
        "rows at any scale); integer counts divide to identical doubles "
        "in both engines. The sequence-mining/product-analytics lane: "
        "churn paths, funnel leakage, next-action prediction priors"
    ),
    tags=("sequence-mining", "markov", "window", "temporal"),
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t["events"].select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    c = seq.groupBy("event_type", "next_type").agg(F.count("*").cast("bigint").alias("n"))
    tot = c.groupBy("event_type").agg(F.sum("n").alias("t"))
    return c.join(tot, "event_type").select(
        "event_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("t"), 6).alias("p"),
    )


@query(
    "kaplan_meier_signup_to_purchase",
    oracle="""
    WITH su AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    pu AS (
      SELECT s.user_id, MIN(e.ts) AS purchase_ts
      FROM su s JOIN events e ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
      GROUP BY s.user_id
    ),
    last_seen AS (
      SELECT user_id, MAX(ts) AS last_ts FROM events GROUP BY user_id
    ),
    subj AS (
      SELECT su.user_id,
             CASE WHEN pu.purchase_ts IS NOT NULL THEN 1 ELSE 0 END AS event,
             CAST(date_diff('second', su.signup_ts,
                            coalesce(pu.purchase_ts, last_seen.last_ts)) // 3600 AS BIGINT) AS t
      FROM su LEFT JOIN pu ON su.user_id = pu.user_id
      JOIN last_seen ON su.user_id = last_seen.user_id
    ),
    tab AS (
      SELECT t, CAST(SUM(event) AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS removed
      FROM subj GROUP BY t
    ),
    risk AS (
      SELECT t, d,
             (SELECT COUNT(*) FROM subj) -
             coalesce(SUM(removed) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
      FROM tab
    ),
    km AS (
      SELECT t, d, n_risk,
             SUM(CASE WHEN d >= n_risk THEN NULL
                      ELSE CAST(round(ln(1.0 - CAST(d AS DOUBLE) / n_risk), 12) AS DECIMAL(28,12)) END)
               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS log_s,
             MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hit_zero
      FROM risk
    )
    SELECT t AS hours_since_signup, n_risk, d AS n_events,
           CASE WHEN hit_zero = 1 THEN 0.0
                ELSE round(exp(CAST(log_s AS DOUBLE)), 6) END AS survival
    FROM km WHERE d > 0""",
    doc=(
        "Kaplan–Meier survival estimator for signup→first-purchase with "
        "right-censoring (never-purchasers censored at last activity): "
        "S(t) = Π(1 − d/n_risk) over event times. Determinism: each "
        "factor's ln rounds to 12 and accumulates as an ordered DECIMAL "
        "running sum (exact), exp+round(6) at the end — libm ulp drift "
        "never survives; the terminal all-convert time (factor 0) short-"
        "circuits to survival 0 instead of ln(0). The time-to-event lane (conversion "
        "curves, churn hazard); the ordered relation is distinct "
        "durations (bounded by the observation window in hours), not "
        "users, so the window is small at any user count"
    ),
    tags=("survival", "stats", "temporal", "funnel"),
)
def kaplan_meier_signup_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    su = ev.where(F.col("event_type") == "signup").groupBy("user_id").agg(F.min("ts").alias("signup_ts"))
    pu = (
        su.join(ev, "user_id")
        .where((F.col("event_type") == "purchase") & (F.col("ts") >= F.col("signup_ts")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    last_seen = ev.groupBy("user_id").agg(F.max("ts").alias("last_ts"))
    subj = (
        su.join(pu, "user_id", "left")
        .join(last_seen, "user_id")
        .select(
            F.when(F.col("purchase_ts").isNotNull(), 1).otherwise(0).alias("event"),
            (
                (
                    F.unix_timestamp(F.coalesce("purchase_ts", "last_ts"))
                    - F.unix_timestamp("signup_ts")
                )
                / 3600
            )
            .cast("bigint")
            .alias("t"),
        )
    )
    total = subj.count()
    tab = subj.groupBy("t").agg(
        F.sum("event").cast("bigint").alias("d"),
        F.count("*").cast("bigint").alias("removed"),
    )
    prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = tab.select(
        "t",
        "d",
        (F.lit(total) - F.coalesce(F.sum("removed").over(prev), F.lit(0))).alias("n_risk"),
    )
    cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    term = F.when(F.col("d") >= F.col("n_risk"), F.lit(None)).otherwise(
        F.round(F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")), 12).cast(
            "DECIMAL(28,12)"
        )
    )
    km = risk.select(
        "t",
        "d",
        "n_risk",
        F.sum(term).over(cum).alias("log_s"),
        F.max(F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)).over(cum).alias("hit_zero"),
    )
    return km.where(F.col("d") > 0).select(
        F.col("t").alias("hours_since_signup"),
        "n_risk",
        F.col("d").alias("n_events"),
        F.when(F.col("hit_zero") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("log_s").cast("double")), 6))
        .alias("survival"),
    )


@query(
    "event_path_trigrams",
    oracle="""
    WITH seq AS (
      SELECT event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
      SELECT e1 || '>' || e2 || '>' || e3 AS path, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS t FROM paths)
    SELECT path, n, round(CAST(n AS DOUBLE) / tot.t, 6) AS share
    FROM paths CROSS JOIN tot""",
    doc=(
        "behavioral path mining: every 3-event path a user walks "
        "(deterministic per-user order: ts then event_id) with counts "
        "and corpus share — the higher-order companion of the Markov "
        "transition lane, feeding journey analysis and funnel design. "
        "One user-keyed window shuffle; the path relation is ≤ |types|³ "
        "rows at any event volume"
    ),
    tags=("sequence-mining", "paths", "window", "temporal"),
)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t["events"].select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    paths = seq.groupBy(
        F.concat_ws(">", "e1", "e2", "e3").alias("path")
    ).agg(F.count("*").cast("bigint").alias("n"))
    tot = paths.agg(F.sum("n").alias("t"))
    return paths.crossJoin(F.broadcast(tot)).select(
        "path", "n", F.round(F.col("n").cast("double") / F.col("t"), 6).alias("share")
    )


@query(
    "interevent_burstiness",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             CAST(date_diff('second',
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS BIGINT) AS gap_s
      FROM events
    ),
    m AS (
      SELECT user_id,
             CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
             CAST(SUM(gap_s) AS BIGINT) AS s1,
             CAST(SUM(gap_s * gap_s) AS BIGINT) AS s2
      FROM gaps WHERE gap_s IS NOT NULL
      GROUP BY user_id HAVING COUNT(gap_s) >= 2
    )
    SELECT user_id, n_gaps,
           round(CAST(s1 AS DOUBLE) / n_gaps, 6) AS mean_gap_s,
           round(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_gaps) / (n_gaps - 1)), 6) AS sd_gap_s,
           round((sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_gaps) / (n_gaps - 1))
                  - CAST(s1 AS DOUBLE) / n_gaps)
                 / (sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_gaps) / (n_gaps - 1))
                    + CAST(s1 AS DOUBLE) / n_gaps), 6) AS burstiness
    FROM m""",
    doc=(
        "inter-event burstiness per user (Goh & Barabási 2008): "
        "B = (σ−μ)/(σ+μ) of the gaps between consecutive events — "
        "B→−1 periodic, ≈0 Poisson, →1 bursty; separates bot-like "
        "regular traffic from human bursts. Integer second-gaps keep "
        "the moment sums exact (one lag window on the user key, then "
        "identical IEEE arithmetic in both engines)"
    ),
    tags=("temporal", "stats", "burstiness", "window"),
)
def interevent_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = t["events"].select(
        "user_id",
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).cast("bigint").alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    m = (
        gaps.groupBy("user_id")
        .agg(
            F.count("gap_s").cast("bigint").alias("n_gaps"),
            F.sum("gap_s").cast("bigint").alias("s1"),
            F.sum(F.col("gap_s") * F.col("gap_s")).cast("bigint").alias("s2"),
        )
        .where(F.col("n_gaps") >= 2)
    )
    mean = F.col("s1").cast("double") / F.col("n_gaps")
    var = (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("n_gaps")) / (
        F.col("n_gaps") - 1
    )
    sd = F.sqrt(var)
    return m.select(
        "user_id",
        "n_gaps",
        F.round(mean, 6).alias("mean_gap_s"),
        F.round(sd, 6).alias("sd_gap_s"),
        F.round((sd - mean) / (sd + mean), 6).alias("burstiness"),
    )


@query(
    "acf_daily_orders",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT l AS lag, d.x AS x0, d2.x AS x1
      FROM daily d
      CROSS JOIN (SELECT unnest([1, 2, 3]) AS l) lags
      JOIN daily d2 ON d2.d = d.d + CAST(lags.l AS INT)
    ),
    m AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x0) AS BIGINT) AS s0, CAST(SUM(x1) AS BIGINT) AS s1,
             CAST(SUM(x0 * x1) AS BIGINT) AS s01,
             CAST(SUM(x0 * x0) AS BIGINT) AS s00, CAST(SUM(x1 * x1) AS BIGINT) AS s11
      FROM lagged GROUP BY lag
    )
    SELECT CAST(lag AS INT) AS lag, n,
           round((CAST(n AS DOUBLE) * s01 - CAST(s0 AS DOUBLE) * s1)
                 / (sqrt(CAST(n AS DOUBLE) * s00 - CAST(s0 AS DOUBLE) * s0)
                    * sqrt(CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1)), 6) AS acf
    FROM m""",
    doc=(
        "autocorrelation of the daily order-count series at lags 1-3 "
        "(Pearson of (x_t, x_{t+lag}) pairs via a self-join on the date "
        "spine): the canonical seasonality/trend screen before any "
        "forecasting. Integer counts keep all five sums exact until the "
        "final correlation arithmetic; the daily relation is bounded by "
        "the calendar, not the fact volume"
    ),
    tags=("temporal", "timeseries", "stats", "acf"),
)
def acf_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    daily = (
        t["orders"]
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count("*").cast("bigint").alias("x"))
    )
    lags = spark.range(1, 4).select(F.col("id").cast("int").alias("lag"))
    d0 = daily.select("d", F.col("x").alias("x0"))
    d1 = daily.select(F.col("d").alias("d1"), F.col("x").alias("x1"))
    lagged = (
        d0.crossJoin(F.broadcast(lags))
        .join(d1, F.expr("d1 = date_add(d, lag)"))
    )
    m = lagged.groupBy("lag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x0").cast("bigint").alias("s0"),
        F.sum("x1").cast("bigint").alias("s1"),
        F.sum(F.col("x0") * F.col("x1")).cast("bigint").alias("s01"),
        F.sum(F.col("x0") * F.col("x0")).cast("bigint").alias("s00"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").alias("s11"),
    )
    nd = F.col("n").cast("double")
    acf = (nd * F.col("s01") - F.col("s0").cast("double") * F.col("s1")) / (
        F.sqrt(nd * F.col("s00") - F.col("s0").cast("double") * F.col("s0"))
        * F.sqrt(nd * F.col("s11") - F.col("s1").cast("double") * F.col("s1"))
    )
    return m.select("lag", "n", F.round(acf, 6).alias("acf"))


@query(
    "cusum_order_volume_drift",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    target AS (
      -- reference level + slack: k = ceil(mean) computed as integers
      SELECT (SUM(x) + COUNT(*) - 1) // COUNT(*) AS k FROM daily
    ),
    cum AS (
      SELECT d, x,
             SUM(x - target.k) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM daily CROSS JOIN target
    ),
    s AS (
      -- CUSUM⁺ via the prefix-min identity: S_t = c_t − min_{i≤t} c_i
      SELECT d, x, c - LEAST(MIN(c) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS s_plus
      FROM cum
    ),
    h AS (SELECT 5 * k AS h FROM target)
    SELECT CAST(s.d AS VARCHAR) AS day, s.x AS n_orders,
           CAST(s.s_plus AS BIGINT) AS cusum_plus,
           (s.s_plus > h.h) AS drifted
    FROM s CROSS JOIN h""",
    doc=(
        "CUSUM upward-drift detection on daily order volume: the "
        "sequential recursion S_t = max(0, S_{t−1} + x_t − k) rewritten "
        "as the window-expressible prefix-min identity S_t = c_t − "
        "min(0, min_{i≤t} c_i) over the cumulative (x−k) sum — pure "
        "integer arithmetic on a calendar-bounded relation, alarm at "
        "S > 5k. The change-point sibling of the KL/chi²/KS drift "
        "lanes for MONITORING a stream's level rather than comparing "
        "two snapshots"
    ),
    tags=("temporal", "timeseries", "drift", "cusum", "window"),
)
def cusum_order_volume_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    daily = (
        t["orders"]
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count("*").cast("bigint").alias("x"))
    )
    target = daily.agg(
        ((F.sum("x") + F.count("*") - 1) / F.count("*")).cast("bigint").alias("k")
    )
    cum_w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = daily.crossJoin(F.broadcast(target)).select(
        "d", "x", "k", F.sum(F.col("x") - F.col("k")).over(cum_w).alias("c")
    )
    s = cum.select(
        "d",
        "x",
        "k",
        (F.col("c") - F.least(F.min("c").over(cum_w), F.lit(0))).alias("s_plus"),
    )
    return s.select(
        F.col("d").cast("string").alias("day"),
        F.col("x").alias("n_orders"),
        F.col("s_plus").cast("bigint").alias("cusum_plus"),
        (F.col("s_plus") > 5 * F.col("k")).alias("drifted"),
    )


@query(
    "runs_test_daily_orders",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    lvl AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(x) AS BIGINT) AS total FROM daily),
    signs AS (
      -- above/below the MEAN level, compared in integers (x·nd > total)
      SELECT d, CASE WHEN x * lvl.nd > lvl.total THEN 1 ELSE 0 END AS above
      FROM daily CROSS JOIN lvl
    ),
    runs AS (
      SELECT CAST(SUM(CASE WHEN above <> lag_above OR lag_above IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS r,
             CAST(SUM(above) AS BIGINT) AS n1,
             CAST(SUM(1 - above) AS BIGINT) AS n2
      FROM (SELECT above, lag(above) OVER (ORDER BY d) AS lag_above FROM signs) s
    )
    SELECT r AS n_runs, n1 AS n_above, n2 AS n_below,
           round(1.0 + 2.0 * n1 * n2 / (CAST(n1 AS DOUBLE) + n2), 6) AS expected_runs,
           round((r - (1.0 + 2.0 * n1 * n2 / (CAST(n1 AS DOUBLE) + n2)))
                 / sqrt((2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2))
                        / ((CAST(n1 AS DOUBLE) + n2) * (CAST(n1 AS DOUBLE) + n2) * (n1 + n2 - 1.0))), 6) AS z
    FROM runs""",
    doc=(
        "Wald–Wolfowitz runs test on the daily order-count series "
        "(above/below the exact mean level, compared in integers as "
        "x·n_days > total so no day is dropped and both sides are "
        "non-empty on any non-constant series): too "
        "few runs ⇒ trending/clustered, too many ⇒ oscillating — the "
        "randomness screen complementing ACF/CUSUM. Run counting is one "
        "lag over the calendar-bounded series; everything is integer "
        "until the closed-form mean/variance of the run count"
    ),
    tags=("temporal", "stats", "hypothesis-test", "timeseries"),
)
def runs_test_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    daily = (
        t["orders"]
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count("*").cast("bigint").alias("x"))
    )
    lvl = daily.agg(
        F.count("*").cast("bigint").alias("nd"), F.sum("x").cast("bigint").alias("total")
    )
    signs = (
        daily.crossJoin(F.broadcast(lvl))
        .select(
            "d",
            F.when(F.col("x") * F.col("nd") > F.col("total"), 1).otherwise(0).alias("above"),
        )
    )
    lw = Window.orderBy("d")
    runs = signs.select("above", F.lag("above").over(lw).alias("lag_above")).agg(
        F.sum(
            F.when(
                F.col("lag_above").isNull() | (F.col("above") != F.col("lag_above")), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("r"),
        F.sum("above").cast("bigint").alias("n1"),
        F.sum(F.lit(1) - F.col("above")).cast("bigint").alias("n2"),
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    exp_r = F.lit(1.0) + F.lit(2.0) * F.col("n1") * F.col("n2") / (n1d + n2d)
    var_r = (F.lit(2.0) * F.col("n1") * F.col("n2") * (F.lit(2.0) * F.col("n1") * F.col("n2") - F.col("n1") - F.col("n2"))) / (
        (n1d + n2d) * (n1d + n2d) * (F.col("n1") + F.col("n2") - F.lit(1.0))
    )
    return runs.select(
        F.col("r").alias("n_runs"),
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        F.round(exp_r, 6).alias("expected_runs"),
        F.round((F.col("r") - exp_r) / F.sqrt(var_r), 6).alias("z"),
    )


@query(
    "mann_kendall_trend",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s,
             CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n
      FROM daily a JOIN daily b ON b.d > a.d
    ),
    ties AS (
      SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term FROM (
        SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY x HAVING COUNT(*) > 1) g
    )
    SELECT s.s AS mk_s, s.n AS n_days,
           round((CAST(s.n AS DOUBLE) * (s.n - 1) * (2 * s.n + 5) - coalesce(ties.tie_term, 0)) / 18.0, 6) AS var_s,
           round(CASE WHEN s.s > 0 THEN (s.s - 1)
                      WHEN s.s < 0 THEN (s.s + 1)
                      ELSE 0 END
                 / sqrt((CAST(s.n AS DOUBLE) * (s.n - 1) * (2 * s.n + 5) - coalesce(ties.tie_term, 0)) / 18.0), 6) AS z
    FROM s CROSS JOIN ties""",
    doc=(
        "Mann–Kendall monotone-trend test on daily order volume: "
        "S = Σ sign(x_j − x_i) over all day pairs (the nonparametric "
        "trend detector robust to outliers and any distribution), with "
        "the tie-corrected variance and continuity-corrected z. The "
        "pair self-join is O(days²) — CALENDAR-bounded, so it never "
        "grows with fact volume (the same argument as every daily-series "
        "lane); S and the tie term are pure integers"
    ),
    tags=("temporal", "stats", "hypothesis-test", "trend", "join-theta"),
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    daily = (
        t["orders"]
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count("*").cast("bigint").alias("x"))
    )
    a = daily.select(F.col("d").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("d").alias("db"), F.col("x").alias("xb"))
    s_df = (
        a.join(b, F.col("db") > F.col("da"))
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s")
        )
    )
    n_df = daily.agg(F.count("*").cast("bigint").alias("n"))
    ties = (
        daily.groupBy("x")
        .agg(F.count("*").cast("bigint").alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    m = s_df.crossJoin(F.broadcast(n_df)).crossJoin(F.broadcast(ties))
    nd = F.col("n").cast("double")
    var_s = (nd * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term")) / F.lit(18.0)
    z_num = (
        F.when(F.col("s") > 0, F.col("s") - 1)
        .when(F.col("s") < 0, F.col("s") + 1)
        .otherwise(F.lit(0))
    )
    return m.select(
        F.col("s").alias("mk_s"),
        F.col("n").alias("n_days"),
        F.round(var_s, 6).alias("var_s"),
        F.round(z_num / F.sqrt(var_s), 6).alias("z"),
    )


@query(
    "peak_open_orders",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS ed,
             CAST(COUNT(*) AS BIGINT) AS placed
      FROM orders GROUP BY 1
    ),
    sliding AS (
      SELECT ed, placed,
             CAST(SUM(placed) OVER (ORDER BY ed RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS open_orders
      FROM daily
    )
    SELECT CAST(strftime(DATE '1970-01-01' + CAST(ed AS INT), '%Y-%m-%d') AS VARCHAR) AS day,
           placed, open_orders, rank FROM (
      SELECT ed, placed, open_orders,
             row_number() OVER (ORDER BY open_orders DESC, ed) AS rank
      FROM sliding
    ) t WHERE rank <= 10""",
    doc=(
        "interval-concurrency via a VALUE-based sliding window: treating "
        "each order as open for 7 days, the trailing RANGE frame over "
        "epoch-day integers counts concurrently-open orders per day — "
        "peak load = top-10 days. RANGE (not ROWS) is the point: gap "
        "days in the spine still bound the frame by VALUE distance, so "
        "missing days can't silently widen the window. Calendar-bounded "
        "relation; the capacity-planning lane"
    ),
    tags=("temporal", "window", "range-frame", "timeseries"),
)
def peak_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    daily = (
        t["orders"]
        .groupBy(F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")).cast("bigint").alias("ed"))
        .agg(F.count("*").cast("bigint").alias("placed"))
    )
    w = Window.orderBy("ed").rangeBetween(-6, 0)
    sliding = daily.select(
        "ed", "placed", F.sum("placed").over(w).cast("bigint").alias("open_orders")
    )
    rk = Window.orderBy(F.desc("open_orders"), F.asc("ed"))
    return (
        sliding.withColumn("rank", F.row_number().over(rk))
        .where(F.col("rank") <= 10)
        .select(
            F.date_format(F.date_add(F.lit("1970-01-01").cast("date"), F.col("ed").cast("int")), "yyyy-MM-dd").alias("day"),
            "placed",
            "open_orders",
            "rank",
        )
    )


@query(
    "dau_wau_stickiness",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS ed, user_id
      FROM events
    ),
    days AS (SELECT DISTINCT ed FROM du),
    dau AS (SELECT ed, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY ed),
    wau AS (
      SELECT days.ed, CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS wau
      FROM days JOIN du ON du.ed BETWEEN days.ed - 6 AND days.ed
      GROUP BY days.ed
    )
    SELECT CAST(strftime(DATE '1970-01-01' + CAST(d.ed AS INT), '%Y-%m-%d') AS VARCHAR) AS day,
           d.dau, w.wau,
           round(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
    FROM dau d JOIN wau w ON d.ed = w.ed""",
    doc=(
        "DAU/WAU stickiness per active day: daily actives over trailing-"
        "7-day actives — the canonical product-engagement ratio. WAU "
        "needs distinct users per WINDOW (not summable from daily "
        "counts), so the day spine range-joins the distinct (day, user) "
        "relation — fan-out ≤7× a relation already bounded by "
        "days × users, then one distinct-count per day. Integer counts "
        "to one final division"
    ),
    tags=("temporal", "engagement", "join-range", "timeseries"),
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    du = (
        t["events"]
        .select(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("bigint")
            .alias("ed"),
            "user_id",
        )
        .distinct()
    )
    days = du.select("ed").distinct()
    dau = du.groupBy("ed").agg(F.count("*").cast("bigint").alias("dau"))
    wau = (
        days.alias("d")
        .join(
            du.alias("u"),
            F.col("u.ed").between(F.col("d.ed") - 6, F.col("d.ed")),
        )
        .groupBy(F.col("d.ed").alias("ed"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
    )
    return (
        dau.join(wau, "ed")
        .select(
            F.date_format(
                F.date_add(F.lit("1970-01-01").cast("date"), F.col("ed").cast("int")),
                "yyyy-MM-dd",
            ).alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
        )
    )


@query(
    "new_vs_repeat_orders_monthly",
    oracle="""
    WITH seq AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             CASE WHEN row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
                  THEN 1 ELSE 0 END AS is_first
      FROM orders
    )
    SELECT month,
           CAST(SUM(is_first) AS BIGINT) AS new_customers,
           CAST(SUM(1 - is_first) AS BIGINT) AS repeat_orders,
           round(CAST(SUM(1 - is_first) AS DOUBLE) / COUNT(*), 6) AS repeat_share
    FROM seq GROUP BY month""",
    doc=(
        "acquisition-vs-retention mix per month: each order classified "
        "as the customer's FIRST (deterministic by date, orderkey "
        "tiebreak) or a repeat, aggregated monthly — the growth-"
        "accounting readout behind cohort charts. One customer-keyed "
        "window + one calendar-bounded aggregation; integer counts to "
        "the final share"
    ),
    tags=("temporal", "cohort", "window", "engagement"),
)
def new_vs_repeat_orders_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = t["orders"].select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.when(F.row_number().over(w) == 1, 1).otherwise(0).alias("is_first"),
    )
    return seq.groupBy("month").agg(
        F.sum("is_first").cast("bigint").alias("new_customers"),
        F.sum(F.lit(1) - F.col("is_first")).cast("bigint").alias("repeat_orders"),
        F.round(F.sum(F.lit(1) - F.col("is_first")).cast("double") / F.count("*"), 6).alias(
            "repeat_share"
        ),
    )


@query(
    "dow_profile_uniformity",
    oracle="""
    WITH dow AS (
      SELECT CAST((isodow(CAST(o_orderdate AS DATE)) - 1) AS INT) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM dow)
    SELECT dow.dow, dow.n,
           round(CAST(dow.n AS DOUBLE) / tot.total, 6) AS share,
           round((dow.n - tot.total / 7.0) * (dow.n - tot.total / 7.0) / (tot.total / 7.0), 6) AS chi2_term,
           ((dow.n - tot.total / 7.0) * (dow.n - tot.total / 7.0) / (tot.total / 7.0) > 12.592 / 7.0) AS outsized
    FROM dow CROSS JOIN tot""",
    doc=(
        "day-of-week order-volume profile with per-day χ² terms against "
        "the uniform expectation (Monday=0; outsized flags a day whose "
        "term alone exceeds its share of the df=6 α=0.05 critical value "
        "12.592): the weekly-seasonality screen for batch-window "
        "planning and synthetic-data QA (uniform weekdays are a "
        "generator tell, strong weekend dips are organic). 7 rows at "
        "any fact size; integer counts to the final float terms"
    ),
    tags=("temporal", "seasonal", "stats", "quality"),
)
def dow_profile_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    dow = (
        t["orders"]
        .groupBy(
            F.pmod(F.dayofweek(F.col("o_orderdate").cast("date")) + 5, F.lit(7))
            .cast("int")
            .alias("dow")
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    tot = dow.agg(F.sum("n").cast("bigint").alias("total"))
    j = dow.crossJoin(F.broadcast(tot))
    exp = F.col("total") / F.lit(7.0)
    term = (F.col("n") - exp) * (F.col("n") - exp) / exp
    return j.select(
        "dow",
        "n",
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
        F.round(term, 6).alias("chi2_term"),
        (term > F.lit(12.592) / F.lit(7.0)).alias("outsized"),
    )
