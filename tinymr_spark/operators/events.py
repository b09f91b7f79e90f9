"""Event-stream analytics on the `events` table — the batch face.

Time-windowed aggregation, sessionization, pivot, and JSON extraction.
The same window logic runs under Structured Streaming in
`tinymr_spark.streaming` (readStream + watermark); these batch versions
are the oracle-checkable twins.

Timestamp discipline: the parquet stores nanoseconds, Spark truncates to
microseconds — so oracle-matched queries never project raw `ts`; they
bucket it (epoch-floor) or reduce it to whole-second diffs, which are
identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tinymr_spark.sources import load_table

BUCKET_SEC = 300  # 5-minute tumbling windows
SESSION_GAP_SEC = 1800  # 30-minute session gap


# ---------------------------------------------------------------------------
# Tumbling window aggregate via the native window() operator (epoch-aligned
# 5-minute buckets).
# ---------------------------------------------------------------------------
def q70_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", f"{BUCKET_SEC} seconds").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("bucket_ts"), "event_type", "n", "total_value")
    )


ORACLE_Q70 = f"""
SELECT CAST(to_timestamp(CAST(FLOOR(epoch(ts) / {BUCKET_SEC}) AS BIGINT) * {BUCKET_SEC}) AS TIMESTAMP) AS bucket_ts,
       event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Sliding window: 10-minute windows every 5 minutes (each event lands in 2
# buckets).  Native window(slideDuration); oracle replays the expansion.
# ---------------------------------------------------------------------------
def q71_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # NOTE: SUM of 2-decimal inputs rounds safely; AVG would land on exact
    # half-cent boundaries where Spark and DuckDB round differently.
    return (
        ev.groupBy(F.window("ts", "600 seconds", "300 seconds").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("bucket_ts"), "n", "total_value")
    )


ORACLE_Q71 = """
WITH expanded AS (
    SELECT CAST(to_timestamp((CAST(FLOOR(epoch(ts) / 300) AS BIGINT) - shift) * 300) AS TIMESTAMP) AS bucket_ts,
           value
    FROM events, (SELECT UNNEST([0, 1]) AS shift)
)
SELECT bucket_ts, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
FROM expanded
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Sessionization: gap > 30 min starts a new session (lag + running sum —
# the classic window-function sessionizer).  Output avoids raw timestamps
# (ns vs us); durations are whole-second diffs.
# ---------------------------------------------------------------------------
def q72_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    byuser = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(byuser))
    new_sess = F.when(gap.isNull() | (gap > SESSION_GAP_SEC), 1).otherwise(0)
    sess = ev.withColumn(
        "session_no", F.sum(new_sess).over(byuser.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        (F.max(F.unix_timestamp("ts")) - F.min(F.unix_timestamp("ts"))).alias(
            "duration_sec"
        ),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


ORACLE_Q72 = f"""
WITH marked AS (
    SELECT user_id, ts, value,
           CASE WHEN date_diff('second', LAG(ts) OVER w, ts) > {SESSION_GAP_SEC}
                  OR LAG(ts) OVER w IS NULL
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
    SELECT user_id, ts, value,
           CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
    FROM marked
)
SELECT user_id, session_no, COUNT(*) AS n_events,
       date_diff('second', MIN(ts), MAX(ts)) AS duration_sec,
       ROUND(SUM(value), 2) AS session_value
FROM sess
GROUP BY user_id, session_no
"""


# ---------------------------------------------------------------------------
# Pivot: per-user event-type counts as columns.
# ---------------------------------------------------------------------------
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q73_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
    )


ORACLE_Q73 = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Semi-structured extraction: the `props` column is a JSON string.
# ---------------------------------------------------------------------------
def q74_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type", (F.col("k") % 10).alias("k_mod10"))
        .agg(F.count("*").alias("n"), F.min("k").alias("min_k"), F.max("k").alias("max_k"))
    )


ORACLE_Q74 = """
SELECT event_type,
       CAST(CAST(json_extract_string(props, '$.k') AS INT) % 10 AS INT) AS k_mod10,
       COUNT(*) AS n,
       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events
GROUP BY 1, 2
"""



# ---------------------------------------------------------------------------
# q79 — the VARIANT path for semi-structured props (Spark 4): parse_json
# once into the binary VARIANT encoding, then typed variant_get
# extraction.  Contrast with q74's get_json_object, which re-parses the
# JSON string per extracted field — at 100 TB, one parse into VARIANT +
# N typed gets beats N string parses, and the open schema evolves
# without a migration (fields appear per row, not per table).
# ---------------------------------------------------------------------------
def q79_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type", F.floor(F.col("k") / 10).cast("int").alias("k_decile"))
        .agg(F.count("*").alias("n"), F.sum("k").alias("sum_k"))
    )


ORACLE_Q79 = """
SELECT event_type,
       CAST(CAST(json_extract_string(props, '$.k') AS INT) // 10 AS INT) AS k_decile,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# As-of join (most-recent-prior match) — an operator Spark lacks natively.
# Implemented as a composition: union the two sides, carry the last click
# forward per user with last(ignorenulls) over an ordered window, keep the
# purchase rows.  One shuffle on user_id; no range cross-join.  The DuckDB
# oracle uses its native ASOF JOIN, so this checks the composition against
# a first-class implementation.
# ---------------------------------------------------------------------------
def q75_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_click = F.col("event_type") == "click"
    carried = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.last(F.when(is_click, F.col("event_id")), ignorenulls=True).over(w).alias(
            "last_click_id"
        ),
        F.last(F.when(is_click, F.unix_timestamp("ts")), ignorenulls=True)
        .over(w)
        .alias("last_click_sec"),
    )
    return (
        carried.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "last_click_id",
            (F.unix_timestamp("ts") - F.col("last_click_sec")).alias("gap_sec"),
        )
    )


ORACLE_Q75 = """
SELECT p.event_id AS purchase_id, p.user_id,
       c.event_id AS last_click_id,
       date_diff('second', c.ts, p.ts) AS gap_sec
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""

# ---------------------------------------------------------------------------
# Interval (range) join: clicks within the 10 minutes preceding each
# purchase, per user.  The equi-key (user_id) makes this a plain hash
# join with the time range as a post-join filter — no cross product, one
# shuffle on user_id.  A range join with NO equi key would instead need
# binning (join on a time-bucket key, filter exact range after); the
# equi-keyed form is the 100 TB-safe default.
# ---------------------------------------------------------------------------
def q76_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("pts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cuser"), F.col("ts").alias("cts")
    )
    return (
        p.join(
            c,
            (F.col("user_id") == F.col("cuser"))
            & (F.col("cts") <= F.col("pts"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 10 MINUTES")),
            "left",
        )
        .groupBy("purchase_id", "user_id")
        .agg(F.count("cts").alias("n_clicks_10m"))
    )


ORACLE_Q76 = """
SELECT p.event_id AS purchase_id, p.user_id, COUNT(c.ts) AS n_clicks_10m
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL 10 MINUTE
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Funnel analysis: signup -> click -> purchase, in event-time order, per
# user.  Step k counts only if it happens at-or-after step k-1's FIRST
# occurrence — the standard ordered-funnel definition.  One aggregation
# pass: conditional MIN per step, then ordering comparisons; no joins,
# no window functions, shuffles once on user_id.
# ---------------------------------------------------------------------------
def q77_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts")
    step = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", sec)).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "click", sec)).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", sec)).alias("t_purchase"),
    )
    reached1 = F.col("t_signup").isNotNull()
    # first click at-or-after first signup: t_click is min over ALL clicks,
    # so compare against the step-1 gate with >=
    reached2 = reached1 & F.col("t_click").isNotNull() & (F.col("t_click") >= F.col("t_signup"))
    reached3 = reached2 & F.col("t_purchase").isNotNull() & (
        F.col("t_purchase") >= F.col("t_click")
    )
    return step.select(
        F.count_if(reached1).alias("n_signup"),
        F.count_if(reached2).alias("n_signup_click"),
        F.count_if(reached3).alias("n_full_funnel"),
        F.count("*").alias("n_users"),
    )


ORACLE_Q77 = """
WITH step AS (
    -- floor-epoch seconds, matching Spark's unix_timestamp granularity
    SELECT user_id,
           MIN(CASE WHEN event_type = 'signup'
                    THEN CAST(FLOOR(epoch(ts)) AS BIGINT) END) AS t_signup,
           MIN(CASE WHEN event_type = 'click'
                    THEN CAST(FLOOR(epoch(ts)) AS BIGINT) END) AS t_click,
           MIN(CASE WHEN event_type = 'purchase'
                    THEN CAST(FLOOR(epoch(ts)) AS BIGINT) END) AS t_purchase
    FROM events
    GROUP BY user_id
)
SELECT CAST(COUNT(CASE WHEN t_signup IS NOT NULL THEN 1 END) AS BIGINT) AS n_signup,
       CAST(COUNT(CASE WHEN t_signup IS NOT NULL AND t_click >= t_signup
                       THEN 1 END) AS BIGINT) AS n_signup_click,
       CAST(COUNT(CASE WHEN t_signup IS NOT NULL AND t_click >= t_signup
                        AND t_purchase >= t_click
                       THEN 1 END) AS BIGINT) AS n_full_funnel,
       COUNT(*) AS n_users
FROM step
"""


# ---------------------------------------------------------------------------
# Cohort retention: users grouped by signup week (epoch-floor), counted
# when active in weeks +0..+3.  Two aggregations + one join on user_id;
# the distinct-activity table is the scale knob (it shrinks events to
# user-weeks before the join).
# ---------------------------------------------------------------------------
WEEK_SEC = 604800


def q78_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    week = F.floor(F.unix_timestamp("ts") / WEEK_SEC)
    signup = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(week).alias("w0"))
    )
    activity = ev.select("user_id", week.alias("w")).distinct()
    return (
        activity.join(signup, "user_id")
        .where((F.col("w") >= F.col("w0")) & (F.col("w") - F.col("w0") <= 3))
        .groupBy(F.col("w0").alias("cohort_week"), (F.col("w") - F.col("w0")).alias("week_offset"))
        .agg(F.count("*").alias("n_active_users"))
    )


ORACLE_Q78 = f"""
WITH signup AS (
    SELECT user_id, MIN(CAST(FLOOR(epoch(ts) / {WEEK_SEC}) AS BIGINT)) AS w0
    FROM events WHERE event_type = 'signup'
    GROUP BY user_id
),
activity AS (
    SELECT DISTINCT user_id, CAST(FLOOR(epoch(ts) / {WEEK_SEC}) AS BIGINT) AS w
    FROM events
)
SELECT s.w0 AS cohort_week, a.w - s.w0 AS week_offset, COUNT(*) AS n_active_users
FROM activity a JOIN signup s USING (user_id)
WHERE a.w >= s.w0 AND a.w - s.w0 <= 3
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q108 — SCD Type-2 history from a change feed: the standing dimension-
# maintenance job of any lake.  Treating each user's 'view' events as
# attribute updates, every update opens a version interval
# [valid_from, valid_to) that the NEXT update closes; the open interval
# (valid_to IS NULL) is the current snapshot — so latest-wins upsert is
# the is_current slice of the same result, no second pass.
#
# One shuffle on user_id, then a single per-user ordered window computes
# version numbers and closing timestamps together.  Ties on ts break on
# event_id so both engines order identically.  At 100 TB the change feed
# arrives date-partitioned and the window runs per user regardless of
# how many days are merged — this is the batch twin of the streaming
# latest-state query (q92).
# ---------------------------------------------------------------------------
def q108_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "view")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        F.row_number().over(w).alias("version"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        "value",
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


ORACLE_Q108 = """
SELECT user_id,
       ROW_NUMBER() OVER w AS version,
       ts AS valid_from,
       LEAD(ts) OVER w AS valid_to,
       value,
       LEAD(ts) OVER w IS NULL AS is_current
FROM events
WHERE event_type = 'view'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ---------------------------------------------------------------------------
# q115 — range join WITHOUT an equi key, made shuffle-safe by time
# binning: every purchase counts ALL clicks (any user) in its preceding
# 10 minutes.  A naive theta join is a cartesian product — the plan q76's
# docstring warns about.  The 100 TB-safe lowering: bin both sides into
# 10-minute buckets; a purchase's 10-minute lookback spans AT MOST two
# buckets, so exploding each purchase to its two candidate bucket keys
# turns the theta join into an equi join on the bucket (2x one side, not
# |L|x|R|), with the exact range check as a join-time filter.  Each click
# lives in exactly one bucket, so no dedup is needed after the filter.
# ---------------------------------------------------------------------------
RANGE_BIN_SEC = 600


def q115_global_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = (F.unix_timestamp("ts") / RANGE_BIN_SEC).cast("bigint")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
        F.explode(F.array(bucket, bucket - 1)).alias("bin"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
        bucket.alias("cbin"),
    )
    return (
        p.join(
            c,
            (F.col("bin") == F.col("cbin"))
            & (F.col("cts") <= F.col("pts"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 10 MINUTES")),
            "left",
        )
        .groupBy("purchase_id")
        .agg(F.count("click_id").alias("n_clicks_any_user"))
    )


ORACLE_Q115 = """
SELECT p.event_id AS purchase_id, COUNT(c.event_id) AS n_clicks_any_user
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 10 MINUTE
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q154 — OHLC resampling (time-series downsample to open/high/low/close
# candles): the standard compaction of a high-frequency measure into
# per-bucket summaries, and the demo of Spark's ordered-selection
# aggregates `min_by`/`max_by` (DuckDB twins arg_min/arg_max) — the
# one-pass answer to "the value AT the earliest/latest row per group"
# that otherwise costs a window + filter.  Selection ORDER is event_id,
# not ts: the repo's cross-engine playbook forbids ordering by raw ts
# (DuckDB keeps nanoseconds, Spark truncates to micros, so a µs-tie in
# Spark may not tie in DuckDB and the two engines would pick different
# "first" rows); event_id is unique, monotone with arrival in the
# generator, and identical in both engines.  One map-side-combined
# aggregation — min_by/max_by partials carry a single (value, key) pair
# per group per executor, so the shuffle is as small as a plain min's.
# ---------------------------------------------------------------------------
OHLC_BUCKET_SEC = 3600  # hourly candles


def q154_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", f"{OHLC_BUCKET_SEC} seconds").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min_by("value", "event_id").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "event_id").alias("close"),
        )
        .select(
            F.col("w.start").alias("bucket_ts"),
            "event_type", "n", "open", "high", "low", "close",
        )
    )


ORACLE_Q154 = f"""
SELECT CAST(to_timestamp(CAST(FLOOR(epoch(ts) / {OHLC_BUCKET_SEC}) AS BIGINT) * {OHLC_BUCKET_SEC}) AS TIMESTAMP) AS bucket_ts,
       event_type, COUNT(*) AS n,
       arg_min(value, event_id) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       arg_max(value, event_id) AS close
FROM events
GROUP BY 1, 2
"""


QUERIES = {
    "q70_tumbling_window": q70_tumbling_window,
    "q154_ohlc_resample": q154_ohlc_resample,
    "q71_sliding_window": q71_sliding_window,
    "q72_sessionize": q72_sessionize,
    "q73_pivot": q73_pivot,
    "q74_json_extract": q74_json_extract,
    "q75_asof_join": q75_asof_join,
    "q76_interval_join": q76_interval_join,
    "q77_funnel": q77_funnel,
    "q78_retention": q78_retention,
    "q79_variant_props": q79_variant_props,
    "q108_scd2_history": q108_scd2_history,
    "q115_global_range_join": q115_global_range_join,
}

ORACLE = {
    "q70_tumbling_window": ORACLE_Q70,
    "q154_ohlc_resample": ORACLE_Q154,
    "q71_sliding_window": ORACLE_Q71,
    "q72_sessionize": ORACLE_Q72,
    "q73_pivot": ORACLE_Q73,
    "q74_json_extract": ORACLE_Q74,
    "q75_asof_join": ORACLE_Q75,
    "q76_interval_join": ORACLE_Q76,
    "q77_funnel": ORACLE_Q77,
    "q78_retention": ORACLE_Q78,
    "q79_variant_props": ORACLE_Q79,
    "q108_scd2_history": ORACLE_Q108,
    "q115_global_range_join": ORACLE_Q115,
}
