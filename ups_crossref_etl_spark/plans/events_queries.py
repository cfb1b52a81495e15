"""Event-stream queries (batch form) over ``events`` — tumbling/hourly
windows, JSON extraction, sessionization. The streaming twins live in
``streaming/events.py``; these batch versions are the oracle-checkable
surface (SURVEY.md §2.9: the reference's cursor-paginated ingest is the
moral equivalent; windows/watermarks are the extension layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.dates import epoch_seconds
from ..sources.lake import read_table
from .money import dsum
from .registry import register

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@register(
    "q_events_tumbling_5min",
    """
    SELECT strftime(time_bucket(INTERVAL 5 MINUTE, ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 5-min window agg (streaming twin: groupBy(window(ts,'5 minutes'))).",
)
def q_events_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "q_events_hourly_user_activity",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           user_id, count(*) AS n, round(avg(value), 4) AS avg_value
    FROM events GROUP BY 1, 2
    """,
    doc="Hourly per-user rollup (date_trunc window).",
)
def q_events_hourly_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
        .select(
            F.date_format("h", _TS_FMT).alias("hour"), "user_id", "n", "avg_value"
        )
    )


@register(
    "q_events_json_props",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    """,
    doc="JSON path extraction from a string column (F15 inverse; §1.3 JSON-as-TEXT).",
)
def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select("event_id", k.alias("k")).filter(F.col("k") > 50)


@register(
    "q_events_sessionize_30min",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, event_id, ts,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, session_id, count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
    FROM sessions GROUP BY user_id, session_id
    """,
    doc="Sessionization: lag+cumsum gap>30min (guide OLAP pattern; streaming twin session_window).",
)
def q_events_sessionize_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_s = F.when(
        prev.isNull()
        | (epoch_seconds("ts") - epoch_seconds(prev) > 30 * 60),
        1,
    ).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.select(
        "user_id", "event_id", "ts", new_s.alias("new_session")
    ).withColumn("session_id", F.sum("new_session").over(wc))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), _TS_FMT).alias("session_start"),
    )


@register(
    "q_events_type_funnel",
    """
    SELECT event_type,
           count(*) AS n,
           count(DISTINCT user_id) AS n_users,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_seen,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen
    FROM events GROUP BY event_type
    """,
    doc="Per-type lifecycle stats (min/max timestamp aggregates).",
)
def q_events_type_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("user_id").alias("n_users"),
        dsum(F.col("value")).alias("total_value"),
        F.date_format(F.min("ts"), _TS_FMT).alias("first_seen"),
        F.date_format(F.max("ts"), _TS_FMT).alias("last_seen"),
    )


@register(
    "q_events_asof_join",
    """
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
    logins AS (
      SELECT user_id, ts, event_id AS login_event FROM events WHERE event_type = 'signup')
    SELECT p.event_id, p.user_id,
           l.login_event AS login_event_asof,
           CAST(date_diff('second', l.ts, p.ts) AS BIGINT) AS secs_since_login
    FROM purchases p
    ASOF LEFT JOIN logins l ON p.user_id = l.user_id AND p.ts >= l.ts
    """,
    doc="As-of join (union-tag window impl; oracle: DuckDB native ASOF JOIN).",
)
def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    logins = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("login_event")
    )
    j2 = asof_join(
        purchases,
        logins.withColumn("login_ts", F.col("ts")),
        on="ts",
        by="user_id",
        right_cols=["login_event", "login_ts"],
    )
    return j2.select(
        "event_id",
        "user_id",
        F.col("login_event_asof"),
        (epoch_seconds("ts") - epoch_seconds("login_ts_asof")).alias(
            "secs_since_login"
        ),
    )


@register(
    "q_events_range_join",
    """
    WITH errors AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
    purchases AS (
      SELECT event_id AS p_event, user_id, ts AS p_ts FROM events
      WHERE event_type = 'purchase')
    SELECT e.event_id, p.p_event
    FROM errors e JOIN purchases p
      ON e.user_id = p.user_id
     AND epoch(p.p_ts) BETWEEN epoch(e.ts) - 600 AND epoch(e.ts) + 600
    """,
    doc="Range join via bucketized equi-join (purchases within ±10min of an error).",
)
def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import range_join

    ev = read_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event"), "user_id", F.col("ts").alias("p_ts")
    )
    j = range_join(
        errors,
        purchases.withColumnRenamed("p_ts", "ts"),
        by="user_id",
        on="ts",
        before_s=600,
        after_s=600,
    )
    return j.select("event_id", F.col("r_p_event").alias("p_event"))
