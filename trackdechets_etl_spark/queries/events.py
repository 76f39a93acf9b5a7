"""Windowed event queries — the batch twins of streaming/events.py
operators, oracle-checked against DuckDB (time_bucket / gaps-and-islands).
The streaming execution of the same transformations is covered by
tests/test_streaming.py (non-SQL-expressible: state, watermarks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec
from trackdechets_etl_spark.streaming.events import (
    session_agg,
    sliding_agg,
    tumbling_agg,
)


def _tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_agg(read_table(spark, sf_dir, "events"))


TUMBLING_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


def _sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_agg(read_table(spark, sf_dir, "events"))


SLIDING_SQL = """
WITH s AS (
    SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws, value FROM events
    UNION ALL
    SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value
    FROM events)
SELECT ws AS window_start,
       ws + INTERVAL '1 hour' AS window_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS sum_value
FROM s GROUP BY 1, 2
"""


def _session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_agg(read_table(spark, sf_dir, "events"))


SESSION_SQL = """
WITH o AS (
    SELECT user_id, ts, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
    FROM events),
f AS (
    SELECT *, CASE WHEN prev IS NULL OR ts - prev >= INTERVAL '10 minutes'
                   THEN 1 ELSE 0 END AS new_s
    FROM o),
g AS (
    SELECT *, sum(new_s) OVER (
        PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess
    FROM f)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL '10 minutes' AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS sum_value
FROM g GROUP BY user_id, sess
"""


def _moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user moving average over the last 3 events (ordered by ts,
    event_id) — the lag/rolling-window shape for event features."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    e = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("moving_avg"),
    )


MOVING_AVG_SQL = """
SELECT event_id, user_id,
       round(avg(value) OVER (
           PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg
FROM events
"""


def _set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: users who both clicked and purchased (INTERSECT)
    vs clicked-only (EXCEPT), tagged and unioned."""
    from pyspark.sql import functions as F

    e = read_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id").distinct()
    buys = e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    both = clicks.intersect(buys).withColumn("op", F.lit("both"))
    click_only = clicks.subtract(buys).withColumn("op", F.lit("click_only"))
    return both.unionAll(click_only)


SET_OPS_SQL = """
SELECT user_id, 'both' AS op FROM (
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase')
UNION ALL
SELECT user_id, 'click_only' AS op FROM (
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase')
"""

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def _pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts spread into one column per event
    type (explicit value list → deterministic schema, single pass)."""
    from pyspark.sql import functions as F

    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


PIVOT_SQL = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
FROM events GROUP BY user_id
"""


QUERIES: dict[str, QuerySpec] = {
    "events_set_ops": QuerySpec(_set_ops, SET_OPS_SQL),
    "events_pivot_counts": QuerySpec(_pivot_counts, PIVOT_SQL),
    "events_moving_avg": QuerySpec(_moving_avg, MOVING_AVG_SQL),
    "events_tumbling_hourly": QuerySpec(_tumbling, TUMBLING_SQL),
    "events_sliding_window": QuerySpec(_sliding, SLIDING_SQL),
    "events_session_window": QuerySpec(_session, SESSION_SQL),
}
