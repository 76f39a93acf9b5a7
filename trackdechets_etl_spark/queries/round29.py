"""Round-5 additions, twenty-fourth batch: point-in-time feature join.

- ``join_asof_tolerance``: the feature-store point-in-time join —
  latest prior view per purchase (the ``join_asof_events`` contract)
  but NULLed when staler than 24 hours, because serving a stale
  feature silently corrupts training data while a missing one is
  imputable. Same single union-trick shuffle as the plain as-of; the
  staleness gate is a post-projection.

Invariant tests in tests/test_round29.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

_TOL_HOURS = 24


def _join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trackdechets_etl_spark.operators.temporal import asof_join_tolerance

    events = read_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value", "event_id"
    )
    out = asof_join_tolerance(
        purchases,
        views,
        left_key="user_id",
        right_key="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["value", "event_id"],
        tie_col="event_id",
        tolerance=f"{_TOL_HOURS} hours",
    )
    return out.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("asof_ts").alias("view_ts"),
        F.round("asof_value", 6).alias("view_value"),
        F.col("asof_event_id").alias("view_id"),
    ).orderBy("purchase_id")


JOIN_ASOF_TOL_SQL = f"""
WITH p AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
v AS (SELECT user_id, ts, value, event_id FROM events
      WHERE event_type = 'view'),
j AS (
    SELECT p.event_id AS purchase_id, v.ts, v.value,
           v.event_id AS view_id,
           row_number() OVER (
               PARTITION BY p.event_id
               ORDER BY v.ts DESC, v.event_id DESC) AS rn
    FROM p JOIN v
      ON v.user_id = p.user_id
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL {_TOL_HOURS} HOUR)
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       j.ts AS view_ts, round(j.value, 6) AS view_value, j.view_id
FROM p LEFT JOIN j ON j.purchase_id = p.event_id AND j.rn = 1
ORDER BY purchase_id
"""


QUERIES: dict[str, QuerySpec] = {
    "join_asof_tolerance": QuerySpec(_join_asof_tolerance, JOIN_ASOF_TOL_SQL),
}
