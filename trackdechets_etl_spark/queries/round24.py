"""Round-5 additions, nineteenth batch: engagement stickiness.

- ``events_dau_wau_stickiness``: DAU, trailing-7-day WAU, and the
  DAU/WAU stickiness ratio per day. Distinct-users-over-a-sliding-
  window is NOT a plain window function (distinct doesn't decompose),
  so WAU joins the calendar spine to the deduplicated user-day frame
  on a bounded date range — candidate rows are |user-days|×7, never
  events×days. The engagement readout every product dashboard leads
  with.

Invariant tests in tests/test_round24.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

_WAU_DAYS = 7


def _events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scan builds the deduplicated (user, day) frame; DAU is a
    per-day count over it, WAU a range join of the day spine to the
    same frame (each user-day lands in ≤7 spine days — linear), and
    stickiness the rounded ratio. At 100 TB the user-day frame is the
    engagement cube every such metric shares; it shuffles once."""
    ev = read_table(spark, sf_dir, "events")
    ud = (
        ev.select(
            "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
        )
        .distinct()
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    spine = ud.select("day").distinct()
    wau = (
        spine.alias("s")
        .join(
            ud.alias("u"),
            (F.col("u.day") <= F.col("s.day"))
            & (
                F.col("u.day")
                > F.date_sub(F.col("s.day"), _WAU_DAYS)
            ),
        )
        .groupBy(F.col("s.day").alias("day"))
        .agg(F.countDistinct("u.user_id").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau").cast("double"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


EVENTS_DAU_WAU_SQL = f"""
WITH ud AS (
    SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
    FROM events),
dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day),
spine AS (SELECT DISTINCT day FROM ud),
wau AS (
    SELECT s.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
    FROM spine s JOIN ud u
      ON u.day <= s.day AND u.day > s.day - {_WAU_DAYS}
    GROUP BY s.day)
SELECT day, dau, wau,
       round(dau / CAST(wau AS DOUBLE), 6) AS stickiness
FROM dau JOIN wau USING (day)
ORDER BY day
"""


QUERIES: dict[str, QuerySpec] = {
    "events_dau_wau_stickiness": QuerySpec(
        _events_dau_wau_stickiness, EVENTS_DAU_WAU_SQL
    ),
}
