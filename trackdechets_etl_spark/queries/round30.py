"""Round-5 additions, twenty-fifth batch: per-user activity streaks.

- ``events_user_streaks``: longest and current consecutive-day
  activity streak per user — the gaps-and-islands identity
  partitioned by user over the deduplicated user-day frame, with the
  current streak defined as the island touching the corpus's last
  day. The engagement/gamification readout (duolingo-style streaks);
  all integer date arithmetic.

Invariant tests in tests/test_round30.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec


def _events_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-day dedup (one shuffle — the same engagement cube as
    DAU/WAU), per-user islands via day − row_number, island lengths,
    then one per-user reduce: longest streak, streak count, active
    days, and the current streak (island ending on the corpus max
    day, else 0). Every frame after the dedup is user-day- or
    user-sized."""
    ev = read_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    maxd = ud.agg(F.max("day").alias("maxd"))
    w = Window.partitionBy("user_id").orderBy("day")
    isl = ud.withColumn("grp", F.date_sub("day", F.row_number().over(w)))
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"),
        F.max("day").alias("last_day"),
    )
    return (
        streaks.crossJoin(F.broadcast(maxd))
        .groupBy("user_id")
        .agg(
            F.sum("len").cast("long").alias("n_active_days"),
            F.count(F.lit(1)).cast("long").alias("n_streaks"),
            F.max("len").cast("long").alias("longest_streak"),
            F.coalesce(
                F.max(
                    F.when(F.col("last_day") == F.col("maxd"), F.col("len"))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("current_streak"),
        )
        .orderBy("user_id")
    )


EVENTS_STREAKS_SQL = """
WITH ud AS (
    SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
    FROM events),
maxd AS (SELECT max(day) AS maxd FROM ud),
isl AS (
    SELECT user_id, day,
           day - CAST(row_number() OVER (PARTITION BY user_id
                                         ORDER BY day) AS INTEGER) AS grp
    FROM ud),
streaks AS (
    SELECT user_id, grp, count(*) AS len, max(day) AS last_day
    FROM isl GROUP BY user_id, grp)
SELECT user_id,
       CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(coalesce(max(CASE WHEN last_day = maxd THEN len END), 0)
            AS BIGINT) AS current_streak
FROM streaks, maxd
GROUP BY user_id
ORDER BY user_id
"""


QUERIES: dict[str, QuerySpec] = {
    "events_user_streaks": QuerySpec(_events_user_streaks, EVENTS_STREAKS_SQL),
}
