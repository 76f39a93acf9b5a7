"""Round-6 additions, third batch: the transformWithState batch twin
and conversion latency.

- ``events_user_type_profile``: batch twin of the Spark-4
  ``transformWithStateInPandas`` stateful operator
  (streaming/events.py::user_type_profile — ValueState counter +
  ListState of seen types per user). One hash aggregation; the
  streaming path must land on the same frame (equivalence pinned in
  tests/test_streaming.py), keeping BOTH stateful-processor APIs
  anchored to DuckDB-hash-checked twins.
- ``events_time_to_first_purchase``: per-user conversion latency —
  seconds from a user's first event of any type to their first
  'purchase' (never-converted users excluded), rolled up to latency
  deciles. Two min-aggregations and one small quantile step; integer
  microsecond arithmetic end-to-end.

Invariant tests in tests/test_round33.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec


def _events_user_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final state of the per-user type-profile stateful op: event
    count + distinct type count, one aggregation."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("event_type").cast("long").alias("n_types"),
        )
        .orderBy("user_id")
    )


USER_TYPE_PROFILE_SQL = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
FROM events GROUP BY user_id ORDER BY user_id
"""


_DECILES = 10


def _events_time_to_first_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user first-event and first-purchase timestamps (ONE
    aggregation computes both via a conditional min), latency in whole
    seconds, then a decile profile of converters.

    The decile step NEVER windows over the per-user frame: converters
    are first reduced to one row per DISTINCT latency second
    (|distinct seconds| is bounded by the observation span regardless
    of user count), the cumulative-count window runs over that small
    frame, and each decile's row range comes from the closed-form
    ntile split (q = N div 10, r = N mod 10; bucket d covers rows
    [(d-1)q + min(d-1, r) + 1, dq + min(d, r)]). Per-decile count is
    fixed by N; min/max latency are the values whose cumulative row
    ranges overlap the bucket — bit-identical to ntile, because ties
    straddling a boundary contribute the same value to both buckets.
    Integer epoch math keeps both engines exact."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.col("event_type"),
    )
    firsts = ev.groupBy("user_id").agg(
        F.min("us").alias("first_us"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("us"))).alias(
            "first_buy_us"
        ),
    )
    # integer division on BOTH sides (Spark `div` / DuckDB `//`):
    # float division + cast diverges (Spark cast truncates, DuckDB
    # CAST rounds) on non-multiple microsecond gaps.
    lat = firsts.filter(F.col("first_buy_us").isNotNull()).select(
        "user_id",
        F.expr("(first_buy_us - first_us) div 1000000").alias("latency_s"),
    )
    from pyspark.sql import Window

    vals = lat.groupBy("latency_s").agg(F.count(F.lit(1)).alias("c"))
    # Unpartitioned window is deliberate and safe HERE: the child is
    # the distinct-latency frame, not the converters frame.
    wv = Window.orderBy("latency_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = vals.withColumn("cum", F.sum("c").over(wv)).withColumn(
        "row_lo", F.col("cum") - F.col("c") + 1
    )
    n_total = lat.agg(F.count(F.lit(1)).alias("n_total"))
    bounds = (
        spark.range(1, _DECILES + 1)
        .select(F.col("id").alias("decile"))
        .crossJoin(F.broadcast(n_total))
        .select(
            "decile",
            (
                (F.col("decile") - 1) * F.expr(f"n_total div {_DECILES}")
                + F.least(F.col("decile") - 1, F.col("n_total") % _DECILES)
                + 1
            ).alias("lo"),
            (
                F.col("decile") * F.expr(f"n_total div {_DECILES}")
                + F.least(F.col("decile"), F.col("n_total") % _DECILES)
            ).alias("hi"),
        )
        .filter(F.col("hi") >= F.col("lo"))
    )
    joined = cum.join(
        F.broadcast(bounds),
        (F.col("row_lo") <= F.col("hi")) & (F.col("cum") >= F.col("lo")),
    )
    return (
        joined.groupBy("decile")
        .agg(
            (F.first("hi") - F.first("lo") + 1).cast("long").alias("n_users"),
            F.min("latency_s").alias("min_latency_s"),
            F.max("latency_s").alias("max_latency_s"),
        )
        .select(F.col("decile").cast("long").alias("decile"), "n_users",
                "min_latency_s", "max_latency_s")
        .orderBy("decile")
    )


TIME_TO_FIRST_SQL = f"""
WITH ev AS (
    SELECT user_id,
           epoch_us(ts) AS us,
           event_type
    FROM events),
firsts AS (
    SELECT user_id, min(us) AS first_us,
           min(CASE WHEN event_type = 'purchase' THEN us END) AS first_buy_us
    FROM ev GROUP BY user_id),
lat AS (
    SELECT user_id,
           (first_buy_us - first_us) // 1000000 AS latency_s
    FROM firsts WHERE first_buy_us IS NOT NULL),
d AS (
    SELECT user_id, latency_s,
           ntile({_DECILES}) OVER (ORDER BY latency_s, user_id) AS decile
    FROM lat)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_users,
       min(latency_s) AS min_latency_s,
       max(latency_s) AS max_latency_s
FROM d GROUP BY decile ORDER BY decile
"""


QUERIES: dict[str, QuerySpec] = {
    "events_user_type_profile": QuerySpec(
        _events_user_type_profile, USER_TYPE_PROFILE_SQL
    ),
    "events_time_to_first_purchase": QuerySpec(
        _events_time_to_first_purchase, TIME_TO_FIRST_SQL
    ),
}
