"""Round-5 additions, twenty-second batch: SLO error-budget burn.

- ``events_error_budget_burn``: per-day error rate against a 99%
  success SLO — burn rate (error share over allowed share) and the
  cumulative fraction of the month's error budget consumed, the SRE
  readout that pages before the SLO is blown. Counts exact; rates
  computed once at the end (rounded 6) with the cumulative sums taken
  over INTEGER error counts, so the running budget line is
  engine-exact.

Invariant tests in tests/test_round27.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

_SLO_ERR_PCT = 1  # 99% success SLO → 1% error budget


def _events_error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily totals and error counts (one scan), daily burn =
    (errors·100)/(total·SLO%), and cumulative budget consumed =
    Σerrors·100 / (Σtotal·SLO%) — both ratios of exact integer
    cumulative sums ordered by day, so the burn lines match across
    engines bit-for-bit after rounding."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_errors"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.withColumn("cum_events", F.sum("n_events").over(w)).withColumn(
        "cum_errors", F.sum("n_errors").over(w)
    )
    return cum.select(
        "day",
        "n_events",
        "n_errors",
        F.round(
            F.col("n_errors") * 100 / (F.col("n_events") * _SLO_ERR_PCT).cast("double"),
            6,
        ).alias("daily_burn"),
        F.round(
            F.col("cum_errors")
            * 100
            / (F.col("cum_events") * _SLO_ERR_PCT).cast("double"),
            6,
        ).alias("budget_consumed"),
    ).orderBy("day")


EVENTS_BURN_SQL = f"""
WITH daily AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_errors
    FROM events GROUP BY 1),
cum AS (
    SELECT *,
           sum(n_events) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
               AS cum_events,
           sum(n_errors) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
               AS cum_errors
    FROM daily)
SELECT day, n_events, n_errors,
       round(n_errors * 100 / CAST(n_events * {_SLO_ERR_PCT} AS DOUBLE), 6)
           AS daily_burn,
       round(cum_errors * 100
             / CAST(cum_events * {_SLO_ERR_PCT} AS DOUBLE), 6)
           AS budget_consumed
FROM cum
ORDER BY day
"""


QUERIES: dict[str, QuerySpec] = {
    "events_error_budget_burn": QuerySpec(
        _events_error_budget_burn, EVENTS_BURN_SQL
    ),
}
