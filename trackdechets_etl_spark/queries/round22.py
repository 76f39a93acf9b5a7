"""Round-5 additions, seventeenth batch: debounced alerting.

- ``events_debounced_alerts``: threshold alerting with debounce — a
  per-type daily count more than 10% above that type's mean only
  raises an alert after 3 consecutive breach days, and consecutive breach days collapse into
  one alert episode (start, end, duration, peak). The
  gaps-and-islands shape applied to the monitoring problem every
  data platform runs; integer counts and date arithmetic only.

Invariant tests in tests/test_round22.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

_ALERT_PCT = 110  # breach = daily count > 110% of the type's mean
_DEBOUNCE_DAYS = 3


def _events_debounced_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily counts → breach days → islands of consecutive breach days
    (day − dense row number is constant within a run — the
    gaps-and-islands identity) → episodes of length ≥ 3. Fact work
    ends at the daily rollup; islands run over breach-day-sized
    frames. Output: one row per qualifying episode with start/end,
    duration, and peak count."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    # relative threshold, evaluated as an integer cross-multiplication
    # (cnt·100·D > pct·S) so the breach set is engine-exact at any sf
    wt = Window.partitionBy("event_type")
    daily = daily.withColumn("d_days", F.count(F.lit(1)).over(wt)).withColumn(
        "s_total", F.sum("cnt").over(wt)
    )
    breach = daily.filter(
        F.col("cnt") * 100 * F.col("d_days") > _ALERT_PCT * F.col("s_total")
    ).drop("d_days", "s_total")
    w = Window.partitionBy("event_type").orderBy("day")
    grp = breach.withColumn(
        "grp", F.date_sub("day", F.row_number().over(w))
    )
    return (
        grp.groupBy("event_type", "grp")
        .agg(
            F.min("day").alias("start_day"),
            F.max("day").alias("end_day"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.max("cnt").alias("peak_cnt"),
        )
        .filter(F.col("n_days") >= _DEBOUNCE_DAYS)
        .select("event_type", "start_day", "end_day", "n_days", "peak_cnt")
        .orderBy("event_type", "start_day")
    )


EVENTS_ALERTS_SQL = f"""
WITH daily AS (
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1, 2),
stats AS (
    SELECT *,
           count(*) OVER (PARTITION BY event_type) AS d_days,
           sum(cnt) OVER (PARTITION BY event_type) AS s_total
    FROM daily),
breach AS (
    SELECT event_type, day, cnt FROM stats
    WHERE cnt * 100 * d_days > {_ALERT_PCT} * s_total),
grp AS (
    SELECT *,
           day - CAST(row_number() OVER (PARTITION BY event_type
                                         ORDER BY day) AS INTEGER) AS g
    FROM breach)
SELECT event_type,
       min(day) AS start_day,
       max(day) AS end_day,
       CAST(count(*) AS BIGINT) AS n_days,
       max(cnt) AS peak_cnt
FROM grp
GROUP BY event_type, g
HAVING count(*) >= {_DEBOUNCE_DAYS}
ORDER BY event_type, start_day
"""


QUERIES: dict[str, QuerySpec] = {
    "events_debounced_alerts": QuerySpec(
        _events_debounced_alerts, EVENTS_ALERTS_SQL
    ),
}
