"""Round-7 additions, second batch: sliding distinct counts, a
count-min sketch with exact calibration, cohort LTV, and duplicate
payment detection.

- ``events_rolling_7d_active_users``: trailing-7-day distinct active
  users per day. Distinct-over-sliding-window is NOT expressible as a
  window aggregate (no ``count(DISTINCT)`` over frames in either
  engine); the scalable form is contribution explode: reduce to
  distinct (user, day), explode each to the <=7 trailing days it
  contributes to, then one exact distinct count per day. Shuffle
  volume is 7x the per-day-distinct frame — independent of raw event
  volume.
- ``sketch_cms_heavy_hitters``: Count-Min sketch (4 rows x 256
  counters, md5-keyed — the repo's engine-portable hash convention)
  over document tokens, calibrated against exact counts for the top-20
  terms: estimate = min over rows, always >= exact (one-sided error,
  asserted per row). The counter table is 1024 integers at ANY corpus
  size — the mergeable heavy-hitter sketch beside the registry's
  bloom/HLL/GK family.
- ``orders_cohort_ltv_curve``: customer-cohort lifetime value — cohort
  by first-order month, revenue rolled up by months-since-first-order,
  cumulative LTV per cohort via a cohort-partitioned window (the frame
  is cohorts x ages, never orders).
- ``orders_similar_payments``: same-customer order pairs whose amounts
  differ by <= 2% (integer-cents cross-multiplied comparison — no
  float thresholds) within 30 days — the double-charge / split-charge
  audit. The custkey equi-join bounds candidates by per-customer order
  counts (entity-scale, not corpus-scale); the synthetic amounts are
  continuous, so exact-equality matching would be a 0-row fixture.

Invariant tests in tests/test_round40.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

# ------------------------------------------- rolling 7d distinct

_ROLL_DAYS = 7


def _events_rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.col("ts").cast("timestamp")).alias("day")
    )
    ud = ev.distinct()
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"), F.date_add(F.col("day"), _ROLL_DAYS - 1)
            )
        ).alias("window_day"),
    )
    # only emit days that actually occur in the data (the oracle's
    # day spine) — join against the distinct observed days.
    days = ev.select(F.col("day").alias("window_day")).distinct()
    return (
        contrib.join(F.broadcast(days), "window_day")
        .groupBy("window_day")
        .agg(F.countDistinct("user_id").cast("long").alias("active_users_7d"))
        .select(
            F.col("window_day").cast("string").alias("window_day"),
            "active_users_7d",
        )
        .orderBy("window_day")
    )


ROLLING_7D_SQL = f"""
WITH ud AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
spine AS (SELECT DISTINCT day FROM ud)
SELECT CAST(s.day AS VARCHAR) AS window_day,
       CAST(count(DISTINCT u.user_id) AS BIGINT) AS active_users_7d
FROM spine s
JOIN ud u
  ON u.day <= s.day AND u.day > s.day - {_ROLL_DAYS}
GROUP BY s.day ORDER BY window_day
"""


# ------------------------------------------- count-min sketch

_CMS_ROWS = 4
_CMS_WIDTH = 256
_CMS_TOP = 20


def _cms_bucket(term: F.Column, row: int) -> F.Column:
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"r{row}:"), term)), 1, 8), 16, 10)
        .cast("long")
        % _CMS_WIDTH
    )


def _sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    # the 4x256 counter table — mergeable, constant-size, broadcastable
    counters = (
        tok.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            _cms_bucket(F.col("term"), r).alias("b"),
                        )
                        for r in range(_CMS_ROWS)
                    ]
                )
            ).alias("rb")
        )
        .groupBy("rb.r", "rb.b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), "term")
        .limit(_CMS_TOP)
    )
    probes = exact.select(
        "term",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cms_bucket(F.col("term"), r).alias("b"),
                    )
                    for r in range(_CMS_ROWS)
                ]
            )
        ).alias("rb"),
    ).select("term", "exact_count", "rb.r", "rb.b")
    return (
        probes.join(F.broadcast(counters), ["r", "b"])
        .groupBy("term", "exact_count")
        .agg(F.min("c").cast("long").alias("cms_estimate"))
        .select(
            "term",
            F.col("exact_count").cast("long").alias("exact_count"),
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count"))
            .cast("long")
            .alias("overcount"),
        )
        .orderBy(F.desc("exact_count"), "term")
    )


def _cms_bucket_sql(term: str, row: int) -> str:
    return f"('0x' || substring(md5('r{row}:' || {term}), 1, 8))::BIGINT % {_CMS_WIDTH}"


def _cms_oracle() -> str:
    counter_rows = " UNION ALL ".join(
        f"SELECT {r} AS r, {_cms_bucket_sql('term', r)} AS b FROM tok2"
        for r in range(_CMS_ROWS)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT term, exact_count, {r} AS r, {_cms_bucket_sql('term', r)} AS b FROM exact"
        for r in range(_CMS_ROWS)
    )
    return f"""
WITH tok AS (
    SELECT unnest(string_split(text, ' ')) AS term FROM documents),
tok2 AS (SELECT term FROM tok WHERE term != ''),
rb AS ({counter_rows}),
counters AS (SELECT r, b, count(*) AS c FROM rb GROUP BY r, b),
exact AS (
    SELECT term, CAST(count(*) AS BIGINT) AS exact_count
    FROM tok2 GROUP BY term
    ORDER BY exact_count DESC, term LIMIT {_CMS_TOP}),
probes AS ({probe_rows}),
est AS (
    SELECT p.term, p.exact_count, min(c.c) AS cms_estimate
    FROM probes p JOIN counters c ON p.r = c.r AND p.b = c.b
    GROUP BY p.term, p.exact_count)
SELECT term, exact_count,
       CAST(cms_estimate AS BIGINT) AS cms_estimate,
       CAST(cms_estimate - exact_count AS BIGINT) AS overcount
FROM est ORDER BY exact_count DESC, term
"""


# ------------------------------------------- cohort LTV curve


def _orders_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("od"),
        F.col("o_totalprice"),
    )
    firsts = o.groupBy("o_custkey").agg(F.min("od").alias("first_od"))
    aged = o.join(firsts, "o_custkey").select(
        F.date_format("first_od", "yyyy-MM").alias("cohort_month"),
        (
            (F.year("od") - F.year("first_od")) * 12
            + (F.month("od") - F.month("first_od"))
        )
        .cast("long")
        .alias("age_months"),
        "o_totalprice",
    )
    # all money in integer cents: sums become association-order-free
    # (double summation order differs between engines and between
    # Spark's partial aggregates and DuckDB's), so the curve is exact.
    per_age = aged.groupBy("cohort_month", "age_months").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_cents"),
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_age.withColumn("cum_cents", F.sum("rev_cents").over(w))
        .select(
            "cohort_month",
            "age_months",
            "n_orders",
            (F.col("rev_cents") / 100.0).alias("revenue"),
            (F.col("cum_cents") / 100.0).alias("cum_revenue"),
        )
        .orderBy("cohort_month", "age_months")
    )


COHORT_LTV_SQL = """
WITH o AS (
    SELECT o_custkey, CAST(o_orderdate AS DATE) AS od, o_totalprice
    FROM orders),
firsts AS (
    SELECT o_custkey, min(od) AS first_od FROM o GROUP BY o_custkey),
aged AS (
    SELECT strftime(f.first_od, '%Y-%m') AS cohort_month,
           CAST((year(o.od) - year(f.first_od)) * 12
                + (month(o.od) - month(f.first_od)) AS BIGINT) AS age_months,
           o.o_totalprice
    FROM o JOIN firsts f ON o.o_custkey = f.o_custkey),
per_age AS (
    SELECT cohort_month, age_months,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS rev_cents
    FROM aged GROUP BY cohort_month, age_months)
SELECT cohort_month, age_months, n_orders,
       rev_cents / 100.0 AS revenue,
       CAST(sum(rev_cents) OVER (
           PARTITION BY cohort_month ORDER BY age_months
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           / 100.0 AS cum_revenue
FROM per_age ORDER BY cohort_month, age_months
"""


# ------------------------------------------- similar payments

_DUP_WINDOW_DAYS = 30
_DUP_REL_DENOM = 50  # |a-b| * 50 <= min(a,b)  <=>  diff <= 2%


def _orders_similar_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.to_date("o_orderdate").alias("od"),
    )
    a = o.alias("a")
    b = o.alias("b")
    diff = F.abs(F.col("a.cents") - F.col("b.cents"))
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .filter(
            diff * _DUP_REL_DENOM <= F.least(F.col("a.cents"), F.col("b.cents"))
        )
        .withColumn(
            "gap_days",
            F.abs(F.datediff(F.col("b.od"), F.col("a.od"))).cast("long"),
        )
        .filter(F.col("gap_days") <= _DUP_WINDOW_DAYS)
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.o_orderkey").alias("orderkey_a"),
            F.col("b.o_orderkey").alias("orderkey_b"),
            F.col("a.cents").alias("cents_a"),
            F.col("b.cents").alias("cents_b"),
            "gap_days",
        )
        .orderBy("custkey", "orderkey_a", "orderkey_b")
    )


SIMILAR_PAYMENTS_SQL = f"""
WITH o AS (
    SELECT o_orderkey, o_custkey,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
           CAST(o_orderdate AS DATE) AS od
    FROM orders)
SELECT a.o_custkey AS custkey,
       a.o_orderkey AS orderkey_a,
       b.o_orderkey AS orderkey_b,
       a.cents AS cents_a,
       b.cents AS cents_b,
       CAST(abs(date_diff('day', a.od, b.od)) AS BIGINT) AS gap_days
FROM o a
JOIN o b
  ON a.o_custkey = b.o_custkey
 AND a.o_orderkey < b.o_orderkey
WHERE abs(a.cents - b.cents) * {_DUP_REL_DENOM} <= least(a.cents, b.cents)
  AND abs(date_diff('day', a.od, b.od)) <= {_DUP_WINDOW_DAYS}
ORDER BY custkey, orderkey_a, orderkey_b
"""


QUERIES: dict[str, QuerySpec] = {
    "events_rolling_7d_active_users": QuerySpec(
        _events_rolling_7d_active_users, ROLLING_7D_SQL
    ),
    "sketch_cms_heavy_hitters": QuerySpec(_sketch_cms_heavy_hitters, _cms_oracle()),
    "orders_cohort_ltv_curve": QuerySpec(_orders_cohort_ltv_curve, COHORT_LTV_SQL),
    "orders_similar_payments": QuerySpec(
        _orders_similar_payments, SIMILAR_PAYMENTS_SQL
    ),
}
