"""Round-5 additions, seventh batch: model/data monitoring and
survival analysis.

- ``dq_profile_drift``: population-stability-index (PSI) drift report
  between an early and a late order period over fixed price buckets —
  the standard production ML monitoring metric. Counts are exact
  integers with Laplace smoothing, so only the final ln terms are
  floats (rounded at 6).
- ``orders_survival_km``: Kaplan–Meier estimator of time-to-reorder —
  per-customer duration from first to second order, right-censored at
  the corpus max date. The product-limit curve is computed as
  ``exp(Σ ln(1 − e_i/n_i))`` over an ordered window, so both engines
  accumulate in identical (duration) order; risk sets come from exact
  cumulative integer sums.

All pure DataFrame algebra with exact DuckDB twins; invariant tests in
tests/test_round12.py. Extensions beyond the reference DAGs, same
oracle discipline as the §2 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

# -------------------------------------------------------------- PSI drift

_PSI_CUTOFF = "1998-01-01"  # orders span 1995-2001; early vs late period
_PSI_BUCKET_W = 60_000
_PSI_BUCKETS = 10


def _dq_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI drift of the order-price distribution between the early
    (< 1998) and late (≥ 1998) period, over 10 fixed-width price
    buckets. Fixed bins (not period-A quantiles) keep the metric
    engine-exact end-to-end: bucket counts are integers, the shares
    use Laplace smoothing (c+1)/(n+K) so no bucket is empty, and
    ``psi_term = (p_b − p_a)·ln(p_b/p_a)`` rounds at 6. One scan, one
    K-row aggregation — monitoring never touches fact-sized state. At
    100 TB the two periods are partition-pruned scans of the same
    table."""
    o = read_table(spark, sf_dir, "orders")
    cutoff = F.lit(_PSI_CUTOFF).cast("timestamp")
    bucketed = o.select(
        F.least(
            F.floor(F.col("o_totalprice") / _PSI_BUCKET_W),
            F.lit(_PSI_BUCKETS - 1),
        )
        .cast("int")
        .alias("bucket"),
        (F.col("o_orderdate") < cutoff).alias("is_a"),
    )
    counts = bucketed.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("n_b"),
    )
    tot = counts.agg(
        F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b")
    )
    p_a = (F.col("n_a") + 1).cast("double") / (
        F.col("tot_a") + _PSI_BUCKETS
    ).cast("double")
    p_b = (F.col("n_b") + 1).cast("double") / (
        F.col("tot_b") + _PSI_BUCKETS
    ).cast("double")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(p_a, 6).alias("share_a"),
            F.round(p_b, 6).alias("share_b"),
            F.round((p_b - p_a) * F.log(p_b / p_a), 6).alias("psi_term"),
        )
        .orderBy("bucket")
    )


DQ_PSI_SQL = f"""
WITH bucketed AS (
    SELECT CAST(least(floor(o_totalprice / {_PSI_BUCKET_W}),
                      {_PSI_BUCKETS - 1}) AS INTEGER) AS bucket,
           o_orderdate < TIMESTAMP '{_PSI_CUTOFF}' AS is_a
    FROM orders),
counts AS (
    SELECT bucket,
           sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS n_a,
           sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS n_b
    FROM bucketed GROUP BY bucket),
tot AS (SELECT sum(n_a) AS tot_a, sum(n_b) AS tot_b FROM counts)
SELECT bucket,
       CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       round(CAST(n_a + 1 AS DOUBLE) / CAST(tot_a + {_PSI_BUCKETS} AS DOUBLE),
             6) AS share_a,
       round(CAST(n_b + 1 AS DOUBLE) / CAST(tot_b + {_PSI_BUCKETS} AS DOUBLE),
             6) AS share_b,
       round((CAST(n_b + 1 AS DOUBLE) / CAST(tot_b + {_PSI_BUCKETS} AS DOUBLE)
              - CAST(n_a + 1 AS DOUBLE) / CAST(tot_a + {_PSI_BUCKETS} AS DOUBLE))
             * ln((CAST(n_b + 1 AS DOUBLE) / CAST(tot_b + {_PSI_BUCKETS} AS DOUBLE))
                  / (CAST(n_a + 1 AS DOUBLE)
                     / CAST(tot_a + {_PSI_BUCKETS} AS DOUBLE))), 6)
           AS psi_term
FROM counts, tot
ORDER BY bucket
"""


# ------------------------------------------------------ Kaplan–Meier


def _orders_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier time-to-reorder curve: duration = days from a
    customer's first to second order, right-censored at the corpus max
    order date for one-order customers. Per distinct duration d:
    events e_d, exits (events + censors) x_d, risk set
    ``n_d = N − Σ_{t<d} x_t`` (exact integer cumulative window), and
    ``S(d) = exp(Σ_{t≤d} ln(1 − e_t/n_t))`` — the ordered-window log
    sum makes the float accumulation order identical in both engines.
    Fact work ends at the per-customer first/second aggregation; the
    curve itself is |distinct durations|-sized."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = o.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") <= 2)
    maxd = o.agg(F.max(F.to_date("o_orderdate")).alias("maxd"))
    per_cust = (
        ranked.groupBy("o_custkey")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("d"))).alias("d1"),
            F.min(F.when(F.col("rn") == 2, F.col("d"))).alias("d2"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            F.when(
                F.col("d2").isNotNull(), F.datediff("d2", "d1")
            )
            .otherwise(F.datediff("maxd", "d1"))
            .alias("dur"),
            F.col("d2").isNotNull().alias("observed"),
        )
    )
    at_time = per_cust.groupBy("dur").agg(
        F.sum(F.when(F.col("observed"), 1).otherwise(0)).alias("e"),
        F.count(F.lit(1)).alias("x"),
    )
    n_total = per_cust.agg(F.count(F.lit(1)).alias("n_tot"))
    w_prev = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        at_time.crossJoin(F.broadcast(n_total))
        .withColumn(
            "n_risk",
            F.col("n_tot") - F.coalesce(F.sum("x").over(w_prev), F.lit(0)),
        )
        .withColumn(
            # guard the terminal e == n_risk row: ln(0) is NULL in
            # Spark but -inf in DuckDB — keep the term NULL (both
            # engines' window sum skips NULLs identically) and pin
            # that row's survival to exact 0 below.
            "lnterm",
            F.when(
                F.col("e") < F.col("n_risk"),
                F.log(
                    1.0
                    - F.col("e").cast("double")
                    / F.col("n_risk").cast("double")
                ),
            ),
        )
        .withColumn(
            "survival",
            F.when(
                F.col("e") < F.col("n_risk"),
                F.exp(F.sum("lnterm").over(w_cum)),
            ).otherwise(F.lit(0.0)),
        )
    )
    return (
        curve.filter(F.col("e") > 0)
        .select(
            F.col("dur").cast("int").alias("dur_days"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("e").cast("long").alias("n_events"),
            F.round("survival", 6).alias("survival"),
        )
        .orderBy("dur_days")
    )


ORDERS_KM_SQL = """
WITH ranked AS (
    SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS rn
    FROM orders),
maxd AS (SELECT max(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
per_cust AS (
    SELECT o_custkey,
           min(CASE WHEN rn = 1 THEN d END) AS d1,
           min(CASE WHEN rn = 2 THEN d END) AS d2
    FROM ranked WHERE rn <= 2 GROUP BY o_custkey),
durs AS (
    SELECT CASE WHEN d2 IS NOT NULL THEN date_diff('day', d1, d2)
               ELSE date_diff('day', d1, maxd) END AS dur,
           d2 IS NOT NULL AS observed
    FROM per_cust, maxd),
at_time AS (
    SELECT dur,
           sum(CASE WHEN observed THEN 1 ELSE 0 END) AS e,
           count(*) AS x
    FROM durs GROUP BY dur),
n_total AS (SELECT count(*) AS n_tot FROM durs),
curve AS (
    SELECT dur, e, x,
           n_tot - coalesce(sum(x) OVER (ORDER BY dur
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), 0) AS n_risk
    FROM at_time, n_total),
terms AS (
    SELECT dur, e, n_risk,
           CASE WHEN e < n_risk
                THEN ln(1.0 - CAST(e AS DOUBLE) / CAST(n_risk AS DOUBLE))
           END AS lnterm
    FROM curve),
surv AS (
    SELECT dur, e, n_risk,
           CASE WHEN e < n_risk
                THEN exp(sum(lnterm)
                         OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING))
                ELSE 0.0 END AS survival
    FROM terms)
SELECT CAST(dur AS INTEGER) AS dur_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(e AS BIGINT) AS n_events,
       round(survival, 6) AS survival
FROM surv WHERE e > 0
ORDER BY dur_days
"""


QUERIES: dict[str, QuerySpec] = {
    "dq_profile_drift": QuerySpec(_dq_profile_drift, DQ_PSI_SQL),
    "orders_survival_km": QuerySpec(_orders_survival_km, ORDERS_KM_SQL),
}
