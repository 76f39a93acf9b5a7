"""Round-7 additions, eleventh batch: interval coalescing and Wilson
confidence intervals.

- ``orders_interval_coalesce``: union of overlapping per-customer
  activity intervals (each order opens a 7-day window) — the interval
  COALESCE the range join family lacks (range join pairs rows;
  coalesce merges them). Island detection via the classic running-max
  of previous interval ends (customer-partitioned windows, all integer
  day arithmetic); emits per-customer interval count and exact covered
  days.
- ``lineitem_return_rate_wilson``: monthly return-rate with a Wilson
  score 95% interval — the binomial CI that stays inside [0,1] where
  the normal approximation doesn't. Counts are int64; the CI algebra
  is a fixed-order expression over (k, n) with literal z=1.96, and
  IEEE sqrt/division are bit-identical across engines.

Invariant tests in tests/test_round49.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

# ------------------------------------------- interval coalesce

_IVL_DAYS = 7
_IVL_EPOCH = "1990-01-01"


def _orders_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit(_IVL_EPOCH).cast("date"))
        .cast("long")
        .alias("s"),
    )
    # No dropDuplicates: e = s + _IVL_DAYS is a function of s, so a
    # duplicate (custkey, s) row always lands in its twin's island with
    # new_island = 0 and changes neither min(s) nor max(e) per island —
    # the dedup exchange was pure cost (r14 optimization, exact-equal
    # gated at 3 SFs; the oracle keeps its DISTINCT, same output).
    iv = o.select("o_custkey", "s", (F.col("s") + _IVL_DAYS).alias("e"))
    w = Window.partitionBy("o_custkey").orderBy("s", "e")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "new_island",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_island = islands.groupBy("o_custkey", "island").agg(
        F.min("s").alias("is_"), F.max("e").alias("ie")
    )
    return (
        per_island.groupBy(F.col("o_custkey").cast("long").alias("custkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum(F.col("ie") - F.col("is_")).cast("long").alias("covered_days"),
        )
        .orderBy("custkey")
    )


INTERVAL_COALESCE_SQL = f"""
WITH o AS (
    SELECT o_custkey,
           CAST(date_diff('day', DATE '{_IVL_EPOCH}',
                          CAST(o_orderdate AS DATE)) AS BIGINT) AS s
    FROM orders),
iv AS (
    SELECT DISTINCT o_custkey, s, s + {_IVL_DAYS} AS e FROM o),
flagged AS (
    SELECT o_custkey, s, e,
           CASE WHEN max(e) OVER (PARTITION BY o_custkey ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL
                  OR s > max(e) OVER (PARTITION BY o_custkey ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                THEN 1 ELSE 0 END AS new_island
    FROM iv),
islands AS (
    SELECT o_custkey, s, e,
           sum(new_island) OVER (PARTITION BY o_custkey ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
    FROM flagged),
per_island AS (
    SELECT o_custkey, island, min(s) AS is_, max(e) AS ie
    FROM islands GROUP BY o_custkey, island)
SELECT CAST(o_custkey AS BIGINT) AS custkey,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(ie - is_) AS BIGINT) AS covered_days
FROM per_island GROUP BY o_custkey ORDER BY custkey
"""


# ------------------------------------------- Wilson CI

_WILSON_Z = 1.96


def _lineitem_return_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        F.date_format(F.to_date("l_shipdate"), "yyyy-MM").alias("month"),
        (F.col("l_returnflag") == "R").cast("long").alias("ret"),
    )
    counts = li.groupBy("month").agg(
        F.count(F.lit(1)).alias("n"), F.sum("ret").alias("k")
    )
    z = F.lit(_WILSON_Z)
    p = F.col("k") / F.col("n")
    denom = 1.0 + z * z / F.col("n")
    center = (p + z * z / (2.0 * F.col("n"))) / denom
    half = (
        z
        * F.sqrt(
            p * (1.0 - p) / F.col("n")
            + z * z / (4.0 * F.col("n") * F.col("n"))
        )
        / denom
    )
    return counts.select(
        "month",
        F.col("n").cast("long").alias("n_items"),
        F.col("k").cast("long").alias("n_returned"),
        F.round(p, 6).alias("rate"),
        F.round(center - half, 6).alias("wilson_lo"),
        F.round(center + half, 6).alias("wilson_hi"),
    ).orderBy("month")


WILSON_SQL = f"""
WITH counts AS (
    SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS month,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS k
    FROM lineitem GROUP BY month)
SELECT month, n AS n_items, k AS n_returned,
       round(k / CAST(n AS DOUBLE), 6) AS rate,
       round(((k / CAST(n AS DOUBLE)
               + {_WILSON_Z} * {_WILSON_Z} / (2.0 * n))
              / (1.0 + {_WILSON_Z} * {_WILSON_Z} / n))
             - ({_WILSON_Z} * sqrt(k / CAST(n AS DOUBLE)
                  * (1.0 - k / CAST(n AS DOUBLE)) / n
                  + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n))
                / (1.0 + {_WILSON_Z} * {_WILSON_Z} / n)), 6) AS wilson_lo,
       round(((k / CAST(n AS DOUBLE)
               + {_WILSON_Z} * {_WILSON_Z} / (2.0 * n))
              / (1.0 + {_WILSON_Z} * {_WILSON_Z} / n))
             + ({_WILSON_Z} * sqrt(k / CAST(n AS DOUBLE)
                  * (1.0 - k / CAST(n AS DOUBLE)) / n
                  + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n))
                / (1.0 + {_WILSON_Z} * {_WILSON_Z} / n)), 6) AS wilson_hi
FROM counts ORDER BY month
"""


QUERIES: dict[str, QuerySpec] = {
    "orders_interval_coalesce": QuerySpec(
        _orders_interval_coalesce, INTERVAL_COALESCE_SQL
    ),
    "lineitem_return_rate_wilson": QuerySpec(
        _lineitem_return_rate_wilson, WILSON_SQL
    ),
}
