"""Round-7 additions, ninth batch: one-way ANOVA and exact per-group
shipping-delay percentiles.

- ``lineitem_anova_returnflag``: one-way ANOVA of quantity across the
  three return flags — between/within sums of squares and the F
  statistic, all derived from int64 conditional sums (n, Σy, Σy² per
  KNOWN flag in ONE aggregation row), so every float expression has a
  fixed association order and both engines emit identical doubles.
  The hypothesis-test companion to the chi-square cells.
- ``lineitem_ship_delay_percentiles``: exact p50/p95 of the
  order-to-ship delay per supplier nation — rank/count windows
  partitioned by nation (no global stage, no approx sketch), the
  percentile row located by integer position arithmetic
  (pos_q = ceil(n·q/100) via div). The operational latency SLA
  readout, exact where percentile_approx is a sketch.

Invariant tests in tests/test_round47.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

# ------------------------------------------- one-way ANOVA

_FLAGS = ["A", "N", "R"]


def _lineitem_anova_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("y")
    )
    aggs = [F.count(F.lit(1)).alias("n_total"), F.sum("y").alias("s_total")]
    for f in _FLAGS:
        cond = F.col("l_returnflag") == f
        aggs += [
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"n_{f}"),
            F.sum(F.when(cond, F.col("y")).otherwise(0)).alias(f"s_{f}"),
        ]
    aggs.append(F.sum(F.col("y") * F.col("y")).alias("ss_total_raw"))
    sums = li.agg(*aggs)
    # fixed-order float algebra: A then N then R, grand term last.
    # Each int64 sum is cast to double BEFORE squaring: s_total grows
    # ~1.5e8 per sf, so the long*long square overflows int64 around
    # sf>=20 (ANSI Spark throws). double*double is exact to 2^53 and
    # degrades gracefully past it; the oracle mirrors the cast.
    sA, sN, sR = (F.col(f"s_{f}").cast("double") for f in _FLAGS)
    sT = F.col("s_total").cast("double")
    ssb = (
        sA * sA / F.col("n_A")
        + sN * sN / F.col("n_N")
        + sR * sR / F.col("n_R")
        - sT * sT / F.col("n_total")
    )
    sst = F.col("ss_total_raw") - sT * sT / F.col("n_total")
    ssw = sst - ssb
    k = len(_FLAGS)
    f_stat = (ssb / (k - 1)) / (ssw / (F.col("n_total") - k))
    return sums.select(
        F.col("n_total").cast("long").alias("n_rows"),
        F.round(ssb, 4).alias("ss_between"),
        F.round(ssw, 4).alias("ss_within"),
        F.round(f_stat, 6).alias("f_stat"),
    )


ANOVA_SQL = """
WITH s AS (
    SELECT CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s_total,
           CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS s_a,
           CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_n,
           CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS s_n,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS s_r,
           CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS ss_raw
    FROM lineitem),
d AS (
    SELECT n_total,
           CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
             + CAST(s_n AS DOUBLE) * CAST(s_n AS DOUBLE) / CAST(n_n AS DOUBLE)
             + CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE) / CAST(n_r AS DOUBLE)
             - CAST(s_total AS DOUBLE) * CAST(s_total AS DOUBLE) / CAST(n_total AS DOUBLE) AS ssb,
           ss_raw - CAST(s_total AS DOUBLE) * CAST(s_total AS DOUBLE) / CAST(n_total AS DOUBLE) AS sst
    FROM s)
SELECT n_total AS n_rows,
       round(ssb, 4) AS ss_between,
       round(sst - ssb, 4) AS ss_within,
       round((ssb / 2) / ((sst - ssb) / (n_total - 3)), 6) AS f_stat
FROM d
"""


# ------------------------------------------- delay percentiles


def _lineitem_ship_delay_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", F.to_date("l_shipdate").alias("sd")
    )
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    s = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"),
        F.col("s_nationkey").alias("nationkey"),
    )
    d = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, "l_suppkey")
        .select(
            "nationkey", F.datediff("sd", "od").cast("long").alias("delay")
        )
    )
    w = Window.partitionBy("nationkey").orderBy("delay")
    wn = Window.partitionBy("nationkey")
    r = d.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    pos50 = F.expr("(n * 50 + 99) div 100")
    pos95 = F.expr("(n * 95 + 99) div 100")
    return (
        r.groupBy(F.col("nationkey").cast("long").alias("nationkey"))
        .agg(
            F.first("n").cast("long").alias("n_items"),
            F.min(F.when(F.col("rn") == pos50, F.col("delay"))).alias("p50_days"),
            F.min(F.when(F.col("rn") == pos95, F.col("delay"))).alias("p95_days"),
            F.max("delay").alias("max_days"),
        )
        .orderBy("nationkey")
    )


SHIP_DELAY_PCT_SQL = """
WITH d AS (
    SELECT s.s_nationkey AS nationkey,
           CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                          CAST(l.l_shipdate AS DATE)) AS BIGINT) AS delay
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey),
r AS (
    SELECT nationkey, delay,
           row_number() OVER (PARTITION BY nationkey ORDER BY delay) AS rn,
           count(*) OVER (PARTITION BY nationkey) AS n
    FROM d)
SELECT CAST(nationkey AS BIGINT) AS nationkey,
       CAST(min(n) AS BIGINT) AS n_items,
       min(CASE WHEN rn = (n * 50 + 99) // 100 THEN delay END) AS p50_days,
       min(CASE WHEN rn = (n * 95 + 99) // 100 THEN delay END) AS p95_days,
       max(delay) AS max_days
FROM r GROUP BY nationkey ORDER BY nationkey
"""


QUERIES: dict[str, QuerySpec] = {
    "lineitem_anova_returnflag": QuerySpec(
        _lineitem_anova_returnflag, ANOVA_SQL
    ),
    "lineitem_ship_delay_percentiles": QuerySpec(
        _lineitem_ship_delay_percentiles, SHIP_DELAY_PCT_SQL
    ),
}
