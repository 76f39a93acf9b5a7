"""Round-5 additions, fourteenth batch: customer value migration.

- ``orders_customer_migration``: year-over-year revenue-decile
  transition matrix — each customer's within-year revenue decile
  (ntile 10, fully tie-broken), joined to the next year's decile,
  with decile 0 standing for "churned" (no orders next year). The
  customer-value migration readout behind retention planning; all
  counts exact integers.

Invariant tests in tests/test_round19.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

_MIG_DECILES = 10


def _orders_customer_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (year, customer): exact revenue cents → within-year decile
    (ntile over revenue desc, ties by custkey — deterministic). The
    migration join matches (year, cust) to (year+1, cust); customers
    with no next-year orders land in to_decile 0 (churn). Fact work
    ends at the (year, cust) rollup; deciles and the transition
    counts run on customer-year-sized frames, and the output is at
    most |years|×11×10 rows."""
    o = read_table(spark, sf_dir, "orders")
    per_cy = o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"), "o_custkey"
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    w = Window.partitionBy("yr").orderBy(F.desc("cents"), "o_custkey")
    dec = per_cy.withColumn(
        "decile", F.ntile(_MIG_DECILES).over(w).cast("int")
    )
    nxt = dec.select(
        (F.col("yr") - 1).alias("yr_match"),
        F.col("o_custkey").alias("cust2"),
        F.col("decile").alias("to_decile"),
    )
    max_yr = per_cy.agg(F.max("yr").alias("max_yr"))
    trans = (
        dec.join(
            nxt,
            (F.col("yr") == F.col("yr_match"))
            & (F.col("o_custkey") == F.col("cust2")),
            "left",
        )
        .crossJoin(F.broadcast(max_yr))
        .filter(F.col("yr") < F.col("max_yr"))  # last year has no "next"
        .select(
            F.col("yr").alias("year"),
            F.col("decile").alias("from_decile"),
            F.coalesce("to_decile", F.lit(0)).cast("int").alias("to_decile"),
        )
    )
    return (
        trans.groupBy("year", "from_decile", "to_decile")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("year", "from_decile", "to_decile")
    )


ORDERS_MIGRATION_SQL = f"""
WITH per_cy AS (
    SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, o_custkey,
           sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
    FROM orders GROUP BY 1, 2),
dec AS (
    SELECT yr, o_custkey,
           CAST(ntile({_MIG_DECILES})
                OVER (PARTITION BY yr ORDER BY cents DESC, o_custkey)
                AS INTEGER) AS decile
    FROM per_cy),
mx AS (SELECT max(yr) AS max_yr FROM per_cy)
SELECT a.yr AS year, a.decile AS from_decile,
       CAST(coalesce(b.decile, 0) AS INTEGER) AS to_decile,
       CAST(count(*) AS BIGINT) AS n_customers
FROM dec a
LEFT JOIN dec b ON b.yr = a.yr + 1 AND b.o_custkey = a.o_custkey, mx
WHERE a.yr < max_yr
GROUP BY 1, 2, 3
ORDER BY year, from_decile, to_decile
"""


QUERIES: dict[str, QuerySpec] = {
    "orders_customer_migration": QuerySpec(
        _orders_customer_migration, ORDERS_MIGRATION_SQL
    ),
}
