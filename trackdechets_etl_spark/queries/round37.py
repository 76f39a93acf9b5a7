"""Round-6 additions, seventh batch: forecast backtesting and a
cross-table data-quality matrix.

- ``orders_seasonal_naive_backtest``: backtest of the seasonal-naive
  forecaster (predict month m's revenue with month m-12's) — per
  backtest year the MAPE and bias in exact cents until the final
  ratios. The eval harness every forecasting pipeline needs before
  anything fancier than naive ships; also the canonical "walk-forward
  eval as SQL" shape.
- ``dq_null_cardinality_matrix``: one row per (table, column) over
  the five dimension tables — row count, nulls, distinct count,
  max length — the cross-table profiling matrix that feeds ingest
  gates (the generalization of ``profile_orders`` from one table to
  a catalog sweep). Each table contributes one small aggregation;
  nothing joins.

Invariant tests in tests/test_round37.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

# ------------------------------------------- seasonal-naive backtest


def _orders_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue in exact cents; per month the year-ago value
    via an integer month-key self-join (month_key = y*12+m-1, lag 12);
    rolled up per backtest year: n months evaluated, MAPE, mean bias.
    Two tiny aggregations around one months-sized join."""
    o = read_table(spark, sf_dir, "orders").select(
        F.year(F.to_date("o_orderdate")).alias("y"),
        F.month(F.to_date("o_orderdate")).alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    monthly = o.groupBy("y", "m").agg(F.sum("cents").alias("rev"))
    cur = monthly.select(
        (F.col("y") * 12 + F.col("m") - 1).alias("k"), "y", "m", "rev"
    )
    prev = monthly.select(
        (F.col("y") * 12 + F.col("m") - 1 + 12).alias("k"),
        F.col("rev").alias("pred"),
    )
    j = cur.join(prev, "k")
    return (
        j.groupBy("y")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_months"),
            F.round(
                F.avg(
                    F.abs(F.col("rev") - F.col("pred"))
                    / F.col("rev").cast("double")
                ),
                6,
            ).alias("mape"),
            F.round(
                F.avg(
                    (F.col("pred") - F.col("rev")) / F.col("rev").cast("double")
                ),
                6,
            ).alias("mean_bias"),
        )
        .orderBy("y")
    )


SEASONAL_NAIVE_SQL = """
WITH o AS (
    SELECT year(CAST(o_orderdate AS DATE)) AS y,
           month(CAST(o_orderdate AS DATE)) AS m,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders),
monthly AS (
    SELECT y, m, CAST(sum(cents) AS BIGINT) AS rev
    FROM o GROUP BY y, m),
cur AS (SELECT y * 12 + m - 1 AS k, y, m, rev FROM monthly),
prev AS (SELECT y * 12 + m - 1 + 12 AS k, rev AS pred FROM monthly),
j AS (SELECT cur.y, cur.rev, prev.pred FROM cur JOIN prev USING (k))
SELECT y,
       CAST(count(*) AS BIGINT) AS n_months,
       round(avg(abs(rev - pred) / CAST(rev AS DOUBLE)), 6) AS mape,
       round(avg((pred - rev) / CAST(rev AS DOUBLE)), 6) AS mean_bias
FROM j GROUP BY y ORDER BY y
"""


# ------------------------------------------- DQ matrix

_DQ_TABLES = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    # string/int columns only: double->string rendering is not
    # engine-stable (scientific-notation thresholds differ), so money
    # columns are profiled via their cent casts elsewhere.
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size"],
}


def _dq_null_cardinality_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (table, column): rows, nulls, distincts, max string length
    (cast-through for numerics, the profiling convention). One
    aggregation per table, a union of tiny frames."""
    out = None
    for t, cols in _DQ_TABLES.items():
        df = read_table(spark, sf_dir, t)
        for c in cols:
            v = F.col(c).cast("string")
            agg = df.agg(
                F.lit(t).alias("table_name"),
                F.lit(c).alias("column_name"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_nulls"),
                F.countDistinct(v).cast("long").alias("n_distinct"),
                F.max(F.length(v)).cast("long").alias("max_len"),
            )
            out = agg if out is None else out.unionByName(agg)
    return out.orderBy("table_name", "column_name")


def _dq_sql() -> str:
    selects = []
    for t, cols in _DQ_TABLES.items():
        for c in cols:
            selects.append(
                f"""(SELECT '{t}' AS table_name, '{c}' AS column_name,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_nulls,
                CAST(count(DISTINCT CAST({c} AS VARCHAR)) AS BIGINT)
                    AS n_distinct,
                CAST(max(length(CAST({c} AS VARCHAR))) AS BIGINT) AS max_len
                FROM {t})"""
            )
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(selects)
        + ") ORDER BY table_name, column_name"
    )


QUERIES: dict[str, QuerySpec] = {
    "orders_seasonal_naive_backtest": QuerySpec(
        _orders_seasonal_naive_backtest, SEASONAL_NAIVE_SQL
    ),
    "dq_null_cardinality_matrix": QuerySpec(
        _dq_null_cardinality_matrix, _dq_sql()
    ),
}
