"""Round-7 additions, twelfth batch: single-scan correlation matrix.

- ``lineitem_pearson_corr_matrix``: pairwise Pearson correlations
  among quantity, discount, price, and tax — ALL six pairs from ONE
  scan's integer sums (quantity/discount-pct/price-dollars/tax-pct are
  integer-coded; products involving price accumulate in decimal(38,0)
  on the Spark side and DuckDB's HUGEINT on the oracle side, so no
  sum ever wraps). The only float math is the final fixed-order
  r = (nΣxy − ΣxΣy)/√((nΣxx − Σx²)(nΣyy − Σy²)) per pair — identical
  IEEE doubles on both engines. The feature-correlation sweep run
  before any model fit; adding columns adds sums, never scans.

Invariant tests in tests/test_round50.py.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

_VARS = ["qty", "disc", "price", "tax"]


def _lineitem_pearson_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc"),
        F.round(F.col("l_extendedprice") / 100).cast("long").alias("price"),
        F.round(F.col("l_tax") * 100).cast("long").alias("tax"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    aggs = [F.count(F.lit(1)).alias("n")]
    for v in _VARS:
        aggs.append(F.sum(v).alias(f"s_{v}"))
        aggs.append(F.sum(dec(v) * dec(v)).alias(f"ss_{v}"))
    for a, b in combinations(_VARS, 2):
        aggs.append(F.sum(dec(a) * dec(b)).alias(f"sp_{a}_{b}"))
    sums = li.agg(*aggs)

    def r_expr(a: str, b: str):
        n = F.col("n").cast("double")
        sa = F.col(f"s_{a}").cast("double")
        sb = F.col(f"s_{b}").cast("double")
        saa = F.col(f"ss_{a}").cast("double")
        sbb = F.col(f"ss_{b}").cast("double")
        sab = F.col(f"sp_{a}_{b}").cast("double")
        return (n * sab - sa * sb) / F.sqrt(
            (n * saa - sa * sa) * (n * sbb - sb * sb)
        )

    outs = [
        sums.select(
            F.lit(a).alias("var_a"),
            F.lit(b).alias("var_b"),
            F.round(r_expr(a, b), 6).alias("pearson_r"),
        )
        for a, b in combinations(_VARS, 2)
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("var_a", "var_b")


def _corr_oracle() -> str:
    cols = {
        "qty": "CAST(l_quantity AS BIGINT)",
        "disc": "CAST(round(l_discount * 100, 0) AS BIGINT)",
        "price": "CAST(round(l_extendedprice / 100, 0) AS BIGINT)",
        "tax": "CAST(round(l_tax * 100, 0) AS BIGINT)",
    }
    aggs = ["CAST(count(*) AS BIGINT) AS n"]
    for v, expr in cols.items():
        aggs.append(f"CAST(sum({expr}) AS BIGINT) AS s_{v}")
        aggs.append(f"sum({expr} * {expr}) AS ss_{v}")
    for a, b in combinations(_VARS, 2):
        aggs.append(f"sum({cols[a]} * {cols[b]}) AS sp_{a}_{b}")
    selects = []
    for a, b in combinations(_VARS, 2):
        r = (
            f"(CAST(n AS DOUBLE) * CAST(sp_{a}_{b} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
            f" / sqrt((CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
            f" * (CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE)"
            f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))"
        )
        selects.append(
            f"SELECT '{a}' AS var_a, '{b}' AS var_b, round({r}, 6) AS pearson_r FROM s"
        )
    body = " UNION ALL ".join(selects)
    return f"""
WITH s AS (SELECT {", ".join(aggs)} FROM lineitem)
SELECT * FROM ({body}) ORDER BY var_a, var_b
"""


QUERIES: dict[str, QuerySpec] = {
    "lineitem_pearson_corr_matrix": QuerySpec(
        _lineitem_pearson_corr_matrix, _corr_oracle()
    ),
}
