"""Round-5 additions, twenty-first batch: market concentration and
pricing analytics.

- ``supplier_share_hhi``: Herfindahl–Hirschman concentration index of
  supplier revenue per nation — Σ share² over exact cent totals, the
  antitrust/market-structure readout. Only the final squares are
  floats (rounded at 6).
- ``lineitem_discount_uplift``: average quantity and revenue per
  discount band (the 11 exact percent levels), with the uplift of
  each band's mean quantity over the zero-discount baseline — the
  first-order price-response readout. Quantities are integral in this
  corpus, so every aggregate is integer-exact until the final
  ratios.

Invariant tests in tests/test_round26.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

# ------------------------------------------------------------- HHI


def _supplier_share_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per supplier nation: revenue cents by supplier (exact), nation
    total (exact), HHI = Σ (supplier share)² rounded at 6, with the
    1/n lower bound as context. Fact work ends at the
    (nation, supplier) rollup; the HHI sum runs over supplier-sized
    frames."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    per_supp = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "s_suppkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    tot = per_supp.groupBy("s_nationkey").agg(
        F.sum("cents").alias("nation_cents"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    hhi = (
        per_supp.join(tot, "s_nationkey")
        .groupBy("s_nationkey", "nation_cents", "n_suppliers")
        .agg(
            F.round(
                F.sum(
                    (F.col("cents") / F.col("nation_cents").cast("double"))
                    * (F.col("cents") / F.col("nation_cents").cast("double"))
                ),
                6,
            ).alias("hhi")
        )
    )
    return (
        hhi.join(
            F.broadcast(n), hhi.s_nationkey == n.n_nationkey
        )
        .select(
            "n_name",
            F.col("n_suppliers").cast("long").alias("n_suppliers"),
            F.col("nation_cents").alias("revenue_cents"),
            "hhi",
            F.round(1.0 / F.col("n_suppliers"), 6).alias("hhi_floor"),
        )
        .orderBy("n_name")
    )


SUPPLIER_HHI_SQL = """
WITH per_supp AS (
    SELECT s_nationkey, s_suppkey,
           sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS cents
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY 1, 2),
tot AS (
    SELECT s_nationkey, sum(cents) AS nation_cents,
           count(*) AS n_suppliers
    FROM per_supp GROUP BY 1),
hhi AS (
    SELECT p.s_nationkey, nation_cents, n_suppliers,
           round(sum((p.cents / CAST(nation_cents AS DOUBLE))
                     * (p.cents / CAST(nation_cents AS DOUBLE))), 6) AS hhi
    FROM per_supp p JOIN tot USING (s_nationkey)
    GROUP BY 1, 2, 3)
SELECT n_name,
       CAST(n_suppliers AS BIGINT) AS n_suppliers,
       CAST(nation_cents AS BIGINT) AS revenue_cents,
       hhi,
       round(1.0 / n_suppliers, 6) AS hhi_floor
FROM hhi JOIN nation ON s_nationkey = n_nationkey
ORDER BY n_name
"""


# ------------------------------------------------- discount uplift


def _lineitem_discount_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per exact discount level (cents of discount percent): count,
    mean quantity, mean revenue cents, and mean-quantity uplift vs
    the zero-discount band (1-row broadcast). One scan to an 11-row
    aggregate."""
    li = read_table(spark, sf_dir, "lineitem")
    banded = li.select(
        F.round(F.col("l_discount") * 100).cast("int").alias("disc_pct"),
        F.round(F.col("l_quantity")).cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    per_band = banded.groupBy("disc_pct").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("qty").alias("sum_qty"),
        F.sum("cents").alias("sum_cents"),
    )
    base = per_band.filter(F.col("disc_pct") == 0).select(
        F.col("sum_qty").alias("b_qty"), F.col("n_items").alias("b_n")
    )
    return (
        per_band.crossJoin(F.broadcast(base))
        .select(
            "disc_pct",
            "n_items",
            F.round(F.col("sum_qty") / F.col("n_items").cast("double"), 6).alias(
                "avg_qty"
            ),
            F.round(
                F.col("sum_cents") / F.col("n_items").cast("double"), 6
            ).alias("avg_cents"),
            F.round(
                (F.col("sum_qty") / F.col("n_items").cast("double"))
                / (F.col("b_qty") / F.col("b_n").cast("double")),
                6,
            ).alias("qty_uplift"),
        )
        .orderBy("disc_pct")
    )


LINEITEM_DISCOUNT_SQL = """
WITH banded AS (
    SELECT CAST(round(l_discount * 100, 0) AS INTEGER) AS disc_pct,
           CAST(round(l_quantity, 0) AS BIGINT) AS qty,
           CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
    FROM lineitem),
per_band AS (
    SELECT disc_pct, CAST(count(*) AS BIGINT) AS n_items,
           sum(qty) AS sum_qty, sum(cents) AS sum_cents
    FROM banded GROUP BY 1),
base AS (
    SELECT sum_qty AS b_qty, n_items AS b_n FROM per_band WHERE disc_pct = 0)
SELECT disc_pct, n_items,
       round(sum_qty / CAST(n_items AS DOUBLE), 6) AS avg_qty,
       round(sum_cents / CAST(n_items AS DOUBLE), 6) AS avg_cents,
       round((sum_qty / CAST(n_items AS DOUBLE))
             / (b_qty / CAST(b_n AS DOUBLE)), 6) AS qty_uplift
FROM per_band, base
ORDER BY disc_pct
"""


QUERIES: dict[str, QuerySpec] = {
    "supplier_share_hhi": QuerySpec(_supplier_share_hhi, SUPPLIER_HHI_SQL),
    "lineitem_discount_uplift": QuerySpec(
        _lineitem_discount_uplift, LINEITEM_DISCOUNT_SQL
    ),
}
