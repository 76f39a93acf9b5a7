"""Round-7 additions, fifteenth batch: chi-squared independence test,
Benford first-digit audit, Herfindahl supplier concentration.

- ``lineitem_chi2_independence``: Pearson chi-squared test of
  independence between ``l_returnflag`` and ``l_linestatus``. The
  contingency table, row/column totals and the grand total are integer
  hash aggregates; per-cell terms use the cross-multiplied exact form
  (O*N - R*C)^2 / (N*R*C) with the difference computed exactly in
  decimal(38,0) before one double square + division per cell, so the
  only floats are the six per-cell terms and their sum. Totals reach
  the plan as 1-row broadcast crossJoins — nothing eager, nothing
  driver-side.
- ``orders_benford_first_digit``: first-significant-digit distribution
  of ``o_totalprice`` against Benford's law. The digit comes from the
  integer cents (bigint→string, engine-stable — never from a
  double→string render); a static 1..9 digit spine left-joins the
  observed counts so absent digits still report. One scan, one
  9-row output at any scale.
- ``supplier_hhi_concentration``: Herfindahl-Hirschman index of
  supplier revenue concentration within each nation. Revenue is
  summed per (nation, supplier) in integer cents; HHI's numerator
  sum(share^2) = sum(cents^2)/total^2 is computed as an EXACT
  decimal(38,0) sum of squares divided once at the end — no float
  accumulation across suppliers. Supplier and nation dims broadcast.

Invariant tests in tests/test_round53.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

# ------------------------------------ chi-squared independence test


def _lineitem_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    )
    cells = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("o")
    )
    rt = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("r"))
    ct = li.groupBy("l_linestatus").agg(F.count(F.lit(1)).alias("c"))
    tot = li.agg(F.count(F.lit(1)).alias("n"))
    nr = rt.agg(F.count(F.lit(1)).alias("nr"))
    nc = ct.agg(F.count(F.lit(1)).alias("nc"))
    dec = "decimal(38,0)"
    j = (
        cells.join(F.broadcast(rt), "l_returnflag")
        .join(F.broadcast(ct), "l_linestatus")
        .crossJoin(F.broadcast(tot))
    )
    # exact integer difference O*N - R*C in decimal(38,0); squared in
    # double (squaring in decimal would overflow 38 digits long before
    # the double loses the exact integer), one division per cell
    diff = (
        F.col("o").cast(dec) * F.col("n").cast(dec)
        - F.col("r").cast(dec) * F.col("c").cast(dec)
    ).cast("double")
    den = (
        F.col("n").cast(dec) * F.col("r").cast(dec) * F.col("c").cast(dec)
    ).cast("double")
    term = diff * diff / den
    stat = j.agg(
        F.max("n").alias("n_rows"),
        F.sum(term).alias("chi2_raw"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    return (
        stat.crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(nc))
        .select(
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_cells").cast("long").alias("n_cells"),
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
            F.round("chi2_raw", 6).alias("chi2"),
        )
    )


CHI2_SQL = """
WITH cells AS (
    SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS o
    FROM lineitem GROUP BY 1, 2),
rt AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS r
       FROM lineitem GROUP BY 1),
ct AS (SELECT l_linestatus, CAST(count(*) AS BIGINT) AS c
       FROM lineitem GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem),
dims AS (SELECT (SELECT count(*) FROM rt) AS nr,
                (SELECT count(*) FROM ct) AS nc),
terms AS (
    SELECT n,
           CAST(CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c AS DOUBLE)
           * CAST(CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c AS DOUBLE)
           / CAST(CAST(n AS HUGEINT) * r * c AS DOUBLE) AS term
    FROM cells
    JOIN rt USING (l_returnflag)
    JOIN ct USING (l_linestatus)
    CROSS JOIN tot)
SELECT CAST(max(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST((SELECT (nr - 1) * (nc - 1) FROM dims) AS BIGINT) AS dof,
       round(sum(term), 6) AS chi2
FROM terms
"""


# --------------------------------------------- Benford first digit


def _orders_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    # first significant digit of the integer cents — bigint→string is
    # engine-stable (double→string is not)
    obs = (
        o.filter(F.col("cents") > 0)
        .select(
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    tot = obs.agg(F.sum("n_orders").alias("n_total"))
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    out = (
        spine.join(F.broadcast(obs), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n_orders"), F.lit(0))
            .cast("long")
            .alias("n_orders"),
            F.round(
                F.coalesce(F.col("n_orders"), F.lit(0)).cast("double")
                / F.col("n_total"),
                6,
            ).alias("obs_pct"),
            F.round(benford, 6).alias("benford_pct"),
            F.round(
                F.coalesce(F.col("n_orders"), F.lit(0)).cast("double")
                / F.col("n_total")
                - benford,
                6,
            ).alias("delta"),
        )
    )
    return out.orderBy("digit")


BENFORD_SQL = """
WITH cents AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
obs AS (
    SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM cents WHERE cents > 0 GROUP BY 1),
tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS n_total FROM obs),
spine AS (SELECT CAST(d AS INTEGER) AS digit
          FROM generate_series(1, 9) AS s(d))
SELECT spine.digit,
       coalesce(obs.n_orders, 0) AS n_orders,
       round(CAST(coalesce(obs.n_orders, 0) AS DOUBLE) / n_total, 6)
           AS obs_pct,
       round(log10(1.0 + 1.0 / spine.digit), 6) AS benford_pct,
       round(CAST(coalesce(obs.n_orders, 0) AS DOUBLE) / n_total
             - log10(1.0 + 1.0 / spine.digit), 6) AS delta
FROM spine LEFT JOIN obs ON spine.digit = obs.digit
CROSS JOIN tot
ORDER BY 1
"""


# ----------------------------------------- Herfindahl concentration


def _supplier_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
        )
        .cast("long")
        .alias("cents"),
    )
    sup = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    per_sup = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey", "s_suppkey")
        .agg(F.sum("cents").alias("sup_cents"))
    )
    dec = "decimal(38,0)"
    per_nat = per_sup.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("sup_cents").alias("total_cents"),
        F.sum(F.col("sup_cents").cast(dec) * F.col("sup_cents").cast(dec))
        .alias("sq_sum"),
    )
    # HHI on the 0..10000 scale: 10000 * sum(share^2); the share
    # squares never materialize as floats — one division at the end.
    hhi = (
        F.lit(10000.0)
        * F.col("sq_sum").cast("double")
        / (
            F.col("total_cents").cast("double")
            * F.col("total_cents").cast("double")
        )
    )
    return (
        per_nat.join(
            F.broadcast(nat),
            per_nat.s_nationkey == nat.n_nationkey,
        )
        .select(
            "n_name",
            F.col("n_suppliers").cast("long").alias("n_suppliers"),
            F.col("total_cents").cast("long").alias("total_cents"),
            F.round(hhi, 6).alias("hhi"),
        )
        .orderBy("n_name")
    )


HHI_SQL = """
WITH per_sup AS (
    SELECT s.s_nationkey, l.l_suppkey,
           CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS sup_cents
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1, 2),
per_nat AS (
    SELECT s_nationkey,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(sup_cents) AS BIGINT) AS total_cents,
           sum(CAST(sup_cents AS HUGEINT) * sup_cents) AS sq_sum
    FROM per_sup GROUP BY 1)
SELECT n.n_name,
       p.n_suppliers,
       p.total_cents,
       round(10000.0 * CAST(p.sq_sum AS DOUBLE)
             / (CAST(p.total_cents AS DOUBLE)
                * CAST(p.total_cents AS DOUBLE)), 6) AS hhi
FROM per_nat p JOIN nation n ON p.s_nationkey = n.n_nationkey
ORDER BY n_name
"""


QUERIES: dict[str, QuerySpec] = {
    "lineitem_chi2_independence": QuerySpec(
        _lineitem_chi2_independence, CHI2_SQL
    ),
    "orders_benford_first_digit": QuerySpec(
        _orders_benford_first_digit, BENFORD_SQL
    ),
    "supplier_hhi_concentration": QuerySpec(
        _supplier_hhi_concentration, HHI_SQL
    ),
}
