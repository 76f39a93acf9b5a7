"""TPC-H query shapes q4-q22 over the driver's TPC-H-ish corpus.

These widen the SQL-surface evidence beyond q1/q3/q6/q10/q12/q13/q14/q18
(queries/analytics.py): EXISTS semi-joins, multi-way star joins with
region/nation dims, self-join nation pairs, market-share ratio,
window-max top-supplier, correlated-average filters, disjunctive
multi-column predicates, and anti-join + scalar-subquery q22.

The corpus lacks ``partsupp`` and commit/receipt dates, so q4/q9/q16/q17
/q19/q22 are *adapted*: the join/aggregation shape (what Catalyst must
plan) is faithful, the predicate columns are the corpus's equivalents.
Adaptations are noted per query.

Scale notes: every dim side (region/nation/customer/supplier/part) is
broadcast; the lineitem fact never shuffles except for its aggregation
keys; q15's "max revenue" uses a single-column window over the already
aggregated (small) frame, not a re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

def _rev():
    # Built lazily: Column construction needs an active SparkContext,
    # which doesn't exist at import time.
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")


# ---------------------------------------------------------------- q4


def _q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS semi-join lineitem→orders, count by priority.
    Adapted predicate (no commit/receipt dates): a line shipped after
    the order date marks the order 'late'."""
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------- q5


def _q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: revenue from intra-nation trades within one region/year —
    the 6-table star with the c_nationkey = s_nationkey 'local' twist."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


Q5_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# ---------------------------------------------------------------- q7

_N1, _N2 = "NATION_1", "NATION_2"


def _q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: bilateral trade volume between two nations by ship year —
    nation dim joined twice (supplier side + customer side)."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    n1 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == _N1) & (F.col("cust_nation") == _N2) | (
        (F.col("supp_nation") == _N2) & (F.col("cust_nation") == _N1)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       round(sum(volume), 2) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           l_extendedprice * (1 - l_discount) AS volume
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND ((n1.n_name = '{_N1}' AND n2.n_name = '{_N2}')
        OR (n1.n_name = '{_N2}' AND n2.n_name = '{_N1}')))
GROUP BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------- q8

_Q8_NATION = "NATION_3"


def _q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: one nation's market share of PROMO-part volume sold to an
    AMERICA-region customer base, by order year — conditional-sum ratio
    over a 7-table star."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n1 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    n2 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.when(F.col("supp_nation") == _Q8_NATION, vol).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cr_key") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(nation_vol) / F.sum(vol), 6).alias("mkt_share"))
    )


Q8_SQL = f"""
SELECT year(o_orderdate) AS o_year,
       round(sum(CASE WHEN n2.n_name = '{_Q8_NATION}'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY year(o_orderdate)
"""


# ---------------------------------------------------------------- q9


def _q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by supplier nation and order year for parts
    matching a name pattern. Adapted: no partsupp, so profit omits the
    supplycost term (pure revenue)."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    s = read_table(spark, sf_dir, "supplier")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    n = read_table(spark, sf_dir, "nation")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(_rev()), 2).alias("profit"))
    )


Q9_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
"""


# ---------------------------------------------------------------- q15


def _q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with maximum quarterly revenue — aggregate per
    supplier, then a frame-wide window max on the (small) aggregate, not
    a second scan of lineitem."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    s = read_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.round(F.sum(_rev()), 2).alias("total_revenue"))
    w = Window.partitionBy()
    top = rev.withColumn("__max", F.max("total_revenue").over(w)).filter(
        F.col("total_revenue") == F.col("__max")
    )
    return top.join(s, top.l_suppkey == s.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


Q15_SQL = """
WITH rev AS (
    SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


# ---------------------------------------------------------------- q16


def _q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct suppliers per (brand, type, size) bucket with
    NOT-style exclusions. Adapted: supplier-part relationships come from
    lineitem (the corpus has no partsupp)."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25)
GROUP BY p_brand, p_type, p_size
"""


# ---------------------------------------------------------------- q17


def _q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue from below-average-quantity lines of one brand —
    the correlated-average filter, decorrelated into a per-part
    aggregate joined back (exactly what Catalyst does to the subquery
    form)."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    avg_q = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_thresh")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avg_q, li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


Q17_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#2'
  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
"""


# ---------------------------------------------------------------- q19


def _q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: disjunction of three (brand, size-range, quantity-range)
    conjuncts — the classic OR-of-ANDs predicate Catalyst must keep
    partially pushable into the part-side join filter."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(F.round(F.sum(_rev()), 2).alias("revenue"))


Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------- q22


_Q22_CUTOFF = "2000-01-01"


def _q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: rich-but-inactive customers — scalar-subquery average
    threshold + anti-join against orders, grouped by nation. Adapted:
    no phone column, so the country-code grouping becomes c_nationkey;
    'inactive' = no orders since the cutoff (every customer has SOME
    order in this corpus, so the unconditioned anti-join is empty)."""
    c = read_table(spark, sf_dir, "customer")
    recent = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(_Q22_CUTOFF)
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    inactive = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return inactive.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


Q22_SQL = f"""
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}')
GROUP BY c_nationkey
"""


# ---------------------------------------------------------------- q2


def _q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each part in a (size, type) bucket, the supplier(s)
    offering the minimum price within one region — the correlated-min
    scalar subquery, decorrelated into a per-part window min (exactly
    Catalyst's rewrite). Adapted: no partsupp, so 'offer price' is the
    minimum observed unit price (l_extendedprice / l_quantity) of that
    supplier's lineitems for the part — min-of-existing-doubles, exact
    under any aggregation order (no float-sum nondeterminism)."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    offers = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("price"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        offers.withColumn("__min", F.min("price").over(w))
        .filter(F.col("price") == F.col("__min"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            # 4dp round in pre-multiplied integer space: both engines
            # round the IDENTICAL double price*10000 to an integer
            # (away-from-zero on both), instead of each applying its
            # own round(x, 4) — whose intermediates differ and
            # disagreed on a boundary value at sf0.1 (determinism
            # probe, round 10).
            (
                F.round(F.col("price") * F.lit(10000.0)).cast("long")
                / F.lit(10000.0)
            ).alias("min_price"),
        )
    )


Q2_SQL = """
WITH offers AS (
    SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
           min(l_extendedprice / l_quantity) AS price
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_type = 'STANDARD' AND p_size <= 10 AND r_name = 'EUROPE'
    GROUP BY p_partkey, s_suppkey, s_name, s_acctbal, n_name)
SELECT s_acctbal, s_name, n_name, p_partkey,
       CAST(round(price * 10000.0) AS BIGINT) / 10000.0 AS min_price
FROM offers o
WHERE price = (SELECT min(price) FROM offers o2 WHERE o2.p_partkey = o.p_partkey)
"""


# ---------------------------------------------------------------- q11


def _q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose value held by one nation's suppliers
    exceeds a fraction of that nation's total — group-by + HAVING
    against a scalar subquery (broadcast single-row cross join).
    Adapted: no partsupp, so 'value' is shipped revenue
    (sum of l_extendedprice) instead of supplycost * availqty."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    base = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("l_partkey", "l_extendedprice")
    )
    per_part = base.groupBy("l_partkey").agg(
        # Round to cents BEFORE the threshold comparison: unrounded
        # double sums depend on summation order, so a part within an
        # ulp of the threshold could be a row-set divergence vs DuckDB.
        F.round(F.sum("l_extendedprice"), 2).alias("__value")
    )
    total = per_part.agg(F.round(F.sum("__value") * 0.001, 2).alias("__thresh"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("__value") > F.col("__thresh"))
        .select("l_partkey", F.col("__value").alias("part_value"))
    )


Q11_SQL = """
WITH base AS (
    SELECT l_partkey, l_extendedprice
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5'),
per_part AS (
    SELECT l_partkey, round(sum(l_extendedprice), 2) AS value
    FROM base GROUP BY l_partkey)
SELECT l_partkey, value AS part_value
FROM per_part
WHERE value > (SELECT round(sum(value) * 0.001, 2) FROM per_part)
"""


# ---------------------------------------------------------------- q20


def _q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers in one nation with 'excess stock' of
    name-matched parts — nested semi-join chain (part names → per
    (supplier, part) quantity threshold → suppliers). Adapted: no
    partsupp availqty, so the threshold is total shipped quantity of
    that part by that supplier > 100 units."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    heavy = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 100.0)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


Q20_SQL = """
SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_7'
  AND s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%red%'
      GROUP BY l_suppkey, l_partkey
      HAVING sum(l_quantity) > 100.0)
"""


# ---------------------------------------------------------------- q21


def _q21_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers in one nation who were the SOLE late
    supplier on a multi-supplier finished order — EXISTS (another
    supplier on the order) + NOT EXISTS (another late supplier), i.e.
    a semi-join and an anti-join with inequality conditions on top of
    the fact join. Adapted: 'late' = shipped more than 60 days after
    the order date (corpus has no commit/receipt dates).

    Scale notes (r14 rewrite): both existence probes decorrelate into
    per-order aggregates — EXISTS(another supplier) is NOT(min == max
    == own suppkey) over ALL the order's lineitems, and NOT EXISTS
    (another late supplier) is min_late == max_late (the probing row's
    own supplier is in the late set, so a singleton set is exactly it).
    Row multiplicity is preserved by carrying count(*) of the sole late
    supplier's rows. The two aggregates are co-partitioned on
    l_orderkey, so their join adds no exchange; the raw-row semi/anti
    shuffles (and the full (orderkey, suppkey) broadcast build) are
    gone. Exact-equal gated vs the semi/anti form at 3 SFs."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")

    late_rows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(late)
        .select("l_orderkey", "l_suppkey")
    )
    la = late_rows.groupBy("l_orderkey").agg(
        F.min("l_suppkey").alias("lmn"),
        F.max("l_suppkey").alias("lmx"),
        F.count(F.lit(1)).alias("n_late"),
    )
    ga = li.groupBy("l_orderkey").agg(
        F.min("l_suppkey").alias("amn"), F.max("l_suppkey").alias("amx")
    )
    q = la.join(ga, "l_orderkey").filter(
        (F.col("lmn") == F.col("lmx"))
        & ((F.col("amn") != F.col("lmn")) | (F.col("amx") != F.col("lmn")))
    )
    dim = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    return (
        q.join(F.broadcast(dim), F.col("lmn") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late").alias("numwait"))
    )


Q21_SQL = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND n_name = 'NATION_2'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
"""


QUERIES: dict[str, QuerySpec] = {
    "tpch_q2_min_price_supplier": QuerySpec(_q2_min_price_supplier, Q2_SQL),
    "tpch_q11_important_stock": QuerySpec(_q11_important_stock, Q11_SQL),
    "tpch_q20_potential_promotion": QuerySpec(_q20_potential_promotion, Q20_SQL),
    "tpch_q21_suppliers_waiting": QuerySpec(_q21_suppliers_waiting, Q21_SQL),
    "tpch_q4_order_priority": QuerySpec(_q4_order_priority, Q4_SQL),
    "tpch_q5_local_supplier": QuerySpec(_q5_local_supplier, Q5_SQL),
    "tpch_q7_volume_shipping": QuerySpec(_q7_volume_shipping, Q7_SQL),
    "tpch_q8_market_share": QuerySpec(_q8_market_share, Q8_SQL),
    "tpch_q9_product_profit": QuerySpec(_q9_product_profit, Q9_SQL),
    "tpch_q15_top_supplier": QuerySpec(_q15_top_supplier, Q15_SQL),
    "tpch_q16_supplier_cnt": QuerySpec(_q16_supplier_cnt, Q16_SQL),
    "tpch_q17_small_quantity": QuerySpec(_q17_small_quantity, Q17_SQL),
    "tpch_q19_discounted_revenue": QuerySpec(_q19_discounted_revenue, Q19_SQL),
    "tpch_q22_global_sales": QuerySpec(_q22_global_sales, Q22_SQL),
}
