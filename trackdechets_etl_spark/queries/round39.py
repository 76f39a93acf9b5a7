"""Round-7 additions, first batch: distributed ranking as a first-class
query, Z-order layout, edit-distance-1 linkage, k-anonymity audit.

- ``orders_price_global_rank``: exact global rank + quartile of every
  order by price — the registry face of ``operators/ranking.py``
  (range-partitioned distributed rank + closed-form ntile; no
  single-partition window anywhere). The oracle is the definitional
  ``row_number()/ntile()`` the operator replaces, so the driver hash
  proves the scale-safe form bit-matches the window form.
- ``layout_zorder_key``: Z-order (Morton) clustering readout — the
  multi-dimensional layout key a 100 TB table would be written with so
  that BOTH ``o_custkey`` and order-date range predicates prune files
  (1-D sorting prunes only one). Interleaves 16 bits of each dimension
  with pure integer shifts (identical on both engines), buckets by the
  top 6 bits (64 z-ranges = "files"), and emits per-bucket dimension
  spans — narrow spans on both axes are exactly the property file
  skipping needs.
- ``linkage_edit_distance_join``: fuzzy self-join of customer names at
  edit distance ≤ 1 via the deletion-neighborhood trick: every name
  emits its L one-character-deletion variants plus itself as join
  keys; any pair within distance 1 MUST share a key (equal strings
  share the name; a substitution shares the both-sides deletion; an
  insert/delete shares the shorter string), so candidates come from an
  equi-join — never an all-pairs cross join — and exact
  ``levenshtein`` verifies (the share-a-deletion property is
  necessary, not sufficient: "ab"/"ba" share "a" at distance 2).
  The entity-resolution primitive the blocking-score linkage lacks.
- ``dq_k_anonymity``: k-anonymity audit over the
  (c_nationkey, c_mktsegment) quasi-identifier: per-group sizes and
  the k>=5 flag — the privacy gate a training-data release pipeline
  runs before shipping user-derived rows.

Reference parity: the reference has no ranking/layout/linkage/privacy
surface (dags/icpe-siretisation.py's linkage is exact name equality,
J2); these extend the engine along the driver-mandated
training-pipeline axis. Invariant tests in tests/test_round39.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

# ------------------------------------------------ global price rank


def _orders_price_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from trackdechets_etl_spark.operators.ranking import (
        global_row_number,
        ntile_from_rank,
    )

    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    n_total = o.agg(F.count(F.lit(1)).alias("n_total"))
    ranked = global_row_number(
        o, [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], "price_rank"
    )
    return (
        ranked.crossJoin(F.broadcast(n_total))
        .select(
            "o_orderkey",
            "o_totalprice",
            "price_rank",
            ntile_from_rank(F.col("price_rank"), F.col("n_total"), 4).alias(
                "price_quartile"
            ),
        )
        .orderBy("price_rank")
    )


PRICE_GLOBAL_RANK_SQL = """
SELECT o_orderkey, o_totalprice,
       CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
            AS BIGINT) AS price_rank,
       CAST(ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey)
            AS BIGINT) AS price_quartile
FROM orders ORDER BY price_rank
"""


# ------------------------------------------------ z-order layout

_Z_BITS = 16
_Z_BUCKET_BITS = 6  # top 6 OCCUPIED bits -> <=64 z-ranges
_Z_EPOCH = "1990-01-01"


def _zorder_spark(x: F.Column, y: F.Column) -> F.Column:
    """Morton interleave: bit i of x lands at position 2i, bit i of y
    at 2i+1. The terms touch disjoint bits, so integer addition is the
    OR — one codegen'd arithmetic expression, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def _layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").bitwiseAND(F.lit(0xFFFF)).cast("long").alias("x"),
        F.datediff(F.to_date("o_orderdate"), F.lit(_Z_EPOCH).cast("date"))
        .bitwiseAND(F.lit(0xFFFF))
        .cast("long")
        .alias("y"),
    )
    z = o.select("x", "y", _zorder_spark(F.col("x"), F.col("y")).alias("z"))
    # bucket on the top bits of the OCCUPIED z range (raw top-of-32
    # bits would collapse to one bucket whenever the dimensions use
    # fewer bits than the budget). Bit length via the binary string
    # render — integer-exact on both engines, no float log2 — carried
    # as a lazy 1-row broadcast.
    shift = z.agg(
        F.greatest(
            F.length(F.bin(F.max("z"))) - F.lit(_Z_BUCKET_BITS), F.lit(0)
        ).alias("z_shift")
    )
    return (
        z.crossJoin(F.broadcast(shift))
        .groupBy(F.expr("shiftright(z, z_shift)").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("x").alias("custkey_lo"),
            F.max("x").alias("custkey_hi"),
            F.min("y").alias("day_lo"),
            F.max("y").alias("day_hi"),
        )
        .select(
            F.col("z_bucket").cast("long").alias("z_bucket"),
            "n_rows",
            "custkey_lo",
            "custkey_hi",
            "day_lo",
            "day_hi",
        )
        .orderBy("z_bucket")
    )


def _zorder_sql_expr(x: str, y: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


LAYOUT_ZORDER_SQL = f"""
WITH d AS (
    SELECT CAST(o_custkey & 65535 AS BIGINT) AS x,
           CAST(date_diff('day', DATE '{_Z_EPOCH}', CAST(o_orderdate AS DATE))
                & 65535 AS BIGINT) AS y
    FROM orders),
z AS (SELECT x, y, {_zorder_sql_expr('x', 'y')} AS z FROM d),
s AS (SELECT greatest(length(bin(max(z))) - {_Z_BUCKET_BITS}, 0) AS z_shift
      FROM z)
SELECT CAST(z >> z_shift AS BIGINT) AS z_bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(x) AS custkey_lo, max(x) AS custkey_hi,
       min(y) AS day_lo, max(y) AS day_hi
FROM z CROSS JOIN s GROUP BY z_bucket ORDER BY z_bucket
"""


# ------------------------------------------------ edit-distance join

_ED_MAX = 1


def _linkage_edit_distance_join(
    spark: SparkSession, sf_dir: str, max_block: int | None = 512
) -> DataFrame:
    """``max_block`` is the production block-size cap: each
    deletion-key block keeps only a deterministic md5-ordered sample
    of ``max_block`` members before the self-join, so a hot key
    (single-char names, a mass-duplicated placeholder name)
    contributes ≤ max_block² candidate pairs instead of |block|² —
    the bound that keeps the join linear-ish on a web-scale corpus
    with pathological blocks. Capping is a documented RECALL trade
    (a pair may survive only in an over-cap block), so callers can
    pass ``None`` for the exact uncapped form.

    ON by default since r14 (verdict ask #2): 512 is >13× the largest
    observed fixture block (38 at sf0.1, p99.9 = max — TPC-H names
    are length-uniform so every block is 'hot' but none pathological),
    and the cap ≥ max-block ⇒ identical property (pinned in
    tests/test_round39.py) means the registry entry still matches the
    naive-all-pairs oracle exactly on every fixture SF. The capped
    plan is also FASTER here: the row_number window pre-partitions
    keys by hk and sorts once, which the self-join's SMJ then rides —
    interleaved best-of-5 at sf0.1: 2.23-2.32 s capped vs 2.68-3.16 s
    uncapped, identical 262,500 output rows."""
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cid"), F.col("c_name").alias("name")
    )
    # key set per name: the name itself + each 1-deletion variant.
    # posexplode over a length-sized index array stays JVM-side.
    # array_union is a set op, so (cid, k) pairs are unique by
    # construction — no dedup exchange needed before the join. The
    # join key is xxhash64(k) (8-byte shuffle/compare instead of the
    # full name-length string; join+count 2.99s → 1.31s at sf0.1); a
    # hash collision can only ADD a candidate pair, and the exact
    # levenshtein verification filter removes it, so the result set is
    # unchanged. Verification runs AFTER the pair-dedup: filtering
    # first looks cheaper but Catalyst pushes the levenshtein
    # predicate into the join condition, which measured 3× slower
    # than deduping candidates and verifying once per distinct pair
    # (9.2s vs 2.8s at sf0.1 — a kept negative result). End-to-end the
    # hashed form is a WASH locally (interleaved A/B 2.8s both) — the
    # pair-dedup exchange dominates — but the 8-byte keys and one
    # fewer exchange are what survive a 100× catalog.
    keys = c.select(
        "cid",
        "name",
        F.explode(
            F.array_union(
                F.array(F.col("name")),
                F.transform(
                    F.sequence(F.lit(1), F.length("name")),
                    lambda i: F.concat(
                        F.substring(F.col("name"), F.lit(1), i - 1),
                        F.col("name").substr(i + 1, F.length("name")),
                    ),
                ),
            )
        ).alias("k"),
    ).select("cid", "name", F.xxhash64("k").alias("hk"))
    if max_block is not None:
        from pyspark.sql import Window

        wb = Window.partitionBy("hk").orderBy(
            F.md5(F.concat_ws(":", F.col("hk"), F.col("cid"))), "cid"
        )
        keys = (
            keys.withColumn("__brk", F.row_number().over(wb))
            .filter(F.col("__brk") <= max_block)
            .drop("__brk")
        )
    cand = (
        keys.alias("a")
        .join(
            keys.alias("b"),
            (F.col("a.hk") == F.col("b.hk"))
            & (F.col("a.cid") < F.col("b.cid")),
        )
        .select(
            F.col("a.cid").alias("id_a"),
            F.col("a.name").alias("name_a"),
            F.col("b.cid").alias("id_b"),
            F.col("b.name").alias("name_b"),
        )
    )
    return (
        cand.dropDuplicates(["id_a", "id_b"])
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("dist") <= _ED_MAX)
        .select("id_a", "id_b", "name_a", "name_b", "dist")
        .orderBy("id_a", "id_b")
    )


# the oracle verifies with the naive all-pairs levenshtein — candidate
# generation is where the engines may differ, the RESULT set may not.
EDIT_DISTANCE_SQL = f"""
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       a.c_name AS name_a, b.c_name AS name_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= {_ED_MAX}
ORDER BY id_a, id_b
"""


# ------------------------------------------------ k-anonymity audit

_K_ANON = 5


def _dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return (
        c.groupBy(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .withColumn("is_k_anonymous", (F.col("n_rows") >= _K_ANON).cast("int"))
        .orderBy("nationkey", "mktsegment")
    )


K_ANONYMITY_SQL = f"""
SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       c_mktsegment AS mktsegment,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) >= {_K_ANON} AS INT) AS is_k_anonymous
FROM customer
GROUP BY c_nationkey, c_mktsegment
ORDER BY nationkey, mktsegment
"""


QUERIES: dict[str, QuerySpec] = {
    "orders_price_global_rank": QuerySpec(
        _orders_price_global_rank, PRICE_GLOBAL_RANK_SQL
    ),
    "layout_zorder_key": QuerySpec(_layout_zorder_key, LAYOUT_ZORDER_SQL),
    "linkage_edit_distance_join": QuerySpec(
        _linkage_edit_distance_join, EDIT_DISTANCE_SQL
    ),
    "dq_k_anonymity": QuerySpec(_dq_k_anonymity, K_ANONYMITY_SQL),
}
