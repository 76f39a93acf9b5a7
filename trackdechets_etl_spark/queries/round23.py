"""Round-5 additions, eighteenth batch: Bloom-filter membership sketch.

- ``sketch_bloom_fpr``: a deterministic Bloom filter built from
  customer names (k=3 md5-derived positions into m=8192 bits,
  represented as the distinct-position set — identical math to the
  bit array) probed with supplier names (true negatives) plus a
  slice of member names (true positives), reporting the measured
  false-positive rate against exact membership. The engine's second
  mergeable sketch (after count-min): positions are pure md5
  arithmetic, so both engines build bit-for-bit the same filter and
  the FPR readout is exact, not statistical.

Invariant tests in tests/test_round23.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

_BLOOM_M = 8192
_BLOOM_K = 3
_POS_MEMBERS = 100  # first N member names probed as true positives


def _positions(col):
    """k md5-derived bit positions for a key: first 8 hex digits of
    md5('<j>:'||key) mod m, j = 0..k-1."""
    return [
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), col)), 1, 8), 16, 10
        ).cast("long")
        % _BLOOM_M
        for j in range(_BLOOM_K)
    ]


def _sketch_bloom_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build: distinct positions of all customer names (the filter —
    at 100 TB this set IS the broadcast bit array, built with one
    map-side-combined aggregation). Probe: supplier names plus the
    first 100 customer names; a probe hits iff ALL k of its positions
    are set. One row out: build/probe counts, hits, true members, and
    the measured FPR over the true-negative probes."""
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    members = c.select(F.col("c_name").alias("key")).distinct()
    bits = (
        members.select(F.explode(F.array(*_positions(F.col("key")))).alias("pos"))
        .distinct()
    )
    probes = (
        s.select(F.col("s_name").alias("key"))
        .unionByName(
            c.filter(F.col("c_custkey") < _POS_MEMBERS).select(
                F.col("c_name").alias("key")
            )
        )
        .distinct()
        .withColumn("is_member", F.col("key").startswith("Customer"))
    )
    probe_pos = probes.select(
        "key",
        "is_member",
        F.explode(F.array(*_positions(F.col("key")))).alias("pos"),
    )
    hits = (
        probe_pos.join(bits.withColumn("__set", F.lit(1)), "pos", "left")
        .groupBy("key", "is_member")
        .agg(
            (F.sum(F.coalesce("__set", F.lit(0))) == _BLOOM_K).alias(
                "bloom_hit"
            )
        )
    )
    return hits.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0))
        .cast("long")
        .alias("n_hits"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0))
        .cast("long")
        .alias("n_members"),
        F.sum(
            F.when(F.col("bloom_hit") & ~F.col("is_member"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_false_pos"),
    ).select(
        "n_probes",
        "n_hits",
        "n_members",
        "n_false_pos",
        F.round(
            F.col("n_false_pos")
            / (F.col("n_probes") - F.col("n_members")).cast("double"),
            6,
        ).alias("fpr"),
    )


def _bloom_pos_sql(key: str, j: int) -> str:
    return (
        f"(('0x' || substring(md5('{j}:' || {key}), 1, 8))::BIGINT"
        f" % {_BLOOM_M})"
    )


def _bloom_oracle() -> str:
    member_pos = " UNION ALL ".join(
        f"SELECT {_bloom_pos_sql('c_name', j)} AS pos FROM customer"
        for j in range(_BLOOM_K)
    )
    probe_pos = " UNION ALL ".join(
        f"SELECT key, is_member, {_bloom_pos_sql('key', j)} AS pos FROM probes"
        for j in range(_BLOOM_K)
    )
    return f"""
WITH bits AS (SELECT DISTINCT pos FROM ({member_pos}) b),
probes AS (
    SELECT DISTINCT key, key LIKE 'Customer%' AS is_member FROM (
        SELECT s_name AS key FROM supplier
        UNION ALL
        SELECT c_name FROM customer WHERE c_custkey < {_POS_MEMBERS}) p),
pp AS ({probe_pos}),
hits AS (
    SELECT key, is_member,
           sum(CASE WHEN bits.pos IS NOT NULL THEN 1 ELSE 0 END)
               = {_BLOOM_K} AS bloom_hit
    FROM pp LEFT JOIN bits ON pp.pos = bits.pos
    GROUP BY key, is_member),
agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hits,
           CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
               AS n_members,
           CAST(sum(CASE WHEN bloom_hit AND NOT is_member
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
    FROM hits)
SELECT n_probes, n_hits, n_members, n_false_pos,
       round(n_false_pos / CAST(n_probes - n_members AS DOUBLE), 6) AS fpr
FROM agg
"""


QUERIES: dict[str, QuerySpec] = {
    "sketch_bloom_fpr": QuerySpec(_sketch_bloom_fpr, _bloom_oracle()),
}
