"""Round-7 additions, tenth batch: two-sample KS test and a
compressibility proxy.

- ``events_two_sample_ks``: exact two-sample Kolmogorov-Smirnov
  distance between the purchase-value distributions of two
  deterministic user halves. D = max |F1 − F2| evaluated on the
  DISTINCT-cents value frame with cumulative counts; the comparison is
  integer cross-multiplied (|c1·n2 − c2·n1|, exact int64), so the only
  float is the final emitted D. The distribution-drift test the
  z-score family can't do (it sees moments, not shape).
- ``text_compressibility_proxy``: per-document distinct-bigram ratio —
  the cheap stand-in for a compression-ratio quality filter
  (boilerplate and template text repeat bigrams; natural text
  doesn't). Emits the 20 most repetitive documents; all integer
  counts until the final ratio.

Invariant tests in tests/test_round48.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

# ------------------------------------------- two-sample KS


def _events_two_sample_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("grp"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    vals = ev.groupBy("cents").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("c1"),
    )
    # cumulative over the DISTINCT-cents frame (bounded by the value
    # grid, not the event count)
    wv = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = vals.select(
        "cents",
        F.sum("c0").over(wv).alias("f0"),
        F.sum("c1").over(wv).alias("f1"),
    )
    tot = ev.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n1"),
    )
    # f*n products are per-group-count x per-group-count: they pass
    # int64 once each half exceeds ~3e9 events. Widen to decimal(38,0)
    # (exact; the oracle mirrors with HUGEINT) and divide as double.
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    gaps = cum.crossJoin(F.broadcast(tot)).select(
        "cents",
        "n0",
        "n1",
        F.abs(dec("f0") * dec("n1") - dec("f1") * dec("n0")).alias(
            "cross_gap"
        ),
    )
    return (
        gaps.orderBy(F.desc("cross_gap"), "cents")
        .limit(1)
        .select(
            F.col("n0").cast("long").alias("n0"),
            F.col("n1").cast("long").alias("n1"),
            (F.col("cents") / 100.0).alias("ks_at_value"),
            F.round(
                F.col("cross_gap").cast("double")
                / (dec("n0") * dec("n1")).cast("double"),
                6,
            ).alias("ks_d"),
        )
    )


TWO_SAMPLE_KS_SQL = """
WITH ev AS (
    SELECT user_id % 2 AS grp,
           CAST(round(value * 100, 0) AS BIGINT) AS cents
    FROM events),
vals AS (
    SELECT cents,
           sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS c0,
           sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS c1
    FROM ev GROUP BY cents),
cum AS (
    SELECT cents,
           sum(c0) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f0,
           sum(c1) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1
    FROM vals),
tot AS (
    SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
           CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
    FROM ev),
gaps AS (
    SELECT cents, n0, n1,
           abs(CAST(f0 AS HUGEINT) * n1 - CAST(f1 AS HUGEINT) * n0)
               AS cross_gap
    FROM cum CROSS JOIN tot)
SELECT n0, n1,
       cents / 100.0 AS ks_at_value,
       round(CAST(cross_gap AS DOUBLE)
             / CAST(CAST(n0 AS HUGEINT) * n1 AS DOUBLE), 6) AS ks_d
FROM gaps ORDER BY cross_gap DESC, cents LIMIT 1
"""


# ------------------------------------------- compressibility proxy

_COMP_TOP = 20


def _text_compressibility_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    ).filter(F.col("term") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = tok.select(
        "doc_id",
        F.concat_ws(" ", F.lag("term").over(w), F.col("term")).alias("bigram"),
        F.lag("term").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    return (
        bg.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.countDistinct("bigram").cast("long").alias("n_distinct"),
        )
        .withColumn(
            "distinct_ratio",
            F.round(F.col("n_distinct") / F.col("n_bigrams"), 6),
        )
        .orderBy("distinct_ratio", "doc_id")
        .limit(_COMP_TOP)
    )


COMPRESSIBILITY_SQL = f"""
WITH tok AS (
    SELECT doc_id, i AS pos, w[i] AS term
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         unnest(generate_series(1, len(w))) AS u(i)
    WHERE w[i] != ''),
bg AS (
    SELECT doc_id,
           lag(term) OVER (PARTITION BY doc_id ORDER BY pos)
             || ' ' || term AS bigram,
           lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
    FROM tok)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(count(DISTINCT bigram) AS BIGINT) AS n_distinct,
       round(count(DISTINCT bigram) / CAST(count(*) AS DOUBLE), 6)
           AS distinct_ratio
FROM bg WHERE prev IS NOT NULL
GROUP BY doc_id
ORDER BY distinct_ratio, doc_id LIMIT {_COMP_TOP}
"""


QUERIES: dict[str, QuerySpec] = {
    "events_two_sample_ks": QuerySpec(_events_two_sample_ks, TWO_SAMPLE_KS_SQL),
    "text_compressibility_proxy": QuerySpec(
        _text_compressibility_proxy, COMPRESSIBILITY_SQL
    ),
}
