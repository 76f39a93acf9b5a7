"""Round-5 additions, eleventh batch: a symbol-level quality signal,
a robust scale statistic, and a seasonality index.

- ``text_char_entropy``: per-document Shannon entropy over characters
  — the symbol-entropy filter real corpus pipelines use to drop
  binary-ish / repeated-character junk that word-level heuristics
  miss. Counts exact; the entropy sum is the only float (rounded 6).
- ``agg_mad_robust``: median absolute deviation about the median per
  event type — the robust scale companion to ``events_winsorized_stats``
  (Spark exact ``percentile`` ↔ DuckDB ``quantile_cont``, the
  ``agg_quantiles`` pairing).
- ``orders_seasonality_index``: month-of-year revenue index — each
  calendar month's share of exact total cents scaled ×12, so 1.0
  means a flat year. The retail seasonality readout.

All pure DataFrame algebra with exact DuckDB twins; invariant tests in
tests/test_round16.py. Extensions beyond the reference DAGs, same
oracle discipline as the §2 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

# ------------------------------------------------------ char entropy


def _text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's character distribution:
    explode to (doc, char) counts, then ``−Σ (c/n)·ln(c/n)`` per doc.
    The aggregation tree is (doc, char)-keyed — bounded by |alphabet|
    per doc — and the doc-level reduce is |docs|-sized. High-entropy
    (random bytes) and near-zero-entropy (repeated filler) tails are
    both drop signals in corpus cleaning."""
    d = read_table(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).filter(F.col("ch") != "")
    per_char = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = per_char.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.log(F.col("c").cast("double"))).alias("sclogc"),
    )
    # −Σ (c/n)·ln(c/n) = ln n − (Σ c·ln c)/n — one pass, no second join
    return per_doc.select(
        "doc_id",
        F.col("n").cast("long").alias("n_chars"),
        F.round(
            F.log(F.col("n").cast("double"))
            - F.col("sclogc") / F.col("n"),
            6,
        ).alias("char_entropy"),
    ).orderBy("doc_id")


TEXT_CHAR_ENTROPY_SQL = """
WITH chars AS (
    SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
per_char AS (
    SELECT doc_id, ch, count(*) AS c
    FROM chars WHERE ch != '' GROUP BY 1, 2),
per_doc AS (
    SELECT doc_id, sum(c) AS n,
           sum(c * ln(CAST(c AS DOUBLE))) AS sclogc
    FROM per_char GROUP BY doc_id)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_chars,
       round(ln(CAST(n AS DOUBLE)) - sclogc / n, 6) AS char_entropy
FROM per_doc
ORDER BY doc_id
"""


# ------------------------------------------------------------- MAD


def _agg_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation about the median, per event type:
    two exact interpolated percentiles (Spark ``percentile`` ↔ DuckDB
    ``quantile_cont``), the second over |v − median| after a broadcast
    join-back of the per-type medians. MAD is the scale estimate that
    survives the outliers winsorization clips. At 100 TB both
    percentile passes swap to t-digest ``approx_percentile`` with the
    same call shape."""
    ev = read_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("ad")
    )
    return (
        dev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("med"), 6).alias("median"),
            F.round(F.expr("percentile(ad, 0.5)"), 6).alias("mad"),
        )
        .orderBy("event_type")
    )


AGG_MAD_SQL = """
WITH med AS (
    SELECT event_type, quantile_cont(value, 0.5) AS med
    FROM events GROUP BY event_type),
dev AS (
    SELECT events.event_type, med, abs(value - med) AS ad
    FROM events JOIN med USING (event_type))
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(max(med), 6) AS median,
       round(quantile_cont(ad, 0.5), 6) AS mad
FROM dev
GROUP BY event_type
ORDER BY event_type
"""


# ------------------------------------------------- seasonality index


def _orders_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year revenue seasonality: each calendar month's exact
    cent total and its index = share × 12 (1.0 ⇒ flat year). One scan
    to a 12-row aggregate plus a 1-row broadcast total."""
    o = read_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.month("o_orderdate").cast("int").alias("month")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )
    total = monthly.agg(F.sum("cents").alias("total_cents"))
    return (
        monthly.crossJoin(F.broadcast(total))
        .select(
            "month",
            "cents",
            "n_orders",
            F.round(
                F.col("cents") * 12 / F.col("total_cents").cast("double"), 6
            ).alias("seasonality_index"),
        )
        .orderBy("month")
    )


ORDERS_SEASONALITY_SQL = """
WITH monthly AS (
    SELECT CAST(month(o_orderdate) AS INTEGER) AS month,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY 1),
tot AS (SELECT sum(cents) AS total_cents FROM monthly)
SELECT month, cents, n_orders,
       round(cents * 12 / CAST(total_cents AS DOUBLE), 6)
           AS seasonality_index
FROM monthly, tot
ORDER BY month
"""


QUERIES: dict[str, QuerySpec] = {
    "text_char_entropy": QuerySpec(_text_char_entropy, TEXT_CHAR_ENTROPY_SQL),
    "agg_mad_robust": QuerySpec(_agg_mad_robust, AGG_MAD_SQL),
    "orders_seasonality_index": QuerySpec(
        _orders_seasonality_index, ORDERS_SEASONALITY_SQL
    ),
}
