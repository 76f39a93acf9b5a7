"""Round-5 additions, tenth batch: corpus drift, inventory
classification, and a zone-map pruning estimator.

- ``text_js_divergence``: Jensen–Shannon divergence of each source's
  word distribution against the whole corpus — the text analog of the
  PSI drift report (``dq_profile_drift``), over a fixed top-200
  vocabulary with Laplace smoothing. Counts exact; only the final log
  sums are floats (rounded at 6).
- ``orders_abc_class``: ABC inventory classification — parts ranked by
  exact revenue cents, cumulative-share class cut at 80%/95% via
  integer cross-multiplied comparisons (cum·100 ≤ total·80), so class
  boundaries can never diverge between engines.
- ``layout_file_skipping``: zone-map pruning estimator — orders
  bucketed into synthetic month files, per-file min/max of the
  predicate column, and a skippable flag for a constant filter. The
  manifest-level statistic that decides how much of a 100 TB table a
  selective query actually reads.

All pure DataFrame algebra with exact DuckDB twins; invariant tests in
tests/test_round15.py. Extensions beyond the reference DAGs, same
oracle discipline as the §2 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

# --------------------------------------------------- JS divergence

_JS_VOCAB = 200


def _text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Jensen–Shannon divergence vs the corpus over the
    global top-200 vocabulary (ties by word — deterministic), with
    Laplace smoothing so every probability is positive. The vocab is
    a broadcast dim; per-(source, word) counts are one aggregation of
    the token frame; the JS sum runs over |sources|×|vocab| rows.
    JS(p, m) with m = (p+q)/2 is symmetric and bounded by ln 2 — the
    bounds are pinned in tests."""
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
        .orderBy(F.desc("cw"), "w")
        .limit(_JS_VOCAB)
        .select("w")
    )
    tv = tok.join(F.broadcast(vocab), "w")
    src_w = tv.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c_sw"))
    src_tot = tv.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    corp_w = tv.groupBy("w").agg(F.count(F.lit(1)).alias("c_w"))
    corp_tot = tv.agg(F.count(F.lit(1)).alias("n_tot"))
    # dense (source × vocab) grid so zero-count words still contribute
    grid = (
        src_tot.crossJoin(F.broadcast(vocab))
        .join(src_w, ["source", "w"], "left")
        .join(F.broadcast(corp_w), "w")
        .crossJoin(F.broadcast(corp_tot))
    )
    p = (F.coalesce(F.col("c_sw"), F.lit(0)) + 1).cast("double") / (
        F.col("n_s") + _JS_VOCAB
    ).cast("double")
    q = (F.col("c_w") + 1).cast("double") / (
        F.col("n_tot") + _JS_VOCAB
    ).cast("double")
    m = (p + q) / 2
    term = 0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m)
    return (
        grid.groupBy("source")
        .agg(
            F.max("n_s").cast("long").alias("n_tokens"),
            F.round(F.sum(term), 6).alias("js_divergence"),
        )
        .orderBy("source")
    )


TEXT_JS_SQL = f"""
WITH tok AS (
    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
vocab AS (
    SELECT w FROM (
        SELECT w, count(*) AS cw FROM tok GROUP BY w
        ORDER BY cw DESC, w LIMIT {_JS_VOCAB}) v),
tv AS (SELECT tok.source, tok.w FROM tok JOIN vocab USING (w)),
src_w AS (SELECT source, w, count(*) AS c_sw FROM tv GROUP BY 1, 2),
src_tot AS (SELECT source, count(*) AS n_s FROM tv GROUP BY 1),
corp_w AS (SELECT w, count(*) AS c_w FROM tv GROUP BY 1),
corp_tot AS (SELECT count(*) AS n_tot FROM tv),
grid AS (
    SELECT st.source, v.w, st.n_s, coalesce(sw.c_sw, 0) AS c_sw,
           cw.c_w, ct.n_tot
    FROM src_tot st
    CROSS JOIN vocab v
    LEFT JOIN src_w sw ON sw.source = st.source AND sw.w = v.w
    JOIN corp_w cw ON cw.w = v.w
    CROSS JOIN corp_tot ct),
terms AS (
    SELECT source, n_s,
           CAST(c_sw + 1 AS DOUBLE) / (n_s + {_JS_VOCAB}) AS p,
           CAST(c_w + 1 AS DOUBLE) / (n_tot + {_JS_VOCAB}) AS q
    FROM grid)
SELECT source,
       CAST(max(n_s) AS BIGINT) AS n_tokens,
       round(sum(0.5 * p * ln(p / ((p + q) / 2))
                 + 0.5 * q * ln(q / ((p + q) / 2))), 6) AS js_divergence
FROM terms
GROUP BY source
ORDER BY source
"""


# -------------------------------------------------------- ABC classes

_ABC_A = 80  # percent of revenue
_ABC_B = 95


def _orders_abc_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by exact revenue
    cents (ties by part key), class A while the running cumulative
    share is ≤ 80% of the total, B to 95%, else C — the comparisons
    are integer cross-multiplications (cum·100 ≤ total·80), never a
    float share. One narrow sort of (part, cents); the revenue rollup
    is fact-sized but the classification frame is |parts|."""
    li = read_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    total = per_part.agg(F.sum("cents").alias("total_cents"))
    w = Window.orderBy(F.desc("cents"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = per_part.withColumn("cum", F.sum("cents").over(w)).crossJoin(
        F.broadcast(total)
    )
    cls = (
        F.when(F.col("cum") * 100 <= F.col("total_cents") * _ABC_A, "A")
        .when(F.col("cum") * 100 <= F.col("total_cents") * _ABC_B, "B")
        .otherwise("C")
    )
    return (
        ranked.select(
            "l_partkey",
            F.col("cents").alias("revenue_cents"),
            cls.alias("abc_class"),
        )
        .orderBy("l_partkey")
    )


ORDERS_ABC_SQL = f"""
WITH per_part AS (
    SELECT l_partkey,
           CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                AS BIGINT) AS cents
    FROM lineitem GROUP BY 1),
tot AS (SELECT sum(cents) AS total_cents FROM per_part),
ranked AS (
    SELECT l_partkey, cents,
           sum(cents) OVER (ORDER BY cents DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) AS cum
    FROM per_part)
SELECT l_partkey, cents AS revenue_cents,
       CASE WHEN cum * 100 <= total_cents * {_ABC_A} THEN 'A'
            WHEN cum * 100 <= total_cents * {_ABC_B} THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked, tot
ORDER BY l_partkey
"""


# ------------------------------------------------ zone-map skipping

_SKIP_THRESHOLD_CENTS = 40_000_000  # o_totalprice > $400k


def _layout_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruning estimator: orders bucketed into synthetic
    month 'files', per-file row count and min/max of the predicate
    column in exact cents, and whether the file is skippable for
    ``o_totalprice > 400k`` (max ≤ threshold ⇒ no row can match).
    This is the manifest statistic Iceberg/Delta data skipping runs
    on; at 100 TB the same aggregation over the real file manifest
    decides how many of the table's files a selective scan opens."""
    o = read_table(spark, sf_dir, "orders")
    per_file = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("file_month")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "min_cents"
        ),
        F.max(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "max_cents"
        ),
    )
    return per_file.select(
        "file_month",
        "n_rows",
        "min_cents",
        "max_cents",
        (F.col("max_cents") <= _SKIP_THRESHOLD_CENTS).alias("skippable"),
    ).orderBy("file_month")


LAYOUT_SKIP_SQL = f"""
SELECT strftime(o_orderdate, '%Y-%m') AS file_month,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS min_cents,
       CAST(max(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS max_cents,
       max(CAST(round(o_totalprice * 100, 0) AS BIGINT))
           <= {_SKIP_THRESHOLD_CENTS} AS skippable
FROM orders
GROUP BY 1
ORDER BY file_month
"""


QUERIES: dict[str, QuerySpec] = {
    "text_js_divergence": QuerySpec(_text_js_divergence, TEXT_JS_SQL),
    "orders_abc_class": QuerySpec(_orders_abc_class, ORDERS_ABC_SQL),
    "layout_file_skipping": QuerySpec(_layout_file_skipping, LAYOUT_SKIP_SQL),
}
