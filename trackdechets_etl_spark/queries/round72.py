"""Round-9 additions, seventeenth batch: the L² EDF test.

- ``events_cramer_von_mises``: two-sample Cramér–von Mises statistic
  on per-event purchase values by user-parity arm — T = (n₀n₁/N²) ·
  Σ_pooled (F₀−F₁)², summed over the distinct-value frame with
  pooled multiplicities. Completes the EDF-distance trio: KS takes
  the sup (events_two_sample_ks), Wasserstein-1 the L¹ integral
  (orders_wasserstein_price_eras), CvM the L² — the most powerful of
  the three against spread/shape differences. Per-point CDF gaps are
  exact decimal cross-multiplications (the KS contract) normalized
  per row before squaring.

Reference provenance: none of this exists in the reference's 539-line
pandas surface. Scale note in docs/SCALE.md §round-9 seventeenth
batch; invariant tests in tests/test_round72.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec


def _events_cramer_von_mises(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("grp"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    vals = ev.groupBy("cents").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("c1"),
    )
    # cumulative over the DISTINCT-cents frame (bounded by the value
    # grid — the events_two_sample_ks allowlist contract)
    wv = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = vals.select(
        "cents",
        "c0",
        "c1",
        F.sum("c0").over(wv).alias("f0"),
        F.sum("c1").over(wv).alias("f1"),
    )
    tot = ev.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n1"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    # per-row normalized CDF gap from the exact decimal cross —
    # deterministic double BEFORE squaring (the KS widening contract)
    g = (
        (dec("f0") * dec("n1") - dec("f1") * dec("n0")).cast("double")
        / (F.col("n0").cast("double") * F.col("n1").cast("double"))
    )
    terms = cum.crossJoin(F.broadcast(tot)).select(
        "n0",
        "n1",
        ((F.col("c0") + F.col("c1")) * g * g).alias("w"),
    )
    return terms.agg(
        F.first("n0").cast("long").alias("n0"),
        F.first("n1").cast("long").alias("n1"),
        F.round(
            F.first("n0")
            * F.first("n1")
            / F.pow(
                (F.first("n0") + F.first("n1")).cast("double"), 2.0
            )
            * F.sum("w"),
            6,
        ).alias("cvm_stat"),
    )


CVM_SQL = """
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
    SELECT cents, c0, c1,
           sum(c0) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f0,
           sum(c1) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1
    FROM vals),
tot AS (
    SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n0,
           CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1
    FROM ev),
terms AS (
    SELECT n0, n1,
           (c0 + c1)
           * (CAST(f0 * n1 - f1 * n0 AS DOUBLE)
              / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)))
           * (CAST(f0 * n1 - f1 * n0 AS DOUBLE)
              / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE))) AS w
    FROM cum, tot)
SELECT min(n0) AS n0, min(n1) AS n1,
       round(min(n0) * min(n1)
             / pow(CAST(min(n0) + min(n1) AS DOUBLE), 2.0)
             * sum(w), 6) AS cvm_stat
FROM terms
"""


QUERIES: dict[str, QuerySpec] = {
    "events_cramer_von_mises": QuerySpec(
        _events_cramer_von_mises, CVM_SQL
    ),
}
