"""Round-7 additions, fifteenth batch: chi-squared independence test,
daily cross-correlation (lead-lag detection).

- ``lineitem_chi2_independence``: Pearson chi-squared test of
  independence between ``l_returnflag`` and ``l_linestatus``. The
  contingency table, row/column totals and the grand total are integer
  hash aggregates; per-cell terms use the cross-multiplied exact form
  (O*N - R*C)^2 / (N*R*C) with the difference computed exactly in
  decimal(38,0) before one double square + division per cell, so the
  only floats are the six per-cell terms and their sum. Totals reach
  the plan as 1-row broadcast crossJoins — nothing eager, nothing
  driver-side. Complements ``events_chisq`` (round7.py), which emits
  the per-cell observed/expected table: this is the aggregate test
  STATISTIC with its degrees of freedom.
- ``events_cross_correlation``: Pearson cross-correlation between the
  daily click series and the daily purchase series at lags -3..+3 —
  the lead-lag detector (``events_daily_autocorr`` is the SELF-lag
  twin; this correlates two DIFFERENT series). Facts reduce to the
  |days| frame before any lag math; the lag fan-out is a broadcast
  crossJoin against a 7-row spine and each lag's moments are exact
  decimal(38,0) sums — one float expression per lag at the end.

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


# -------------------------------------- daily cross-correlation


_XCORR_LAGS = 3


def _events_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    daily = e.groupBy(
        F.to_date("ts").alias("dy"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    x = daily.filter(F.col("event_type") == "click").select(
        "dy", F.col("c").alias("x")
    )
    y = daily.filter(F.col("event_type") == "purchase").select(
        F.col("dy").alias("dy_y"), F.col("c").alias("y")
    )
    lags = spark.range(-_XCORR_LAGS, _XCORR_LAGS + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    # the days frame is tiny (|days| rows) — the lag fan-out and the
    # shifted self-join never touch fact rows
    j = (
        x.crossJoin(F.broadcast(lags))
        .join(y, F.date_add(F.col("dy"), F.col("lag")) == F.col("dy_y"))
    )
    dec = "decimal(38,0)"
    xs = F.col("x").cast(dec)
    ys = F.col("y").cast(dec)
    sums = j.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(xs).alias("sx"),
        F.sum(ys).alias("sy"),
        F.sum(xs * ys).alias("sxy"),
        F.sum(xs * xs).alias("sxx"),
        F.sum(ys * ys).alias("syy"),
    )
    n = F.col("n_days").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    r = (n * F.col("sxy").cast("double") - sx * sy) / F.sqrt(
        (n * F.col("sxx").cast("double") - sx * sx)
        * (n * F.col("syy").cast("double") - sy * sy)
    )
    return sums.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("n_days").cast("long").alias("n_days"),
        F.round(r, 6).alias("r_xcorr"),
    ).orderBy("lag")


XCORR_SQL = f"""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS dy, event_type, CAST(count(*) AS BIGINT) AS c
    FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1, 2),
x AS (SELECT dy, c AS x FROM daily WHERE event_type = 'click'),
y AS (SELECT dy AS dy_y, c AS y FROM daily WHERE event_type = 'purchase'),
lags AS (SELECT CAST(l AS INTEGER) AS lag
         FROM generate_series(-{_XCORR_LAGS}, {_XCORR_LAGS}) AS s(l)),
j AS (
    SELECT lag, x, y FROM x CROSS JOIN lags
    JOIN y ON y.dy_y = x.dy + CAST(lag AS INTEGER)),
sums AS (
    SELECT lag,
           CAST(count(*) AS BIGINT) AS n_days,
           sum(CAST(x AS HUGEINT)) AS sx,
           sum(CAST(y AS HUGEINT)) AS sy,
           sum(CAST(x AS HUGEINT) * y) AS sxy,
           sum(CAST(x AS HUGEINT) * x) AS sxx,
           sum(CAST(y AS HUGEINT) * y) AS syy
    FROM j GROUP BY 1)
SELECT CAST(lag AS BIGINT) AS lag, n_days,
       round((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
           AS r_xcorr
FROM sums ORDER BY lag
"""


QUERIES: dict[str, QuerySpec] = {
    "lineitem_chi2_independence": QuerySpec(
        _lineitem_chi2_independence, CHI2_SQL
    ),
    "events_cross_correlation": QuerySpec(
        _events_cross_correlation, XCORR_SQL
    ),
}
