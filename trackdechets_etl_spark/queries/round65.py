"""Round-9 additions, tenth batch: inter-rater agreement,
distribution-free median CIs, sequence-model held-out evaluation,
inverse-propensity weighting, parametric survival fitting, and
lexical-diversity curves.

- ``text_rater_kappa``: Cohen's kappa between two integer-exact
  document-quality raters (A: type-token ratio ≥ ½ via the exact
  2·types ≥ tokens compare; B: n_chars ≥ 120) — the agreement
  statistic behind every labeling-quality audit; chance-corrected, so
  two raters that both say "good" 90% of the time can still score
  kappa ≈ 0. Both raters are integer comparisons — no float boundary
  anywhere.
- ``orders_median_ci_ranks``: distribution-free ~95% CI for the
  median order price via the normal-approximation order-statistic
  ranks l = ⌊(n − z√n)/2⌋, u = n+1−l — the ranks are picked with the
  distributed global rank (operators/ranking.py), never a sort to one
  machine. The order-statistic companion to the bootstrap/jackknife
  rows: no resampling, one exact quantile lookup.
- ``events_markov_heldout_acc``: held-out top-1 accuracy of the
  first-order Markov next-event model — train on transitions landing
  before day 15 (split derived from min(ts), not wall-clock), predict
  argmax next state, evaluate on the later half. The sequence-model
  twin of ``events_markov_transitions`` (which fits in-corpus) — the
  eval framing is what a production next-event model ships with.
- ``orders_ipw_ate``: inverse-propensity-weighted (Hajek) average
  treatment effect on the round61 strata (propensity = observed
  order-level treatment share per stratum) — the OTHER standard
  observational estimator next to ``orders_propensity_stratified_ate``;
  the two agreeing is itself the robustness check. All weights are
  rationals of exact integer counts.
- ``events_session_weibull``: Weibull shape/scale fit of session
  durations (30-min gap sessions, duration ≥ 1 s — single-event
  zero-length sessions carry no duration information) by median-rank
  regression: ln(dur) and ln(−ln(1−F)) are rounded to INTEGER
  micro-units per row (the sim_mrr_eval micro-unit contract), so the
  OLS moments are exact decimal(38,0) sums and the fit is
  engine-deterministic. Shape < 1 means sessions die young
  (bot-like); > 1 means aging engagement.
- ``text_ttr_length_curve``: type-token ratio by document-length
  bucket (tokens // 10, capped at 9) — TTR is mechanically
  length-biased, so raw corpus-level TTR is meaningless; the curve is
  how lexical diversity is actually compared across corpora of
  different length mixes.

Reference provenance: none of these exist in the reference's 539-line
pandas surface (dags/icpe-siretisation.py, dags/publish-open-data.py).
Scale notes in docs/SCALE.md §round-9 tenth batch; invariant tests in
tests/test_round65.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.operators.ranking import global_row_number
from trackdechets_etl_spark.queries import QuerySpec

# --------------------------------------------------- rater kappa

_KAPPA_CHARS_MIN = 120


def _text_rater_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("w"), "n_chars"
    )
    flags = d.select(
        (2 * F.size(F.array_distinct("w")) >= F.size("w"))
        .cast("int")
        .alias("ra"),
        (F.col("n_chars") >= _KAPPA_CHARS_MIN).cast("int").alias("rb"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("ra") * F.col("rb")).cast("long").alias("n11"),
        F.sum(F.col("ra") * (1 - F.col("rb"))).cast("long").alias("n10"),
        F.sum((1 - F.col("ra")) * F.col("rb")).cast("long").alias("n01"),
        F.sum((1 - F.col("ra")) * (1 - F.col("rb")))
        .cast("long")
        .alias("n00"),
    )
    po = (F.col("n11") + F.col("n00")) / F.col("n")
    pa = (F.col("n11") + F.col("n10")) / F.col("n")
    pb = (F.col("n11") + F.col("n01")) / F.col("n")
    pe = pa * pb + (1.0 - pa) * (1.0 - pb)
    return agg.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(po, 6).alias("p_observed"),
        F.round(pe, 6).alias("p_expected"),
        F.round((po - pe) / (1.0 - pe), 6).alias("kappa"),
    )


KAPPA_SQL = f"""
WITH d AS (
    SELECT string_split(text, ' ') AS w, n_chars FROM documents),
flags AS (
    SELECT CASE WHEN 2 * len(list_distinct(w)) >= len(w)
                THEN 1 ELSE 0 END AS ra,
           CASE WHEN n_chars >= {_KAPPA_CHARS_MIN} THEN 1 ELSE 0 END
               AS rb
    FROM d),
agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(ra * rb) AS BIGINT) AS n11,
           CAST(sum(ra * (1 - rb)) AS BIGINT) AS n10,
           CAST(sum((1 - ra) * rb) AS BIGINT) AS n01,
           CAST(sum((1 - ra) * (1 - rb)) AS BIGINT) AS n00
    FROM flags),
x AS (
    SELECT *,
           (n11 + n00) * 1.0 / n AS po,
           ((n11 + n10) * 1.0 / n) * ((n11 + n01) * 1.0 / n)
           + (1.0 - (n11 + n10) * 1.0 / n)
             * (1.0 - (n11 + n01) * 1.0 / n) AS pe
    FROM agg)
SELECT n, n11, n10, n01, n00,
       round(po, 6) AS p_observed,
       round(pe, 6) AS p_expected,
       round((po - pe) / (1.0 - pe), 6) AS kappa
FROM x
"""


# ---------------------------------------------- median CI by ranks

_MEDCI_Z = "1.959963984540054"  # z_{0.975}, shared decimal literal


def _orders_median_ci_ranks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    ranked = global_row_number(
        o, [F.asc("cents"), F.asc("o_orderkey")], rank_col="rk"
    )
    picks = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.floor(
            (
                F.count(F.lit(1))
                - float(_MEDCI_Z) * F.sqrt(F.count(F.lit(1)))
            )
            / 2.0
        )
        .cast("long")
        .alias("lo_rk"),
    ).select(
        "n",
        "lo_rk",
        (F.col("n") + 1 - F.col("lo_rk")).alias("hi_rk"),
        ((F.col("n") + 1) / 2).cast("long").alias("med_lo"),
        ((F.col("n") + 2) / 2).cast("long").alias("med_hi"),
    )
    j = ranked.crossJoin(F.broadcast(picks))
    return j.agg(
        F.first("n").alias("n"),
        F.round(
            (
                F.sum(F.when(F.col("rk") == F.col("med_lo"), F.col("cents")))
                + F.sum(
                    F.when(F.col("rk") == F.col("med_hi"), F.col("cents"))
                )
            )
            / 200.0,
            2,
        ).alias("median_price"),
        F.round(
            F.sum(F.when(F.col("rk") == F.col("lo_rk"), F.col("cents")))
            / 100.0,
            2,
        ).alias("ci_lo"),
        F.round(
            F.sum(F.when(F.col("rk") == F.col("hi_rk"), F.col("cents")))
            / 100.0,
            2,
        ).alias("ci_hi"),
    )


MEDCI_SQL = f"""
WITH o AS (
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders),
ranked AS (
    SELECT cents,
           row_number() OVER (ORDER BY cents, o_orderkey) AS rk
    FROM o),
picks AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(floor((count(*) - {_MEDCI_Z} * sqrt(count(*))) / 2.0)
                AS BIGINT) AS lo_rk,
           CAST(count(*) + 1
                - floor((count(*) - {_MEDCI_Z} * sqrt(count(*))) / 2.0)
                AS BIGINT) AS hi_rk,
           (count(*) + 1) // 2 AS med_lo,
           (count(*) + 2) // 2 AS med_hi
    FROM o)
SELECT min(n) AS n,
       round((sum(CASE WHEN rk = med_lo THEN cents END)
              + sum(CASE WHEN rk = med_hi THEN cents END)) / 200.0, 2)
           AS median_price,
       round(sum(CASE WHEN rk = lo_rk THEN cents END) / 100.0, 2)
           AS ci_lo,
       round(sum(CASE WHEN rk = hi_rk THEN cents END) / 100.0, 2)
           AS ci_hi
FROM ranked, picks
"""


# ------------------------------------------- Markov held-out eval

_MARKOV_SPLIT_DAYS = 15


def _events_markov_heldout_acc(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = ev.select(
        F.col("event_type").alias("prev"),
        F.lead("event_type").over(w).alias("nxt"),
        F.to_date(F.lead("ts").over(w)).alias("nday"),
    ).filter(F.col("nxt").isNotNull())
    split = ev.agg(
        F.date_add(F.to_date(F.min("ts")), _MARKOV_SPLIT_DAYS).alias(
            "split"
        )
    )
    tr2 = tr.crossJoin(F.broadcast(split))
    train = tr2.filter(F.col("nday") < F.col("split"))
    test = tr2.filter(F.col("nday") >= F.col("split"))
    counts = train.groupBy("prev", "nxt").agg(
        F.count(F.lit(1)).alias("c")
    )
    mx = counts.groupBy("prev").agg(F.max("c").alias("mc"))
    modal = (
        counts.join(F.broadcast(mx), "prev")
        .filter(F.col("c") == F.col("mc"))
        .groupBy("prev")
        .agg(F.min("nxt").alias("pred"))
    )
    evald = test.join(F.broadcast(modal), "prev")
    per = evald.groupBy("prev").agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum((F.col("nxt") == F.col("pred")).cast("int"))
        .cast("long")
        .alias("n_correct"),
    )
    tot = per.agg(
        (F.sum("n_correct") / F.sum("n_test")).alias("overall")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "prev",
            "n_test",
            "n_correct",
            F.round(F.col("n_correct") / F.col("n_test"), 6).alias(
                "accuracy"
            ),
            F.round("overall", 6).alias("overall_accuracy"),
        )
        .orderBy("prev")
    )


MARKOV_HELDOUT_SQL = f"""
WITH tr AS (
    SELECT event_type AS prev,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt,
           CAST(lead(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS DATE) AS nday
    FROM events),
s AS (
    SELECT CAST(min(ts) AS DATE) + INTERVAL {_MARKOV_SPLIT_DAYS} DAY
               AS split
    FROM events),
tr2 AS (SELECT * FROM tr, s WHERE nxt IS NOT NULL),
counts AS (
    SELECT prev, nxt, count(*) AS c
    FROM tr2 WHERE nday < split GROUP BY prev, nxt),
mx AS (SELECT prev, max(c) AS mc FROM counts GROUP BY prev),
modal AS (
    SELECT counts.prev, min(nxt) AS pred
    FROM counts JOIN mx ON counts.prev = mx.prev AND c = mc
    GROUP BY counts.prev),
evald AS (
    SELECT tr2.prev, nxt, pred
    FROM tr2 JOIN modal ON tr2.prev = modal.prev
    WHERE nday >= split),
per AS (
    SELECT prev, CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN nxt = pred THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct
    FROM evald GROUP BY prev),
tot AS (
    SELECT sum(n_correct) * 1.0 / sum(n_test) AS overall FROM per)
SELECT prev, n_test, n_correct,
       round(n_correct * 1.0 / n_test, 6) AS accuracy,
       round(overall, 6) AS overall_accuracy
FROM per, tot
ORDER BY prev
"""


# ------------------------------------------------------ IPW ATE


def _orders_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    strata = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_o"))
        .select(
            "o_custkey",
            F.least(
                ((F.col("n_o") - F.col("n_o") % 4) / 4).cast("long"),
                F.lit(4),
            ).alias("stratum"),
            (F.col("o_custkey") % 2).cast("long").alias("treat"),
        )
    )
    cells = (
        o.join(strata, "o_custkey")
        .groupBy("stratum")
        .agg(
            F.sum(F.when(F.col("treat") == 1, 1).otherwise(0))
            .cast("long")
            .alias("nt"),
            F.sum(F.when(F.col("treat") == 0, 1).otherwise(0))
            .cast("long")
            .alias("nc"),
            F.sum(F.when(F.col("treat") == 1, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("st"),
            F.sum(F.when(F.col("treat") == 0, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("sc"),
        )
        .filter((F.col("nt") > 0) & (F.col("nc") > 0))
    )
    # Hajek: Σ_s st_s/e_s / Σ_s nt_s/e_s with e_s = nt/(nt+nc); the
    # 1/e_s factors are rationals of exact integers — expressed as
    # st·(nt+nc)/nt so both engines evaluate identical doubles
    mu_t_num = F.sum(
        F.col("st") * (F.col("nt") + F.col("nc")) / F.col("nt")
    )
    mu_t_den = F.sum(F.col("nt") + F.col("nc"))
    mu_c_num = F.sum(
        F.col("sc") * (F.col("nt") + F.col("nc")) / F.col("nc")
    )
    agg = cells.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        mu_t_num.alias("tn"),
        mu_c_num.alias("cn"),
        mu_t_den.cast("long").alias("den"),
    )
    mt = F.col("tn") / (100.0 * F.col("den"))
    mc = F.col("cn") / (100.0 * F.col("den"))
    return agg.select(
        "n_strata",
        F.round(mt, 4).alias("mean_treat_ipw"),
        F.round(mc, 4).alias("mean_ctrl_ipw"),
        F.round(mt - mc, 4).alias("ate_ipw"),
    )


IPW_SQL = """
WITH o AS (
    SELECT o_custkey,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders),
strata AS (
    SELECT o_custkey, least(count(*) // 4, 4) AS stratum,
           CAST(o_custkey % 2 AS BIGINT) AS treat
    FROM o GROUP BY o_custkey),
cells AS (
    SELECT stratum,
           CAST(sum(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS nt,
           CAST(sum(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS nc,
           CAST(sum(CASE WHEN treat = 1 THEN cents ELSE 0 END)
                AS BIGINT) AS st,
           CAST(sum(CASE WHEN treat = 0 THEN cents ELSE 0 END)
                AS BIGINT) AS sc
    FROM o JOIN strata USING (o_custkey)
    GROUP BY stratum
    HAVING nt > 0 AND nc > 0),
agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n_strata,
           sum(st * (nt + nc) * 1.0 / nt) AS tn,
           sum(sc * (nt + nc) * 1.0 / nc) AS cn,
           CAST(sum(nt + nc) AS BIGINT) AS den
    FROM cells)
SELECT n_strata,
       round(tn / (100.0 * den), 4) AS mean_treat_ipw,
       round(cn / (100.0 * den), 4) AS mean_ctrl_ipw,
       round(tn / (100.0 * den) - cn / (100.0 * den), 4) AS ate_ipw
FROM agg
"""


# ------------------------------------------------ session Weibull

_WB_GAP_S = 1800
_WB_MICRO = 1_000_000


def _events_session_weibull(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 1000000").alias(
            "s"
        ),
    )
    wo = Window.partitionBy("user_id").orderBy("s")
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("s").over(wo).isNull()
            | (F.col("s") - F.lag("s").over(wo) > _WB_GAP_S),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sid",
        F.sum("new_sess").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    dur = (
        sess.groupBy("user_id", "sid")
        .agg((F.max("s") - F.min("s")).cast("long").alias("dur"))
        .filter(F.col("dur") >= 1)
    )
    ranked = global_row_number(
        dur,
        [F.asc("dur"), F.asc("user_id"), F.asc("sid")],
        rank_col="rk",
    )
    nn = dur.agg(F.count(F.lit(1)).cast("long").alias("n"))
    # median-rank F_i = (i − 0.3)/(n + 0.4); x = ln(dur), y =
    # ln(−ln(1−F)), both rounded to integer MICRO-units per row so the
    # OLS moments are exact decimal sums (the sim_mrr_eval contract)
    xy = ranked.crossJoin(F.broadcast(nn)).select(
        "n",
        F.round(F.log(F.col("dur").cast("double")) * _WB_MICRO)
        .cast("long")
        .alias("x"),
        F.round(
            F.log(
                -F.log(
                    1.0
                    - (F.col("rk") - 0.3) / (F.col("n") + 0.4)
                )
            )
            * _WB_MICRO
        )
        .cast("long")
        .alias("y"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = xy.agg(
        F.first("n").alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("y") * dec("y")).alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    slope = (d("n") * d("sxy") - d("sx") * d("sy")) / (
        d("n") * d("sxx") - d("sx") * d("sx")
    )
    icept = (d("sy") - slope * d("sx")) / d("n")
    r2 = (
        (d("n") * d("sxy") - d("sx") * d("sy"))
        * (d("n") * d("sxy") - d("sx") * d("sy"))
        / (
            (d("n") * d("sxx") - d("sx") * d("sx"))
            * (d("n") * d("syy") - d("sy") * d("sy"))
        )
    )
    return m.select(
        F.col("n").cast("long").alias("n_sessions"),
        F.round(slope, 4).alias("shape"),
        F.round(
            F.exp(-(icept / _WB_MICRO) / slope), 2
        ).alias("scale_s"),
        F.round(r2, 4).alias("r2"),
    )


WEIBULL_SQL = f"""
WITH e AS (
    SELECT user_id, epoch_us(ts) // 1000000 AS s FROM events),
flagged AS (
    SELECT user_id, s,
           CASE WHEN lag(s) OVER (PARTITION BY user_id ORDER BY s)
                     IS NULL
                  OR s - lag(s) OVER (PARTITION BY user_id ORDER BY s)
                     > {_WB_GAP_S}
                THEN 1 ELSE 0 END AS new_sess
    FROM e),
sess AS (
    SELECT user_id, s,
           sum(new_sess) OVER (PARTITION BY user_id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM flagged),
dur AS (
    SELECT user_id, sid, CAST(max(s) - min(s) AS BIGINT) AS dur
    FROM sess GROUP BY user_id, sid
    HAVING max(s) - min(s) >= 1),
ranked AS (
    SELECT dur, row_number() OVER (ORDER BY dur, user_id, sid) AS rk
    FROM dur),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dur),
xy AS (
    SELECT n,
           CAST(round(ln(CAST(dur AS DOUBLE)) * {_WB_MICRO}, 0)
                AS BIGINT) AS x,
           CAST(round(ln(-ln(1.0 - (rk - 0.3) / (n + 0.4)))
                      * {_WB_MICRO}, 0) AS BIGINT) AS y
    FROM ranked, nn),
m AS (
    SELECT min(n) AS n,
           sum(x) AS sx, sum(y) AS sy,
           sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
    FROM xy),
fit AS (
    SELECT n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
           CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2
    FROM m)
SELECT CAST(n AS BIGINT) AS n_sessions,
       round(slope, 4) AS shape,
       round(exp(-(((syd - slope * sxd) / n) / {_WB_MICRO}) / slope), 2)
           AS scale_s,
       round(r2, 4) AS r2
FROM fit
"""


# ------------------------------------------------ TTR-length curve


def _text_ttr_length_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = read_table(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("w")
    )
    per = d.select(
        F.size("w").alias("n_tok"),
        F.size(F.array_distinct("w")).alias("n_typ"),
    )
    bucketed = per.select(
        F.least(
            ((F.col("n_tok") - F.col("n_tok") % 10) / 10).cast("long"),
            F.lit(9),
        ).alias("len_bucket"),
        "n_tok",
        "n_typ",
    )
    return (
        bucketed.groupBy("len_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("n_tok"), 4).alias("mean_tokens"),
            F.round(
                F.avg(F.col("n_typ") / F.col("n_tok")), 6
            ).alias("mean_ttr"),
        )
        .orderBy("len_bucket")
    )


TTR_SQL = """
WITH d AS (SELECT string_split(text, ' ') AS w FROM documents),
per AS (
    SELECT len(w) AS n_tok, len(list_distinct(w)) AS n_typ FROM d),
b AS (
    SELECT least(n_tok // 10, 9) AS len_bucket, n_tok, n_typ FROM per)
SELECT CAST(len_bucket AS BIGINT) AS len_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(n_tok), 4) AS mean_tokens,
       round(avg(n_typ * 1.0 / n_tok), 6) AS mean_ttr
FROM b GROUP BY len_bucket ORDER BY len_bucket
"""


QUERIES: dict[str, QuerySpec] = {
    "text_rater_kappa": QuerySpec(_text_rater_kappa, KAPPA_SQL),
    "orders_median_ci_ranks": QuerySpec(
        _orders_median_ci_ranks, MEDCI_SQL
    ),
    "events_markov_heldout_acc": QuerySpec(
        _events_markov_heldout_acc, MARKOV_HELDOUT_SQL
    ),
    "orders_ipw_ate": QuerySpec(_orders_ipw_ate, IPW_SQL),
    "events_session_weibull": QuerySpec(
        _events_session_weibull, WEIBULL_SQL
    ),
    "text_ttr_length_curve": QuerySpec(_text_ttr_length_curve, TTR_SQL),
}
