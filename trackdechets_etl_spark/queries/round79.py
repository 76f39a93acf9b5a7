"""Round-15 STAGED additions (not yet registered): six grep-verified
gaps in the inequality / concordance / EDF / paired-test / corpus-drift
families, written and oracle-twinned under the full round78 discipline
(exact integers until the final divisions, fixed-order float algebra
mirrored verbatim in DuckDB, degenerate-data guards on exact-integer
predicates in BOTH engines).

STAGING CONTRACT: this module is deliberately NOT merged into
``all_queries()`` — the round-14 registry unfreeze budget (≤10, judge
ask #7) was exhausted by round78. Round 15 registers these by adding
``round79`` to the import list and ``**round79.QUERIES`` to the merge in
``queries/__init__.py``, then runs the standard per-entry gate (3-SF
selfcheck + partition + strategy invariance + same-session sweep rows)
before queueing them in the driver window. Until then they are exercised
by ``tests/test_round79_staged.py`` — the same Spark-vs-DuckDB compare
as tests/test_oracle.py, at sf0.001.

- ``orders_theil_index``: Theil T and L inequality of order value per
  order priority — completes the inequality family (gini = rank-based,
  herfindahl = concentration, atkinson = welfare-theoretic, lorenz =
  curve; Theil is the entropy-based member and the only one that
  decomposes additively between/within groups). T = Σx·ln x/(Σx) −
  ln(Σx/n), L = ln(Σx/n) − Σln x/n: two double sums (the atkinson
  error-magnitude argument) over exact cents, ln(0) guarded on the
  exact integer min.
- ``events_kendall_w``: Kendall's coefficient of concordance across
  complete-day blocks × event types — the effect-size companion of
  events_friedman_test (W = χ²_F/(n(k−1))); reuses the identical
  midrank/tie machinery and float tree, so the two entries cannot
  drift apart. Adds the standard F approximation (n−1)W/(1−W), NULL
  at W = 1 via the shared computed tree.
- ``events_anderson_darling``: two-sample Anderson–Darling A² between
  the user-parity arms (the events_two_sample_ks / cramer_von_mises
  contract) in the Scholz–Stephens (1987) midrank form for tied data.
  Per distinct cents value j: with half-unit-exact 2·B̃_j (pooled
  mid-cumulative) and 2·M̃_j (arm-0 mid-cumulative), the term is
  l_j · num² / den4 with num = N·(2M̃) − n0·(2B̃) and
  den4 = (2B̃)(2N − 2B̃) − N·l_j — ALL exact integers, ONE division
  per term, summed over the bounded distinct-value grid (the
  allowlisted single-partition window domain). den4 = 0 only when a
  single distinct value carries the whole sample — guarded exactly.
- ``events_sign_test``: paired sign test of per-user click-vs-purchase
  spending (the mcnemar/kappa pairing: same users, same log) —
  n_pos/n_neg/n_tie exact longs, plain and continuity-corrected z
  from one final division each; m = 0 (every user tied) → NULL in
  both engines.
- ``text_js_divergence``: Jensen–Shannon divergence (nats) between the
  unigram term distributions of the even- and odd-doc_id corpus
  halves — the drift/contamination number a training-data pipeline
  puts on two crawls or a train/eval split. Term counts are exact
  longs; each term contributes p/2·ln(2p/(p+q)) + q/2·ln(2q/(p+q))
  (0·ln 0 = 0 dropped via exact-count WHENs); JSD ∈ [0, ln 2] so the
  float sum sits far under the 6dp round (the CvM precedent).
- ``text_heaps_law``: Heaps'-law fit V = K·N^β of 3-gram
  SHINGLE-vocabulary growth — the corpus fingerprint that predicts
  the dedup shingle-index size at 100 TB from a small prefix
  (unigram vocabulary is fixed at 31 words on this synthetic corpus
  at every SF, so the fit runs on the gram domain the dedup
  operators actually index). 32 equal-width doc_id cutoffs; V_b =
  grams with first-occurrence doc ≤ cut_b via one O(vocab × 32)
  broadcast expansion (never a corpus-ordered cumulative window);
  the log-log OLS uses the same regr_slope/regr_intercept/regr_r2
  closed forms as text_zipf_fit, NULL-guarded on exact integer
  distinct-value counts (zero log-log variance makes regr_r2 0/0 —
  an engine divergence).

100 TB shapes: theil / sign / kappa-style single groupBy + global
aggregate (no joins, no windows); kendall_w is O(days·k²) after one
row-scale pass; anderson_darling is bounded by the distinct value grid;
js_divergence is one hash aggregate over (term, parity); heaps_law is
Θ(tokens) + O(vocab·B). None carries a corpus-sized window or an
all-pairs join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec


def _dec(c):
    return c.cast("decimal(38,0)")


# ------------------------------------------------ Theil T / L indices


def _orders_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T = (1/n)Σ(x/μ)ln(x/μ) and Theil L = (1/n)Σln(μ/x) per
    order priority, computed from Σx (decimal-exact), Σx·ln x and
    Σln x (double sums): T = Σx·ln x / Σx − ln μ, L = ln μ − Σln x/n.
    ln(0) is NULL in Spark but −inf in DuckDB, and both indices are
    degenerate on zero values — guarded on the exact integer min
    (the atkinson contract)."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )
    xd = F.col("c").cast("double")
    g = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(_dec(F.col("c"))).alias("s1"),
        F.min("c").alias("mn"),
        F.sum(xd * F.log(xd)).alias("sxlx"),
        F.sum(F.log(xd)).alias("sln"),
    )
    nd = F.col("n").cast("double")
    s1d = F.col("s1").cast("double")
    lnmu = F.log(s1d / nd)
    theil_t = F.col("sxlx") / s1d - lnmu
    theil_l = lnmu - F.col("sln") / nd
    pos = F.col("mn") > 0
    return g.select(
        "o_orderpriority",
        "n",
        F.round(s1d / nd, 6).alias("mean_cents"),
        F.round(F.when(pos, theil_t), 6).alias("theil_t"),
        F.round(F.when(pos, theil_l), 6).alias("theil_l"),
    ).orderBy("o_orderpriority")


THEIL_SQL = """
WITH o AS (
    SELECT o_orderpriority,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
    FROM orders),
g AS (
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           sum(CAST(c AS HUGEINT)) AS s1,
           min(c) AS mn,
           sum(CAST(c AS DOUBLE) * ln(CASE WHEN c > 0
               THEN CAST(c AS DOUBLE) END)) AS sxlx,
           sum(ln(CASE WHEN c > 0 THEN CAST(c AS DOUBLE) END)) AS sln
    FROM o GROUP BY o_orderpriority)
SELECT o_orderpriority, n,
       round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_cents,
       round(CASE WHEN mn > 0 THEN
             sxlx / CAST(s1 AS DOUBLE)
             - ln(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) END, 6)
           AS theil_t,
       round(CASE WHEN mn > 0 THEN
             ln(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             - sln / CAST(n AS DOUBLE) END, 6) AS theil_l
FROM g ORDER BY o_orderpriority
"""


# ------------------------------------------- Kendall's W concordance


def _events_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's W over complete-day blocks × event types: the same
    midrank sums, tie correction, and float tree as
    events_friedman_test (round74.py — the two entries share the
    χ²_F expression verbatim, so they cannot drift), then
    W = χ²_F / (nb·(k−1)) and the F approximation (nb−1)·W/(1−W).
    Degenerate guards on exact integers: k > 1, nb > 0, and the tie
    denominator nb·k·(k²−1) − Σ(t³−t) > 0 (every value tied in every
    block would otherwise be a Spark-NULL / DuckDB-inf divergence);
    F is NULL at W = 1 via the identical computed tree."""
    ev = read_table(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("vc")
    ).localCheckpoint(eager=True)
    ktot = cell.agg(
        F.countDistinct("event_type").cast("long").alias("k")
    )
    complete = (
        cell.groupBy("day")
        .agg(F.count(F.lit(1)).alias("__nt"))
        .crossJoin(F.broadcast(ktot))
        .filter(F.col("__nt") == F.col("k"))
        .select("day")
    )
    blocks = cell.join(complete, "day")
    a = blocks.select("day", "event_type", "vc")
    b = blocks.select(
        F.col("day").alias("day2"), F.col("vc").alias("vc2")
    )
    r2 = (
        a.join(b, F.col("day") == F.col("day2"))
        .groupBy("day", "event_type", "vc")
        .agg(
            (
                2 * F.sum((F.col("vc2") < F.col("vc")).cast("long"))
                + F.sum((F.col("vc2") == F.col("vc")).cast("long"))
                + 1
            ).alias("two_rbar")
        )
    )
    rsum = r2.groupBy("event_type").agg(
        F.sum("two_rbar").cast("long").alias("r2sum")
    )
    agg = rsum.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(_dec(F.col("r2sum")) * _dec(F.col("r2sum"))).alias("sr2sq"),
    )
    nblocks = complete.agg(F.count(F.lit(1)).cast("long").alias("nb"))
    ties = (
        blocks.groupBy("day", "vc")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .agg(
            F.sum(
                _dec(F.col("t")) * _dec(F.col("t")) * _dec(F.col("t"))
                - _dec(F.col("t"))
            ).alias("tsum")
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    j = agg.crossJoin(F.broadcast(nblocks)).crossJoin(F.broadcast(ties))
    # χ²_F: the round74 tree, verbatim.
    chi2 = (
        3.0 * d("sr2sq") / (d("nb") * d("k") * (d("k") + 1.0))
        - 3.0 * d("nb") * (d("k") + 1.0)
    ) / (
        1.0
        - d("tsum") / (d("nb") * d("k") * (d("k") * d("k") - 1.0))
    )
    # exact-integer degeneracy guard: tie denominator > 0, k > 1
    ok = (
        (F.col("nb") > 0)
        & (F.col("k") > 1)
        & (
            _dec(F.col("nb")) * _dec(F.col("k"))
            * (_dec(F.col("k")) * _dec(F.col("k")) - 1)
            - F.col("tsum")
            > 0
        )
    )
    w = chi2 / (d("nb") * (d("k") - 1.0))
    f_stat = (d("nb") - 1.0) * w / (1.0 - w)
    return j.select(
        F.col("nb").alias("n_blocks"),
        "k",
        F.round(F.when(ok, w), 6).alias("kendall_w"),
        F.round(F.when(ok & (w < 1.0), f_stat), 6).alias("f_approx"),
    )


KENDALL_W_SQL = """
WITH cell AS (
    SELECT CAST(ts AS DATE) AS day, event_type,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS vc
    FROM events GROUP BY 1, 2),
ktot AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k
         FROM cell),
complete AS (
    SELECT day FROM cell, ktot GROUP BY day, k
    HAVING count(*) = min(k)),
blocks AS (SELECT cell.* FROM cell JOIN complete USING (day)),
r2 AS (
    SELECT a.day, a.event_type,
           2 * sum(CASE WHEN b.vc < a.vc THEN 1 ELSE 0 END)
           + sum(CASE WHEN b.vc = a.vc THEN 1 ELSE 0 END) + 1
               AS two_rbar
    FROM blocks a JOIN blocks b ON a.day = b.day
    GROUP BY a.day, a.event_type, a.vc),
rsum AS (
    SELECT event_type, CAST(sum(two_rbar) AS BIGINT) AS r2sum
    FROM r2 GROUP BY event_type),
agg AS (
    SELECT CAST(count(*) AS BIGINT) AS k,
           sum(CAST(r2sum AS HUGEINT) * CAST(r2sum AS HUGEINT))
               AS sr2sq
    FROM rsum),
nb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM complete),
ties AS (
    SELECT sum(CAST(t AS HUGEINT) * t * t - t) AS tsum
    FROM (SELECT day, vc, CAST(count(*) AS BIGINT) AS t
          FROM blocks GROUP BY day, vc)),
calc AS (
    SELECT nb, k, tsum,
           (3.0 * CAST(sr2sq AS DOUBLE)
            / (CAST(nb AS DOUBLE) * CAST(k AS DOUBLE)
               * (CAST(k AS DOUBLE) + 1.0))
            - 3.0 * CAST(nb AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0))
           / (1.0 - CAST(tsum AS DOUBLE)
                    / (CAST(nb AS DOUBLE) * CAST(k AS DOUBLE)
                       * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE)
                          - 1.0)))
           / (CAST(nb AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0)) AS w,
           (nb > 0 AND k > 1
            AND CAST(nb AS HUGEINT) * k * (CAST(k AS HUGEINT) * k - 1)
                - tsum > 0) AS ok
    FROM agg, nb, ties)
SELECT nb AS n_blocks, k,
       round(CASE WHEN ok THEN w END, 6) AS kendall_w,
       round(CASE WHEN ok AND w < 1.0
             THEN (CAST(nb AS DOUBLE) - 1.0) * w / (1.0 - w) END, 6)
           AS f_approx
FROM calc
"""


# ------------------------------- two-sample Anderson-Darling (ties)


def _events_anderson_darling(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Scholz–Stephens midrank A² between the user-parity arms over
    the distinct-cents grid. Per distinct value: l = pooled count,
    2B̃ = 2·cum_pool − l, 2M̃ = 2·cum_arm0 − c0 (half-unit-exact
    mid-cumulatives); term = l·num²/den4 with
    num = N·2M̃ − n0·2B̃, den4 = 2B̃·(2N − 2B̃) − N·l — exact
    integers in decimal(38,0)/HUGEINT, ONE division per term.
    A² = Σterm/n0 (+ the symmetric arm-1 sum, which equals the arm-0
    sum·n0/n1 only without ties, so both are computed) scaled by
    1/N. den4 = 0 ⟺ one distinct value carries everything —
    guarded per-term on the exact integer (both arms constant-equal
    data → A² NULL via the n_distinct > 1 outer guard)."""
    ev = read_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("grp"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    vals = ev.groupBy("cents").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("c1"),
    )
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
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
    )
    t = cum.crossJoin(F.broadcast(tot))
    l = F.col("c0") + F.col("c1")
    N = F.col("n0") + F.col("n1")
    twoB = _dec(2 * (F.col("f0") + F.col("f1")) - l)
    twoM0 = _dec(2 * F.col("f0") - F.col("c0"))
    twoM1 = _dec(2 * F.col("f1") - F.col("c1"))
    num0 = _dec(N) * twoM0 - _dec(F.col("n0")) * twoB
    num1 = _dec(N) * twoM1 - _dec(F.col("n1")) * twoB
    den4 = twoB * (_dec(2 * N) - twoB) - _dec(N) * _dec(l)
    # term: one double division of exact decimals (den4 > 0 always
    # holds when more than one distinct value exists; the WHEN is the
    # exact-integer guard for the single-value edge)
    term0 = F.when(
        den4 > 0,
        _dec(l).cast("double")
        * (num0 * num0).cast("double")
        / den4.cast("double"),
    )
    term1 = F.when(
        den4 > 0,
        _dec(l).cast("double")
        * (num1 * num1).cast("double")
        / den4.cast("double"),
    )
    s = t.groupBy("n0", "n1").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(term0).alias("s0"),
        F.sum(term1).alias("s1"),
    )
    Nd = (F.col("n0") + F.col("n1")).cast("double")
    ok = (
        (F.col("n0") > 0) & (F.col("n1") > 0) & (F.col("n_distinct") > 1)
    )
    ad = (
        F.col("s0") / F.col("n0").cast("double")
        + F.col("s1") / F.col("n1").cast("double")
    ) / Nd
    return s.select(
        "n0",
        "n1",
        "n_distinct",
        F.round(F.when(ok, ad), 6).alias("ad_stat"),
    )


ANDERSON_DARLING_SQL = """
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
                         ROWS UNBOUNDED PRECEDING) AS f0,
           sum(c1) OVER (ORDER BY cents
                         ROWS UNBOUNDED PRECEDING) AS f1
    FROM vals),
tot AS (
    SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n0,
           CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1
    FROM ev),
terms AS (
    SELECT n0, n1,
           CAST(c0 + c1 AS HUGEINT) AS l,
           CAST(2 * (f0 + f1) - (c0 + c1) AS HUGEINT) AS twob,
           CAST(2 * f0 - c0 AS HUGEINT) AS twom0,
           CAST(2 * f1 - c1 AS HUGEINT) AS twom1,
           CAST(n0 + n1 AS HUGEINT) AS nn
    FROM cum, tot),
calc AS (
    SELECT n0, n1,
           CAST(count(*) AS BIGINT) AS n_distinct,
           sum(CASE WHEN twob * (2 * nn - twob) - nn * l > 0 THEN
               CAST(l AS DOUBLE)
               * CAST((nn * twom0 - n0 * twob)
                      * (nn * twom0 - n0 * twob) AS DOUBLE)
               / CAST(twob * (2 * nn - twob) - nn * l AS DOUBLE)
               END) AS s0,
           sum(CASE WHEN twob * (2 * nn - twob) - nn * l > 0 THEN
               CAST(l AS DOUBLE)
               * CAST((nn * twom1 - n1 * twob)
                      * (nn * twom1 - n1 * twob) AS DOUBLE)
               / CAST(twob * (2 * nn - twob) - nn * l AS DOUBLE)
               END) AS s1
    FROM terms GROUP BY n0, n1)
SELECT n0, n1, n_distinct,
       round(CASE WHEN n0 > 0 AND n1 > 0 AND n_distinct > 1 THEN
             (s0 / CAST(n0 AS DOUBLE) + s1 / CAST(n1 AS DOUBLE))
             / CAST(n0 + n1 AS DOUBLE) END, 6) AS ad_stat
FROM calc
"""


# ----------------------------------------------- paired sign test


def _events_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired sign test of per-user click vs purchase spending (cents
    sums; the mcnemar/kappa pairing). n_pos/n_neg/n_tie exact longs;
    z = (n_pos − n_neg)/√m and the continuity-corrected
    z_cc = sign·(|n_pos − n_neg| − 1)/√m with m = n_pos + n_neg,
    z_cc = 0 at n_pos = n_neg. m = 0 (all users tied) → NULL in both
    engines via the exact-integer guard."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    per = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "click", F.col("c")).otherwise(0)
        ).alias("sc"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("c")).otherwise(
                0
            )
        ).alias("sp"),
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum((F.col("sc") > F.col("sp")).cast("long"))
        .cast("long")
        .alias("n_pos"),
        F.sum((F.col("sc") < F.col("sp")).cast("long"))
        .cast("long")
        .alias("n_neg"),
        F.sum((F.col("sc") == F.col("sp")).cast("long"))
        .cast("long")
        .alias("n_tie"),
    )
    m = F.col("n_pos") + F.col("n_neg")
    diff = F.col("n_pos") - F.col("n_neg")
    sq = F.sqrt(m.cast("double"))
    z = diff.cast("double") / sq
    z_cc = F.when(diff > 0, (diff - 1).cast("double") / sq).when(
        diff < 0, (diff + 1).cast("double") / sq
    ).otherwise(F.lit(0.0))
    return agg.select(
        "n_users",
        "n_pos",
        "n_neg",
        "n_tie",
        F.round(F.when(m > 0, z), 6).alias("z"),
        F.round(F.when(m > 0, z_cc), 6).alias("z_cc"),
    )


SIGN_TEST_SQL = """
WITH ev AS (
    SELECT user_id, event_type,
           CAST(round(value * 100, 0) AS BIGINT) AS c
    FROM events),
per AS (
    SELECT user_id,
           sum(CASE WHEN event_type = 'click' THEN c ELSE 0 END) AS sc,
           sum(CASE WHEN event_type = 'purchase' THEN c ELSE 0 END)
               AS sp
    FROM ev GROUP BY user_id),
agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN sc > sp THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pos,
           CAST(sum(CASE WHEN sc < sp THEN 1 ELSE 0 END) AS BIGINT)
               AS n_neg,
           CAST(sum(CASE WHEN sc = sp THEN 1 ELSE 0 END) AS BIGINT)
               AS n_tie
    FROM per)
SELECT n_users, n_pos, n_neg, n_tie,
       round(CASE WHEN n_pos + n_neg > 0 THEN
             CAST(n_pos - n_neg AS DOUBLE)
             / sqrt(CAST(n_pos + n_neg AS DOUBLE)) END, 6) AS z,
       round(CASE WHEN n_pos + n_neg > 0 THEN
             CASE WHEN n_pos > n_neg THEN
                  CAST(n_pos - n_neg - 1 AS DOUBLE)
                  / sqrt(CAST(n_pos + n_neg AS DOUBLE))
                  WHEN n_pos < n_neg THEN
                  CAST(n_pos - n_neg + 1 AS DOUBLE)
                  / sqrt(CAST(n_pos + n_neg AS DOUBLE))
                  ELSE 0.0 END END, 6) AS z_cc
FROM agg
"""


# ------------------------------------- Jensen-Shannon corpus drift


def _text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSD (nats) between the unigram distributions of the even- and
    odd-doc_id halves. Counts are exact longs; per shared-vocabulary
    term the contribution is p/2·ln(2p/(p+q)) + q/2·ln(2q/(p+q)),
    each WHEN-gated on the exact count so 0·ln 0 terms vanish
    identically in both engines; JSD ∈ [0, ln 2], so the float sum
    is orders of magnitude inside the 6dp round (CvM precedent).
    Either half empty → NULL via the exact token-total guard."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    vocab = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("c0"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
    )
    tot = toks.agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("t0"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("t1"),
    )
    v = vocab.crossJoin(F.broadcast(tot))
    p = F.col("c0").cast("double") / F.col("t0").cast("double")
    q = F.col("c1").cast("double") / F.col("t1").cast("double")
    # the whole-row guard keeps the divisions out of the evaluated
    # branch when a half is empty (ANSI divide-by-zero; the output is
    # NULL-guarded on the same exact integers below) — CASE branches
    # evaluate lazily in both engines
    contrib = F.when(
        (F.col("t0") > 0) & (F.col("t1") > 0),
        F.coalesce(
            F.when(F.col("c0") > 0, p / 2.0 * F.log(2.0 * p / (p + q))),
            F.lit(0.0),
        )
        + F.coalesce(
            F.when(F.col("c1") > 0, q / 2.0 * F.log(2.0 * q / (p + q))),
            F.lit(0.0),
        ),
    ).otherwise(F.lit(0.0))
    s = v.groupBy("t0", "t1").agg(
        F.count(F.lit(1)).cast("long").alias("vocab_total"),
        F.sum((F.col("c0") > 0).cast("long")).cast("long").alias("vocab0"),
        F.sum((F.col("c1") > 0).cast("long")).cast("long").alias("vocab1"),
        F.sum(((F.col("c0") > 0) & (F.col("c1") > 0)).cast("long"))
        .cast("long")
        .alias("vocab_shared"),
        F.sum(contrib).alias("jsd_raw"),
    )
    ok = (F.col("t0") > 0) & (F.col("t1") > 0)
    return s.select(
        F.col("t0").alias("tokens0"),
        F.col("t1").alias("tokens1"),
        "vocab0",
        "vocab1",
        "vocab_shared",
        F.round(F.when(ok, F.col("jsd_raw")), 6).alias("jsd_nats"),
    )


JSD_SQL = """
WITH toks AS (
    SELECT doc_id % 2 AS half, lower(t.tok) AS tok
    FROM documents,
         unnest(string_split_regex(text, '\\s+')) AS t(tok)
    WHERE t.tok <> ''),
vocab AS (
    SELECT tok,
           CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c0,
           CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS c1
    FROM toks GROUP BY tok),
tot AS (
    SELECT CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS t0,
           CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS t1
    FROM toks),
s AS (
    SELECT t0, t1,
           CAST(count(*) AS BIGINT) AS vocab_total,
           CAST(sum(CASE WHEN c0 > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS vocab0,
           CAST(sum(CASE WHEN c1 > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS vocab1,
           CAST(sum(CASE WHEN c0 > 0 AND c1 > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS vocab_shared,
           sum(CASE WHEN t0 > 0 AND t1 > 0 THEN
               coalesce(CASE WHEN c0 > 0 THEN
                   CAST(c0 AS DOUBLE) / CAST(t0 AS DOUBLE) / 2.0
                   * ln(2.0 * (CAST(c0 AS DOUBLE) / CAST(t0 AS DOUBLE))
                        / (CAST(c0 AS DOUBLE) / CAST(t0 AS DOUBLE)
                           + CAST(c1 AS DOUBLE) / CAST(t1 AS DOUBLE)))
                   END, 0.0)
               + coalesce(CASE WHEN c1 > 0 THEN
                   CAST(c1 AS DOUBLE) / CAST(t1 AS DOUBLE) / 2.0
                   * ln(2.0 * (CAST(c1 AS DOUBLE) / CAST(t1 AS DOUBLE))
                        / (CAST(c0 AS DOUBLE) / CAST(t0 AS DOUBLE)
                           + CAST(c1 AS DOUBLE) / CAST(t1 AS DOUBLE)))
                   END, 0.0)
               ELSE 0.0 END) AS jsd_raw
    FROM vocab, tot GROUP BY t0, t1)
SELECT t0 AS tokens0, t1 AS tokens1, vocab0, vocab1, vocab_shared,
       round(CASE WHEN t0 > 0 AND t1 > 0 THEN jsd_raw END, 6)
           AS jsd_nats
FROM s
"""


# --------------------------------------------------- Heaps'-law fit

_HEAPS_B = 32


def _text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V = K·N^β of 3-gram SHINGLE-vocabulary growth
    via log-log OLS over {_HEAPS_B} equal-width doc_id cutoffs — the
    corpus fingerprint that sizes the dedup machinery: V(N) predicts
    the shingle-index row count (ngram_jaccard / containment /
    winnow inverted indexes) at 100 TB from a small prefix. Unigram
    vocabulary is degenerate on this synthetic corpus (31 words fixed
    at every SF — measured), so the fit runs on the same word-3-gram
    domain the dedup operators index (the round76 winnow gram
    construction, minus the hash). V_b = grams whose FIRST-occurrence
    doc ≤ cut_b, via one groupBy-min over the gram table expanded
    against the broadcast 32-row cutoff frame — O(vocab × B), never a
    corpus-ordered cumulative window; N_b = total grams at the cutoff
    likewise over per-doc gram counts. OLS closed forms are
    regr_slope/intercept/r2 (the text_zipf_fit precedent); the fit is
    NULL-guarded on EXACT integers — distinct N values > 1 for
    beta/K, additionally distinct V values > 1 for r2 (zero
    y-variance makes regr_r2 0/0, which Spark and DuckDB resolve
    differently — the failure the unigram domain exhibited)."""
    d = read_table(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " "), lambda x: x != "")
    # winnow's sub-k guard: sequence(1, n) with n < 1 is DESCENDING
    # in Spark, not empty — short docs must yield zero grams.
    gram_arr = F.when(
        F.size(ws) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(ws, i),
                F.element_at(ws, i + 1),
                F.element_at(ws, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = d.select("doc_id", F.explode(gram_arr).alias("g"))
    first = grams.groupBy("g").agg(F.min("doc_id").alias("fd"))
    ntok = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("nt")
    )
    rng = d.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    cuts = rng.select(
        F.explode(F.sequence(F.lit(1), F.lit(_HEAPS_B))).alias("b"),
        "lo",
        "hi",
    ).select(
        "b",
        (
            F.col("lo")
            + F.floor(
                (F.col("hi") - F.col("lo") + 1)
                * F.col("b")
                / F.lit(_HEAPS_B)
            )
            - 1
        ).alias("cut"),
    )
    vb = (
        first.crossJoin(F.broadcast(cuts))
        .filter(F.col("fd") <= F.col("cut"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    nb = (
        ntok.crossJoin(F.broadcast(cuts))
        .filter(F.col("doc_id") <= F.col("cut"))
        .groupBy("b")
        .agg(F.sum("nt").cast("long").alias("n"))
    )
    pts = (
        vb.join(nb, "b")
        .filter((F.col("v") > 0) & (F.col("n") > 0))
        .select(
            "v",
            "n",
            F.log(F.col("n").cast("double")).alias("lx"),
            F.log(F.col("v").cast("double")).alias("ly"),
        )
    )
    agg = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.countDistinct("n").cast("long").alias("nx"),
        F.countDistinct("v").cast("long").alias("nv"),
        F.expr("regr_slope(ly, lx)").alias("__b"),
        F.expr("regr_intercept(ly, lx)").alias("__i"),
        F.expr("regr_r2(ly, lx)").alias("__r2"),
    )
    okx = F.col("nx") > 1
    return agg.select(
        "n_points",
        F.round(F.when(okx, F.col("__b")), 6).alias("heaps_beta"),
        F.round(F.when(okx, F.exp(F.col("__i"))), 6).alias("heaps_k"),
        F.round(
            F.when(okx & (F.col("nv") > 1), F.col("__r2")), 6
        ).alias("r2"),
    )


HEAPS_SQL = f"""
WITH toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '')
               AS ws
    FROM documents),
grams AS (
    SELECT doc_id, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS g
    FROM toks, unnest(generate_series(1, len(ws) - 2)) u(i)),
first AS (
    SELECT g, min(doc_id) AS fd FROM grams GROUP BY g),
ntok AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS nt
    FROM grams GROUP BY doc_id),
rng AS (
    SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
cuts AS (
    SELECT b, lo + CAST(floor((hi - lo + 1) * b / {_HEAPS_B}.0)
                        AS BIGINT) - 1 AS cut
    FROM rng, generate_series(1, {_HEAPS_B}) AS g(b)),
vb AS (
    SELECT b, CAST(count(*) AS BIGINT) AS v
    FROM first, cuts WHERE fd <= cut GROUP BY b),
nbt AS (
    SELECT b, CAST(sum(nt) AS BIGINT) AS n
    FROM ntok, cuts WHERE doc_id <= cut GROUP BY b),
pts AS (
    SELECT v, n,
           ln(CAST(n AS DOUBLE)) AS lx, ln(CAST(v AS DOUBLE)) AS ly
    FROM vb JOIN nbt USING (b)
    WHERE v > 0 AND n > 0),
agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n_points,
           CAST(count(DISTINCT n) AS BIGINT) AS nx,
           CAST(count(DISTINCT v) AS BIGINT) AS nv,
           regr_slope(ly, lx) AS b_, regr_intercept(ly, lx) AS i_,
           regr_r2(ly, lx) AS r2_
    FROM pts)
SELECT n_points,
       round(CASE WHEN nx > 1 THEN b_ END, 6) AS heaps_beta,
       round(CASE WHEN nx > 1 THEN exp(i_) END, 6) AS heaps_k,
       round(CASE WHEN nx > 1 AND nv > 1 THEN r2_ END, 6) AS r2
FROM agg
"""


# --------------------------------- cross-half unigram-LM perplexity


_PPL_MU = 2000.0


def _text_perplexity_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CCNet-style corpus-quality signal: a Dirichlet-smoothed unigram
    LM trained on the EVEN-doc_id half scores the ODD half; the output
    is the eval cross-entropy (nats/token), perplexity, and OOV share.
    P(w|train) = (c_tr(w) + μ/V) / (T_tr + μ) with a uniform prior
    over the JOINT vocabulary V (so every eval token, including train
    OOV, has positive probability — no −inf terms by construction).
    Counts and V are exact longs; CE = −Σ c_ev(w)·ln P(w) / T_ev is
    one double log-sum (CvM magnitude argument: each term is
    ≤ c·ln(T_tr + μ)). Either half empty → NULL via exact guards,
    with the divisions kept inside the lazily-evaluated branch."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    vocab = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("ctr"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("cev"),
    )
    tot = vocab.agg(
        F.sum("ctr").cast("long").alias("ttr"),
        F.sum("cev").cast("long").alias("tev"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    t = vocab.crossJoin(F.broadcast(tot))
    ok_row = (F.col("ttr") > 0) & (F.col("tev") > 0)
    p = (
        F.col("ctr").cast("double")
        + F.lit(_PPL_MU) / F.col("v").cast("double")
    ) / (F.col("ttr").cast("double") + F.lit(_PPL_MU))
    s = t.groupBy("ttr", "tev", "v").agg(
        F.sum(
            F.when(
                ok_row & (F.col("cev") > 0),
                -F.col("cev").cast("double") * F.log(p),
            ).otherwise(F.lit(0.0))
        ).alias("nll"),
        F.sum(
            F.when((F.col("cev") > 0) & (F.col("ctr") == 0), F.col("cev"))
            .otherwise(F.lit(0))
        )
        .cast("long")
        .alias("oov_tokens"),
    )
    ok = (F.col("ttr") > 0) & (F.col("tev") > 0)
    ce = F.col("nll") / F.col("tev").cast("double")
    return s.select(
        F.col("ttr").alias("train_tokens"),
        F.col("tev").alias("eval_tokens"),
        F.col("v").alias("vocab_joint"),
        "oov_tokens",
        F.round(
            F.when(
                ok,
                F.col("oov_tokens").cast("double")
                / F.col("tev").cast("double"),
            ),
            6,
        ).alias("oov_share"),
        F.round(F.when(ok, ce), 6).alias("ce_nats"),
        F.round(F.when(ok, F.exp(ce)), 6).alias("perplexity"),
    )


PERPLEXITY_SQL = f"""
WITH toks AS (
    SELECT doc_id % 2 AS half, lower(t.tok) AS tok
    FROM documents,
         unnest(string_split_regex(text, '\\s+')) AS t(tok)
    WHERE t.tok <> ''),
vocab AS (
    SELECT tok,
           CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS ctr,
           CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS cev
    FROM toks GROUP BY tok),
tot AS (
    SELECT CAST(sum(ctr) AS BIGINT) AS ttr,
           CAST(sum(cev) AS BIGINT) AS tev,
           CAST(count(*) AS BIGINT) AS v
    FROM vocab),
s AS (
    SELECT ttr, tev, v,
           sum(CASE WHEN ttr > 0 AND tev > 0 AND cev > 0 THEN
               -CAST(cev AS DOUBLE)
               * ln((CAST(ctr AS DOUBLE)
                     + {_PPL_MU} / CAST(v AS DOUBLE))
                    / (CAST(ttr AS DOUBLE) + {_PPL_MU}))
               ELSE 0.0 END) AS nll,
           CAST(sum(CASE WHEN cev > 0 AND ctr = 0 THEN cev
                    ELSE 0 END) AS BIGINT) AS oov_tokens
    FROM vocab, tot GROUP BY ttr, tev, v)
SELECT ttr AS train_tokens, tev AS eval_tokens, v AS vocab_joint,
       oov_tokens,
       round(CASE WHEN ttr > 0 AND tev > 0 THEN
             CAST(oov_tokens AS DOUBLE) / CAST(tev AS DOUBLE) END, 6)
           AS oov_share,
       round(CASE WHEN ttr > 0 AND tev > 0 THEN
             nll / CAST(tev AS DOUBLE) END, 6) AS ce_nats,
       round(CASE WHEN ttr > 0 AND tev > 0 THEN
             exp(nll / CAST(tev AS DOUBLE)) END, 6) AS perplexity
FROM s
"""


# ---------------------------------------- Watson U² two-sample test


def _events_watson_u2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watson's U² between the user-parity arms — the
    rotation-invariant member that completes the EDF family (KS sup,
    CvM L², AD tail-weighted L²): U² = CvM − (nm/N²)·N·ḡ² centers the
    CDF-gap before integrating, i.e.
    U² = (nm/N²)·[Σ l·g² − (Σ l·g)²/N]. Mirrors the
    events_cramer_von_mises frame verbatim (same distinct-cents cum
    window, same decimal-exact cross difference widened to double
    before weighting — the KS widening contract); the two weighted
    sums are CvM-precedent float sums. Either arm empty → NULL on
    the exact counts."""
    ev = read_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("grp"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    vals = ev.groupBy("cents").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("c1"),
    )
    wv = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = vals.select(
        "c0",
        "c1",
        F.sum("c0").over(wv).alias("f0"),
        F.sum("c1").over(wv).alias("f1"),
    )
    tot = ev.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
    )
    t = cum.crossJoin(F.broadcast(tot))
    ok_row = (F.col("n0") > 0) & (F.col("n1") > 0)
    g = (
        (_dec(F.col("f0")) * _dec(F.col("n1"))
         - _dec(F.col("f1")) * _dec(F.col("n0"))).cast("double")
        / (F.col("n0").cast("double") * F.col("n1").cast("double"))
    )
    l = (F.col("c0") + F.col("c1")).cast("double")
    s = t.groupBy("n0", "n1").agg(
        F.sum(F.when(ok_row, l * g * g).otherwise(F.lit(0.0))).alias(
            "sg2"
        ),
        F.sum(F.when(ok_row, l * g).otherwise(F.lit(0.0))).alias("sg1"),
    )
    Nd = (F.col("n0") + F.col("n1")).cast("double")
    scale = (
        F.col("n0").cast("double") * F.col("n1").cast("double") / (Nd * Nd)
    )
    u2 = scale * (F.col("sg2") - F.col("sg1") * F.col("sg1") / Nd)
    ok = (F.col("n0") > 0) & (F.col("n1") > 0)
    return s.select(
        "n0",
        "n1",
        F.round(F.when(ok, u2), 6).alias("watson_u2"),
    )


WATSON_U2_SQL = """
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
    SELECT c0, c1,
           sum(c0) OVER (ORDER BY cents
                         ROWS UNBOUNDED PRECEDING) AS f0,
           sum(c1) OVER (ORDER BY cents
                         ROWS UNBOUNDED PRECEDING) AS f1
    FROM vals),
tot AS (
    SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n0,
           CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1
    FROM ev),
s AS (
    SELECT n0, n1,
           sum(CASE WHEN n0 > 0 AND n1 > 0 THEN
               CAST(c0 + c1 AS DOUBLE)
               * (CAST(CAST(f0 AS HUGEINT) * n1
                       - CAST(f1 AS HUGEINT) * n0 AS DOUBLE)
                  / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)))
               * (CAST(CAST(f0 AS HUGEINT) * n1
                       - CAST(f1 AS HUGEINT) * n0 AS DOUBLE)
                  / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)))
               ELSE 0.0 END) AS sg2,
           sum(CASE WHEN n0 > 0 AND n1 > 0 THEN
               CAST(c0 + c1 AS DOUBLE)
               * (CAST(CAST(f0 AS HUGEINT) * n1
                       - CAST(f1 AS HUGEINT) * n0 AS DOUBLE)
                  / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)))
               ELSE 0.0 END) AS sg1
    FROM cum, tot GROUP BY n0, n1)
SELECT n0, n1,
       round(CASE WHEN n0 > 0 AND n1 > 0 THEN
             CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)
             / (CAST(n0 + n1 AS DOUBLE) * CAST(n0 + n1 AS DOUBLE))
             * (sg2 - sg1 * sg1 / CAST(n0 + n1 AS DOUBLE)) END, 6)
           AS watson_u2
FROM s
"""


# -------------------------------------------- Brunner-Munzel test


def _events_brunner_munzel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Brunner–Munzel between the user-parity arms — the
    heteroscedasticity-robust successor of Mann–Whitney (BM does not
    assume equal variances under H₀). Everything reduces to EXACT
    integer moments on the distinct-cents frame (the Grubbs
    no-drift argument): with doubled pooled midranks
    2m_j = 2·cumpool_{j−1} + l_j + 1 and doubled within-arm midranks
    2w_ij = 2·cum_i,{j−1} + c_ij + 1,
      S_i = Σ c_ij·2m_j,  N_i = S_i − n_i(n_i+1)  (= Σ c·A_i, the
      placement sum),  Q_i = Σ c_ij·A_ij² with A_ij = 2m_j − 2w_ij,
    and the rank-variance identity Σ c(A−N_i/n_i)² =
    (n_i·Q_i − N_i²)/n_i gives
      p̂ = N_1/(2·n0·n1)   (prob. an arm-1 value exceeds arm-0,
                            ties half-weighted),
      W  = M / (N·sqrt((n0·Q0 − N0²)/(n0−1) + (n1·Q1 − N1²)/(n1−1)))
    with M = n0·S1 − n1·S0 — scipy's brunnermunzel W, all-integer
    until two final divisions and the sqrt. Degenerate guard on the
    exact common-denominator variance numerator
    (n0·Q0 − N0²)(n1−1) + (n1·Q1 − N1²)(n0−1) > 0 and n_i > 1
    (all-tied data ⇒ exactly 0 ⇒ NULL in both engines)."""
    ev = read_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("grp"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    vals = ev.groupBy("cents").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("c1"),
    )
    wv = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = vals.select(
        "c0",
        "c1",
        F.sum("c0").over(wv).alias("f0"),
        F.sum("c1").over(wv).alias("f1"),
    )
    l = F.col("c0") + F.col("c1")
    fp = F.col("f0") + F.col("f1")
    two_m = _dec(2 * fp - l + 1)  # 2·pooled midrank
    two_w0 = _dec(2 * F.col("f0") - F.col("c0") + 1)
    two_w1 = _dec(2 * F.col("f1") - F.col("c1") + 1)
    a0 = two_m - two_w0
    a1 = two_m - two_w1
    s = cum.agg(
        F.sum(_dec(F.col("c0"))).alias("n0d"),
        F.sum(_dec(F.col("c1"))).alias("n1d"),
        F.sum(_dec(F.col("c0")) * two_m).alias("s0"),
        F.sum(_dec(F.col("c1")) * two_m).alias("s1"),
        F.sum(_dec(F.col("c0")) * a0 * a0).alias("q0"),
        F.sum(_dec(F.col("c1")) * a1 * a1).alias("q1"),
    )
    n0 = F.col("n0d")
    n1 = F.col("n1d")
    N0 = F.col("s0") - n0 * (n0 + 1)
    N1 = F.col("s1") - n1 * (n1 + 1)
    vn0 = n0 * F.col("q0") - N0 * N0  # n0·Q0 − N0²  (decimal-exact)
    vn1 = n1 * F.col("q1") - N1 * N1
    ok = (
        (n0 > 1)
        & (n1 > 1)
        & (vn0 * (n1 - 1) + vn1 * (n0 - 1) > 0)
    )
    d = lambda c: c.cast("double")  # noqa: E731
    m_num = n0 * F.col("s1") - n1 * F.col("s0")
    w_bm = d(m_num) / (
        d(n0 + n1)
        * F.sqrt(
            d(vn0) / d(n0 - 1) + d(vn1) / d(n1 - 1)
        )
    )
    p_hat = d(N1) / (2.0 * d(n0) * d(n1))
    return s.select(
        n0.cast("long").alias("n0"),
        n1.cast("long").alias("n1"),
        F.round(F.when(ok, p_hat), 6).alias("p_hat"),
        F.round(F.when(ok, w_bm), 6).alias("w_bm"),
    )


BRUNNER_MUNZEL_SQL = """
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
    SELECT c0, c1,
           sum(c0) OVER (ORDER BY cents
                         ROWS UNBOUNDED PRECEDING) AS f0,
           sum(c1) OVER (ORDER BY cents
                         ROWS UNBOUNDED PRECEDING) AS f1
    FROM vals),
s AS (
    SELECT CAST(sum(c0) AS HUGEINT) AS n0,
           CAST(sum(c1) AS HUGEINT) AS n1,
           sum(CAST(c0 AS HUGEINT)
               * (2 * (f0 + f1) - (c0 + c1) + 1)) AS s0,
           sum(CAST(c1 AS HUGEINT)
               * (2 * (f0 + f1) - (c0 + c1) + 1)) AS s1,
           sum(CAST(c0 AS HUGEINT)
               * ((2 * (f0 + f1) - (c0 + c1) + 1)
                  - (2 * f0 - c0 + 1))
               * ((2 * (f0 + f1) - (c0 + c1) + 1)
                  - (2 * f0 - c0 + 1))) AS q0,
           sum(CAST(c1 AS HUGEINT)
               * ((2 * (f0 + f1) - (c0 + c1) + 1)
                  - (2 * f1 - c1 + 1))
               * ((2 * (f0 + f1) - (c0 + c1) + 1)
                  - (2 * f1 - c1 + 1))) AS q1
    FROM cum),
calc AS (
    SELECT n0, n1,
           s1 - n1 * (n1 + 1) AS bign1,
           n0 * q0 - (s0 - n0 * (n0 + 1)) * (s0 - n0 * (n0 + 1))
               AS vn0,
           n1 * q1 - (s1 - n1 * (n1 + 1)) * (s1 - n1 * (n1 + 1))
               AS vn1,
           n0 * s1 - n1 * s0 AS m_num
    FROM s)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       round(CASE WHEN n0 > 1 AND n1 > 1
                  AND vn0 * (n1 - 1) + vn1 * (n0 - 1) > 0 THEN
             CAST(bign1 AS DOUBLE)
             / (2.0 * CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)) END, 6)
           AS p_hat,
       round(CASE WHEN n0 > 1 AND n1 > 1
                  AND vn0 * (n1 - 1) + vn1 * (n0 - 1) > 0 THEN
             CAST(m_num AS DOUBLE)
             / (CAST(n0 + n1 AS DOUBLE)
                * sqrt(CAST(vn0 AS DOUBLE) / CAST(n0 - 1 AS DOUBLE)
                       + CAST(vn1 AS DOUBLE)
                         / CAST(n1 - 1 AS DOUBLE))) END, 6) AS w_bm
FROM calc
"""


# --------------------------------- Theil between/within decomposition


def _orders_theil_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The additive decomposition that makes Theil T the inequality
    index of choice for group audits: T_total = T_between + T_within,
    T_between = Σ_g s_g·ln(s_g/(n_g/n)), T_within = Σ_g s_g·T_g with
    s_g the group's revenue share. One row; groups = order priority
    (the orders_theil_index frame). Group moments are the same
    decimal-exact Σc / double Σc·ln c sums; the identity holds
    exactly in the algebra and to float roundoff in both engines'
    IDENTICAL trees (the decomposition is evaluated term-by-term in
    the same literal order — 5 alphabetical groups). Any zero value
    → NULL via the exact global min (ln guard)."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )
    xd = F.col("c").cast("double")
    g = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum(_dec(F.col("c"))).alias("sg"),
        F.min("c").alias("mng"),
        F.sum(xd * F.log(xd)).alias("sxlxg"),
    )
    # ordered reduction: alphabetical group order pins the float-sum
    # association identically in both engines (5 terms)
    tot = g.agg(
        F.sum(_dec(F.col("ng").cast("long"))).alias("n"),
        F.sum("sg").alias("s"),
        F.min("mng").alias("mn"),
        F.sum("sxlxg").alias("sxlx"),
    )
    t = g.crossJoin(F.broadcast(tot))
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    ngd = F.col("ng").cast("double")
    sgd = F.col("sg").cast("double")
    share = sgd / sd
    t_g = F.col("sxlxg") / sgd - F.log(sgd / ngd)
    # the mn > 0 branch guard keeps the share/s divisions out of the
    # evaluated path on all-zero-revenue data (ANSI divide-by-zero;
    # the output is NULL-guarded on the same exact integer below)
    per = t.select(
        "o_orderpriority",
        "mn",
        "n",
        "s",
        "sxlx",
        F.when(F.col("mn") > 0, share * F.log(share / (ngd / nd)))
        .otherwise(F.lit(0.0))
        .alias("tb_term"),
        F.when(F.col("mn") > 0, share * t_g)
        .otherwise(F.lit(0.0))
        .alias("tw_term"),
    )
    agg = per.groupBy("mn", "n", "s", "sxlx").agg(
        F.sum("tb_term").alias("t_between"),
        F.sum("tw_term").alias("t_within"),
    )
    t_total = (
        F.col("sxlx") / F.col("s").cast("double")
        - F.log(F.col("s").cast("double") / F.col("n").cast("double"))
    )
    ok = F.col("mn") > 0
    return agg.select(
        F.round(F.when(ok, t_total), 6).alias("theil_total"),
        F.round(F.when(ok, F.col("t_between")), 6).alias("theil_between"),
        F.round(F.when(ok, F.col("t_within")), 6).alias("theil_within"),
        F.round(
            F.when(ok, F.col("t_between") + F.col("t_within")), 6
        ).alias("theil_recomposed"),
    )


THEIL_DECOMP_SQL = """
WITH o AS (
    SELECT o_orderpriority,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
    FROM orders),
g AS (
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS ng,
           sum(CAST(c AS HUGEINT)) AS sg,
           min(c) AS mng,
           sum(CAST(c AS DOUBLE) * ln(CASE WHEN c > 0
               THEN CAST(c AS DOUBLE) END)) AS sxlxg
    FROM o GROUP BY o_orderpriority),
tot AS (
    SELECT sum(CAST(ng AS HUGEINT)) AS n, sum(sg) AS s,
           min(mng) AS mn, sum(sxlxg) AS sxlx
    FROM g),
per AS (
    SELECT mn, n, s, sxlx,
           CASE WHEN mn > 0 THEN
           (CAST(sg AS DOUBLE) / CAST(s AS DOUBLE))
           * ln((CAST(sg AS DOUBLE) / CAST(s AS DOUBLE))
                / (CAST(ng AS DOUBLE) / CAST(n AS DOUBLE)))
           ELSE 0.0 END AS tb_term,
           CASE WHEN mn > 0 THEN
           (CAST(sg AS DOUBLE) / CAST(s AS DOUBLE))
           * (sxlxg / CAST(sg AS DOUBLE)
              - ln(CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)))
           ELSE 0.0 END AS tw_term
    FROM g, tot),
agg AS (
    SELECT mn, n, s, sxlx,
           sum(tb_term) AS t_between, sum(tw_term) AS t_within
    FROM per GROUP BY mn, n, s, sxlx)
SELECT round(CASE WHEN mn > 0 THEN
             sxlx / CAST(s AS DOUBLE)
             - ln(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) END, 6)
           AS theil_total,
       round(CASE WHEN mn > 0 THEN t_between END, 6) AS theil_between,
       round(CASE WHEN mn > 0 THEN t_within END, 6) AS theil_within,
       round(CASE WHEN mn > 0 THEN t_between + t_within END, 6)
           AS theil_recomposed
FROM agg
"""


STAGED_QUERIES: dict[str, QuerySpec] = {
    "orders_theil_index": QuerySpec(_orders_theil_index, THEIL_SQL),
    "events_kendall_w": QuerySpec(_events_kendall_w, KENDALL_W_SQL),
    "events_anderson_darling": QuerySpec(
        _events_anderson_darling, ANDERSON_DARLING_SQL
    ),
    "events_sign_test": QuerySpec(_events_sign_test, SIGN_TEST_SQL),
    "text_js_divergence": QuerySpec(_text_js_divergence, JSD_SQL),
    "text_heaps_law": QuerySpec(_text_heaps_law, HEAPS_SQL),
    "text_perplexity_split": QuerySpec(
        _text_perplexity_split, PERPLEXITY_SQL
    ),
    "events_watson_u2": QuerySpec(_events_watson_u2, WATSON_U2_SQL),
    "events_brunner_munzel": QuerySpec(
        _events_brunner_munzel, BRUNNER_MUNZEL_SQL
    ),
    "orders_theil_decomposition": QuerySpec(
        _orders_theil_decomposition, THEIL_DECOMP_SQL
    ),
}
