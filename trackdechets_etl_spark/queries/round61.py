"""Round-9 additions, sixth batch: sequential testing, privacy,
corpus-growth law, embedding geometry, causal stratification, and
survey-grade stratified sampling.

- ``events_sprt_ab``: Wald's Sequential Probability Ratio Test on the
  daily purchase-share series — H0 p=0.20 vs H1 p=0.25, α=β=0.05. The
  cumulative log-likelihood ratio is ``conv·ln(p1/p0) +
  (trials−conv)·ln((1−p1)/(1−p0))`` with the three ln values embedded
  as shared decimal literals (so neither engine ever calls ln —
  zero transcendental divergence); the decision is the first boundary
  crossing at ±ln(19). The sequential companion to the fixed-horizon
  tests (Welch, MWU): SPRT is how A/B platforms stop early.
- ``dq_l_diversity``: l-diversity audit (l=4) — for each
  quasi-identifier group (priority × month) count DISTINCT sensitive
  values (price decile) and flag groups below l. The companion to
  ``dq_k_anonymity``: k bounds re-identification, l bounds attribute
  disclosure (a k-anonymous group whose members all share one salary
  still leaks it).
- ``text_heaps_law_fit``: Heaps'-law fit V(n) ≈ K·n^β of shingle
  vocabulary growth — first-occurrence doc per 3-token shingle, prefix
  grid at {1,2,4,8,16}/16 of the corpus, log-log OLS in closed form.
  The corpus-health curve: sub-linear β is the dedup/diversity signal
  (β→1 means every new doc is novel vocabulary — suspicious; β→0
  means the corpus has saturated — more data adds nothing).
- ``embedding_isotropy_score``: embedding-space anisotropy
  (Ethayarajh-style): ‖mean vector‖²/E‖x‖² and the mean cosine to the
  centroid. Isotropic (healthy) spaces score ≈0; a high score means
  all vectors share a dominant direction and cosine similarity is
  mostly measuring that bias — run BEFORE trusting any cosine-based
  dedup/retrieval on a new embedding model.
- ``orders_propensity_stratified_ate``: stratified average treatment
  effect — strata from a propensity proxy (customer order-count
  bucket), treatment = customer parity (the established synthetic
  cohort split), outcome = order price; per-stratum mean difference,
  combined by stratum weight over COMMON-SUPPORT strata only (both
  arms present). The observational-causal companion to the randomized
  diff-in-diff/CUPED rows.
- ``sample_neyman_allocation``: optimal (Neyman) stratified
  allocation — sample size per stratum ∝ n_s·σ_s from exact
  per-stratum moments, then a deterministic md5-uniform filter at the
  allocated rate. THE survey-sampling answer to "budget 600 rows
  across strata": high-variance strata get proportionally more than
  proportional allocation would give.

Reference provenance: none of these exist in the reference's 539-line
pandas surface (dags/icpe-siretisation.py, dags/publish-open-data.py).
Scale notes in docs/SCALE.md §round-9 sixth batch; invariant tests in
tests/test_round61.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

# ------------------------------------------------------------- SPRT

# ln(0.25/0.20), ln(0.75/0.80), ln((1-0.05)/0.05) as SHARED decimal
# literals — both engines consume the same doubles, no ln() calls.
_SPRT_L1 = repr(math.log(0.25 / 0.20))  # 0.22314355131420976
_SPRT_L0 = repr(math.log(0.75 / 0.80))  # -0.06453852113757118
_SPRT_BOUND = repr(math.log(19.0))  # 2.9444389791664403


def _events_sprt_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        read_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("trials"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv"),
        )
    )
    # cumulative over the calendar-bounded day frame (allowlisted, the
    # orders_cusum_changepoint contract)
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "day",
        F.sum("trials").over(w).cast("long").alias("cum_trials"),
        F.sum("conv").over(w).cast("long").alias("cum_conv"),
    )
    llr = F.col("cum_conv") * float(_SPRT_L1) + (
        F.col("cum_trials") - F.col("cum_conv")
    ) * float(_SPRT_L0)
    return cum.select(
        "day",
        "cum_trials",
        "cum_conv",
        F.round(llr, 6).alias("llr"),
        F.when(llr >= float(_SPRT_BOUND), "accept_h1")
        .when(llr <= -float(_SPRT_BOUND), "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    ).orderBy("day")


SPRT_SQL = f"""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day, count(*) AS trials,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
    FROM events GROUP BY 1),
cum AS (
    SELECT day,
           CAST(sum(trials) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_trials,
           CAST(sum(conv) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_conv
    FROM daily)
SELECT day, cum_trials, cum_conv,
       round(cum_conv * CAST({_SPRT_L1} AS DOUBLE)
             + (cum_trials - cum_conv) * CAST({_SPRT_L0} AS DOUBLE), 6) AS llr,
       CASE WHEN cum_conv * CAST({_SPRT_L1} AS DOUBLE)
                 + (cum_trials - cum_conv) * CAST({_SPRT_L0} AS DOUBLE) >= CAST({_SPRT_BOUND} AS DOUBLE)
            THEN 'accept_h1'
            WHEN cum_conv * CAST({_SPRT_L1} AS DOUBLE)
                 + (cum_trials - cum_conv) * CAST({_SPRT_L0} AS DOUBLE) <= -CAST({_SPRT_BOUND} AS DOUBLE)
            THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM cum ORDER BY day
"""


# ------------------------------------------------------ l-diversity

_LDIV_L = 4
_LDIV_BIN_CENTS = 5_000_000


def _dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("qi_priority"),
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("qi_month"),
        F.least(
            ((cents - cents % _LDIV_BIN_CENTS) / _LDIV_BIN_CENTS).cast(
                "long"
            ),
            F.lit(9),
        ).alias("sens_bin"),
    )
    return (
        o.groupBy("qi_priority", "qi_month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("sens_bin").cast("long").alias("diversity"),
        )
        .withColumn(
            "violates_l",
            (F.col("diversity") < _LDIV_L).cast("int").cast("long"),
        )
        .orderBy("qi_priority", "qi_month")
    )


LDIV_SQL = f"""
WITH o AS (
    SELECT o_orderpriority AS qi_priority,
           CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
               AS qi_month,
           least(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                 // {_LDIV_BIN_CENTS}, 9) AS sens_bin
    FROM orders)
SELECT qi_priority, qi_month,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT sens_bin) AS BIGINT) AS diversity,
       CAST(CASE WHEN count(DISTINCT sens_bin) < {_LDIV_L}
                 THEN 1 ELSE 0 END AS BIGINT) AS violates_l
FROM o GROUP BY qi_priority, qi_month
ORDER BY qi_priority, qi_month
"""


# ----------------------------------------------------- Heaps' law

_HEAPS_KS = [1, 2, 4, 8, 16]


def _text_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 3)
    )
    tri = d.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(1), F.size("w") - 2)).alias("i"),
    ).select(
        "doc_id",
        F.concat_ws(
            " ",
            F.element_at(F.col("w"), F.col("i")),
            F.element_at(F.col("w"), F.col("i") + 1),
            F.element_at(F.col("w"), F.col("i") + 2),
        ).alias("g"),
    )
    maxid = read_table(spark, sf_dir, "documents").agg(
        F.max("doc_id").alias("mx")
    )
    grid = (
        spark.createDataFrame([(k,) for k in _HEAPS_KS], "k int")
        .crossJoin(F.broadcast(maxid))
        .select(
            F.col("k").cast("long").alias("k"),
            (
                (F.col("mx") * F.col("k") - (F.col("mx") * F.col("k")) % 16)
                / 16
            )
            .cast("long")
            .alias("thr"),
        )
    )
    first = tri.groupBy("g").agg(F.min("doc_id").alias("fd"))
    vocab = (
        first.crossJoin(F.broadcast(grid))
        .filter(F.col("fd") <= F.col("thr"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    )
    per_doc = tri.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nt"))
    ntok = (
        per_doc.crossJoin(F.broadcast(grid))
        .filter(F.col("doc_id") <= F.col("thr"))
        .groupBy("k")
        .agg(F.sum("nt").cast("long").alias("n_tokens"))
    )
    pts = vocab.join(ntok, "k")
    fit = pts.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.log("n_tokens")).alias("sx"),
        F.sum(F.log("vocab")).alias("sy"),
        F.sum(F.log("n_tokens") * F.log("n_tokens")).alias("sxx"),
        F.sum(F.log("n_tokens") * F.log("vocab")).alias("sxy"),
    ).select(
        (
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("beta_raw"),
        "m",
        "sx",
        "sy",
        "sxx",
        "sxy",
    ).select(
        F.round("beta_raw", 6).alias("beta"),
        F.round(
            F.exp(
                (F.col("sy") - F.col("beta_raw") * F.col("sx")) / F.col("m")
            ),
            4,
        ).alias("k_coef"),
    )
    return (
        pts.crossJoin(F.broadcast(fit))
        .select("k", "n_tokens", "vocab", "beta", "k_coef")
        .orderBy("k")
    )


HEAPS_SQL = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tri AS (
    SELECT doc_id, w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS g
    FROM d, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS u(i)),
grid AS (
    SELECT CAST(k AS BIGINT) AS k,
           (SELECT max(doc_id) FROM documents) * k // 16 AS thr
    FROM (VALUES {", ".join(f"({k})" for k in _HEAPS_KS)}) t(k)),
first AS (SELECT g, min(doc_id) AS fd FROM tri GROUP BY g),
vocab AS (
    SELECT k, CAST(count(*) AS BIGINT) AS vocab
    FROM first, grid WHERE fd <= thr GROUP BY k),
per_doc AS (SELECT doc_id, count(*) AS nt FROM tri GROUP BY doc_id),
ntok AS (
    SELECT k, CAST(sum(nt) AS BIGINT) AS n_tokens
    FROM per_doc, grid WHERE doc_id <= thr GROUP BY k),
pts AS (SELECT vocab.k, n_tokens, vocab FROM vocab JOIN ntok USING (k)),
fit AS (
    SELECT (count(*) * sum(ln(n_tokens) * ln(vocab))
            - sum(ln(n_tokens)) * sum(ln(vocab)))
           / (count(*) * sum(ln(n_tokens) * ln(n_tokens))
              - sum(ln(n_tokens)) * sum(ln(n_tokens))) AS beta_raw,
           count(*) AS m, sum(ln(n_tokens)) AS sx, sum(ln(vocab)) AS sy
    FROM pts)
SELECT k, n_tokens, vocab,
       round(beta_raw, 6) AS beta,
       round(exp((sy - beta_raw * sx) / m), 4) AS k_coef
FROM pts, fit
ORDER BY k
"""


# ------------------------------------------------ embedding isotropy

_ISO_DIMS = 64


def _embedding_isotropy_score(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    ex = e.select(
        "vec_id", F.posexplode("v").alias("pos", "x")
    )
    # per-dim centroid ROUNDED at 6dp — the established cross-engine
    # determinism cut (dedup_semantic_prune contract): all downstream
    # math consumes the rounded centroid.
    cent = ex.groupBy("pos").agg(F.round(F.avg("x"), 6).alias("c"))
    m2 = cent.agg(F.sum(F.col("c") * F.col("c")).alias("m2"))
    norms = ex.groupBy("vec_id").agg(
        F.sum(F.col("x") * F.col("x")).alias("n2")
    )
    dots = (
        ex.join(F.broadcast(cent), "pos")
        .groupBy("vec_id")
        .agg(F.sum(F.col("x") * F.col("c")).alias("dot"))
    )
    per_vec = norms.join(dots, "vec_id").crossJoin(F.broadcast(m2))
    return per_vec.agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.lit(_ISO_DIMS).cast("long").alias("dim"),
        F.round(F.first("m2") / F.avg("n2"), 6).alias("isotropy"),
        F.round(
            F.avg(
                F.col("dot") / F.sqrt(F.col("n2") * F.col("m2"))
            ),
            6,
        ).alias("mean_cos_centroid"),
    )


ISOTROPY_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
ex AS (
    SELECT vec_id, i AS pos, v[i] AS x
    FROM e, unnest(generate_series(1, {_ISO_DIMS})) AS u(i)),
cent AS (SELECT pos, round(avg(x), 6) AS c FROM ex GROUP BY pos),
m2 AS (SELECT sum(c * c) AS m2 FROM cent),
norms AS (SELECT vec_id, sum(x * x) AS n2 FROM ex GROUP BY vec_id),
dots AS (
    SELECT ex.vec_id, sum(x * c) AS dot
    FROM ex JOIN cent USING (pos) GROUP BY ex.vec_id)
SELECT CAST(count(*) AS BIGINT) AS n_vecs,
       CAST({_ISO_DIMS} AS BIGINT) AS dim,
       round(min(m2) / avg(n2), 6) AS isotropy,
       round(avg(dot / sqrt(n2 * m2)), 6) AS mean_cos_centroid
FROM norms JOIN dots USING (vec_id), m2
"""


# -------------------------------------- propensity-stratified ATE

def _orders_propensity_stratified_ate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    strata = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_o"))
    strata = strata.select(
        "o_custkey",
        F.least(
            ((F.col("n_o") - F.col("n_o") % 4) / 4).cast("long"), F.lit(4)
        ).alias("stratum"),
        (F.col("o_custkey") % 2).cast("long").alias("treat"),
    )
    j = o.join(strata, "o_custkey")
    cells = j.groupBy("stratum").agg(
        F.sum(F.when(F.col("treat") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_treat"),
        F.sum(F.when(F.col("treat") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_ctrl"),
        F.sum(F.when(F.col("treat") == 1, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("s_treat"),
        F.sum(F.when(F.col("treat") == 0, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("s_ctrl"),
    ).filter((F.col("n_treat") > 0) & (F.col("n_ctrl") > 0))
    diff = F.col("s_treat") / (100.0 * F.col("n_treat")) - F.col(
        "s_ctrl"
    ) / (100.0 * F.col("n_ctrl"))
    per = cells.withColumn("diff_raw", diff)
    ate = per.agg(
        (
            F.sum((F.col("n_treat") + F.col("n_ctrl")) * F.col("diff_raw"))
            / F.sum(F.col("n_treat") + F.col("n_ctrl"))
        ).alias("ate_raw")
    )
    return (
        per.crossJoin(F.broadcast(ate))
        .select(
            "stratum",
            "n_treat",
            "n_ctrl",
            F.round(F.col("s_treat") / (100.0 * F.col("n_treat")), 4).alias(
                "mean_treat"
            ),
            F.round(F.col("s_ctrl") / (100.0 * F.col("n_ctrl")), 4).alias(
                "mean_ctrl"
            ),
            F.round("diff_raw", 4).alias("diff"),
            F.round("ate_raw", 4).alias("ate"),
        )
        .orderBy("stratum")
    )


ATE_SQL = """
WITH o AS (
    SELECT o_custkey,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
    FROM orders),
strata AS (
    SELECT o_custkey,
           least(count(*) // 4, 4) AS stratum,
           CAST(o_custkey % 2 AS BIGINT) AS treat
    FROM o GROUP BY o_custkey),
cells AS (
    SELECT stratum,
           CAST(sum(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_treat,
           CAST(sum(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_ctrl,
           CAST(sum(CASE WHEN treat = 1 THEN cents ELSE 0 END) AS BIGINT)
               AS s_treat,
           CAST(sum(CASE WHEN treat = 0 THEN cents ELSE 0 END) AS BIGINT)
               AS s_ctrl
    FROM o JOIN strata USING (o_custkey)
    GROUP BY stratum
    HAVING n_treat > 0 AND n_ctrl > 0),
per AS (
    SELECT *, s_treat / (100.0 * n_treat) - s_ctrl / (100.0 * n_ctrl)
               AS diff_raw
    FROM cells),
ate AS (
    SELECT sum((n_treat + n_ctrl) * diff_raw) / sum(n_treat + n_ctrl)
               AS ate_raw
    FROM per)
SELECT CAST(stratum AS BIGINT) AS stratum, n_treat, n_ctrl,
       round(s_treat / (100.0 * n_treat), 4) AS mean_treat,
       round(s_ctrl / (100.0 * n_ctrl), 4) AS mean_ctrl,
       round(diff_raw, 4) AS diff,
       round(ate_raw, 4) AS ate
FROM per, ate
ORDER BY stratum
"""


# --------------------------------------------- Neyman allocation

_NEYMAN_K = 600
_HEX = "0123456789abcdef"


def _hex8_int_sql(md5_expr: str) -> str:
    terms = [
        f"(strpos('{_HEX}', substr({md5_expr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


def _sample_neyman_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("stratum"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.md5(
            F.concat_ws(
                "_",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            )
        ).alias("h"),
    )
    # exact per-stratum moments; cents² sums overflow int64 at scale →
    # decimal(38,0) (the ANOVA overflow contract)
    stats = li.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("n_s"),
        F.sum("cents").cast("decimal(38,0)").alias("s1"),
        F.sum(
            F.col("cents").cast("decimal(38,0)")
            * F.col("cents").cast("decimal(38,0)")
        ).alias("s2"),
    )
    sigma = stats.select(
        "stratum",
        "n_s",
        F.sqrt(
            F.col("s2").cast("double") / F.col("n_s")
            - (F.col("s1").cast("double") / F.col("n_s"))
            * (F.col("s1").cast("double") / F.col("n_s"))
        ).alias("sig"),
    )
    denom = sigma.agg(F.sum(F.col("n_s") * F.col("sig")).alias("den"))
    alloc = sigma.crossJoin(F.broadcast(denom)).select(
        "stratum",
        "n_s",
        F.round(F.col("sig") / 100.0, 4).alias("sigma"),
        F.floor(
            _NEYMAN_K * F.col("n_s") * F.col("sig") / F.col("den") + 0.5
        )
        .cast("long")
        .alias("alloc"),
    )
    thr = alloc.withColumn(
        "t",
        F.floor(
            F.least(F.col("alloc") / F.col("n_s"), F.lit(1.0))
            * 4294967296.0
        ).cast("long"),
    )
    u = F.conv(F.substring("h", 1, 8), 16, 10).cast("long")
    sampled = (
        li.withColumn("u", u)
        .join(F.broadcast(thr), "stratum")
        .filter(F.col("u") < F.col("t"))
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sampled"),
            F.round(F.sum("cents") / (100.0 * F.count(F.lit(1))), 4).alias(
                "sample_mean"
            ),
        )
    )
    return (
        thr.join(sampled, "stratum", "left")
        .na.fill(0, ["n_sampled"])
        .select(
            "stratum", "n_s", "sigma", "alloc", "n_sampled", "sample_mean"
        )
        .orderBy("stratum")
    )


_NEYMAN_U = _hex8_int_sql("h")

NEYMAN_SQL = f"""
WITH li AS (
    SELECT l_returnflag AS stratum,
           CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
           md5(CAST(l_orderkey AS VARCHAR) || '_'
               || CAST(l_linenumber AS VARCHAR)) AS h
    FROM lineitem),
stats AS (
    SELECT stratum, CAST(count(*) AS BIGINT) AS n_s,
           sum(cents) AS s1, sum(cents * cents) AS s2
    FROM li GROUP BY stratum),
sigma AS (
    SELECT stratum, n_s,
           sqrt(CAST(s2 AS DOUBLE) / n_s
                - (CAST(s1 AS DOUBLE) / n_s)
                  * (CAST(s1 AS DOUBLE) / n_s)) AS sig
    FROM stats),
denom AS (SELECT sum(n_s * sig) AS den FROM sigma),
alloc AS (
    SELECT stratum, n_s, round(sig / 100.0, 4) AS sigma,
           CAST(floor({_NEYMAN_K} * n_s * sig / den + 0.5) AS BIGINT)
               AS alloc
    FROM sigma, denom),
thr AS (
    SELECT *, CAST(floor(least(alloc * 1.0 / n_s, 1.0) * 4294967296.0)
                   AS BIGINT) AS t
    FROM alloc),
sampled AS (
    SELECT li.stratum,
           CAST(count(*) AS BIGINT) AS n_sampled,
           round(sum(cents) / (100.0 * count(*)), 4) AS sample_mean
    FROM li JOIN thr ON li.stratum = thr.stratum
    WHERE {_NEYMAN_U} < t
    GROUP BY li.stratum)
SELECT thr.stratum, n_s, sigma, alloc,
       coalesce(n_sampled, 0) AS n_sampled, sample_mean
FROM thr LEFT JOIN sampled ON thr.stratum = sampled.stratum
ORDER BY thr.stratum
"""


QUERIES: dict[str, QuerySpec] = {
    "events_sprt_ab": QuerySpec(_events_sprt_ab, SPRT_SQL),
    "dq_l_diversity": QuerySpec(_dq_l_diversity, LDIV_SQL),
    "text_heaps_law_fit": QuerySpec(_text_heaps_law_fit, HEAPS_SQL),
    "embedding_isotropy_score": QuerySpec(
        _embedding_isotropy_score, ISOTROPY_SQL
    ),
    "orders_propensity_stratified_ate": QuerySpec(
        _orders_propensity_stratified_ate, ATE_SQL
    ),
    "sample_neyman_allocation": QuerySpec(
        _sample_neyman_allocation, NEYMAN_SQL
    ),
}
