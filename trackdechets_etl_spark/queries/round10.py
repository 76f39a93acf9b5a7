"""Round-5 additions, fifth batch: experimentation methodology and two
training-data curation ops.

- ``events_uplift_cuped``: CUPED variance-reduced A/B readout
  (Deng et al. 2013): per-user pre-period covariate X and post-period
  metric Y, pooled ``θ = cov(X,Y)/var(X)``, adjusted per-variant mean
  ``E[Y] − θ·(E[X|variant] − E[X])`` and the closed-form variance
  reduction ``ρ² = cov²/(var(X)·var(Y))`` — all from one scan of
  mergeable aggregates, no second pass.
- ``training_curriculum_order``: curriculum-learning phase assignment —
  quality-quartile phases (ntile over the fully tie-broken quality
  order) and a deterministic md5 shuffle rank inside each phase; the
  epoch schedule a curriculum trainer consumes.
- ``text_bigram_lm_score``: add-1-smoothed bigram language-model
  scoring (the CCNet/KenLM perplexity-filter shape): bigram/context
  counts from the corpus itself, per-doc mean negative log-probability
  and perplexity. Counts are exact integers; only the final log
  averages are floats (rounded at 4).

All pure DataFrame algebra with exact DuckDB twins; invariant tests in
tests/test_round10.py. Extensions beyond the reference DAGs, same
oracle discipline as the §2 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

# ----------------------------------------------------------------- CUPED

_CUPED_CUTOFF = "2024-01-16"  # events span 2024-01; first half = pre-period


def _events_uplift_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED experiment readout: variant = user_id % 2 (the
    deterministic split of ``events_ab_lift``), X = user's pre-period
    value sum, Y = post-period value sum. θ comes from pooled
    covar_samp/var_samp over the per-user frame; the adjusted mean
    needs only per-variant avg(X), avg(Y) — so the whole readout is
    one user-keyed shuffle plus two scalar-sized joins (both
    broadcast). Variance reduction is the closed form ρ² =
    cov²/(var_x·var_y): no second pass over adjusted rows at any
    scale."""
    ev = read_table(spark, sf_dir, "events")
    pre = F.col("ts") < F.lit(_CUPED_CUTOFF).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(pre, F.col("value"))), F.lit(0.0)).alias("x"),
        F.coalesce(F.sum(F.when(~pre, F.col("value"))), F.lit(0.0)).alias(
            "y"
        ),
    )
    per_user = per_user.withColumn(
        "variant", (F.col("user_id") % 2).cast("int")
    )
    pooled = per_user.agg(
        F.covar_samp("x", "y").alias("cxy"),
        F.var_samp("x").alias("vx"),
        F.var_samp("y").alias("vy"),
        F.avg("x").alias("xbar"),
    )
    by_variant = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.avg("y").alias("my"),
        F.avg("x").alias("mx"),
    )
    theta = F.col("cxy") / F.col("vx")
    return (
        by_variant.crossJoin(F.broadcast(pooled))
        .select(
            "variant",
            "n_users",
            F.round("my", 4).alias("raw_mean"),
            F.round(
                F.col("my") - theta * (F.col("mx") - F.col("xbar")), 4
            ).alias("cuped_mean"),
            F.round(theta, 4).alias("theta"),
            F.round(
                F.col("cxy") * F.col("cxy") / (F.col("vx") * F.col("vy")), 4
            ).alias("var_reduction"),
        )
        .orderBy("variant")
    )


EVENTS_CUPED_SQL = f"""
WITH per_user AS (
    SELECT user_id,
           coalesce(sum(CASE WHEN ts < TIMESTAMP '{_CUPED_CUTOFF}'
                             THEN value END), 0.0) AS x,
           coalesce(sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_CUTOFF}'
                             THEN value END), 0.0) AS y
    FROM events GROUP BY user_id),
pu AS (SELECT *, CAST(user_id % 2 AS INTEGER) AS variant FROM per_user),
pooled AS (
    SELECT covar_samp(x, y) AS cxy, var_samp(x) AS vx,
           var_samp(y) AS vy, avg(x) AS xbar
    FROM pu),
by_variant AS (
    SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
           avg(y) AS my, avg(x) AS mx
    FROM pu GROUP BY variant)
SELECT variant, n_users,
       round(my, 4) AS raw_mean,
       round(my - (cxy / vx) * (mx - xbar), 4) AS cuped_mean,
       round(cxy / vx, 4) AS theta,
       round(cxy * cxy / (vx * vy), 4) AS var_reduction
FROM by_variant, pooled
ORDER BY variant
"""


# --------------------------------------------------- curriculum ordering

_CURR_PHASES = 4


def _training_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning schedule: documents ranked easy→hard by
    quality score (fully tie-broken by doc_id, so the split is
    deterministic), cut into quartile phases, with a deterministic
    md5-keyed shuffle rank inside each phase — the order a curriculum
    trainer streams. Phases are bit-identical to the definitional
    global ntile but computed scale-safe: distributed global rank
    (operators/ranking.py) + the closed-form ntile split — no
    single-partition window over the corpus."""
    from trackdechets_etl_spark.llm import text as TX
    from trackdechets_etl_spark.operators.ranking import (
        global_row_number,
        ntile_from_rank,
    )

    d = read_table(spark, sf_dir, "documents")
    score = TX.quality_features(F.col("text"))["quality_score"]
    scored = d.select("doc_id", "lang", score.alias("quality_score"))
    n_total = scored.agg(F.count(F.lit(1)).alias("__n"))
    ranked = global_row_number(
        scored, [F.desc("quality_score"), F.col("doc_id").asc()], "__rk"
    )
    w_rank = Window.partitionBy("phase").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        ranked.crossJoin(F.broadcast(n_total))
        .withColumn(
            "phase",
            ntile_from_rank(F.col("__rk"), F.col("__n"), _CURR_PHASES).cast(
                "int"
            ),
        )
        .drop("__rk", "__n")
        .withColumn("phase_rank", F.row_number().over(w_rank).cast("long"))
        .orderBy("phase", "phase_rank")
    )


def _curriculum_oracle() -> str:
    from trackdechets_etl_spark.queries.llm import _STOP_LIST

    return f"""
WITH t AS (
    SELECT doc_id, lang,
           len(list_filter(string_split(text, ' '),
                           x -> list_contains({_STOP_LIST}, x))) AS n_stop,
           len(string_split(text, ' ')) AS n_words
    FROM documents),
scored AS (
    SELECT doc_id, lang,
           round(least(n_words / 100.0, 1.0) * 0.5
                 + (1.0 - n_stop / n_words) * 0.5, 4) AS quality_score
    FROM t),
phased AS (
    SELECT *,
           CAST(ntile({_CURR_PHASES})
                OVER (ORDER BY quality_score DESC, doc_id) AS INTEGER)
               AS phase
    FROM scored)
SELECT doc_id, lang, quality_score, phase,
       CAST(row_number()
            OVER (PARTITION BY phase
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
           AS phase_rank
FROM phased
ORDER BY phase, phase_rank
"""


TRAINING_CURRICULUM_SQL = _curriculum_oracle()


# ------------------------------------------------- bigram LM perplexity


def _text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-1-smoothed bigram LM scored over the corpus that trained it
    (the CCNet-style perplexity-filter shape; cf. unigram
    ``text_lm_score``). Tokens get positions via posexplode; bigrams
    come from the (doc, pos)→(doc, pos+1) self-join — co-partitioned
    by doc, one shuffle. Context counts derive from the bigram table
    (``c1(w1) = Σ_w2 c2``), so counts are consistent by construction
    and integer-exact; the vocabulary size joins as a 1-row broadcast.
    Per-doc score is the mean negative log-probability and its exp
    (perplexity), floats only at the last step, rounded at 4. At
    100 TB the count tables are the model: the bigram join keys are
    zipf-hot, which is exactly the AQE skew-join case. The c1 table is
    vocab-sized and vocabulary grows with corpus size (Heaps' law), so
    it joins UNHINTED — AQE broadcasts it while it fits and falls back
    to a shuffle join when it doesn't."""
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    a = tok.select("doc_id", F.col("pos").alias("p1"), F.col("w").alias("w1"))
    b = tok.select("doc_id", F.col("pos").alias("p2"), F.col("w").alias("w2"))
    bi = a.join(b, ["doc_id"]).filter(F.col("p2") == F.col("p1") + 1).select(
        "doc_id", "w1", "w2"
    )
    c2 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = c2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    vocab = tok.agg(F.countDistinct("w").alias("v"))
    lp = (
        bi.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log(
                (F.col("n2") + 1).cast("double")
                / (F.col("n1") + F.col("v")).cast("double")
            ).alias("lp"),
        )
    )
    return (
        lp.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(-F.avg("lp"), 4).alias("avg_neg_logprob"),
            F.round(F.exp(-F.avg("lp")), 4).alias("perplexity"),
        )
        .orderBy("doc_id")
    )


TEXT_BIGRAM_LM_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (
    SELECT doc_id, i AS pos, ws[i] AS w
    FROM w, unnest(generate_series(1, len(ws))) AS t(i)),
bi AS (
    SELECT a.doc_id, a.w AS w1, b.w AS w2
    FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
c2 AS (SELECT w1, w2, count(*) AS n2 FROM bi GROUP BY 1, 2),
c1 AS (SELECT w1, sum(n2) AS n1 FROM c2 GROUP BY 1),
v AS (SELECT count(DISTINCT w) AS vocab FROM tok),
lp AS (
    SELECT bi.doc_id,
           ln(CAST(n2 + 1 AS DOUBLE) / CAST(n1 + vocab AS DOUBLE)) AS lp
    FROM bi JOIN c2 USING (w1, w2) JOIN c1 USING (w1), v)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(-avg(lp), 4) AS avg_neg_logprob,
       round(exp(-avg(lp)), 4) AS perplexity
FROM lp
GROUP BY doc_id
ORDER BY doc_id
"""


QUERIES: dict[str, QuerySpec] = {
    "events_uplift_cuped": QuerySpec(_events_uplift_cuped, EVENTS_CUPED_SQL),
    "training_curriculum_order": QuerySpec(
        _training_curriculum_order, TRAINING_CURRICULUM_SQL
    ),
    "text_bigram_lm_score": QuerySpec(_text_bigram_lm_score, TEXT_BIGRAM_LM_SQL),
}
