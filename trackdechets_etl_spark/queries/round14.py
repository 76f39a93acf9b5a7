"""Round-5 additions, ninth batch: classifier evaluation and an
experimentation guardrail.

- ``text_langid_eval``: per-language precision/recall/F1 of the
  engine's n-gram language identifier against the corpus's labeled
  ``lang`` column — the eval-harness shape every classifier in a data
  pipeline needs. Confusion counts are exact integers; the three
  ratios are guarded divisions rounded at 6.
- ``events_srm_check``: sample-ratio-mismatch guardrail for the
  deterministic A/B split (``user_id % 2``): per event type, the
  one-df chi-square statistic ``(n_a−n_b)²/(n_a+n_b)`` against the
  95% critical value 3.84 — evaluated as the integer inequality
  ``100·(n_a−n_b)² > 384·(n_a+n_b)``, so the breach flag can never
  diverge between engines. SRM is the first thing checked before
  trusting any experiment readout (cf. ``events_ab_lift``,
  ``events_uplift_cuped``).

All pure DataFrame algebra with exact DuckDB twins; invariant tests in
tests/test_round14.py. Extensions beyond the reference DAGs, same
oracle discipline as the §2 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

# ------------------------------------------------------ lang-id eval


def _text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 per language for ``text_lang_id`` against
    the labeled ``lang`` column. One scan produces the confusion
    matrix (|langs|² rows — metadata-sized); per-class tp/fp/fn are
    conditional sums over it, and the final ratios are the only
    floats (guarded divisions, rounded at 6). Classes are the union
    of labeled and predicted languages, so an all-wrong class (e.g.
    'und' predictions) still reports its precision."""
    from trackdechets_etl_spark.llm import text as TX

    d = read_table(spark, sf_dir, "documents")
    preds = d.select(
        F.col("lang").alias("labeled"),
        TX.lang_id(F.col("text")).alias("pred"),
    )
    cm = preds.groupBy("labeled", "pred").agg(F.count(F.lit(1)).alias("n"))
    langs = (
        cm.select(F.col("labeled").alias("lang"))
        .unionByName(cm.select(F.col("pred").alias("lang")))
        .distinct()
    )
    tp = cm.filter(F.col("labeled") == F.col("pred")).select(
        F.col("labeled").alias("lang"), F.col("n").alias("tp")
    )
    pred_tot = cm.groupBy(F.col("pred").alias("lang")).agg(
        F.sum("n").alias("n_pred")
    )
    label_tot = cm.groupBy(F.col("labeled").alias("lang")).agg(
        F.sum("n").alias("n_label")
    )
    j = (
        langs.join(tp, "lang", "left")
        .join(pred_tot, "lang", "left")
        .join(label_tot, "lang", "left")
        .select(
            "lang",
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
            (F.coalesce("n_pred", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("long")
            .alias("fp"),
            (F.coalesce("n_label", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("long")
            .alias("fn"),
        )
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.round(F.col("tp") / (F.col("tp") + F.col("fp")).cast("double"), 6),
    )
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.round(F.col("tp") / (F.col("tp") + F.col("fn")).cast("double"), 6),
    )
    f1 = F.when(
        2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
        F.round(
            2
            * F.col("tp")
            / (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"),
            6,
        ),
    )
    return j.select(
        "lang",
        "tp",
        "fp",
        "fn",
        prec.alias("precision"),
        rec.alias("recall"),
        f1.alias("f1"),
    ).orderBy("lang")


def _langid_eval_oracle() -> str:
    from trackdechets_etl_spark.queries.llm import TEXT_LANGID_SQL

    return f"""
WITH preds AS (
    SELECT labeled_lang AS labeled, pred_lang AS pred
    FROM ({TEXT_LANGID_SQL}) p),
cm AS (SELECT labeled, pred, count(*) AS n FROM preds GROUP BY 1, 2),
langs AS (
    SELECT labeled AS lang FROM cm
    UNION
    SELECT pred FROM cm),
tp AS (SELECT labeled AS lang, n AS tp FROM cm WHERE labeled = pred),
pt AS (SELECT pred AS lang, sum(n) AS n_pred FROM cm GROUP BY 1),
lt AS (SELECT labeled AS lang, sum(n) AS n_label FROM cm GROUP BY 1),
j AS (
    SELECT langs.lang,
           CAST(coalesce(tp, 0) AS BIGINT) AS tp,
           CAST(coalesce(n_pred, 0) - coalesce(tp, 0) AS BIGINT) AS fp,
           CAST(coalesce(n_label, 0) - coalesce(tp, 0) AS BIGINT) AS fn
    FROM langs
    LEFT JOIN tp USING (lang)
    LEFT JOIN pt USING (lang)
    LEFT JOIN lt USING (lang))
SELECT lang, tp, fp, fn,
       CASE WHEN tp + fp > 0
            THEN round(tp / CAST(tp + fp AS DOUBLE), 6) END AS precision,
       CASE WHEN tp + fn > 0
            THEN round(tp / CAST(tp + fn AS DOUBLE), 6) END AS recall,
       CASE WHEN 2 * tp + fp + fn > 0
            THEN round(2 * tp / CAST(2 * tp + fp + fn AS DOUBLE), 6)
       END AS f1
FROM j
ORDER BY lang
"""


TEXT_LANGID_EVAL_SQL = _langid_eval_oracle()


# ---------------------------------------------------------- SRM check


def _events_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check per event type for the user_id % 2
    split: chi-square vs a 50/50 expectation, breach flagged via the
    integer inequality 100·(n_a−n_b)² > 384·(n_a+n_b) (the 3.84
    critical value scaled to integers — engine-exact). The reported
    statistic rounds at 6. One scan, |types|-sized output."""
    ev = read_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    diff2 = (F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b"))
    return g.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(
            diff2.cast("double") / (F.col("n_a") + F.col("n_b")), 6
        ).alias("chi_sq"),
        (100 * diff2 > 384 * (F.col("n_a") + F.col("n_b"))).alias(
            "srm_breach"
        ),
    ).orderBy("event_type")


EVENTS_SRM_SQL = """
WITH g AS (
    SELECT event_type,
           CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
           CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b
    FROM events GROUP BY event_type)
SELECT event_type, n_a, n_b,
       round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b), 6)
           AS chi_sq,
       100 * (n_a - n_b) * (n_a - n_b) > 384 * (n_a + n_b) AS srm_breach
FROM g
ORDER BY event_type
"""


QUERIES: dict[str, QuerySpec] = {
    "text_langid_eval": QuerySpec(_text_langid_eval, TEXT_LANGID_EVAL_SQL),
    "events_srm_check": QuerySpec(_events_srm_check, EVENTS_SRM_SQL),
}
