"""Round-12 additions, fourth batch: winnowing document fingerprints
(Schleimer, Wilkerson & Aiken 2003 — the MOSS algorithm), the one
classic dedup-literature fingerprinting scheme the registry lacked
(grep-verified: winnow had zero hits; the existing fingerprints are
whole-document rolling/md5 hashes).

Scheme (k = 3 token-grams, w = 4 hash window): hash every k-gram
(md5 — lexicographic order is a valid total order and is identical in
both engines), then for every window of w consecutive hashes select
the minimum, ties broken by the RIGHTMOST occurrence; the distinct
selected positions are the document's fingerprint. Guarantees: any
shared substring of at least w + k − 1 tokens yields at least one
shared fingerprint, and expected density is 2/(w+1).

The argmin-with-rightmost-tie is encoded portably as
``min(h || lpad(10^9 − pos))`` — md5 is fixed 32 hex chars, so the
string min orders by (hash asc, pos desc) identically in Spark and
DuckDB with no reliance on struct-ordering semantics.

- ``text_winnow_fingerprints``: per-doc fingerprint stats (gram count,
  selected count, density — expected ≈ 2/(w+1) = 0.4).
- ``dedup_winnow_pairs``: MOSS match step — doc pairs sharing at least
  {_WIN_MIN_SHARED} distinct winnowed hashes, with the shared count.
  Candidates come from the fingerprint inverted index (join on the
  selected hash only — never all pairs); a hash shared by many docs is
  the hot-key case and would get a df-cap guard at web scale exactly
  like ngram_jaccard's ``max_shingle_df``.

Scale shape: the window expansion is a bounded ×w explode (never a
per-doc cross join); everything else is hash-keyed groupBys. Tests in
tests/test_round76.py; queued at the round-13 window front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

_WIN_K = 3
_WIN_W = 4
_WIN_MIN_SHARED = 3
_POS_BASE = 1_000_000_000


def _selected_fingerprints(d: DataFrame) -> DataFrame:
    """(doc_id, pos, h): the winnowed fingerprint set per document."""
    ws = F.filter(F.split("text", " "), lambda x: x != "")
    # Guard: Spark sequence(1, n) with n < 1 yields a DESCENDING
    # sequence (step −1), not an empty one — a sub-k-token doc must
    # produce zero grams, as DuckDB's generate_series does natively.
    sh_arr = F.when(
        F.size(ws) >= _WIN_K,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - (_WIN_K - 1)),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(ws, i + off) for off in range(_WIN_K)],
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = (
        d.select("doc_id", F.posexplode(sh_arr).alias("j0", "sh"))
        .select(
            "doc_id",
            (F.col("j0") + 1).alias("j"),
            F.md5("sh").alias("h"),
        )
    )
    # m (= max gram index per doc) is a window max over doc_id, not an
    # aggregate+join: the one hash(doc_id) exchange it inserts is then
    # reused by EVERY downstream aggregation — groupBy(doc_id, i),
    # the (doc_id, h, pos) distinct, and the per-doc counts all
    # cluster on a superset of doc_id, so they run exchange-free on
    # the window's partitioning (r14 join-free owner counting;
    # interleaved A/B at sf0.1: fingerprints best 2.61 → 1.58 s,
    # pairs 2.64 → 1.63 s, exact output at sf0.001/0.01).
    gm = grams.withColumn(
        "m", F.max("j").over(Window.partitionBy("doc_id"))
    )
    # each gram j serves windows i in [max(1, j-w+1), min(j, m-w+1)]
    # — a bounded ×w explode, never a per-doc cross join. Docs shorter
    # than one full window (m < w) contribute no fingerprints.
    exploded = (
        gm.filter(F.col("m") >= _WIN_W)
        .select(
            "doc_id",
            "j",
            "h",
            F.explode(
                F.sequence(
                    F.greatest(F.lit(1), F.col("j") - (_WIN_W - 1)),
                    F.least(F.col("j"), F.col("m") - (_WIN_W - 1)),
                )
            ).alias("i"),
        )
        .filter(F.col("i") >= 1)
    )
    key = F.concat(
        F.col("h"),
        F.lpad((F.lit(_POS_BASE) - F.col("j")).cast("string"), 10, "0"),
    )
    sel = (
        exploded.groupBy("doc_id", "i")
        .agg(F.min(key).alias("k"))
        .select(
            "doc_id",
            F.substring("k", 1, 32).alias("h"),
            (
                F.lit(_POS_BASE)
                - F.substring("k", 33, 10).cast("long")
            ).alias("pos"),
        )
        .distinct()
    )
    return sel


def _text_winnow_fingerprints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " "), lambda x: x != "")
    m = d.select(
        "doc_id",
        (F.size(ws) - (_WIN_K - 1)).cast("long").alias("n_grams"),
    )
    sel = _selected_fingerprints(d)
    per = sel.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_selected"),
        F.countDistinct("h").cast("long").alias("n_distinct_hashes"),
    )
    return (
        m.join(per, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_selected", F.lit(0))
            .cast("long")
            .alias("n_selected"),
            F.coalesce("n_distinct_hashes", F.lit(0))
            .cast("long")
            .alias("n_distinct_hashes"),
            F.round(
                F.when(
                    F.col("n_grams") > 0,
                    F.coalesce("n_selected", F.lit(0))
                    / F.col("n_grams"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("density"),
        )
        .orderBy("doc_id")
    )


def _dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    fph = _selected_fingerprints(d).select("doc_id", "h").distinct()
    a = fph.select(F.col("doc_id").alias("id_a"), "h")
    b = fph.select(F.col("doc_id").alias("id_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= _WIN_MIN_SHARED)
        .orderBy("id_a", "id_b")
    )


_WIN_SH_SQL = f"""
toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '')
               AS ws
    FROM documents),
grams AS (
    SELECT doc_id, i AS j,
           md5(ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]) AS h
    FROM toks,
         unnest(generate_series(1, len(ws) - {_WIN_K - 1})) u(i)),
m AS (SELECT doc_id, max(j) AS m FROM grams GROUP BY doc_id),
exploded AS (
    SELECT g.doc_id, g.j, g.h, i
    FROM grams g JOIN m USING (doc_id),
         unnest(generate_series(greatest(1, g.j - {_WIN_W - 1}),
                                least(g.j, m.m - {_WIN_W - 1}))) w(i)
    WHERE m.m >= {_WIN_W} AND i >= 1),
sel AS (
    SELECT DISTINCT doc_id,
           substr(k, 1, 32) AS h,
           {_POS_BASE} - CAST(substr(k, 33, 10) AS BIGINT) AS pos
    FROM (
        SELECT doc_id, i,
               min(h || lpad(CAST({_POS_BASE} - j AS VARCHAR), 10, '0'))
                   AS k
        FROM exploded GROUP BY doc_id, i))
"""

WINNOW_FP_SQL = f"""
WITH {_WIN_SH_SQL},
per AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_selected,
           CAST(count(DISTINCT h) AS BIGINT) AS n_distinct_hashes
    FROM sel GROUP BY doc_id),
ng AS (
    SELECT doc_id, CAST(len(ws) - {_WIN_K - 1} AS BIGINT) AS n_grams
    FROM toks)
SELECT ng.doc_id, n_grams,
       coalesce(n_selected, 0) AS n_selected,
       coalesce(n_distinct_hashes, 0) AS n_distinct_hashes,
       round(CASE WHEN n_grams > 0
                  THEN coalesce(n_selected, 0) * 1.0 / n_grams
                  ELSE 0.0 END, 6) AS density
FROM ng LEFT JOIN per USING (doc_id)
ORDER BY doc_id
"""

WINNOW_PAIRS_SQL = f"""
WITH {_WIN_SH_SQL},
fph AS (SELECT DISTINCT doc_id, h FROM sel)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM fph a JOIN fph b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= {_WIN_MIN_SHARED}
ORDER BY id_a, id_b
"""


QUERIES: dict[str, QuerySpec] = {
    "text_winnow_fingerprints": QuerySpec(
        _text_winnow_fingerprints, WINNOW_FP_SQL
    ),
    "dedup_winnow_pairs": QuerySpec(_dedup_winnow_pairs, WINNOW_PAIRS_SQL),
}
