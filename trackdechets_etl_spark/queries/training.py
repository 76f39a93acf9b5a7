"""Training-data pipeline queries: PII scrubbing, vocabulary pruning,
deterministic train/val/test splits, weighted mixture sampling, and
context-window sequence packing.

These extend the LLM-pipeline surface (BASELINE.json north star) with
the dataset-assembly steps a pre-training corpus build needs after
dedup/quality filtering. Everything is JVM-side column expressions and
windows — no UDFs — with exact DuckDB twins.

Determinism notes (the oracle hash is exact):
- random choices (splits, sampling) are md5-hash based, never rand() —
  reproducible across engines AND across cluster re-runs, which is the
  property a real corpus build needs for auditability;
- hex md5 prefixes compare lexicographically identically in both
  engines (lowercase hex, ASCII order);
- packing uses an exclusive running token sum per shard, so a document
  is assigned to the pack its starting offset falls in — expressible as
  a window in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.llm import text as TX
from trackdechets_etl_spark.queries import QuerySpec

# ------------------------------------------------------------ pii scrub

# The synthetic corpus has no PII, so the query *injects* a
# deterministic contact suffix per doc, then scrubs it — proving both
# the redaction and the count logic end-to-end against the oracle.
_SUFFIX = "contact user{id}@example.com tel 06{id}99"


def _scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    with_pii = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com tel 06"),
        F.col("doc_id").cast("string"),
        F.lit("99"),
    )
    return d.select(
        "doc_id",
        TX.scrub_pii(with_pii).alias("scrubbed"),
        TX.pii_count(with_pii).alias("n_redactions"),
    )


SCRUB_PII_SQL = rf"""
WITH w AS (
    SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com tel 06' || CAST(doc_id AS VARCHAR) || '99'
               AS t
    FROM documents),
s AS (
    SELECT doc_id,
           regexp_replace(t, '{TX.PII_EMAIL_PATTERN}', '<EMAIL>', 'g') AS t1
    FROM w)
SELECT s.doc_id,
       regexp_replace(t1, '{TX.PII_NUMBER_PATTERN}', '<NUM>', 'g') AS scrubbed,
       CAST(len(regexp_extract_all(w.t, '{TX.PII_EMAIL_PATTERN}'))
            + len(regexp_extract_all(t1, '{TX.PII_NUMBER_PATTERN}')) AS BIGINT)
           AS n_redactions
FROM s JOIN w USING (doc_id)
"""

# ------------------------------------------------------------ vocab prune

MIN_DF = 5


def _vocab_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replace words whose document frequency < MIN_DF with <unk> —
    vocabulary trimming before tokenizer training. Document frequency
    is one groupBy over (word, doc) pairs; the tiny vocab table
    broadcasts back onto the exploded tokens; per-doc reassembly
    orders by token position (array_sort on (pos, word) structs)."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    dfreq = toks.groupBy("w").agg(F.count_distinct("doc_id").alias("df"))
    kept = toks.join(F.broadcast(dfreq), "w").select(
        "doc_id",
        "pos",
        F.when(F.col("df") >= MIN_DF, F.col("w")).otherwise(F.lit("<unk>")).alias("w2"),
    )
    return kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w2"))),
                lambda s: s["w2"],
            ),
        ).alias("pruned_text"),
        F.sum((F.col("w2") == "<unk>").cast("long")).alias("n_unk"),
    )


VOCAB_PRUNE_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
toks AS (
    SELECT doc_id, pos, ws[pos] AS w
    FROM t, unnest(generate_series(1, len(ws))) AS g(pos)),
dfreq AS (SELECT w, count(DISTINCT doc_id) AS df FROM toks GROUP BY w),
kept AS (
    SELECT doc_id, pos,
           CASE WHEN df >= {MIN_DF} THEN w ELSE '<unk>' END AS w2
    FROM toks JOIN dfreq USING (w))
SELECT doc_id,
       string_agg(w2, ' ' ORDER BY pos) AS pruned_text,
       CAST(sum(CASE WHEN w2 = '<unk>' THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
FROM kept GROUP BY doc_id
"""

# ------------------------------------------------------------ split assign

# First two md5 nibbles of the doc id: < 0xcc (204/256 = 79.7%) train,
# < 0xe6 (230/256 = 89.8%) val, else test.
TRAIN_HEX = "cc"
VAL_HEX = "e6"


def _split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h2 < TRAIN_HEX, "train")
        .when(h2 < VAL_HEX, "val")
        .otherwise("test")
    )
    return d.select("doc_id", split.alias("split"))


SPLIT_ASSIGN_SQL = f"""
SELECT doc_id,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{TRAIN_HEX}' THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{VAL_HEX}' THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""

# ------------------------------------------------------------ mixture sample

# Per-source sampling weights for corpus mixing. Keep decision:
# md5(source:doc_id) 4-hex-nibble prefix below the weight threshold.
MIX_WEIGHTS: dict[str, float] = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
MIX_DEFAULT_WEIGHT = 0.1


def _mix_thresh(w: float) -> str:
    # w >= 1 keeps everything: 'zzzz' is above every hex prefix.
    return "zzzz" if w >= 1.0 else format(int(w * 65536), "04x")


def _mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    h4 = F.substring(
        F.md5(F.concat(F.col("source"), F.lit(":"), F.col("doc_id").cast("string"))),
        1,
        4,
    )
    thresh = F.lit(_mix_thresh(MIX_DEFAULT_WEIGHT))
    for src, w in MIX_WEIGHTS.items():
        thresh = F.when(F.col("source") == src, _mix_thresh(w)).otherwise(thresh)
    keep = (h4 < thresh).cast("long")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(keep).alias("n_kept"),
    )


_MIX_CASE = " ".join(
    f"WHEN source = '{s}' THEN '{_mix_thresh(w)}'" for s, w in MIX_WEIGHTS.items()
)

MIXTURE_SAMPLE_SQL = f"""
WITH k AS (
    SELECT source,
           CASE WHEN substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 4)
                     < (CASE {_MIX_CASE} ELSE '{_mix_thresh(MIX_DEFAULT_WEIGHT)}' END)
                THEN 1 ELSE 0 END AS keep
    FROM documents)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(keep) AS BIGINT) AS n_kept
FROM k GROUP BY source
"""

# ------------------------------------------------------------ pack sequences

PACK_BUDGET = 2048
N_SHARDS = 8


def _pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing plan: docs stream through shards in id
    order; each doc joins the pack its starting token offset falls in
    (exclusive running sum / budget). One window per shard — at scale
    shards bound both skew and the sort width."""
    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        (F.col("doc_id") % N_SHARDS).alias("shard"),
        TX.n_tokens_ws(F.col("text")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return t.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(cum_before / PACK_BUDGET).cast("long").alias("pack_id"),
    )


PACK_SEQUENCES_SQL = f"""
WITH t AS (
    SELECT doc_id, doc_id % {N_SHARDS} AS shard,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents)
SELECT doc_id, shard, n_tokens,
       CAST(floor(coalesce(sum(n_tokens) OVER (
                PARTITION BY shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            / {PACK_BUDGET}.0) AS BIGINT) AS pack_id
FROM t
"""


# ------------------------------------------------------------ decontamination

OVERLAP_MIN = 5  # distinct shared shingles that flag contamination


def _decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: train-split docs sharing >= OVERLAP_MIN
    distinct word 3-gram shingles with ANY test-split doc. The test-side
    shingle set is tiny (the held-out split) -> broadcast; the join is
    an inverted-index probe, never doc x doc."""
    from trackdechets_etl_spark.llm.dedup import shingles

    d = read_table(spark, sf_dir, "documents")
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h2 < TRAIN_HEX, "train").when(h2 < VAL_HEX, "val").otherwise("test")
    )
    tagged = d.withColumn("split", split)
    sh = shingles(tagged, "text", "doc_id")
    tags = tagged.select("doc_id", "split")
    sh = sh.join(tags, "doc_id")
    train_sh = sh.filter(F.col("split") == "train").select("doc_id", "shingle")
    test_sh = (
        sh.filter(F.col("split") == "test").select("shingle").distinct()
    )
    return (
        train_sh.join(F.broadcast(test_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= OVERLAP_MIN)
    )


DECONTAMINATE_SQL = f"""
WITH tagged AS (
    SELECT doc_id, text,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{TRAIN_HEX}' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{VAL_HEX}' THEN 'val'
                ELSE 'test' END AS split
    FROM documents),
toks AS (SELECT doc_id, split, string_split(text, ' ') AS w FROM tagged),
sh AS (
    SELECT DISTINCT doc_id, split, array_to_string(w[i:i+2], ' ') AS shingle
    FROM toks, unnest(generate_series(1, greatest(len(w) - 2, 1))) AS u(i)),
test_sh AS (SELECT DISTINCT shingle FROM sh WHERE split = 'test')
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
FROM sh JOIN test_sh USING (shingle)
WHERE split = 'train'
GROUP BY doc_id
HAVING count(*) >= {OVERLAP_MIN}
"""

# ------------------------------------------------------------ budget selection

TOKEN_BUDGET = 10_000


def _select_quality_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget curation: take docs in (quality desc, doc_id)
    order while the running token total stays within budget.

    Two-pass, no global window (the docs/SCALE.md form, now the code):
    the global (score desc, doc_id) prefix sum decomposes exactly into
    a per-DISTINCT-score base offset (cumulative window over the
    score-histogram frame — 4dp-rounded scores, so its size is bounded
    by the score grid, not the corpus) plus a within-score prefix sum
    (window PARTITIONED by score). Score buckets whose base offset
    already exceeds the budget are pruned before the row-scale window
    runs — at 100 TB almost the whole corpus drops before the only
    per-doc shuffle."""
    d = read_table(spark, sf_dir, "documents")
    score = TX.quality_features(F.col("text"))["quality_score"]
    t = d.select(
        "doc_id",
        score.alias("quality_score"),
        TX.n_tokens_ws(F.col("text")).cast("long").alias("n_tokens"),
    )
    per_score = t.groupBy("quality_score").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    wb = Window.orderBy(F.col("quality_score").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    base = per_score.select(
        "quality_score",
        F.coalesce(F.sum("bucket_tokens").over(wb), F.lit(0)).alias("base_tokens"),
    ).filter(F.col("base_tokens") <= TOKEN_BUDGET)
    wd = Window.partitionBy("quality_score").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        t.join(F.broadcast(base), "quality_score")
        .withColumn(
            "cum_tokens",
            (F.col("base_tokens") + F.sum("n_tokens").over(wd)).cast("long"),
        )
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET)
        .select("doc_id", "quality_score", "n_tokens", "cum_tokens")
    )


_QUALITY_SQL = """
SELECT doc_id,
       round(least(len(string_split(text, ' ')) / 100.0, 1.0) * 0.5
             + (1.0 - len(list_filter(string_split(text, ' '),
                          x -> list_contains(['a','the','and','of','is'], x)))
                      / len(string_split(text, ' '))) * 0.5, 4) AS quality_score,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM documents
"""

SELECT_QUALITY_BUDGET_SQL = f"""
WITH t AS ({_QUALITY_SQL}),
c AS (
    SELECT doc_id, quality_score, n_tokens,
           CAST(sum(n_tokens) OVER (
               ORDER BY quality_score DESC, doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_tokens
    FROM t)
SELECT doc_id, quality_score, n_tokens, cum_tokens
FROM c WHERE cum_tokens <= {TOKEN_BUDGET}
"""


QUERIES: dict[str, QuerySpec] = {
    "text_scrub_pii": QuerySpec(_scrub_pii, SCRUB_PII_SQL),
    "text_vocab_prune": QuerySpec(_vocab_prune, VOCAB_PRUNE_SQL),
    "split_train_val_test": QuerySpec(_split_assign, SPLIT_ASSIGN_SQL),
    "sample_mixture_weighted": QuerySpec(_mixture_sample, MIXTURE_SAMPLE_SQL),
    "pack_sequences": QuerySpec(_pack_sequences, PACK_SEQUENCES_SQL),
    "decontaminate_ngram_overlap": QuerySpec(_decontaminate, DECONTAMINATE_SQL),
    "select_quality_budget": QuerySpec(_select_quality_budget, SELECT_QUALITY_BUDGET_SQL),
}
