"""Round-5 additions, sixteenth batch: composed RAG indexing pipeline.

- ``pipeline_rag_index``: the retrieval twin of
  ``pipeline_training_data`` — overlapping chunks (500/400 stride,
  the ``text_chunk_overlap`` kernel) → md5 exact-dedup across the
  whole corpus (one canonical occurrence per chunk text, min
  (doc, chunk) representative) → minimum-length quality gate → index
  row per canonical chunk with occurrence count and distinct-term
  count. This is the chunk table a RAG system embeds and serves.

Invariant tests in tests/test_round21.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

_CHUNK_SIZE = 500
_CHUNK_STEP = 400
_MIN_CHUNK_LEN = 100


def _pipeline_rag_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunking is a shuffle-free map stage pipelined with the scan;
    dedup shuffles 32-byte md5 keys (never chunk text); the index row
    carries the min-(doc, chunk) representative so reruns are
    deterministic. At 100 TB the chunk fingerprint is also the
    embedding cache key — dedup before embedding is what makes the
    GPU bill proportional to UNIQUE text."""
    docs = read_table(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length("text") - 1, F.lit(0)),
        F.lit(_CHUNK_STEP),
    )
    chunks = docs.select(
        "doc_id", F.posexplode(starts).alias("chunk_id", "start"), "text"
    ).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.substring(F.col("text"), F.col("start") + 1, _CHUNK_SIZE).alias(
            "chunk"
        ),
    )
    kept = chunks.filter(F.length("chunk") >= _MIN_CHUNK_LEN)
    return (
        kept.select(
            F.md5("chunk").alias("chunk_fp"),
            F.struct("doc_id", "chunk_id").alias("occ"),
            F.length("chunk").cast("long").alias("chunk_len"),
            F.size(F.array_distinct(F.split("chunk", " ")))
            .cast("long")
            .alias("n_terms"),
        )
        .groupBy("chunk_fp")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("occ").alias("rep"),
            F.min("chunk_len").alias("chunk_len"),
            F.min("n_terms").alias("n_terms"),
        )
        .select(
            "chunk_fp",
            "n_occurrences",
            F.col("rep.doc_id").alias("rep_doc_id"),
            F.col("rep.chunk_id").alias("rep_chunk_id"),
            "chunk_len",
            "n_terms",
        )
        .orderBy("chunk_fp")
    )


PIPELINE_RAG_SQL = f"""
WITH chunks AS (
    SELECT doc_id, CAST(s / {_CHUNK_STEP} AS BIGINT) AS chunk_id,
           substring(text, CAST(s + 1 AS INT), {_CHUNK_SIZE}) AS chunk
    FROM documents,
         unnest(generate_series(0, greatest(length(text) - 1, 0),
                                {_CHUNK_STEP})) AS t(s)),
kept AS (SELECT * FROM chunks WHERE length(chunk) >= {_MIN_CHUNK_LEN}),
ranked AS (
    SELECT md5(chunk) AS chunk_fp, doc_id, chunk_id,
           CAST(length(chunk) AS BIGINT) AS chunk_len,
           CAST(len(list_distinct(string_split(chunk, ' '))) AS BIGINT)
               AS n_terms,
           count(*) OVER (PARTITION BY md5(chunk)) AS n_occ,
           row_number() OVER (PARTITION BY md5(chunk)
                              ORDER BY doc_id, chunk_id) AS rn
    FROM kept)
SELECT chunk_fp,
       CAST(n_occ AS BIGINT) AS n_occurrences,
       doc_id AS rep_doc_id,
       chunk_id AS rep_chunk_id,
       chunk_len, n_terms
FROM ranked WHERE rn = 1
ORDER BY chunk_fp
"""


QUERIES: dict[str, QuerySpec] = {
    "pipeline_rag_index": QuerySpec(_pipeline_rag_index, PIPELINE_RAG_SQL),
}
