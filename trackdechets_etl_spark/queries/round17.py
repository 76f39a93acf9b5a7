"""Round-5 additions, twelfth batch: the audio leg of the multimodal
stack.

- ``multimodal_audio_frames``: PCM framing + per-frame RMS energy for
  audio-kind payloads (frame 256, hop 128, full frames only) — the
  windowing step every audio feature extractor starts with, as an
  Arrow-batched ``mapInPandas`` numpy kernel (the engine's justified
  Python path, same class as the image decode). The oracle recomputes
  the byte math in SQL (payloads are UTF-8 text bytes and the corpus
  is pure ASCII, the established multimodal convention —
  ``MULTIMODAL_DECODE_SQL``), so the check is byte-for-byte.

Invariant tests in tests/test_round17.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

_FRAME = 256
_HOP = 128


def _multimodal_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-kind docs (doc_id % 3 == 1) → overlapping PCM frames with
    RMS of the zero-centered samples, rounded at 6. At 100 TB this is
    partition-parallel codec work: payload bytes never shuffle (the
    frame kernel runs inside the scan partitions) and only the
    frame-level rows — payload-size / hop of them — move downstream."""
    from trackdechets_etl_spark.llm.multimodal import audio_frames, with_payload

    d = read_table(spark, sf_dir, "documents")
    mm = with_payload(d, "text", "doc_id").filter(F.col("mm_kind") == "audio")
    out = audio_frames(mm, frame=_FRAME, hop=_HOP)
    return out.select(
        "doc_id",
        "frame_idx",
        "n_samples",
        F.round("rms", 6).alias("rms"),
    ).orderBy("doc_id", "frame_idx")


MULTIMODAL_AUDIO_SQL = f"""
WITH au AS (
    SELECT doc_id, text, length(text) AS n
    FROM documents WHERE doc_id % 3 = 1),
frames AS (
    SELECT doc_id, text,
           unnest(generate_series(
               0, CAST(floor((n - {_FRAME}) / {_HOP}.0) AS BIGINT))) AS f
    FROM au WHERE n >= {_FRAME}),
pos AS (
    SELECT doc_id, f, text, unnest(generate_series(1, {_FRAME})) AS i
    FROM frames),
samp AS (
    SELECT doc_id, f,
           ascii(substring(text, CAST(f * {_HOP} + i AS INT), 1)) - 128 AS s
    FROM pos)
SELECT doc_id, f AS frame_idx,
       CAST({_FRAME} AS BIGINT) AS n_samples,
       round(sqrt(sum(s * s) / {_FRAME}.0), 6) AS rms
FROM samp
GROUP BY doc_id, f
ORDER BY doc_id, frame_idx
"""


QUERIES: dict[str, QuerySpec] = {
    "multimodal_audio_frames": QuerySpec(
        _multimodal_audio_frames, MULTIMODAL_AUDIO_SQL
    ),
}
