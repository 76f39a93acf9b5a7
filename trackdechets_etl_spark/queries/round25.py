"""Round-5 additions, twentieth batch: the video leg of the
multimodal stack.

- ``multimodal_video_cuts``: scene-cut detection plumbing — exact
  integer L1 difference between consecutive non-overlapping 128-byte
  frames of video-kind payloads, cut flagged above a per-byte
  threshold. Arrow-batched ``mapInPandas`` numpy kernel (same
  justified Python path as the image decode and audio framing);
  byte-exact SQL oracle via the established ASCII-payload
  convention. With audio framing (round17) this completes the
  image/audio/video modality triple end-to-end.

Invariant tests in tests/test_round25.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import QuerySpec

_FRAME = 128
_THR_PER_BYTE = 29


def _multimodal_video_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-kind docs (doc_id % 3 == 2) → per-transition L1 frame
    diff and cut flag. All-integer math: the flag can never diverge
    between engines. Payload bytes never shuffle — the kernel runs
    inside the scan partitions and only transition rows move."""
    from trackdechets_etl_spark.llm.multimodal import (
        video_scene_cuts,
        with_payload,
    )

    d = read_table(spark, sf_dir, "documents")
    mm = with_payload(d, "text", "doc_id").filter(F.col("mm_kind") == "video")
    return video_scene_cuts(
        mm, frame=_FRAME, threshold_per_byte=_THR_PER_BYTE
    ).orderBy("doc_id", "frame_idx")


MULTIMODAL_VIDEO_SQL = f"""
WITH vid AS (
    SELECT doc_id, text, length(text) // {_FRAME} AS nf
    FROM documents WHERE doc_id % 3 = 2),
trans AS (
    SELECT doc_id, text, unnest(generate_series(1, nf - 1)) AS f
    FROM vid WHERE nf >= 2),
pos AS (
    SELECT doc_id, f, text, unnest(generate_series(1, {_FRAME})) AS i
    FROM trans),
diffs AS (
    SELECT doc_id, f,
           abs(ascii(substring(text, CAST(f * {_FRAME} + i AS INT), 1))
               - ascii(substring(text, CAST((f - 1) * {_FRAME} + i AS INT),
                                 1))) AS d
    FROM pos)
SELECT doc_id, f AS frame_idx,
       CAST(sum(d) AS BIGINT) AS l1_diff,
       sum(d) > {_THR_PER_BYTE * _FRAME} AS is_cut
FROM diffs
GROUP BY doc_id, f
ORDER BY doc_id, frame_idx
"""


QUERIES: dict[str, QuerySpec] = {
    "multimodal_video_cuts": QuerySpec(
        _multimodal_video_cuts, MULTIMODAL_VIDEO_SQL
    ),
}
