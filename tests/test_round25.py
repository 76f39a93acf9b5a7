"""Invariant tests for the round-5 twentieth batch (round25.py):
video scene-cut detection replayed in plain Python.
"""

from __future__ import annotations

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()

FRAME, THR = 128, 29 * 128


def test_video_cuts_match_replay(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    expected = {}
    for d in docs:
        if d.doc_id % 3 != 2:
            continue
        b = d.text.encode("utf-8")
        nf = len(b) // FRAME
        for f in range(1, nf):
            cur = b[f * FRAME : (f + 1) * FRAME]
            prev = b[(f - 1) * FRAME : f * FRAME]
            l1 = sum(abs(x - y) for x, y in zip(cur, prev))
            expected[(d.doc_id, f)] = l1
    out = {
        (r.doc_id, r.frame_idx): r
        for r in REGISTRY["multimodal_video_cuts"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(expected)
    assert expected, "degenerate: no video doc with two full frames"
    for k, r in out.items():
        assert r.l1_diff == expected[k], k
        assert r.is_cut == (expected[k] > THR), k
    # both classes present at this sf (threshold chosen to split)
    flags = {r.is_cut for r in out.values()}
    assert flags == {True, False}
