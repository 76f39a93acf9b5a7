"""Invariant tests for the round-5 twelfth batch (queries/round17.py):
audio framing replayed in plain Python against its definition.
"""

from __future__ import annotations

import math

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()

FRAME, HOP = 256, 128


def test_audio_frames_match_replay(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    expected = {}
    for d in docs:
        if d.doc_id % 3 != 1:
            continue
        b = d.text.encode("utf-8")
        f = 0
        while f * HOP + FRAME <= len(b):
            seg = [x - 128 for x in b[f * HOP : f * HOP + FRAME]]
            rms = math.sqrt(sum(s * s for s in seg) / FRAME)
            expected[(d.doc_id, f)] = rms
            f += 1
    out = {
        (r.doc_id, r.frame_idx): r
        for r in REGISTRY["multimodal_audio_frames"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(expected)
    assert expected, "degenerate: no audio doc long enough for a frame"
    for k, r in out.items():
        assert r.n_samples == FRAME
        assert abs(r.rms - round(expected[k], 6)) < 1e-9, k
    # overlapping frames: consecutive indices share half their samples,
    # so a doc with f frames has hop*(f-1)+frame <= n bytes
    by_doc = {}
    for (did, f), _r in out.items():
        by_doc[did] = max(by_doc.get(did, 0), f)
    lens = {d.doc_id: len(d.text.encode()) for d in docs}
    for did, fmax in by_doc.items():
        assert HOP * fmax + FRAME <= lens[did]
        assert HOP * (fmax + 1) + FRAME > lens[did], "a full frame was missed"
