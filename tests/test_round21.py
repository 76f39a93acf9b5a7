"""Invariant tests for the round-5 sixteenth batch (round21.py):
the RAG chunk index replayed in plain Python.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()

SIZE, STEP, MIN_LEN = 500, 400, 100


def test_rag_index_matches_replay(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    occs = defaultdict(list)
    meta = {}
    for d in docs:
        for cid, start in enumerate(range(0, max(len(d.text), 1), STEP)):
            chunk = d.text[start : start + SIZE]
            if len(chunk) < MIN_LEN:
                continue
            fp = hashlib.md5(chunk.encode()).hexdigest()
            occs[fp].append((d.doc_id, cid))
            meta[fp] = (len(chunk), len(set(chunk.split(" "))))
    out = {
        r.chunk_fp: r
        for r in REGISTRY["pipeline_rag_index"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(occs)
    assert occs, "degenerate: no chunk long enough"
    for fp, lst in occs.items():
        r = out[fp]
        assert r.n_occurrences == len(lst)
        assert (r.rep_doc_id, r.rep_chunk_id) == min(lst)
        assert (r.chunk_len, r.n_terms) == meta[fp]
    # the index is deduplicated: every fingerprint appears exactly once
    assert len(out) == len({r.chunk_fp for r in out.values()})
