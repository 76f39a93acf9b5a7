"""Invariant tests for round38 (BM25, burst profile)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import all_queries
from tests.conftest import SF_DIR


def _q(name):
    return all_queries()[name].fn


def test_bm25_python_replay_one_query(spark):
    """From-scratch Python BM25 for the q_exec query must reproduce the
    engine's top-10 exactly (ids, ranks and 6dp scores)."""
    from trackdechets_etl_spark.queries.round38 import (
        _BM25_B,
        _BM25_K1,
        _BM25_QUERIES,
    )

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    tf = {}
    dl = {}
    for r in docs:
        toks = [t for t in r.text.split(" ") if t]
        dl[r.doc_id] = len(toks)
        counts = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        tf[r.doc_id] = counts
    n = len(docs)
    avgdl = sum(dl.values()) / n
    terms = _BM25_QUERIES["q_exec"]
    df = {t: sum(1 for d in tf.values() if t in d) for t in terms}
    idf = {t: math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5)) for t in terms}
    scores = {}
    for did, counts in tf.items():
        s = 0.0
        for t in terms:
            if t in counts:
                f = counts[t]
                s += idf[t] * f * (1 + _BM25_K1) / (
                    f + _BM25_K1 * (1 - _BM25_B + _BM25_B * dl[did] / avgdl)
                )
        if s > 0:
            scores[did] = s
    want = sorted(scores.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))[:10]
    got = [
        (r.doc_id, r.rank, r.score)
        for r in _q("text_bm25_topk")(spark, SF_DIR)
        .filter(F.col("query") == "q_exec")
        .orderBy("rank")
        .collect()
    ]
    assert [(d, i + 1, round(s, 6)) for i, (d, s) in enumerate(want)] == got


def test_burst_profile_bounds(spark):
    """Peak counts are at least 1 and at most the group size; burst
    rows never exceed events; totals re-sum to the events table."""
    rows = _q("events_burst_profile")(spark, SF_DIR).collect()
    ev = read_table(spark, SF_DIR, "events")
    assert sum(r.n_events for r in rows) == ev.count()
    for r in rows:
        assert 1 <= r.peak_24h <= r.n_events
        assert 0 <= r.n_burst_rows <= r.n_events
        if r.n_burst_rows > 0:
            assert r.peak_24h >= 5
