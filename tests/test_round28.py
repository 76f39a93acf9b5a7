"""Invariant tests for the round-5 twenty-third batch (round28.py):
novelty and burstiness replayed in plain Python.
"""

from __future__ import annotations

import math
from collections import defaultdict

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()


def _shingles(text, n=3):
    w = text.split(" ")
    if len(w) <= n - 1:
        return {" ".join(w)}
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def test_ngram_novelty_matches_replay(spark):
    docs = sorted(
        spark.read.parquet(f"{SF_DIR}/documents.parquet").collect(),
        key=lambda r: r.doc_id,
    )
    first = {}
    sh_of = {}
    for d in docs:
        sh = _shingles(d.text)
        sh_of[d.doc_id] = sh
        for s in sh:
            first.setdefault(s, d.doc_id)
    out = {
        r.doc_id: r
        for r in REGISTRY["text_ngram_novelty"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(sh_of)
    for did, sh in sh_of.items():
        novel = sum(1 for s in sh if first[s] == did)
        r = out[did]
        assert r.n_shingles == len(sh)
        assert r.n_novel == novel
        assert abs(r.novelty - round(novel / len(sh), 6)) < 1e-9
    # the earliest doc is fully novel by construction
    assert out[docs[0].doc_id].novelty == 1.0


def test_burstiness_matches_replay_and_bounds(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.ts, r.event_id))
    out = {
        r.user_id: r
        for r in REGISTRY["events_inter_arrival_burstiness"]
        .fn(spark, SF_DIR)
        .collect()
    }
    for uid, evs in by_user.items():
        evs.sort()
        us = [int(t.timestamp() * 1_000_000) for t, _e in evs]
        gaps = [(b - a) // 1000 for a, b in zip(us, us[1:])]
        if len(gaps) < 3:
            assert uid not in out
            continue
        n = len(gaps)
        mu = sum(gaps) / n
        var = sum((g - mu) ** 2 for g in gaps) / (n - 1)
        sigma = math.sqrt(var)
        b = (sigma - mu) / (sigma + mu)
        r = out[uid]
        assert r.n_gaps == n
        assert abs(r.mean_gap_s - round(mu / 1000, 6)) < 1e-3
        assert abs(r.burstiness - round(b, 6)) < 1e-5
        # burstiness is bounded in (-1, 1)
        assert -1 < r.burstiness < 1
