"""Invariant + numpy-replay tests for round54 (label-noise recall twin)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import numpy as np
import pytest

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from trackdechets_etl_spark.session import get_spark

    return get_spark()


def _q(name):
    return all_queries()[name].fn


def _replay(spark):
    """Numpy recomputation of BOTH audits at sf0.001."""
    from trackdechets_etl_spark.llm.similarity import N_PLANES, hyperplane

    e = read_table(spark, SF_DIR, "embeddings")
    data = e.select("vec_id", "embedding", "label").collect()
    ids = [int(r.vec_id) for r in data]
    labels = {int(r.vec_id): r.label for r in data}
    raw = np.array([r.embedding for r in data], dtype=np.float64)
    mat = raw / np.linalg.norm(raw, axis=1, keepdims=True)
    planes = np.array([hyperplane(p, raw.shape[1]) for p in range(N_PLANES)])
    buckets = ((raw @ planes.T > 0) * (2 ** np.arange(N_PLANES))).sum(axis=1)
    probes = [
        j
        for j, vid in enumerate(ids)
        if hashlib.md5(str(vid).encode()).hexdigest()[:2] < "08"
    ]

    def majority(probe_idx, same_bucket_only):
        cos = mat @ mat[probe_idx]
        cand = [
            (round(-float(cos[j]), 9), ids[j])
            for j in range(len(ids))
            if j != probe_idx
            and (not same_bucket_only or buckets[j] == buckets[probe_idx])
        ]
        if not cand:
            return None
        cand.sort()
        votes = Counter(labels[nid] for _, nid in cand[:5])
        return min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]

    out = dict(
        n_probes=len(probes),
        n_noisy_exact=0,
        n_covered_lsh=0,
        n_noisy_lsh=0,
        n_both_noisy=0,
        n_majority_agree=0,
    )
    for pi in probes:
        plabel = labels[ids[pi]]
        ex = majority(pi, False)
        ls = majority(pi, True)
        ex_noisy = ex != plabel
        out["n_noisy_exact"] += ex_noisy
        if ls is not None:
            out["n_covered_lsh"] += 1
            out["n_noisy_lsh"] += ls != plabel
            out["n_both_noisy"] += ex_noisy and ls != plabel
            out["n_majority_agree"] += ls == ex
    return out


def test_recall_twin_matches_numpy_replay(spark):
    rows = _q("embedding_label_noise_recall")(spark, SF_DIR).collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    assert got == _replay(spark)


def test_recall_twin_internal_invariants(spark):
    r = _q("embedding_label_noise_recall")(spark, SF_DIR).collect()[0]
    assert r.n_probes > 0, "probe cut selected nothing — weak fixture"
    assert r.n_covered_lsh <= r.n_probes
    assert r.n_noisy_lsh <= r.n_covered_lsh
    assert r.n_both_noisy <= min(r.n_noisy_exact, r.n_noisy_lsh)
    assert r.n_majority_agree <= r.n_covered_lsh


def test_production_knn_plan_has_no_corpus_broadcast_hint(spark):
    """The production query joins on the LSH bucket; the ONLY
    BroadcastNestedLoop/Cartesian-free requirement is already pinned
    registry-wide — here we pin that the join key is the bucket."""
    df = _q("embedding_label_noise_knn")(spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "crossjoin" not in plan.lower()
    assert "cartesian" not in plan.lower()
    # the candidate join must be the bucket equi-join
    assert re.search(r"Join Inner,.*bucket", plan), plan[:2000]
