"""Invariant tests for the round-5 fifteenth batch (round20.py):
the two Lloyd rounds replayed in plain Python.
"""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()

K, ROUNDS = 8, 2


def _d2(v, c):
    # expanded form, matching the engine's fold order
    return round(
        sum(x * x for x in v) - 2 * sum(x * y for x, y in zip(v, c))
        + sum(y * y for y in c),
        6,
    )


def _assign(vecs, cents):
    out = {}
    for vid, v in vecs.items():
        best = min((cid for cid in cents), key=lambda cid: (_d2(v, cents[cid]), cid))
        out[vid] = (best, _d2(v, cents[best]))
    return out


def _update(vecs, assigned, prev):
    groups = defaultdict(list)
    for vid, (cid, _d) in assigned.items():
        groups[cid].append(vecs[vid])
    cents = {}
    for cid, old in prev.items():
        if cid in groups:
            members = groups[cid]
            dims = len(old)
            cents[cid] = [
                round(sum(m[i] for m in members) / len(members), 4)
                for i in range(dims)
            ]
        else:
            cents[cid] = old
    return cents


def test_kmeans_matches_python_lloyd(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb}
    cents = {vid: vecs[vid] for vid in vecs if vid < K}
    for _ in range(ROUNDS):
        assigned = _assign(vecs, cents)
        cents = _update(vecs, assigned, cents)
    final = _assign(vecs, cents)
    out = {
        r.vec_id: (r.cluster, r.dist2)
        for r in REGISTRY["ml_kmeans_lite"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(vecs)
    for vid, (cid, d2) in out.items():
        ecid, ed2 = final[vid]
        assert cid == ecid, vid
        assert abs(d2 - ed2) < 1e-6, vid
    # Lloyd invariant: each vector's final distance is minimal over
    # the final centroids (spot-check a handful)
    for vid in list(out)[:20]:
        cid, d2 = out[vid]
        assert all(
            d2 <= _d2(vecs[vid], cents[c]) + 1e-9 for c in cents
        ), vid
    assert len({cid for cid, _ in out.values()}) > 1, "degenerate clustering"
