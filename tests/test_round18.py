"""Invariant tests for the round-5 thirteenth batch (round18.py):
MinHash banding recall measured against brute-force exact pairs.
"""

from __future__ import annotations

from itertools import combinations

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()


def _shingles(text, n=3):
    w = text.split(" ")
    if len(w) <= n - 1:
        return {" ".join(w)}
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def test_minhash_recall_counts_match_brute_force(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    sh = {d.doc_id: _shingles(d.text) for d in docs}
    true_pairs = {
        (a, b)
        for a, b in combinations(sorted(sh), 2)
        if round(
            len(sh[a] & sh[b]) / len(sh[a] | sh[b]), 6
        )
        >= 0.8
    }
    [r] = REGISTRY["dedup_minhash_recall"].fn(spark, SF_DIR).collect()
    assert r.n_true == len(true_pairs)
    assert 0 <= r.n_hits <= r.n_true
    assert r.n_hits <= r.n_candidates
    if r.n_true:
        assert abs(r.recall - round(r.n_hits / r.n_true, 6)) < 1e-9
        # 4 bands × 2 rows: a J≥0.8 pair collides with prob ≥ 0.98 —
        # on the tiny sf0.001 pair set recall should be at/near 1
        assert r.recall >= 0.8
    if r.n_candidates:
        assert abs(r.precision - round(r.n_hits / r.n_candidates, 6)) < 1e-9
