"""Invariant tests for the round-5 eighteenth batch (round23.py):
the Bloom filter replayed in plain Python.
"""

from __future__ import annotations

import hashlib

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()

M, K, POS_MEMBERS = 8192, 3, 100


def _positions(key):
    return {
        int(hashlib.md5(f"{j}:{key}".encode()).hexdigest()[:8], 16) % M
        for j in range(K)
    }


def test_bloom_counts_match_replay_and_no_false_negatives(spark):
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    supp = spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect()
    bits = set()
    for r in cust:
        bits |= _positions(r.c_name)
    probes = {r.s_name: False for r in supp}
    probes.update(
        {r.c_name: True for r in cust if r.c_custkey < POS_MEMBERS}
    )
    n_hits = sum(1 for k in probes if _positions(k) <= bits)
    n_false = sum(
        1 for k, mem in probes.items() if not mem and _positions(k) <= bits
    )
    [r] = REGISTRY["sketch_bloom_fpr"].fn(spark, SF_DIR).collect()
    assert r.n_probes == len(probes)
    assert r.n_members == sum(probes.values())
    assert r.n_hits == n_hits
    assert r.n_false_pos == n_false
    # Bloom guarantee: NO false negatives — every member probe hits
    assert r.n_hits - r.n_false_pos == r.n_members
    # and the measured FPR is consistent
    neg = r.n_probes - r.n_members
    assert abs(r.fpr - round(n_false / neg, 6)) < 1e-9
    assert 0.0 <= r.fpr < 0.5
