"""Invariant tests for the round-5 seventh batch (queries/round12.py):
every operator is replayed in plain Python against its definition.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import datetime

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()


def test_psi_drift_matches_replay(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cutoff = datetime(1998, 1, 1)
    ca = Counter()
    cb = Counter()
    for r in orders:
        b = min(int(r.o_totalprice // 60_000), 9)
        (ca if r.o_orderdate < cutoff else cb)[b] += 1
    na, nb = sum(ca.values()), sum(cb.values())
    out = {
        r.bucket: r
        for r in REGISTRY["dq_profile_drift"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(ca) | set(cb)
    psi_total = 0.0
    for b, r in out.items():
        pa = (ca[b] + 1) / (na + 10)
        pb = (cb[b] + 1) / (nb + 10)
        assert r.n_a == ca[b] and r.n_b == cb[b]
        assert abs(r.share_a - round(pa, 6)) < 1e-9
        assert abs(r.share_b - round(pb, 6)) < 1e-9
        term = (pb - pa) * math.log(pb / pa)
        assert abs(r.psi_term - round(term, 6)) < 1e-6
        assert r.psi_term >= -1e-9, "PSI terms are non-negative"
        psi_total += term
    assert psi_total >= 0


def test_km_curve_matches_replay(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    by_cust = defaultdict(list)
    maxd = max(r.o_orderdate for r in orders).date()
    for r in orders:
        by_cust[r.o_custkey].append((r.o_orderdate.date(), r.o_orderkey))
    durs = []
    for ds in by_cust.values():
        ds.sort()
        if len(ds) >= 2:
            durs.append(((ds[1][0] - ds[0][0]).days, True))
        else:
            durs.append(((maxd - ds[0][0]).days, False))
    at = defaultdict(lambda: [0, 0])  # dur -> [events, exits]
    for d, obs in durs:
        at[d][1] += 1
        if obs:
            at[d][0] += 1
    n = len(durs)
    surv = 1.0
    expected = {}
    for d in sorted(at):
        e, x = at[d]
        if e > 0:
            if e < n:
                surv *= 1 - e / n
            else:
                surv = 0.0
            expected[d] = (n, e, surv)
        n -= x
    out = {
        r.dur_days: r
        for r in REGISTRY["orders_survival_km"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(expected)
    prev = 1.0 + 1e-12
    for d in sorted(out):
        r = out[d]
        n_risk, e, s = expected[d]
        assert r.n_risk == n_risk, d
        assert r.n_events == e, d
        assert abs(r.survival - round(s, 6)) < 1e-5, d
        # survival is monotonically non-increasing and in [0, 1]
        assert 0.0 <= r.survival <= prev
        prev = r.survival
