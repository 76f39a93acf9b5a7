"""Invariant tests for the round-5 twenty-fourth batch (round29.py):
the point-in-time tolerance join replayed in plain Python.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()

TOL = timedelta(hours=24)


def test_asof_tolerance_matches_replay(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    views = defaultdict(list)
    for r in ev:
        if r.event_type == "view":
            views[r.user_id].append(r)
    out = {
        r.purchase_id: r
        for r in REGISTRY["join_asof_tolerance"].fn(spark, SF_DIR).collect()
    }
    purchases = [r for r in ev if r.event_type == "purchase"]
    assert set(out) == {r.event_id for r in purchases}
    n_fresh = n_stale_or_none = 0
    for p in purchases:
        cands = [
            v
            for v in views[p.user_id]
            if v.ts <= p.ts and v.ts >= p.ts - TOL
        ]
        r = out[p.event_id]
        if cands:
            best = max(cands, key=lambda v: (v.ts, v.event_id))
            assert r.view_id == best.event_id
            assert r.view_ts == best.ts
            assert abs(r.view_value - round(best.value, 6)) < 1e-9
            n_fresh += 1
        else:
            assert r.view_id is None and r.view_ts is None
            n_stale_or_none += 1
            # the staleness gate is the only difference from plain
            # as-of: if ANY prior view exists it must be stale
            prior = [v for v in views[p.user_id] if v.ts <= p.ts]
            if prior:
                assert max(v.ts for v in prior) < p.ts - TOL
    assert n_fresh and n_stale_or_none, "both branches must be exercised"
