"""Invariant tests for the round-5 nineteenth batch (round24.py):
DAU/WAU/stickiness replayed in plain Python.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()


def test_dau_wau_stickiness_matches_replay(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_day = defaultdict(set)
    for r in ev:
        by_day[r.ts.date()].add(r.user_id)
    out = {
        r.day: r
        for r in REGISTRY["events_dau_wau_stickiness"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(by_day)
    for d, users in by_day.items():
        window = set()
        for k in range(7):
            window |= by_day.get(d - timedelta(days=k), set())
        r = out[d]
        assert r.dau == len(users), d
        assert r.wau == len(window), d
        assert abs(r.stickiness - round(len(users) / len(window), 6)) < 1e-9
        # invariants: DAU ≤ WAU, stickiness in (0, 1]
        assert r.dau <= r.wau
        assert 0 < r.stickiness <= 1
