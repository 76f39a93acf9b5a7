"""Invariant tests for the round-5 sixth batch (queries/round11.py):
every operator is replayed in plain Python against its definition.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from datetime import timedelta

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()

GAP = timedelta(minutes=30)


def _python_sessions(events):
    by_user = defaultdict(list)
    for r in events:
        by_user[r.user_id].append(r.ts)
    sessions = []
    for uid, tss in by_user.items():
        tss.sort()
        start = prev = tss[0]
        n = 1
        for ts in tss[1:]:
            if ts - prev > GAP:
                sessions.append((uid, start, prev + GAP, n))
                start, n = ts, 0
            prev = ts
            n += 1
        sessions.append((uid, start, prev + GAP, n))
    return sessions


def test_concurrency_peak_matches_sweep_replay(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    sessions = _python_sessions(ev)
    pts = [(s[1], 1, s[0]) for s in sessions] + [
        (s[2], -1, s[0]) for s in sessions
    ]
    pts.sort()
    conc = 0
    day_peak = {}
    day_first = {}
    for ts, delta, _uid in pts:
        conc += delta
        d = ts.date()
        if conc > day_peak.get(d, -1):
            day_peak[d] = conc
            day_first[d] = ts
    out = {
        r.day: r
        for r in REGISTRY["events_concurrency_peak"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(day_peak)
    for d, r in out.items():
        assert r.peak_concurrent == day_peak[d], d
        assert r.first_peak_ts == day_first[d], d
    # sweep sanity: concurrency returned to zero at the end
    assert conc == 0


def test_bounce_rate_matches_replay(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    sessions = _python_sessions(ev)
    n_sess = Counter()
    n_bounce = Counter()
    for _uid, start, _end, n in sessions:
        n_sess[start.date()] += 1
        if n == 1:
            n_bounce[start.date()] += 1
    out = {
        r.day: r
        for r in REGISTRY["events_bounce_rate"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(n_sess)
    for d, r in out.items():
        assert r.n_sessions == n_sess[d]
        assert r.n_bounces == n_bounce[d]
        assert abs(r.bounce_rate - round(n_bounce[d] / n_sess[d], 4)) < 1e-9


def test_neighbor_mode_majority_and_ties(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    orders = {
        r.o_orderkey: r.o_custkey
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    seg = {
        r.c_custkey: r.c_mktsegment
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    neighbors = defaultdict(set)
    for r in li:
        neighbors[r.l_suppkey].add(orders[r.l_orderkey])
    expected = {}
    for s, custs in neighbors.items():
        votes = Counter(seg[c] for c in custs)
        # ties: smallest segment string wins
        top = max(votes.values())
        winner = min(k for k, v in votes.items() if v == top)
        expected[s] = (winner, top)
    got = {
        r.s_suppkey: (r.assigned_segment, r.votes)
        for r in REGISTRY["graph_neighbor_mode"].fn(spark, SF_DIR).collect()
    }
    assert got == expected
