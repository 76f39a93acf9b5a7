"""Invariant tests for the round-5 fourth batch (queries/round9.py):
every operator is replayed in plain Python against its definition.
"""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import timedelta

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()


def test_attribution_matches_python_replay(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    first = defaultdict(int)
    last = defaultdict(int)
    linear = defaultdict(int)
    touches = defaultdict(int)
    for r in ev:
        if r.event_type != "purchase":
            continue
        window = [
            t
            for t in by_user[r.user_id]
            if t.event_type in ("click", "view", "signup")
            and t.ts < r.ts
            and t.ts >= r.ts - timedelta(days=7)
        ]
        if not window:
            continue
        n = len(window)
        ordered = sorted(window, key=lambda t: (t.ts, t.event_id))
        first[ordered[0].event_type] += 1
        last[ordered[-1].event_type] += 1
        for t in window:
            linear[t.event_type] += 1_000_000 // n
            touches[t.event_type] += 1
    out = {
        r.channel: r
        for r in REGISTRY["events_attribution"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(touches)
    for ch, row in out.items():
        assert row.first_touch == first[ch]
        assert row.last_touch == last[ch]
        assert row.linear_micro == linear[ch]
        assert row.touches == touches[ch]
    # linear micro-credit mass: each attributed conversion contributes
    # n * (1e6 // n) <= 1e6, so total mass never exceeds conversions*1e6
    assert sum(linear.values()) <= sum(first.values()) * 1_000_000


def test_khop_equals_python_bfs(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cust_of = {r.o_orderkey: r.o_custkey for r in orders}
    adj = defaultdict(set)
    for r in li:
        cu, su = cust_of[r.l_orderkey], r.l_suppkey + 1_000_000
        adj[cu].add(su)
        adj[su].add(cu)
    dist = {
        r.c_custkey: 0
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
        if r.c_custkey < 5
    }
    frontier = set(dist)
    for k in range(1, 4):
        nxt = set()
        for u in frontier:
            nxt |= adj[u]
        nxt -= set(dist)
        for v in nxt:
            dist[v] = k
        frontier = nxt
    got = {
        r.node: r.dist
        for r in REGISTRY["graph_khop_reach"].fn(spark, SF_DIR).collect()
    }
    assert got == dist
    assert 0 in set(dist.values()) and 1 in set(dist.values())


def test_linkage_score_replay(spark):
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    supp = spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect()
    expected = {}
    for c in cust:
        for s in supp:
            if c.c_nationkey != s.s_nationkey:
                continue
            score = (
                30 if c.c_custkey % 100 == s.s_suppkey % 100 else -10
            ) + (
                20
                if abs(
                    round(c.c_acctbal * 100) - round(s.s_acctbal * 100)
                )
                < 50_000
                else -5
            )
            if score >= 25:
                expected[(c.c_custkey, s.s_suppkey)] = score
    got = {
        (r.c_custkey, r.s_suppkey): r.score
        for r in REGISTRY["linkage_blocking_score"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got == expected
    assert expected, "degenerate: no candidate links at this sf"


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    )


def test_semantic_prune_statuses(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    by_label = defaultdict(list)
    for r in emb:
        by_label[r.label].append((r.vec_id, [float(x) for x in r.embedding]))
    status = {}
    for lbl, vecs in by_label.items():
        dims = len(vecs[0][1])
        cent = [
            round(sum(v[1][i] for v in vecs) / len(vecs), 4)
            for i in range(dims)
        ]
        cos_c = {vid: round(_cos(v, cent), 6) for vid, v in vecs}
        for vid, v in vecs:
            drop = any(
                round(_cos(v, w), 6) >= 0.35
                and (
                    cos_c[wid] > cos_c[vid]
                    or (cos_c[wid] == cos_c[vid] and wid < vid)
                )
                for wid, w in vecs
                if wid != vid
            )
            status[vid] = "drop" if drop else "keep"
    got = {
        r.vec_id: r.status
        for r in REGISTRY["dedup_semantic_prune"].fn(spark, SF_DIR).collect()
    }
    assert got == status
    # at most one member of any mutually-similar pair survives
    assert "drop" in set(status.values()) or len(set(status.values())) == 1


def test_seasonal_dow_flag_is_2_sigma(spark):
    rows = REGISTRY["events_seasonal_dow"].fn(spark, SF_DIR).collect()
    groups = defaultdict(list)
    for r in rows:
        groups[(r.event_type, r.dow)].append(r)
    for (typ, dow), rs in groups.items():
        xs = [r.cnt for r in rs]
        n = len(xs)
        for r in rs:
            if n < 3:
                assert not r.is_anomaly
                continue
            mu = sum(xs) / n
            var = sum((x - mu) ** 2 for x in xs) / (n - 1)
            expect = abs(r.cnt - mu) > 2 * math.sqrt(var) + 1e-12
            assert r.is_anomaly == expect, (typ, dow, r.day)
            assert abs(r.dow_mean - round(mu, 6)) < 1e-9


def test_backlog_aging_partitions_open_orders(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    asof = max(r.o_orderdate for r in orders).date()
    expected_n = defaultdict(int)
    expected_cents = defaultdict(int)
    for r in orders:
        if r.o_orderstatus != "O":
            continue
        age = (asof - r.o_orderdate.date()).days
        b = (
            "00-29"
            if age < 30
            else "30-59"
            if age < 60
            else "60-89"
            if age < 90
            else "90+"
        )
        expected_n[(b, r.o_orderpriority)] += 1
        expected_cents[(b, r.o_orderpriority)] += round(r.o_totalprice * 100)
    out = REGISTRY["orders_backlog_aging"].fn(spark, SF_DIR).collect()
    got_n = {(r.age_bucket, r.o_orderpriority): r.n_orders for r in out}
    got_c = {(r.age_bucket, r.o_orderpriority): r.value_cents for r in out}
    assert got_n == dict(expected_n)
    assert got_c == dict(expected_cents)
    assert sum(got_n.values()) == sum(
        1 for r in orders if r.o_orderstatus == "O"
    )
