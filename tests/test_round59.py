"""Invariant tests for round59 (harmonic centrality, QTE)."""

from __future__ import annotations

from collections import defaultdict

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


def _edges(spark):
    li = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_suppkey"
    ).collect()
    orders = {
        r.o_orderkey: r.o_custkey
        for r in read_table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_custkey")
        .collect()
    }
    adj = defaultdict(set)
    for r in li:
        if r.l_orderkey in orders:
            c = orders[r.l_orderkey]
            s = r.l_suppkey + 1_000_000
            adj[c].add(s)
            adj[s].add(c)
    return adj


def test_harmonic_centrality_matches_bfs_replay(spark):
    adj = _edges(spark)
    deg = sorted(adj.items(), key=lambda kv: (-len(kv[1]), kv[0]))[:20]
    rows = {
        r.node_id: r
        for r in _q("graph_harmonic_centrality_top")(spark, SF_DIR).collect()
    }
    assert set(rows) == {s for s, _ in deg}
    for s, nbrs in deg:
        d1 = set(adj[s])
        d2 = {v for u in d1 for v in adj[u]} - d1 - {s}
        d3 = {v for u in d2 for v in adj[u]} - d1 - d2 - {s}
        r = rows[s]
        assert r.degree == len(adj[s])
        assert (r.n_hop1, r.n_hop2, r.n_hop3) == (len(d1), len(d2), len(d3))
        assert r.harmonic_x6 == 6 * len(d1) + 3 * len(d2) + 2 * len(d3)


def test_harmonic_centrality_bipartite_parity(spark):
    """The trade graph is bipartite: odd hops land on the other side,
    even hops back on the source's side."""
    rows = _q("graph_harmonic_centrality_top")(spark, SF_DIR).collect()
    assert len(rows) == 20
    adj = _edges(spark)
    for r in rows:
        is_supp = r.node_id >= 1_000_000
        d1 = adj[r.node_id]
        assert all((v >= 1_000_000) != is_supp for v in d1)


def test_qte_matches_quantile_replay(spark):
    ev = read_table(spark, SF_DIR, "events").select(
        "user_id", "value"
    ).collect()
    groups = {0: [], 1: []}
    for r in ev:
        groups[r.user_id % 2].append(round(r.value * 100))
    for g in groups.values():
        g.sort()

    def q(vals, p):
        # smallest value whose inclusive cum count reaches ceil(p*n/100)
        k = -(-p * len(vals) // 100)
        return vals[k - 1]

    rows = {r.p: r for r in _q("events_quantile_treatment_effect")(spark, SF_DIR).collect()}
    assert set(rows) == {25, 50, 75, 90}
    for p, r in rows.items():
        assert (r.n0, r.n1) == (len(groups[0]), len(groups[1]))
        assert r.q0_cents == q(groups[0], p), p
        assert r.q1_cents == q(groups[1], p), p
        assert r.qte_cents == r.q1_cents - r.q0_cents
    # quantiles are monotone in p within each cohort
    ps = sorted(rows)
    for a, b in zip(ps, ps[1:]):
        assert rows[a].q0_cents <= rows[b].q0_cents
        assert rows[a].q1_cents <= rows[b].q1_cents
