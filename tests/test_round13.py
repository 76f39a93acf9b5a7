"""Invariant tests for the round-5 eighth batch (queries/round13.py):
every operator is replayed in plain Python against its definition.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from itertools import combinations

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()


def test_basket_lift_matches_replay(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    supp = Counter()
    supp_ab = Counter()
    for parts in baskets.values():
        for p in parts:
            supp[p] += 1
        for a, b in combinations(sorted(parts), 2):
            supp_ab[(a, b)] += 1
    n = len(baskets)
    out = {
        (r.p1, r.p2): r
        for r in REGISTRY["orders_basket_lift"].fn(spark, SF_DIR).collect()
    }
    expected = {k for k, v in supp_ab.items() if v >= 2}
    assert set(out) == expected
    assert expected, "degenerate: no repeated pairs at this sf"
    for (a, b), r in out.items():
        assert r.supp_ab == supp_ab[(a, b)]
        assert r.supp_a == supp[a] and r.supp_b == supp[b]
        assert abs(r.conf_a_to_b - round(supp_ab[(a, b)] / supp[a], 6)) < 1e-9
        assert abs(r.conf_b_to_a - round(supp_ab[(a, b)] / supp[b], 6)) < 1e-9
        lift = supp_ab[(a, b)] * n / (supp[a] * supp[b])
        assert abs(r.lift - round(lift, 6)) < 1e-6
        # confidence bounds
        assert 0 < r.conf_a_to_b <= 1 and 0 < r.conf_b_to_a <= 1


def test_jaccard_neighbors_matches_replay(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    orders = {
        r.o_orderkey: r.o_custkey
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    nbrs = defaultdict(set)  # supplier -> customer set
    for r in li:
        nbrs[r.l_suppkey].add(orders[r.l_orderkey])
    sims = defaultdict(list)
    supps = sorted(nbrs)
    for a, b in combinations(supps, 2):
        inter = len(nbrs[a] & nbrs[b])
        if inter == 0:
            continue
        j = round(inter / len(nbrs[a] | nbrs[b]), 6)
        sims[a].append((j, b))
        sims[b].append((j, a))
    expected = {}
    for s, lst in sims.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        for rank, (j, nbr) in enumerate(lst[:3], start=1):
            expected[(s, rank)] = (nbr, j)
    got = {
        (r.supp, r.rank): (r.nbr, r.jaccard)
        for r in REGISTRY["graph_jaccard_neighbors"].fn(spark, SF_DIR).collect()
    }
    assert got == expected
    assert expected, "degenerate: no co-customer supplier pairs"


def test_jaccard_topk_window_is_group_limited(spark):
    """The r13 adjudication kept the row_number window top-k (over the
    collect_list agg) BECAUSE WindowGroupLimit bounds per-group state
    to k rows — pin that the optimization actually fires, and that the
    exchange-fused plan didn't reintroduce a pre-pair shuffle pair."""
    df = REGISTRY["graph_jaccard_neighbors"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:3000]
