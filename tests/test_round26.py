"""Invariant tests for the round-5 twenty-first batch (round26.py):
HHI and discount uplift replayed in plain Python.
"""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()


def test_hhi_matches_replay_and_bounds(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    supp = {
        r.s_suppkey: r.s_nationkey
        for r in spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect()
    }
    nations = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    }
    cents = defaultdict(int)
    for r in li:
        cents[(supp[r.l_suppkey], r.l_suppkey)] += round(
            r.l_extendedprice * 100
        )
    by_nation = defaultdict(dict)
    for (nk, sk), c in cents.items():
        by_nation[nk][sk] = c
    out = {
        r.n_name: r
        for r in REGISTRY["supplier_share_hhi"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == {nations[nk] for nk in by_nation}
    for nk, supps in by_nation.items():
        tot = sum(supps.values())
        hhi = sum((c / tot) ** 2 for c in supps.values())
        r = out[nations[nk]]
        assert r.n_suppliers == len(supps)
        assert r.revenue_cents == tot
        assert abs(r.hhi - round(hhi, 6)) < 1e-6
        # HHI bounds: 1/n (perfect competition) ≤ HHI ≤ 1 (monopoly)
        assert 1 / len(supps) - 1e-9 <= r.hhi <= 1 + 1e-9
        assert abs(r.hhi_floor - round(1 / len(supps), 6)) < 1e-9


def test_discount_uplift_matches_replay(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    agg = defaultdict(lambda: [0, 0, 0])  # band -> [n, sum_qty, sum_cents]
    for r in li:
        b = round(r.l_discount * 100)
        a = agg[b]
        a[0] += 1
        a[1] += round(r.l_quantity)
        a[2] += round(r.l_extendedprice * 100)
    base_avg = agg[0][1] / agg[0][0]
    out = {
        r.disc_pct: r
        for r in REGISTRY["lineitem_discount_uplift"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(agg)
    for b, (n, sq, sc) in agg.items():
        r = out[b]
        assert r.n_items == n
        assert abs(r.avg_qty - round(sq / n, 6)) < 1e-9
        assert abs(r.avg_cents - round(sc / n, 6)) < 1e-9
        assert abs(r.qty_uplift - round((sq / n) / base_avg, 6)) < 1e-6
    assert abs(out[0].qty_uplift - 1.0) < 1e-9
