"""Invariant tests for the round-5 fourteenth batch (round19.py):
decile migration replayed in plain Python against its definition.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()


def _ntile(ordered, n):
    size = len(ordered)
    base, extra = divmod(size, n)
    out = {}
    i = 0
    for tile in range(1, n + 1):
        cnt = base + (1 if tile <= extra else 0)
        for _ in range(cnt):
            if i < size:
                out[ordered[i]] = tile
                i += 1
    return out


def test_migration_matches_replay(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    rev = defaultdict(int)
    for r in orders:
        rev[(r.o_orderdate.year, r.o_custkey)] += round(r.o_totalprice * 100)
    by_year = defaultdict(dict)
    for (yr, cust), cents in rev.items():
        by_year[yr][cust] = cents
    deciles = {}
    for yr, custs in by_year.items():
        ordered = sorted(custs, key=lambda c: (-custs[c], c))
        for cust, d in _ntile(ordered, 10).items():
            deciles[(yr, cust)] = d
    max_yr = max(by_year)
    expected = Counter()
    for (yr, cust), d in deciles.items():
        if yr >= max_yr:
            continue
        to_d = deciles.get((yr + 1, cust), 0)
        expected[(yr, d, to_d)] += 1
    got = {
        (r.year, r.from_decile, r.to_decile): r.n_customers
        for r in REGISTRY["orders_customer_migration"].fn(spark, SF_DIR).collect()
    }
    assert got == dict(expected)
    # every (year, from_decile) row set partitions that year's decile
    per_from = Counter()
    for (yr, d, _t), n in got.items():
        per_from[(yr, d)] += n
    for (yr, d), n in per_from.items():
        assert n == sum(1 for k, dd in deciles.items() if k[0] == yr and dd == d)
