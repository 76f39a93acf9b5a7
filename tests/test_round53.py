"""Invariant tests for round53: chi-squared independence, Benford
first digit, HHI concentration."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import all_queries
from tests.conftest import SF_DIR


def _q(name):
    return all_queries()[name].fn


def _round_half_away(x: float) -> int:
    """Spark F.round / DuckDB round semantics (half away from zero),
    NOT Python's banker's rounding."""
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def test_chi2_matches_python_replay(spark):
    row = _q("lineitem_chi2_independence")(spark, SF_DIR).collect()[0]
    li = (
        read_table(spark, SF_DIR, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .collect()
    )
    cells = Counter((r.l_returnflag, r.l_linestatus) for r in li)
    rt = Counter(r.l_returnflag for r in li)
    ct = Counter(r.l_linestatus for r in li)
    n = len(li)
    chi2 = 0.0
    for (rf, ls), o in cells.items():
        e = rt[rf] * ct[ls] / n
        chi2 += (o - e) ** 2 / e
    assert row.n_rows == n
    assert row.n_cells == len(cells)
    assert row.dof == (len(rt) - 1) * (len(ct) - 1)
    assert abs(row.chi2 - chi2) < 1e-4
    assert row.chi2 >= 0.0


def test_benford_matches_python_replay(spark):
    rows = _q("orders_benford_first_digit")(spark, SF_DIR).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    orders = read_table(spark, SF_DIR, "orders").select("o_totalprice").collect()
    digits = Counter(
        int(str(_round_half_away(r.o_totalprice * 100))[0])
        for r in orders
        if _round_half_away(r.o_totalprice * 100) > 0
    )
    n = sum(digits.values())
    for r in rows:
        assert r.n_orders == digits.get(r.digit, 0)
        assert abs(r.obs_pct - digits.get(r.digit, 0) / n) < 1e-6
        want_b = math.log10(1 + 1 / r.digit)
        assert abs(r.benford_pct - want_b) < 1e-6
        assert abs(r.delta - (digits.get(r.digit, 0) / n - want_b)) < 1e-5
    # the pcts are a distribution
    assert abs(sum(r.obs_pct for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.benford_pct for r in rows) - 1.0) < 1e-4


def test_hhi_matches_python_replay(spark):
    rows = _q("supplier_hhi_concentration")(spark, SF_DIR).collect()
    li = (
        read_table(spark, SF_DIR, "lineitem")
        .select("l_suppkey", "l_extendedprice", "l_discount")
        .collect()
    )
    sup = {
        r.s_suppkey: r.s_nationkey
        for r in read_table(spark, SF_DIR, "supplier").collect()
    }
    nat = {
        r.n_nationkey: r.n_name
        for r in read_table(spark, SF_DIR, "nation").collect()
    }
    per_sup: Counter = Counter()
    for r in li:
        cents = _round_half_away(r.l_extendedprice * (1.0 - r.l_discount) * 100)
        per_sup[(sup[r.l_suppkey], r.l_suppkey)] += cents
    by_nation: dict[str, list[int]] = {}
    for (nk, sk), cents in per_sup.items():
        by_nation.setdefault(nat[nk], []).append(cents)
    assert {r.n_name for r in rows} == set(by_nation)
    for r in rows:
        cents = by_nation[r.n_name]
        total = sum(cents)
        assert r.n_suppliers == len(cents)
        assert r.total_cents == total
        want = 10000.0 * sum(c * c for c in cents) / (total * total)
        assert abs(r.hhi - want) < 1e-4
        # HHI bounds: 10000/n (perfectly even) .. 10000 (monopoly)
        assert 10000.0 / len(cents) - 1e-6 <= r.hhi <= 10000.0 + 1e-6


def test_hhi_monopoly_is_10000(spark):
    # a nation with one supplier must score exactly 10000
    rows = _q("supplier_hhi_concentration")(spark, SF_DIR).collect()
    for r in rows:
        if r.n_suppliers == 1:
            assert abs(r.hhi - 10000.0) < 1e-6
