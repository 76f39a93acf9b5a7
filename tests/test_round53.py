"""Invariant tests for round53: chi-squared independence, daily
cross-correlation."""

from __future__ import annotations

from collections import Counter
from datetime import timedelta

import numpy as np

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import all_queries
from tests.conftest import SF_DIR


def _q(name):
    return all_queries()[name].fn


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


def test_chi2_cross_multiplied_form_is_zero_under_independence():
    # the cross-multiplied per-cell algebra (the exact form both the
    # Spark plan and the oracle use) vanishes when O = R*C/N everywhere
    rows = []
    for rf, rn in [("A", 2), ("B", 3)]:
        for ls, cn in [("X", 4), ("Y", 1)]:
            rows += [(rf, ls)] * (rn * cn)
    cells = Counter(rows)
    rt = Counter(r for r, _ in rows)
    ct = Counter(c for _, c in rows)
    n = len(rows)
    chi2 = sum(
        (o * n - rt[rf] * ct[ls]) ** 2 / (n * rt[rf] * ct[ls])
        for (rf, ls), o in cells.items()
    )
    assert chi2 == 0.0


def test_xcorr_matches_numpy_replay(spark):
    rows = _q("events_cross_correlation")(spark, SF_DIR).collect()
    assert [r.lag for r in rows] == list(range(-3, 4))
    ev = (
        read_table(spark, SF_DIR, "events")
        .select("ts", "event_type")
        .collect()
    )
    daily: dict[str, Counter] = {"click": Counter(), "purchase": Counter()}
    for r in ev:
        if r.event_type in daily:
            daily[r.event_type][r.ts.date()] += 1
    for r in rows:
        pairs = [
            (daily["click"][d], daily["purchase"][d + timedelta(days=r.lag)])
            for d in daily["click"]
            if (d + timedelta(days=r.lag)) in daily["purchase"]
        ]
        assert r.n_days == len(pairs)
        x = np.array([p[0] for p in pairs], dtype=float)
        y = np.array([p[1] for p in pairs], dtype=float)
        want = float(np.corrcoef(x, y)[0, 1])
        assert abs(r.r_xcorr - want) < 1e-6
        assert -1.0 <= r.r_xcorr <= 1.0


def test_xcorr_lag_zero_covers_all_shared_days(spark):
    rows = {r.lag: r for r in _q("events_cross_correlation")(spark, SF_DIR).collect()}
    # lag 0 has at least as many overlapping days as any shifted lag
    assert all(rows[0].n_days >= rows[lag].n_days for lag in rows)
