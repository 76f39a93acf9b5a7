"""Invariant tests for round58 (Jarque-Bera, Welch t, DiD, runs test,
span ladder)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
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


def test_jarque_bera_matches_numpy_moments(spark):
    q = np.array(
        [
            int(r.l_quantity)
            for r in read_table(spark, SF_DIR, "lineitem")
            .select("l_quantity")
            .collect()
        ],
        dtype=float,
    )
    n = len(q)
    mu = q.mean()
    m2 = ((q - mu) ** 2).mean()
    m3 = ((q - mu) ** 3).mean()
    m4 = ((q - mu) ** 4).mean()
    skew = m3 / m2**1.5
    exk = m4 / m2**2 - 3
    jb = n / 6 * (skew**2 + exk**2 / 4)
    row = _q("lineitem_jarque_bera")(spark, SF_DIR).collect()[0]
    assert row.n_rows == n
    assert row.mean_qty == pytest.approx(mu, abs=1e-5)
    assert row.skewness == pytest.approx(skew, abs=1e-5)
    assert row.excess_kurtosis == pytest.approx(exk, abs=1e-5)
    assert row.jb_stat == pytest.approx(jb, rel=1e-4)
    # uniform-ish 1..50 quantity: flat-topped -> strongly platykurtic
    assert row.excess_kurtosis < 0
    assert row.jb_stat > 0


def test_welch_ttest_matches_formula(spark):
    li = read_table(spark, SF_DIR, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    ).collect()
    a = [round(r.l_extendedprice * 100) for r in li if r.l_returnflag == "R"]
    b = [round(r.l_extendedprice * 100) for r in li if r.l_returnflag == "A"]
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    df = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    row = _q("lineitem_welch_ttest")(spark, SF_DIR).collect()[0]
    assert (row.n_a, row.n_b) == (na, nb)
    assert row.mean_cents_a == pytest.approx(ma, rel=1e-9)
    assert row.mean_cents_b == pytest.approx(mb, rel=1e-9)
    assert row.t_stat == pytest.approx(t, abs=1e-4)
    assert row.welch_df == pytest.approx(df, rel=1e-4)
    # Welch df is bounded by min(na,nb)-1 below and na+nb-2 above
    assert min(na, nb) - 1 <= row.welch_df <= na + nb - 2


def test_diff_in_diff_matches_replay(spark):
    seg = {
        r.c_custkey: r.c_mktsegment == "BUILDING"
        for r in read_table(spark, SF_DIR, "customer")
        .select("c_custkey", "c_mktsegment")
        .collect()
    }
    cells = defaultdict(lambda: [0, 0])
    for r in (
        read_table(spark, SF_DIR, "orders")
        .select("o_custkey", "o_orderdate", "o_totalprice")
        .collect()
    ):
        if r.o_custkey not in seg:
            continue
        tr = seg[r.o_custkey]
        po = r.o_orderdate.date().isoformat() >= "1998-01-01"
        c = cells[(tr, po)]
        c[0] += 1
        c[1] += round(r.o_totalprice * 100)
    row = _q("orders_diff_in_diff")(spark, SF_DIR).collect()[0]
    means = {}
    for (tr, po), (n, s) in cells.items():
        tag = f"{int(tr)}{int(po)}"
        assert getattr(row, f"n_{tag}") == n
        means[tag] = s / n
        assert getattr(row, f"mean_cents_{tag}") == pytest.approx(
            s / n, rel=1e-9
        )
    did = (means["11"] - means["10"]) - (means["01"] - means["00"])
    assert row.did_cents == pytest.approx(did, abs=1e-3)


def test_runs_test_matches_replay(spark):
    days = defaultdict(int)
    for r in read_table(spark, SF_DIR, "events").select("ts").collect():
        days[r.ts.date()] += 1
    n = len(days)
    tot = sum(days.values())
    seq = [int(n * days[d] > tot) for d in sorted(days)]
    n1 = sum(seq)
    n2 = n - n1
    runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    er = 2 * n1 * n2 / n + 1
    vr = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
    z = (runs - er) / math.sqrt(vr)
    row = _q("events_runs_test")(spark, SF_DIR).collect()[0]
    assert (row.n_days, row.n1, row.n2, row.n_runs) == (n, n1, n2, runs)
    assert row.expected_runs == pytest.approx(er, abs=1e-5)
    assert row.z_stat == pytest.approx(z, abs=1e-5)


def test_span_ladder_monotone_and_consistent_with_coverage(spark):
    rows = {
        r.span_n: r
        for r in _q("text_repeated_span_ladder")(spark, SF_DIR).collect()
    }
    assert set(rows) == {4, 8, 16, 32}
    # longer spans -> fewer positions and (weakly) fewer duplicated ones
    for a, b in ((4, 8), (8, 16), (16, 32)):
        assert rows[a].n_positions >= rows[b].n_positions
        assert rows[a].n_dup_positions >= rows[b].n_dup_positions
    # the n=8 rung must equal the corpus totals of the per-doc
    # text_repeated_span_coverage query
    cov = _q("text_repeated_span_coverage")(spark, SF_DIR).collect()
    assert rows[8].n_positions == sum(r.n_spans for r in cov)
    assert rows[8].n_dup_positions == sum(r.n_dup_spans for r in cov)
    for r in rows.values():
        assert 0 <= r.dup_permille <= 1000
        assert r.dup_permille == 1000 * r.n_dup_positions // r.n_positions
