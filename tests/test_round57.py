"""Invariant tests for round57 (repeated spans, Kruskal-Wallis,
multiple OLS, SCD2, recall curve, TWAP)."""

from __future__ import annotations

from collections import Counter, defaultdict

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


# ------------------------------------- repeated span coverage


def test_repeated_spans_match_python_replay(spark):
    docs = (
        read_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    )
    owners = defaultdict(set)
    spans = {}
    for r in docs:
        toks = [t for t in r.text.lower().split(" ") if t]
        sh = [tuple(toks[i : i + 8]) for i in range(len(toks) - 7)]
        spans[r.doc_id] = sh
        for s in sh:
            owners[s].add(r.doc_id)
    expected = {}
    for d, sh in spans.items():
        if not sh:
            continue
        dup = sum(1 for s in sh if len(owners[s]) > 1)
        expected[d] = (len(sh), dup, 1000 * dup // len(sh))
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_permille)
        for r in _q("text_repeated_span_coverage")(spark, SF_DIR).collect()
    }
    assert got == expected
    # fixture sanity: the synthetic corpus really does contain
    # cross-document repeated 8-gram spans (probed round 9)
    assert sum(v[1] for v in got.values()) > 0


# ------------------------------------------ Kruskal–Wallis H


def test_kruskal_wallis_matches_scipy_free_replay(spark):
    ev = read_table(spark, SF_DIR, "events").select(
        "event_type", "value"
    ).collect()
    groups = defaultdict(list)
    for r in ev:
        groups[r.event_type].append(round(r.value * 100))
    allv = sorted(v for vs in groups.values() for v in vs)
    n = len(allv)
    # average ranks with ties
    first = {}
    cnt = Counter(allv)
    cum = 0
    avgrank = {}
    for v in sorted(cnt):
        avgrank[v] = cum + (cnt[v] + 1) / 2
        cum += cnt[v]
    s = 0.0
    for t, vs in groups.items():
        rg = sum(avgrank[v] for v in vs)
        s += rg * rg / len(vs)
    h = 12.0 / (n * (n + 1)) * s - 3 * (n + 1)
    ties = sum(c**3 - c for c in cnt.values())
    h_adj = h / (1 - ties / (n**3 - n))
    row = _q("events_kruskal_wallis")(spark, SF_DIR).collect()[0]
    assert row.n_events == n
    for t in ("click", "error", "purchase", "signup", "view"):
        assert getattr(row, f"n_{t}") == len(groups[t])
    assert row.h_stat == pytest.approx(h, abs=1e-4)
    assert row.h_tie_adj == pytest.approx(h_adj, abs=1e-4)
    assert row.h_tie_adj >= row.h_stat  # correction shrinks denominator


# ------------------------------------------ two-regressor OLS


def test_multiple_ols_matches_numpy_lstsq(spark):
    li = read_table(spark, SF_DIR, "lineitem").select(
        "l_discount", "l_extendedprice", "l_quantity"
    ).collect()
    x1 = np.array([round(r.l_discount * 100) for r in li], dtype=float)
    x2 = np.array([round(r.l_extendedprice * 100) for r in li], dtype=float)
    y = np.array([float(r.l_quantity) for r in li])
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    pred = X @ beta
    r2 = 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    row = _q("lineitem_multiple_ols")(spark, SF_DIR).collect()[0]
    assert row.n_rows == len(li)
    assert row.beta0 == pytest.approx(beta[0], abs=1e-3)
    assert row.beta1_per_1000000 == pytest.approx(beta[1] * 1e6, rel=1e-3)
    assert row.beta2_per_1000000 == pytest.approx(beta[2] * 1e6, rel=1e-3)
    assert row.r2 == pytest.approx(r2, abs=1e-5)
    assert 0 <= row.r2 <= 1


# ------------------------------------------ SCD2 interval build


def test_scd2_intervals_partition_history(spark):
    rows = _q("orders_scd2_intervals")(spark, SF_DIR).collect()
    orders = read_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"
    ).collect()
    by_cust = defaultdict(list)
    for r in orders:
        by_cust[r.o_custkey].append(
            (r.o_orderdate.date(), r.o_orderkey, r.o_orderpriority)
        )
    n_orders_total = 0
    by_cust_rows = defaultdict(list)
    for r in rows:
        by_cust_rows[r.custkey].append(r)
        n_orders_total += r.n_orders
    assert n_orders_total == len(orders)
    for ck, hist in by_cust.items():
        hist.sort()
        # expected run-length encoding of the priority sequence
        runs = []
        for d, _, p in hist:
            if not runs or runs[-1][0] != p:
                runs.append([p, d, 1])
            else:
                runs[-1][2] += 1
        got = sorted(by_cust_rows[ck], key=lambda r: r.version_no)
        assert len(got) == len(runs), ck
        for i, (g, (p, d, n)) in enumerate(zip(got, runs), start=1):
            assert g.version_no == i
            assert g.prio == p
            assert g.valid_from == d
            assert g.n_orders == n
        # intervals chain: valid_to of version i == valid_from of i+1,
        # last interval open
        for a, b in zip(got, got[1:]):
            assert a.valid_to == b.valid_from
        assert got[-1].valid_to is None


# --------------------------------- LSH recall curve over n_planes


def test_recall_curve_monotone_candidates_and_bounds(spark):
    rows = {
        r.n_planes: r
        for r in _q("sim_recall_curve_nplanes")(spark, SF_DIR).collect()
    }
    assert set(rows) == {2, 4, 6, 8}
    # more planes -> finer buckets -> fewer candidates
    assert (
        rows[2].n_candidates
        >= rows[4].n_candidates
        >= rows[6].n_candidates
        >= rows[8].n_candidates
    )
    for r in rows.values():
        assert 0 <= r.n_hits <= 100
        assert r.recall_permille == r.n_hits * 1000 // 100
    # 2 planes = 4 buckets over the whole corpus: recall should be
    # high (most exact neighbors share the coarse bucket)
    assert rows[2].recall_permille >= rows[8].recall_permille


def test_recall_curve_nested_buckets_property(spark):
    """Plane p is bit p, so the P-plane bucket must equal the 8-plane
    bucket mod 2^P — pinned by recomputing bucket_expr at P=4."""
    from pyspark.sql import functions as F

    from trackdechets_etl_spark.llm.similarity import bucket_expr

    e = read_table(spark, SF_DIR, "embeddings").limit(50)
    chk = e.select(
        (bucket_expr(F.col("embedding"), 64, 8) % 16).alias("m"),
        bucket_expr(F.col("embedding"), 64, 4).alias("b4"),
    ).collect()
    assert chk
    for r in chk:
        assert r.m == r.b4


# ------------------------------------------ daily TWAP


def test_twap_matches_python_replay(spark):
    ev = read_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "value"
    ).collect()
    per_ud = defaultdict(list)
    for r in ev:
        us = int(r.ts.timestamp() * 1_000_000)
        per_ud[(r.user_id, r.ts.date())].append(
            (us, r.event_id, round(r.value * 100))
        )
    agg = defaultdict(lambda: [0, 0, 0])  # n, w, wv
    for (u, d), evs in per_ud.items():
        evs.sort()
        for (us, _, c), (us2, _, _) in zip(evs, evs[1:]):
            gap = us2 - us
            if gap > 0:
                a = agg[d]
                a[0] += 1
                a[1] += gap
                a[2] += c * gap
    got = {
        r.day: (r.n_intervals, r.total_gap_us, r.twap_cents_floor)
        for r in _q("events_twap_daily")(spark, SF_DIR).collect()
    }
    expected = {d: (n, w, wv // w) for d, (n, w, wv) in agg.items() if w > 0}
    assert got == expected
    # TWAP stays inside the observed value range
    for d, (_, _, t) in got.items():
        assert 0 <= t <= 49002


# ------------------------------------------ p-chart control limits


def test_pchart_matches_python_replay(spark):
    ev = read_table(spark, SF_DIR, "events").select(
        "ts", "event_type"
    ).collect()
    daily = defaultdict(lambda: [0, 0])
    for r in ev:
        a = daily[r.ts.date()]
        a[0] += 1
        a[1] += r.event_type == "error"
    N = sum(a[0] for a in daily.values())
    X = sum(a[1] for a in daily.values())
    got = {
        r.day: (r.n_events, r.n_errors, r.err_permille, r.out_of_control)
        for r in _q("events_pchart_control")(spark, SF_DIR).collect()
    }
    assert set(got) == set(daily)
    for d, (n, x) in daily.items():
        diff = n * X - x * N
        oob = int(float(diff) * float(diff) > float(9 * X * (N - X) * n))
        assert got[d] == (n, x, 1000 * x // n, oob), d
    # equivalent float form agrees: |p_d - pbar| > 3*sqrt(pbar(1-pbar)/n)
    import math

    pbar = X / N
    for d, (n, x) in daily.items():
        ref = int(abs(x / n - pbar) > 3 * math.sqrt(pbar * (1 - pbar) / n))
        assert got[d][3] == ref, d
