"""Invariant tests for round56 (approx twins, bigram LM, CUSUM,
weighted systematic sample, Theil–Sen)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from fractions import Fraction

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


# ------------------------------------------ approx column profile


def test_profile_approx_plan_has_no_expand(spark):
    """The whole point of the twin: approx_count_distinct is a plain
    declarative aggregate, so Catalyst must NOT plan the Expand-based
    multi-distinct rewrite that replicates the fact scan ~6x."""
    df = _q("profile_orders_approx")(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, plan[:3000]


def test_profile_exact_no_expand_after_unpivot(spark):
    """r13: the exact profile switched from the multi-distinct Expand
    shape to the melt/unpivot shape (cold-measured faster 5/5 at
    sf0.1 — see analytics._profile_table). One distinct per group is
    planned as a plain two-stage aggregate: no Expand anywhere."""
    df = _q("profile_orders")(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, plan[:3000]


def test_profile_approx_matches_exact_within_tolerance(spark):
    exact = {
        r.col_name: r for r in _q("profile_orders")(spark, SF_DIR).collect()
    }
    approx = {
        r.col_name: r
        for r in _q("profile_orders_approx")(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for col, e in exact.items():
        a = approx[col]
        # nulls/min/max are exact aggregates in both forms
        assert a.n_nulls == e.n_nulls
        assert a.min_str == e.min_str
        assert a.max_str == e.max_str
        # HLL default rsd = 0.05 -> 15% is a generous 3-sigma band
        assert a.n_distinct_approx == pytest.approx(e.n_distinct, rel=0.15)


# ------------------------------------ approx ship-delay percentiles


def test_ship_delay_approx_matches_exact_within_band(spark):
    exact = {
        r.nationkey: r
        for r in _q("lineitem_ship_delay_percentiles")(spark, SF_DIR).collect()
    }
    approx = {
        r.nationkey: r
        for r in _q("lineitem_ship_delay_percentiles_approx")(
            spark, SF_DIR
        ).collect()
    }
    assert set(exact) == set(approx)
    for k, e in exact.items():
        a = approx[k]
        assert a.n_items == e.n_items
        assert a.max_days == e.max_days
        # with accuracy=10000 and n_items << 10000 the sketch is exact
        # up to the rank convention; allow one day of slack
        assert abs(a.p50_days_approx - e.p50_days) <= 1
        assert abs(a.p95_days_approx - e.p95_days) <= 1


# ------------------------------------------ bigram LM perplexity


def _py_bigram_heldout_replay(spark):
    import hashlib

    docs = (
        read_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    )
    per_doc = {}
    is_train = {}
    for r in docs:
        toks = [t for t in r.text.lower().split(" ") if t]
        per_doc[r.doc_id] = list(zip(toks, toks[1:]))
        is_train[r.doc_id] = (
            hashlib.md5(str(r.doc_id).encode()).hexdigest()[:2] < "cc"
        )
    c12 = Counter(
        bg for d, bgs in per_doc.items() if is_train[d] for bg in bgs
    )
    c1 = Counter()
    for (w1, _), n in c12.items():
        c1[w1] += n
    v = len({w for bg in c12 for w in bg})
    out = {}
    for d, bgs in per_doc.items():
        if is_train[d] or not bgs:
            continue
        s = up = uc = 0
        for bg in bgs:
            n12 = c12.get(bg, 0)
            n1 = c1.get(bg[0], 0)
            up += n12 == 0
            uc += n1 == 0
            s += math.floor(-math.log((n12 + 1) / (n1 + v)) * 1e9)
        out[d] = (len(bgs), up, uc, s // len(bgs))
    return out


def test_bigram_lm_heldout_matches_python_replay(spark):
    expected = _py_bigram_heldout_replay(spark)
    got = {
        r.doc_id: (r.n_bigrams, r.n_unseen_pairs, r.n_unseen_ctx, r.ce_micro)
        for r in _q("text_bigram_lm_heldout")(spark, SF_DIR).collect()
    }
    assert set(got) == set(expected)
    assert got  # the held-out split is non-empty
    for d, (nb, up, uc, ce) in expected.items():
        assert got[d][:3] == (nb, up, uc), d
        # java Math.log vs libm may differ by 1 ulp per distinct ln
        # input: allow 2 micro-nats on the per-doc mean
        assert abs(got[d][3] - ce) <= 2, d


def test_bigram_lm_heldout_scores_only_heldout_docs(spark):
    import hashlib

    rows = _q("text_bigram_lm_heldout")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert (
            hashlib.md5(str(r.doc_id).encode()).hexdigest()[:2] >= "cc"
        ), "train doc leaked into the held-out scoring"
        assert r.ce_micro > 0
        assert 0 <= r.n_unseen_pairs <= r.n_bigrams
        assert 0 <= r.n_unseen_ctx <= r.n_unseen_pairs
        # ce bounded by ln of the largest smoothed denominator
        assert r.ce_micro < 20_000_000_000


# ------------------------------------------ CUSUM change-point


def test_cusum_matches_integer_replay(spark):
    o = read_table(spark, SF_DIR, "orders").collect()
    daily = defaultdict(int)
    for r in o:
        daily[r.o_orderdate.date()] += round(r.o_totalprice * 100)
    days = sorted(daily)
    n = len(days)
    tot = sum(daily.values())
    pfx = 0
    scored = []
    for i, d in enumerate(days, start=1):
        pfx += daily[d]
        scored.append((d, i, n * pfx - i * tot))
    top = sorted(scored, key=lambda t: (-abs(t[2]), t[0]))[:5]
    got = _q("orders_cusum_changepoint")(spark, SF_DIR).collect()
    assert len(got) == 5
    for row, (d, i, c) in zip(got, top):
        assert row.day == d
        assert row.day_idx == i
        assert int(row.cusum_scaled) == c
        assert row.n_days == n


# ------------------------------------- weighted systematic sample


def test_weighted_systematic_matches_replay_and_is_exact(spark):
    import hashlib

    o = read_table(spark, SF_DIR, "orders").collect()
    rows = sorted(
        (
            (
                hashlib.md5(str(r.o_orderkey).encode()).hexdigest(),
                r.o_orderkey,
                round(r.o_totalprice * 100),
            )
            for r in o
        ),
    )
    tot = sum(w for _, _, w in rows)
    step = tot // 200
    cum = 0
    expected = {}
    for _, k, w in rows:
        cum += w
        hits = cum // step - (cum - w) // step
        if hits > 0:
            expected[k] = (w, cum, hits)
    got = {
        r.o_orderkey: (r.w_cents, r.cum_cents, r.n_hits)
        for r in _q("sample_weighted_systematic")(spark, SF_DIR).collect()
    }
    assert got == expected
    # fixed-size property: total hits == number of step multiples in
    # (0, tot]
    assert sum(h for _, _, h in got.values()) == tot // step


# ------------------------------------------ Theil–Sen robust slope


def test_theil_sen_matches_fraction_replay(spark):
    li = read_table(spark, SF_DIR, "lineitem").collect()
    cells = Counter(
        (round(r.l_discount * 100), int(r.l_quantity)) for r in li
    )
    items = list(cells.items())
    mass = defaultdict(int)
    n_pairs = 0
    for (xa, ya), na in items:
        for (xb, yb), nb in items:
            if xa < xb:
                mass[Fraction(yb - ya, xb - xa)] += na * nb
                n_pairs += 1
    total = sum(mass.values())

    def wq(num, den):
        cm = 0
        for s in sorted(mass):
            cm += mass[s]
            if den * cm >= num * total:
                return float(s)
        raise AssertionError("unreachable")

    r = _q("lineitem_theil_sen")(spark, SF_DIR).collect()[0]
    assert r.n_cells == len(cells)
    assert r.n_cell_pairs == n_pairs
    assert int(r.m_total) == total
    assert r.slope_p25 == pytest.approx(wq(1, 4), abs=1e-6)
    assert r.slope_median == pytest.approx(wq(1, 2), abs=1e-6)
    assert r.slope_p75 == pytest.approx(wq(3, 4), abs=1e-6)
    assert r.slope_p25 <= r.slope_median <= r.slope_p75


def test_theil_sen_plan_is_broadcast_cell_cross(spark):
    """The pair join must be the broadcast cell-frame cross, never a
    fact-level CartesianProduct."""
    df = _q("lineitem_theil_sen")(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
