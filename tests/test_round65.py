"""Invariant tests for round65 (rater kappa, median CI, Markov
held-out eval, IPW ATE, session Weibull, TTR curve) — independent
Python replays at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

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


# --------------------------------------------------- rater kappa


def test_kappa_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "documents").select(
        "text", "n_chars"
    ).collect()
    n11 = n10 = n01 = n00 = 0
    for r in rows:
        w = r.text.split(" ")
        ra = int(2 * len(set(w)) >= len(w))
        rb = int(r.n_chars >= 120)
        if ra and rb:
            n11 += 1
        elif ra:
            n10 += 1
        elif rb:
            n01 += 1
        else:
            n00 += 1
    n = n11 + n10 + n01 + n00
    po = (n11 + n00) / n
    pa, pb = (n11 + n10) / n, (n11 + n01) / n
    pe = pa * pb + (1 - pa) * (1 - pb)
    kappa = (po - pe) / (1 - pe)
    out = _q("text_rater_kappa")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n, r.n11, r.n10, r.n01, r.n00) == (n, n11, n10, n01, n00)
    assert abs(r.p_observed - po) < 1e-5
    assert abs(r.p_expected - pe) < 1e-5
    assert abs(r.kappa - kappa) < 1e-5
    # kappa never exceeds observed agreement's bound
    assert -1.0 <= r.kappa <= 1.0
    # both raters are non-degenerate on the fixture
    assert 0 < n11 + n10 < n and 0 < n11 + n01 < n


# ---------------------------------------------- median CI by ranks


def test_median_ci_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    ).collect()
    vals = sorted(
        (int(round(r.o_totalprice * 100)), r.o_orderkey) for r in rows
    )
    n = len(vals)
    z = 1.959963984540054
    lo = math.floor((n - z * math.sqrt(n)) / 2.0)
    hi = n + 1 - lo
    med = (vals[(n + 1) // 2 - 1][0] + vals[(n + 2) // 2 - 1][0]) / 200.0
    out = _q("orders_median_ci_ranks")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == n
    assert abs(r.median_price - med) < 1e-2
    assert abs(r.ci_lo - vals[lo - 1][0] / 100.0) < 1e-2
    assert abs(r.ci_hi - vals[hi - 1][0] / 100.0) < 1e-2
    # the CI brackets the median
    assert r.ci_lo <= r.median_price <= r.ci_hi


# ------------------------------------------- Markov held-out eval


def test_markov_heldout_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts", "event_id"
    ).collect()
    import datetime

    split = min(r.ts for r in rows).date() + datetime.timedelta(days=15)
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    train, test = Counter(), []
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (ts2, _, b) in zip(evs, evs[1:]):
            if ts2.date() < split:
                train[(a, b)] += 1
            else:
                test.append((a, b))
    modal = {}
    for p in {a for a, _ in train}:
        cands = [(c, b) for (a, b), c in train.items() if a == p]
        mc = max(c for c, _ in cands)
        modal[p] = min(b for c, b in cands if c == mc)
    per = defaultdict(lambda: [0, 0])
    for a, b in test:
        if a in modal:
            per[a][0] += 1
            per[a][1] += int(modal[a] == b)
    overall = sum(c for _, c in per.values()) / sum(
        n for n, _ in per.values()
    )
    out = {r.prev: r for r in _q("events_markov_heldout_acc")(spark, SF_DIR).collect()}
    assert set(out) == set(per)
    for p, (nt, nc) in per.items():
        r = out[p]
        assert (r.n_test, r.n_correct) == (nt, nc)
        assert abs(r.accuracy - nc / nt) < 1e-5
        assert abs(r.overall_accuracy - overall) < 1e-5
        assert 0.0 <= r.accuracy <= 1.0


# ------------------------------------------------------ IPW ATE


def test_ipw_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    per_cust = Counter(r.o_custkey for r in rows)
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for r in rows:
        s = min(per_cust[r.o_custkey] // 4, 4)
        cents = int(round(r.o_totalprice * 100))
        if r.o_custkey % 2 == 1:
            cells[s][0] += 1
            cells[s][2] += cents
        else:
            cells[s][1] += 1
            cells[s][3] += cents
    tn = cn = den = 0.0
    n_strata = 0
    for nt, nc, st, sc in cells.values():
        if nt > 0 and nc > 0:
            n_strata += 1
            tn += st * (nt + nc) / nt
            cn += sc * (nt + nc) / nc
            den += nt + nc
    mt, mc = tn / (100 * den), cn / (100 * den)
    out = _q("orders_ipw_ate")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_strata == n_strata
    assert abs(r.mean_treat_ipw - mt) < 1e-3
    assert abs(r.mean_ctrl_ipw - mc) < 1e-3
    assert abs(r.ate_ipw - (mt - mc)) < 1e-3
    # robustness: IPW and the stratified estimator agree in sign and
    # rough magnitude on the same strata
    strat = _q("orders_propensity_stratified_ate")(spark, SF_DIR).collect()
    ate_strat = strat[0].ate
    assert abs(r.ate_ipw - ate_strat) < max(
        50.0, 0.5 * abs(ate_strat) + 50.0
    )


# ------------------------------------------------ session Weibull


def test_weibull_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "events").select(
        "user_id", "ts"
    ).collect()
    by_user = defaultdict(list)
    for r in rows:
        # floor-divide microseconds like unix_micros div 1000000
        us = int(r.ts.timestamp() * 1_000_000)
        by_user[r.user_id].append(us // 1_000_000)
    durs = []
    for u, ss in by_user.items():
        ss.sort()
        start = prev = ss[0]
        sid = 1
        for s in ss[1:]:
            if s - prev > 1800:
                if prev - start >= 1:
                    durs.append((prev - start, u, sid))
                sid += 1
                start = s
            prev = s
        if prev - start >= 1:
            durs.append((prev - start, u, sid))
    durs.sort()
    n = len(durs)
    xs, ys = [], []
    for i, (d, _, _) in enumerate(durs, 1):
        f = (i - 0.3) / (n + 0.4)
        xs.append(round(math.log(d) * 1e6))
        ys.append(round(math.log(-math.log(1 - f)) * 1e6))
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    icept = (sy - slope * sx) / n
    scale = math.exp(-(icept / 1e6) / slope)
    out = _q("events_session_weibull")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_sessions == n
    assert abs(r.shape - slope) < 1e-3
    assert abs(r.scale_s - scale) / scale < 1e-3
    # Weibull shape and scale are strictly positive; fit is meaningful
    assert r.shape > 0 and r.scale_s > 0
    assert 0.0 <= r.r2 <= 1.0


# ------------------------------------------------ TTR-length curve


def test_ttr_curve_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "documents").select("text").collect()
    per = defaultdict(list)
    for r in rows:
        w = r.text.split(" ")
        per[min(len(w) // 10, 9)].append(len(set(w)) / len(w))
    out = {r.len_bucket: r for r in _q("text_ttr_length_curve")(spark, SF_DIR).collect()}
    assert set(out) == set(per)
    for b, ttrs in per.items():
        r = out[b]
        assert r.n_docs == len(ttrs)
        assert abs(r.mean_ttr - sum(ttrs) / len(ttrs)) < 1e-5
        assert 0.0 < r.mean_ttr <= 1.0
    # TTR declines with length (the mechanical bias the curve exposes)
    bs = sorted(per)
    assert out[bs[0]].mean_ttr > out[bs[-1]].mean_ttr
