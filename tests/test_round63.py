"""Invariant tests for round63 (logistic IRLS, RRF hybrid, conformal
interval, k-fold CV, overdispersion, A/B power) — independent Python
replays at sf0.001."""

from __future__ import annotations

import hashlib
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


# ------------------------------------------------- logistic IRLS


def test_irls_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "lineitem").select(
        "l_discount", "l_returnflag"
    ).collect()
    lv = defaultdict(lambda: [0, 0])
    for r in rows:
        d = int(round(r.l_discount * 100))
        lv[d][0] += 1
        lv[d][1] += int(r.l_returnflag == "R")
    b0 = b1 = 0.0
    for _ in range(4):
        sw = swx = swxx = g0 = g1 = 0.0
        for d, (n, y) in lv.items():
            mu = 1.0 / (1.0 + math.exp(-(b0 + b1 * d)))
            w = n * mu * (1.0 - mu)
            sw += w
            swx += w * d
            swxx += w * d * d
            g0 += y - n * mu
            g1 += (y - n * mu) * d
        det = sw * swxx - swx * swx
        b0 += (swxx * g0 - swx * g1) / det
        b1 += (sw * g1 - swx * g0) / det
    out = _q("lineitem_logistic_irls")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_total == sum(n for n, _ in lv.values())
    assert r.n_pos == sum(y for _, y in lv.values())
    assert abs(r.b0 - b0) < 1e-4
    assert abs(r.b1 - b1) < 1e-4
    mu0 = 1.0 / (1.0 + math.exp(-b0))
    mu10 = 1.0 / (1.0 + math.exp(-(b0 + 10 * b1)))
    assert abs(r.mu_at_0 - mu0) < 1e-4
    assert abs(r.mu_at_10 - mu10) < 1e-4
    # fitted rates are probabilities near the empirical return rate
    emp = r.n_pos / r.n_total
    assert 0.0 < r.mu_at_0 < 1.0 and 0.0 < r.mu_at_10 < 1.0
    assert abs(r.mu_at_0 - emp) < 0.1 and abs(r.mu_at_10 - emp) < 0.1


# ---------------------------------------------------- RRF hybrid


def test_rrf_matches_replay(spark):
    docs = read_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).collect()
    tf = defaultdict(Counter)
    for r in docs:
        for t in r.text.split(" "):
            if t:
                tf[r.doc_id][t] += 1
    n_docs = len(docs)
    dl = {d: sum(c.values()) for d, c in tf.items()}
    avgdl = sum(dl.values()) / len(dl)
    terms = ["join", "hash", "scan"]
    idf = {}
    for t in terms:
        df = sum(1 for c in tf.values() if t in c)
        idf[t] = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    k1, b = 1.2, 0.75
    sp = {}
    for d, c in tf.items():
        s = sum(
            idf[t]
            * c[t]
            * (1 + k1)
            / (c[t] + k1 * (1 - b + b * dl[d] / avgdl))
            for t in terms
            if t in c
        )
        if s > 0:
            sp[d] = round(s, 9)
    sparse = sorted(sp, key=lambda d: (-sp[d], d))[:50]
    emb = read_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb}
    qv = vecs[0]
    qn = math.sqrt(sum(x * x for x in qv))
    cos = {
        vid: round(
            sum(a * c for a, c in zip(v, qv))
            / (math.sqrt(sum(a * a for a in v)) * qn),
            9,
        )
        for vid, v in vecs.items()
    }
    dense = sorted(cos, key=lambda d: (-cos[d], d))[:50]
    rrf = defaultdict(float)
    rank_s = {d: i + 1 for i, d in enumerate(sparse)}
    rank_d = {d: i + 1 for i, d in enumerate(dense)}
    for d, r in rank_s.items():
        rrf[d] += 1.0 / (60 + r)
    for d, r in rank_d.items():
        rrf[d] += 1.0 / (60 + r)
    top = sorted(rrf, key=lambda d: (-round(rrf[d], 9), d))[:20]
    out = _q("sim_rrf_hybrid")(spark, SF_DIR).collect()
    assert [r.doc_id for r in out] == top or {
        r.doc_id for r in out
    } == set(top)
    for r in out:
        assert r.rank_sparse == rank_s.get(r.doc_id, 0)
        assert r.rank_dense == rank_d.get(r.doc_id, 0)
        assert abs(r.rrf_score - rrf[r.doc_id]) < 1e-5
        # every fused doc appears in at least one list
        assert r.rank_sparse > 0 or r.rank_dense > 0
    # the query vector itself must top the dense list
    assert rank_d[0] == 1


# --------------------------------------------- conformal interval


def test_conformal_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    ).collect()
    cal, ev = [], []
    for r in rows:
        g = r.o_orderdate.year * 100 + r.o_orderdate.month
        cents = int(round(r.o_totalprice * 100))
        h = hashlib.md5(str(r.o_orderkey).encode()).hexdigest()
        (cal if h[0] < "8" else ev).append((r.o_orderkey, g, cents))
    sums = defaultdict(lambda: [0, 0])
    for _, g, c in cal:
        sums[g][0] += 1
        sums[g][1] += c
    model = {g: int(round(s / n)) for g, (n, s) in sums.items()}
    res = sorted(
        (abs(c - model[g]), k) for k, g, c in cal
    )
    n_cal = len(res)
    k = (9 * (n_cal + 1) + 9) // 10
    q = res[k - 1][0]
    evm = [(k_, g, c) for k_, g, c in ev if g in model]
    cov = sum(
        1 for _, g, c in evm if abs(c - model[g]) <= q
    ) / len(evm)
    out = _q("orders_conformal_interval")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_cal, r.n_eval) == (n_cal, len(evm))
    assert abs(r.q_hat - q / 100.0) < 1e-2
    assert abs(r.coverage - cov) < 1e-5
    assert r.target == 0.9
    # the conformal guarantee: coverage concentrates near the target
    assert 0.8 <= r.coverage <= 1.0


# ------------------------------------------------- k-fold CV RMSE


def test_kfold_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    ).collect()
    recs = []
    for r in rows:
        g = r.o_orderdate.year * 100 + r.o_orderdate.month
        cents = int(round(r.o_totalprice * 100))
        f = (
            int(
                hashlib.md5(str(r.o_orderkey).encode()).hexdigest()[:8],
                16,
            )
            % 5
        )
        recs.append((g, f, cents))
    cells = defaultdict(lambda: [0, 0])
    gtot = defaultdict(lambda: [0, 0])
    for g, f, c in recs:
        cells[(g, f)][0] += 1
        cells[(g, f)][1] += c
        gtot[g][0] += 1
        gtot[g][1] += c
    train = {}
    for (g, f), (n, s) in cells.items():
        ng, sg = gtot[g]
        if ng > n:
            train[(g, f)] = int(round((sg - s) / (ng - n)))
    ss = defaultdict(lambda: [0, 0])
    for g, f, c in recs:
        if (g, f) in train:
            ss[f][0] += 1
            ss[f][1] += (c - train[(g, f)]) ** 2
    overall = math.sqrt(
        sum(s for _, s in ss.values()) / sum(n for n, _ in ss.values())
    ) / 100.0
    out = {r.fold: r for r in _q("orders_kfold_cv_rmse")(spark, SF_DIR).collect()}
    assert set(out) == set(ss)
    for f, (n, s) in ss.items():
        assert out[f].n_eval == n
        assert abs(out[f].rmse - math.sqrt(s / n) / 100.0) < 1e-3
        assert abs(out[f].overall_rmse - overall) < 1e-3
        assert out[f].rmse > 0


# ---------------------------------------------- overdispersion


def test_overdispersion_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "events").select(
        "event_type", "ts"
    ).collect()
    daily = Counter((r.event_type, r.ts.date()) for r in rows)
    per = defaultdict(list)
    for (t, _), c in daily.items():
        per[t].append(c)
    out = {
        r.event_type: r
        for r in _q("events_overdispersion_index")(spark, SF_DIR).collect()
    }
    assert set(out) == set(per)
    for t, cs in per.items():
        n = len(cs)
        s1, s2 = sum(cs), sum(c * c for c in cs)
        disp = (n * s2 - s1 * s1) / ((n - 1) * s1)
        r = out[t]
        assert r.n_days == n
        assert abs(r.mean_daily - s1 / n) < 1e-3
        assert abs(r.dispersion - disp) < 1e-5
        assert r.overdispersed == int(disp > 1.5)
        assert r.dispersion > 0


# --------------------------------------------------- A/B power


def test_power_mde_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "events").select(
        "user_id", "event_type"
    ).collect()
    pc = Counter(
        r.user_id for r in rows if r.event_type == "purchase"
    )
    users = {r.user_id for r in rows}
    arms = defaultdict(lambda: [0, 0])
    for u in users:
        arms[u % 2][0] += 1
        arms[u % 2][1] += int(pc.get(u, 0) >= 14)
    (n0, c0), (n1, c1) = arms[0], arms[1]
    p0, p1 = c0 / n0, c1 / n1
    pbar = (c0 + c1) / (n0 + n1)
    mde = (1.959963984540054 + 0.8416212335729143) * math.sqrt(
        pbar * (1 - pbar) * (1 / n0 + 1 / n1)
    )
    out = _q("events_ab_power_mde")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_ctrl, r.n_treat, r.conv_ctrl, r.conv_treat) == (
        n0,
        n1,
        c0,
        c1,
    )
    assert abs(r.p_ctrl - p0) < 1e-5
    assert abs(r.p_treat - p1) < 1e-5
    assert abs(r.mde_abs - mde) < 1e-5
    # the ≥14-purchases conversion must be non-degenerate (the "any
    # purchase" definition collapsed to p̄=1 — the reframed fixture)
    assert 0.0 < pbar < 1.0
    assert r.mde_abs > 0
    assert abs(r.lift_over_mde - (p1 - p0) / mde) < 1e-3
