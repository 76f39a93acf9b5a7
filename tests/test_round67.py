"""Invariant tests for round67 (Poisson GLM, retention halflife,
Burrows Delta, seasonality strength, PRF expansion, Chernoff bound) —
independent Python replays at sf0.001."""

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


# ---------------------------------------------- Poisson GLM (IRLS)


def test_poisson_glm_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "events").select("ts").collect()
    lv = Counter(r.ts.hour for r in rows)
    ys = dict(lv)
    b0 = math.log(sum(ys.values()) / len(ys))
    b1 = 0.0
    for _ in range(4):
        sw = swx = swxx = g0 = g1 = 0.0
        for h, y in ys.items():
            mu = math.exp(b0 + b1 * h)
            sw += mu
            swx += mu * h
            swxx += mu * h * h
            g0 += y - mu
            g1 += (y - mu) * h
        det = sw * swxx - swx * swx
        b0 += (swxx * g0 - swx * g1) / det
        b1 += (sw * g1 - swx * g0) / det
    out = _q("events_poisson_glm_irls")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_levels, r.n_events) == (len(ys), sum(ys.values()))
    assert abs(r.b0 - b0) < 1e-4
    assert abs(r.b1 - b1) < 1e-4
    assert abs(r.rate_at_h0 - math.exp(b0)) < 1e-2
    assert abs(r.rate_at_h23 - math.exp(b0 + 23 * b1)) < 1e-2
    # fitted rates are positive and near the hourly mean
    ybar = sum(ys.values()) / len(ys)
    assert 0.2 * ybar < r.rate_at_h0 < 5 * ybar


# ---------------------------------------------- retention halflife


def test_retention_halflife_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderdate"
    ).collect()
    cm = {
        (r.o_custkey, r.o_orderdate.year * 12 + r.o_orderdate.month)
        for r in rows
    }
    firsts = {}
    for c, m in cm:
        firsts[c] = min(firsts.get(c, m), m)
    mm = max(m for _, m in cm)
    sizes = Counter(firsts.values())
    pts = []
    for age in range(1, 13):
        den = sum(sz for fm, sz in sizes.items() if fm + age <= mm)
        num = sum(
            1 for c, m in cm if m - firsts[c] == age
        )
        if num > 0:
            pts.append((age, round(math.log(num / den) * 1e6)))
    k = len(pts)
    sx = sum(a for a, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(a * a for a, _ in pts)
    sxy = sum(a * y for a, y in pts)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx) / 1e6
    out = _q("orders_retention_halflife")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_ages == k
    assert abs(r.slope_per_month - slope) < 1e-5
    assert r.no_decay == int(slope >= 0)
    if slope < 0:
        assert abs(r.halflife_months - math.log(2) / (-slope)) < 1e-2
    else:
        assert r.halflife_months == 0.0


# --------------------------------------------------- Burrows Delta


def test_burrows_delta_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "documents").select(
        "source", "text"
    ).collect()
    tok = defaultdict(Counter)
    corpus = Counter()
    for r in rows:
        for w in r.text.split(" "):
            if w:
                tok[r.source][w] += 1
                corpus[w] += 1
    top = sorted(corpus, key=lambda w: (-corpus[w], w))[:50]
    totals = {s: sum(c.values()) for s, c in tok.items()}
    freq = {
        (s, w): tok[s].get(w, 0) / totals[s]
        for s in tok
        for w in top
    }
    ns = len(tok)
    stats = {}
    for w in top:
        fs = [freq[(s, w)] for s in tok]
        mu = round(sum(fs) / ns, 9)
        var = sum(f * f for f in fs) / ns - (sum(fs) / ns) ** 2
        sig = round(math.sqrt(max(var, 0.0)), 9)
        if sig > 0:
            stats[w] = (mu, sig)
    srcs = sorted(tok)
    deltas = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            zs = [
                abs(
                    (freq[(a, w)] - mu) / sig
                    - (freq[(b, w)] - mu) / sig
                )
                for w, (mu, sig) in stats.items()
            ]
            deltas[(a, b)] = round(sum(zs) / len(zs), 9)
    top20 = sorted(deltas.items(), key=lambda kv: (kv[1], kv[0]))[:20]
    out = _q("text_burrows_delta")(spark, SF_DIR).collect()
    assert len(out) == 20
    for r, ((a, b), dd) in zip(out, top20):
        assert (r.src_a, r.src_b) == (a, b)
        assert abs(r.delta - dd) < 1e-5
        assert r.delta >= 0


# ------------------------------------------- seasonality strength


def test_seasonality_strength_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "events").select("ts").collect()
    daily = Counter(r.ts.date() for r in rows)
    days = sorted(daily)
    trend = {}
    for d in days:
        nb = [daily[e] for e in days if abs((d - e).days) <= 3]
        trend[d] = sum(nb) / len(nb)
    det = {d: daily[d] - trend[d] for d in days}
    # Spark dayofweek: Sunday=1..Saturday=7; python weekday Mon=0
    dow = {d: (d.weekday() + 2 - 1) % 7 + 1 for d in days}
    seas = defaultdict(list)
    for d in days:
        seas[dow[d]].append(det[d])
    sv = {k: sum(v) / len(v) for k, v in seas.items()}
    rs = [det[d] - sv[dow[d]] for d in days]
    deseas = [daily[d] - sv[dow[d]] for d in days]
    dt = list(det.values())

    def var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    ss = max(0.0, 1 - var(rs) / var(dt))
    ts_ = max(0.0, 1 - var(rs) / var(deseas))
    out = _q("events_seasonality_strength")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_days == len(days)
    assert abs(r.seasonal_strength - ss) < 1e-4
    assert abs(r.trend_strength - ts_) < 1e-4
    assert 0.0 <= r.seasonal_strength <= 1.0
    assert 0.0 <= r.trend_strength <= 1.0


# ------------------------------------------------ PRF expansion


def test_prf_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).collect()
    tf = defaultdict(Counter)
    for r in rows:
        for t in r.text.split(" "):
            if t:
                tf[r.doc_id][t] += 1
    n_docs = len(rows)
    dl = {d: sum(c.values()) for d, c in tf.items()}
    avgdl = sum(dl.values()) / len(dl)
    k1, b = 1.2, 0.75

    def idf(term):
        df = sum(1 for c in tf.values() if term in c)
        return math.log(1 + (n_docs - df + 0.5) / (df + 0.5))

    def bm25(terms):
        scores = {}
        for d, c in tf.items():
            s = sum(
                idf(t)
                * c[t]
                * (1 + k1)
                / (c[t] + k1 * (1 - b + b * dl[d] / avgdl))
                for t in terms
                if t in c
            )
            if s > 0:
                scores[d] = round(s, 9)
        return scores

    q0 = ["join", "hash", "scan"]
    base = bm25(q0)
    fb = sorted(base, key=lambda d: (-base[d], d))[:10]
    fbset = set(fb)
    exp_scores = {}
    for d in fb:
        for t, c in tf[d].items():
            if t not in q0:
                exp_scores[t] = exp_scores.get(t, 0) + c
    tkey = {
        t: round(v * idf(t), 9) for t, v in exp_scores.items()
    }
    exp = sorted(tkey, key=lambda t: (-tkey[t], t))[:5]
    final = bm25(q0 + exp)
    top = sorted(final, key=lambda d: (-final[d], d))[:10]
    out = _q("sim_query_expansion_prf")(spark, SF_DIR).collect()
    assert [r.doc_id for r in out] == top
    for r in out:
        assert abs(r.score - final[r.doc_id]) < 1e-5
        assert r.newly_retrieved == int(r.doc_id not in fbset)
    # expansion must retrieve at least the original feedback core
    assert sum(1 - r.newly_retrieved for r in out) >= 1


# ------------------------------------------- peak-hour Chernoff


def test_chernoff_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "events").select("ts").collect()
    hh = Counter(r.ts.replace(minute=0, second=0, microsecond=0) for r in rows)
    n = len(hh)
    tot = sum(hh.values())
    k = max(hh.values())
    lam = tot / n
    lnb = -lam + k * (1 + math.log(lam) - math.log(k))
    out = _q("events_peak_hour_chernoff")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_hours, r.peak_count) == (n, k)
    assert abs(r.lambda_hourly - lam) < 1e-4
    assert abs(r.chernoff_log10_bound - lnb / math.log(10)) < 1e-3
    # the bound is a log10 probability upper bound for k > λ
    if k > lam * math.e:
        assert r.chernoff_log10_bound < 0
