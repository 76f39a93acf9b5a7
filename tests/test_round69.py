"""Invariant tests for round69 (IVF recall curve, newsvendor, PACF,
Wasserstein drift, AR(1) backtest, tokenizer fertility) — independent
Python replays at sf0.001."""

from __future__ import annotations

import datetime
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


# --------------------------------------------- IVF recall curve


def test_ivf_recall_curve_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    vecs = {
        r.vec_id: (int(r.label), [float(x) for x in r.embedding])
        for r in rows
    }
    by_label = defaultdict(list)
    for vid, (lab, v) in vecs.items():
        by_label[lab].append(v)
    cents = {
        lab: [
            round(sum(v[j] for v in vs) / len(vs), 4)
            for j in range(64)
        ]
        for lab, vs in by_label.items()
    }

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b)) / (
            math.sqrt(sum(x * x for x in a))
            * math.sqrt(sum(y * y for y in b))
        )

    queries = {vid: v for vid, (_, v) in vecs.items() if vid < 10}
    exact = {}
    for qid, qv in queries.items():
        sc = sorted(
            (
                (-round(cos(qv, v), 9), cid)
                for cid, (_, v) in vecs.items()
                if cid != qid
            )
        )[:5]
        exact[qid] = {cid for _, cid in sc}
    out = {r.nprobe: r for r in _q("sim_ivf_recall_curve")(spark, SF_DIR).collect()}
    assert set(out) == {1, 2, 4}
    prev = -1.0
    for np_ in (1, 2, 4):
        hits = 0
        for qid, qv in queries.items():
            ranked_lists = sorted(
                (
                    (-round(cos(qv, cv), 9), lab)
                    for lab, cv in cents.items()
                )
            )[:np_]
            lists = {lab for _, lab in ranked_lists}
            sc = sorted(
                (
                    (-round(cos(qv, v), 9), cid)
                    for cid, (lab, v) in vecs.items()
                    if cid != qid and lab in lists
                )
            )[:5]
            hits += len({cid for _, cid in sc} & exact[qid])
        r = out[np_]
        assert r.n_queries == len(queries)
        assert r.n_hits == hits
        assert abs(r.recall_at_5 - hits / (len(queries) * 5)) < 1e-6
        # recall is monotone non-decreasing in nprobe
        assert r.recall_at_5 >= prev - 1e-9
        prev = r.recall_at_5
    # full probe of every list would be exact — recall must be
    # meaningful (> 0) even at nprobe=1
    assert out[1].recall_at_5 > 0


# ------------------------------------------------ newsvendor stock


def test_newsvendor_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "orders").select(
        "o_orderpriority", "o_orderdate"
    ).collect()
    daily = Counter((r.o_orderpriority, r.o_orderdate) for r in rows)
    per = defaultdict(list)
    for (p, _), c in daily.items():
        per[p].append(c)
    out = {r.o_orderpriority: r for r in _q("orders_newsvendor_stock")(spark, SF_DIR).collect()}
    assert set(out) == set(per)
    for p, cs in per.items():
        cs.sort()
        n = len(cs)
        stock = next(
            c
            for i, c in enumerate(cs, 1)
            if i * 10 >= 8 * n and (i == n or cs[i] != c or True)
        )
        # exact: smallest c with CDF >= 0.8
        cnt = Counter(cs)
        cum = 0
        for c in sorted(cnt):
            cum += cnt[c]
            if cum * 10 >= 8 * n:
                stock = c
                break
        over = sum(max(stock - c, 0) for c in cs)
        under = sum(max(c - stock, 0) for c in cs)
        r = out[p]
        assert r.stock == stock
        assert r.n_days == n
        assert abs(r.mean_overage - over / n) < 1e-3
        assert abs(r.mean_underage - under / n) < 1e-3
        # at the 0.8 critical ratio, most days are covered
        assert sum(1 for c in cs if c <= stock) * 10 >= 8 * n


# ------------------------------------------------------ PACF


def test_pacf_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "events").select("ts").collect()
    daily = Counter(r.ts.date() for r in rows)
    days = sorted(daily)
    n = len(days)
    m = sum(daily.values()) / n
    d = {dd: daily[dd] - m for dd in days}
    v0 = sum(x * x for x in d.values())
    r_ = {}
    for k in (1, 2, 3):
        r_[k] = sum(
            d[dd] * d[dd - datetime.timedelta(days=k)]
            for dd in days
            if dd - datetime.timedelta(days=k) in d
        ) / v0
    p22 = (r_[2] - r_[1] ** 2) / (1 - r_[1] ** 2)
    p21 = r_[1] * (1 - p22)
    p33 = (r_[3] - p21 * r_[2] - p22 * r_[1]) / (
        1 - p21 * r_[1] - p22 * r_[2]
    )
    out = _q("events_pacf_lags")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_days == n
    assert abs(r.acf1 - r_[1]) < 1e-4
    assert abs(r.acf2 - r_[2]) < 1e-4
    assert abs(r.acf3 - r_[3]) < 1e-4
    assert abs(r.pacf1 - r_[1]) < 1e-4
    assert abs(r.pacf2 - p22) < 1e-4
    assert abs(r.pacf3 - p33) < 1e-4
    # PACF(1) == ACF(1) by construction
    assert r.pacf1 == r.acf1


# -------------------------------------------- Wasserstein drift


def test_wasserstein_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "orders").select(
        "o_orderdate", "o_totalprice"
    ).collect()
    lo = min(r.o_orderdate for r in rows)
    hi = max(r.o_orderdate for r in rows)
    mid = lo + datetime.timedelta(days=(hi - lo).days // 2)
    na, nb = Counter(), Counter()
    for r in rows:
        b = min(int(round(r.o_totalprice * 100)) // 1_000_000, 49)
        (na if r.o_orderdate < mid else nb)[b] += 1
    ta, tb = sum(na.values()), sum(nb.values())
    bins = sorted(set(na) | set(nb))
    w1 = 0.0
    ks = 0.0
    ca = cb = 0
    for b in bins:
        ca += na.get(b, 0)
        cb += nb.get(b, 0)
        g = abs(ca / ta - cb / tb)
        w1 += g * (1_000_000 / 100.0)
        ks = max(ks, g)
    out = _q("orders_wasserstein_price_eras")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_bins == len(bins)
    assert abs(r.wasserstein_1 - w1) < 1e-2
    assert abs(r.ks_sup_gap - ks) < 1e-5
    # W1 >= KS·Δ (the sup is one term of the sum)
    assert r.wasserstein_1 >= r.ks_sup_gap * (1_000_000 / 100.0) - 1e-6


# ------------------------------------------------ AR(1) backtest


def test_ar1_backtest_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "orders").select(
        "o_orderdate", "o_totalprice"
    ).collect()
    daily = defaultdict(int)
    for r in rows:
        daily[r.o_orderdate] += int(round(r.o_totalprice * 100))
    days = sorted(daily)
    cut = days[0] + datetime.timedelta(
        days=int((days[-1] - days[0]).days * 0.8)
    )
    train = {d: v for d, v in daily.items() if d < cut}
    n, s = len(train), sum(train.values())
    m = s / n
    dtr = {d: v - m for d, v in train.items()}
    v0 = sum(x * x for x in dtr.values())
    num = sum(
        dtr[d] * dtr[d - datetime.timedelta(days=1)]
        for d in dtr
        if d - datetime.timedelta(days=1) in dtr
    )
    phi = num / v0
    test = [
        (d, v)
        for d, v in daily.items()
        if d >= cut and d - datetime.timedelta(days=1) in daily
    ]
    mae_ar1 = sum(
        abs(v - (m + phi * (daily[d - datetime.timedelta(days=1)] - m)))
        for d, v in test
    ) / len(test) / 100.0
    mae_naive = sum(
        abs(v - daily[d - datetime.timedelta(days=1)]) for d, v in test
    ) / len(test) / 100.0
    out = _q("orders_ar1_backtest")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_train_days, r.n_test_days) == (n, len(test))
    assert abs(r.phi - phi) < 1e-4
    assert abs(r.mae_ar1 - mae_ar1) < 1e-2
    assert abs(r.mae_naive - mae_naive) < 1e-2
    # |φ| < 1 for a stationary series
    assert abs(r.phi) < 1.0


# ------------------------------------------- tokenizer fertility


def test_fertility_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "documents").select(
        "lang", "text", "n_chars"
    ).collect()
    agg = defaultdict(lambda: [0, 0, 0])
    for r in rows:
        a = agg[r.lang]
        a[0] += 1
        a[1] += r.n_chars
        a[2] += len(r.text.split(" "))
    out = {r.lang: r for r in _q("text_tokenizer_fertility")(spark, SF_DIR).collect()}
    assert set(out) == set(agg)
    for lang, (nd, nc, nt) in agg.items():
        r = out[lang]
        assert (r.n_docs, r.total_chars, r.total_tokens) == (nd, nc, nt)
        assert abs(r.fertility_chars_per_tok - nc / nt) < 1e-3
        assert abs(r.mean_tokens_per_doc - nt / nd) < 1e-3
        # a whitespace token plus its separator is at least ~2 chars
        assert r.fertility_chars_per_tok > 1.0
