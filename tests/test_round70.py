"""Invariant tests for round70 (Kneser-Ney, DFT power, temperature
mixture, dedup savings, price dispersion, Simpson check) — independent
Python replays at sf0.001."""

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


# --------------------------------------------------- KN vs add-one


def test_kn_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).collect()
    train_bg, val_bg = [], []
    for r in rows:
        toks = [t for t in r.text.lower().split(" ") if t]
        is_train = (
            hashlib.md5(str(r.doc_id).encode()).hexdigest()[:2] < "cc"
        )
        for a, b in zip(toks, toks[1:]):
            (train_bg if is_train else val_bg).append((a, b))
    c12 = Counter(train_bg)
    c1, na = Counter(), Counter()
    for (a, b), c in c12.items():
        c1[a] += c
        na[a] += 1
    nb = Counter(b for _, b in c12)
    tt = len(c12)
    vocab = {t for ab in train_bg for t in ab}
    v = len(vocab)
    d = 0.75
    s_kn = s_a1 = 0
    for a, b in val_bg:
        pc = (nb.get(b, 0) + 1) / (tt + v)
        if a in c1:
            p_kn = (
                max(c12.get((a, b), 0) - d, 0.0) + d * na[a] * pc
            ) / c1[a]
        else:
            p_kn = pc
        p_a1 = (c12.get((a, b), 0) + 1) / (c1.get(a, 0) + v)
        s_kn += math.floor(-math.log(p_kn) * 1e9)
        s_a1 += math.floor(-math.log(p_a1) * 1e9)
    n = len(val_bg)
    out = _q("text_kn_vs_mle_heldout")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_bigrams == n
    assert r.ce_micro_addone == s_a1 // n
    assert r.ce_micro_kn == s_kn // n
    assert r.improvement_micro == s_a1 // n - s_kn // n
    # on this 31-word dense-vocab corpus add-one is near-optimal and
    # KN's rare-context advantage cannot appear — the comparison must
    # still be a sane cross-entropy pair (both within a nat)
    assert abs(r.improvement_micro) < 1_000_000_000
    assert r.ce_micro_kn > 0 and r.ce_micro_addone > 0


# ------------------------------------------------ DFT weekly power


def test_dft_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "events").select("ts").collect()
    daily = Counter(r.ts.date() for r in rows)
    days = sorted(daily)
    d0 = days[0]
    n = len(days)
    m = sum(daily.values()) / n
    out = {r.period_days: r for r in _q("events_dft_weekly_power")(spark, SF_DIR).collect()}
    assert set(out) == {7, 14, 30}
    for p in (7, 14, 30):
        a = sum(
            (daily[dd] - m)
            * math.cos(2 * math.pi * (dd - d0).days / p)
            for dd in days
        )
        b = sum(
            (daily[dd] - m)
            * math.sin(2 * math.pi * (dd - d0).days / p)
            for dd in days
        )
        ss = sum((daily[dd] - m) ** 2 for dd in days)
        share = 2 * (a * a + b * b) / (n * ss)
        r = out[p]
        assert r.n_days == n
        assert abs(r.variance_share - share) < 1e-4
        # a single harmonic explains at most all the variance
        assert 0.0 <= r.variance_share <= 1.0 + 1e-9


# ------------------------------------------- temperature mixture


def test_temperature_mixture_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "documents").select("lang").collect()
    cnt = Counter(r.lang for r in rows)
    out = defaultdict(dict)
    for r in _q("training_temperature_mixture")(spark, SF_DIR).collect():
        out[r.tau][r.lang] = r
    assert set(out) == {"0.3", "0.7", "1.0"}
    for tau_s in out:
        tau = float(tau_s)
        z = sum(n**tau for n in cnt.values())
        for lang, n in cnt.items():
            r = out[tau_s][lang]
            w = n**tau / z
            assert r.n_docs == n
            assert abs(r.weight - w) < 1e-5
            assert r.budget_of_100k == math.floor(w * 100_000 + 0.5)
        # budgets sum to ~100k (rounding slack ≤ #langs)
        tot = sum(r.budget_of_100k for r in out[tau_s].values())
        assert abs(tot - 100_000) <= len(cnt)
    # lower temperature flattens the mixture: max weight shrinks
    mx = {t: max(r.weight for r in out[t].values()) for t in out}
    assert mx["0.3"] <= mx["0.7"] <= mx["1.0"]


# ------------------------------------------------ dedup savings


def test_dedup_savings_consistency(spark):
    clusters = all_queries()["dedup_clusters"].fn(spark, SF_DIR).collect()
    toks = {
        r.doc_id: len(r.text.split(" "))
        for r in read_table(spark, SF_DIR, "documents").select(
            "doc_id", "text"
        ).collect()
    }
    per = defaultdict(lambda: [set(), 0, 0, 0])
    for r in clusters:
        a = per[r.cluster_size]
        a[0].add(r.cluster_id)
        a[1] += 1
        a[2] += toks[r.doc_id]
        if not r.is_canonical:
            a[3] += toks[r.doc_id]
    tot_tokens = sum(a[2] for a in per.values())
    tot_saved = sum(a[3] for a in per.values())
    out = {r.cluster_size: r for r in _q("dedup_token_savings")(spark, SF_DIR).collect()}
    assert set(out) == set(per)
    for sz, (cids, nd, tk, sv) in per.items():
        r = out[sz]
        assert (r.n_clusters, r.n_docs, r.tokens, r.tokens_saved) == (
            len(cids),
            nd,
            tk,
            sv,
        )
        assert abs(r.corpus_savings_share - tot_saved / tot_tokens) < 1e-5
        # a size-s cluster saves exactly (s-1)/s of its docs
        assert r.n_docs == sz * r.n_clusters
    # singleton clusters save nothing
    assert out[1].tokens_saved == 0


# ------------------------------------- price dispersion / nations


def test_price_dispersion_matches_replay(spark):
    li = read_table(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    ).collect()
    sn = {
        r.s_suppkey: r.s_nationkey
        for r in read_table(spark, SF_DIR, "supplier").select(
            "s_suppkey", "s_nationkey"
        ).collect()
    }
    pn = defaultdict(lambda: [0, 0])
    for r in li:
        k = (r.l_partkey, sn[r.l_suppkey])
        pn[k][0] += int(round(r.l_extendedprice * 100))
        pn[k][1] += int(round(r.l_quantity))
    prices = defaultdict(list)
    for (pk, _), (sp, sq) in pn.items():
        prices[pk].append(sp / sq)
    cvs = {}
    for pk, ps in prices.items():
        if len(ps) < 3:
            continue
        k = len(ps)
        m = sum(ps) / k
        var = max(sum(p * p for p in ps) / k - m * m, 0.0)
        cvs[pk] = (k, m, round(math.sqrt(var) / m, 9))
    mean_cv = sum(cv for _, _, cv in cvs.values()) / len(cvs)
    top = sorted(cvs, key=lambda pk: (-cvs[pk][2], pk))[:20]
    out = _q("part_price_dispersion_nations")(spark, SF_DIR).collect()
    assert [r.l_partkey for r in out] == top
    for r in out:
        k, m, cv = cvs[r.l_partkey]
        assert r.n_nations == k
        assert abs(r.mean_price - m / 100.0) < 1e-2
        assert abs(r.price_cv - cv) < 1e-5
        assert abs(r.corpus_mean_cv - mean_cv) < 1e-5
        assert r.price_cv >= 0


# ------------------------------------------- Simpson paradox check


def test_simpson_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "orders").select(
        "o_orderpriority", "o_custkey", "o_totalprice"
    ).collect()
    cents = [int(round(r.o_totalprice * 100)) for r in rows]
    nn, ss = len(cents), sum(cents)
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for r, c in zip(rows, cents):
        hi = int(c * nn > ss)
        a = cells[r.o_orderpriority]
        if r.o_custkey % 2 == 1:
            a[0] += 1
            a[2] += hi
        else:
            a[1] += 1
            a[3] += hi
    diffs = {
        s: ht / nt - hc / nc for s, (nt, nc, ht, hc) in cells.items()
    }
    od = sum(a[2] for a in cells.values()) / sum(
        a[0] for a in cells.values()
    ) - sum(a[3] for a in cells.values()) / sum(
        a[1] for a in cells.values()
    )
    n_pos = sum(1 for d in diffs.values() if d > 0)
    k = len(diffs)
    paradox = int(
        (od > 0 and 2 * n_pos < k) or (od <= 0 and 2 * n_pos > k)
    )
    out = {r.stratum: r for r in _q("orders_simpson_paradox_check")(spark, SF_DIR).collect()}
    assert set(out) == set(cells)
    for s, (nt, nc, ht, hc) in cells.items():
        r = out[s]
        assert (r.nt, r.nc) == (nt, nc)
        assert abs(r.rate_treat - ht / nt) < 1e-5
        assert abs(r.rate_ctrl - hc / nc) < 1e-5
        assert abs(r.diff - diffs[s]) < 1e-5
        assert abs(r.overall_diff - od) < 1e-5
        assert r.paradox_flag == paradox
