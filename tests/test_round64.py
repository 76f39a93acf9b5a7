"""Invariant tests for round64 (bucket-label eval, decision stump,
EB shrinkage, Shapley attribution, price indices, modularity) —
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


# --------------------------------------- bucket-majority label eval


def test_bucket_label_eval_matches_replay(spark):
    from trackdechets_etl_spark.llm.similarity import hyperplane

    rows = read_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding", "label"
    ).collect()
    planes = [hyperplane(p, 64) for p in range(4)]
    recs = []
    for r in rows:
        v = [float(x) for x in r.embedding]
        b = sum(
            2**p
            for p in range(4)
            if sum(x * w for x, w in zip(v, planes[p])) > 0
        )
        recs.append((b, int(r.label)))
    bl = Counter(recs)
    modal = {}
    for b in {b for b, _ in recs}:
        cands = [(c, lab) for (bb, lab), c in bl.items() if bb == b]
        modal[b] = max(cands, key=lambda cl: (cl[0], -cl[1]))[1]
    conf = Counter((lab, modal[b]) for b, lab in recs)
    n_total = sum(conf.values())
    acc = sum(c for (t, p), c in conf.items() if t == p) / n_total
    out = {r.label: r for r in _q("embedding_bucket_label_eval")(spark, SF_DIR).collect()}
    labels = {t for t, _ in conf} | {p for _, p in conf}
    assert set(out) == labels
    for lab in labels:
        tp = conf.get((lab, lab), 0)
        n_true = sum(c for (t, _), c in conf.items() if t == lab)
        n_pred = sum(c for (_, p), c in conf.items() if p == lab)
        r = out[lab]
        assert (r.n_true, r.tp, r.fp, r.fn) == (
            n_true,
            tp,
            n_pred - tp,
            n_true - tp,
        )
        if n_pred:
            assert abs(r.precision - tp / n_pred) < 1e-5
        if n_true:
            assert abs(r.recall - tp / n_true) < 1e-5
        assert abs(r.accuracy - acc) < 1e-5
        assert 0.0 <= r.f1 <= 1.0
    # accuracy must be a proper average of per-class recalls' weights
    assert 0.0 <= acc <= 1.0


# ------------------------------------------------- decision stump


def test_decision_stump_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "lineitem").select(
        "l_discount", "l_returnflag"
    ).collect()
    lv = defaultdict(lambda: [0, 0])
    for r in rows:
        d = int(round(r.l_discount * 100))
        lv[d][0] += 1
        lv[d][1] += int(r.l_returnflag == "R")
    n_all = sum(n for n, _ in lv.values())
    ginis = {}
    for t in sorted(lv):
        if t == min(lv):
            continue
        nl = sum(n for d, (n, _) in lv.items() if d < t)
        yl = sum(y for d, (_, y) in lv.items() if d < t)
        nr, yr = n_all - nl, sum(y for _, y in lv.values()) - yl
        ginis[t] = (
            2.0
            * (yl * (nl - yl) / nl + yr * (nr - yr) / nr)
            / n_all,
            nl,
            nr,
        )
    best_g = min(round(g, 9) for g, _, _ in ginis.values())
    best_t = min(
        t for t, (g, _, _) in ginis.items() if round(g, 9) == best_g
    )
    out = {r.thr: r for r in _q("lineitem_decision_stump")(spark, SF_DIR).collect()}
    assert set(out) == set(ginis)
    for t, (g, nl, nr) in ginis.items():
        r = out[t]
        assert (r.n_left, r.n_right) == (nl, nr)
        assert abs(r.gini_split - g) < 1e-5
        assert r.is_best == int(t == best_t)
        # binary Gini impurity is bounded by 0.5
        assert 0.0 <= r.gini_split <= 0.5
    assert sum(r.is_best for r in out.values()) == 1


# ---------------------------------------------- EB shrinkage


def test_eb_shrinkage_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "lineitem").select(
        "l_suppkey", "l_returnflag"
    ).collect()
    s = defaultdict(lambda: [0, 0])
    for r in rows:
        s[r.l_suppkey][0] += 1
        s[r.l_suppkey][1] += int(r.l_returnflag == "R")
    k = len(s)
    sn = sum(n for n, _ in s.values())
    sy = sum(y for _, y in s.values())
    m = sy / sn
    devs = [y / n - m for n, y in s.values()]
    v = (sum(d * d for d in devs) - sum(devs) ** 2 / k) / (k - 1)
    big_m = max(m * (1 - m) / v - 1.0, 1.0)
    shrunk = {
        kk: (y + m * big_m) / (n + big_m) for kk, (n, y) in s.items()
    }
    top = sorted(s, key=lambda kk: (-round(shrunk[kk], 9), kk))[:20]
    out = _q("supplier_eb_shrinkage")(spark, SF_DIR).collect()
    assert [r.l_suppkey for r in out] == top
    for r in out:
        n, y = s[r.l_suppkey]
        assert (r.n, r.y) == (n, y)
        assert abs(r.raw_rate - y / n) < 1e-5
        assert abs(r.shrunk_rate - shrunk[r.l_suppkey]) < 1e-5
        assert abs(r.prior_mean - m) < 1e-5
        assert abs(r.prior_strength - big_m) < 1e-2
        # shrinkage pulls toward the prior: shrunk lies between raw and m
        lo, hi = sorted((y / n, m))
        assert lo - 1e-9 <= r.shrunk_rate <= hi + 1e-9


# ------------------------------------------- Shapley attribution


def test_shapley_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts", "event_id"
    ).collect()
    by_user = defaultdict(list)
    pc = Counter()
    for r in rows:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
        if r.event_type == "purchase":
            pc[r.user_id] += 1
    bits = {"view": 1, "click": 2, "signup": 4, "error": 8}
    co = defaultdict(lambda: [0, 0])
    for u, evs in by_user.items():
        first5 = sorted(evs)[:5]
        mask = 0
        for _, _, t in first5:
            mask |= bits.get(t, 0)
        co[mask][0] += 1
        co[mask][1] += int(pc.get(u, 0) >= 14)
    v = {
        mk: (co[mk][1] / co[mk][0] if mk in co and co[mk][0] else 0.0)
        for mk in range(16)
    }
    wnum = [6, 2, 2, 6]
    phis = {}
    for name, b in bits.items():
        phi = 0.0
        for mk in range(16):
            if mk & b:
                continue
            size = bin(mk).count("1")
            phi += wnum[size] * (v[mk + b] - v[mk]) / 24.0
        phis[name] = phi
    out = {r.channel: r for r in _q("events_shapley_attribution")(spark, SF_DIR).collect()}
    assert set(out) == set(bits)
    for name, phi in phis.items():
        assert abs(out[name].phi - phi) < 1e-5
        assert abs(out[name].v_empty - v[0]) < 1e-5
        assert abs(out[name].v_full - v[15]) < 1e-5
    # Shapley efficiency: Σφ = v(full) − v(empty)
    assert abs(sum(phis.values()) - (v[15] - v[0])) < 1e-9


# ------------------------------------------------- price indices


def test_price_index_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_quantity"
    ).collect()
    py = defaultdict(lambda: [0, 0])
    for r in rows:
        yr = r.l_shipdate.year
        py[(r.l_partkey, yr)][0] += int(round(r.l_extendedprice * 100))
        py[(r.l_partkey, yr)][1] += int(round(r.l_quantity))
    byr = min(yr for _, yr in py)
    base = {
        pk: (sp / sq, sq)
        for (pk, yr), (sp, sq) in py.items()
        if yr == byr
    }
    out = {r.yr: r for r in _q("part_price_index")(spark, SF_DIR).collect()}
    years = {yr for _, yr in py}
    for yr in years:
        num_l = den_l = num_p = den_p = 0.0
        n_parts = 0
        for (pk, y), (sp, sq) in py.items():
            if y != yr or pk not in base:
                continue
            p0, q0 = base[pk]
            pt, qt = sp / sq, sq
            n_parts += 1
            num_l += pt * q0
            den_l += p0 * q0
            num_p += pt * qt
            den_p += p0 * qt
        r = out[yr]
        assert r.n_parts == n_parts
        assert abs(r.laspeyres - num_l / den_l) < 1e-4
        assert abs(r.paasche - num_p / den_p) < 1e-4
        assert abs(
            r.fisher - math.sqrt((num_l / den_l) * (num_p / den_p))
        ) < 1e-4
    # the base year indexes to exactly 1
    assert abs(out[byr].laspeyres - 1.0) < 1e-9
    assert abs(out[byr].paasche - 1.0) < 1e-9
    # Fisher lies between Laspeyres and Paasche (geometric mean)
    for r in out.values():
        lo, hi = sorted((r.laspeyres, r.paasche))
        assert lo - 1e-6 <= r.fisher <= hi + 1e-6


# --------------------------------------------- nation modularity


def test_modularity_matches_replay(spark):
    li = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_suppkey"
    ).collect()
    orders = {
        r.o_orderkey: r.o_custkey
        for r in read_table(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_custkey"
        ).collect()
    }
    cn = {
        r.c_custkey: r.c_nationkey
        for r in read_table(spark, SF_DIR, "customer").select(
            "c_custkey", "c_nationkey"
        ).collect()
    }
    sn = {
        r.s_suppkey: r.s_nationkey
        for r in read_table(spark, SF_DIR, "supplier").select(
            "s_suppkey", "s_nationkey"
        ).collect()
    }
    edges = {
        (orders[r.l_orderkey], r.l_suppkey)
        for r in li
        if r.l_orderkey in orders
    }
    m = len(edges)
    e_in = Counter()
    d_c = Counter()
    for c, s in edges:
        if cn[c] == sn[s]:
            e_in[cn[c]] += 1
        d_c[cn[c]] += 1
        d_c[sn[s]] += 1
    q_terms = {
        nat: e_in.get(nat, 0) / m - (d / (2 * m)) ** 2
        for nat, d in d_c.items()
    }
    q_total = sum(q_terms.values())
    out = {r.nation: r for r in _q("graph_modularity_nation")(spark, SF_DIR).collect()}
    assert set(out) == set(d_c)
    for nat, r in out.items():
        assert r.e_in == e_in.get(nat, 0)
        assert r.d_c == d_c[nat]
        assert abs(r.q_term - q_terms[nat]) < 1e-5
        assert abs(r.modularity - q_total) < 1e-5
    # modularity is bounded in [-1, 1]
    assert -1.0 <= q_total <= 1.0
