"""Invariant tests for round68 (two-way ANOVA, triplet eval, Croston,
rich club, Markov entropy rate, composite scorecard) — independent
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


# ------------------------------------------------- two-way ANOVA


def test_two_way_anova_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice"
    ).collect()
    cells = defaultdict(list)
    for r in rows:
        cells[(r.l_returnflag, r.l_linestatus)].append(
            int(round(r.l_extendedprice * 100))
        )
    all_y = [y for ys in cells.values() for y in ys]
    nt, st = len(all_y), sum(all_y)
    cm = st * st / nt
    sst = sum(y * y for y in all_y) - cm

    def group_ss(keyfn):
        g = defaultdict(lambda: [0, 0])
        for k, ys in cells.items():
            g[keyfn(k)][0] += len(ys)
            g[keyfn(k)][1] += sum(ys)
        return sum(s * s / n for n, s in g.values()) - cm, len(g)

    va, ka = group_ss(lambda k: k[0])
    vb, kb = group_ss(lambda k: k[1])
    vc = sum(
        sum(ys) ** 2 / len(ys) for ys in cells.values()
    ) - cm
    ss_ab = vc - va - vb
    ss_err = sst - vc
    ncells = len(cells)
    f_a = (va / (ka - 1)) / (ss_err / (nt - ncells))
    out = _q("lineitem_two_way_anova")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == nt
    assert abs(r.eta2_a - va / sst) < 1e-5
    assert abs(r.eta2_b - vb / sst) < 1e-5
    assert abs(r.eta2_interaction - ss_ab / sst) < 1e-4
    assert abs(r.eta2_error - ss_err / sst) < 1e-4
    assert abs(r.f_a - f_a) < 1e-3
    # η² shares sum to 1 and F ratios are non-negative
    assert abs(
        r.eta2_a + r.eta2_b + r.eta2_interaction + r.eta2_error - 1.0
    ) < 1e-4
    assert r.f_a >= 0 and r.f_b >= 0 and r.f_interaction >= 0


# ------------------------------------------------- triplet eval


def test_triplet_eval_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    by_label = defaultdict(list)
    for r in rows:
        h = hashlib.md5(str(r.vec_id).encode()).hexdigest()
        by_label[int(r.label)].append(
            (h, r.vec_id, [float(x) for x in r.embedding])
        )
    for lab in by_label:
        by_label[lab].sort()

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (
            math.sqrt(sum(x * x for x in a))
            * math.sqrt(sum(y * y for y in b))
        )

    per = defaultdict(list)
    for lab, vs in by_label.items():
        nlab = (lab + 1) % 10
        for i in range(len(vs) - 1):
            a = vs[i][2]
            p = vs[i + 1][2]
            if i < len(by_label[nlab]):
                n = by_label[nlab][i][2]
                per[lab].append(cos(a, p) - cos(a, n))
    out = {r.label: r for r in _q("embedding_triplet_eval")(spark, SF_DIR).collect()}
    assert set(out) == {lab for lab, ms in per.items() if ms}
    for lab, ms in per.items():
        if not ms:
            continue
        r = out[lab]
        assert r.n_triplets == len(ms)
        assert r.satisfied == sum(1 for m in ms if m > 0)
        assert abs(r.mean_margin - sum(ms) / len(ms)) < 1e-5
        assert abs(
            r.satisfied_rate - r.satisfied / r.n_triplets
        ) < 1e-6
        assert 0.0 <= r.satisfied_rate <= 1.0


# -------------------------------------------- Croston intermittent


def test_croston_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity"
    ).collect()
    import datetime

    pw = defaultdict(int)
    for r in rows:
        wk = r.l_shipdate - datetime.timedelta(
            days=r.l_shipdate.weekday()
        )
        pw[(r.l_partkey, wk)] += int(round(r.l_quantity))
    per = defaultdict(list)
    for (pk, wk), q in pw.items():
        per[pk].append((wk, q))
    recs = {}
    for pk, ws in per.items():
        ws.sort()
        if len(ws) < 2:
            continue
        gaps = [
            (b[0] - a[0]).days // 7 for a, b in zip(ws, ws[1:])
        ]
        zbar = sum(q for _, q in ws) / len(ws)
        ibar = sum(gaps) / len(gaps)
        recs[pk] = (len(ws), zbar, ibar, zbar / ibar)
    top = sorted(
        recs, key=lambda pk: (-round(recs[pk][3], 9), pk)
    )[:20]
    out = _q("part_croston_intermittent")(spark, SF_DIR).collect()
    assert [r.l_partkey for r in out] == top
    for r in out:
        nw, zb, ib, cr = recs[r.l_partkey]
        assert r.n_demand_weeks == nw
        assert abs(r.mean_demand - zb) < 1e-3
        assert abs(r.mean_interval_weeks - ib) < 1e-3
        assert abs(r.croston_rate - cr) < 1e-3
        # intermittency: intervals are at least one week
        assert r.mean_interval_weeks >= 1.0


# ------------------------------------------------------ rich club


def test_rich_club_matches_replay(spark):
    li = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_suppkey"
    ).collect()
    oc = {
        r.o_orderkey: r.o_custkey
        for r in read_table(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_custkey"
        ).collect()
    }
    e = {(oc[r.l_orderkey], r.l_suppkey) for r in li}
    dc, ds = Counter(), Counter()
    for c, s in e:
        dc[c] += 1
        ds[s] += 1
    topc = set(sorted(dc, key=lambda c: (-dc[c], c))[:20])
    tops = set(sorted(ds, key=lambda s: (-ds[s], s))[:20])
    mh = sum(1 for c, s in e if c in topc and s in tops)
    m = len(e)
    hub_d = mh / (len(topc) * len(tops))
    all_d = m / (len(dc) * len(ds))
    out = _q("graph_rich_club")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.m, r.mh) == (m, mh)
    assert (r.n_hub_cust, r.n_hub_supp) == (len(topc), len(tops))
    assert abs(r.hub_density - hub_d) < 1e-5
    assert abs(r.overall_density - all_d) < 1e-5
    assert abs(r.rich_club_ratio - hub_d / all_d) < 1e-3
    assert r.hub_density <= 1.0


# ------------------------------------------- Markov entropy rate


def test_markov_entropy_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts", "event_id"
    ).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    counts = Counter()
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            counts[(a, b)] += 1
    n = sum(counts.values())
    rowsum = Counter()
    for (a, _), c in counts.items():
        rowsum[a] += c
    h = sum(
        c / n * math.log(rowsum[a] / c) for (a, _), c in counts.items()
    )
    k = len(rowsum)
    out = _q("events_markov_entropy_rate")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_transitions, r.n_states) == (n, k)
    assert abs(r.entropy_rate_nats - h) < 1e-5
    assert abs(r.max_entropy - math.log(k)) < 1e-5
    assert abs(r.predictability - (1 - h / math.log(k))) < 1e-5
    # conditional entropy can't exceed the uniform bound
    assert 0.0 <= r.entropy_rate_nats <= r.max_entropy + 1e-9


# ------------------------------------------- composite scorecard


def test_scorecard_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "lineitem").select(
        "l_suppkey", "l_quantity", "l_returnflag", "l_extendedprice"
    ).collect()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for r in rows:
        a = agg[r.l_suppkey]
        a[0] += int(round(r.l_quantity))
        a[1] += 1
        a[2] += int(r.l_returnflag == "R")
        a[3] += int(round(r.l_extendedprice * 100))
    m = {
        k: (vol, ret / n, rev / (100.0 * vol))
        for k, (vol, n, ret, rev) in agg.items()
    }
    vlo = min(v for v, _, _ in m.values())
    vhi = max(v for v, _, _ in m.values())
    rlo = min(r_ for _, r_, _ in m.values())
    rhi = max(r_ for _, r_, _ in m.values())
    plo = min(p for _, _, p in m.values())
    phi = max(p for _, _, p in m.values())

    def norm(x, lo, hi):
        return (x - lo) / (hi - lo) if hi > lo else 0.5

    scores = {
        k: 0.4 * norm(v, vlo, vhi)
        + 0.4 * (1 - norm(r_, rlo, rhi))
        + 0.2 * (1 - norm(p, plo, phi))
        for k, (v, r_, p) in m.items()
    }
    top = sorted(scores, key=lambda k: (-round(scores[k], 9), k))[:20]
    out = _q("supplier_composite_scorecard")(spark, SF_DIR).collect()
    assert [r.l_suppkey for r in out] == top
    for r in out:
        v, rr, p = m[r.l_suppkey]
        assert r.volume == v
        assert abs(r.return_rate - rr) < 1e-5
        assert abs(r.avg_unit_price - p) < 1e-3
        assert abs(r.score - scores[r.l_suppkey]) < 1e-5
        assert 0.0 <= r.score <= 1.0
