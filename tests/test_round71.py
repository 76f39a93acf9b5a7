"""Invariant tests for round71 (class-balanced sample, hubness,
gamma fit, RDD, log-normal fit, degree power law) — independent
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


# ------------------------------------------- class-balanced sample


def test_class_balanced_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "label"
    ).collect()
    by_label = defaultdict(list)
    for r in rows:
        by_label[int(r.label)].append(r.vec_id)
    cap = min(len(v) for v in by_label.values())
    out = {r.label: r for r in _q("sample_class_balanced")(spark, SF_DIR).collect()}
    assert set(out) == set(by_label)
    for lab, ids in by_label.items():
        picked = sorted(
            ids,
            key=lambda i: (
                hashlib.md5(str(i).encode()).hexdigest(),
                i,
            ),
        )[:cap]
        r = out[lab]
        assert r.n_before == len(ids)
        assert r.n_after == cap
        assert r.sum_selected_ids == sum(picked)
    # perfectly balanced after the cap
    assert len({r.n_after for r in out.values()}) == 1


# --------------------------------------------------- hubness score


def test_hubness_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
    qs = [
        vid
        for vid in vecs
        if hashlib.md5(str(vid).encode()).hexdigest()[0] < "4"
    ]

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b)) / (
            math.sqrt(sum(x * x for x in a))
            * math.sqrt(sum(y * y for y in b))
        )

    occ = Counter()
    for qid in qs:
        qv = vecs[qid]
        top = sorted(
            (
                (-round(cos(qv, v), 9), cid)
                for cid, v in vecs.items()
                if cid != qid
            )
        )[:5]
        for _, cid in top:
            occ[cid] += 1
    np_ = len(vecs)
    s1 = sum(occ.values())
    s2 = sum(c * c for c in occ.values())
    s3 = sum(c**3 for c in occ.values())
    m = s1 / np_
    var = s2 / np_ - m * m
    skew = (s3 / np_ - 3 * m * var - m**3) / var**1.5
    out = _q("embedding_hubness_score")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_points, r.n_queries) == (np_, len(qs))
    assert r.max_k_occurrence == max(occ.values())
    assert abs(r.hubness_skew - skew) < 1e-4
    assert abs(r.antihub_share - (np_ - len(occ)) / np_) < 1e-5
    # every query contributes exactly k occurrences
    assert s1 == 5 * len(qs)


# --------------------------------------------- inter-order gamma


def test_gamma_fit_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    ).collect()
    by_c = defaultdict(list)
    for r in rows:
        by_c[r.o_custkey].append((r.o_orderdate, r.o_orderkey))
    gaps = []
    for c, ds in by_c.items():
        ds.sort()
        for (a, _), (b, _) in zip(ds, ds[1:]):
            g = (b - a).days
            if g >= 1:
                gaps.append(g)
    n = len(gaps)
    s1, s2 = sum(gaps), sum(g * g for g in gaps)
    mean = s1 / n
    var = (n * s2 - s1 * s1) / (n * (n - 1))
    out = _q("orders_interorder_gamma_fit")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_gaps == n
    assert abs(r.mean_days - mean) < 1e-3
    assert abs(r.gamma_shape - mean * mean / var) < 1e-4
    assert abs(r.gamma_rate - mean / var) < 1e-5
    # shape·scale = mean by construction
    assert abs(r.gamma_shape / r.gamma_rate - mean) < 1e-2


# ------------------------------------------------ RDD at discount 5


def test_rdd_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "lineitem").select(
        "l_discount", "l_extendedprice"
    ).collect()
    cells = defaultdict(lambda: [0, 0])
    for r in rows:
        dd = int(round(r.l_discount * 100))
        if dd in (2, 3, 4, 6, 7, 8):
            cells[dd][0] += 1
            cells[dd][1] += int(round(r.l_extendedprice * 100))

    def fit(dds):
        pts = [(dd - 5, cells[dd][1] / cells[dd][0]) for dd in dds]
        k = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
        return slope, (sy - slope * sx) / k

    sl, il = fit([2, 3, 4])
    sr, ir = fit([6, 7, 8])
    out = _q("lineitem_rdd_discount5")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_left == sum(cells[d][0] for d in (2, 3, 4))
    assert r.n_right == sum(cells[d][0] for d in (6, 7, 8))
    assert abs(r.left_at_cut - il / 100) < 1e-2
    assert abs(r.right_at_cut - ir / 100) < 1e-2
    assert abs(r.jump - (ir - il) / 100) < 1e-2
    assert abs(r.left_slope - sl / 100) < 1e-2
    assert abs(r.right_slope - sr / 100) < 1e-2
    # the jump decomposes exactly
    assert abs(r.jump - (r.right_at_cut - r.left_at_cut)) < 1e-2


# ------------------------------------------------ log-normal fit


def test_lognormal_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "orders").select(
        "o_totalprice"
    ).collect()
    xs = [
        round(math.log(int(round(r.o_totalprice * 100))) * 1e6)
        for r in rows
    ]
    n = len(xs)
    s1, s2 = sum(xs), sum(x * x for x in xs)
    mu = s1 / n / 1e6
    var = (n * s2 - s1 * s1) / (n * (n - 1)) / 1e12
    out = _q("orders_lognormal_fit")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_orders == n
    assert abs(r.mu_ln_cents - mu) < 1e-5
    assert abs(r.sigma_ln - math.sqrt(var)) < 1e-5
    assert abs(r.implied_median_price - math.exp(mu) / 100) < 1e-1
    assert abs(
        r.implied_mean_price - math.exp(mu + var / 2) / 100
    ) < 1e-1
    # log-normal mean exceeds median (right skew)
    assert r.implied_mean_price > r.implied_median_price


# ---------------------------------------------- degree power law


def test_powerlaw_matches_replay(spark):
    li = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_suppkey"
    ).collect()
    oc = {
        r.o_orderkey: r.o_custkey
        for r in read_table(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_custkey"
        ).collect()
    }
    deg = Counter()
    for c, s in {(oc[r.l_orderkey], r.l_suppkey) for r in li}:
        deg[c] += 1
    dist = Counter(deg.values())
    nt = sum(dist.values())
    xy = []
    for dg in dist:
        ge = sum(f for d2, f in dist.items() if d2 >= dg)
        xy.append(
            (
                round(math.log(dg) * 1e6),
                round(math.log(ge / nt) * 1e6),
            )
        )
    k = len(xy)
    sx = sum(x for x, _ in xy)
    sy = sum(y for _, y in xy)
    sxx = sum(x * x for x, _ in xy)
    sxy = sum(x * y for x, y in xy)
    syy = sum(y * y for _, y in xy)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    r2 = (k * sxy - sx * sy) ** 2 / (
        (k * sxx - sx * sx) * (k * syy - sy * sy)
    )
    out = _q("graph_degree_powerlaw")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_degree_values == k
    assert abs(r.ccdf_slope - slope) < 1e-4
    assert abs(r.alpha - (1 - slope)) < 1e-4
    assert abs(r.r2 - r2) < 1e-4
    # a CCDF slope is non-positive by construction
    assert r.ccdf_slope <= 0
