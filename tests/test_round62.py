"""Invariant tests for round62 (Good–Turing, effective dim, jackknife,
LSH silhouette, ROC-AUC, Hill tail index) — independent Python replays
at sf0.001."""

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


# -------------------------------------------------- Good–Turing


def test_good_turing_matches_replay(spark):
    docs = read_table(spark, SF_DIR, "documents").select("text").collect()
    freq = Counter()
    for r in docs:
        w = r.text.split(" ")
        for i in range(len(w) - 2):
            freq[" ".join(w[i : i + 3])] += 1
    v = len(freq)
    n = sum(freq.values())
    n1 = sum(1 for c in freq.values() if c == 1)
    n2 = sum(1 for c in freq.values() if c == 2)
    out = _q("text_good_turing_mass")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.v_observed, r.n_total, r.n1, r.n2) == (v, n, n1, n2)
    assert abs(r.p0_good_turing - n1 / n) < 1e-5
    assert abs(r.chao1_richness - (v + n1 * (n1 - 1) / (2 * (n2 + 1)))) < 1e-3
    # unseen mass is a probability; Chao1 never shrinks the vocabulary
    assert 0.0 <= r.p0_good_turing <= 1.0
    assert r.chao1_richness >= v


# ----------------------------------------- effective dimensionality


def test_effective_dim_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "embeddings").select(
        "embedding"
    ).collect()
    vecs = [[float(x) for x in r.embedding] for r in rows]
    n, dim = len(vecs), len(vecs[0])
    var = []
    for j in range(dim):
        xs = [v[j] for v in vecs]
        var.append(
            round(
                sum(x * x for x in xs) / n - (sum(xs) / n) ** 2, 6
            )
        )
    tv = sum(var)
    ps = [v / tv for v in var]
    h = -sum(p * math.log(p) for p in ps)
    out = _q("embedding_effective_dim")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r.dim == dim
    assert abs(r.total_var - tv) < 1e-4
    assert abs(r.eff_dim - math.exp(h)) < 1e-3
    assert r.top_dim == var.index(max(var))
    assert abs(r.top_share - max(var) / tv) < 1e-5
    # effective dimensionality is bounded by the ambient dimension,
    # and exp(H) >= 1 always
    assert 1.0 <= r.eff_dim <= dim + 1e-9
    assert r.top_share >= 1.0 / dim - 1e-9


# ------------------------------------------------ jackknife SE


def test_jackknife_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "orders").select(
        "o_orderdate", "o_totalprice"
    ).collect()
    groups = defaultdict(lambda: [0, 0])
    for r in rows:
        g = r.o_orderdate.year * 100 + r.o_orderdate.month
        groups[g][0] += 1
        groups[g][1] += int(round(r.o_totalprice * 100))
    big_g = len(groups)
    n = sum(c for c, _ in groups.values())
    s = sum(t for _, t in groups.values())
    loos = [
        (s - sg) / (100.0 * (n - ng)) for ng, sg in groups.values()
    ]
    mbar = sum(loos) / big_g
    se = math.sqrt(
        (big_g - 1) / big_g * sum((x - mbar) ** 2 for x in loos)
    )
    out = _q("orders_jackknife_mean_se")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_groups == big_g
    assert abs(r.mean_price - s / (100.0 * n)) < 1e-3
    assert abs(r.jackknife_se - se) < 1e-4
    assert r.jackknife_se >= 0


# ------------------------------------------------- LSH silhouette


def test_silhouette_matches_replay(spark):
    from trackdechets_etl_spark.llm.similarity import hyperplane

    rows = read_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    planes = [hyperplane(p, 64) for p in range(4)]
    buckets = defaultdict(list)
    for r in rows:
        v = [float(x) for x in r.embedding]
        b = sum(
            2**p
            for p in range(4)
            if sum(x * w for x, w in zip(v, planes[p])) > 0
        )
        buckets[b].append(v)
    cents = {
        b: [round(sum(v[j] for v in vs) / len(vs), 6) for j in range(64)]
        for b, vs in buckets.items()
    }
    sil_by_bucket = defaultdict(list)
    for b, vs in buckets.items():
        for v in vs:
            d = {
                cb: math.sqrt(
                    sum((x - c) ** 2 for x, c in zip(v, cents[cb]))
                )
                for cb in cents
            }
            a = d[b]
            bb = min(dv for cb, dv in d.items() if cb != b)
            sil_by_bucket[b].append(
                0.0 if max(a, bb) == 0 else (bb - a) / max(a, bb)
            )
    out = {r.bucket: r for r in _q("sim_silhouette_lsh")(spark, SF_DIR).collect()}
    assert set(out) == set(buckets)
    for b, sils in sil_by_bucket.items():
        assert out[b].n_vecs == len(sils)
        assert abs(out[b].mean_silhouette - sum(sils) / len(sils)) < 1e-4
        # silhouette is bounded in [-1, 1]
        assert -1.0 <= out[b].mean_silhouette <= 1.0


# ------------------------------------------------------- ROC AUC


def test_roc_auc_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "lineitem").select(
        "l_discount", "l_returnflag"
    ).collect()
    pairs = [
        (int(round(r.l_discount * 100)), int(r.l_returnflag == "R"))
        for r in rows
    ]
    pos = [d for d, y in pairs if y]
    neg = [d for d, y in pairs if not y]
    # O(levels²) exact U via score-level counts
    cp, cn = Counter(pos), Counter(neg)
    twice_u = sum(
        cp[dp] * cn[dn] * (2 if dp > dn else (1 if dp == dn else 0))
        for dp in cp
        for dn in cn
    )
    auc = twice_u / (2.0 * len(pos) * len(neg))
    out = _q("lineitem_roc_auc_discount")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_pos, r.n_neg) == (len(pos), len(neg))
    assert abs(r.auc - auc) < 1e-5
    assert 0.0 <= r.auc <= 1.0
    # discount is independent of returnflag in the synthetic data —
    # AUC should be near chance, never degenerate
    assert 0.3 < r.auc < 0.7


# -------------------------------------------------- Hill tail index


def test_hill_tail_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    spend = Counter()
    for r in rows:
        spend[r.o_custkey] += int(round(r.o_totalprice * 100))
    top = sorted(spend.items(), key=lambda kv: (-kv[1], kv[0]))[:101]
    thr = min(s for _, s in top)
    sum_ln = sum(math.log(s / thr) for _, s in top)
    alpha = 100 / sum_ln
    out = _q("customer_spend_hill_tail")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r.k == 100
    assert abs(r.threshold_price - thr / 100.0) < 1e-2
    assert abs(r.alpha_hill - alpha) < 1e-4
    assert r.alpha_hill > 0
