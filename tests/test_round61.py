"""Invariant tests for round61 (SPRT, l-diversity, Heaps' law,
embedding isotropy, stratified ATE, Neyman allocation) — independent
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


# ------------------------------------------------------------- SPRT


def test_sprt_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "events").select(
        "ts", "event_type"
    ).collect()
    trials, conv = Counter(), Counter()
    for r in rows:
        d = r.ts.date()
        trials[d] += 1
        conv[d] += int(r.event_type == "purchase")
    l1 = math.log(0.25 / 0.20)
    l0 = math.log(0.75 / 0.80)
    bound = math.log(19.0)
    out = _q("events_sprt_ab")(spark, SF_DIR).collect()
    assert [r.day for r in out] == sorted(trials)
    ct = cc = 0
    for r in out:
        ct += trials[r.day]
        cc += conv[r.day]
        assert (r.cum_trials, r.cum_conv) == (ct, cc)
        llr = cc * l1 + (ct - cc) * l0
        assert abs(r.llr - llr) < 1e-5
        exp = (
            "accept_h1"
            if llr >= bound
            else ("accept_h0" if llr <= -bound else "continue")
        )
        assert r.decision == exp
    # cumulative counters are monotone
    assert all(
        a.cum_trials <= b.cum_trials and a.cum_conv <= b.cum_conv
        for a, b in zip(out, out[1:])
    )


# ------------------------------------------------------ l-diversity


def test_l_diversity_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    ).collect()
    groups = defaultdict(set)
    counts = Counter()
    for r in rows:
        key = (
            r.o_orderpriority,
            r.o_orderdate.year * 100 + r.o_orderdate.month,
        )
        cents = int(round(r.o_totalprice * 100))
        groups[key].add(min(cents // 5_000_000, 9))
        counts[key] += 1
    out = _q("dq_l_diversity")(spark, SF_DIR).collect()
    assert len(out) == len(groups)
    for r in out:
        key = (r.qi_priority, r.qi_month)
        assert r.n == counts[key]
        assert r.diversity == len(groups[key])
        # decile binning bounds diversity at 10
        assert 1 <= r.diversity <= 10
        assert r.violates_l == int(r.diversity < 4)


# ----------------------------------------------------- Heaps' law


def test_heaps_law_matches_replay(spark):
    docs = read_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).collect()
    mx = max(r.doc_id for r in docs)
    first_doc = {}
    tok_count = {}
    for r in docs:
        w = r.text.split(" ")
        if len(w) < 3:
            continue
        tok_count[r.doc_id] = len(w) - 2
        for i in range(len(w) - 2):
            g = " ".join(w[i : i + 3])
            if g not in first_doc or r.doc_id < first_doc[g]:
                first_doc[g] = r.doc_id
    pts = {}
    for k in (1, 2, 4, 8, 16):
        thr = mx * k // 16
        v = sum(1 for fd in first_doc.values() if fd <= thr)
        n = sum(c for d, c in tok_count.items() if d <= thr)
        pts[k] = (n, v)
    xs = [math.log(n) for n, _ in pts.values()]
    ys = [math.log(v) for _, v in pts.values()]
    m = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    out = {r.k: r for r in _q("text_heaps_law_fit")(spark, SF_DIR).collect()}
    assert set(out) == set(pts)
    for k, (n, v) in pts.items():
        assert (out[k].n_tokens, out[k].vocab) == (n, v)
        assert abs(out[k].beta - beta) < 1e-5
    # growth curves are monotone in the prefix grid
    ks = sorted(pts)
    assert all(pts[a][0] <= pts[b][0] for a, b in zip(ks, ks[1:]))
    assert all(pts[a][1] <= pts[b][1] for a, b in zip(ks, ks[1:]))
    # vocabulary growth is sub-linear-or-linear, and positive
    assert 0.0 < beta <= 1.0 + 1e-9


# ------------------------------------------------ embedding isotropy


def test_isotropy_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    vecs = [[float(x) for x in r.embedding] for r in rows]
    n, dim = len(vecs), len(vecs[0])
    cent = [
        round(sum(v[j] for v in vecs) / n, 6) for j in range(dim)
    ]
    m2 = sum(c * c for c in cent)
    norms = [sum(x * x for x in v) for v in vecs]
    dots = [sum(x * c for x, c in zip(v, cent)) for v in vecs]
    iso = m2 / (sum(norms) / n)
    mean_cos = sum(
        d / math.sqrt(n2 * m2) for d, n2 in zip(dots, norms)
    ) / n
    out = _q("embedding_isotropy_score")(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_vecs, r.dim) == (n, dim)
    assert abs(r.isotropy - iso) < 1e-5
    assert abs(r.mean_cos_centroid - mean_cos) < 1e-5
    # ||mean||² ≤ E||x||² (Jensen) → isotropy score in [0, 1]
    assert 0.0 <= r.isotropy <= 1.0
    assert -1.0 <= r.mean_cos_centroid <= 1.0


# -------------------------------------- propensity-stratified ATE


def test_stratified_ate_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    per_cust = Counter(r.o_custkey for r in rows)
    cells = defaultdict(lambda: [0, 0, 0, 0])  # nt, nc, st, sc
    for r in rows:
        s = min(per_cust[r.o_custkey] // 4, 4)
        cents = int(round(r.o_totalprice * 100))
        if r.o_custkey % 2 == 1:
            cells[s][0] += 1
            cells[s][2] += cents
        else:
            cells[s][1] += 1
            cells[s][3] += cents
    common = {
        s: c for s, c in cells.items() if c[0] > 0 and c[1] > 0
    }
    diffs = {
        s: c[2] / (100.0 * c[0]) - c[3] / (100.0 * c[1])
        for s, c in common.items()
    }
    wtot = sum(c[0] + c[1] for c in common.values())
    ate = (
        sum((c[0] + c[1]) * diffs[s] for s, c in common.items()) / wtot
    )
    out = _q("orders_propensity_stratified_ate")(spark, SF_DIR).collect()
    assert {r.stratum for r in out} == set(common)
    for r in out:
        c = common[r.stratum]
        assert (r.n_treat, r.n_ctrl) == (c[0], c[1])
        assert abs(r.diff - diffs[r.stratum]) < 1e-3
        assert abs(r.ate - ate) < 1e-3
        # every emitted stratum has common support by construction
        assert r.n_treat > 0 and r.n_ctrl > 0


# --------------------------------------------- Neyman allocation


def test_neyman_allocation_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    ).collect()
    strata = defaultdict(list)
    hashes = defaultdict(list)
    for r in rows:
        cents = int(round(r.l_extendedprice * 100))
        strata[r.l_returnflag].append(cents)
        h = hashlib.md5(
            f"{r.l_orderkey}_{r.l_linenumber}".encode()
        ).hexdigest()
        hashes[r.l_returnflag].append((h, cents))
    sigs = {}
    for s, cs in strata.items():
        n = len(cs)
        s1, s2 = sum(cs), sum(c * c for c in cs)
        sigs[s] = (n, math.sqrt(s2 / n - (s1 / n) ** 2))
    den = sum(n * sig for n, sig in sigs.values())
    out = {
        r.stratum: r
        for r in _q("sample_neyman_allocation")(spark, SF_DIR).collect()
    }
    assert set(out) == set(sigs)
    total_alloc = 0
    for s, (n, sig) in sigs.items():
        alloc = math.floor(600 * n * sig / den + 0.5)
        r = out[s]
        assert r.n_s == n
        assert abs(r.sigma - sig / 100.0) < 1e-3
        assert r.alloc == alloc
        total_alloc += alloc
        # exact replay of the deterministic md5-uniform filter
        t = math.floor(min(alloc / n, 1.0) * 4294967296.0)
        picked = [c for h, c in hashes[s] if int(h[:8], 16) < t]
        assert r.n_sampled == len(picked)
        if picked:
            assert abs(
                r.sample_mean - sum(picked) / (100.0 * len(picked))
            ) < 1e-3
    # rounding keeps the total within |strata| of the budget
    assert abs(total_alloc - 600) <= len(sigs)
    # Neyman dominance: higher n·σ never gets a smaller allocation
    ranked = sorted(sigs, key=lambda s: sigs[s][0] * sigs[s][1])
    allocs = [out[s].alloc for s in ranked]
    assert all(a <= b for a, b in zip(allocs, allocs[1:]))
