"""Invariant tests for the round-5 tenth batch (queries/round15.py):
every operator is replayed in plain Python against its definition.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()


def test_js_divergence_matches_replay_and_bounds(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    tok = [(r.source, w) for r in docs for w in r.text.split(" ")]
    cw = Counter(w for _s, w in tok)
    vocab = sorted(cw, key=lambda w: (-cw[w], w))[:200]
    vset = set(vocab)
    tv = [(s, w) for s, w in tok if w in vset]
    c_sw = Counter(tv)
    n_s = Counter(s for s, _w in tv)
    c_w = Counter(w for _s, w in tv)
    n_tot = len(tv)
    out = {
        r.source: r
        for r in REGISTRY["text_js_divergence"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(n_s)
    for s, r in out.items():
        assert r.n_tokens == n_s[s]
        js = 0.0
        for w in vocab:
            p = (c_sw[(s, w)] + 1) / (n_s[s] + 200)
            q = (c_w[w] + 1) / (n_tot + 200)
            m = (p + q) / 2
            js += 0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
        assert abs(r.js_divergence - round(js, 6)) < 1e-6, s
        # JS divergence is non-negative and bounded by ln 2
        assert -1e-9 <= r.js_divergence <= math.log(2) + 1e-9


def test_abc_class_matches_replay(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    rev = defaultdict(int)
    for r in li:
        rev[r.l_partkey] += round(r.l_extendedprice * 100)
    total = sum(rev.values())
    cum = 0
    expected = {}
    for p in sorted(rev, key=lambda p: (-rev[p], p)):
        cum += rev[p]
        expected[p] = (
            "A"
            if cum * 100 <= total * 80
            else "B"
            if cum * 100 <= total * 95
            else "C"
        )
    out = {
        r.l_partkey: (r.revenue_cents, r.abc_class)
        for r in REGISTRY["orders_abc_class"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(rev)
    for p, (cents, cls) in out.items():
        assert cents == rev[p]
        assert cls == expected[p], p
    # class revenue masses respect the cut points exactly
    mass = Counter()
    for cents, cls in out.values():
        mass[cls] += cents
    assert mass["A"] * 100 <= total * 80
    assert (mass["A"] + mass["B"]) * 100 <= total * 95


def test_file_skipping_flags_consistent(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    per_file = defaultdict(list)
    for r in orders:
        per_file[r.o_orderdate.strftime("%Y-%m")].append(
            round(r.o_totalprice * 100)
        )
    out = {
        r.file_month: r
        for r in REGISTRY["layout_file_skipping"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(per_file)
    for fm, cents in per_file.items():
        r = out[fm]
        assert r.n_rows == len(cents)
        assert r.min_cents == min(cents) and r.max_cents == max(cents)
        assert r.skippable == (max(cents) <= 40_000_000)
        # soundness: a skippable file truly has no matching row
        if r.skippable:
            assert not any(c > 40_000_000 for c in cents)
