"""Invariant tests for the round-5 eleventh batch (queries/round16.py):
every operator is replayed in plain Python against its definition.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()


def test_char_entropy_matches_replay(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    out = {
        r.doc_id: r
        for r in REGISTRY["text_char_entropy"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == {r.doc_id for r in docs}
    for d in docs:
        counts = Counter(d.text)
        n = sum(counts.values())
        ent = -sum(c / n * math.log(c / n) for c in counts.values())
        r = out[d.doc_id]
        assert r.n_chars == n
        assert abs(r.char_entropy - round(ent, 6)) < 1e-5, d.doc_id
        # entropy bounds: 0 ≤ H ≤ ln(alphabet size)
        assert -1e-9 <= r.char_entropy <= math.log(len(counts)) + 1e-6


def _quantile_cont(xs, q):
    xs = sorted(xs)
    pos = (len(xs) - 1) * q
    lo = int(pos)
    frac = pos - lo
    if lo + 1 < len(xs):
        return xs[lo] * (1 - frac) + xs[lo + 1] * frac
    return xs[lo]


def test_mad_matches_replay(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_type = defaultdict(list)
    for r in ev:
        by_type[r.event_type].append(r.value)
    out = {
        r.event_type: r
        for r in REGISTRY["agg_mad_robust"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(by_type)
    for t, xs in by_type.items():
        med = _quantile_cont(xs, 0.5)
        mad = _quantile_cont([abs(x - med) for x in xs], 0.5)
        r = out[t]
        assert r.n == len(xs)
        assert abs(r.median - round(med, 6)) < 1e-6
        assert abs(r.mad - round(mad, 6)) < 1e-6
        # MAD is outlier-resistant: bounded by the full range
        assert 0 <= r.mad <= max(xs) - min(xs)


def test_seasonality_index_sums_to_twelve(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cents = defaultdict(int)
    n = Counter()
    for r in orders:
        m = r.o_orderdate.month
        cents[m] += round(r.o_totalprice * 100)
        n[m] += 1
    total = sum(cents.values())
    out = {
        r.month: r
        for r in REGISTRY["orders_seasonality_index"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(cents)
    for m, r in out.items():
        assert r.cents == cents[m]
        assert r.n_orders == n[m]
        assert abs(r.seasonality_index - round(cents[m] * 12 / total, 6)) < 1e-9
    # indices average to 1 over the 12 months
    assert abs(sum(r.seasonality_index for r in out.values()) - 12) < 1e-3
