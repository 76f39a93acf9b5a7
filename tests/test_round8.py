"""Invariant tests for the round-5 third batch (queries/round8.py):
every operator is replayed in plain Python against its definition.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()


def test_skyline_equals_brute_force_dominance(spark):
    parts = spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    pts = [
        (p.p_partkey, round(p.p_retailprice * 100), p.p_size) for p in parts
    ]
    expected = {
        k
        for k, pc, sz in pts
        if not any(
            opc <= pc and osz >= sz and (opc < pc or osz > sz)
            for _, opc, osz in pts
        )
    }
    got = {
        r.p_partkey
        for r in REGISTRY["parts_skyline_2d"].fn(spark, SF_DIR).collect()
    }
    assert got == expected
    assert expected, "degenerate: empty skyline"


def test_prorate_sums_exact_and_within_one_cent(spark):
    """(orderkey, linenumber) is NOT unique in this data — the replay
    keys items by (linenumber, weight) lists per order."""
    out = REGISTRY["orders_prorate_cents"].fn(spark, SF_DIR).collect()
    orders = {
        r.o_orderkey: round(r.o_totalprice * 100)
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    items = defaultdict(list)
    for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect():
        items[r.l_orderkey].append(
            (r.l_linenumber, round(r.l_extendedprice * 100))
        )
    per_order = defaultdict(int)
    got = defaultdict(list)
    for r in out:
        per_order[r.l_orderkey] += r.alloc_cents
        got[r.l_orderkey].append(
            (r.l_linenumber, r.weight_cents, r.alloc_cents)
        )
        t = orders[r.l_orderkey]
        wsum = sum(w for _, w in items[r.l_orderkey])
        exact = t * r.weight_cents / wsum
        assert abs(r.alloc_cents - exact) < 1.0 + 1e-9, (
            "allocation deviates more than one cent from the exact share"
        )
    # the headline property: cents reconcile exactly per order
    # (orders with no line items have nothing to allocate)
    assert per_order == {k: t for k, t in orders.items() if k in items}
    # and a full largest-remainder replay matches as a multiset
    for ok, lst in list(items.items())[:200]:
        t = orders[ok]
        wsum = sum(w for _, w in lst)
        base = [(ln, w, t * w // wsum) for ln, w in lst]
        rem = t - sum(b for _, _, b in base)
        ranked = sorted(
            base, key=lambda x: (-((t * x[1]) % wsum), x[0], x[1])
        )
        want = sorted(
            (ln, w, b + (1 if i < rem else 0))
            for i, (ln, w, b) in enumerate(ranked)
        )
        assert sorted(got[ok]) == want


def test_trend_slope_matches_python_ols(spark):
    daily = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r.event_type].append((r.day, r.y))
    for row in REGISTRY["events_trend_slope"].fn(spark, SF_DIR).collect():
        pts = sorted(series[row.event_type])
        d0 = pts[0][0]
        t = [(d - d0).days for d, _ in pts]
        y = [v for _, v in pts]
        n = len(pts)
        den = n * sum(a * a for a in t) - sum(t) ** 2
        slope = (n * sum(a * b for a, b in zip(t, y)) - sum(t) * sum(y)) / den
        intercept = (sum(y) - slope * sum(t)) / n
        assert row.n_days == n
        assert math.isclose(row.slope_per_day, slope, abs_tol=2e-6)
        assert math.isclose(row.intercept, intercept, abs_tol=2e-6)


def test_compaction_bins_replay(spark):
    docs = sorted(
        (r.doc_id, r.n_chars)
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    )
    target = 4000
    bins = defaultdict(lambda: [0, 0, None, None])
    off = 0
    for doc_id, sz in docs:
        b = off // target
        rec = bins[b]
        rec[0] += 1
        rec[1] += sz
        rec[2] = doc_id if rec[2] is None else min(rec[2], doc_id)
        rec[3] = doc_id if rec[3] is None else max(rec[3], doc_id)
        off += sz
    out = REGISTRY["layout_compaction_bins"].fn(spark, SF_DIR).collect()
    assert len(out) == len(bins) > 1
    for r in out:
        n, tot, first, last = bins[r.bin]
        assert (r.n_files, r.total_bytes, r.first_id, r.last_id) == (
            n,
            tot,
            first,
            last,
        )
    # id ranges are contiguous and non-overlapping in bin order
    ordered = sorted(out, key=lambda r: r.bin)
    for a, b in zip(ordered, ordered[1:]):
        assert a.last_id < b.first_id


def test_late_arrivals_replay(spark):
    evs = sorted(
        (
            hashlib.md5(str(r.event_id).encode()).hexdigest(),
            r.ts,
            r.event_type,
        )
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    )
    run_max = None
    agg = defaultdict(lambda: [0, 0, 0])
    thresh_us = 600_000_000
    for _, ts, et in evs:
        late_us = 0
        if run_max is not None and ts < run_max:
            late_us = round((run_max - ts).total_seconds() * 1_000_000)
        a = agg[et]
        a[0] += 1
        a[1] += 1 if late_us > thresh_us else 0
        a[2] = max(a[2], late_us)
        run_max = ts if run_max is None else max(run_max, ts)
    out = REGISTRY["events_late_arrivals"].fn(spark, SF_DIR).collect()
    assert {r.event_type for r in out} == set(agg)
    for r in out:
        n, nl, mx = agg[r.event_type]
        assert (r.n_events, r.n_late) == (n, nl)
        assert math.isclose(r.max_late_sec, mx / 1e6, abs_tol=1e-5)
        assert math.isclose(r.late_frac, nl / n, abs_tol=1e-6)
    assert sum(a[1] for a in agg.values()) > 0, "degenerate: nothing late"


def test_negative_pairs_md5_ranking_and_constraint(spark):
    docs = {
        r.doc_id: r.source
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    out = REGISTRY["training_negative_pairs"].fn(spark, SF_DIR).collect()
    by_anchor = defaultdict(list)
    for r in out:
        by_anchor[r.anchor_id].append((r.rank, r.neg_id))
    assert set(by_anchor) == {d for d in docs if d < 20}
    for a, pairs in by_anchor.items():
        cands = sorted(
            (hashlib.md5(f"{a}:{c}".encode()).hexdigest(), c)
            for c, src in docs.items()
            if src != docs[a]
        )[:5]
        assert sorted(pairs) == [(i + 1, c) for i, (_, c) in enumerate(cands)]
        for _, neg in pairs:
            assert docs[neg] != docs[a], "negative from the same source"


def test_merkle_buckets_flag_exactly_the_changed_buckets(spark):
    cut = "1995-06-01"
    orders = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.col("o_orderdate") < F.lit(cut))
        .collect()
    )
    changed_buckets = {
        hashlib.md5(str(r.o_orderkey).encode()).hexdigest()[:2]
        for r in orders
        if r.o_orderkey % 97 == 0
    }
    out = REGISTRY["diff_merkle_buckets"].fn(spark, SF_DIR).collect()
    assert {r.bucket for r in out} == changed_buckets
    assert 0 < len(out) < 256, "diff should be discriminating"
    for r in out:
        assert r.n_old == r.n_new, "in-place updates keep counts equal"
