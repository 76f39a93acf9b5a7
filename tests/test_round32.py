"""Invariant tests for the round-6 second batch (round32.py):
perceptual-hash image dedup, reorder cadence, hashing trick."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import all_queries
from tests.conftest import SF_DIR


def _q(name):
    return all_queries()[name].fn


def test_image_phash_finds_exact_duplicates_python_replay(spark):
    """From-scratch Python replay: compute every image doc's aHash
    bits, enumerate band-sharing pairs, and check the query returns
    exactly the pairs with hamming <= 8 — including hamming-0 pairs
    for byte-identical prefixes (the corpus's planted duplicates)."""
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in _q("multimodal_image_phash")(spark, SF_DIR).collect()
    }

    docs = (
        read_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select("doc_id", "text")
        .collect()
    )
    bits = {}
    for r in docs:
        b = r.text.encode("utf-8")[:64]
        if len(b) < 64:
            continue
        s = sum(b)
        bits[r.doc_id] = "".join("1" if 64 * x > s else "0" for x in b)

    want = {}
    ids = sorted(bits)
    # replay the banded candidate generation, then exact hamming
    from collections import defaultdict

    buckets = defaultdict(list)
    for i in ids:
        for bi in range(4):
            buckets[(bi, bits[i][bi * 16 : (bi + 1) * 16])].append(i)
    cands = set()
    for members in buckets.values():
        if len(members) > 50:  # the _MAX_BUCKET degenerate-bucket cap
            continue
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                cands.add((members[x], members[y]))
    for a, b in cands:
        h = sum(c1 != c2 for c1, c2 in zip(bits[a], bits[b]))
        if h <= 8:
            want[(a, b)] = h
    assert got == want
    assert any(h == 0 for h in got.values()), "planted dups must collide"


def test_reorder_rate_bounds_and_totals(spark):
    """Monthly repeat counts can never exceed order counts, rates live
    in [0,1], and the n_orders column re-sums to the orders row
    count."""
    rows = _q("orders_reorder_rate")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_fast_reorder <= r.n_repeat <= r.n_orders
        assert 0.0 <= r.fast_reorder_rate <= 1.0
    assert sum(r.n_orders for r in rows) == read_table(
        spark, SF_DIR, "orders"
    ).count()


def test_hashing_trick_fixed_width_and_counts(spark):
    """Buckets stay inside [0, 1024); per-bucket token counts dominate
    term counts (collisions only add, never subtract); and the bucket
    of a known term matches the md5 convention recomputed in Python."""
    rows = _q("text_hashing_trick")(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 50
    for r in rows:
        assert 0 <= r.bucket < 1024
        assert r.n_tokens >= r.n_terms >= 1

    term = "the"
    want_bucket = int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % 1024
    got = (
        read_table(spark, SF_DIR, "documents")
        .select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") == term)
        .select(
            (
                F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long")
                % 1024
            ).alias("b")
        )
        .distinct()
        .collect()
    )
    assert [r.b for r in got] == [want_bucket]
