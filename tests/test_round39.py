"""Invariant tests for round39: global rank, z-order layout,
edit-distance linkage, k-anonymity."""

from __future__ import annotations

from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import all_queries
from tests.conftest import SF_DIR


def _q(name):
    return all_queries()[name].fn


def test_price_global_rank_is_permutation_and_sorted(spark):
    rows = _q("orders_price_global_rank")(spark, SF_DIR).collect()
    n = len(rows)
    assert sorted(r.price_rank for r in rows) == list(range(1, n + 1))
    # rank order == (price desc, orderkey asc)
    for a, b in zip(rows, rows[1:]):
        assert (a.o_totalprice, -a.o_orderkey) >= (b.o_totalprice, -b.o_orderkey)
    # quartiles balanced within 1 and monotone along the rank order
    from collections import Counter

    sizes = Counter(r.price_quartile for r in rows)
    assert set(sizes) == {1, 2, 3, 4}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert [r.price_quartile for r in rows] == sorted(
        r.price_quartile for r in rows
    )


def test_zorder_buckets_are_narrow_rectangles(spark):
    rows = _q("layout_zorder_key")(spark, SF_DIR).collect()
    o = read_table(spark, SF_DIR, "orders")
    assert sum(r.n_rows for r in rows) == o.count()
    # bucketing on the top 6 occupied bits fixes every z bit above the
    # shift, i.e. both dimensions' bits >= shift//2 — so each bucket's
    # per-dimension span is < 2^(shift//2 + 1). With the sf date span
    # (~2400 days) the shift is 20 -> spans < 1024 on BOTH axes: the
    # two-dimensional pruning property 1-D sorting cannot give.
    for r in rows:
        assert r.custkey_hi - r.custkey_lo < 1024
        assert r.day_hi - r.day_lo < 1024
    assert len(rows) > 1, "bucketing collapsed to a single z-range"


def test_edit_distance_join_matches_bruteforce(spark):
    got = {
        (r.id_a, r.id_b): r.dist
        for r in _q("linkage_edit_distance_join")(spark, SF_DIR).collect()
    }
    names = {
        r.cid: r.name
        for r in read_table(spark, SF_DIR, "customer")
        .select(F.col("c_custkey").alias("cid"), F.col("c_name").alias("name"))
        .collect()
    }

    def lev(a: str, b: str) -> int:
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    ids = sorted(names)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = lev(names[a], names[b])
            if d <= 1:
                want[(a, b)] = d
    assert got == want
    assert want, "test data produced no distance<=1 pairs — weak fixture"


def test_k_anonymity_partitions_all_rows(spark):
    rows = _q("dq_k_anonymity")(spark, SF_DIR).collect()
    c = read_table(spark, SF_DIR, "customer")
    assert sum(r.n_rows for r in rows) == c.count()
    for r in rows:
        assert r.is_k_anonymous == (1 if r.n_rows >= 5 else 0)


def test_edit_distance_block_cap_properties(spark):
    """The r13 max_block knob: capped output is a subset of uncapped;
    a cap at least as large as the biggest block changes nothing; and
    candidate volume per key is actually bounded."""
    from trackdechets_etl_spark.queries.round39 import (
        _linkage_edit_distance_join,
    )

    full = {
        (r.id_a, r.id_b): r.dist
        for r in _linkage_edit_distance_join(spark, SF_DIR).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.dist
        for r in _linkage_edit_distance_join(
            spark, SF_DIR, max_block=2
        ).collect()
    }
    assert set(capped) <= set(full)
    for k, v in capped.items():
        assert full[k] == v
    # cap larger than any block: identical result (uncapped plan parity)
    big = {
        (r.id_a, r.id_b): r.dist
        for r in _linkage_edit_distance_join(
            spark, SF_DIR, max_block=10**6
        ).collect()
    }
    assert big == full
