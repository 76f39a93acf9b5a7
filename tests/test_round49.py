"""Invariant tests for round49: interval coalescing, Wilson CI."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import all_queries
from tests.conftest import SF_DIR


def _q(name):
    return all_queries()[name].fn


def test_interval_coalesce_matches_python_sweep(spark):
    rows = {
        r.custkey: (r.n_intervals, r.covered_days)
        for r in _q("orders_interval_coalesce")(spark, SF_DIR).collect()
    }
    o = (
        read_table(spark, SF_DIR, "orders")
        .select("o_custkey", F.to_date("o_orderdate").alias("od"))
        .collect()
    )
    epoch = datetime.date(1990, 1, 1)
    by_cust: dict = {}
    for r in o:
        by_cust.setdefault(r.o_custkey, set()).add((r.od - epoch).days)
    want = {}
    for ck, starts in by_cust.items():
        ivs = sorted((s, s + 7) for s in starts)
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        want[ck] = (len(merged), sum(e - s for s, e in merged))
    assert rows == want
    # coalescing actually merged something on this fixture
    assert any(n > 1 for n, _ in rows.values())
    assert any(
        cov < 7 * len(by_cust[ck]) for ck, (_, cov) in rows.items()
    ), "no overlaps merged — weak fixture"


def test_wilson_interval_brackets_rate(spark):
    rows = _q("lineitem_return_rate_wilson")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.wilson_lo <= r.rate <= r.wilson_hi <= 1.0
        # python replay of the Wilson formula
        p = r.n_returned / r.n_items
        z = 1.96
        n = r.n_items
        denom = 1 + z * z / n
        center = (p + z * z / (2 * n)) / denom
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
        assert abs(r.wilson_lo - round(center - half, 6)) < 1e-9
        assert abs(r.wilson_hi - round(center + half, 6)) < 1e-9
