"""Invariant tests for round51: autocorrelation and assortativity."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import all_queries
from tests.conftest import SF_DIR


def _q(name):
    return all_queries()[name].fn


def test_daily_autocorr_matches_numpy(spark):
    rows = _q("events_daily_autocorr")(spark, SF_DIR).collect()
    assert [r.lag_days for r in rows] == list(range(1, 8))
    daily = {
        r.day: r.n
        for r in read_table(spark, SF_DIR, "events")
        .groupBy(F.to_date(F.col("ts").cast("timestamp")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    import datetime

    for r in rows:
        xs, ys = [], []
        for d, c in daily.items():
            d2 = d + datetime.timedelta(days=r.lag_days)
            if d2 in daily:
                xs.append(c)
                ys.append(daily[d2])
        assert r.n_pairs == len(xs)
        want = np.corrcoef(np.array(xs), np.array(ys))[0, 1]
        assert abs(r.autocorr - want) < 1e-4
        assert -1.0 <= r.autocorr <= 1.0


def test_assortativity_in_range_and_matches_replay(spark):
    row = _q("graph_degree_assortativity")(spark, SF_DIR).collect()[0]
    li = read_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    o = read_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    raw = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .collect()
    )
    from collections import Counter

    edges = []
    for r in raw:
        edges.append((r.o_custkey, r.l_suppkey + 1_000_000))
        edges.append((r.l_suppkey + 1_000_000, r.o_custkey))
    deg = Counter(s for s, _ in edges)
    dx = np.array([deg[s] for s, _ in edges], dtype=np.float64)
    dy = np.array([deg[d] for _, d in edges], dtype=np.float64)
    assert row.n_edges == len(edges)
    want = np.corrcoef(dx, dy)[0, 1]
    assert abs(row.assortativity - want) < 1e-4
    assert -1.0 <= row.assortativity <= 1.0
