"""Invariant tests for round47: ANOVA and exact delay percentiles."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import all_queries
from tests.conftest import SF_DIR


def _q(name):
    return all_queries()[name].fn


def test_anova_matches_numpy(spark):
    row = _q("lineitem_anova_returnflag")(spark, SF_DIR).collect()[0]
    li = (
        read_table(spark, SF_DIR, "lineitem")
        .select("l_returnflag", "l_quantity")
        .collect()
    )
    groups = {}
    for r in li:
        groups.setdefault(r.l_returnflag, []).append(r.l_quantity)
    ys = np.array([r.l_quantity for r in li])
    grand = ys.mean()
    ssb = sum(len(g) * (np.mean(g) - grand) ** 2 for g in groups.values())
    ssw = sum(((np.array(g) - np.mean(g)) ** 2).sum() for g in groups.values())
    k, n = len(groups), len(ys)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row.n_rows == n
    assert abs(row.ss_between - ssb) < 0.5
    assert abs(row.ss_within - ssw) < 0.5
    assert abs(row.f_stat - f) < 1e-3
    assert row.f_stat >= 0


def test_delay_percentiles_match_sorted_positions(spark):
    rows = _q("lineitem_ship_delay_percentiles")(spark, SF_DIR).collect()
    li = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_suppkey", F.to_date("l_shipdate").alias("sd")
    )
    o = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    s = read_table(spark, SF_DIR, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"),
        F.col("s_nationkey").alias("nationkey"),
    )
    data = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, "l_suppkey")
        .select("nationkey", F.datediff("sd", "od").alias("delay"))
        .collect()
    )
    by_nation: dict = {}
    for r in data:
        by_nation.setdefault(r.nationkey, []).append(r.delay)
    assert {r.nationkey for r in rows} == set(by_nation)
    import math

    for r in rows:
        ds = sorted(by_nation[r.nationkey])
        n = len(ds)
        assert r.n_items == n
        assert r.p50_days == ds[math.ceil(n * 0.50) - 1]
        assert r.p95_days == ds[math.ceil(n * 0.95) - 1]
        assert r.max_days == ds[-1]
        assert r.p50_days <= r.p95_days <= r.max_days
