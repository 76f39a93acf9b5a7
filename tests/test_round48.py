"""Invariant tests for round48: KS test, compressibility proxy, and
the ORC sink round-trip."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import all_queries
from tests.conftest import SF_DIR


def _q(name):
    return all_queries()[name].fn


def test_ks_matches_python_replay(spark):
    row = _q("events_two_sample_ks")(spark, SF_DIR).collect()[0]
    ev = (
        read_table(spark, SF_DIR, "events")
        .select("user_id", "value")
        .collect()
    )
    import math

    g0 = sorted(
        math.floor(r.value * 100 + 0.5) for r in ev if r.user_id % 2 == 0
    )
    g1 = sorted(
        math.floor(r.value * 100 + 0.5) for r in ev if r.user_id % 2 == 1
    )
    n0, n1 = len(g0), len(g1)
    assert (row.n0, row.n1) == (n0, n1)
    c0, c1 = Counter(g0), Counter(g1)
    best = (-1, None)
    f0 = f1 = 0
    for v in sorted(set(g0) | set(g1)):
        f0 += c0.get(v, 0)
        f1 += c1.get(v, 0)
        gap = abs(f0 * n1 - f1 * n0)
        if gap > best[0]:
            best = (gap, v)
    assert row.ks_d == round(best[0] / (n0 * n1), 6)
    assert abs(row.ks_at_value - best[1] / 100.0) < 1e-9
    assert 0.0 <= row.ks_d <= 1.0


def test_compressibility_flags_repetitive_docs(spark):
    rows = _q("text_compressibility_proxy")(spark, SF_DIR).collect()
    assert len(rows) == 20
    ratios = [r.distinct_ratio for r in rows]
    assert ratios == sorted(ratios)
    for r in rows:
        assert 0 < r.n_distinct <= r.n_bigrams
        assert abs(r.distinct_ratio - round(r.n_distinct / r.n_bigrams, 6)) < 1e-9


def test_orc_round_trip(spark, tmp_path):
    from trackdechets_etl_spark.io.writers import write_orc

    o = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    path = str(tmp_path / "orders_orc")
    write_orc(o, path, partition_by=["o_orderstatus"])
    back = spark.read.orc(path)
    assert back.count() == o.count()
    a = {r.o_orderkey: (r.o_custkey, r.o_totalprice) for r in o.collect()}
    b = {r.o_orderkey: (r.o_custkey, r.o_totalprice) for r in back.collect()}
    assert a == b
    # partition pruning works on the layout
    one = back.filter(F.col("o_orderstatus") == "F")
    plan = one._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PartitionFilters" in plan
