"""Invariant tests for round37 (seasonal-naive backtest, DQ matrix)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import all_queries
from tests.conftest import SF_DIR


def _q(name):
    return all_queries()[name].fn


def test_seasonal_naive_backtest_replay(spark):
    """Python replay of the whole backtest from the raw monthly cents:
    every year's month count, MAPE and bias must match."""
    o = (
        read_table(spark, SF_DIR, "orders")
        .select(
            F.year(F.to_date("o_orderdate")).alias("y"),
            F.month(F.to_date("o_orderdate")).alias("m"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("y", "m")
        .agg(F.sum("cents").alias("rev"))
        .collect()
    )
    monthly = {(r.y, r.m): r.rev for r in o}
    per_year = {}
    for (y, m), rev in monthly.items():
        pred = monthly.get((y - 1, m))
        if pred is None:
            continue
        per_year.setdefault(y, []).append((rev, pred))
    rows = _q("orders_seasonal_naive_backtest")(spark, SF_DIR).collect()
    assert {r.y for r in rows} == set(per_year)
    for r in rows:
        pairs = per_year[r.y]
        assert r.n_months == len(pairs)
        mape = sum(abs(rev - pred) / rev for rev, pred in pairs) / len(pairs)
        bias = sum((pred - rev) / rev for rev, pred in pairs) / len(pairs)
        assert abs(r.mape - round(mape, 6)) <= 1e-6
        assert abs(r.mean_bias - round(bias, 6)) <= 1e-6


def test_dq_matrix_shape_and_key_integrity(spark):
    """One row per declared (table, column); key columns must profile
    as unique and null-free (n_distinct == n_rows, n_nulls == 0)."""
    from trackdechets_etl_spark.queries.round37 import _DQ_TABLES

    rows = _q("dq_null_cardinality_matrix")(spark, SF_DIR).collect()
    want = {(t, c) for t, cols in _DQ_TABLES.items() for c in cols}
    assert {(r.table_name, r.column_name) for r in rows} == want
    keys = {
        "region": "r_regionkey",
        "nation": "n_nationkey",
        "customer": "c_custkey",
        "supplier": "s_suppkey",
        "part": "p_partkey",
    }
    for r in rows:
        assert 0 <= r.n_nulls <= r.n_rows
        assert 1 <= r.n_distinct <= r.n_rows
        assert r.max_len >= 1
        if keys[r.table_name] == r.column_name:
            assert r.n_nulls == 0 and r.n_distinct == r.n_rows
