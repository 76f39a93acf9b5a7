"""Invariant tests for round36 (quantile normalization, MinHash
calibration)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import all_queries
from tests.conftest import SF_DIR


def _q(name):
    return all_queries()[name].fn


def test_quantile_normalize_is_uniform_per_dim(spark):
    """Per dimension the normalized values are exactly the lattice
    {0, 1/(n-1), ..., 1}: min 0, max 1, mean 1/2, and the multiset of
    ranks is a permutation (each qn value appears exactly once)."""
    out = _q("embedding_quantile_normalize")(spark, SF_DIR)
    n_vec = read_table(spark, SF_DIR, "embeddings").count()
    per_dim = (
        out.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("qn").alias("lo"),
            F.max("qn").alias("hi"),
            F.round(F.avg("qn"), 6).alias("mean"),
            F.countDistinct("qn").alias("n_distinct"),
        )
        .collect()
    )
    assert len(per_dim) == 64
    for r in per_dim:
        assert r.n == n_vec
        assert r.lo == 0.0 and r.hi == 1.0
        assert abs(r.mean - 0.5) < 1e-4
        assert r.n_distinct == n_vec  # a true permutation, no collisions


def test_quantile_normalize_preserves_order(spark):
    """Within a dimension, qn must be monotone in the raw value: the
    rank transform never reorders (checked on dim 0 end-to-end)."""
    from trackdechets_etl_spark.llm.similarity import as_double

    e = read_table(spark, SF_DIR, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    raw = {
        r.vec_id: r.x
        for r in e.select("vec_id", F.col("v")[0].alias("x")).collect()
    }
    qn = {
        r.vec_id: r.qn
        for r in _q("embedding_quantile_normalize")(spark, SF_DIR)
        .filter(F.col("dim") == 0)
        .collect()
    }
    order_raw = sorted(raw, key=lambda k: (raw[k], k))
    order_qn = sorted(qn, key=lambda k: (qn[k], k))
    assert order_raw == order_qn


def test_minhash_calibration_estimator_sanity(spark):
    """The estimator must be usable: buckets ordered by exact Jaccard
    have non-decreasing mean estimates, every mean lives in [0,1], and
    the top bucket (J >= 0.8 near-dups) estimates high (>= 0.5)."""
    rows = _q("dedup_minhash_calibration")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.mean_est <= 1.0
        assert 0.0 <= r.mean_exact <= 1.0
        assert abs(r.bias - round(r.mean_est - r.mean_exact, 6)) <= 1e-9
    ests = [r.mean_est for r in sorted(rows, key=lambda r: r.j_bucket)]
    assert all(a <= b + 1e-9 for a, b in zip(ests, ests[1:]))
    top = max(rows, key=lambda r: r.j_bucket)
    assert top.j_bucket == 4 and top.mean_est >= 0.5
