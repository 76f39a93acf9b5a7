"""Determinism guard: the value-hash oracle requires every query to
produce byte-identical results run-to-run. The risky class is anything
that once depended on arrival order (dedup keep-first, collect_set,
window ties, applyInPandas accumulation order) — run each twice with
different shuffle partitioning and require identical normalized rows.
"""

from __future__ import annotations

import pytest

from trackdechets_etl_spark.queries import all_queries
from tests.conftest import SF_DIR

RISKY = [
    "agg_keep_last_by_year",
    "agg_dedup_first_by_key",
    "agg_collect_sorted",
    "dedup_minhash_lsh",
    "sim_ivf_topk",
    "embedding_label_centroids",
    "sample_stratified_per_group",
    "dedup_clusters",
]


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", RISKY)
def test_rerun_with_different_partitioning_is_identical(name, spark):
    fn = all_queries()[name].fn
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        first = _rows(fn(spark, SF_DIR))
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        second = _rows(fn(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert first == second, f"{name} is partitioning-sensitive"
