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

# r15: slow shard — excluded from the default pytest run (see
# pytest.ini); run the full suite with -m "slow or not slow".
pytestmark = pytest.mark.slow

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


# Physical-strategy invariance (the fast standing twin of
# scripts/strategy_invariance.py, which drives the FULL registry at
# sf0.01 per round): on a 1000-executor cluster the same query text
# gets different physical plans than local[32] — dims stop fitting the
# broadcast threshold, AQE re-plans per run. Values must not depend on
# which join strategy or adaptive re-plan executed. This subset covers
# the risky shapes: float aggregation through joins, window ties after
# a join, union-through-aggregate, iterative convergence.
STRATEGY_RISKY = [
    "flagship_revenue_by_nation",   # float sum through a 3-way join
    "agg_coverage_stats",           # percentage arithmetic post-join
    "graph_jaccard_neighbors",      # window ties over a self-join
    "dedup_ngram_jaccard",          # prefix-filter join + verify join
    "sim_topk_bruteforce",          # float dot-product ranking
    "reco_holdout_hitrate",         # multi-branch union over joins
    "graph_pagerank",               # iterative float convergence
    "orders_cusum_changepoint",     # integer-exact scan statistic
]

_REGIMES = {
    "no-aqe": {"spark.sql.adaptive.enabled": "false"},
    "no-auto-bc": {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    },
    # interpreted evaluation vs whole-stage codegen — the two
    # evaluators fuse expressions differently; values must not care.
    "no-codegen": {"spark.sql.codegen.wholeStage": "false"},
}


@pytest.mark.parametrize("name", STRATEGY_RISKY)
def test_values_invariant_to_join_strategy_and_aqe(name, spark):
    fn = all_queries()[name].fn
    keys = {k for conf in _REGIMES.values() for k in conf}
    saved = {k: spark.conf.get(k, None) for k in keys}

    def _restore():
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    try:
        base = _rows(fn(spark, SF_DIR))
        for regime, conf in _REGIMES.items():
            for k, v in conf.items():
                spark.conf.set(k, v)
            try:
                got = _rows(fn(spark, SF_DIR))
            finally:
                _restore()
            assert got == base, f"{name} differs under {regime}"
    finally:
        _restore()
