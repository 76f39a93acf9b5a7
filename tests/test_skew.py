"""Skew stress for the J2 name-fanout join (VERDICT r5 item 6,
reference risk SURVEY §2.9.3 / icpe:243-246): one hot company name
covering a large slice of the fact side must be split by AQE's skew
join instead of serializing one straggler task.

The AQE skew thresholds are sized for production (256 MB); the test
lowers them so the same machinery triggers at fixture scale — what is
being pinned is that the fanout join's PLAN SHAPE is skew-splittable
(shuffle sort-merge join, no broadcast of the fact side) and that the
skewed run's wall-clock stays within a small factor of the uniform
run's, i.e. the hot key does not degrade the join to a single task."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from trackdechets_etl_spark.operators.joins import fanout_name_join

_N_FACTS = 300_000
_N_KEYS = 997


def _facts(spark, skewed: bool):
    key = (
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        if skewed
        else F.when(F.col("id") < 0, F.lit("hot"))
    ).otherwise(
        F.concat(F.lit("k"), (F.col("id") % _N_KEYS).cast("string"))
    )
    return spark.range(_N_FACTS).select(
        key.alias("name"), F.col("id").alias("fact_id")
    )


def _dim(spark):
    return spark.range(_N_KEYS).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("rname"),
        F.col("id").alias("dim_payload"),
    ).unionByName(
        spark.range(1).select(
            F.lit("hot").alias("rname"), F.lit(-1).alias("dim_payload")
        )
    )


def _run(spark, skewed: bool) -> tuple[float, str]:
    joined = fanout_name_join(_facts(spark, skewed), _dim(spark), "name", "rname")
    # Reduce before collecting so timing measures the join, not a 300k-row
    # driver transfer; collect() (unlike write.save(), which clones the
    # QueryExecution) finalizes THIS DataFrame's adaptive plan, so the
    # skew=true marker is inspectable afterwards.
    out = joined.groupBy().agg(F.count(F.lit(1)).alias("n"), F.sum("dim_payload"))
    start = time.perf_counter()
    n = out.collect()[0]["n"]
    elapsed = time.perf_counter() - start
    assert n == _N_FACTS
    plan = out._jdf.queryExecution().executedPlan().toString()
    return elapsed, plan


def test_aqe_splits_hot_name_key(spark):
    confs = {
        # Force the shuffle join path (the at-scale shape for a fact-
        # sized right side) and let AQE call skew at fixture sizes.
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)

        t_uniform, _ = _run(spark, skewed=False)
        t_skewed, plan = _run(spark, skewed=True)

        # AQE recognized and split the hot partition.
        assert "skew=true" in plan, plan[:2000]
        # And the split keeps the straggler bounded: same data volume,
        # half of it on one key, must not serialize the stage. Bound is
        # deliberately loose (shared box) — without the split the hot
        # run degrades ~10x+.
        assert t_skewed <= 5 * max(t_uniform, 0.2), (t_skewed, t_uniform)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
