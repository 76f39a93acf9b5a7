"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (revenue by nation) at
sf0.001. ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY §2 plus the LLM-pipeline and streaming-batch
extensions; the registry lives in ``trackdechets_etl_spark.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from trackdechets_etl_spark.plans.flagship import revenue_by_nation
from trackdechets_etl_spark.queries import all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return revenue_by_nation(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query. Omitted only for
    the sketch-backed twins (``agg_coverage_stats_approx`` HLL,
    ``orders_ship_latency_approx`` GK percentile) whose outputs are
    engine-specific by construction — rows-only checks; their exact
    counterparts are fully oracle-verified."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
