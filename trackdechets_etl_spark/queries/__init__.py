"""Query registry: every implemented operator exposed as a
(spark_fn, oracle_sql) pair for the driver's correctness gate.

``spark_fn(spark, sf_dir) -> DataFrame`` is the engine's answer;
``oracle_sql`` is the semantically-identical ANSI SQL DuckDB runs on the
same parquet tables. ``oracle_sql is None`` marks genuinely
non-SQL-expressible ops (driver records a rows-only check).

Column names are aliased identically on both sides — the driver's
compare sorts columns by name before hashing (see /root/repo/README).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]


def all_queries() -> dict[str, QuerySpec]:
    from trackdechets_etl_spark.queries import advanced, analytics, core, events, llm

    merged: dict[str, QuerySpec] = {}
    for mod in (core, llm, events, advanced, analytics):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    return merged
