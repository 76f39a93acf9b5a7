from trackdechets_etl_spark.operators.dedup import (
    dedup_by_key,
    keep_last_by,
)
from trackdechets_etl_spark.operators.joins import (
    enrich_left,
    existence_flag,
    fanout_name_join,
)
from trackdechets_etl_spark.operators.stats import coverage_stats

__all__ = [
    "dedup_by_key",
    "keep_last_by",
    "enrich_left",
    "existence_flag",
    "fanout_name_join",
    "coverage_stats",
]
