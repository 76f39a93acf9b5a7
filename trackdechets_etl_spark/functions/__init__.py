from trackdechets_etl_spark.functions.decode import decode_dict
from trackdechets_etl_spark.functions.predicates import (
    in_either_list,
    length_is,
    null_or_short,
    prefix_match,
)
from trackdechets_etl_spark.functions.scalar import (
    backfill_if_invalid,
    concat_null_to_empty,
    conditional_overwrite,
    pct,
    prefix_zero,
    regexp_extract_null,
)

__all__ = [
    "decode_dict",
    "in_either_list",
    "length_is",
    "null_or_short",
    "prefix_match",
    "backfill_if_invalid",
    "concat_null_to_empty",
    "conditional_overwrite",
    "pct",
    "prefix_zero",
    "regexp_extract_null",
]
