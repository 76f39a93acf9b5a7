"""Coverage-stats block (SURVEY §2.4 A2/A4/A5, §2.9.6).

The reference's ``make_stats`` (``dags/icpe-siretisation.py:335-357``)
computes, on the (deduped) installations frame: total rows, rows without
a valid 14-char SIRET, the percentage, and the distinct count of valid
SIRETs — and runs TWICE, once pre- and once post-enrichment
(``dags/icpe-siretisation.py:408-409``), as an A/B measurement of
enrichment lift. Here it is a parameterized single-row aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trackdechets_etl_spark.functions.predicates import length_is, null_or_short


def coverage_stats(
    df: DataFrame,
    key_col: str,
    value_col: str,
    valid_len: int = 14,
    approx: bool = False,
) -> DataFrame:
    """Single-row stats: n_total, n_invalid, pct_invalid, n_unique_valid.

    ``approx=True`` switches the distinct count to
    ``approx_count_distinct`` — the 100 TB variant (A2 note in SURVEY):
    exact distinct on a high-cardinality key is a full shuffle; HLL is
    one pass, mergeable, ~2% error.

    Deviation from the reference (documented per SURVEY §2.9): the
    reference dedups with ``drop_duplicates(subset=['codeS3ic'])``
    (keeps pandas' first-in-file row); we dedup by keeping the MAX
    value per key (nulls lose), which is order-independent and thus
    deterministic under distributed execution.
    """
    dedup = df.groupBy(key_col).agg(F.max(value_col).alias(value_col))
    invalid = null_or_short(F.col(value_col), valid_len)
    valid_values = F.when(length_is(F.col(value_col), valid_len), F.col(value_col))
    distinct = (
        F.approx_count_distinct(valid_values)
        if approx
        else F.countDistinct(valid_values)
    )
    return dedup.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(invalid.cast("long")).alias("n_invalid"),
        F.round(F.sum(invalid.cast("long")) / F.count(F.lit(1)) * 100.0, 6).alias(
            "pct_invalid"
        ),
        distinct.alias("n_unique_valid"),
    )
