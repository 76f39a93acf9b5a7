"""Predicate builders (SURVEY §2.2, P3-P7).

All are native Column expressions; Catalyst pushes them into the parquet
scan where possible (check ``PushedFilters`` in ``.explain``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def length_is(col: Column, n: int) -> Column:
    """P4: exact-length predicate — valid-SIRET check
    ``str.len() == 14`` (reference ``dags/icpe-siretisation.py:241``).
    Null-propagating, like the pandas original."""
    return F.length(col) == n


def null_or_short(col: Column, n: int) -> Column:
    """P5: ``len < n OR isnull`` (reference
    ``dags/icpe-siretisation.py:340``). The faithful one-expression form
    treats null as length 0: ``coalesce(length(col), 0) < n``
    (SURVEY §2.2 P5 note)."""
    return F.coalesce(F.length(col), F.lit(0)) < n


def prefix_match(col: Column, prefix: str) -> Column:
    """P6: prefix predicate — waste-sector rubrics ``startswith('27')``
    (reference ``dags/icpe-siretisation.py:310``)."""
    return col.startswith(prefix)


def in_either_list(
    col1: Column, lst1: Sequence[str], col2: Column, lst2: Sequence[str]
) -> Column:
    """P7: disjunction of two IN-lists (reference
    ``dags/icpe-siretisation.py:332-334``). Note the reference has a
    missing-comma bug at :327-331 that silently fuses two literals
    ('2720_1' + '2760_1' → '2720_12760_1'); we implement the corrected
    semantics and the oracle SQL documents the deviation (SURVEY §2.9.4).
    """
    return col1.isin(list(lst1)) | col2.isin(list(lst2))
