"""Local mirror of the driver's correctness gate: run every registry
query in Spark AND its DuckDB oracle at sf0.001, compare row count,
column names, and order-insensitive values exactly.

This is deliberately stricter than "close enough": the driver hashes
values, so any float wobble or dtype drift that this test would forgive
the driver would not. Exact equality after canonical normalization.
"""

from __future__ import annotations

import math

import pytest

from trackdechets_etl_spark.queries import all_queries
from tests.conftest import SF_DIR

# r15: slow shard — excluded from the default pytest run (see
# pytest.ini); run the full suite with -m "slow or not slow".
pytestmark = pytest.mark.slow

REGISTRY = all_queries()


def _normalize(rows, colnames):
    """Canonical order-insensitive form: rows sorted by string repr,
    each value normalized (floats → repr, timestamps → isoformat)."""

    def norm_val(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(norm_val(x) for x in v) + "]"
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, bool):
            return str(bool(v))
        return str(v)

    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    normed = [tuple(norm_val(r[i]) for i in order) for r in rows]
    return sorted(normed)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)

    # The driver canonicalizes results through pandas sort_values, which
    # cannot hash list/map/struct cells — registry outputs must be flat.
    from pyspark.sql.types import ArrayType, MapType, StructType

    for field in sdf.schema.fields:
        assert not isinstance(field.dataType, (ArrayType, MapType, StructType)), (
            f"{name}: column {field.name} has driver-unhashable type "
            f"{field.dataType.simpleString()}; flatten to scalars/strings"
        )

    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    if spec.oracle is None:
        assert len(spark_rows) >= 0  # rows-only check
        return

    res = duck.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    s_norm = _normalize(spark_rows, spark_cols)
    d_norm = _normalize(duck_rows, duck_cols)
    if s_norm != d_norm:
        diffs = [
            (a, b) for a, b in zip(s_norm, d_norm) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
