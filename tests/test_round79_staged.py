"""Staged round79 entries (NOT yet in the registry — see the module
docstring's staging contract): the same Spark-vs-DuckDB compare as
tests/test_oracle.py, at sf0.001, so round 15 registers pre-verified
code. Also pins each entry's degenerate-data guard cross-engine on
synthetic degenerate frames (the round-14 self-audit discipline)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from tests.test_oracle import _normalize
from trackdechets_etl_spark.queries.round79 import STAGED_QUERIES


@pytest.mark.parametrize("name", sorted(STAGED_QUERIES))
def test_staged_query_matches_oracle(name, spark, duck):
    spec = STAGED_QUERIES[name]
    sdf = spec.fn(spark, SF_DIR)

    from pyspark.sql.types import ArrayType, MapType, StructType

    for field in sdf.schema.fields:
        assert not isinstance(
            field.dataType, (ArrayType, MapType, StructType)
        ), f"{name}: non-flat column {field.name}"

    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    res = duck.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s_norm = _normalize(spark_rows, spark_cols)
    d_norm = _normalize(duck_rows, duck_cols)
    if s_norm != d_norm:
        diffs = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch: {diffs}")
