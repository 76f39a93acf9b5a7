"""Registry-wide output-type lint: no >64-bit integers at the result
boundary.

Round-10 post-mortem: the only two driver hash failures in ten rounds
(`orders_cusum_changepoint`, `lineitem_theil_sen`) were queries whose
oracle's final SELECT emitted a raw DuckDB HUGEINT paired with a Spark
decimal(38,0) — the values bit-matched, but the driver's DuckDB
fetch/canonicalization path renders top-level HUGEINTs differently
than a local ``fetchall()`` and the value hash diverged on *format*.

These tests kill the class: >64-bit math stays internal (HUGEINT /
decimal(38,0) accumulators are fine mid-plan), but every column a
registry query *returns* must be representable losslessly through
both engines' fetch paths — int64, double, string, bool, date,
timestamp, or a decimal of precision <= 18.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

# r15: slow shard — excluded from the default pytest run (see
# pytest.ini); run the full suite with -m "slow or not slow".
pytestmark = pytest.mark.slow

REGISTRY = all_queries()


def _bad_spark_type(dt) -> bool:
    # >64-bit at the boundary: decimals wider than an int64 can hold.
    # Recurses into array/map/struct so a wide decimal can't hide one
    # level down (the driver's flat-output contract should reject
    # complex types first, but this lint must not depend on that).
    if isinstance(dt, T.DecimalType):
        return dt.precision > 18
    if isinstance(dt, T.ArrayType):
        return _bad_spark_type(dt.elementType)
    if isinstance(dt, T.MapType):
        return _bad_spark_type(dt.keyType) or _bad_spark_type(dt.valueType)
    if isinstance(dt, T.StructType):
        return any(_bad_spark_type(f.dataType) for f in dt.fields)
    return False


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_spark_output_fits_64_bits(name, spark):
    schema = REGISTRY[name].fn(spark, SF_DIR).schema
    wide = [f.name for f in schema.fields if _bad_spark_type(f.dataType)]
    assert not wide, (
        f"{name}: output columns {wide} are decimal(p>18) — cast the "
        "final column to long/double; keep wide math internal"
    )


def _oracle_output_types(duck, sql):
    # DESCRIBE binds the query without executing it — cheap even for
    # oracles that would be slow to run.
    rows = duck.execute(f"DESCRIBE ({sql})").fetchall()
    return [(r[0], r[1]) for r in rows]


def _bad_duck_type(typ: str) -> bool:
    t = typ.upper()
    if "HUGEINT" in t:  # HUGEINT and UHUGEINT, incl. nested in STRUCT(...)
        return True
    # every DECIMAL(p,s) occurrence, wherever it appears in the type
    # string (top-level or nested inside STRUCT/LIST/MAP reprs)
    for part in t.split("DECIMAL(")[1:]:
        prec = int(part.split(",")[0].split(")")[0])
        if prec > 18:
            return True
    return False


@pytest.mark.parametrize(
    "name", sorted(n for n in REGISTRY if REGISTRY[n].oracle is not None)
)
def test_oracle_output_fits_64_bits(name, duck):
    bad = [
        (col, typ)
        for col, typ in _oracle_output_types(duck, REGISTRY[name].oracle)
        if _bad_duck_type(typ)
    ]
    assert not bad, (
        f"{name}: oracle final SELECT emits {bad} — CAST to BIGINT/"
        "DOUBLE at the boundary; keep HUGEINT accumulators internal"
    )
