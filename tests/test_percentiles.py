"""exact_percentiles_value_counts must be bit-identical to Spark's
built-in ``percentile`` aggregate — the operator exists purely to
distribute the same math (see operators/percentiles.py), so any value
drift is a bug, not a tolerance question."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from trackdechets_etl_spark.operators.percentiles import (
    exact_percentiles_value_counts,
)

FRACTIONS = [0.0, 0.25, 0.5, 0.75, 0.95, 1.0]
ALIASES = [f"p{i}" for i in range(len(FRACTIONS))]


def _reference(df, group_cols):
    pcts = F.percentile(
        "v", F.array(*[F.lit(q) for q in FRACTIONS])
    )
    return (
        df.groupBy(*group_cols)
        .agg(pcts.alias("__p"))
        .select(
            *group_cols,
            *[
                F.element_at("__p", i + 1).alias(a)
                for i, a in enumerate(ALIASES)
            ],
        )
    )


def _assert_bitwise_equal(a_df, b_df):
    a = sorted(tuple(repr(v) for v in r) for r in a_df.collect())
    b = sorted(tuple(repr(v) for v in r) for r in b_df.collect())
    assert a == b


def test_matches_builtin_random_with_ties(spark):
    rng = random.Random(42)
    rows = [
        (rng.choice("abc"), round(rng.uniform(0, 100), 1))
        for _ in range(5000)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    _assert_bitwise_equal(
        _reference(df, ["g"]),
        exact_percentiles_value_counts(df, ["g"], "v", FRACTIONS, ALIASES),
    )


def test_single_value_and_tiny_groups(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 3.0), ("b", 4.0), ("c", -2.5), ("c", -2.5)],
        "g string, v double",
    )
    _assert_bitwise_equal(
        _reference(df, ["g"]),
        exact_percentiles_value_counts(df, ["g"], "v", FRACTIONS, ALIASES),
    )


def test_nulls_ignored_like_builtin(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", 1.0), ("a", 2.0), ("a", None), ("a", 9.0)],
        "g string, v double",
    )
    _assert_bitwise_equal(
        _reference(df, ["g"]),
        exact_percentiles_value_counts(df, ["g"], "v", FRACTIONS, ALIASES),
    )


def test_multi_group_cols(spark):
    rng = random.Random(7)
    rows = [
        (rng.choice("xy"), rng.choice("uv"), float(rng.randint(0, 50)))
        for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, "g1 string, g2 string, v double")
    _assert_bitwise_equal(
        _reference(df, ["g1", "g2"]).withColumn(
            "k", F.concat("g1", "g2")
        ).drop("g1", "g2"),
        exact_percentiles_value_counts(
            df, ["g1", "g2"], "v", FRACTIONS, ALIASES
        ).withColumn("k", F.concat("g1", "g2")).drop("g1", "g2"),
    )


def test_all_null_group_preserved(spark):
    """Regression (round-12 advice): a group whose values are ALL NULL
    must keep its row with NULL percentiles, exactly as F.percentile
    and DuckDB quantile_cont do — not vanish at the isNotNull filter."""
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", None), ("b", None), (None, 5.0)],
        "g string, v double",
    )
    _assert_bitwise_equal(
        _reference(df, ["g"]),
        exact_percentiles_value_counts(df, ["g"], "v", FRACTIONS, ALIASES),
    )
    out = {
        r.g: r
        for r in exact_percentiles_value_counts(
            df, ["g"], "v", FRACTIONS, ALIASES
        ).collect()
    }
    assert set(out) == {"a", "b", None}
    assert all(getattr(out["b"], a) is None for a in ALIASES)
    # NULL group KEY with real values still computes (null-safe join)
    assert out[None].p0 == 5.0


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:

    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c", None]),
                st.one_of(
                    st.none(),
                    st.integers(min_value=-50, max_value=50).map(
                        lambda i: i / 4.0
                    ),
                ),
            ),
            min_size=1,
            max_size=60,
        )
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
        ],
    )
    def test_property_matches_builtin_with_nulls(spark, rows):
        """Random groups/values including NULL group keys, NULL values
        and all-NULL groups: bit-identical to F.percentile per group."""
        df = spark.createDataFrame(rows, "g string, v double")
        _assert_bitwise_equal(
            _reference(df, ["g"]),
            exact_percentiles_value_counts(
                df, ["g"], "v", FRACTIONS, ALIASES
            ),
        )


def test_alias_guard_rejects_collisions(spark):
    """Aliases colliding with group columns or using the reserved
    internal prefix must fail loudly at entry (r13 advice), not
    produce ambiguous selects downstream."""
    import pytest

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="group columns"):
        exact_percentiles_value_counts(df, ["g"], "v", [0.5], ["g"])
    with pytest.raises(ValueError, match="__pg_"):
        exact_percentiles_value_counts(
            df, ["g"], "v", [0.5], ["__pg_p50"]
        )


def test_plan_single_scan_no_join(spark):
    """The r14 shape: NULL-value rows carry __cnt = 0 through the one
    aggregation, so all-NULL groups fall out of the math — the plan
    must contain exactly ONE source scan and NO join (the old re-seat
    join scanned the input twice)."""
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    r = exact_percentiles_value_counts(
        df, ["l_returnflag"], "l_quantity", [0.5], ["p50"]
    )
    plan = r._jdf.queryExecution().executedPlan().toString()
    first_detail = plan.find("(1) ")
    tree = plan[:first_detail] if first_detail > 0 else plan
    assert tree.count("Scan parquet") == 1, tree
    assert "Join" not in tree, tree
