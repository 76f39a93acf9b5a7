"""Property-based tests (hypothesis): the vectorized Spark expressions
must agree with a straightforward Python model of the reference
semantics on arbitrary inputs — nulls, short strings, unicode, ties."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from trackdechets_etl_spark.functions.decode import REGIME_LABELS, decode_dict
from trackdechets_etl_spark.functions.scalar import backfill_if_invalid
from trackdechets_etl_spark.operators.dedup import keep_last_by

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

maybe_str = st.one_of(
    st.none(),
    st.text(alphabet="0123456789ab", min_size=0, max_size=20),
)


def _model_backfill(cur, cand, n=14):
    cur_len = len(cur) if cur is not None else 0
    cand_len = len(cand) if cand is not None else 0
    return cand if (cur_len != n and cand_len == n) else cur


@given(st.lists(st.tuples(maybe_str, maybe_str), min_size=1, max_size=40))
@SETTINGS
def test_backfill_matches_model(spark, rows):
    df = spark.createDataFrame(rows, "cur string, cand string")
    got = [
        r.x
        for r in df.select(
            backfill_if_invalid(F.col("cur"), F.col("cand")).alias("x")
        ).collect()
    ]
    want = [_model_backfill(c, d) for c, d in rows]
    assert got == want


def _model_decode(code, mapping):
    if code is None:
        return None
    return mapping.get(code, "")


@given(
    st.lists(
        st.one_of(st.none(), st.sampled_from(list(REGIME_LABELS) + ["XX", "", "a"])),
        min_size=1,
        max_size=40,
    )
)
@SETTINGS
def test_decode_matches_model(spark, codes):
    df = spark.createDataFrame([(c,) for c in codes], "code string")
    got = [
        r.x
        for r in df.select(decode_dict(F.col("code"), REGIME_LABELS).alias("x")).collect()
    ]
    assert got == [_model_decode(c, REGIME_LABELS) for c in codes]


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["k1", "k2", "k3"]),
            st.text(alphabet="0123456789", min_size=1, max_size=4),
            st.text(alphabet="xyz", min_size=1, max_size=3),
        ),
        min_size=1,
        max_size=30,
    )
)
@SETTINGS
def test_keep_last_matches_model(spark, rows):
    df = spark.createDataFrame(rows, ["key", "ord1", "ord2"])
    got = {
        r.key: (r.ord1, r.ord2)
        for r in keep_last_by(df, ["key"], ["ord1", "ord2"]).collect()
    }
    want = {}
    for k, o1, o2 in rows:
        if k not in want or (o1, o2) > want[k]:
            want[k] = (o1, o2)
    assert got == want
