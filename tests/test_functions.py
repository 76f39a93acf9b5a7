"""Unit tests for the scalar/predicate/decode library — the SURVEY §2.9
quirk semantics, exercised on tiny literal frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from trackdechets_etl_spark.functions.decode import (
    FAMILLE_IC_LABELS,
    decode_dict,
    decode_via_join,
)
from trackdechets_etl_spark.functions.predicates import (
    in_either_list,
    length_is,
    null_or_short,
)
from trackdechets_etl_spark.functions.scalar import (
    backfill_if_invalid,
    concat_null_to_empty,
    regexp_extract_null,
)


def test_decode_null_unknown_known(spark):
    """§2.9.2: null→null, unknown code→'', known→label."""
    df = spark.createDataFrame(
        [("IN",), ("ZZ",), (None,)], ["code"]
    ).select(decode_dict(F.col("code"), FAMILLE_IC_LABELS).alias("label"))
    rows = [r.label for r in df.collect()]
    assert rows == ["Industries", "", None]


def test_decode_via_join_matches_map(spark):
    mapping = spark.createDataFrame(
        [(k, v) for k, v in FAMILLE_IC_LABELS.items()], ["code", "label"]
    )
    df = spark.createDataFrame([("IN",), ("ZZ",), (None,)], ["c"])
    out = decode_via_join(df, "c", mapping, "lbl").orderBy("c")
    got = {r.c: r.lbl for r in out.collect()}
    assert got == {"IN": "Industries", "ZZ": "", None: None}


def test_concat_null_propagates_then_empty(spark):
    """C1: a null side nulls the concat, which becomes '' — concat_ws
    would wrongly yield '2710' (skip-null)."""
    df = spark.createDataFrame([("2710", "1"), ("2710", None)], ["r", "a"])
    rows = df.select(
        concat_null_to_empty(F.col("r"), F.col("a")).alias("x")
    ).collect()
    assert [r.x for r in rows] == ["2710_1", ""]


def test_backfill_null_short_valid(spark):
    """C4 + §2.9.1: null current (pandas 'nan', len 3) and short current
    both take a 14-char candidate; valid current is kept; invalid
    candidate never overwrites."""
    rows = [
        (None, "1" * 14),     # null cur, valid cand -> cand
        ("123", "2" * 14),    # short cur, valid cand -> cand
        ("3" * 14, "4" * 14), # valid cur -> kept
        (None, "55"),         # invalid cand -> cur stays null
    ]
    df = spark.createDataFrame(rows, ["cur", "cand"])
    out = [
        r.x
        for r in df.select(
            backfill_if_invalid(F.col("cur"), F.col("cand")).alias("x")
        ).collect()
    ]
    assert out == ["1" * 14, "2" * 14, "3" * 14, None]


def test_regexp_extract_null_on_no_match(spark):
    """C2: pandas yields NaN on no-match; Spark's '' is normalized to null."""
    df = spark.createDataFrame([("75001 PARIS",), ("no digits",)], ["addr"])
    out = [
        r.x
        for r in df.select(
            regexp_extract_null(F.col("addr"), r"(\d{5}) ").alias("x")
        ).collect()
    ]
    assert out == ["75001", None]


def test_null_or_short_counts_null_as_zero_len(spark):
    df = spark.createDataFrame([("12345678901234",), ("123",), (None,)], ["s"])
    out = df.filter(null_or_short(F.col("s"), 14)).count()
    assert out == 2
    assert df.filter(length_is(F.col("s"), 14)).count() == 1


def test_in_either_list(spark):
    df = spark.createDataFrame(
        [("2710", "2710_1"), ("9999", "2718_1"), ("0001", "x")], ["r", "ra"]
    )
    kept = df.filter(
        in_either_list(F.col("r"), ["2710"], F.col("ra"), ["2718_1"])
    ).count()
    assert kept == 2
