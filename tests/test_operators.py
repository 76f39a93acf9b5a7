"""Unit tests for join/dedup/stats operators — determinism and fanout
semantics on tiny literal frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from trackdechets_etl_spark.operators.dedup import dedup_by_key, keep_last_by
from trackdechets_etl_spark.operators.joins import (
    enrich_left,
    existence_flag,
    fanout_name_join,
    salted_join,
)
from trackdechets_etl_spark.operators.stats import coverage_stats


def test_keep_last_deterministic_under_shuffle(spark):
    """A1/§2.9.5: result independent of input order (the pandas
    original relied on stable single-threaded sort)."""
    rows = [("c1", "2019", "A"), ("c1", "2021", "B"), ("c1", "2020", "C")]
    df = spark.createDataFrame(rows, ["code", "annee", "siret"]).repartition(4)
    out = keep_last_by(df, ["code"], ["annee", "siret"]).collect()
    assert len(out) == 1 and out[0].siret == "B" and out[0].annee == "2021"


def test_keep_last_tie_break(spark):
    rows = [("c1", "2021", "A"), ("c1", "2021", "B")]
    df = spark.createDataFrame(rows, ["code", "annee", "siret"])
    out = keep_last_by(df, ["code"], ["annee", "siret"]).collect()
    assert out[0].siret == "B"  # desc order, siret breaks the tie


def test_dedup_by_key_keeps_first_ascending(spark):
    rows = [("c1", "2020", "X"), ("c1", "2019", "Y")]
    df = spark.createDataFrame(rows, ["code", "annee", "siret"])
    out = dedup_by_key(df, ["code"], ["annee", "siret"]).collect()
    assert out[0].annee == "2019"


def test_existence_flag_never_fans_out(spark):
    """J5: duplicate keys on the right must not multiply left rows
    (the distinct-keys build guarantees it)."""
    left = spark.createDataFrame([("s1", "a"), ("s2", "b")], ["siret", "v"])
    right = spark.createDataFrame([("s1",), ("s1",), ("s1",)], ["siret"])
    out = existence_flag(left, right, "siret", "flag")
    assert out.count() == 2
    got = {r.siret: r.flag for r in out.collect()}
    assert got == {"s1": "oui", "s2": None}


def test_fanout_name_join_faithful_vs_dedup(spark):
    """J2/§2.9.3: faithful mode fans out on duplicate names; the scale
    mode keeps one deterministic right row per key."""
    inst = spark.createDataFrame([("i1", "ACME")], ["id", "nomEts"])
    comp = spark.createDataFrame(
        [("ACME", "s1", 1), ("ACME", "s2", 2)], ["nom", "siret", "seq"]
    )
    fanned = fanout_name_join(inst, comp, "nomEts", "nom")
    assert fanned.count() == 2
    deduped = fanout_name_join(
        inst, comp, "nomEts", "nom", dedup_right=True, right_order="seq"
    )
    rows = deduped.collect()
    assert len(rows) == 1 and rows[0].siret == "s2"  # seq desc -> latest


def test_enrich_left_inner_drops_dangling(spark):
    fact = spark.createDataFrame([(1, 10), (2, 99)], ["k", "fk"])
    dim = spark.createDataFrame([(10, "x")], ["id", "v"])
    out = enrich_left(fact, dim, fact.fk == dim.id, how="inner")
    assert out.count() == 1


def test_salted_join_equals_plain_join(spark):
    """Salting must not change the join result — only the partitioning.
    Skewed left side: one hot key with many rows."""
    left = spark.createDataFrame(
        [("hot", i) for i in range(50)] + [("cold", 99)], ["k", "v"]
    )
    right = spark.createDataFrame([("hot", "H"), ("cold", "C"), ("miss", "M")], ["k", "lbl"])
    plain = {(r.k, r.v, r.lbl) for r in left.join(right, "k").collect()}
    salted = {(r.k, r.v, r.lbl) for r in salted_join(left, right, "k", salt=4).collect()}
    assert salted == plain and len(salted) == 51
    # left-outer form keeps unmatched left rows exactly once
    lo = salted_join(left, right.filter(F.col("k") == "hot"), "k", how="left", salt=4)
    rows = lo.collect()
    assert len(rows) == 51
    assert {r.lbl for r in rows if r.k == "cold"} == {None}


def test_coverage_stats_numbers(spark):
    """A5: dedup-by-max then count/invalid/pct/distinct on a frame with
    a known answer."""
    rows = [
        ("c1", "1" * 14),
        ("c1", None),        # deduped away (max keeps the valid one)
        ("c2", "123"),       # invalid
        ("c3", None),        # invalid (null)
        ("c4", "1" * 14),    # duplicate valid value
    ]
    df = spark.createDataFrame(rows, ["code", "siret"])
    out = coverage_stats(df, "code", "siret").collect()[0]
    assert out.n_total == 4
    assert out.n_invalid == 2
    assert out.pct_invalid == 50.0
    assert out.n_unique_valid == 1
