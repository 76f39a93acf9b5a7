"""Edge semantics of the temporal join operators on tiny literal
frames: as-of tie-breaking (<= at equal ts, max tie_col among equal-ts
right rows), left-outer null behavior, and range-join bucket-boundary
inclusion/exclusion across bucket seams.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from trackdechets_etl_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
    semi_anti_split,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-10T00:00:00"), "a"), (2, _ts("2024-01-01T00:00:00"), "b")],
        "k long, t timestamp, name string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-05T00:00:00"), 10.0, 100),
            (1, _ts("2024-01-09T00:00:00"), 20.0, 101),
            (1, _ts("2024-01-11T00:00:00"), 30.0, 102),  # after left → ignored
            (2, _ts("2024-01-02T00:00:00"), 40.0, 103),  # after left → ignored
        ],
        "k long, t timestamp, v double, eid long",
    )
    out = asof_join(left, right, "k", "k", "t", "t", ["v", "eid"], "eid")
    rows = {r["name"]: r for r in out.collect()}
    assert rows["a"]["asof_v"] == 20.0 and rows["a"]["asof_eid"] == 101
    assert rows["b"]["asof_v"] is None and rows["b"]["asof_t"] is None


def test_asof_equal_ts_inclusive_and_tie_broken_by_max(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-05T00:00:00"), "x")], "k long, t timestamp, name string"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-05T00:00:00"), 1.0, 7),
            (1, _ts("2024-01-05T00:00:00"), 2.0, 9),  # same ts, larger eid wins
        ],
        "k long, t timestamp, v double, eid long",
    )
    out = asof_join(left, right, "k", "k", "t", "t", ["v", "eid"], "eid")
    r = out.collect()[0]
    assert r["asof_eid"] == 9 and r["asof_v"] == 2.0


def test_range_join_boundaries_and_bucket_seams(spark):
    # Interval [00:00, 0:02) with 60s buckets spans two buckets; events
    # at start included, at end excluded, each matched exactly once.
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"))], "k long, start timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), 1),  # == start → in
            (1, _ts("2024-01-01T00:01:30"), 2),  # second bucket → in
            (1, _ts("2024-01-01T00:02:00"), 3),  # == end → out
            (2, _ts("2024-01-01T00:00:30"), 4),  # wrong key → out
        ],
        "k2 long, ts timestamp, eid int",
    )
    out = range_join_bucketed(
        left,
        right,
        "k",
        "k2",
        F.col("start"),
        F.col("start") + F.expr("INTERVAL 2 MINUTES"),
        "ts",
        bucket_seconds=60,
    )
    eids = sorted(r["eid"] for r in out.collect())
    assert eids == [1, 2]


def test_asof_null_payload_comes_from_latest_row_not_older(spark):
    # ADVICE r1: a null payload cell in the latest matching right row
    # must surface as null — not be backfilled from an older right row.
    left = spark.createDataFrame(
        [(1, _ts("2024-01-10T00:00:00"), "x")], "k long, t timestamp, name string"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-05T00:00:00"), 10.0, 100),
            (1, _ts("2024-01-09T00:00:00"), None, 101),  # latest: null v
        ],
        "k long, t timestamp, v double, eid long",
    )
    out = asof_join(left, right, "k", "k", "t", "t", ["v", "eid"], "eid")
    r = out.collect()[0]
    assert r["asof_eid"] == 101
    assert r["asof_v"] is None  # from eid=101, not 10.0 from eid=100


def test_range_join_same_key_names_and_empty_interval(spark):
    # ADVICE r1: identically-named keys must not raise ambiguity, and
    # empty/inverted intervals must produce no candidates.
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T00:02:00")),
            (1, _ts("2024-01-01T01:00:00"), _ts("2024-01-01T01:00:00")),  # empty
            (1, _ts("2024-01-01T02:00:00"), _ts("2024-01-01T01:00:00")),  # inverted
        ],
        "k long, s timestamp, e timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:30"), 1),
            (1, _ts("2024-01-01T01:00:00"), 2),
            (1, _ts("2024-01-01T01:30:00"), 3),
        ],
        "k long, ts timestamp, eid int",
    )
    out = range_join_bucketed(
        left, right, "k", "k", F.col("s"), F.col("e"), "ts", bucket_seconds=60
    )
    assert sorted(r["eid"] for r in out.collect()) == [1]


def test_semi_anti_partition_left(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    right = spark.createDataFrame([(2,), (2,), (4,)], "id long")
    semi, anti = semi_anti_split(left, right, "id")
    assert [r["id"] for r in semi.collect()] == [2]
    assert sorted(r["id"] for r in anti.collect()) == [1, 3]
    # semi never fans out on duplicate right keys
    assert semi.count() == 1
