"""merge_upsert SCD1 semantics and gap_fill_grid bucket alignment —
including the ADVICE r1 regression: non-hour bucket widths must bucket
events on the same grid they generate (no zero-filled rows where events
exist).
"""

from __future__ import annotations

from datetime import datetime

import pytest

from trackdechets_etl_spark.operators.merge import (
    _bucket_seconds,
    gap_fill_grid,
    merge_upsert,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _events(spark):
    return spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T00:05:00"), 1.0),
            ("a", _ts("2024-01-01T00:40:00"), 2.0),
            ("a", _ts("2024-01-01T02:10:00"), 4.0),
            ("b", _ts("2024-01-01T01:20:00"), 8.0),
        ],
        "g string, ts timestamp, value double",
    )


def test_bucket_seconds_parsing():
    assert _bucket_seconds("1 hour") == 3600
    assert _bucket_seconds("30 minutes") == 1800
    assert _bucket_seconds("2 days") == 172800
    with pytest.raises(ValueError):
        _bucket_seconds("1 fortnight")
    with pytest.raises(ValueError):
        _bucket_seconds("hourly")


def test_gap_fill_hourly_grid_zero_fills(spark):
    out = {
        (r["g"], r["bucket_ts"].isoformat()): (r["n_events"], r["sum_value"])
        for r in gap_fill_grid(_events(spark), "ts", "g").collect()
    }
    # 3 hourly buckets x 2 groups = 6 rows
    assert len(out) == 6
    assert out[("a", "2024-01-01T00:00:00")] == (2, 3.0)
    assert out[("a", "2024-01-01T01:00:00")] == (0, 0.0)
    assert out[("a", "2024-01-01T02:00:00")] == (1, 4.0)
    assert out[("b", "2024-01-01T01:00:00")] == (1, 8.0)


def test_gap_fill_30min_bucket_aligns_events_with_grid(spark):
    # ADVICE r1: with bucket='30 minutes' the events at 00:40 and 02:10
    # must land in their half-hour buckets, not be hour-truncated.
    out = {
        (r["g"], r["bucket_ts"].isoformat()): (r["n_events"], r["sum_value"])
        for r in gap_fill_grid(_events(spark), "ts", "g", bucket="30 minutes").collect()
    }
    # grid 00:00..02:00 inclusive = 5 half-hour buckets x 2 groups
    assert len(out) == 10
    assert out[("a", "2024-01-01T00:00:00")] == (1, 1.0)
    assert out[("a", "2024-01-01T00:30:00")] == (1, 2.0)
    assert out[("a", "2024-01-01T01:00:00")] == (0, 0.0)
    assert out[("a", "2024-01-01T02:00:00")] == (1, 4.0)
    assert out[("b", "2024-01-01T01:00:00")] == (1, 8.0)
    # every observed event is represented: totals preserved
    assert sum(n for n, _ in out.values()) == 4
    assert sum(v for _, v in out.values()) == 15.0


def test_gap_fill_daily_bucket(spark):
    events = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T23:00:00"), 1.0),
            ("a", _ts("2024-01-03T01:00:00"), 2.0),
        ],
        "g string, ts timestamp, value double",
    )
    out = {
        r["bucket_ts"].isoformat(): (r["n_events"], r["sum_value"])
        for r in gap_fill_grid(events, "ts", "g", bucket="1 day").collect()
    }
    assert out == {
        "2024-01-01T00:00:00": (1, 1.0),
        "2024-01-02T00:00:00": (0, 0.0),
        "2024-01-03T00:00:00": (1, 2.0),
    }


def test_merge_upsert_scd1(spark):
    base = spark.createDataFrame(
        [(1, "old", 10.0), (2, "keep", 20.0)], "k long, name string, v double"
    )
    changes = spark.createDataFrame(
        [(1, "new", 11.0), (3, "ins", 30.0)], "k long, name string, v double"
    )
    out = {
        r["k"]: (r["name"], r["v"])
        for r in merge_upsert(base, changes, "k", ["name", "v"]).collect()
    }
    assert out == {1: ("new", 11.0), 2: ("keep", 20.0), 3: ("ins", 30.0)}
