"""Invariant tests for round33 (type profile + conversion latency) and
the transformWithStateInPandas streaming==batch equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import all_queries
from tests.conftest import SF_DIR


def _q(name):
    return all_queries()[name].fn


def test_type_profile_totals(spark):
    rows = _q("events_user_type_profile")(spark, SF_DIR).collect()
    ev = read_table(spark, SF_DIR, "events")
    assert sum(r.n_events for r in rows) == ev.count()
    n_types_global = ev.select("event_type").distinct().count()
    assert all(1 <= r.n_types <= n_types_global for r in rows)


def test_transform_with_state_equals_batch(spark, tmp_path):
    """The Spark-4 stateful-processor op (ValueState + ListState) must
    arrive at the registry's batch-twin frame after draining the
    events stream; with update mode + availableNow the LAST emitted
    row per user is the final state.

    transformWithState's Python state-server protocol needs
    ``google.protobuf``, which this container does not ship — the op
    is gated the same way as the real media codecs (environment skip,
    logic intact for any protobuf-equipped deployment). Vendoring was
    attempted and is impossible here: the container has no network
    (pip download fails name resolution) and no protobuf wheel is
    baked in, so the end-to-end path runs only on deployments that
    ship protobuf; the processor logic itself is unit-replayed
    below."""
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf not installed (transformWithState protocol)")
    from trackdechets_etl_spark.streaming.events import (
        stream_from_parquet,
        user_type_profile,
    )

    prof = user_type_profile(stream_from_parquet(spark, SF_DIR))
    rows: list = []

    def grab(batch_df, _bid):
        rows.extend(batch_df.collect())

    q = (
        prof.writeStream.foreachBatch(grab)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {}
    for r in rows:  # later batches overwrite earlier states
        got[r.user_id] = (r.n_events, r.n_types)
    want = {
        r.user_id: (r.n_events, r.n_types)
        for r in _q("events_user_type_profile")(spark, SF_DIR).collect()
    }
    assert got == want


def test_time_to_first_purchase_decile_shape(spark):
    """Deciles are complete and ordered: 10 rows, monotone min/max
    bands, user counts within 1 of each other (ntile balance), total
    users equals the converter count."""
    rows = _q("events_time_to_first_purchase")(spark, SF_DIR).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    for r in rows:
        assert 0 <= r.min_latency_s <= r.max_latency_s
    for a, b in zip(rows, rows[1:]):
        assert a.max_latency_s <= b.min_latency_s
    counts = [r.n_users for r in rows]
    assert max(counts) - min(counts) <= 1

    ev = read_table(spark, SF_DIR, "events")
    n_conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(counts) == n_conv


def test_type_profile_step_replays_to_batch_twin(spark):
    """Drive the extracted state-transition step over real per-user
    micro-batch splits (4 chunks) and check the final states equal the
    batch twin — the protobuf-free verification of the
    transformWithState logic."""
    import pandas as pd

    ev = (
        read_table(spark, SF_DIR, "events")
        .select("user_id", "event_type", (F.col("event_id") % 4).alias("chunk"))
        .collect()
    )
    from collections import defaultdict

    from trackdechets_etl_spark.streaming.events import _type_profile_step

    per_user_chunks = defaultdict(lambda: defaultdict(list))
    for r in ev:
        per_user_chunks[r.user_id][r.chunk].append(r.event_type)

    finals = {}
    for uid, chunks in per_user_chunks.items():
        n, seen = 0, set()
        for c in sorted(chunks):
            pdf = pd.DataFrame({"event_type": chunks[c]})
            n, _new, out = _type_profile_step(uid, n, seen, [pdf])
            assert out.loc[0, "n_events"] == n
        finals[uid] = (n, len(seen))

    want = {
        r.user_id: (r.n_events, r.n_types)
        for r in _q("events_user_type_profile")(spark, SF_DIR).collect()
    }
    assert finals == want
