"""Batch merge (upsert) and time-grid gap filling.

The reference's only sink semantics is full replace
(``to_sql(if_exists='replace')``, ``dags/icpe-siretisation.py:380``) —
at 100 TB a full rewrite per run is not an option, so the engine
provides the incremental primitive: MERGE expressed as a full-outer
join + coalesce (SCD1: changes win, unmatched base rows survive,
brand-new keys insert). On a lakehouse table format this maps to
``MERGE INTO``; the DataFrame form here is the format-agnostic
equivalent and shuffles both sides once on the key.

Gap filling regularizes an event stream onto a fixed time grid (the
missing-bucket → zero step every downstream window/ML feature join
needs). The grid is built from ONE aggregate row via ``sequence`` +
``explode`` — no driver-side date loop, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    payload_cols: list[str],
) -> DataFrame:
    """SCD1 merge: rows in ``changes`` overwrite same-key rows in
    ``base``; keys only in ``base`` pass through; keys only in
    ``changes`` insert. One full-outer shuffle join on the key; at
    scale, pre-bucketing both sides by the key makes it shuffle-free."""
    b = base.select(
        F.col(key), *[F.col(c).alias(f"__b_{c}") for c in payload_cols]
    )
    c = changes.select(
        F.col(key), *[F.col(cc).alias(f"__c_{cc}") for cc in payload_cols]
    )
    merged = b.join(c, key, "full_outer")
    return merged.select(
        F.col(key),
        *[
            F.coalesce(F.col(f"__c_{cc}"), F.col(f"__b_{cc}")).alias(cc)
            for cc in payload_cols
        ],
    )


_BUCKET_UNIT_SECONDS = {
    "second": 1,
    "seconds": 1,
    "minute": 60,
    "minutes": 60,
    "hour": 3600,
    "hours": 3600,
    "day": 86400,
    "days": 86400,
    "week": 604800,
    "weeks": 604800,
}


def _bucket_seconds(bucket: str) -> int:
    """Parse '30 minutes' / '1 hour' / '2 days' into whole seconds."""
    parts = bucket.strip().split()
    if len(parts) != 2 or not parts[0].isdigit():
        raise ValueError(f"unsupported bucket spec: {bucket!r}")
    n, unit = int(parts[0]), parts[1].lower()
    if unit not in _BUCKET_UNIT_SECONDS:
        raise ValueError(f"unsupported bucket unit: {bucket!r}")
    return n * _BUCKET_UNIT_SECONDS[unit]


def gap_fill_grid(
    events: DataFrame,
    ts_col: str,
    group_col: str,
    value_col: str = "value",
    bucket: str = "1 hour",
) -> DataFrame:
    """Regularize events onto a complete (group × time-bucket) grid:
    every bucket between the corpus min and max appears for every
    group, with zero-filled aggregates where no events landed.

    Event bucketing is arithmetic — floor(epoch / width) * width — so it
    aligns with the grid for ANY ``bucket`` width (not just '1 hour');
    both sides derive from the same width.

    The grid is sequence(min_bucket, max_bucket, interval) exploded
    from a single aggregate row, cross-joined with the distinct groups
    (both tiny → broadcast); observed per-bucket aggregates left-join
    onto it. No driver loops; the only shuffle is the groupBy."""
    secs = _bucket_seconds(bucket)
    bucketed = events.withColumn(
        "__bucket",
        F.timestamp_seconds(
            F.floor(F.unix_timestamp(F.col(ts_col)) / secs).cast("long") * secs
        ),
    )
    bounds = bucketed.agg(
        F.min("__bucket").alias("lo"), F.max("__bucket").alias("hi")
    )
    grid_times = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr(f"INTERVAL {bucket}"))
        ).alias("bucket_ts")
    )
    groups = events.select(F.col(group_col)).distinct()
    grid = F.broadcast(grid_times).crossJoin(F.broadcast(groups))
    observed = bucketed.groupBy(
        F.col("__bucket").alias("bucket_ts"), F.col(group_col)
    ).agg(
        F.count("*").alias("__n"),
        F.sum(value_col).alias("__sum"),
    )
    return grid.join(observed, ["bucket_ts", group_col], "left").select(
        "bucket_ts",
        group_col,
        F.coalesce("__n", F.lit(0)).alias("n_events"),
        F.round(F.coalesce("__sum", F.lit(0.0)), 2).alias("sum_value"),
    )


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    payload_cols: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Apply an ordered CDC change stream to a snapshot — the MERGE
    ``merge_upsert`` cannot express because it has no delete channel.

    ``changes`` rows carry an operation ('I'nsert / 'U'pdate /
    'D'elete) and a monotone sequence number. Per key only the LAST
    change by ``seq_col`` decides (the A1 keep-last discipline —
    intermediate history is irrelevant to final state): a final D
    removes the key even if it exists in ``base``; a final I/U upserts
    its payload. Keys untouched by the stream pass through.

    One keep-last window on the changes (keyed, partition-parallel)
    plus one full-outer key join; with both sides bucketed by the key
    the join is shuffle-free — identical scale posture to
    :func:`merge_upsert`.

    Reference parity: the reference's pipelines are full-refresh only
    (dags/publish-open-data.py re-reads the world); CDC apply is the
    incremental path a large deployment needs.
    """
    from trackdechets_etl_spark.operators.dedup import keep_last_by

    last = keep_last_by(changes, [key], [seq_col])
    b = base.select(
        F.col(key), *[F.col(c).alias(f"__b_{c}") for c in payload_cols]
    )
    c = last.select(
        F.col(key),
        F.col(op_col).alias("__op"),
        *[F.col(cc).alias(f"__c_{cc}") for cc in payload_cols],
    )
    merged = b.join(c, key, "full_outer")
    return merged.filter(
        F.col("__op").isNull() | (F.col("__op") != "D")
    ).select(
        F.col(key),
        *[
            F.when(F.col("__op").isNotNull(), F.col(f"__c_{cc}"))
            .otherwise(F.col(f"__b_{cc}"))
            .alias(cc)
            for cc in payload_cols
        ],
    )
