"""Temporal join operators: as-of join and time-bucketed range join.

The reference has no temporal joins (SURVEY §2.3 — single-key equi-joins
only); these are scale extensions in the spirit of the driver's `events`
table, built the way a 100 TB Spark deployment would:

- **As-of join** uses the *union trick*, not a key+range join: both
  sides are unioned into one keyed timeline, a single window pass
  carries the most recent right-side row forward, and left rows read it
  with ``last_value(ignorenulls=True)``. Cost: ONE shuffle on the key,
  zero join fanout — the standard alternative (equi-join on key with a
  ``ts <= asof_ts`` predicate, then keep-latest) materializes every
  (left, earlier-right) pair, which explodes quadratically on hot keys.
- **Range join** buckets time: each right row lands in one
  fixed-width bucket, each left interval explodes to the (few) buckets
  it covers, and the join becomes an equi-join on (key, bucket) with an
  exact residual predicate. Spark's planner would otherwise run
  key-equi + post-filter, fine at small fanout but unbounded on long
  intervals; bucketing caps per-row join work at
  O(interval / bucket_width).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tie_col: str,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the latest right row with the same key
    and ``right_ts <= left_ts`` (ties on ``right_ts`` broken by the
    larger ``tie_col``). Returns all left columns plus
    ``{prefix}{right_ts}`` and ``{prefix}{col}`` for each payload col;
    unmatched left rows get nulls (left-outer as-of semantics).

    Union-trick implementation: one shuffle on the key, no fanout.
    """
    carried = [right_ts, *payload_cols]
    # All carried columns travel in ONE struct with ONE
    # last(ignorenulls=True): every attached value comes from the same
    # right row even when individual payload cells are null (per-column
    # carries could mix rows).
    r = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__is_right"),
        F.col(tie_col).alias("__tie"),
        F.struct(*[F.col(c).alias(c) for c in carried]).alias("__r"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(r.schema["__tie"].dataType).alias("__tie"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    # Right rows sort BEFORE left rows at equal ts (<= semantics), and
    # among equal-ts right rows the largest tie_col wins (sorts last).
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_right").desc(), F.col("__tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = r.unionByName(l).withColumn(
        "__r", F.last("__r", ignorenulls=True).over(w)
    )
    out = unioned.filter(F.col("__is_right") == 0).select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col("__r")[c].alias(f"{prefix}{c}") for c in carried],
    )
    return out


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_start: Column,
    left_end: Column,
    right_ts: str,
    bucket_seconds: int,
) -> DataFrame:
    """Inner join of left intervals ``[left_start, left_end)`` to right
    events at ``right_ts`` on matching keys, via time bucketing: the
    equi-join runs on (key, bucket) and an exact residual predicate
    keeps only true range hits. Each right row has exactly one bucket,
    so no post-join dedup is needed. Returns left ⨝ right columns.
    """
    lb = left.withColumn("__start", left_start).withColumn("__end", left_end)
    # Empty/inverted intervals can match nothing — drop them up front so
    # sequence() never runs start > stop (which would emit a descending
    # bucket list of spurious candidates).
    lb = lb.filter(F.col("__end") > F.col("__start"))
    lb = lb.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp("__start") / bucket_seconds),
                F.floor((F.unix_timestamp("__end") - 1) / bucket_seconds),
            )
        ),
    )
    rb = right.withColumn(
        "__bucket", F.floor(F.unix_timestamp(F.col(right_ts)) / bucket_seconds)
    )
    joined = lb.join(
        rb,
        # Anchor key refs to their frames: identically-named keys on both
        # sides would otherwise make the condition ambiguous.
        (lb[left_key] == rb[right_key]) & (lb["__bucket"] == rb["__bucket"]),
        "inner",
    ).filter((F.col(right_ts) >= F.col("__start")) & (F.col(right_ts) < F.col("__end")))
    return joined.drop("__start", "__end", "__bucket")


def semi_anti_split(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    marker_col: str = "membership",
) -> tuple[DataFrame, DataFrame]:
    """Left-semi and left-anti halves of ``left`` against ``right`` —
    the explicit existence-join pair generalizing J5 (reference
    ``dags/publish-open-data.py:75-79``). Both are shuffle joins on the
    key with no payload from the right side; Spark's planner converts
    to broadcast semi/anti when the right side is small."""
    semi = left.join(right, on, "left_semi").withColumn(marker_col, F.lit("present"))
    anti = left.join(right, on, "left_anti").withColumn(marker_col, F.lit("absent"))
    return semi, anti


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tie_col: str,
    tolerance: str = "24 hours",
    prefix: str = "asof_",
) -> DataFrame:
    """Point-in-time as-of join with a staleness bound — the feature-
    store contract: attach the latest right row at or before the left
    timestamp, but NULL the attachment when it is older than
    ``tolerance`` (a stale feature is worse than a missing one). The
    latest-within-tolerance row IS the latest-overall row when fresh,
    so this is a post-pass over :func:`asof_join` — same single
    shuffle, no extra plan cost."""
    out = asof_join(
        left,
        right,
        left_key=left_key,
        right_key=right_key,
        left_ts=left_ts,
        right_ts=right_ts,
        payload_cols=payload_cols,
        tie_col=tie_col,
        prefix=prefix,
    )
    fresh = F.col(f"{prefix}{right_ts}") >= F.col(left_ts) - F.expr(
        f"INTERVAL {tolerance}"
    )
    for c in [right_ts, *payload_cols]:
        out = out.withColumn(
            f"{prefix}{c}", F.when(fresh, F.col(f"{prefix}{c}"))
        )
    return out
