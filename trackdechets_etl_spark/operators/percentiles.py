"""Distributed exact interpolated percentiles via value counts.

Spark's built-in ``percentile`` aggregate is already a value→count map
internally, but its final merge + sort runs in ONE reducer per group:
with a handful of groups (e.g. 3 return flags) the whole column funnels
through 3 tasks, which is why the exact-percentile registry entries
showed the worst 100×-extrapolation decade ratios (~7.5×/decade).

This operator keeps the math bit-identical to Spark ``percentile``
(and therefore to the DuckDB ``quantile_cont`` oracles the registry
pairs it with) while distributing the heavy part:

1. ``groupBy(group, value).count()`` — fully parallel, map-side
   combined; the shuffle carries DISTINCT (group, value) pairs, not
   rows.
2. One window pass per group ordered by value gives each distinct
   value its covered rank range ``[ccnt - cnt, ccnt)`` plus the group
   total ``n`` (an unordered max over the same partition — no extra
   shuffle).
3. For each requested fraction q: position ``p = (n-1)·q`` (double),
   bracketing ranks ``lo = floor(p)``, ``hi = ceil(p)``; the bracketing
   VALUES fall out of one conditional-max aggregate over the ranked
   counts, and the interpolation replicates Spark's exact expression
   ``vlo·(hi−p) + vhi·(p−lo)`` (``vlo`` alone when ``lo == hi``) so
   results are bit-identical to ``F.percentile``.

Residual serial term: the per-group cumulative count sorts the
DISTINCT values of one group in one task. That is domain-bounded
(price grid, latency buckets, …) rather than row-count-bounded, which
is the property that makes exact percentiles survive 100 TB; a truly
unbounded continuous domain should use the ``percentile_approx``
t-digest twins instead (see queries/scale.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_percentiles_value_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    fractions: Sequence[float],
    aliases: Sequence[str],
) -> DataFrame:
    """One row per group: ``group_cols`` + one unrounded double column
    per (fraction, alias) pair, exactly equal to
    ``F.percentile(value_col, fraction)`` per group."""
    if len(fractions) != len(aliases):
        raise ValueError("fractions and aliases must pair up")
    gc = list(group_cols)
    clash = set(aliases) & set(gc)
    if clash:
        raise ValueError(
            "exact_percentiles_value_counts: output aliases must not"
            f" collide with group columns (got {sorted(clash)}); the"
            " all-NULL-group re-seat join selects both"
        )
    if any(a.startswith("__pg_") for a in aliases):
        raise ValueError(
            "exact_percentiles_value_counts: aliases must not use the"
            " reserved '__pg_' prefix (internal re-seat join names)"
        )
    # ONE aggregate, NO null pre-filter (r13 advice — the old
    # df.select(gc).distinct() re-seat domain was a second full
    # scan+shuffle of the raw input). count(value_col) gives the
    # NULL-value group row __cnt = 0, so it flows through the whole
    # pipeline contributing nothing: it sorts first (NULLS FIRST),
    # covers the empty rank range [0, 0), and never satisfies the
    # bracketing predicate. A group whose values are ALL NULL keeps
    # exactly this one row with __n = 0, making p = -q, whose bracket
    # row doesn't exist — the conditional maxes return NULL, which is
    # precisely F.percentile's (and quantile_cont's) answer for such a
    # group. The re-seat join the old shape needed disappears
    # entirely (plan-asserted in tests/test_operators.py).
    vc = df.groupBy(*gc, value_col).agg(
        F.count(value_col).alias("__cnt")
    )
    if gc:
        word = Window.partitionBy(*gc).orderBy(value_col)
        wall = Window.partitionBy(*gc)
        ranked = vc.withColumn(
            "__ccnt", F.sum("__cnt").over(word)
        ).withColumn("__n", F.max(F.col("__ccnt")).over(wall))
    else:
        # Global percentiles: no partition key to ride, and a bare
        # Window.orderBy would funnel every distinct value through ONE
        # task. Use the range-partitioned exact prefix sum instead
        # (integer counts — the decomposition is bit-identical), with
        # the 1-row total broadcast back on.
        from trackdechets_etl_spark.operators.ranking import (
            global_row_number,
        )

        ranked = global_row_number(
            vc,
            [F.asc(value_col)],
            rank_col="__vc_rank",
            sum_of=("__cnt", "__ccnt"),
        ).drop("__vc_rank")
        tot = vc.agg(F.sum("__cnt").cast("long").alias("__n"))
        ranked = ranked.crossJoin(F.broadcast(tot))

    aggs = []
    for i, q in enumerate(fractions):
        p = (F.col("__n") - 1).cast("double") * F.lit(float(q))
        lo = F.floor(p)
        hi = F.ceil(p)
        start = F.col("__ccnt") - F.col("__cnt")
        aggs += [
            F.max(
                F.when(
                    (start <= lo) & (F.col("__ccnt") > lo),
                    F.col(value_col),
                )
            ).alias(f"__vlo{i}"),
            F.max(
                F.when(
                    (start <= hi) & (F.col("__ccnt") > hi),
                    F.col(value_col),
                )
            ).alias(f"__vhi{i}"),
            F.min(p).alias(f"__p{i}"),
        ]
    g = ranked.groupBy(*gc).agg(*aggs)

    outs = []
    for i, name in enumerate(aliases):
        p = F.col(f"__p{i}")
        lo = F.floor(p)
        hi = F.ceil(p)
        vlo = F.col(f"__vlo{i}")
        vhi = F.col(f"__vhi{i}")
        outs.append(
            F.when(lo == hi, vlo)
            .otherwise(
                vlo * (hi.cast("double") - p)
                + vhi * (p - lo.cast("double"))
            )
            .alias(name)
        )
    return g.select(*gc, *outs)
