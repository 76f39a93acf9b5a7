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
    vc = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*gc, value_col)
        .agg(F.count(F.lit(1)).alias("__cnt"))
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
    res = g.select(*gc, *outs)
    if gc:
        # A group whose values are ALL NULL vanished at the isNotNull
        # pre-filter, but F.percentile (and DuckDB quantile_cont) keep
        # the group row with a NULL percentile. Re-seat such groups via
        # a left join from the full group domain (null-safe equality so
        # NULL group KEYS still match their computed row); on data with
        # no all-NULL groups this is a no-op on values and the extra
        # agg is over the already-shuffled group keys (map-side
        # combined, group-domain-sized — never row-sized).
        groups = df.select(*gc).distinct()
        renamed = res.select(
            *[F.col(c).alias(f"__pg_{c}") for c in gc],
            *aliases,
        )
        cond = None
        for c in gc:
            eq = F.col(c).eqNullSafe(F.col(f"__pg_{c}"))
            cond = eq if cond is None else cond & eq
        res = groups.join(renamed, cond, "left").select(*gc, *aliases)
    return res
