"""Grid-bucketed spatial join — the distance-join operator Spark lacks.

A naive "all pairs within radius r" join is a cross product with a
distance filter — quadratic, and Catalyst can only run it as a
BroadcastNestedLoopJoin. The standard scalable shape (the same bucketing
idea as the MinHash/LSH dedup operators in ``llm/dedup.py``) is:

1. hash each point of side A to its grid cell ``(x // cell, y // cell)``;
2. replicate each point of side B to its cell AND the 8 neighbors
   (a constant 9× blow-up of the smaller side);
3. equi-join on the cell key — hash-partitioned, no pair explosion;
4. refine with the exact distance predicate.

Correct whenever ``cell >= r``: any point within distance r of p lies
in the 3×3 neighborhood of p's cell, so the candidate set is a strict
superset of the answer and step 4 makes it exact. Per-cell work is
bounded by local point density, not corpus size — the property that
survives 100 TB (skewed cells are ordinary hot keys; AQE skew-join
splits them).

Coordinates here are integers and the refine predicate compares squared
integer distances, so the operator is float-free and its results are
engine-exact (the DuckDB oracle runs the naive inequality join and must
hash-match).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NEIGHBOR_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def grid_join_within_radius(
    left: DataFrame,
    right: DataFrame,
    left_xy: tuple[str, str],
    right_xy: tuple[str, str],
    radius: int,
    cell: int | None = None,
) -> DataFrame:
    """All (left, right) pairs with squared euclidean distance
    ``<= radius**2``, via the grid + neighbor-replication plan above.

    ``left`` should be the larger side (hashed to one cell each);
    ``right`` is replicated 9×. Returns ``left.* , right.*`` for the
    qualifying pairs. ``cell`` defaults to ``radius`` (the minimum
    correct width; larger cells trade candidate count for fewer cells).
    """
    if cell is None:
        cell = radius
    if cell < radius:
        raise ValueError(f"cell ({cell}) must be >= radius ({radius})")
    lx, ly = (F.col(c) for c in left_xy)
    rx, ry = (F.col(c) for c in right_xy)

    def cell_of(x: Column, y: Column) -> Column:
        # floor-div on possibly-negative ints: SQL int division truncates
        # toward zero, so shift into the positive range first (coords
        # here are bounded; callers with unbounded coords should use a
        # true floordiv). 1<<20 cells of slack on each side.
        off = F.lit((1 << 20) * cell)
        return F.concat_ws(
            ":",
            F.floor((x + off) / cell).cast("long"),
            F.floor((y + off) / cell).cast("long"),
        )

    l_cells = left.withColumn("__cell", cell_of(lx, ly))
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _NEIGHBOR_OFFSETS
        ]
    )
    r_cells = (
        right.withColumn("__o", F.explode(offsets))
        .withColumn(
            "__cell",
            cell_of(rx + F.col("__o.dx") * cell, ry + F.col("__o.dy") * cell),
        )
        .drop("__o")
    )
    d2 = (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry)
    return (
        l_cells.join(r_cells, "__cell")
        .filter(d2 <= radius * radius)
        .drop("__cell")
    )
