"""Targeted re-measurement of named registry queries at one or more
scale factors — the surgical sibling of scaling_sweep.py for
refreshing individual entries after a plan change without paying for
the full 396-query sweep.

Usage:
    python scripts/time_queries.py q1 q2 ...            # sf0.001 + sf0.1
    SFS=sf0.1 REPS=3 python scripts/time_queries.py q1  # one SF, 3 reps

Prints per-query times (all reps) and the min, plus the 100x decade
ratio when both endpoints are measured. Does NOT write
scaling_sweep.json — paste refreshed numbers there deliberately.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trackdechets_etl_spark.queries import all_queries
from trackdechets_etl_spark.session import get_spark

SFS = [
    f"/root/testdata/{s}"
    for s in os.environ.get("SFS", "sf0.001,sf0.1").split(",")
]
REPS = int(os.environ.get("REPS", "3"))


def run_once(fn, spark, sf_dir) -> float:
    start = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - start


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        sys.exit(2)
    spark = get_spark(app_name="time_queries")
    registry = all_queries()
    unknown = [n for n in names if n not in registry]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    # Warm JVM + python worker pool once.
    registry["flagship_revenue_by_nation"].fn(spark, SFS[0]).count()
    spark.range(64).mapInPandas(lambda it: it, "id long").count()

    for name in names:
        fn = registry[name].fn
        mins = {}
        for sf_dir in SFS:
            # One untimed throwaway per (query, sf_dir): absorbs
            # first-read page cache + planner warm-up so min-of-REPS
            # is comparable across SFs even at REPS=1.
            run_once(fn, spark, sf_dir)
            samples = [run_once(fn, spark, sf_dir) for _ in range(REPS)]
            mins[sf_dir] = min(samples)
            print(
                f"{name} @ {os.path.basename(sf_dir)}: "
                + " ".join(f"{s:.2f}" for s in samples)
                + f"  min={mins[sf_dir]:.2f}"
            )
        lo = "/root/testdata/sf0.001"
        hi = "/root/testdata/sf0.1"
        if lo in mins and hi in mins:
            print(f"{name} ratio_100x = {mins[hi] / mins[lo]:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
