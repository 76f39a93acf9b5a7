"""Full-registry scaling sweep (VERDICT r5 item 4): time every
registry query at sf0.001 / sf0.01 / sf0.1 and report each query's
100x wall-clock ratio — the measured answer to "would this plan
survive a scale-up", extended from the 22 headline queries to all of
them.

Outliers (ratio > 3x on the first pass) are re-measured with two more
passes at both endpoints and the minimum is kept, so a co-tenant burst
on this shared box cannot brand a query superlinear. Writes one JSON
blob to scripts/scaling_sweep.json and prints the worst ratios.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from trackdechets_etl_spark.queries import all_queries
from trackdechets_etl_spark.session import get_spark

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def run_once(fn, spark, sf_dir) -> float:
    start = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - start


def main() -> None:
    spark = get_spark(app_name="scaling_sweep")
    registry = all_queries()
    # Warm the JVM + python worker pool once.
    registry["flagship_revenue_by_nation"].fn(spark, SFS[0]).count()
    spark.range(64).mapInPandas(lambda it: it, "id long").count()

    times: dict[str, dict[str, float]] = {}
    names = list(registry)
    for i, name in enumerate(names):
        fn = registry[name].fn
        times[name] = {}
        for sf_dir in SFS:
            try:
                times[name][sf_dir] = run_once(fn, spark, sf_dir)
            except Exception as e:  # record, keep sweeping
                times[name][sf_dir] = float("nan")
                print(f"# {name} @ {sf_dir}: ERROR {e}", file=sys.stderr)
        print(
            f"# [{i+1}/{len(names)}] {name}: "
            + " ".join(f"{times[name][s]:.2f}" for s in SFS),
            file=sys.stderr,
        )

    # Re-measure outliers: min of 3 total passes at both endpoints.
    for name in names:
        t = times[name]
        if t[SFS[2]] != t[SFS[2]] or t[SFS[0]] != t[SFS[0]]:
            continue
        if t[SFS[2]] / t[SFS[0]] > 3.0:
            for sf_dir in (SFS[0], SFS[2]):
                best = t[sf_dir]
                for _ in range(2):
                    best = min(best, run_once(registry[name].fn, spark, sf_dir))
                t[sf_dir] = best
            print(
                f"# remeasured {name}: {t[SFS[0]]:.2f} -> {t[SFS[2]]:.2f} "
                f"(ratio {t[SFS[2]]/t[SFS[0]]:.2f})",
                file=sys.stderr,
            )

    out = {
        name: {
            "sf0.001": round(t[SFS[0]], 3),
            "sf0.01": round(t[SFS[1]], 3),
            "sf0.1": round(t[SFS[2]], 3),
            "ratio_100x": round(t[SFS[2]] / t[SFS[0]], 2)
            if t[SFS[0]] == t[SFS[0]] and t[SFS[2]] == t[SFS[2]]
            else None,
        }
        for name, t in times.items()
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "scaling_sweep.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)

    ranked = sorted(
        (v["ratio_100x"], k) for k, v in out.items() if v["ratio_100x"]
    )
    print(json.dumps({
        "n_queries": len(out),
        "worst10": [
            {"name": k, **out[k]} for r, k in ranked[-10:][::-1]
        ],
        "median_ratio": ranked[len(ranked) // 2][0],
        "total_sf0.1": round(sum(t[SFS[2]] for t in times.values()
                                 if t[SFS[2]] == t[SFS[2]]), 1),
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
