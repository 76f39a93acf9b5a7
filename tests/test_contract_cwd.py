"""Driver-contract regression guard: the entry module must work when
the driving process runs OUTSIDE the repo root (the harness does not
promise its cwd). The failure class this guards: closures shipped to
Python workers that reference repo modules by path (cloudpickle
serializes module-level function refs by module name, and the workers
may not have the repo on PYTHONPATH).

Runs the two Python-worker-path queries (mapInPandas decode,
applyInPandas centroids) plus the smoke entry in a subprocess with
cwd=/tmp and only sys.path pointing at the repo.
"""

from __future__ import annotations

import pytest

import subprocess
import sys

# r15: slow shard — excluded from the default pytest run (see
# pytest.ini); run the full suite with -m "slow or not slow".
pytestmark = pytest.mark.slow

SCRIPT = """
import sys
sys.path.insert(0, "/root/repo")
import __spark_entry__ as E
from trackdechets_etl_spark.session import get_spark

spark = get_spark(app_name="cwd-contract", master="local[4]", shuffle_partitions=4)
assert E.entry(spark).count() > 0
qs = E.queries()
for name in ("multimodal_decode", "embedding_label_centroids"):
    n = qs[name](spark, "/root/testdata/sf0.001").count()
    assert n > 0, name
spark.stop()
print("CWD_CONTRACT_OK")
"""


def test_entry_contract_from_foreign_cwd():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "CWD_CONTRACT_OK" in out.stdout, out.stderr[-2000:]


PLAIN_SCRIPT = """
import hashlib, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import __spark_entry__ as E

# PLAIN session: no engine configs (no UTC tz, no nanosAsLong, no AQE
# tuning) — exactly what an external driver might build.
spark = (
    SparkSession.builder.master("local[4]")
    .appName("plain-contract")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
qs = E.queries()
for name in sys.argv[1:]:
    rows = qs[name](spark, "/root/testdata/sf0.001").collect()
    lines = sorted("|".join(repr(v) for v in r) for r in rows)
    h = hashlib.md5("\\n".join(lines).encode()).hexdigest()
    print(f"HASH {name} {h}")
spark.stop()
"""

TS_QUERIES = [
    "events_tumbling_hourly",
    "events_sessionize_ids",
    "date_functions",
    "scalar_cast_date",
    "events_scd2_validity",
]


def test_plain_session_matches_engine_session(spark):
    """Timestamp-sensitive queries must produce identical values under
    a bare caller-built SparkSession (no UTC/legacy/AQE engine confs)
    as under the engine session — the driver does not promise to use
    our session factory."""
    import hashlib

    from trackdechets_etl_spark.queries import all_queries

    out = subprocess.run(
        [sys.executable, "-c", PLAIN_SCRIPT, *TS_QUERIES],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=600,
    )
    plain = dict(
        line.split()[1:3]
        for line in out.stdout.splitlines()
        if line.startswith("HASH ")
    )
    assert set(plain) == set(TS_QUERIES), out.stderr[-2000:]
    reg = all_queries()
    for name in TS_QUERIES:
        rows = reg[name].fn(spark, "/root/testdata/sf0.001").collect()
        lines = sorted("|".join(repr(v) for v in r) for r in rows)
        h = hashlib.md5("\n".join(lines).encode()).hexdigest()
        assert plain[name] == h, f"{name}: plain-session result differs"
