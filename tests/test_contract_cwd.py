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

import subprocess
import sys

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
