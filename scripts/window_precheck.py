"""Pre-drive the driver's verification window: selfcheck exactly the
FIRST 50 registry entries (the set the driver will record in
CORRECTNESS_r{N}) at the driver's sf0.01 scale, in one command.

Usage:
    python scripts/window_precheck.py          # first 50 (driver window)
    WINDOW=80 python scripts/window_precheck.py  # first N instead

Exit status comes from selfcheck_sf001 (1 on any mismatch), so this is
the end-of-round gate: green here means the driver's window cannot
surprise."""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trackdechets_etl_spark.queries import all_queries


def main() -> None:
    n = int(os.environ.get("WINDOW", "50"))
    names = list(all_queries())[:n]
    print(f"pre-driving the first {len(names)} registry entries at sf0.01")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "selfcheck_sf001.py"),
            *names,
        ]
    )
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
