"""Canonical row normalization shared by the verification probes.

Exact-repr float compare (no rounding, no tolerance): these helpers
back the invariance gates (`scripts/partition_invariance.py`,
`scripts/strategy_invariance.py`), which exist specifically to detect
sub-epsilon float drift between execution regimes — canonicalization
looser than the driver's value hash would let the drift pass. One
definition so the gates can never disagree about what "bit-identical"
means.
"""

from __future__ import annotations

import math


def norm_val(v) -> str:
    if v is None:
        return "~"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def canon(rows, cols) -> list[tuple[str, ...]]:
    """Order-insensitive canonical form: columns sorted by name, rows
    sorted by their normalized string tuple."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_val(r[i]) for i in order) for r in rows)
