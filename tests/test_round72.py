"""Invariant test for round72 (Cramér–von Mises) — independent Python
replay at sf0.001."""

from __future__ import annotations

from collections import Counter

import pytest

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from trackdechets_etl_spark.session import get_spark

    return get_spark()


def test_cvm_matches_replay(spark):
    rows = read_table(spark, SF_DIR, "events").select(
        "user_id", "value"
    ).collect()
    c0, c1 = Counter(), Counter()
    for r in rows:
        cents = int(round(r.value * 100))
        (c0 if r.user_id % 2 == 0 else c1)[cents] += 1
    n0, n1 = sum(c0.values()), sum(c1.values())
    f0 = f1 = 0
    t = 0.0
    for v in sorted(set(c0) | set(c1)):
        f0 += c0.get(v, 0)
        f1 += c1.get(v, 0)
        g = (f0 * n1 - f1 * n0) / (n0 * n1)
        t += (c0.get(v, 0) + c1.get(v, 0)) * g * g
    cvm = n0 * n1 / (n0 + n1) ** 2 * t
    out = all_queries()["events_cramer_von_mises"].fn(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n0, r.n1) == (n0, n1)
    assert abs(r.cvm_stat - cvm) < 1e-5
    # the statistic is a non-negative L² functional; under the null
    # (parity split of identical distributions) it stays small —
    # far below the n/6-scale a fully-separated pair would produce
    assert 0.0 <= r.cvm_stat < (n0 + n1) / 6.0
