"""Invariant tests for the round-5 twenty-second batch (round27.py):
error-budget burn replayed in plain Python.
"""

from __future__ import annotations

from collections import Counter

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()


def test_error_budget_burn_matches_replay(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    total = Counter()
    errors = Counter()
    for r in ev:
        d = r.ts.date()
        total[d] += 1
        if r.event_type == "error":
            errors[d] += 1
    out = {
        r.day: r
        for r in REGISTRY["events_error_budget_burn"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(total)
    cum_t = cum_e = 0
    for d in sorted(total):
        cum_t += total[d]
        cum_e += errors[d]
        r = out[d]
        assert r.n_events == total[d]
        assert r.n_errors == errors[d]
        assert abs(r.daily_burn - round(errors[d] * 100 / total[d], 6)) < 1e-9
        assert abs(r.budget_consumed - round(cum_e * 100 / cum_t, 6)) < 1e-9
    # burn > 1 on a day means that day overspent its budget share;
    # with ~20% synthetic error rate the budget must be blown overall
    last = out[max(total)]
    assert last.budget_consumed > 1
