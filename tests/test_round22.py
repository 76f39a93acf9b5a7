"""Invariant tests for the round-5 seventeenth batch (round22.py):
debounced alert episodes replayed in plain Python.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from datetime import timedelta

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()

PCT, DEBOUNCE = 110, 3


def test_debounced_alerts_match_replay(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    daily = Counter((r.event_type, r.ts.date()) for r in ev)
    per_type = defaultdict(list)
    for (t, d), c in daily.items():
        per_type[t].append((d, c))
    breach_days = defaultdict(list)
    for t, dcs in per_type.items():
        d_days = len(dcs)
        s_total = sum(c for _d, c in dcs)
        for d, c in sorted(dcs):
            if c * 100 * d_days > PCT * s_total:
                breach_days[t].append(d)
    assert any(breach_days.values()), "degenerate: no breach days at all"
    expected = {}
    for t, days in breach_days.items():
        run = [days[0]]
        for d in days[1:]:
            if (d - run[-1]).days == 1:
                run.append(d)
            else:
                if len(run) >= DEBOUNCE:
                    expected[(t, run[0])] = run
                run = [d]
        if len(run) >= DEBOUNCE:
            expected[(t, run[0])] = run
    out = {
        (r.event_type, r.start_day): r
        for r in REGISTRY["events_debounced_alerts"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(expected)
    for (t, start), run in expected.items():
        r = out[(t, start)]
        assert r.end_day == run[-1]
        assert r.n_days == len(run)
        assert r.peak_cnt == max(daily[(t, d)] for d in run)
        # debounce contract: the episode really is ≥3 consecutive days
        assert r.n_days >= DEBOUNCE
        assert (r.end_day - r.start_day) == timedelta(days=r.n_days - 1)
