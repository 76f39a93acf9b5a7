"""Invariant tests for round40: rolling distinct, CMS, cohort LTV,
similar payments."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import all_queries
from tests.conftest import SF_DIR


def _q(name):
    return all_queries()[name].fn


def test_rolling_7d_matches_python_replay(spark):
    got = {
        r.window_day: r.active_users_7d
        for r in _q("events_rolling_7d_active_users")(spark, SF_DIR).collect()
    }
    ud = (
        read_table(spark, SF_DIR, "events")
        .select("user_id", F.to_date(F.col("ts").cast("timestamp")).alias("day"))
        .distinct()
        .collect()
    )
    by_day = defaultdict(set)
    for r in ud:
        by_day[r.day].add(r.user_id)
    days = sorted(by_day)
    import datetime

    want = {}
    for d in days:
        users = set()
        for k in range(7):
            users |= by_day.get(d - datetime.timedelta(days=k), set())
        want[str(d)] = len(users)
    assert got == want
    # rolling >= daily, rolling <= total users
    total = len({r.user_id for r in ud})
    for d in days:
        assert len(by_day[d]) <= got[str(d)] <= total


def test_cms_estimates_one_sided_and_tight_for_heavy_hitters(spark):
    rows = _q("sketch_cms_heavy_hitters")(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        # count-min error is ONE-SIDED: estimate >= exact, always
        assert r.cms_estimate >= r.exact_count
        assert r.overcount == r.cms_estimate - r.exact_count
    # the sketch must actually discriminate: the heaviest terms should
    # not be drowned by collisions (overcount bounded by eps*N with
    # eps = e/width; assert the much looser 2x here)
    assert sum(1 for r in rows if r.cms_estimate <= 2 * r.exact_count) >= 15


def test_cohort_ltv_cumulative_consistency(spark):
    rows = _q("orders_cohort_ltv_curve")(spark, SF_DIR).collect()
    o = read_table(spark, SF_DIR, "orders")
    assert sum(r.n_orders for r in rows) == o.count()
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r.cohort_month].append(r)
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r.age_months)
        assert rs[0].age_months == 0, f"{cohort}: first order defines age 0"
        cum = 0.0
        for r in rs:
            cum = round(cum + r.revenue, 2)
            assert abs(r.cum_revenue - cum) < 1e-6
            assert r.cum_revenue >= r.revenue


def test_similar_payments_bounds(spark):
    rows = _q("orders_similar_payments")(spark, SF_DIR).collect()
    assert rows, "fixture produced no similar-payment pairs"
    for r in rows:
        assert r.orderkey_a < r.orderkey_b
        assert 0 <= r.gap_days <= 30
        assert abs(r.cents_a - r.cents_b) * 50 <= min(r.cents_a, r.cents_b)
