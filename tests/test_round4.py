"""Property tests for the round-4 operators: invariants that the
DuckDB value-hash check can't express (structural guarantees rather
than point equality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import all_queries
from tests.conftest import SF_DIR


def _q(name):
    return all_queries()[name].fn


def test_chunks_cover_every_document(spark):
    """Every doc produces ≥1 chunk; concatenating chunk lengths at
    stride 400 covers the full text length (first chunk starts at 0,
    last chunk reaches the end)."""
    docs = read_table(spark, SF_DIR, "documents").select(
        "doc_id", F.length("text").alias("n")
    )
    chunks = _q("text_chunk_overlap")(spark, SF_DIR)
    per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("chunk_id").alias("last_id"),
        F.max(F.col("chunk_id") * 400 + F.col("chunk_len")).alias("max_reach"),
        F.min("chunk_id").alias("first_id"),
    )
    j = docs.join(per_doc, "doc_id")
    assert j.filter(F.col("n_chunks") < 1).count() == 0
    assert j.filter(F.col("first_id") != 0).count() == 0
    # chunk ids are dense 0..last
    assert j.filter(F.col("n_chunks") != F.col("last_id") + 1).count() == 0
    # the last chunk reaches the end of the document
    assert j.filter(F.col("max_reach") < F.col("n")).count() == 0


def test_scd2_intervals_are_contiguous_and_disjoint(spark):
    """Per user: versions are 1..n dense; each version's valid_to
    equals the next version's valid_from (no gaps, no overlaps); only
    the last version is open (null valid_to)."""
    scd = _q("events_scd2_validity")(spark, SF_DIR)
    n_open = scd.filter(F.col("valid_to").isNull()).groupBy("user_id").count()
    assert n_open.filter(F.col("count") != 1).count() == 0
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("version")
    checked = scd.withColumn("next_from", F.lead("valid_from").over(w)).withColumn(
        "next_version", F.lead("version").over(w)
    )
    # valid_to of version k == valid_from of version k+1
    bad_bounds = checked.filter(
        F.col("next_from").isNotNull() & (F.col("valid_to") != F.col("next_from"))
    )
    assert bad_bounds.count() == 0
    bad_dense = checked.filter(
        F.col("next_version").isNotNull()
        & (F.col("next_version") != F.col("version") + 1)
    )
    assert bad_dense.count() == 0


def test_retention_week_zero_counts_every_user(spark):
    """Every user appears in their cohort's week 0 (their first event
    is in week 0 by construction), so summing week-0 n_users over
    cohorts equals the distinct user count."""
    ret = _q("events_retention_cohorts")(spark, SF_DIR)
    week0 = (
        ret.filter(F.col("week_offset") == 0).agg(F.sum("n_users").alias("s"))
    ).collect()[0].s
    n_users = (
        read_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert week0 == n_users


def test_rfm_quartiles_are_balanced(spark):
    """ntile(4) invariant: quartile sizes differ by at most 1, and
    every user gets all three quartile assignments in 1..4."""
    rfm = _q("events_rfm_segments")(spark, SF_DIR)
    for col in ("r_quartile", "f_quartile", "m_quartile"):
        sizes = [r.n for r in rfm.groupBy(col).agg(F.count(F.lit(1)).alias("n")).collect()]
        assert len(sizes) == 4 and max(sizes) - min(sizes) <= 1
    assert rfm.filter(
        (F.col("r_quartile") < 1) | (F.col("r_quartile") > 4)
    ).count() == 0


def test_market_basket_pairs_oriented_and_bounded(spark):
    """Pairs are strictly oriented (p1 < p2) and each pair's order
    count cannot exceed either part's total order count."""
    mb = _q("orders_market_basket")(spark, SF_DIR)
    rows = mb.collect()
    assert all(r.p1 < r.p2 for r in rows)
    li = read_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey").distinct()
    per_part = {
        r.l_partkey: r.n
        for r in li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(r.n_orders <= min(per_part[r.p1], per_part[r.p2]) for r in rows)


def test_repetition_stats_ratios_bounded(spark):
    """distinct_ratio and top_token_share lie in (0, 1]; n_distinct ≤
    n_tokens; top share ≥ 1/n_distinct."""
    rep = _q("text_repetition_stats")(spark, SF_DIR)
    bad = rep.filter(
        (F.col("distinct_ratio") <= 0)
        | (F.col("distinct_ratio") > 1)
        | (F.col("top_token_share") <= 0)
        | (F.col("top_token_share") > 1)
        | (F.col("n_distinct") > F.col("n_tokens"))
    )
    assert bad.count() == 0
