"""Round-6 hardening tests: numeric tolerance for the HLL sketch twin
(VERDICT r5 item 3 — the GK twin's band is in test_round5.py), plus
regression pins for the three ADVICE r5 fixes (graph fast-path schema,
gini decimal accumulation, right-2 substring equivalence)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import all_queries
from tests.conftest import SF_DIR


def _q(name):
    return all_queries()[name].fn


def test_hll_coverage_stats_within_standard_error(spark):
    """agg_coverage_stats_approx must approximately equal its exact
    twin: the count/invalid/pct columns are computed identically (so
    exactly equal), and the HLL distinct estimate must land within 3
    relative-standard-deviations of the exact distinct count
    (approx_count_distinct's default rsd is 0.05 → 3σ = 15%; HLL's
    error is unbiased and 3σ covers 99.7% of sketches, and the test
    corpus is a fixed seed so this is deterministic in practice)."""
    exact = _q("agg_coverage_stats")(spark, SF_DIR).collect()[0]
    approx = _q("agg_coverage_stats_approx")(spark, SF_DIR).collect()[0]
    assert approx.n_total == exact.n_total
    assert approx.n_invalid == exact.n_invalid
    assert approx.pct_invalid == exact.pct_invalid
    rsd = 0.05
    tol = max(3.0, 3 * rsd * exact.n_unique_valid)
    assert abs(approx.n_unique_valid - exact.n_unique_valid) <= tol, (
        approx.n_unique_valid,
        exact.n_unique_valid,
    )


def test_union_find_fast_path_preserves_node_type(spark):
    """ADVICE r5: the small-graph union-find fast path must label
    non-long node ids (here strings) identically to the distributed
    loop, with the node-id type preserved in the output schema."""
    from trackdechets_etl_spark.operators.graph import connected_components

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("m", "m")],
        schema="id_a string, id_b string",
    )
    fast = connected_components(pairs, "id_a", "id_b")
    assert dict(fast.dtypes) == {"node": "string", "label": "string"}
    got_fast = {(r.node, r.label) for r in fast.collect()}
    slow = connected_components(pairs, "id_a", "id_b", small_graph_edges=0)
    assert dict(slow.dtypes) == {"node": "string", "label": "string"}
    got_slow = {(r.node, r.label) for r in slow.collect()}
    assert got_fast == got_slow
    assert got_fast == {
        ("a", "a"),
        ("b", "a"),
        ("c", "a"),
        ("x", "x"),
        ("y", "x"),
        ("m", "m"),
    }


def test_gini_decimal_accumulation_matches_python_replay(spark):
    """ADVICE r5: the rank-weighted sum now accumulates in
    decimal(38,0). The statistic must still equal a from-scratch
    Python replay of the rank formula at test scale."""
    row = _q("orders_gini")(spark, SF_DIR).collect()[0]
    per = (
        read_table(spark, SF_DIR, "orders")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice") * 100).cast("long").alias("cents"))
        .collect()
    )
    xs = sorted((r.cents, r.o_custkey) for r in per)
    n = len(xs)
    tot = sum(c for c, _ in xs)
    weighted = sum((i + 1) * c for i, (c, _) in enumerate(xs))
    gini = 2.0 * weighted / (n * tot) - (n + 1) / n
    assert row.n_customers == n
    assert abs(row.gini - round(gini, 6)) <= 1e-6


def test_last2_matches_right_semantics(spark):
    """ADVICE r5: the linkage digit extractor must equal DuckDB's
    right(x, 2) for EVERY input length, including the 0- and 1-char
    cases where negative-position substring diverges."""
    from trackdechets_etl_spark.queries.round9 import _last2

    df = spark.createDataFrame(
        [("",), ("7",), ("42",), ("123",), ("09",)], schema="s string"
    )
    got = {r.s: r.d2 for r in df.select("s", _last2(F.col("s")).alias("d2")).collect()}
    assert got == {"": "", "7": "7", "42": "42", "123": "23", "09": "09"}


def test_running_totals_final_totals(spark):
    """Per-user totals must re-sum to the corpus totals, and the batch
    twin must agree with the stateful streaming op's contract columns
    (the streaming==batch equivalence itself is in test_streaming.py)."""
    df = _q("events_running_totals_final")(spark, SF_DIR)
    ev = read_table(spark, SF_DIR, "events")
    got = df.agg(F.sum("n_events").alias("n")).collect()[0].n
    assert got == ev.count()
    assert df.columns == ["user_id", "n_events", "sum_value"]


def test_quantize_int8_codes_bounded_and_error_within_half_step(spark):
    """Symmetric int8 invariants: every code in [-127, 127] and the
    mean reconstruction error at most half a quantization step
    (rounding to nearest can never do worse per element)."""
    from trackdechets_etl_spark.llm.similarity import as_double

    e = read_table(spark, SF_DIR, "embeddings")
    v = as_double(F.col("embedding"))
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    codes = F.transform(v, lambda x: F.round(x / scale).cast("long"))
    mm = e.select(
        F.array_max(codes).alias("hi"), F.array_min(codes).alias("lo")
    ).agg(F.max("hi").alias("hi"), F.min("lo").alias("lo")).collect()[0]
    assert -127 <= mm.lo and mm.hi <= 127

    out = _q("embedding_quantize_int8")(spark, SF_DIR)
    bad = out.filter(F.col("mean_abs_err") > F.col("scale") / 2 + 1e-9).count()
    assert bad == 0


def test_linenumber_bitmap_is_true_or(spark):
    """The mask is a genuine bitmap: popcount(mask) == n_lines, masks
    stay in the 7-bit line-number range, and the bit counts weighted
    by order counts re-sum to the count of DISTINCT (orderkey,
    linenumber) pairs — NOT the raw row count (the synthetic lineitem
    repeats pairs; OR must absorb the duplicates a sum would count)."""
    df = _q("lineitem_linenumber_bitmap")(spark, SF_DIR).collect()
    for r in df:
        assert 1 <= r.mask <= 127 and bin(r.mask).count("1") == r.n_lines
    n_lines_total = sum(r.n_lines * r.n_orders for r in df)
    li = read_table(spark, SF_DIR, "lineitem")
    n_distinct_pairs = li.select("l_orderkey", "l_linenumber").distinct().count()
    assert n_lines_total == n_distinct_pairs
    assert n_distinct_pairs < li.count()  # duplicates genuinely exist


def test_bloom_prefilter_result_invisible_and_reducing(spark):
    """The bucket prefilter must change nothing in the result (vs the
    plain join) while actually pruning fact rows before the join."""
    from trackdechets_etl_spark.queries.round31 import _BLOOM_BITS

    got = {
        (r.p_brand, r.n_items, r.revenue)
        for r in _q("join_bloom_prefilter")(spark, SF_DIR).collect()
    }
    part = read_table(spark, SF_DIR, "part").filter(
        F.col("p_type").startswith("PROMO")
    )
    li = read_table(spark, SF_DIR, "lineitem")
    plain = {
        (r.p_brand, r.n_items, r.revenue)
        for r in li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .collect()
    }
    assert got == plain

    # The membership set covers well under the full bucket space at
    # test scale, so the prefilter must actually prune.
    buckets = part.select(
        F.pmod(F.xxhash64("p_partkey"), F.lit(_BLOOM_BITS)).alias("b")
    ).distinct()
    n_buckets = buckets.count()
    assert n_buckets < _BLOOM_BITS // 4
    kept = li.join(
        buckets,
        F.pmod(F.xxhash64("l_partkey"), F.lit(_BLOOM_BITS)) == F.col("b"),
    ).count()
    n_li = li.count()
    n_match = sum(r[1] for r in plain)
    assert n_match <= kept < n_li
