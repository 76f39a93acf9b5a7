"""Property-based tests (hypothesis): the vectorized Spark expressions
must agree with a straightforward Python model of the reference
semantics on arbitrary inputs — nulls, short strings, unicode, ties."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from trackdechets_etl_spark.functions.decode import REGIME_LABELS, decode_dict
from trackdechets_etl_spark.functions.scalar import backfill_if_invalid
from trackdechets_etl_spark.operators.dedup import keep_last_by

# r15: slow shard — excluded from the default pytest run (see
# pytest.ini); run the full suite with -m "slow or not slow".
pytestmark = pytest.mark.slow

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

maybe_str = st.one_of(
    st.none(),
    st.text(alphabet="0123456789ab", min_size=0, max_size=20),
)


def _model_backfill(cur, cand, n=14):
    cur_len = len(cur) if cur is not None else 0
    cand_len = len(cand) if cand is not None else 0
    return cand if (cur_len != n and cand_len == n) else cur


@given(st.lists(st.tuples(maybe_str, maybe_str), min_size=1, max_size=40))
@SETTINGS
def test_backfill_matches_model(spark, rows):
    df = spark.createDataFrame(rows, "cur string, cand string")
    got = [
        r.x
        for r in df.select(
            backfill_if_invalid(F.col("cur"), F.col("cand")).alias("x")
        ).collect()
    ]
    want = [_model_backfill(c, d) for c, d in rows]
    assert got == want


def _model_decode(code, mapping):
    if code is None:
        return None
    return mapping.get(code, "")


@given(
    st.lists(
        st.one_of(st.none(), st.sampled_from(list(REGIME_LABELS) + ["XX", "", "a"])),
        min_size=1,
        max_size=40,
    )
)
@SETTINGS
def test_decode_matches_model(spark, codes):
    df = spark.createDataFrame([(c,) for c in codes], "code string")
    got = [
        r.x
        for r in df.select(decode_dict(F.col("code"), REGIME_LABELS).alias("x")).collect()
    ]
    assert got == [_model_decode(c, REGIME_LABELS) for c in codes]


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["k1", "k2", "k3"]),
            st.text(alphabet="0123456789", min_size=1, max_size=4),
            st.text(alphabet="xyz", min_size=1, max_size=3),
        ),
        min_size=1,
        max_size=30,
    )
)
@SETTINGS
def test_keep_last_matches_model(spark, rows):
    df = spark.createDataFrame(rows, ["key", "ord1", "ord2"])
    got = {
        r.key: (r.ord1, r.ord2)
        for r in keep_last_by(df, ["key"], ["ord1", "ord2"]).collect()
    }
    want = {}
    for k, o1, o2 in rows:
        if k not in want or (o1, o2) > want[k]:
            want[k] = (o1, o2)
    assert got == want


def _model_asof(left_rows, right_rows):
    """Brute-force as-of model: for each left (k, t), the right row with
    the same k, max (t', tie) such that t' <= t."""
    out = {}
    for i, (k, t) in enumerate(left_rows):
        best = None
        for k2, t2, tie in right_rows:
            if k2 == k and t2 <= t:
                cand = (t2, tie)
                if best is None or cand > best:
                    best = cand
        out[i] = best
    return out


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=1, max_size=15
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(0, 9)),
        min_size=0,
        max_size=25,
    ),
)
@SETTINGS
def test_asof_join_matches_bruteforce_model(spark, left_rows, right_rows):
    from datetime import datetime, timedelta

    from trackdechets_etl_spark.operators.temporal import asof_join

    base = datetime(2024, 1, 1)

    def ts(n):
        return base + timedelta(hours=n)

    left = spark.createDataFrame(
        [(i, k, ts(t)) for i, (k, t) in enumerate(left_rows)],
        "idx long, k long, t timestamp",
    )
    right = spark.createDataFrame(
        [(k, ts(t), tie) for (k, t, tie) in right_rows],
        "k long, t timestamp, tie long",
    ) if right_rows else spark.createDataFrame([], "k long, t timestamp, tie long")

    got = {
        r["idx"]: (r["asof_t"], r["asof_tie"])
        for r in asof_join(
            left, right, "k", "k", "t", "t", ["tie"], "tie"
        ).collect()
    }
    want = _model_asof(left_rows, right_rows)
    for i, best in want.items():
        if best is None:
            assert got[i] == (None, None), f"idx {i}: expected no match, got {got[i]}"
        else:
            t2, tie = best
            assert got[i] == (ts(t2), tie), f"idx {i}"


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(1, 8)),
        min_size=1,
        max_size=10,
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 25)), min_size=0, max_size=25
    ),
    st.sampled_from([3600, 7200, 10800]),
)
@SETTINGS
def test_range_join_matches_bruteforce_model(spark, intervals, points, bucket_s):
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F2

    from trackdechets_etl_spark.operators.temporal import range_join_bucketed

    base = datetime(2024, 1, 1)

    def ts(n):
        return base + timedelta(hours=n)

    left = spark.createDataFrame(
        [(i, k, ts(s), ts(s + w)) for i, (k, s, w) in enumerate(intervals)],
        "idx long, k long, start timestamp, stop timestamp",
    )
    right = (
        spark.createDataFrame(
            [(j, k, ts(t)) for j, (k, t) in enumerate(points)],
            "pid long, k2 long, pt timestamp",
        )
        if points
        else spark.createDataFrame([], "pid long, k2 long, pt timestamp")
    )
    got = {
        (r["idx"], r["pid"])
        for r in range_join_bucketed(
            left, right, "k", "k2", F2.col("start"), F2.col("stop"), "pt", bucket_s
        ).collect()
    }
    want = {
        (i, j)
        for i, (k, s, w) in enumerate(intervals)
        for j, (k2, t) in enumerate(points)
        if k2 == k and s <= t < s + w
    }
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 300), st.integers(0, 300)),
        min_size=1,
        max_size=40,
    ),
    st.lists(
        st.tuples(st.integers(0, 300), st.integers(0, 300)),
        min_size=1,
        max_size=30,
    ),
    st.integers(5, 60),
)
@SETTINGS
def test_grid_join_matches_bruteforce_model(spark, left_pts, right_pts, radius):
    """grid_join_within_radius must equal the quadratic model for
    arbitrary point sets, radii, and a cell chosen >= radius."""
    from trackdechets_etl_spark.operators.spatial import grid_join_within_radius

    a = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(left_pts)],
        "id_a long, x long, y long",
    )
    b = spark.createDataFrame(
        [(j, x, y) for j, (x, y) in enumerate(right_pts)],
        "id_b long, sx long, sy long",
    )
    cell = radius + (radius % 7)  # >= radius, varies with the draw
    got = {
        (r.id_a, r.id_b)
        for r in grid_join_within_radius(
            a, b, ("x", "y"), ("sx", "sy"), radius=radius, cell=cell
        ).collect()
    }
    want = {
        (i, j)
        for i, (x, y) in enumerate(left_pts)
        for j, (sx, sy) in enumerate(right_pts)
        if (x - sx) ** 2 + (y - sy) ** 2 <= radius * radius
    }
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=60,
    )
)
@SETTINGS
def test_cc_union_find_equals_distributed_loop(spark, edges):
    """The size-gated union-find fast path and the distributed
    min-label loop must produce the identical component labeling on
    arbitrary graphs — self-loops, parallel edges, chains, cliques."""
    from trackdechets_etl_spark.operators.graph import connected_components

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = {
        r.node: r.label
        for r in connected_components(pairs, "id_a", "id_b").collect()
    }
    slow = {
        r.node: r.label
        for r in connected_components(
            pairs, "id_a", "id_b", small_graph_edges=0
        ).collect()
    }
    assert fast == slow


_words = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
_doc = st.lists(_words, min_size=0, max_size=12).map(" ".join)


@given(
    st.lists(_doc, min_size=1, max_size=12),
    st.sampled_from([0.5, 0.7, 0.9, 1.0]),
)
@SETTINGS
def test_containment_prefix_positional_equals_naive(spark, texts, t):
    """The AllPairs prefix + size + positional filters must be lossless
    for containment on ARBITRARY corpora: tiny word alphabet forces
    heavy shingle sharing, docs shorter than one shingle, duplicate
    docs, threshold 1.0 (exact-subset) and loose thresholds all
    exercise the ceil/epsilon boundaries of the pruning bounds."""
    from trackdechets_etl_spark.llm.dedup import containment_pairs

    d = spark.createDataFrame(
        [(i, txt) for i, txt in enumerate(texts)], "doc_id long, text string"
    )
    fast = sorted(
        map(tuple, containment_pairs(d, "text", "doc_id", t, n=2).collect())
    )
    naive = sorted(
        map(
            tuple,
            containment_pairs(
                d, "text", "doc_id", t, n=2, prefix_filter=False
            ).collect(),
        )
    )
    assert fast == naive


@given(
    st.lists(_doc, min_size=1, max_size=12),
    st.sampled_from([0.5, 0.7, 0.8, 1.0]),
)
@SETTINGS
def test_jaccard_prefix_positional_equals_naive(spark, texts, t):
    """Same losslessness pin for the symmetric PPJoin path: prefix,
    size-ratio, and positional filters on ngram_jaccard_pairs must
    reproduce the naive inverted-index join exactly on arbitrary
    corpora and thresholds."""
    from trackdechets_etl_spark.llm.dedup import ngram_jaccard_pairs

    d = spark.createDataFrame(
        [(i, txt) for i, txt in enumerate(texts)], "doc_id long, text string"
    )
    fast = sorted(
        map(tuple, ngram_jaccard_pairs(d, "text", "doc_id", t, n=2).collect())
    )
    naive = sorted(
        map(
            tuple,
            ngram_jaccard_pairs(
                d, "text", "doc_id", t, n=2, prefix_filter=False
            ).collect(),
        )
    )
    assert fast == naive
