"""Invariant tests for the round-5 second batch (queries/round7.py):
each operator is checked against its mathematical definition or a
brute-force replay, independent of the DuckDB oracle (which proves the
same results a second way at sf0.01).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()


# ---------------------------------------------------- pattern match


def test_pattern_match_equals_python_regex_replay(spark):
    """The per-user initial string and the v+p count must equal a
    driver-side replay with Python's re on the sorted event list."""
    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type[0]))
    expected = {}
    for uid, evs in by_user.items():
        seq = "".join(i for _, _, i in sorted(evs))
        n = len(re.findall("v+p", seq))
        if n > 0:
            expected[uid] = (len(seq), n)
    got = {
        r.user_id: (r.seq_len, r.n_view_buy)
        for r in REGISTRY["events_pattern_match"].fn(spark, SF_DIR).collect()
    }
    assert got == expected
    assert expected, "degenerate: no user matched v+p"


# ------------------------------------------------- rolling correlation


def test_rolling_corr_matches_numpy_on_full_windows(spark):
    """corr7 must equal the plain Pearson r of the 7 trailing
    (count, milli-mean) points, computed independently."""
    out = REGISTRY["events_rolling_corr"].fn(spark, SF_DIR).collect()
    assert out, "no full 7-day windows"
    daily = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("x"),
            F.round(F.avg("value") * 1000).cast("long").alias("y"),
        )
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r.event_type].append((r.day, r.x, r.y))
    for t in series:
        series[t].sort()
    for row in out[:40]:
        pts = series[row.event_type]
        idx = next(i for i, (d, _, _) in enumerate(pts) if d == row.day)
        window = pts[idx - 6 : idx + 1]
        assert len(window) == 7
        xs = [x for _, x, _ in window]
        ys = [y for _, _, y in window]
        mx, my = sum(xs) / 7, sum(ys) / 7
        cov = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
        vx = sum((a - mx) ** 2 for a in xs)
        vy = sum((b - my) ** 2 for b in ys)
        if vx * vy > 0:
            assert math.isclose(
                row.corr7, cov / math.sqrt(vx * vy), abs_tol=2e-6
            )
        else:
            assert row.corr7 is None
        assert row.corr7 is None or -1.0 <= row.corr7 <= 1.0


# ------------------------------------------------- linear interpolation


def test_gap_interpolate_brackets_and_exact_lerp(spark):
    """Every filled gap must lie between its bracketing observed values
    (inclusive), observed hours must round-trip the hourly mean, and a
    spot-check gap must equal the hand-computed lerp."""
    out = REGISTRY["events_gap_interpolate"].fn(spark, SF_DIR)
    rows = out.orderBy("event_type", "bucket_ts").collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    n_gaps = 0
    for t, series in by_type.items():
        # reconstruct observed points: was_gap False and value not null
        obs = [
            (i, r.value_interp)
            for i, r in enumerate(series)
            if r.value_interp is not None and not r.was_gap
        ]
        for i, r in enumerate(series):
            if r.was_gap:
                n_gaps += 1
                prev = max((o for o in obs if o[0] < i), key=lambda o: o[0])
                nxt = min((o for o in obs if o[0] > i), key=lambda o: o[0])
                lo, hi = sorted((prev[1], nxt[1]))
                assert lo - 1e-9 <= r.value_interp <= hi + 1e-9
                frac = (i - prev[0]) / (nxt[0] - prev[0])
                want = prev[1] + (nxt[1] - prev[1]) * frac
                assert math.isclose(r.value_interp, want, abs_tol=2e-3)
    assert n_gaps > 0, "degenerate: no gaps to interpolate at this SF"


# ---------------------------------------------------- repeated n-grams


def test_repeated_ngrams_counts_by_brute_force(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    counts = Counter()
    docsets = defaultdict(set)
    for d in docs:
        toks = d.text.split(" ")
        for i in range(len(toks) - 4):
            g = " ".join(toks[i : i + 5])
            counts[g] += 1
            docsets[g].add(d.doc_id)
    out = REGISTRY["text_repeated_ngrams"].fn(spark, SF_DIR).collect()
    assert 0 < len(out) <= 100
    for r in out:
        assert r.n_occ == counts[r.gram]
        assert r.n_docs == len(docsets[r.gram]) >= 2
    # top-k really is the k most frequent multi-doc grams
    eligible = sorted(
        (
            (-counts[g], -len(ds), g)
            for g, ds in docsets.items()
            if len(ds) >= 2
        ),
    )[: len(out)]
    assert [g for _, _, g in eligible] == [r.gram for r in out]


# ---------------------------------------------------- passage dedup


def test_passage_dedup_first_occurrence_wins_and_reassembles(spark):
    docs = {
        d.doc_id: d.text.split(" ")
        for d in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    seen = {}
    expected = {}
    dropped = {}
    for doc_id in sorted(docs):
        toks = docs[doc_id]
        kept = []
        n_drop = 0
        for j in range(math.ceil(len(toks) / 20)):
            p = " ".join(toks[j * 20 : j * 20 + 20])
            if p in seen:
                n_drop += 1
            else:
                seen[p] = (doc_id, j)
                kept.append(p)
        expected[doc_id] = " ".join(kept)
        dropped[doc_id] = n_drop
    out = REGISTRY["text_passage_dedup"].fn(spark, SF_DIR).collect()
    assert len(out) == len(docs), "every document must survive"
    for r in out:
        assert r.clean_text == expected[r.doc_id]
        assert r.n_dropped == dropped[r.doc_id]
    assert sum(dropped.values()) > 0, "degenerate: nothing deduplicated"


# ---------------------------------------------------- posting lists


def test_posting_lists_df_and_sorted_head(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    postings = defaultdict(set)
    for d in docs:
        for t in set(d.text.split(" ")):
            postings[t].add(d.doc_id)
    out = REGISTRY["text_posting_lists"].fn(spark, SF_DIR).collect()
    assert {r.token for r in out} == set(postings)
    for r in out:
        ids = sorted(postings[r.token])
        assert r.df == len(ids)
        assert r.posting_head == ",".join(str(x) for x in ids[:20])


# ------------------------------------------------- standardization


def test_embedding_standardize_unit_moments(spark):
    """Each dimension of the standardized matrix must have ~zero mean
    and ~unit variance, and vectors keep their dimensionality. The
    output is the flat ','-joined micro-int serialization."""
    out = REGISTRY["embedding_standardize"].fn(spark, SF_DIR).collect()
    vecs = [[int(x) / 1e6 for x in r.z_micro.split(",")] for r in out]
    dims = len(vecs[0])
    assert all(len(v) == dims for v in vecs)
    n = len(vecs)
    for i in range(0, dims, 16):
        col = [v[i] for v in vecs]
        mean = sum(col) / n
        var = sum((x - mean) ** 2 for x in col) / n
        assert abs(mean) < 1e-4
        assert abs(var - 1.0) < 1e-3


# ------------------------------------------------------------- Gini


def test_gini_matches_definition_and_bounds(spark):
    per = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice") * 100).cast("long").alias("c"))
        .collect()
    )
    xs = sorted(r.c for r in per)
    n = len(xs)
    g = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * sum(xs)) - (
        n + 1
    ) / n
    row = REGISTRY["orders_gini"].fn(spark, SF_DIR).collect()[0]
    assert row.n_customers == n
    assert math.isclose(row.gini, g, abs_tol=1e-6)
    assert 0.0 <= row.gini < 1.0


# ------------------------------------------------------------ MaxSim


def test_maxsim_equals_brute_force_late_interaction(spark):
    embs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }

    def subs(v):
        return [v[s * 8 : s * 8 + 8] for s in range(8)]

    def maxsim(q, d):
        return sum(
            max(sum(a * b for a, b in zip(qs, ds)) for ds in subs(d))
            for qs in subs(q)
        )

    out = REGISTRY["sim_maxsim"].fn(spark, SF_DIR).collect()
    by_q = defaultdict(list)
    for r in out:
        by_q[r.qid].append(r)
    assert set(by_q) == {q for q in embs if q < 5}
    for qid, rows in by_q.items():
        scores = sorted(
            (
                (-round(maxsim(embs[qid], embs[did]), 9), did)
                for did in embs
                if did != qid
            ),
        )[:3]
        got = sorted((r.rank, r.did, r.maxsim) for r in rows)
        assert [d for _, d in scores] == [d for _, d, _ in got]
        for (neg_s, _), (_, _, ms) in zip(scores, got):
            assert math.isclose(-neg_s, ms, abs_tol=1e-5)


# --------------------------------------------------------- chi-square


def test_chisq_cells_sum_and_marginals(spark):
    out = REGISTRY["events_chisq"].fn(spark, SF_DIR).collect()
    total_obs = sum(r.observed for r in out)
    total_exp = sum(r.expected for r in out)
    assert math.isclose(total_obs, total_exp, rel_tol=1e-9)
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert total_obs == n_events
    for r in out:
        assert r.chisq_contrib >= 0
        want = (r.observed - r.expected) ** 2 / r.expected
        assert math.isclose(r.chisq_contrib, want, abs_tol=2e-6)
