"""Invariant tests for round41: BPE merges, mix shift, capped
sessions, label noise."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import all_queries
from tests.conftest import SF_DIR


def _q(name):
    return all_queries()[name].fn


def test_bpe_merges_match_python_replay(spark):
    rows = _q("text_bpe_learn_merges")(spark, SF_DIR).collect()
    assert [r.step for r in rows] == [1, 2, 3]
    # python replay of the exact greedy algorithm
    toks = (
        read_table(spark, SF_DIR, "documents")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .collect()
    )
    import re

    cnt = Counter(r.t for r in toks if re.fullmatch("[a-z]+", r.t))
    vocab = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    words = {w: (list(w), c) for w, c in vocab}
    for step_row in rows:
        pair_w = Counter()
        for syms, c in words.values():
            for a, b in zip(syms, syms[1:]):
                pair_w[(a, b)] += c
        (l, r), w = min(pair_w.items(), key=lambda kv: (-kv[1], kv[0]))
        assert (step_row.left_sym, step_row.right_sym) == (l, r)
        assert step_row.weight == w
        merged = l + r
        for key, (syms, c) in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[key] = (out, c)


def test_mix_shift_shares_sum_to_one(spark):
    rows = _q("orders_mix_shift_decomposition")(spark, SF_DIR).collect()
    by_year = defaultdict(list)
    for r in rows:
        by_year[r.yr].append(r)
    for yr, rs in by_year.items():
        assert abs(sum(r.share for r in rs) - 1.0) < 1e-4, yr
    # share_delta is null exactly on each segment's first year
    first_year = {}
    for r in rows:
        first_year.setdefault(r.segment, r.yr)
    for r in rows:
        assert (r.share_delta is None) == (r.yr == first_year[r.segment])


def test_capped_sessions_partition_events_and_respect_cap(spark):
    rows = _q("events_sessionize_capped")(spark, SF_DIR).collect()
    ev = read_table(spark, SF_DIR, "events")
    assert sum(r.n_events for r in rows) == ev.count()
    for r in rows:
        assert 0 <= r.duration_s < 2400, "sub-session exceeded the cap"
        assert r.sub_seq >= 0 and r.session_seq >= 1


def test_label_noise_flags_consistent(spark):
    rows = _q("embedding_label_noise_knn")(spark, SF_DIR).collect()
    e = read_table(spark, SF_DIR, "embeddings")
    import hashlib

    probe_ids = {
        r.vec_id
        for r in e.select("vec_id").collect()
        if hashlib.md5(str(r.vec_id).encode()).hexdigest()[:2] < "28"
    }
    assert {r.vec_id for r in rows} <= probe_ids
    for r in rows:
        assert 1 <= r.n_agree <= 5
        assert r.is_noisy == (1 if r.majority_label != r.label else 0)
    # numpy replay of the full kNN-majority pipeline for 10 probes
    import numpy as np

    data = e.select("vec_id", "embedding", "label").collect()
    ids = np.array([r.vec_id for r in data])
    labels = {r.vec_id: r.label for r in data}
    raw = np.array([r.embedding for r in data], dtype=np.float64)
    mat = raw / np.linalg.norm(raw, axis=1, keepdims=True)
    # replay the hyperplane-LSH bucket assignment: candidates are
    # restricted to the probe's bucket (r8 — the corpus-broadcast form
    # moved to the recall twin in round54.py)
    from trackdechets_etl_spark.llm.similarity import N_PLANES, hyperplane

    planes = np.array([hyperplane(p, raw.shape[1]) for p in range(N_PLANES)])
    signs = raw @ planes.T > 0
    buckets = (signs * (2 ** np.arange(N_PLANES))).sum(axis=1)
    got = {r.vec_id: (r.majority_label, r.n_agree) for r in rows}
    probe_idxs = [j for j in range(len(ids)) if int(ids[j]) in probe_ids]
    covered = set()
    for probe_idx in probe_idxs:
        pid = int(ids[probe_idx])
        cos = mat @ mat[probe_idx]
        cand = [
            (round(-float(cos[j]), 9), int(ids[j]))
            for j in range(len(ids))
            if int(ids[j]) != pid and buckets[j] == buckets[probe_idx]
        ]
        if cand:
            covered.add(pid)
        if probe_idx not in probe_idxs[:: max(1, len(probe_idxs) // 10)]:
            continue
        cand.sort()
        top = [labels[nid] for _, nid in cand[:5]]
        votes = Counter(top)
        if top:
            maj = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
            assert got[pid] == (maj[0], maj[1]), pid
    # every probe with at least one same-bucket neighbor is audited
    assert {r.vec_id for r in rows} == covered
