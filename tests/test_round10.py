"""Invariant tests for the round-5 fifth batch (queries/round10.py):
every operator is replayed in plain Python against its definition.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from datetime import datetime

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()


def test_cuped_matches_python_replay(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    cutoff = datetime(2024, 1, 16)
    xs = defaultdict(float)
    ys = defaultdict(float)
    for r in ev:
        if r.ts < cutoff:
            xs[r.user_id] += r.value
        else:
            ys[r.user_id] += r.value
    users = sorted(set(xs) | set(ys))
    x = [xs[u] for u in users]
    y = [ys[u] for u in users]
    n = len(users)
    mx, my = sum(x) / n, sum(y) / n
    cxy = sum((a - mx) * (b - my) for a, b in zip(x, y)) / (n - 1)
    vx = sum((a - mx) ** 2 for a in x) / (n - 1)
    vy = sum((b - my) ** 2 for b in y) / (n - 1)
    theta = cxy / vx
    out = {
        r.variant: r
        for r in REGISTRY["events_uplift_cuped"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == {0, 1}
    for v in (0, 1):
        grp = [u for u in users if u % 2 == v]
        assert out[v].n_users == len(grp)
        gmy = sum(ys[u] for u in grp) / len(grp)
        gmx = sum(xs[u] for u in grp) / len(grp)
        assert abs(out[v].raw_mean - round(gmy, 4)) < 1e-9
        assert abs(out[v].cuped_mean - round(gmy - theta * (gmx - mx), 4)) < 1e-6
        assert abs(out[v].theta - round(theta, 4)) < 1e-6
        assert abs(out[v].var_reduction - round(cxy * cxy / (vx * vy), 4)) < 1e-6
    # CUPED preserves the pooled metric mean: weighted adjusted means
    # equal weighted raw means up to rounding
    tot = sum(out[v].n_users for v in (0, 1))
    raw = sum(out[v].raw_mean * out[v].n_users for v in (0, 1)) / tot
    adj = sum(out[v].cuped_mean * out[v].n_users for v in (0, 1)) / tot
    assert abs(raw - adj) < 1e-3


def test_curriculum_phases_and_ranks(spark):
    rows = REGISTRY["training_curriculum_order"].fn(spark, SF_DIR).collect()
    n = len(rows)
    assert n == spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    # ntile contract: phase sizes differ by at most 1, earlier phases
    # hold the higher quality scores
    sizes = Counter(r.phase for r in rows)
    assert set(sizes) == {1, 2, 3, 4}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    worst_by_phase = {
        p: min(r.quality_score for r in rows if r.phase == p) for p in sizes
    }
    best_by_phase = {
        p: max(r.quality_score for r in rows if r.phase == p) for p in sizes
    }
    for p in (1, 2, 3):
        assert worst_by_phase[p] >= best_by_phase[p + 1] - 1e-12
    # within-phase rank is the md5 order, dense from 1
    for p in sizes:
        grp = sorted(
            (r for r in rows if r.phase == p),
            key=lambda r: (
                hashlib.md5(str(r.doc_id).encode()).hexdigest(),
                r.doc_id,
            ),
        )
        assert [r.phase_rank for r in grp] == list(range(1, len(grp) + 1))


def test_bigram_lm_matches_python_replay(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    toks = {r.doc_id: r.text.split(" ") for r in docs}
    c2 = Counter()
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] += 1
    c1 = Counter()
    for (a, _b), k in c2.items():
        c1[a] += k
    vocab = len({w for ws in toks.values() for w in ws})
    out = {
        r.doc_id: r
        for r in REGISTRY["text_bigram_lm_score"].fn(spark, SF_DIR).collect()
    }
    for doc_id, ws in toks.items():
        bigrams = list(zip(ws, ws[1:]))
        if not bigrams:
            assert doc_id not in out
            continue
        lps = [
            math.log((c2[(a, b)] + 1) / (c1[a] + vocab)) for a, b in bigrams
        ]
        score = -sum(lps) / len(lps)
        r = out[doc_id]
        assert r.n_bigrams == len(bigrams)
        assert abs(r.avg_neg_logprob - round(score, 4)) < 1e-6
        assert abs(r.perplexity - round(math.exp(score), 4)) < 1e-3
        # smoothed probabilities are proper: every score positive
        assert r.avg_neg_logprob > 0
