"""Invariant tests for round45: MMR selection and path mining."""

from __future__ import annotations

from collections import Counter

import numpy as np
from pyspark.sql import functions as F

from trackdechets_etl_spark.io.readers import read_table
from trackdechets_etl_spark.queries import all_queries
from tests.conftest import SF_DIR


def _q(name):
    return all_queries()[name].fn


def test_mmr_matches_numpy_replay(spark):
    rows = _q("embedding_mmr_select")(spark, SF_DIR).collect()
    assert [r.pick_rank for r in rows] == [1, 2, 3, 4, 5]
    data = read_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in data]
    mat = np.array([r.embedding for r in data], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qi = ids.index(0)
    sim_q = {ids[j]: float(mat[j] @ mat[qi]) for j in range(len(ids)) if ids[j] != 0}
    pool = sorted(sim_q, key=lambda i: (-round(sim_q[i], 9), i))[:20]
    idx = {v: ids.index(v) for v in pool}
    selected: list[int] = []
    for k, row in enumerate(rows, 1):
        best = None
        for c in pool:
            if c in selected:
                continue
            if selected:
                pen = max(float(mat[idx[c]] @ mat[idx[s]]) for s in selected)
                score = 0.7 * sim_q[c] - 0.3 * pen
            else:
                score = 0.7 * sim_q[c]
            key = (-round(score, 9), c)
            if best is None or key < best[0]:
                best = (key, c, score)
        _, cid, score = best
        assert row.vec_id == cid, f"pick {k}"
        assert abs(row.mmr_score - round(score, 6)) < 1e-9
        selected.append(cid)
    # diversity: the 5 picks are distinct
    assert len({r.vec_id for r in rows}) == 5


def test_path_mining_matches_python_replay(spark):
    got = [(r.path, r.n) for r in _q("events_path_mining_top3")(spark, SF_DIR).collect()]
    ev = (
        read_table(spark, SF_DIR, "events")
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
        .collect()
    )
    seqs: dict = {}
    for r in sorted(ev, key=lambda r: (r.user_id, r.us, r.event_id)):
        seqs.setdefault(r.user_id, []).append(r.event_type)
    c: Counter = Counter()
    for types in seqs.values():
        for i in range(len(types) - 2):
            c[">".join(types[i : i + 3])] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want
