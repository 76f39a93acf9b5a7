"""Independent-model validation for the numerically subtle staged
round79 entries: each Spark implementation (exact-integer moment
identities on the distinct-cents frame) is checked against a direct
pure-Python reference that computes midranks / EDFs / distributions
the textbook way on the same data. Seeded random fixtures with heavy
ties exercise the midrank paths."""

from __future__ import annotations

import bisect
import math
import random

import pytest


# r15: slow shard — excluded from the default pytest run (see
# pytest.ini); run the full suite with -m "slow or not slow".
pytestmark = pytest.mark.slow

def _write_events(spark, tmp_path, pairs):
    """pairs: list of (user_id, value)."""
    spark.createDataFrame(pairs, "user_id long, value double").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def _arms(pairs):
    x = [round(v * 100) for u, v in pairs if u % 2 == 0]
    y = [round(v * 100) for u, v in pairs if u % 2 == 1]
    return x, y


def _tied_fixture(seed, n=60, vals=8):
    rng = random.Random(seed)
    return [
        (u, rng.randrange(vals) * 0.25 + 1.0) for u in range(n)
    ]


# ------------------------------------------------- Brunner-Munzel


def _bm_model(x, y):
    nx, ny = len(x), len(y)
    pooled = sorted(x + y)
    sx, sy = sorted(x), sorted(y)

    def midrank(v, arr):
        lo = bisect.bisect_left(arr, v)
        hi = bisect.bisect_right(arr, v)
        return (lo + 1 + hi) / 2

    rx = [midrank(v, pooled) for v in x]
    ry = [midrank(v, pooled) for v in y]
    rxin = [midrank(v, sx) for v in x]
    ryin = [midrank(v, sy) for v in y]
    mx, my = sum(rx) / nx, sum(ry) / ny
    sx2 = sum(
        (rx[i] - rxin[i] - mx + (nx + 1) / 2) ** 2 for i in range(nx)
    ) / (nx - 1)
    sy2 = sum(
        (ry[i] - ryin[i] - my + (ny + 1) / 2) ** 2 for i in range(ny)
    ) / (ny - 1)
    den = (nx + ny) * math.sqrt(nx * sx2 + ny * sy2)
    if den == 0:
        return None, None
    w = nx * ny * (my - mx) / den
    p_hat = (my - (ny + 1) / 2) / nx
    return p_hat, w


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_brunner_munzel_matches_midrank_model(spark, tmp_path, seed):
    from trackdechets_etl_spark.queries.round79 import STAGED_QUERIES

    pairs = _tied_fixture(seed)
    _write_events(spark, tmp_path, pairs)
    row = (
        STAGED_QUERIES["events_brunner_munzel"]
        .fn(spark, str(tmp_path))
        .collect()[0]
        .asDict()
    )
    x, y = _arms(pairs)
    p_ref, w_ref = _bm_model(x, y)
    assert row["p_hat"] == pytest.approx(p_ref, abs=2e-6)
    assert row["w_bm"] == pytest.approx(w_ref, abs=2e-6)


# -------------------------------------------- Anderson-Darling (k=2)


def _ad_model(x, y):
    n0, n1 = len(x), len(y)
    N = n0 + n1
    zs = sorted(set(x + y))
    if len(zs) < 2:
        return None
    from collections import Counter

    cx, cy = Counter(x), Counter(y)
    B = 0.0
    M0 = 0.0
    M1 = 0.0
    s0 = s1 = 0.0
    for z in zs:
        l = cx[z] + cy[z]
        Bt = B + l / 2
        M0t = M0 + cx[z] / 2
        M1t = M1 + cy[z] / 2
        den = Bt * (N - Bt) - N * l / 4
        if den > 0:
            s0 += l * (N * M0t - n0 * Bt) ** 2 / den
            s1 += l * (N * M1t - n1 * Bt) ** 2 / den
        B += l
        M0 += cx[z]
        M1 += cy[z]
    return (s0 / n0 + s1 / n1) / N


@pytest.mark.parametrize("seed", [4, 5, 6])
def test_anderson_darling_matches_edf_model(spark, tmp_path, seed):
    from trackdechets_etl_spark.queries.round79 import STAGED_QUERIES

    pairs = _tied_fixture(seed)
    _write_events(spark, tmp_path, pairs)
    row = (
        STAGED_QUERIES["events_anderson_darling"]
        .fn(spark, str(tmp_path))
        .collect()[0]
        .asDict()
    )
    x, y = _arms(pairs)
    assert row["ad_stat"] == pytest.approx(_ad_model(x, y), abs=2e-6)


# ------------------------------------------------------ Watson U²


def _watson_model(x, y):
    n0, n1 = len(x), len(y)
    N = n0 + n1
    zs = sorted(set(x + y))
    from collections import Counter

    cx, cy = Counter(x), Counter(y)
    f0 = f1 = 0
    sg1 = sg2 = 0.0
    for z in zs:
        f0 += cx[z]
        f1 += cy[z]
        g = f0 / n0 - f1 / n1
        l = cx[z] + cy[z]
        sg1 += l * g
        sg2 += l * g * g
    return n0 * n1 / N**2 * (sg2 - sg1**2 / N)


@pytest.mark.parametrize("seed", [7, 8])
def test_watson_u2_matches_edf_model(spark, tmp_path, seed):
    from trackdechets_etl_spark.queries.round79 import STAGED_QUERIES

    pairs = _tied_fixture(seed)
    _write_events(spark, tmp_path, pairs)
    row = (
        STAGED_QUERIES["events_watson_u2"]
        .fn(spark, str(tmp_path))
        .collect()[0]
        .asDict()
    )
    x, y = _arms(pairs)
    assert row["watson_u2"] == pytest.approx(
        _watson_model(x, y), abs=2e-6
    )


# ------------------------------------------------------ Kendall's W


def test_kendall_w_matches_rank_model(spark, tmp_path):
    from trackdechets_etl_spark.queries.round79 import STAGED_QUERIES

    rng = random.Random(42)
    rows = []
    days = [f"2024-02-{d:02d} 12:00:00" for d in range(1, 9)]
    types = ["click", "purchase", "view"]
    cells = {}
    for day in days:
        for t in types:
            v = rng.randrange(5) * 1.00 + 1.0
            rows.append((day, t, v))
            cells[(day, t)] = round(v * 100)
    spark.createDataFrame(
        rows, "ts string, event_type string, value double"
    ).selectExpr(
        "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    row = (
        STAGED_QUERIES["events_kendall_w"]
        .fn(spark, str(tmp_path))
        .collect()[0]
        .asDict()
    )
    # direct model: tie-corrected W = 12*S / (n^2 k(k^2-1) - n*sum T)
    n, k = len(days), len(types)
    rsums = dict.fromkeys(types, 0.0)
    tsum = 0
    for day in days:
        vals = sorted(cells[(day, t)] for t in types)
        for t in types:
            v = cells[(day, t)]
            lo = bisect.bisect_left(vals, v)
            hi = bisect.bisect_right(vals, v)
            rsums[t] += (lo + 1 + hi) / 2
        from collections import Counter

        for cnt in Counter(vals).values():
            tsum += cnt**3 - cnt
    mean_r = n * (k + 1) / 2
    S = sum((r - mean_r) ** 2 for r in rsums.values())
    den = n * n * k * (k * k - 1) - n * tsum
    w_ref = 12 * S / den
    assert row["kendall_w"] == pytest.approx(w_ref, abs=2e-6)
    assert row["n_blocks"] == n and row["k"] == k


# --------------------------------------------- JSD and perplexity


def _doc_fixture(spark, tmp_path, texts):
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )


def test_jsd_matches_distribution_model(spark, tmp_path):
    from trackdechets_etl_spark.queries.round79 import STAGED_QUERIES

    texts = [
        "aa bb cc aa",  # even
        "bb cc dd",  # odd
        "aa aa ee",  # even
        "cc dd dd ff",  # odd
    ]
    _doc_fixture(spark, tmp_path, texts)
    row = (
        STAGED_QUERIES["text_js_divergence"]
        .fn(spark, str(tmp_path))
        .collect()[0]
        .asDict()
    )
    from collections import Counter

    c0 = Counter(
        w for i, t in enumerate(texts) if i % 2 == 0 for w in t.split()
    )
    c1 = Counter(
        w for i, t in enumerate(texts) if i % 2 == 1 for w in t.split()
    )
    t0, t1 = sum(c0.values()), sum(c1.values())
    jsd = 0.0
    for w in set(c0) | set(c1):
        p, q = c0[w] / t0, c1[w] / t1
        if p > 0:
            jsd += p / 2 * math.log(2 * p / (p + q))
        if q > 0:
            jsd += q / 2 * math.log(2 * q / (p + q))
    assert row["jsd_nats"] == pytest.approx(jsd, abs=2e-6)
    assert row["vocab_shared"] == len(set(c0) & set(c1))


def test_perplexity_matches_lm_model(spark, tmp_path):
    from trackdechets_etl_spark.queries.round79 import (
        STAGED_QUERIES,
        _PPL_MU,
    )

    texts = [
        "aa bb cc aa bb",  # train (even)
        "bb cc zz",  # eval (odd) — zz is OOV
        "aa dd",  # train
        "dd dd aa qq",  # eval — qq OOV
    ]
    _doc_fixture(spark, tmp_path, texts)
    row = (
        STAGED_QUERIES["text_perplexity_split"]
        .fn(spark, str(tmp_path))
        .collect()[0]
        .asDict()
    )
    from collections import Counter

    ctr = Counter(
        w for i, t in enumerate(texts) if i % 2 == 0 for w in t.split()
    )
    cev = Counter(
        w for i, t in enumerate(texts) if i % 2 == 1 for w in t.split()
    )
    ttr, tev = sum(ctr.values()), sum(cev.values())
    v = len(set(ctr) | set(cev))
    nll = 0.0
    oov = 0
    for w, c in cev.items():
        p = (ctr[w] + _PPL_MU / v) / (ttr + _PPL_MU)
        nll -= c * math.log(p)
        if ctr[w] == 0:
            oov += c
    ce = nll / tev
    assert row["vocab_joint"] == v and row["oov_tokens"] == oov
    assert row["ce_nats"] == pytest.approx(ce, abs=2e-6)
    assert row["perplexity"] == pytest.approx(math.exp(ce), abs=2e-5)


# ------------------------------------------- Theil decomposition


def test_theil_decomposition_identity_and_model(spark, tmp_path):
    from trackdechets_etl_spark.queries.round79 import STAGED_QUERIES

    rng = random.Random(9)
    rows = [
        (rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM"]), rng.randrange(1, 50) * 1.0)
        for _ in range(80)
    ]
    spark.createDataFrame(
        rows, "o_orderpriority string, o_totalprice double"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    row = (
        STAGED_QUERIES["orders_theil_decomposition"]
        .fn(spark, str(tmp_path))
        .collect()[0]
        .asDict()
    )
    xs = [round(p * 100) for _, p in rows]
    n, s = len(xs), sum(xs)
    mu = s / n
    t_total = sum(x / s * math.log(x / mu) for x in xs)
    groups = {}
    for g, p in rows:
        groups.setdefault(g, []).append(round(p * 100))
    t_between = 0.0
    t_within = 0.0
    for g, vals in groups.items():
        sg, ng = sum(vals), len(vals)
        share = sg / s
        t_between += share * math.log(share / (ng / n))
        t_g = sum(x / sg * math.log(x / (sg / ng)) for x in vals)
        t_within += share * t_g
    assert row["theil_total"] == pytest.approx(t_total, abs=2e-6)
    assert row["theil_between"] == pytest.approx(t_between, abs=2e-6)
    assert row["theil_within"] == pytest.approx(t_within, abs=2e-6)
    # the additive identity, as computed
    assert row["theil_recomposed"] == pytest.approx(
        row["theil_total"], abs=5e-6
    )


# --------------------------------------------------- Heaps' model


def test_heaps_matches_direct_model(spark, tmp_path):
    from trackdechets_etl_spark.queries.round79 import (
        STAGED_QUERIES,
        _HEAPS_B,
    )

    rng = random.Random(11)
    words = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randrange(3, 20)))
        for _ in range(40)
    ]
    _doc_fixture(spark, tmp_path, texts)
    row = (
        STAGED_QUERIES["text_heaps_law"]
        .fn(spark, str(tmp_path))
        .collect()[0]
        .asDict()
    )
    grams = {}
    ntok = {}
    for i, t in enumerate(texts):
        ws = t.split()
        gs = [
            " ".join(ws[j : j + 3]) for j in range(len(ws) - 2)
        ]
        ntok[i] = len(gs)
        for g in gs:
            grams.setdefault(g, i)
    lo, hi = 0, len(texts) - 1
    pts = []
    for b in range(1, _HEAPS_B + 1):
        cut = lo + math.floor((hi - lo + 1) * b / _HEAPS_B) - 1
        v = sum(1 for fd in grams.values() if fd <= cut)
        nn = sum(c for d, c in ntok.items() if d <= cut)
        if v > 0 and nn > 0:
            pts.append((math.log(nn), math.log(v)))
    npts = len(pts)
    mx = sum(p[0] for p in pts) / npts
    my = sum(p[1] for p in pts) / npts
    sxx = sum((p[0] - mx) ** 2 for p in pts)
    sxy = sum((p[0] - mx) * (p[1] - my) for p in pts)
    syy = sum((p[1] - my) ** 2 for p in pts)
    beta = sxy / sxx
    k = math.exp(my - beta * mx)
    r2 = sxy * sxy / (sxx * syy)
    assert row["n_points"] == npts
    assert row["heaps_beta"] == pytest.approx(beta, abs=2e-6)
    assert row["heaps_k"] == pytest.approx(k, rel=2e-5)
    assert row["r2"] == pytest.approx(r2, abs=2e-6)
