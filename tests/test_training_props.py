"""Property-based tests for the training-data operators: Spark
expressions vs straightforward Python models on arbitrary inputs."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from trackdechets_etl_spark.llm.text import (
    PII_EMAIL_PATTERN,
    PII_NUMBER_PATTERN,
    pii_count,
    scrub_pii,
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# Text that may or may not contain PII-looking fragments.
pii_text = st.lists(
    st.one_of(
        st.text(alphabet="abc @.0123456789", min_size=0, max_size=12),
        st.just("user@example.com"),
        st.just("0612345678"),
        st.just("12345"),
        st.just("a@b.io"),
    ),
    min_size=0,
    max_size=8,
).map(" ".join)


def _model_scrub(text: str) -> str:
    out = re.sub(PII_EMAIL_PATTERN, "<EMAIL>", text)
    return re.sub(PII_NUMBER_PATTERN, "<NUM>", out)


def _model_count(text: str) -> int:
    after_email = re.sub(PII_EMAIL_PATTERN, "<EMAIL>", text)
    return len(re.findall(PII_EMAIL_PATTERN, text)) + len(
        re.findall(PII_NUMBER_PATTERN, after_email)
    )


@given(st.lists(pii_text, min_size=1, max_size=20))
@SETTINGS
def test_scrub_matches_python_regex_model(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        scrub_pii(F.col("text")).alias("s"), pii_count(F.col("text")).alias("n")
    ).collect()
    for (t, r) in zip(texts, rows):
        assert r["s"] == _model_scrub(t), t
        assert r["n"] == _model_count(t), t


@given(st.lists(pii_text, min_size=1, max_size=10))
@SETTINGS
def test_scrub_is_idempotent(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    once = df.select(scrub_pii(F.col("text")).alias("s"))
    twice = once.select(scrub_pii(F.col("s")).alias("s"))
    assert [r["s"] for r in once.collect()] == [r["s"] for r in twice.collect()]


def test_pack_sequences_budget_and_order(spark):
    """Every pack's token total stays under budget + one max doc (the
    spillover doc), packs are contiguous in doc order per shard, and
    every doc is assigned exactly once."""
    from trackdechets_etl_spark.queries.training import (
        N_SHARDS,
        PACK_BUDGET,
        _pack_sequences,
    )
    from tests.conftest import SF_DIR

    rows = _pack_sequences(spark, SF_DIR).collect()
    assert len({r["doc_id"] for r in rows}) == len(rows)
    by_shard: dict = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, docs in by_shard.items():
        max_tokens = max(d["n_tokens"] for d in docs)
        pack_totals: dict = {}
        last_pack = 0
        for d in docs:
            assert d["pack_id"] >= last_pack, "pack ids must be monotone in doc order"
            last_pack = d["pack_id"]
            pack_totals[d["pack_id"]] = pack_totals.get(d["pack_id"], 0) + d["n_tokens"]
        for total in pack_totals.values():
            assert total <= PACK_BUDGET + max_tokens


def test_mixture_weight_one_keeps_everything(spark):
    from trackdechets_etl_spark.queries.training import MIX_WEIGHTS, _mixture_sample
    from tests.conftest import SF_DIR

    rows = {r["source"]: r for r in _mixture_sample(spark, SF_DIR).collect()}
    full = [s for s, w in MIX_WEIGHTS.items() if w >= 1.0]
    for s in full:
        assert rows[s]["n_kept"] == rows[s]["n_total"]
    # and at least one throttled source actually dropped rows
    throttled = [s for s in rows if MIX_WEIGHTS.get(s, 0.1) < 1.0]
    assert any(rows[s]["n_kept"] < rows[s]["n_total"] for s in throttled)
