"""Degenerate-data cross-engine pins for the staged round79 entries
(the round-14 self-audit discipline): each zero-able denominator /
log-argument / empty-domain case is exercised on synthetic parquet and
compared Spark-vs-DuckDB directly — the guard must yield the IDENTICAL
(typically NULL) output in both engines, not a NULL-vs-inf divergence."""

from __future__ import annotations

import math

import duckdb
import pytest

from tests.test_oracle import _normalize
from trackdechets_etl_spark.queries.round79 import STAGED_QUERIES


# r15: slow shard — excluded from the default pytest run (see
# pytest.ini); run the full suite with -m "slow or not slow".
pytestmark = pytest.mark.slow

def _compare(spark, name, sf_dir, views):
    spec = STAGED_QUERIES[name]
    sdf = spec.fn(spark, str(sf_dir))
    spark_rows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    for t in views:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet/*.parquet'"
        )
    res = con.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(duck_cols)
    assert _normalize(spark_rows, sdf.columns) == _normalize(
        duck_rows, duck_cols
    ), f"{name}: engine divergence on degenerate data"
    return spark_rows, sdf.columns


def test_theil_zero_value_group_is_null_both_engines(spark, tmp_path):
    rows = [
        ("1-URGENT", 0.00),  # zero cents -> ln(0) guard
        ("1-URGENT", 5.00),
        ("2-HIGH", 3.00),
        ("2-HIGH", 4.00),
    ]
    spark.createDataFrame(
        rows, "o_orderpriority string, o_totalprice double"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out, cols = _compare(spark, "orders_theil_index", tmp_path, ["orders"])
    by = {r[0]: r for r in out}
    i_t = cols.index("theil_t")
    i_l = cols.index("theil_l")
    assert by["1-URGENT"][i_t] is None and by["1-URGENT"][i_l] is None
    assert by["2-HIGH"][i_t] is not None and by["2-HIGH"][i_l] is not None


def test_kendall_w_all_tied_blocks_null_both_engines(spark, tmp_path):
    # every event type has the same value on every day -> every block
    # fully tied -> tie denominator nb*k*(k^2-1) - tsum == 0 exactly
    rows = [
        (f"2024-01-0{d} 00:00:00", t, 7.00)
        for d in (1, 2, 3)
        for t in ("click", "view")
    ]
    spark.createDataFrame(
        rows, "ts string, event_type string, value double"
    ).selectExpr(
        "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out, cols = _compare(spark, "events_kendall_w", tmp_path, ["events"])
    row = dict(zip(cols, out[0]))
    assert row["kendall_w"] is None and row["f_approx"] is None


def test_anderson_darling_single_value_null_both_engines(spark, tmp_path):
    rows = [(u, 42.00) for u in range(6)]
    spark.createDataFrame(rows, "user_id long, value double").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out, cols = _compare(
        spark, "events_anderson_darling", tmp_path, ["events"]
    )
    row = dict(zip(cols, out[0]))
    assert row["n_distinct"] == 1 and row["ad_stat"] is None


def test_sign_test_all_tied_null_both_engines(spark, tmp_path):
    rows = []
    for u in range(4):
        rows.append((u, "click", 5.00))
        rows.append((u, "purchase", 5.00))
    spark.createDataFrame(
        rows, "user_id long, event_type string, value double"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out, cols = _compare(spark, "events_sign_test", tmp_path, ["events"])
    row = dict(zip(cols, out[0]))
    assert row["n_tie"] == 4 and row["z"] is None and row["z_cc"] is None


def test_jsd_empty_half_null_both_engines(spark, tmp_path):
    rows = [(2 * i, "alpha beta gamma") for i in range(4)]  # even only
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out, cols = _compare(
        spark, "text_js_divergence", tmp_path, ["documents"]
    )
    row = dict(zip(cols, out[0]))
    assert row["tokens1"] == 0 and row["jsd_nats"] is None


def test_heaps_no_grams_null_both_engines(spark, tmp_path):
    rows = [(i, "just two") for i in range(5)]  # sub-3-token docs
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out, cols = _compare(spark, "text_heaps_law", tmp_path, ["documents"])
    row = dict(zip(cols, out[0]))
    assert row["n_points"] == 0
    assert row["heaps_beta"] is None and row["r2"] is None


def test_sign_test_direction_and_continuity(spark, tmp_path):
    # 3 users spend more on clicks, 1 less, 1 tied:
    # n_pos=3, n_neg=1, m=4 -> z = 2/2 = 1.0, z_cc = 1/2 = 0.5
    rows = []
    for u in range(3):
        rows.append((u, "click", 9.00))
        rows.append((u, "purchase", 1.00))
    rows.append((3, "click", 1.00))
    rows.append((3, "purchase", 9.00))
    rows.append((4, "click", 5.00))
    rows.append((4, "purchase", 5.00))
    spark.createDataFrame(
        rows, "user_id long, event_type string, value double"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out, cols = _compare(spark, "events_sign_test", tmp_path, ["events"])
    row = dict(zip(cols, out[0]))
    assert row["n_pos"] == 3 and row["n_neg"] == 1 and row["n_tie"] == 1
    assert row["z"] == pytest.approx(1.0)
    assert row["z_cc"] == pytest.approx(0.5)


def test_jsd_identical_halves_is_zero(spark, tmp_path):
    rows = [(i, "alpha beta gamma delta") for i in range(4)]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out, cols = _compare(
        spark, "text_js_divergence", tmp_path, ["documents"]
    )
    row = dict(zip(cols, out[0]))
    assert row["jsd_nats"] == pytest.approx(0.0)


def test_jsd_disjoint_halves_is_ln2(spark, tmp_path):
    rows = [(0, "aa bb cc"), (2, "aa bb cc"), (1, "xx yy zz"), (3, "xx yy zz")]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out, cols = _compare(
        spark, "text_js_divergence", tmp_path, ["documents"]
    )
    row = dict(zip(cols, out[0]))
    assert row["vocab_shared"] == 0
    assert row["jsd_nats"] == pytest.approx(math.log(2.0), abs=1e-6)


def test_watson_u2_empty_arm_null_both_engines(spark, tmp_path):
    rows = [(2 * u, float(u) + 1.0) for u in range(5)]  # even users only
    spark.createDataFrame(rows, "user_id long, value double").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out, cols = _compare(spark, "events_watson_u2", tmp_path, ["events"])
    row = dict(zip(cols, out[0]))
    assert row["n1"] == 0 and row["watson_u2"] is None


def test_brunner_munzel_all_tied_null_both_engines(spark, tmp_path):
    rows = [(u, 3.00) for u in range(8)]
    spark.createDataFrame(rows, "user_id long, value double").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out, cols = _compare(
        spark, "events_brunner_munzel", tmp_path, ["events"]
    )
    row = dict(zip(cols, out[0]))
    assert row["p_hat"] is None and row["w_bm"] is None


def test_brunner_munzel_tiny_arm_null_both_engines(spark, tmp_path):
    rows = [(0, 1.0), (2, 2.0), (4, 3.0), (1, 9.0)]  # n1 = 1
    spark.createDataFrame(rows, "user_id long, value double").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out, cols = _compare(
        spark, "events_brunner_munzel", tmp_path, ["events"]
    )
    row = dict(zip(cols, out[0]))
    assert row["n1"] == 1 and row["w_bm"] is None


def test_perplexity_empty_train_half_null_both_engines(spark, tmp_path):
    rows = [(2 * i + 1, "aa bb cc") for i in range(4)]  # odd only
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out, cols = _compare(
        spark, "text_perplexity_split", tmp_path, ["documents"]
    )
    row = dict(zip(cols, out[0]))
    assert row["train_tokens"] == 0
    assert row["ce_nats"] is None and row["perplexity"] is None


def test_perplexity_empty_corpus_zero_rows_both_engines(spark, tmp_path):
    rows = [(i, "") for i in range(3)]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out, _ = _compare(
        spark, "text_perplexity_split", tmp_path, ["documents"]
    )
    assert out == []


def test_theil_decomposition_zero_value_null_both_engines(
    spark, tmp_path
):
    rows = [("1-URGENT", 0.00), ("1-URGENT", 5.00), ("2-HIGH", 3.00)]
    spark.createDataFrame(
        rows, "o_orderpriority string, o_totalprice double"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out, cols = _compare(
        spark, "orders_theil_decomposition", tmp_path, ["orders"]
    )
    row = dict(zip(cols, out[0]))
    assert row["theil_total"] is None and row["theil_between"] is None
