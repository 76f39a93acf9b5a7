"""Invariant tests for the round-5 ninth batch (queries/round14.py):
every operator is replayed in plain Python against its definition.
"""

from __future__ import annotations

from collections import Counter

from tests.conftest import SF_DIR
from trackdechets_etl_spark.queries import all_queries

REGISTRY = all_queries()


def test_langid_eval_confusion_counts(spark):
    # replay on top of the engine's own predictions (text_lang_id is
    # separately oracle-verified), so this pins the eval arithmetic
    preds = REGISTRY["text_lang_id"].fn(spark, SF_DIR).collect()
    cm = Counter((r.labeled_lang, r.pred_lang) for r in preds)
    langs = {k for pair in cm for k in pair}
    out = {
        r.lang: r for r in REGISTRY["text_langid_eval"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == langs
    n_docs = len(preds)
    assert sum(r.tp + r.fn for r in out.values()) == n_docs
    assert sum(r.tp + r.fp for r in out.values()) == n_docs
    for lang, r in out.items():
        tp = cm[(lang, lang)]
        fp = sum(n for (lab, pred), n in cm.items() if pred == lang) - tp
        fn = sum(n for (lab, pred), n in cm.items() if lab == lang) - tp
        assert (r.tp, r.fp, r.fn) == (tp, fp, fn), lang
        if tp + fp:
            assert abs(r.precision - round(tp / (tp + fp), 6)) < 1e-9
        else:
            assert r.precision is None
        if tp + fn:
            assert abs(r.recall - round(tp / (tp + fn), 6)) < 1e-9
        else:
            assert r.recall is None
        if 2 * tp + fp + fn:
            assert abs(r.f1 - round(2 * tp / (2 * tp + fp + fn), 6)) < 1e-9


def test_srm_check_replay(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    counts = Counter((r.event_type, r.user_id % 2) for r in ev)
    out = {
        r.event_type: r
        for r in REGISTRY["events_srm_check"].fn(spark, SF_DIR).collect()
    }
    types = {t for t, _v in counts}
    assert set(out) == types
    for t in types:
        na, nb = counts[(t, 0)], counts[(t, 1)]
        r = out[t]
        assert (r.n_a, r.n_b) == (na, nb)
        chi = (na - nb) ** 2 / (na + nb)
        assert abs(r.chi_sq - round(chi, 6)) < 1e-9
        assert r.srm_breach == (100 * (na - nb) ** 2 > 384 * (na + nb))
        # flag consistent with the float statistic away from the boundary
        if abs(chi - 3.84) > 1e-6:
            assert r.srm_breach == (chi > 3.84)
