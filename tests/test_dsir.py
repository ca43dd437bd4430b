"""Tests for DSIR importance reweighting/resampling
(`kolang_spark/llm/dsir.py`)."""

import pytest

from pyspark.sql import functions as F

from kolang_spark.llm.dsir import dsir_logratios, dsir_resample


@pytest.fixture(scope="module")
def corpora(spark):
    # raw pool: fruit-ish docs (target-like) + metal-ish docs (off-target)
    raw = spark.createDataFrame(
        [
            (0, "apple banana cherry apple"),
            (1, "banana apple banana"),
            (2, "iron copper zinc iron"),
            (3, "copper zinc copper"),
            (4, ""),  # zero features
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [
            (100, "apple banana apple"),
            (101, "cherry banana apple cherry"),
        ],
        "doc_id long, text string",
    )
    return raw, target


def test_logratios_rank_target_like_docs_higher(spark, corpora):
    raw, target = corpora
    got = {r.doc_id: r for r in dsir_logratios(raw, target).collect()}
    assert len(got) == 5
    # fruit docs score above metal docs
    assert min(got[0].avg_logratio, got[1].avg_logratio) > max(
        got[2].avg_logratio, got[3].avg_logratio
    )
    # zero-feature doc: NULL score, n_feats 0
    assert got[4].n_feats == 0 and got[4].logratio_micro is None
    assert got[4].avg_logratio is None
    # exact relationship between the fixed-point sum and the average
    for i in range(4):
        assert got[i].avg_logratio == got[i].logratio_micro / (got[i].n_feats * 1e6)


def test_logratios_deterministic_under_repartition(spark, corpora):
    raw, target = corpora
    a = {r.doc_id: (r.logratio_micro, r.avg_logratio)
         for r in dsir_logratios(raw, target).collect()}
    b = {r.doc_id: (r.logratio_micro, r.avg_logratio)
         for r in dsir_logratios(raw.repartition(7), target.repartition(3)).collect()}
    assert a == b


def test_resample_low_temperature_approaches_top_by_score(spark, corpora):
    raw, target = corpora
    # T -> 0: softmax collapses onto the argmax; with n=2 the two fruit
    # docs must win regardless of the Gumbel draw
    got = sorted(
        r.doc_id
        for r in dsir_resample(raw, target, n=2, temperature=1e-6).collect()
    )
    assert got == [0, 1]


def test_resample_deterministic_and_salted(spark, corpora):
    raw, target = corpora
    a = sorted((r.doc_id, r.dsir_key) for r in dsir_resample(raw, target, n=3).collect())
    b = sorted((r.doc_id, r.dsir_key) for r in dsir_resample(raw, target, n=3).collect())
    assert a == b
    # a different salt redraws the Gumbel noise (keys change)
    c = sorted((r.doc_id, r.dsir_key) for r in dsir_resample(raw, target, n=3, salt="x").collect())
    assert [k for _, k in a] != [k for _, k in c]
    # selected rows carry the original columns
    cols = dsir_resample(raw, target, n=2).columns
    assert cols == ["doc_id", "text", "dsir_key"]


def test_resample_excludes_zero_feature_docs(spark, corpora):
    raw, target = corpora
    got = {r.doc_id for r in dsir_resample(raw, target, n=10).collect()}
    assert 4 not in got and got == {0, 1, 2, 3}


def test_plan_is_broadcast_and_udf_free(spark, corpora):
    from kolang_spark.plans.audit import explain_str, find_global_windows

    raw, target = corpora
    df = dsir_logratios(raw, target)
    plan = explain_str(df, mode="simple")
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "BroadcastExchange" in plan
    assert not find_global_windows(df)


def test_validation(spark, corpora):
    raw, target = corpora
    with pytest.raises(ValueError):
        dsir_logratios(raw, target, alpha=0.0)
    with pytest.raises(ValueError):
        dsir_resample(raw, target, n=1, temperature=0.0)
