"""Tests for the distributed linear text classifier
(`kolang_spark/llm/classify.py`): NB log-odds training, scoring
semantics, fixed-point determinism."""

import math

import pytest

from pyspark.sql import functions as F

from kolang_spark.llm.classify import linear_text_classifier, train_token_logodds


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [
        # positive class: fruit vocabulary
        (0, "apple banana apple cherry", True),
        (1, "banana cherry apple", True),
        (2, "cherry apple banana banana", True),
        # negative class: metal vocabulary
        (3, "iron copper zinc", False),
        (4, "copper iron iron zinc", False),
        (5, "zinc zinc copper", False),
        # shared filler in both classes
        (6, "apple the the", True),
        (7, "iron the the", False),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, y boolean")


def test_train_and_classify_separates_planted_vocab(spark, labeled):
    w = train_token_logodds(labeled, "y")
    holdout = spark.createDataFrame(
        [
            (100, "apple banana"),
            (101, "cherry apple apple"),
            (102, "iron zinc"),
            (103, "copper copper iron"),
            (104, ""),  # empty -> NULL score
            (105, "quux unseen tokens only"),  # all-unseen -> score 0
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in linear_text_classifier(holdout, w).collect()}
    assert got[100].score > 0 and got[101].score > 0
    assert got[102].score < 0 and got[103].score < 0
    assert got[100].prob > 0.5 > got[102].prob
    assert got[104].n_tokens == 0 and got[104].score is None and got[104].prob is None
    # unseen tokens carry no evidence: exact zero score, prob 0.5
    assert got[105].score == 0.0 and got[105].prob == 0.5


def test_weights_match_hand_computed_nb_logodds(spark, labeled):
    w = {r.term: r.w_micro for r in train_token_logodds(labeled, "y").collect()}
    # corpus counts: positive total tokens / negative total tokens
    pos_docs = ["apple banana apple cherry", "banana cherry apple",
                "cherry apple banana banana", "apple the the"]
    neg_docs = ["iron copper zinc", "copper iron iron zinc",
                "zinc zinc copper", "iron the the"]
    pc: dict = {}
    nc: dict = {}
    for d in pos_docs:
        for t in d.split():
            pc[t] = pc.get(t, 0) + 1
    for d in neg_docs:
        for t in d.split():
            nc[t] = nc.get(t, 0) + 1
    vocab = set(pc) | set(nc)
    tp, tn, v = sum(pc.values()), sum(nc.values()), len(vocab)
    for term in vocab:
        expect = (
            (math.log(pc.get(term, 0) + 1.0) - math.log(tp + 1.0 * v))
            - (math.log(nc.get(term, 0) + 1.0) - math.log(tn + 1.0 * v))
        )
        assert w[term] == round(expect * 1e6), term
    # shared filler is a weak signal, not zero only due to count asymmetry
    assert abs(w["the"]) < abs(w["apple"])


def test_unnormalized_score_is_exact_nb_llr_sum(spark, labeled):
    w = train_token_logodds(labeled, "y")
    wmap = {r.term: r.w_micro for r in w.collect()}
    doc = spark.createDataFrame([(0, "apple iron the apple")], "doc_id long, text string")
    got = linear_text_classifier(doc, w, normalize=False).collect()[0]
    expect_micro = 2 * wmap["apple"] + wmap["iron"] + wmap["the"]
    assert got.score == expect_micro / 1e6
    assert got.n_tokens == 4


def test_classifier_deterministic_under_repartition(spark, labeled):
    w = train_token_logodds(labeled, "y")
    docs = spark.createDataFrame(
        [(i, "apple iron the banana zinc copper cherry" * 3) for i in range(40)],
        "doc_id long, text string",
    )
    a = {r.doc_id: (r.score, r.prob)
         for r in linear_text_classifier(docs, w).collect()}
    b = {r.doc_id: (r.score, r.prob)
         for r in linear_text_classifier(docs.repartition(13), w.repartition(7)).collect()}
    assert a == b  # exact long micro-sums -> bit-identical floats


def test_classifier_plan_is_broadcast_and_udf_free(spark, labeled):
    from kolang_spark.plans.audit import explain_str

    w = train_token_logodds(labeled, "y")
    df = linear_text_classifier(labeled, w)
    plan = explain_str(df, mode="simple")
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_bias_and_label_expression(spark, labeled):
    # bias shifts the decision boundary; boolean expressions work as labels
    df = labeled.withColumn("lab", F.col("doc_id") < 3)
    w = train_token_logodds(df, "lab")
    doc = spark.createDataFrame([(0, "quux")], "doc_id long, text string")
    lo = linear_text_classifier(doc, w, bias=-2.0).collect()[0]
    hi = linear_text_classifier(doc, w, bias=2.0).collect()[0]
    assert lo.score == -2.0 and hi.score == 2.0
    assert lo.prob < 0.5 < hi.prob


def test_classifier_streaming_foreachbatch_equals_batch(spark, labeled, tmp_path):
    """Scoring a document stream in a foreachBatch sink against a
    static weight table produces exactly the batch result — per-batch
    scoring is self-contained (weights static, per-doc aggregate within
    the micro-batch), so stream == batch with no state."""
    import os

    w = train_token_logodds(labeled, "y").localCheckpoint(eager=True)
    docs = spark.createDataFrame(
        [(i, "apple iron banana" if i % 2 else "zinc copper the") for i in range(20)],
        "doc_id long, text string",
    )
    src = str(tmp_path / "cls_src")
    # two separate files -> two micro-batches with maxFilesPerTrigger=1
    docs.where(F.col("doc_id") < 10).coalesce(1).write.parquet(os.path.join(src, "a"))
    docs.where(F.col("doc_id") >= 10).coalesce(1).write.parquet(os.path.join(src, "b"))

    out: list = []
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )

    def score_batch(bdf, _bid):
        out.extend(linear_text_classifier(bdf, w).collect())

    q = stream.writeStream.foreachBatch(score_batch).trigger(availableNow=True).start()
    q.awaitTermination(120)

    streamed = {(r.doc_id, r.n_tokens, r.score, r.prob) for r in out}
    batch = {
        (r.doc_id, r.n_tokens, r.score, r.prob)
        for r in linear_text_classifier(docs, w).collect()
    }
    assert streamed == batch and len(streamed) == 20
