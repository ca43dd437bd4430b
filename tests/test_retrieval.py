"""Tests for distributed BM25 retrieval (`kolang_spark/llm/retrieval.py`)."""

import math

import pytest

from kolang_spark.llm.retrieval import bm25_topk


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(
        [
            (0, "apple banana apple"),
            (1, "apple cherry"),
            (2, "banana banana banana cherry"),
            (3, "dog cat mouse"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(10, "apple"), (11, "banana cherry"), (12, "zebra")],
        "query_id long, query_text string",
    )
    return docs, queries


def _bm25_reference(docs, q_terms, k1=1.2, b=0.75):
    """Plain-Python BM25 with the same micro-unit fixed point."""
    tf: dict = {}
    dl: dict = {}
    for did, text in docs:
        toks = text.lower().split()
        dl[did] = len(toks)
        for t in toks:
            tf[(did, t)] = tf.get((did, t), 0) + 1
    df: dict = {}
    for (did, t) in tf:
        df[t] = df.get(t, 0) + 1
    n = len(dl)
    avgdl = sum(dl.values()) / n
    scores: dict = {}
    for did in dl:
        micro = 0
        hit = False
        for t in q_terms:
            if (did, t) not in tf:
                continue
            hit = True
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            f = tf[(did, t)]
            tfn = (f * (k1 + 1.0)) / (f + k1 * ((1.0 - b) + (b * dl[did]) / avgdl))
            micro += round(idf * tfn * 1e6)
        if hit:
            scores[did] = micro / 1e6
    return scores


def test_bm25_matches_hand_computed_scores(spark, corpus):
    docs, queries = corpus
    rows = [(0, "apple banana apple"), (1, "apple cherry"),
            (2, "banana banana banana cherry"), (3, "dog cat mouse")]
    got = bm25_topk(docs, queries, k=10).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r.query_id, {})[r.doc_id] = (r.score, r.rank)

    expect_apple = _bm25_reference(rows, ["apple"])
    assert set(by_q[10]) == set(expect_apple)
    for did, s in expect_apple.items():
        assert by_q[10][did][0] == pytest.approx(s, abs=0), did
    # doc 0 has tf=2 for 'apple' and wins over doc 1's tf=1
    assert by_q[10][0][1] == 1 and by_q[10][1][1] == 2

    expect_bc = _bm25_reference(rows, ["banana", "cherry"])
    assert set(by_q[11]) == set(expect_bc)
    for did, s in expect_bc.items():
        assert by_q[11][did][0] == pytest.approx(s, abs=0), did

    # no-match query yields no rows at all
    assert 12 not in by_q


def test_bm25_k_caps_and_tiebreak(spark, corpus):
    docs, queries = corpus
    got = bm25_topk(docs, queries, k=1).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r.query_id, []).append(r)
    assert all(len(v) == 1 and v[0].rank == 1 for v in per_q.values())


def test_bm25_deterministic_under_repartition(spark, corpus):
    docs, queries = corpus
    a = sorted((r.query_id, r.doc_id, r.score, r.rank)
               for r in bm25_topk(docs, queries, k=10).collect())
    b = sorted((r.query_id, r.doc_id, r.score, r.rank)
               for r in bm25_topk(docs.repartition(5), queries.repartition(2), k=10).collect())
    assert a == b


def test_bm25_plan_no_udf_no_cartesian_no_global_window(spark, corpus):
    from kolang_spark.plans.audit import explain_str, find_global_windows

    docs, queries = corpus
    df = bm25_topk(docs, queries, k=3)
    plan = explain_str(df, mode="simple")
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert not find_global_windows(df)


def test_bm25_validates_k(spark, corpus):
    docs, queries = corpus
    with pytest.raises(ValueError):
        bm25_topk(docs, queries, k=0)
