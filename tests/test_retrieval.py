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


def test_mmr_rerank_diversifies(spark):
    """The defining MMR behavior: a near-copy of the top hit is
    demoted below a less-relevant-but-different candidate."""
    from kolang_spark.llm import mmr_rerank

    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),    # c1: matches the query
            (2, [1.0, 0.25, 0.0, 0.0]),   # c2: near-copy of c1
            (3, [0.0, 0.0, 1.0, 0.5]),    # c3: different direction
        ],
        "vec_id long, embedding array<double>",
    )
    cands = spark.createDataFrame(
        [(100, 1, 0.99), (100, 2, 0.98), (100, 3, 0.70)],
        "query_id long, vec_id long, cos double",
    )
    # pure relevance order would be [1, 2, 3]; with lambda=1/2 the
    # near-copy's sim(c2,c1)~0.97 penalty pushes it below c3
    out = mmr_rerank(cands, vecs, k=3, lam_num=1, lam_den=2, dims=4)
    order = [r.vec_id for r in out.orderBy("rank").collect()]
    assert order == [1, 3, 2]
    # lambda=1 degenerates to pure relevance ranking
    out_rel = mmr_rerank(cands, vecs, k=3, lam_num=1, lam_den=1, dims=4)
    assert [r.vec_id for r in out_rel.orderBy("rank").collect()] == [1, 2, 3]


def test_mmr_rerank_matches_reference_greedy(spark):
    """Replay the greedy selection in pure Python with the identical
    fixed-point arithmetic over a multi-query random pool."""
    import math
    import random

    from kolang_spark.llm import mmr_rerank

    rng = random.Random(7)
    dims, scale = 4, 10**6
    vec = {i: [rng.choice([0.0, 0.25, 0.5, 1.0]) for _ in range(dims)]
           for i in range(12)}
    rows = [(i, vec[i]) for i in vec]
    vdf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cands = []
    for q in (0, 1):
        for i in range(12):
            cands.append((q, i, round(rng.uniform(-0.5, 1.0), 3)))
    cdf = spark.createDataFrame(cands, "query_id long, vec_id long, cos double")

    k, lam_num, lam_den = 5, 7, 10
    got = {
        (r.query_id, r.rank): (r.vec_id, r.mmr_fp)
        for r in mmr_rerank(cdf, vdf, k=k, lam_num=lam_num,
                            lam_den=lam_den, dims=dims).collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(vec[a], vec[b]))
        na = math.sqrt(sum(x * x for x in vec[a]))
        nb = math.sqrt(sum(x * x for x in vec[b]))
        return d / (na * nb) if na and nb else None

    want = {}
    for q in (0, 1):
        pool = {i: math.floor(r * scale) for (qq, i, r) in cands if qq == q}
        sel = []
        for t in range(1, k + 1):
            best = None
            for i, rel_fp in pool.items():
                if i in sel:
                    continue
                mx = max(
                    (math.floor(cos(i, s) * scale) for s in sel), default=0
                )
                score = lam_num * rel_fp - (lam_den - lam_num) * mx
                key = (-score, i)
                if best is None or key < best[0]:
                    best = (key, i, score)
            sel.append(best[1])
            want[(q, t)] = (best[1], best[2])
    assert got == want


def test_retrieval_metrics_per_query(spark):
    from kolang_spark.llm import retrieval_metrics

    results = spark.createDataFrame(
        [
            # q1: relevant at ranks 2 and 5
            (1, 10, 1), (1, 11, 2), (1, 12, 3), (1, 13, 4), (1, 14, 5),
            # q2: relevant at rank 1
            (2, 20, 1), (2, 21, 2),
            # q3: nothing relevant retrieved
            (3, 30, 1),
        ],
        "query_id long, vec_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, 11), (1, 14), (1, 99), (2, 20), (3, 77), (4, 40)],
        "query_id long, vec_id long",
    )
    got = {
        r.query_id: (r.n_rel, r.hits_at_k, r.recall_at_k, r.rr_micro)
        for r in retrieval_metrics(results, qrels, k=3).collect()
    }
    assert got[1] == (3, 1, round(1 / 3, 6), 500000)   # first rel at rank 2
    assert got[2] == (1, 1, 1.0, 1000000)
    assert got[3] == (1, 0, 0.0, 0)
    assert got[4] == (1, 0, 0.0, 0)   # judged query never retrieved
    with pytest.raises(ValueError):
        retrieval_metrics(results, qrels, k=0)
