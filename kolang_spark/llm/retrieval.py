"""Distributed BM25 retrieval — the sparse lexical complement to the
engine's dense ANN families (`llm/similarity.py`): score documents for
a query set with Okapi BM25 (Robertson & Zaragoza 2009; the Lucene
variant of the idf) and return the top-k per query.

Scale shape: the "index" is two derived tables — per-document term
frequencies (one explode + hash aggregate over the corpus) and
per-term document frequencies (one more aggregate over that) — both
map-side combinable. Scoring joins doc postings against the DISTINCT
query terms (the query side is small by construction and rides a
broadcast, so the corpus-sized postings table never shuffles for the
join); the per-(query, doc) aggregate shuffles one reduced row per
pair, and the top-k is a (query-partitioned) window — never global.
Corpus constants (N, avgdl) ride a 1-row broadcast.

Float determinism: per-term BM25 contributions are rounded to integer
micro-units before the per-pair sum (the engine's standard fixed-point
idiom), so scores are exact longs — order-independent under partial
aggregation and bit-for-bit replayable by a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kolang_spark.llm.textstats import tokenize

__all__ = ["bm25_topk", "mmr_rerank", "retrieval_metrics"]

_MICRO = 1e6


def _tok(text_col: str, lowercase: bool):
    t = tokenize(F.col(text_col))
    if lowercase:
        t = F.transform(t, lambda x: F.lower(x))
    return F.filter(t, lambda x: x != "")


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    lowercase: bool = True,
) -> DataFrame:
    """Top-``k`` documents per query under Okapi BM25.

    ``score(q, d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) /
    (tf + k1·(1 − b + b·dl/avgdl))`` with the Lucene idf
    ``ln(1 + (N − df + 0.5)/(df + 0.5))`` (always ≥ 0). Query terms are
    deduplicated (standard BM25 ignores query-side repetition).

    Returns ``(query_id, doc_id, score, rank)`` with rank 1..k per
    query, ties broken by ``doc_id``; a query whose terms match no
    document yields no rows. ``score`` is exact micro-unit fixed point
    divided back to double — deterministic on any partitioning.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    # postings: (term, doc, tf) + doc length
    toks = docs.select(
        F.col(id_col).alias("__d__"),
        F.explode(_tok(text_col, lowercase)).alias("term"),
    )
    tf = toks.groupBy("__d__", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dl = toks.groupBy("__d__").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    consts = dl.agg(
        F.count(F.lit(1)).cast("long").alias("__n__"),
        F.sum("dl").cast("long").alias("__tl__"),
    )

    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(_tok(query_text_col, lowercase)).alias("term"),
        )
        .distinct()
    )
    # attach df to the SMALL side: broadcast the query terms into the
    # vocabulary-sized df table (a semi-join-shaped probe — the
    # vocabulary is never broadcast; at 100 TB it can be 100M+ terms),
    # yielding a ≤|query-terms| frame that then rides the broadcast
    # into the corpus-sized postings join
    qt = df_t.join(F.broadcast(qterms), "term")

    n_d = F.col("__n__").cast("double")
    avgdl = F.col("__tl__").cast("double") / n_d
    idf = F.log(
        F.lit(1.0)
        + (n_d - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tfd = F.col("tf").cast("double")
    tfn = (tfd * F.lit(float(k1) + 1.0)) / (
        tfd
        + F.lit(float(k1))
        * (F.lit(1.0 - float(b)) + F.lit(float(b)) * F.col("dl").cast("double") / avgdl)
    )
    contrib = F.round(idf * tfn * F.lit(_MICRO)).cast("long")

    # tf ⋈ dl is the one corpus×corpus join — an equi-join on the doc
    # id, the natural co-partitioning (both sides are aggregates of the
    # same explode; AQE coalesces the shared shuffle)
    scored = (
        tf.join(F.broadcast(qt), "term")
        .join(dl, "__d__")
        .crossJoin(F.broadcast(consts))
        .select("query_id", F.col("__d__"), contrib.alias("__c__"))
        .groupBy("query_id", "__d__")
        .agg(F.sum("__c__").cast("long").alias("__s__"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__s__").desc(), F.col("__d__")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("__d__").alias(id_col),
            (F.col("__s__").cast("double") / F.lit(_MICRO)).alias("score"),
            "rank",
        )
    )


def mmr_rerank(
    candidates: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    lam_num: int = 7,
    lam_den: int = 10,
    dims: "int | None" = None,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    rel_col: str = "cos",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): from each query's candidate pool, greedily select ``k``
    results maximizing ``λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)`` —
    relevance traded against redundancy with what's already picked.
    The standard diversifier between a first-stage retriever (dense
    ANN / BM25, both in this engine) and an LLM context window: top-k
    by raw cosine hands the model five paraphrases of one passage;
    MMR hands it five *different* relevant passages.

    Greedy selection is inherently sequential in ``k``, so the shape
    is ``k`` bounded DataFrame steps (the Lloyd-iteration idiom — the
    rank frame is ``localCheckpoint``-ed per step to keep the plan
    O(1) deep): each step anti-joins the already-selected set, takes
    per-candidate ``max sim`` to the selected set via one equi-join on
    the query id, and picks the per-query argmax with a bounded
    window. All frames are (n_queries × pool)-sized — never
    corpus-sized; the corpus appears only in the one up-front vector
    join. Candidate pools should be first-stage top-N (N ≲ 100), so
    the within-query sims table is N² per query, built once.

    Determinism: λ is the integer ratio ``lam_num/lam_den`` and
    relevances/similarities are floored to integer micro-units of
    ``scale``, so every selection (ties by ascending id) and every
    returned score is exact integer arithmetic — SQL-replayable.
    Score contract: ``mmr_fp = lam_num·rel_fp − (lam_den−lam_num)·
    max_sim_fp`` (scaled by ``lam_den``; monotone in the paper's λ
    formula), with ``max_sim_fp = 0`` for the first pick.

    Returns ``(query_id_col, id_col, rank, mmr_fp)``, rank 1..k per
    query (fewer when the pool is smaller than ``k``).
    """
    from kolang_spark.llm.similarity import _as_double, _dot, _norm, _safe_div_cos

    if k < 1:
        raise ValueError("k must be >= 1")
    if not 0 < lam_num <= lam_den:
        raise ValueError("need 0 < lam_num <= lam_den")

    vecs = vectors.select(
        F.col(id_col).alias("__d_id"), _as_double(F.col(vec_col)).alias("__v")
    ).withColumn("__n", _norm("__v", dims))
    cand = (
        candidates.select(
            F.col(query_id_col).alias("q_id"),
            F.col(id_col).alias("d_id"),
            F.col(rel_col).cast("double").alias("__rel"),
        )
        .join(vecs, F.col("d_id") == F.col("__d_id"))
        .select(
            "q_id",
            "d_id",
            F.floor(F.col("__rel") * scale).cast("long").alias("rel_fp"),
            "__v",
            "__n",
        )
        .localCheckpoint(eager=False)
    )
    a, b = cand.alias("a"), cand.alias("b")
    sim = _safe_div_cos(
        _dot("a.__v", "b.__v", dims), F.col("a.__n"), F.col("b.__n")
    )
    sims = (
        a.join(
            b,
            (F.col("a.q_id") == F.col("b.q_id"))
            & (F.col("a.d_id") != F.col("b.d_id")),
        )
        .select(
            F.col("a.q_id").alias("q_id"),
            F.col("a.d_id").alias("id_a"),
            F.col("b.d_id").alias("id_b"),
            F.floor(sim * scale).cast("long").alias("sim_fp"),
        )
        .localCheckpoint(eager=False)
    )

    penalty = lam_den - lam_num
    selected = None
    w = Window.partitionBy("q_id").orderBy(
        F.col("mmr_fp").desc(), F.col("d_id").asc()
    )
    for t in range(1, k + 1):
        if selected is None:
            scored = cand.select(
                "q_id", "d_id", (F.lit(lam_num) * F.col("rel_fp")).alias("mmr_fp")
            )
        else:
            # anti-join the already-selected docs of the same query
            remaining = cand.join(
                selected.select("q_id", "d_id"), ["q_id", "d_id"], "left_anti"
            )
            msim = (
                sims.join(
                    selected.select(
                        "q_id", F.col("d_id").alias("id_b")
                    ),
                    ["q_id", "id_b"],
                )
                .groupBy("q_id", F.col("id_a").alias("d_id"))
                .agg(F.max("sim_fp").alias("__mx"))
            )
            scored = remaining.join(msim, ["q_id", "d_id"], "left").select(
                "q_id",
                "d_id",
                (
                    F.lit(lam_num) * F.col("rel_fp")
                    - F.lit(penalty) * F.coalesce("__mx", F.lit(0))
                ).alias("mmr_fp"),
            )
        pick = (
            scored.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("q_id", "d_id", F.lit(t).alias("rank"), "mmr_fp")
        )
        selected = (
            pick
            if selected is None
            else selected.unionByName(pick)
        ).localCheckpoint(eager=True)

    return selected.select(
        F.col("q_id").alias(query_id_col),
        F.col("d_id").alias(id_col),
        "rank",
        "mmr_fp",
    )


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query retrieval evaluation — the IR scorecard (recall@k,
    hit count, reciprocal rank) for any ranked-results frame against a
    relevance-judgment set. Closes the loop on the engine's retrieval
    family: score `bm25_topk` / `lsh_topk` / `ivf_topk` / `mmr_rerank`
    output against exact top-k truth or human qrels with one call.

    ``results``: ``(query_id_col, id_col, rank_col)`` ranked 1..N.
    ``qrels``: ``(query_id_col, id_col)`` relevant pairs (extra
    columns ignored; duplicates de-duplicated).

    Scale shape: one equi-join on (query, doc) + two map-side
    aggregates — queries with no relevant docs are dropped (recall is
    undefined there, the trec_eval convention).

    Determinism: ``rr_micro`` is the reciprocal rank in exact integer
    micro-units (``1e6 // first_relevant_rank``; 0 when nothing
    relevant is ranked), so aggregating MRR downstream stays
    order-independent. Returns ``(query_id_col, n_rel, hits_at_k,
    recall_at_k, rr_micro)``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    res = results.select(
        F.col(query_id_col).alias("q_id"),
        F.col(id_col).alias("d_id"),
        F.col(rank_col).cast("int").alias("rnk"),
    )
    rel = (
        qrels.select(
            F.col(query_id_col).alias("q_id"), F.col(id_col).alias("d_id")
        )
        .distinct()
    )
    n_rel = rel.groupBy("q_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rel")
    )
    joined = res.join(rel, ["q_id", "d_id"])  # relevant retrieved docs
    per_q = joined.groupBy("q_id").agg(
        F.sum((F.col("rnk") <= k).cast("long")).cast("long").alias("hits_at_k"),
        F.min("rnk").alias("first_rel_rank"),
    )
    return (
        n_rel.join(per_q, "q_id", "left")
        .select(
            F.col("q_id").alias(query_id_col),
            "n_rel",
            F.coalesce("hits_at_k", F.lit(0).cast("long")).alias("hits_at_k"),
            F.round(
                F.coalesce("hits_at_k", F.lit(0)) * F.lit(1.0) / F.col("n_rel"),
                6,
            ).alias("recall_at_k"),
            F.coalesce(
                (F.lit(1_000_000).cast("long") / F.col("first_rel_rank"))
                .cast("long"),
                F.lit(0).cast("long"),
            ).alias("rr_micro"),
        )
    )
