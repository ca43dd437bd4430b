"""Train/eval contamination detection: the decontamination pass every
serious pretraining pipeline runs before training (the GPT-3 / Pile
recipe — flag any training document sharing a long word n-gram with an
evaluation benchmark).

Scale shape: the *eval* side is benchmarks — thousands of documents,
millions of n-grams at most — so its distinct n-gram fingerprints ride
a broadcast; the 100 TB *corpus* side is tokenized and shingled exactly
once and shuffled exactly once (the per-document counting aggregate,
map-side combinable, carrying ids and counts — never the n-gram text).
One Arrow-free, UDF-free pass.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kolang_spark.llm.dedup import with_shingles

__all__ = ["ngram_contamination"]


def ngram_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: Optional[str] = None,
    fingerprint: bool = True,
) -> DataFrame:
    """Per-corpus-document contamination against an eval set.

    A document is *contaminated* if any of its distinct word ``n``-grams
    appears anywhere in ``eval_df`` (distinct n-grams across all eval
    documents — which eval row matched is irrelevant for the decision).
    ``n=13`` is the published GPT-3/Pile decontamination gram length;
    lower it for stricter screens.

    Returns one row per corpus document:
    ``(id_col, n_ngrams, n_hits, contaminated)`` where ``n_hits`` counts
    the document's distinct n-grams found in the eval set (documents
    shorter than ``n`` tokens have ``n_ngrams = 0`` and are never
    contaminated).

    ``fingerprint=True`` (default) joins on ``xxhash64`` of the n-gram
    instead of its text — at 100 TB the join exchanges 8 bytes per gram
    rather than ~13 words; a 64-bit collision mislabels one gram in
    ~2^64, which is noise for a screening pass. Set ``False`` for the
    byte-exact join.
    """
    if n < 1:
        raise ValueError("n must be >= 1")

    def key(c):
        # NULL-safe: explode_outer emits a NULL gram for gram-less
        # documents, and hash(NULL) is the seed (not NULL) — keep the
        # key NULL so it can never equi-join an eval gram
        hashed = F.xxhash64(c) if fingerprint else c
        return F.when(c.isNull(), F.lit(None)).otherwise(hashed)

    csh = with_shingles(corpus.select(id_col, text_col), text_col, n)
    esh = with_shingles(
        eval_df.select(eval_text_col or text_col), eval_text_col or text_col, n
    )
    # explode_outer + post-explode null filter, NOT plain explode: for a
    # bare explode the optimizer infers `size(shingles)>0 AND
    # isnotnull(shingles)` and pushes both through the projection,
    # duplicating the (huge) shingle expression 3x per row in the
    # pushed filter — tripling both per-row work and the codegen unit.
    # Filtering the exploded attribute keeps the expression evaluated
    # exactly once.
    eval_grams = (
        esh.select(F.explode_outer("shingles").alias("g"))
        .where(F.col("g").isNotNull())
        .select(key(F.col("g")).alias("__h__"))
        .distinct()
        .withColumn("__hit__", F.lit(True))
    )
    # ONE pass over the corpus: explode_outer keeps gram-less documents
    # (NULL gram row), the broadcast LEFT join marks eval matches, and a
    # single hash aggregate folds both outputs — the corpus is
    # tokenized/shingled once and shuffled once (the groupBy), versus
    # the naive ids⋈hits formulation that shingles the corpus twice.
    # Shingles are distinct per document (with_shingles), so counting
    # markers IS the distinct-hit count.
    ex = csh.select(
        F.col(id_col),
        F.size("shingles").alias("__n__"),
        F.explode_outer("shingles").alias("g"),
    ).select(id_col, "__n__", key(F.col("g")).alias("__h__"))
    return (
        ex.join(F.broadcast(eval_grams), "__h__", "left")
        .groupBy(id_col)
        .agg(
            F.max("__n__").alias("n_ngrams"),
            F.count("__hit__").cast("bigint").alias("n_hits"),
        )
        .select(
            id_col,
            "n_ngrams",
            "n_hits",
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )
