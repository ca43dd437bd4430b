"""Corpus-statistical language-model quality scoring — the CCNet/C4
"perplexity filter" stage of a pretraining pipeline, expressed without
an external model: a unigram LM is estimated from the corpus itself
(or any reference corpus) and every document is scored by its average
negative log-probability under it. Gibberish, boilerplate soup, and
wrong-language text score high (surprising); fluent in-distribution
text scores low — the standard cheap proxy where a real KenLM/model
service isn't available in-cluster.

Scale shape: token counts are one hash aggregate over the exploded
corpus (map-side combinable); scoring is an equi-join of the exploded
tokens against the count table (both sides hash-partitioned on the
token — the standard join, AQE-skew-splittable) and one per-document
aggregate. The vocabulary/total constants ride a 1-row broadcast. No
window, no UDF, no driver state.

Float determinism: per-token log contributions are rounded to integer
micro-nats BEFORE the per-document sum, so the aggregate is an exact
long sum (order-independent across partitions/retries) — the same
fixed-point idiom as the engine's revenue sums — and an external SQL
oracle reproduces the score bit-exactly.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kolang_spark.llm.textstats import tokenize

__all__ = ["unigram_lm_scores"]


def unigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
    alpha: float = 1.0,
    lm_df: Optional[DataFrame] = None,
) -> DataFrame:
    """Score each document by average negative log-probability under an
    additively-smoothed unigram LM.

    ``p(tok) = (count(tok) + alpha) / (total + alpha * vocab)`` with
    counts taken from ``lm_df`` (a reference corpus with the same
    ``text_col``; defaults to ``df`` itself — self-scoring, the usual
    "flag the outliers of this crawl" setup). Unseen tokens (possible
    only with an external ``lm_df``) get the smoothed floor
    ``alpha / (total + alpha * vocab)``.

    Returns ``(id_col, n_tokens, avg_neg_logprob)``; documents with no
    tokens get a NULL score. Lower = more typical; filter with e.g.
    ``score < corpus quantile`` (pair with
    :func:`kolang_spark.operators.binning.equi_depth_bin`).

    Every per-token contribution ``ln(count + alpha)`` is rounded to
    integer micro-nats before summation, making the per-document sum
    exact and order-independent (deterministic under Spark's partial
    aggregation AND reproducible by a SQL oracle); the final score is
    ``ln(total + alpha*vocab) - sum_micro / (n * 1e6)``.
    """
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    toks = tokenize(F.col(text_col))
    if lowercase:
        toks = F.transform(toks, lambda t: F.lower(t))

    src = lm_df if lm_df is not None else df
    lm_toks = tokenize(F.col(text_col))
    if lowercase:
        lm_toks = F.transform(lm_toks, lambda t: F.lower(t))
    counts = (
        src.select(F.explode_outer(lm_toks).alias("__tok__"))
        .where(F.col("__tok__") != "")
        .groupBy("__tok__")
        .agg(F.count(F.lit(1)).cast("long").alias("__cnt__"))
    )
    consts = counts.agg(
        F.sum("__cnt__").alias("__total__"),
        F.count(F.lit(1)).alias("__vocab__"),
    )

    ex = df.select(F.col(id_col), F.explode_outer(toks).alias("__tok__")).where(
        F.col("__tok__").isNotNull() & (F.col("__tok__") != "")
    )
    # micro-nat fixed point: exact long sum, order-independent
    contrib = F.round(
        F.log(F.col("__cnt__").cast("double") + F.lit(float(alpha))) * 1e6
    ).cast("long")
    scored = (
        ex.join(counts, "__tok__", "left")
        .select(
            id_col,
            F.coalesce(contrib, F.round(F.log(F.lit(float(alpha))) * 1e6).cast("long")).alias(
                "__c__"
            ),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("__c__").alias("__sum__"),
        )
    )
    denom = F.log(
        F.col("__total__").cast("double")
        + F.lit(float(alpha)) * F.col("__vocab__").cast("double")
    )
    out = scored.crossJoin(F.broadcast(consts)).select(
        id_col,
        "n_tokens",
        (denom - F.col("__sum__") / (F.col("n_tokens") * F.lit(1e6))).alias(
            "avg_neg_logprob"
        ),
    )
    # re-attach zero-token documents with NULL score (left anti would
    # cost a second scan of df; a left join from the id spine does it
    # in the same pass shape)
    spine = df.select(F.col(id_col)).distinct()
    return spine.join(out, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
        "avg_neg_logprob",
    )
