"""Training-data preparation: deterministic document → context-window
chunking (the step between curation and tokenizer/packing).

Scale shape: pure Column algebra — tokenize once, derive the window
spine with ``sequence`` + ``explode``, slice per window. No shuffle at
all: chunking rides the scan, and the output stays partitioned however
the input was.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kolang_spark.llm.textstats import tokenize

__all__ = ["chunk_documents"]


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into sliding windows of ``chunk_tokens``
    whitespace tokens with ``overlap`` tokens shared between adjacent
    windows (stride = ``chunk_tokens - overlap``) — the standard
    RAG/pretraining chunking contract.

    One row per window: ``(id_col, chunk_id, n_tokens, chunk_text)``,
    ``chunk_id`` 0-based in document order, ``chunk_text`` the window's
    tokens re-joined with single spaces (token-window chunking is
    defined over tokens; original inter-token whitespace is not
    preserved). Window count for an ``n``-token document is
    ``1 + ceil((n - chunk_tokens) / stride)`` (clamped: empty documents
    produce no rows; documents up to ``chunk_tokens`` tokens produce
    exactly one). The count is computed in pure integer arithmetic so
    any engine (and the DuckDB oracle) derives the identical spine.
    """
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap

    toks = tokenize(F.col(text_col))
    n = F.size(toks)
    # integer ceil((n - chunk)/stride) + 1 without float ops
    extra = (
        ((n - chunk_tokens + stride - 1) - ((n - chunk_tokens + stride - 1) % stride))
        / stride
    ).cast("long")
    n_chunks = (
        F.when(n <= 0, F.lit(0).cast("long"))
        .when(n <= chunk_tokens, F.lit(1).cast("long"))
        .otherwise(extra + 1)
    )
    base = df.select(
        F.col(id_col),
        toks.alias("__toks__"),
        n.alias("__n__"),
        n_chunks.alias("__nc__"),
    ).where(F.col("__nc__") > 0)
    start = F.col("chunk_id") * stride  # 0-based token offset
    return (
        base.select(
            id_col,
            "__toks__",
            "__n__",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("__nc__") - 1)).alias(
                "chunk_id"
            ),
        )
        .select(
            id_col,
            "chunk_id",
            F.least(F.lit(chunk_tokens).cast("long"), F.col("__n__") - start)
            .alias("n_tokens"),
            F.array_join(
                F.slice(F.col("__toks__"), (start + 1).cast("int"), chunk_tokens),
                " ",
            ).alias("chunk_text"),
        )
    )
