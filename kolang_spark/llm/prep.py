"""Training-data preparation: deterministic document → context-window
chunking (the step between curation and tokenizer/packing).

Scale shape: pure Column algebra — tokenize once, derive the window
spine with ``sequence`` + ``explode``, slice per window. No shuffle at
all: chunking rides the scan, and the output stays partitioned however
the input was.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kolang_spark.llm.textstats import tokenize

__all__ = ["chunk_documents", "pack_examples"]


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


def pack_examples(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    example_tokens: int = 2048,
    tokens_col: Optional[str] = None,
    bucket_size: int = 100_000,
) -> DataFrame:
    """GPT-style concat-and-chunk packing offsets: documents are
    conceptually concatenated in ``id_col`` order into one global token
    stream, which is cut into fixed ``example_tokens`` training
    examples. Returns, per document: ``n_tokens``, ``token_offset``
    (the document's start position in the stream — an exclusive prefix
    sum), and which examples it lands in (``first_example`` /
    ``last_example`` / ``n_examples``; a document that straddles a cut
    spans several). Zero-token documents occupy no stream positions:
    NULL example ids, ``n_examples = 0``.

    This is the metadata a packing writer needs to emit fixed-length
    examples deterministically and in parallel — each writer takes an
    example-id range, joins the documents whose span intersects it, and
    never needs to see its neighbors.

    Scale shape: the global prefix sum is the classic single-partition
    window hazard, so it runs through the two-pass bucketed rewrite
    (:func:`kolang_spark.operators.scale.with_cumulative_sum`): a
    within-bucket window distributed over ``id // bucket_size`` buckets
    plus a broadcast per-bucket offset table — no stage ever funnels
    the table through one partition. ``id_col`` values must be unique
    (they define the concatenation order; ties would make the order,
    and therefore the packing, ambiguous).

    ``tokens_col``: use a precomputed token-count column (e.g. from a
    real tokenizer) instead of the whitespace count of ``text_col``.
    """
    if example_tokens < 1:
        raise ValueError("example_tokens must be >= 1")
    if bucket_size < 1:
        raise ValueError("bucket_size must be >= 1")
    from kolang_spark.operators.scale import with_cumulative_sum

    toks = (
        F.col(tokens_col)
        if tokens_col is not None
        else F.size(tokenize(F.col(text_col)))
    )
    base = df.select(F.col(id_col), toks.cast("long").alias("n_tokens"))
    bucket = F.col(id_col) - F.pmod(F.col(id_col), F.lit(bucket_size))
    cum = with_cumulative_sum(base, "n_tokens", id_col, bucket, out="__cum__")
    off = F.col("__cum__") - F.col("n_tokens")
    nonempty = F.col("n_tokens") > 0
    first = F.floor(off / example_tokens).cast("long")
    last = F.floor((F.col("__cum__") - 1) / example_tokens).cast("long")
    return cum.select(
        id_col,
        "n_tokens",
        off.alias("token_offset"),
        F.when(nonempty, first).alias("first_example"),
        F.when(nonempty, last).alias("last_example"),
        F.when(nonempty, last - first + 1).otherwise(F.lit(0)).cast("long").alias(
            "n_examples"
        ),
    )


def assign_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    examples_per_shard: int = 1000,
    salt: str = "",
    n_buckets: int = 1024,
) -> DataFrame:
    """Deterministic globally-shuffled shard layout — the training
    writer's last step: every row gets ``(shard_id, pos_in_shard)`` as
    if the whole dataset were shuffled by the md5 hash of
    ``(id_col, salt)`` and cut into fixed ``examples_per_shard``
    shards. Reproducible across runs, partitionings, and engines (no
    ``rand()``, no ``monotonically_increasing_id``); a different
    ``salt`` is an independent epoch-level reshuffle; downstream
    writers emit one file per ``shard_id``
    (``write_table(..., partition_by=['shard_id'])``) in parallel.

    Scale shape: the global rank is the single-partition-window hazard,
    so it runs the same two-pass bucketed rewrite as
    :func:`pack_examples`: the hash's high bits define ``n_buckets``
    ordered buckets, per-bucket counts make a tiny offset table
    (broadcast back), and the within-bucket ``row_number`` runs over a
    normal hashed shuffle. Ties are impossible: the order key is
    ``(hash, id)`` and ids must be unique.
    """
    if examples_per_shard < 1:
        raise ValueError("examples_per_shard must be >= 1")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    from kolang_spark.operators.sampling import _hash60

    h = _hash60(id_col, salt)
    shift = 60 - max(1, n_buckets - 1).bit_length()
    src = df.withColumn("__ks_h__", h).withColumn(
        "__ks_bkt__", F.shiftright(F.col("__ks_h__"), shift)
    )
    counts = src.groupBy("__ks_bkt__").agg(F.count(F.lit(1)).alias("__n__"))
    w_off = (
        Window.orderBy("__ks_bkt__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = counts.select(
        "__ks_bkt__",
        (F.sum("__n__").over(w_off) - F.col("__n__")).alias("__off__"),
    )
    w_in = Window.partitionBy("__ks_bkt__").orderBy(
        F.col("__ks_h__"), F.col(id_col)
    )
    rank = F.col("__off__") + F.row_number().over(w_in) - 1
    return (
        src.join(F.broadcast(offsets), "__ks_bkt__")
        .withColumn("__ks_rank__", rank)
        .withColumn(
            "shard_id",
            F.floor(F.col("__ks_rank__") / examples_per_shard).cast("long"),
        )
        .withColumn(
            "pos_in_shard",
            F.pmod(F.col("__ks_rank__"), F.lit(examples_per_shard)).cast(
                "long"
            ),
        )
        .drop("__ks_h__", "__ks_bkt__", "__off__", "__ks_rank__")
    )
