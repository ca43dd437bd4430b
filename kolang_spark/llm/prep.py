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

__all__ = ["chunk_documents", "pack_examples", "pack_balanced"]


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


def pack_balanced(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: Optional[str] = None,
    n_bins: Optional[int] = None,
    capacity: Optional[int] = None,
    out_col: str = "bin_id",
    range_buckets: int = 32,
) -> DataFrame:
    """Length-balanced bin assignment — the other packing discipline
    next to :func:`pack_examples`' concat-and-chunk: documents are
    never split; instead each goes whole into one of ``n_bins`` bins
    such that per-bin token totals come out near-equal (the
    length-grouped batching every dataloader wants: no bin dominated
    by long documents, no cross-document attention). Deterministic:
    documents are globally ordered by (``n_tokens`` desc, ``id_col``
    asc) and dealt to bins in SNAKE order (longest-processing-time
    round-robin with direction reversal each pass — the classic
    multiway-partitioning heuristic, within one max-document of
    optimal for sorted input).

    Give either ``n_bins`` (fixed bin count) or ``capacity`` (target
    tokens per bin → ``n_bins = ceil(total_tokens / capacity)``; the
    total rides the same broadcast one-row aggregate as the range
    boundaries, so capacity mode costs no extra corpus pass). Returns
    ``(id_col, n_tokens, pack_rank, out_col)`` — ``pack_rank`` is the
    0-based global position in the sorted deal order.

    Scale shape — the global sort-rank is the classic one-partition
    window hazard, so it runs distributed: exact interpolated
    percentiles of ``n_tokens`` split the corpus into
    ``range_buckets`` value-range-aligned buckets (the
    :func:`~kolang_spark.operators.binning.equi_depth_bin` pattern —
    equal values always share a bucket, so within-bucket row_number
    plus a broadcast per-bucket offset IS the exact global rank);
    the only un-partitioned window runs over the ≤``range_buckets``-row
    count table. Caveat: a corpus where most documents share one exact
    token count cannot be range-split — that run lands in one bucket
    and bounds the window (inherent to any value-aligned scheme).
    ``id_col`` values must be unique (they break length ties; a
    duplicate would make the deal order ambiguous).
    """
    if (n_bins is None) == (capacity is None):
        raise ValueError("pass exactly one of n_bins / capacity")
    if n_bins is not None and n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if capacity is not None and capacity < 1:
        raise ValueError("capacity must be >= 1")
    if range_buckets < 2:
        raise ValueError("range_buckets must be >= 2")
    toks = (
        F.col(tokens_col)
        if tokens_col is not None
        else F.size(tokenize(F.col(text_col)))
    )
    base = df.select(
        F.col(id_col), F.coalesce(toks.cast("long"), F.lit(0)).alias("n_tokens")
    )
    # value-range bucketing by exact percentiles (bucket CHOICE cannot
    # affect the final rank — only value alignment matters; boundary
    # and strict-below tie semantics deliberately match
    # operators/binning.py::equi_depth_bin — a parity test pins the
    # two against each other). The token TOTAL rides the same one-row
    # aggregate so capacity mode never pays a second corpus scan
    # (r10 review finding).
    probs = [i / range_buckets for i in range(1, range_buckets)]
    bounds = base.agg(
        F.percentile(F.col("n_tokens"), F.array(*[F.lit(p) for p in probs])).alias(
            "__ks_pb_bounds__"
        ),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("__ks_pb_tot__"),
    )
    v = F.col("n_tokens")
    with_bkt = (
        base.join(F.broadcast(bounds), how="cross")
        .withColumn(
            "__ks_pb_bkt__",
            F.size(F.filter(F.col("__ks_pb_bounds__"), lambda b: v > b)),
        )
        .drop("__ks_pb_bounds__")
    )
    counts = with_bkt.groupBy("__ks_pb_bkt__").agg(
        F.count(F.lit(1)).alias("__ks_pb_n__")
    )
    # offsets over the tiny bucket-count table (post-aggregate window,
    # <= range_buckets rows): higher-value buckets rank first
    w_off = (
        Window.orderBy(F.col("__ks_pb_bkt__").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.withColumn(
        "__ks_pb_off__", F.coalesce(F.sum("__ks_pb_n__").over(w_off), F.lit(0))
    ).drop("__ks_pb_n__")
    joined = with_bkt.join(F.broadcast(offs), "__ks_pb_bkt__")
    w_in = Window.partitionBy("__ks_pb_bkt__").orderBy(
        v.desc(), F.col(id_col).asc()
    )
    pos = (F.row_number().over(w_in) + F.col("__ks_pb_off__") - 1).cast("long")
    if capacity is not None:
        nb = F.greatest(
            F.ceil(F.col("__ks_pb_tot__") / F.lit(float(capacity))).cast("long"),
            F.lit(1),
        )
    else:
        nb = F.lit(int(n_bins)).cast("long")
    rnd = F.floor(pos / nb)
    within = F.pmod(pos, nb)
    bin_id = F.when(F.pmod(rnd, F.lit(2)) == 0, within).otherwise(
        nb - 1 - within
    )
    return joined.select(
        id_col,
        "n_tokens",
        pos.alias("pack_rank"),
        bin_id.cast("long").alias(out_col),
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
