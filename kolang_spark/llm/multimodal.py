"""Multimodal column conventions: image/audio/video as opaque ``binary``
columns with typed metadata structs, plus Arrow-batched processing
plumbing (decode / feature-extract / frame-sample).

The decode step itself is STUBBED — the image/audio libraries are not in
this container — behind ``fake=True`` (deterministic header-derived
values) or ``NotImplementedError``. Everything Spark-side is real and
tested: schemas, ``mapInPandas`` batch shapes, partitioning behavior.

Scale posture: binary payloads ride the scan (parquet binary columns are
page-compressed and column-pruned like any other); metadata-only queries
never deserialize payload bytes; Arrow batching keeps the Python
boundary amortized (one buffer per ~10k rows, not per row).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "pack_blob",
    "blob_metadata",
    "decode_image",
    "extract_features",
    "sample_frames",
]

BLOB_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("header_hex", T.StringType()),
    ]
)


def pack_blob(
    df: DataFrame,
    src_col: str,
    out: str = "content",
    format: str = "bin",  # noqa: A002 — mirrors common metadata naming
) -> DataFrame:
    """Pack a string column into the canonical (binary content + metadata
    struct) convention. For real media the binary would come from
    ``spark.read.format('binaryFile')`` — the downstream plumbing is
    identical."""
    content = F.encode(F.col(src_col), "UTF-8")
    meta = F.struct(
        F.lit(format).alias("format"),
        F.octet_length(content).cast("long").alias("n_bytes"),
        F.substring(F.hex(content), 1, 8).alias("header_hex"),
    )
    return df.withColumn(out, content).withColumn(f"{out}_meta", meta)


def blob_metadata(df: DataFrame, blob_col: str = "content") -> DataFrame:
    """Metadata-only view of a blob column (no payload decode): size,
    header bytes. Pure expressions — a metadata query at 100 TB reads
    only the binary column's statistics-pruned pages it needs."""
    c = F.col(blob_col)
    return df.select(
        *[x for x in df.columns if x != blob_col],
        F.octet_length(c).cast("long").alias("n_bytes"),
        F.substring(F.hex(c), 1, 8).alias("header_hex"),
    )


_DECODE_SCHEMA = "doc_id long, width int, height int, n_channels int, n_bytes long"


def decode_image(
    df: DataFrame,
    blob_col: str = "content",
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """Decode image blobs to (width, height, channels) via Arrow-batched
    ``mapInPandas``.

    ``fake=True`` runs a deterministic stand-in decoder (dimensions
    derived from header bytes) so the full pipeline — schema, batching,
    partition parallelism — is exercised without PIL/libvips in the
    container. ``fake=False`` raises ``NotImplementedError`` at executor
    time, marking exactly where the real decoder plugs in.

    The UDF boundary here is the *legitimate* use of Python: per-byte
    media decoding has no Catalyst expression. Batches arrive as Arrow
    buffers (zero-copy binary), one pandas frame per ~10k rows.
    """
    src = df.select(F.col(id_col).alias("doc_id"), F.col(blob_col).alias("blob"))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/libvips (not in container); "
                    "pass fake=True to exercise the pipeline"
                )
            blobs = pdf["blob"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    # deterministic header-derived fake dimensions
                    "width": blobs.map(lambda b: 16 + (b[0] if len(b) else 0)),
                    "height": blobs.map(lambda b: 16 + (b[1] if len(b) > 1 else 0)),
                    "n_channels": 3,
                    "n_bytes": blobs.map(len),
                }
            )
            yield out

    return src.mapInPandas(decode_batches, schema=_DECODE_SCHEMA)


def extract_features(
    df: DataFrame,
    blob_col: str = "content",
    id_col: str = "doc_id",
    dims: int = 64,
    fake: bool = False,
) -> DataFrame:
    """Blob → feature vector (``array<double>``), Arrow-batched.

    The bridge from the multimodal convention into the similarity stack:
    its output feeds :func:`kolang_spark.llm.similarity.lsh_topk` /
    ``brute_force_topk`` unchanged. ``fake=True`` emits a deterministic
    md5-seeded vector per blob (same content → same vector, any run, any
    partitioning) so the full blob→embed→ANN pipeline is exercised
    without a real encoder; ``fake=False`` marks the plug-in point.
    """
    import hashlib

    import numpy as np

    src = df.select(F.col(id_col).alias("doc_id"), F.col(blob_col).alias("blob"))
    schema = f"doc_id long, features array<double>"

    def embed_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real feature extraction requires an encoder (not in "
                    "container); pass fake=True to exercise the pipeline"
                )

            def vec(b: bytes):
                seed = int.from_bytes(hashlib.md5(bytes(b)).digest()[:8], "big")
                return np.random.default_rng(seed).random(dims).tolist()

            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "features": pdf["blob"].map(vec)}
            )

    return src.mapInPandas(embed_batches, schema=schema)


def sample_frames(
    df: DataFrame,
    meta_col: str = "content_meta",
    id_col: str = "doc_id",
    fps: int = 1,
    duration_s_col: Optional[str] = None,
) -> DataFrame:
    """Frame-sampling plumbing for video blobs: one output row per
    sampled frame index. The index spine is a native
    ``sequence``+``explode`` (no Python); actual frame extraction would
    chain :func:`decode_image`-style ``mapInPandas`` on the exploded
    rows. Duration defaults to a bytes-derived deterministic stand-in
    when no duration column exists (stub container, same plumbing)."""
    duration = (
        F.col(duration_s_col)
        if duration_s_col
        else (F.col(meta_col)["n_bytes"] % 10 + 1)
    )
    n_frames = (duration * fps).cast("int")
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    )
