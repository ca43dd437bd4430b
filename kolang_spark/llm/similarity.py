"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k (exact, oracle-checkable). Scale
path: LSH-bucketed ANN via deterministic random-hyperplane signatures —
the join only touches same-bucket vectors, turning O(N·Q) into
O(N·Q/2^planes) at a recall cost controlled by the plane count.

The dot product is a pure ``zip_with``/``aggregate`` expression chain
(JVM-side, sequential left-to-right — bit-reproducible across engines);
no pandas UDF in the hot path.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cosine", "brute_force_topk", "lsh_topk"]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double-array columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: every query vector against every corpus row.

    Plan: ``broadcast(queries)`` nested-loop join (queries are the small
    side by construction) → per-query window top-k. The corpus is never
    shuffled; ranking ties break deterministically by corpus id.

    Returns ``(query_id, vec_id, cos, rank)``, rank 1..k.
    """
    corpus = df.select(
        F.col(id_col).alias("c_id"), _as_double(F.col(vec_col)).alias("c_v")
    )
    qs = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(query_vec_col)).alias("q_v"),
    )
    scored = corpus.crossJoin(F.broadcast(qs)).select(
        "query_id",
        F.col("c_id").alias("vec_id"),
        cosine(F.col("q_v"), F.col("c_v")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _plane_component(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    derived from md5(plane:dim) — reproducible on any cluster, no RNG
    state, no broadcast of plane matrices."""
    h = F.conv(F.substring(F.md5(F.lit(f"{plane}:{dim}")), 1, 12), 16, 10).cast("long")
    return (h % 20011) / F.lit(10005.5) - 1.0


def lsh_signature(vec: Column, n_planes: int, dims: int) -> Column:
    """Random-hyperplane sign signature (int bucket id, ``n_planes`` bits)."""
    sig = F.lit(0)
    for p in range(n_planes):
        dot = sum(
            (F.element_at(vec, d + 1) * _plane_component(p, d) for d in range(dims)),
            F.lit(0.0),
        )
        sig = sig + F.when(dot >= 0, F.lit(1 << p)).otherwise(0)
    return sig


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: exact cosine ranking *within* matching LSH buckets.

    With ``n_planes`` hyperplanes the corpus splits into ``2^n_planes``
    buckets; each query only scores its own bucket (~N/2^p candidates).
    Recall < 1 by design — raise recall via multi-probe (drop
    ``n_planes``) or signature unions. The bucket join is a plain
    equi-join: hash-partitioned, AQE-skew-splittable, no cross product.
    """
    corpus = df.select(
        F.col(id_col).alias("c_id"), _as_double(F.col(vec_col)).alias("c_v")
    ).withColumn("bucket", lsh_signature(F.col("c_v"), n_planes, dims))
    qs = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(query_vec_col)).alias("q_v"),
    ).withColumn("bucket", lsh_signature(F.col("q_v"), n_planes, dims))

    scored = corpus.join(F.broadcast(qs), "bucket").select(
        "query_id",
        F.col("c_id").alias("vec_id"),
        cosine(F.col("q_v"), F.col("c_v")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
