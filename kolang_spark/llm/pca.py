"""Distributed PCA over embedding columns — the dimensionality-reduction
step before clustering/visualization/cheap-ANN, done the scale-correct
way: the data pass computes only *sufficient statistics* (count, per-dim
sums, and the upper triangle of the second-moment matrix) via one
map-side-combinable aggregation whose output size is ``d(d+3)/2 + 1``
rows REGARDLESS of corpus size; the eigendecomposition runs driver-side
on the tiny ``d×d`` covariance (d=64 → a 4096-double problem, the same
bounded-driver-payload pattern as the k-means centroid sync); projection
back onto the corpus is pure Column algebra against broadcast literal
component vectors.

No mapInPandas, no RDDs, no driver pass over rows — the only collected
object is the moment table (``O(d²)``), explicitly bounded and
documented, never row data.
"""

from __future__ import annotations

from typing import List, NamedTuple

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PcaModel", "pca_fit", "pca_project"]


class PcaModel(NamedTuple):
    mean: List[float]  # d
    components: List[List[float]]  # k × d, rows orthonormal
    explained_variance: List[float]  # k, descending
    n_rows: int


def pca_fit(
    df: DataFrame,
    dims: int,
    k: int = 8,
    vec_col: str = "embedding",
) -> PcaModel:
    """Fit PCA on ``vec_col`` (``array`` of ``dims`` numbers).

    One aggregation job produces ``n``, ``Σv_i`` and ``Σ v_i·v_j``
    (upper triangle) — the map-side combine collapses every partition
    to ``d(d+1)/2 + d`` partial sums, so the shuffle and the driver
    payload are independent of row count. Covariance assembles as
    ``S_ij/n − μ_i·μ_j`` and ``numpy.linalg.eigh`` (symmetric,
    deterministic for identical input) yields the top-``k`` components,
    sign-normalized (largest-|coefficient| entry positive) so results
    are reproducible across runs and platforms.

    Rows with NULL vectors are ignored. Raises on ``k > dims`` or an
    empty input.
    """
    if not 1 <= k <= dims:
        raise ValueError("need 1 <= k <= dims")
    v = F.col(vec_col)
    src = df.where(v.isNotNull()).select(
        F.transform(v, lambda x: x.cast("double")).alias("__v__")
    )
    # (i, j, v_i*v_j) for the upper triangle plus (i, -1, v_i) for the
    # first moments — one explode, one hash aggregate on (i, j)
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(dims - 1)),
            lambda i: F.concat(
                F.array(
                    F.struct(
                        i.alias("i"),
                        F.lit(-1).alias("j"),
                        F.element_at("__v__", i + 1).alias("p"),
                    )
                ),
                F.transform(
                    F.sequence(i, F.lit(dims - 1)),
                    lambda j: F.struct(
                        i.alias("i"),
                        j.alias("j"),
                        (
                            F.element_at("__v__", i + 1)
                            * F.element_at("__v__", j + 1)
                        ).alias("p"),
                    ),
                ),
            ),
        )
    )
    moments = (
        src.select(F.explode(pairs).alias("m"))
        .groupBy(F.col("m.i").alias("i"), F.col("m.j").alias("j"))
        .agg(F.sum("m.p").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()  # bounded: d(d+3)/2 rows of (i, j, sum, count)
    )
    if not moments:
        raise ValueError("pca_fit: no non-NULL vectors")
    n = max(r.c for r in moments)
    s1 = np.zeros(dims)
    s2 = np.zeros((dims, dims))
    for r in moments:
        if r.j == -1:
            s1[r.i] = r.s
        else:
            s2[r.i, r.j] = r.s
            s2[r.j, r.i] = r.s
    mu = s1 / n
    cov = s2 / n - np.outer(mu, mu)
    w, vecs = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    comps = []
    evs = []
    for idx in order:
        c = vecs[:, idx]
        # deterministic sign: the largest-|entry| coefficient positive
        pivot = int(np.argmax(np.abs(c)))
        if c[pivot] < 0:
            c = -c
        comps.append([float(x) for x in c])
        evs.append(float(max(w[idx], 0.0)))
    return PcaModel(
        mean=[float(x) for x in mu],
        components=comps,
        explained_variance=evs,
        n_rows=int(n),
    )


def pca_project(
    df: DataFrame,
    model: PcaModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project each vector onto the model's components:
    ``out_col[k] = (v − μ) · c_k`` — pure Column algebra against
    broadcast literal arrays (the model is ``k·d + d`` doubles inlined
    as literals; no join, no shuffle, rides the scan)."""
    v = F.col(vec_col)
    mean_arr = F.array(*[F.lit(m) for m in model.mean])

    def proj(comp: List[float]) -> Column:
        comp_arr = F.array(*[F.lit(c) for c in comp])
        return F.aggregate(
            F.zip_with(
                F.zip_with(
                    F.transform(v, lambda x: x.cast("double")),
                    mean_arr,
                    lambda a, b: a - b,
                ),
                comp_arr,
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return df.withColumn(
        out_col, F.array(*[proj(c) for c in model.components])
    )
