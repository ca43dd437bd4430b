"""Numeric cleaning/normalization per group: winsorization (percentile
clipping) and standardization (z-score / min-max / robust) — the
feature-hygiene steps between raw measurements and anything that
assumes bounded or centered inputs.

Scale shape: one grouped aggregate produces a tiny per-group stats
table (percentile bounds, or exact integer moments), which broadcasts
back onto the detail rows through the NULL-safe join every
aggregate-re-attach operator in this package uses — the detail rows
never shuffle.

Determinism: standardize computes mean/stddev from explicit moment
sums (``n``, ``Σv``, ``Σv²``) instead of ``stddev_samp``'s internal
accumulator, so for integral inputs every quantity is an exact long
sum (order-independent under partial aggregation) and an external SQL
oracle reproduces the scores bit-exactly. For float inputs the sums
are floats (last-ulp order sensitivity applies — feed fixed-point
integers where bit-exact reproducibility matters, the engine's
standard idiom).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..utils import broadcast_join_nullsafe

__all__ = ["winsorize", "standardize"]


def winsorize(
    df: DataFrame,
    value_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    by: Optional[Sequence[str]] = None,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Clip ``value_col`` to its group's ``[lower, upper]`` interpolated
    percentiles (the classic heavy-tail guard before averaging or
    scaling). Adds ``out_col`` (default ``{value_col}_w``); NULL values
    stay NULL; a NULL ``by`` key is a real group and clips against its
    own bounds.
    """
    if not (0.0 <= lower < upper <= 1.0):
        raise ValueError("need 0 <= lower < upper <= 1")
    gb = list(by) if by else []
    out_col = out_col or f"{value_col}_w"
    v = F.col(value_col).cast("double")
    bounds = df.groupBy(*gb).agg(
        F.percentile(v, F.lit(lower)).alias("__ks_lo__"),
        F.percentile(v, F.lit(upper)).alias("__ks_hi__"),
    )
    joined = broadcast_join_nullsafe(df, bounds, gb)
    clipped = F.least(F.greatest(v, F.col("__ks_lo__")), F.col("__ks_hi__"))
    return joined.withColumn(
        out_col, F.when(v.isNull(), F.lit(None)).otherwise(clipped)
    ).drop("__ks_lo__", "__ks_hi__")


def standardize(
    df: DataFrame,
    value_col: str,
    by: Optional[Sequence[str]] = None,
    method: str = "zscore",
    out_col: Optional[str] = None,
) -> DataFrame:
    """Per-group standardization of ``value_col`` into ``out_col``
    (default ``{value_col}_std``):

    - ``'zscore'``  — ``(v - mean) / stddev_samp``, moments from exact
      ``n/Σv/Σv²`` algebra (``var = (Σv² - Σv·Σv/n) / (n-1)``,
      evaluated in exactly that order for cross-engine identity);
    - ``'minmax'``  — ``(v - min) / (max - min)`` into [0, 1];
    - ``'robust'``  — ``(v - median) / (1.4826 · MAD)`` (pairs with
      :func:`kolang_spark.operators.robust.mad_outliers`).

    Degenerate groups (zero spread, or n < 2 for zscore) yield NULL
    scores — there is no honest scale to divide by. NULL values stay
    NULL; NULL group keys standardize against their own group.
    """
    gb = list(by) if by else []
    out_col = out_col or f"{value_col}_std"
    v = F.col(value_col).cast("double")
    if method == "zscore":
        stats = df.groupBy(*gb).agg(
            F.count(v).alias("__ks_n__"),
            F.sum(v).alias("__ks_s1__"),
            F.sum(v * v).alias("__ks_s2__"),
        )
        joined = broadcast_join_nullsafe(df, stats, gb)
        n = F.col("__ks_n__").cast("double")
        s1, s2 = F.col("__ks_s1__"), F.col("__ks_s2__")
        var = (s2 - s1 * s1 / n) / (n - 1)
        mean = s1 / n
        score = F.when(
            (F.col("__ks_n__") < 2) | (var <= 0), F.lit(None)
        ).otherwise((v - mean) / F.sqrt(var))
        drop = ["__ks_n__", "__ks_s1__", "__ks_s2__"]
    elif method == "minmax":
        stats = df.groupBy(*gb).agg(
            F.min(v).alias("__ks_lo__"), F.max(v).alias("__ks_hi__")
        )
        joined = broadcast_join_nullsafe(df, stats, gb)
        rng = F.col("__ks_hi__") - F.col("__ks_lo__")
        score = F.when(rng <= 0, F.lit(None)).otherwise(
            (v - F.col("__ks_lo__")) / rng
        )
        drop = ["__ks_lo__", "__ks_hi__"]
    elif method == "robust":
        med = df.groupBy(*gb).agg(F.median(v).alias("__ks_med__"))
        dev = broadcast_join_nullsafe(df, med, gb).withColumn(
            "__ks_ad__", F.abs(v - F.col("__ks_med__"))
        )
        mad = dev.groupBy(*gb).agg(F.median("__ks_ad__").alias("__ks_mad__"))
        joined = broadcast_join_nullsafe(dev, mad, gb)
        scale = F.col("__ks_mad__") * 1.4826
        score = F.when(scale <= 0, F.lit(None)).otherwise(
            (v - F.col("__ks_med__")) / scale
        )
        drop = ["__ks_med__", "__ks_ad__", "__ks_mad__"]
    else:
        raise ValueError("method must be 'zscore', 'minmax', or 'robust'")
    return joined.withColumn(
        out_col, F.when(v.isNull(), F.lit(None)).otherwise(score)
    ).drop(*drop)
