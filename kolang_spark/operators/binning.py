"""Equi-depth (quantile) binning — the distributed replacement for the
global-``ntile`` anti-pattern.

``ntile(n) OVER (ORDER BY value)`` funnels the whole table through one
partition (the SURVEY §4 window hazard). This operator gets identical
bucket *boundaries* a different way: one percentile aggregation
produces the n-1 interpolated cut points (per group if asked), the tiny
boundary table broadcasts back, and assignment is a pure Column fold
over the boundary array — the detail rows never shuffle.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..utils import broadcast_join_nullsafe

__all__ = ["equi_depth_bin"]


def equi_depth_bin(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    by: Optional[Sequence[str]] = None,
    out_col: str = "bin",
) -> DataFrame:
    """Assign each row its equi-depth bucket 1..``n_bins`` over
    ``value_col`` (optionally within ``by`` groups).

    Boundaries are the exact interpolated percentiles ``i/n_bins``;
    bucket = 1 + number of boundaries strictly below the value (a value
    equal to a cut point lands in the lower bucket — deterministic and
    engine-exact, since interpolated percentiles and ``>`` comparisons
    reproduce bit-identically in the DuckDB oracle). NULL values get a
    NULL bucket.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    gb = list(by) if by else []
    probs = [i / n_bins for i in range(1, n_bins)]
    key = "__ks_bounds__"
    bounds = df.groupBy(*gb).agg(
        F.percentile(F.col(value_col), F.array(*[F.lit(p) for p in probs])).alias(
            key
        )
    )
    # NULL-safe re-attach so NULL-keyed groups keep their rows (they
    # get their own boundaries, like any other group).
    joined = broadcast_join_nullsafe(df, bounds, gb)
    v = F.col(value_col)
    bucket = F.when(v.isNull(), F.lit(None)).otherwise(
        F.size(F.filter(F.col(key), lambda b: v > b)) + 1
    )
    return joined.withColumn(out_col, bucket.cast("int")).drop(key)
