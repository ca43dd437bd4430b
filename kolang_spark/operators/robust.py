"""Robust (median/MAD-based) outlier detection per group — the
data-quality gate that survives the heavy-tailed value distributions
mean/stddev z-scores drown in.

Scale shape: two grouped aggregations over the scan (group median, then
median absolute deviation), each producing one row per group — tiny
tables that broadcast back onto the data. The detail rows are never
shuffled; both joins are broadcast hash joins on the group keys.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..utils import broadcast_join_nullsafe

__all__ = ["mad_outliers"]


def mad_outliers(
    df: DataFrame,
    value_col: str,
    by: Optional[Sequence[str]] = None,
    k: float = 3.0,
    scale: float = 1.4826,
) -> DataFrame:
    """Flag rows whose ``value_col`` deviates from its group median by
    more than ``k`` robust standard deviations (``scale * MAD``;
    ``scale = 1.4826`` makes MAD consistent with σ under normality).

    Adds four columns to the input rows: ``group_median``, ``mad``,
    ``abs_dev`` and ``is_outlier``. A degenerate group (``MAD = 0`` —
    over half the values identical) flags nothing: with no spread
    estimate every point would otherwise be an outlier, which inverts
    the operator's purpose. NULL values are never outliers.

    Both medians are exact interpolated percentiles, so the DuckDB
    oracle (``quantile_cont``) reproduces the flags bit-exact; the
    threshold product is evaluated ``(mad * scale) * k`` left-to-right
    for cross-engine float identity.
    """
    gb = list(by) if by else []
    # NULL-safe re-attach: a NULL group key is a real group for groupBy,
    # and its rows must come back out (docstring contract).
    med = df.groupBy(*gb).agg(F.median(value_col).alias("group_median"))
    dev = broadcast_join_nullsafe(df, med, gb).withColumn(
        "abs_dev", F.abs(F.col(value_col) - F.col("group_median"))
    )
    mad = dev.groupBy(*gb).agg(F.median("abs_dev").alias("mad"))
    out = broadcast_join_nullsafe(dev, mad, gb)
    threshold = (F.col("mad") * scale) * k
    return out.withColumn(
        "is_outlier",
        F.when(F.col(value_col).isNull(), F.lit(False)).otherwise(
            (F.col("mad") > 0) & (F.col("abs_dev") > threshold)
        ),
    )
