"""Polynomial trend line + forecast, via closed-form least squares.

Parity: ``add_trend_line`` (``/root/reference/kolang/dataframe_functions.
py:376-463``). The reference fits ``pyspark.ml.regression.
LinearRegression`` per value column (iterative MLlib jobs) and builds the
prediction date range with driver-side pandas. Re-design here:

* **closed-form OLS**: ordinary least squares on polynomial features has
  an exact solution via the normal equations ``(XᵀX)β = Xᵀy``. The
  ``(degree+1)`` moments ``Σxᵏ`` and ``Σy·xᵏ`` are computed in **one
  distributed aggregate pass** (for all value columns at once), and the
  tiny ``(degree+1)²`` system is solved on the driver with numpy. No
  MLlib, no per-column fit jobs, no VectorUDT columns.
* **native date spine**: ``F.sequence(start, end + horizon)`` +
  ``explode`` instead of a driver pandas ``date_range``.

At 100 TB this is: one scan with a map-side-combinable aggregate (the
moments), one broadcast of ~``2·degree+1`` doubles, one scan to stamp the
trendline expression. The reference's design is ≥(1 + #cols) full passes
plus MLlib overhead.

Output shape matches the verified reference output (SURVEY §2.2 D7):
``[date_col, {col}_trendline..., original columns...]`` with
``prediction_day`` extra future rows whose source columns are NULL.
"""

from __future__ import annotations

from typing import List, Union

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["add_trend_line"]

_DATE_TYPES = {"date", "timestamp", "timestamp_ntz"}


def add_trend_line(
    df: DataFrame,
    value_col: Union[str, List[str]],
    date_col: str = "date",
    prediction_day: int = 0,
    degree: int = 1,
    cache: bool = True,
) -> DataFrame:
    """Add ``{col}_trendline`` columns (degree-``degree`` polynomial fit
    over days-since-start) and ``prediction_day`` forecast rows.

    ``cache=True`` persists the casted input for the three passes that
    read it (bounds, moments, and the returned join). The cache block
    stays registered after the call BY DESIGN — the returned plan still
    reads it, so unpersisting here would forfeit the benefit exactly
    where it matters; callers batch-processing many frames should pass
    ``cache=False`` or ``df.unpersist()`` once the result is consumed.
    """
    if degree < 1:
        raise ValueError("degree must be >= 1")
    if df.schema[date_col].dataType.simpleString() not in _DATE_TYPES:
        raise ValueError(f"{date_col} must be date or timestamp")
    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)

    base = df.withColumn(date_col, F.col(date_col).cast("date"))
    if cache:
        base = base.cache()

    bounds = base.agg(
        F.min(date_col).alias("lo"), F.max(date_col).alias("hi")
    ).first()
    if bounds.lo is None:
        raise ValueError("add_trend_line on an empty DataFrame")
    start, end = bounds.lo, bounds.hi

    x = F.datediff(F.col(date_col), F.lit(start)).cast("double")

    # One aggregate pass: per value column, moments over rows where the
    # label is non-null (mirrors an OLS fit that only sees labeled rows).
    aggs = []
    for vc in value_cols:
        y = F.col(vc).cast("double")
        labeled = y.isNotNull()
        for k in range(0, 2 * degree + 1):
            aggs.append(
                F.sum(F.when(labeled, F.pow(x, k))).alias(f"sx_{vc}_{k}")
            )
        for k in range(0, degree + 1):
            aggs.append(F.sum(y * F.pow(x, k)).alias(f"sxy_{vc}_{k}"))
    moments = base.agg(*aggs).first().asDict()

    betas = {}
    for vc in value_cols:
        A = np.array(
            [
                [moments[f"sx_{vc}_{i + j}"] or 0.0 for j in range(degree + 1)]
                for i in range(degree + 1)
            ]
        )
        b = np.array([moments[f"sxy_{vc}_{k}"] or 0.0 for k in range(degree + 1)])
        try:
            betas[vc] = np.linalg.solve(A, b)
        except np.linalg.LinAlgError:
            betas[vc], *_ = np.linalg.lstsq(A, b, rcond=None)

    spine = (
        base.sparkSession.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit(start), F.date_add(F.lit(end), prediction_day)
                )
            ).alias(date_col)
        )
    )
    xs = F.datediff(F.col(date_col), F.lit(start)).cast("double")
    for vc in value_cols:
        beta = betas[vc]
        expr = F.lit(float(beta[0]))
        for k in range(1, degree + 1):
            expr = expr + float(beta[k]) * F.pow(xs, k)
        spine = spine.withColumn(f"{vc}_trendline", expr)

    return spine.join(base, on=date_col, how="left")
