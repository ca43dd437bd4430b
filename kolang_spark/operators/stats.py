"""One-pass multivariate statistics: pairwise correlation matrices and
per-group closed-form OLS fits.

The exploratory-analysis companions to ``profile_table``: "which
numeric columns move together" and "what's the trend inside each
group" — both answered from sufficient statistics (Σx, Σy, Σxy, Σx²,
Σy², n) so the raw table is scanned exactly once. Complements
``operators/trend.py::add_trend_line`` (global date-spine OLS); no
counterpart exists in the reference.

Determinism contract: every sufficient statistic is a plain SUM/COUNT
(exact for integral inputs), and each derived double is ONE fixed
formula in a fixed evaluation order — the same discipline as
``standardize`` — so an SQL oracle reproduces the values bit-for-bit:

    corr     = (n·Σxy − Σx·Σy)
               / sqrt((n·Σx² − Σx·Σx) · (n·Σy² − Σy·Σy))
    slope    = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx)
    intercept= (Σy − slope·Σx) / n
    r2       = corr²  (computed as the corr formula, squared)

Scale shape: ``correlation_matrix`` is ONE global aggregate with
p·(p+3)/2 accumulators for p columns (the PCA sufficient-stat trick,
see `llm/pca.py`), reshaped driver-side with ``stack``;
``grouped_ols`` is ONE map-side-combinable groupBy. Neither touches
the data twice, neither shuffles anything but the aggregate rows.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["correlation_matrix", "grouped_ols"]


def correlation_matrix(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Pairwise Pearson correlations of ``cols`` → one row per
    unordered pair (col_a < col_b in the given order):
    ``(col_a, col_b, n, corr)``.

    Listwise NULL handling per pair: a row participates in a pair's
    statistics iff BOTH its values are non-NULL (pairwise-complete
    observations — each pair uses all the data it can). Degenerate
    pairs (n < 2 or zero variance on either side) yield NULL corr.
    """
    cs = list(cols)
    if len(cs) < 2:
        raise ValueError("need at least two columns")
    missing = [c for c in cs if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    # names flow into the stack() SQL string below (profile_table's
    # guard)
    bad = [c for c in cs if "'" in c or "`" in c or "\n" in c]
    if bad:
        raise ValueError(
            f"column names with quotes/backticks are not supported: {bad!r}"
        )
    aggs = []
    names = []
    for i in range(len(cs)):
        for j in range(i + 1, len(cs)):
            a = F.col(cs[i]).cast("double")
            b = F.col(cs[j]).cast("double")
            both = a.isNotNull() & b.isNotNull()
            av = F.when(both, a)
            bv = F.when(both, b)
            tag = f"{i}_{j}"
            aggs += [
                F.count(av).alias(f"__n_{tag}__"),
                F.sum(av).alias(f"__sx_{tag}__"),
                F.sum(bv).alias(f"__sy_{tag}__"),
                F.sum(av * bv).alias(f"__sxy_{tag}__"),
                F.sum(av * av).alias(f"__sxx_{tag}__"),
                F.sum(bv * bv).alias(f"__syy_{tag}__"),
            ]
            names.append((i, j, tag))
    one = df.agg(*aggs)
    stack_args = []
    for i, j, tag in names:
        stack_args += [
            f"'{cs[i]}'",
            f"'{cs[j]}'",
            f"`__n_{tag}__`",
            f"`__sx_{tag}__`",
            f"`__sy_{tag}__`",
            f"`__sxy_{tag}__`",
            f"`__sxx_{tag}__`",
            f"`__syy_{tag}__`",
        ]
    long = one.select(
        F.expr(
            f"stack({len(names)}, {', '.join(stack_args)}) AS "
            "(col_a, col_b, n, sx, sy, sxy, sxx, syy)"
        )
    )
    n = F.col("n").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    return long.select(
        "col_a",
        "col_b",
        F.col("n"),
        F.when((F.col("n") >= 2) & (vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
        .alias("corr"),
    )


def grouped_ols(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Per-group simple linear regression of ``y_col`` on ``x_col`` via
    the closed-form normal equations → one row per group:
    ``(by…, n, slope, intercept, r2)``.

    Rows where either value is NULL are excluded. Groups with n < 2 or
    zero x-variance yield NULL slope/intercept/r2; zero y-variance
    (perfectly flat target) yields slope 0 with NULL r2 (r² is
    undefined when there is no variance to explain).
    """
    gb = list(by) if by else []
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    both = x.isNotNull() & y.isNotNull()
    xv, yv = F.when(both, x), F.when(both, y)
    agg = df.groupBy(*gb).agg(
        F.count(xv).alias("n"),
        F.sum(xv).alias("__sx__"),
        F.sum(yv).alias("__sy__"),
        F.sum(xv * yv).alias("__sxy__"),
        F.sum(xv * xv).alias("__sxx__"),
        F.sum(yv * yv).alias("__syy__"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("__sx__"), F.col("__sy__")
    sxy, sxx, syy = F.col("__sxy__"), F.col("__sxx__"), F.col("__syy__")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    slope = F.when((F.col("n") >= 2) & (vx > 0), cov / vx)
    intercept = F.when(
        (F.col("n") >= 2) & (vx > 0), (sy - (cov / vx) * sx) / n
    )
    r2 = F.when(
        (F.col("n") >= 2) & (vx > 0) & (vy > 0),
        (cov / F.sqrt(vx * vy)) * (cov / F.sqrt(vx * vy)),
    )
    return agg.select(
        *gb,
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )
