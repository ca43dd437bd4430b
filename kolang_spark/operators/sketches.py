"""Mergeable sketches — the 100-TB substitute for exact re-scans.

Exact distinct counts and quantiles need a shuffle of every raw value;
at warehouse scale the winning pattern is *pre-aggregate a mergeable
sketch per partition/day, merge sketches later*. Merging is cheap
(bytes, not raw rows), loss-free for same-precision sketches, and
algebraic — a day's sketch is computed once, then any rollup (week,
month, ad-hoc cohort) merges without touching the raw table again.

Built on Spark's Apache DataSketches integration (``hll_sketch_agg`` /
``hll_union_agg``, Spark ≥3.5) and ``percentile_approx`` — all
JVM-side, codegen-friendly, no UDFs.

The reference's closest surface is ``count_distinct_with_nulls``
(``/root/reference/kolang/column_functions.py:649-664``, exact); the
engine's ``approx`` knob there uses HLL *estimates* — this module adds
the re-usable sketch objects themselves.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kolang_spark.utils import ColumnOrName, to_col

__all__ = [
    "hll_sketch",
    "hll_merge",
    "hll_estimate",
    "approx_quantiles",
    "sketch_rollup",
]


def hll_sketch(col: ColumnOrName, lg_k: int = 12) -> Column:
    """Aggregate: an HLL sketch (binary) of ``col``'s distinct values.
    ``lg_k`` trades size (2^lg_k registers) for accuracy (~1.04/√2^lg_k
    relative error; 12 → ~1.6%)."""
    return F.hll_sketch_agg(to_col(col), lg_k)


def hll_merge(sketch_col: ColumnOrName, lg_k: int = 12) -> Column:
    """Aggregate: merge previously-built sketches (union of the
    underlying distinct sets — associative, loss-free at equal lg_k)."""
    return F.hll_union_agg(to_col(sketch_col), False)


def hll_estimate(sketch_col: ColumnOrName) -> Column:
    """Scalar: the distinct-count estimate of a sketch column."""
    return F.hll_sketch_estimate(to_col(sketch_col))


def approx_quantiles(
    col: ColumnOrName,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75),
    accuracy: int = 10000,
) -> Column:
    """Aggregate: approximate quantiles (one array column), suitable
    where exact ``median``'s per-group sort is too expensive."""
    return F.percentile_approx(
        to_col(col),
        F.array(*[F.lit(float(p)) for p in probabilities]),
        F.lit(accuracy),
    )


def sketch_rollup(
    df: DataFrame,
    value: ColumnOrName,
    fine_keys: Sequence[str],
    coarse_keys: Sequence[str],
    lg_k: int = 12,
) -> DataFrame:
    """The two-level pattern in one call: sketch per ``fine_keys`` group
    (e.g. day), merge up to ``coarse_keys`` (e.g. month) **without
    re-scanning raw data** — the second aggregation shuffles only
    sketch bytes. Returns coarse rows with ``n_distinct_est``.

    ``coarse_keys`` must be derivable from ``fine_keys`` rows (i.e.
    present in the fine projection)."""
    missing = [k for k in coarse_keys if k not in fine_keys]
    if missing:
        raise ValueError(f"coarse keys {missing} not in fine_keys {fine_keys}")
    fine = df.groupBy(*fine_keys).agg(hll_sketch(value, lg_k).alias("__ks_sketch__"))
    return (
        fine.groupBy(*coarse_keys)
        .agg(hll_merge("__ks_sketch__", lg_k).alias("__ks_merged__"))
        .select(
            *coarse_keys,
            hll_estimate("__ks_merged__").alias("n_distinct_est"),
        )
    )
