"""Data-layout control: Z-order (Morton) clustering for
multi-dimensional scan pruning.

Sorting a table by one column makes parquet min/max statistics prune
scans on that column only; interleaving the bits of several binned
columns (the Z-order curve — the technique behind Delta/Iceberg
``OPTIMIZE ZORDER BY``) keeps every participating column's values
locally clustered, so row-group and file statistics prune filters on
ANY of them.

Scale shape: rank-binning is one exact-percentile aggregate per column
(tiny broadcast result); the Morton code is pure integer bit algebra in
one Project; the physical clustering is ``repartitionByRange`` +
``sortWithinPartitions`` on the code — the standard total-ordering
shuffle, AQE-compatible, no driver collect of data.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["morton_code", "zorder_by"]


def _bin_rank(df: DataFrame, col: str, bits: int) -> Column:
    """Equi-depth bin id (0..2^bits-1) for ``col``: percentile
    boundaries computed once, assignment = count of boundaries strictly
    below the value. NULLs sort first (bin 0)."""
    n_bins = 1 << bits
    probs = [i / n_bins for i in range(1, n_bins)]
    bounds = df.agg(
        F.percentile(F.col(col), F.array(*[F.lit(p) for p in probs])).alias("b")
    ).collect()[0]["b"]
    v = F.col(col)
    if bounds is None:  # all-NULL column
        return F.lit(0)
    expr: Column = F.lit(0)
    for b in bounds:
        expr = expr + F.when(v > F.lit(b), 1).otherwise(0)
    return F.when(v.isNull(), F.lit(0)).otherwise(expr)


def morton_code(bin_cols: Sequence[Column], bits: int) -> Column:
    """Interleave ``bits`` bits of each bin id (first column = least
    significant position of each group) into one Z-order key — pure
    integer Column algebra."""
    cols: List[Column] = [c.cast("long") for c in bin_cols]
    code: Column = F.lit(0).cast("long")
    k = len(cols)
    for bit in range(bits):
        for j, c in enumerate(cols):
            src = F.shiftright(c, bit).bitwiseAND(F.lit(1))
            code = code + F.shiftleft(src, bit * k + j)
    return code


def zorder_by(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` along the Z-order curve of ``cols`` so a
    subsequent parquet write yields files/row-groups whose min/max
    statistics prune filters on *any* of the participating columns.

    ``bits`` bins each column into ``2^bits`` exact-percentile ranks
    (rank-binning makes the curve robust to skewed value
    distributions — raw-value bit interleaving degenerates when one
    column's range dwarfs another's). The driver holds only the
    ``cols × (2^bits - 1)`` boundary values; everything row-wise is
    codegen'd Column algebra.

    Returns the reordered frame (an internal ``__ks_zorder__`` column is
    dropped); write it with any sink. Typical: ``zorder_by(df, ["a",
    "b"]).write.parquet(...)``.
    """
    if not cols:
        raise ValueError("cols must name at least one column")
    if not 1 <= bits <= 16:
        raise ValueError("bits must be in [1, 16]")
    if len(cols) * bits > 63:
        raise ValueError("len(cols) * bits must fit in a signed long (<= 63)")
    missing = set(cols) - set(df.columns)
    if missing:
        raise ValueError(f"unknown columns: {sorted(missing)}")
    binned = [_bin_rank(df, c, bits) for c in cols]
    coded = df.withColumn("__ks_zorder__", morton_code(binned, bits))
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        coded.repartitionByRange(parts, F.col("__ks_zorder__"))
        .sortWithinPartitions("__ks_zorder__")
        .drop("__ks_zorder__")
    )
