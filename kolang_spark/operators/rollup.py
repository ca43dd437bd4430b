"""Hypertable-style multi-granularity time rollups in one pass.

TimescaleDB calls these continuous-aggregate hierarchies; at warehouse
scale the naive formulation is one groupBy per granularity — G scans
and G shuffles of the raw table. This operator computes every
granularity in a single scan + single shuffle via ``GROUPING SETS``:
Catalyst plans one ``Expand`` (each row replicated once per grouping
set, cheap and map-side) feeding one hash aggregate, and partial
aggregation happens before the exchange — so shuffle volume is the
*rolled-up* row count, not G × raw rows.

The reference consumes grouping-set output (``cube_percent``,
``/root/reference/kolang/column_functions.py:667-699``) but never
produces it; this is the production side of that coin.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hypertable_rollup", "GRANULARITIES"]

# date_trunc field names Spark and ANSI SQL agree on, coarse → fine
GRANULARITIES = ("year", "quarter", "month", "week", "day", "hour", "minute")


def hypertable_rollup(
    df: DataFrame,
    ts: str,
    aggs: Mapping[str, Column],
    granularities: Sequence[str] = ("hour", "day", "month"),
    keys: Sequence[str] = (),
) -> DataFrame:
    """Aggregate ``df`` at several time granularities in one pass.

    Returns one row per ``(granularity, bucket_ts, *keys)`` where
    ``granularity`` names the level (e.g. ``'hour'``) and ``bucket_ts``
    is ``date_trunc(granularity, ts)``. ``aggs`` maps output column
    name → aggregate expression, applied identically at every level.

    ``keys`` are extra dimensions present at every granularity (the
    hypertable's space dimension). Rows with NULL ``ts`` are excluded —
    a NULL bucket would be ambiguous against rolled-up markers.
    """
    bad = [g for g in granularities if g not in GRANULARITIES]
    if bad:
        raise ValueError(f"unknown granularities {bad}; pick from {GRANULARITIES}")
    if not aggs:
        raise ValueError("aggs must contain at least one aggregate")

    src = df.where(F.col(ts).isNotNull())
    bucket_cols = []
    for g in granularities:
        name = f"__ks_g_{g}__"
        src = src.withColumn(name, F.date_trunc(g, F.col(ts)))
        bucket_cols.append(name)

    key_cols = [F.col(k) for k in keys]
    sets = [[*key_cols, F.col(b)] for b in bucket_cols]
    grouped = src.groupingSets(sets, *key_cols, *(F.col(b) for b in bucket_cols))

    # grouping() is only legal inside the aggregate list — emit one flag
    # per bucket column, then label each row by its (unique) live level
    flags = {f"__ks_grp_{g}__": F.grouping(b) for g, b in zip(granularities, bucket_cols)}
    out = grouped.agg(
        *[expr.alias(name) for name, expr in flags.items()],
        *[expr.alias(name) for name, expr in aggs.items()],
    )

    gran = None
    for g in granularities:
        cond = F.col(f"__ks_grp_{g}__") == 0
        gran = F.when(cond, F.lit(g)) if gran is None else gran.when(cond, F.lit(g))
    return out.select(
        gran.alias("granularity"),
        F.coalesce(*[F.col(b) for b in bucket_cols]).alias("bucket_ts"),
        *keys,
        *aggs.keys(),
    )
