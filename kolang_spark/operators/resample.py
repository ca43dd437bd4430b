"""Time-series regularization: per-key gap filling onto a fixed-step
time grid with forward fill — the resample step between raw event
streams and window/trend operators that assume dense series.

Scale shape: the bucket spine is generated per key with
``sequence`` + ``explode`` (no driver loop, no cross join against a
global calendar table); the raw-to-grid alignment is one grouped
aggregate and the forward fill is one *partitioned* window
(``last(..., ignorenulls)``) — every stage is keyed on the series key,
so the table never converges on a single partition.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["resample_fill"]


def resample_fill(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    by: Optional[Sequence[str]] = None,
    agg: str = "sum",
    fill: str = "forward",
) -> DataFrame:
    """Regularize ``(by, ts_col, value_col)`` onto a dense ``step`` grid
    per key, from each key's first bucket to its last.

    Buckets with data carry ``agg`` of their values (``sum``/``avg``/
    ``min``/``max``/``count``); empty buckets are materialized and
    filled per ``fill``: ``'forward'`` (last observed aggregate),
    ``'zero'``, or ``'null'``. Output: ``(*by, bucket_ts, value,
    is_filled)`` sorted-agnostic (callers order as needed).

    ``step`` accepts ``'N unit'`` with unit second/minute/hour/day —
    converted to a fixed number of seconds (calendar-stretchy units
    like month are out of scope: a fixed-step grid is what downstream
    window math assumes).

    Rows with a NULL ``ts_col`` are excluded (no position on the grid);
    a NULL ``by`` key is a real series and resamples like any other
    (the spine join is NULL-safe on the key columns). Bucket assignment
    floors for negative (pre-1970) epochs too.
    """
    parts = step.split()
    if len(parts) != 2:
        raise ValueError("step must look like '15 minute' / '1 hour'")
    qty, unit = int(parts[0]), parts[1].rstrip("s")
    seconds_per = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
    if unit not in seconds_per:
        raise ValueError(f"unsupported step unit: {unit!r}")
    if qty < 1:
        raise ValueError("step quantity must be >= 1")
    step_s = qty * seconds_per[unit]
    aggs = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max, "count": F.count}
    if agg not in aggs:
        raise ValueError(f"agg must be one of {sorted(aggs)}")
    if fill not in ("forward", "zero", "null"):
        raise ValueError("fill must be 'forward', 'zero', or 'null'")

    gb = list(by) if by else []
    epoch = F.unix_timestamp(F.col(ts_col))
    # floor-to-grid via pmod: Spark's % follows the dividend's sign, so
    # `epoch - epoch % step` would round pre-1970 timestamps toward zero
    # (into the bucket AFTER the event); pmod floors for any sign.
    bucket_s = (epoch - F.pmod(epoch, F.lit(step_s))).alias("__b__")
    # a NULL timestamp has no position on the grid — excluded up front
    # (documented contract), rather than silently forming a NULL bucket
    observed = (
        df.where(F.col(ts_col).isNotNull())
        .select(*gb, bucket_s, F.col(value_col).alias("__v__"))
        .groupBy(*gb, "__b__")
        .agg(aggs[agg]("__v__").alias("__agg__"))
    )
    # per-key dense spine: sequence over the key's own [min, max] range
    spine = (
        observed.groupBy(*gb)
        .agg(F.min("__b__").alias("__lo__"), F.max("__b__").alias("__hi__"))
        .select(
            *gb,
            F.explode(
                F.sequence(F.col("__lo__"), F.col("__hi__"), F.lit(step_s))
            ).alias("__b__"),
        )
    )
    # NULL-safe on the key columns: a NULL `by` key is a real series for
    # groupBy, and its observed aggregates must land back on its spine
    # (a plain equi-join would return that whole series as filled NULLs)
    if gb:
        obs_r = observed.withColumnRenamed("__b__", "__rb__")
        for k in gb:
            obs_r = obs_r.withColumnRenamed(k, f"__ks_rk_{k}__")
        cond = spine["__b__"] == obs_r["__rb__"]
        for k in gb:
            cond = cond & spine[k].eqNullSafe(obs_r[f"__ks_rk_{k}__"])
        joined = spine.join(obs_r, cond, "left").drop(
            "__rb__", *[f"__ks_rk_{k}__" for k in gb]
        )
    else:
        joined = spine.join(observed, ["__b__"], "left")
    if fill == "forward":
        w = (
            Window.partitionBy(*gb)
            .orderBy("__b__")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = F.last("__agg__", ignorenulls=True).over(w)
    elif fill == "zero":
        filled = F.coalesce("__agg__", F.lit(0))
    else:
        filled = F.col("__agg__")
    return joined.select(
        *gb,
        F.timestamp_seconds(F.col("__b__")).alias("bucket_ts"),
        filled.alias("value"),
        F.col("__agg__").isNull().alias("is_filled"),
    )
