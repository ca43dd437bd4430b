"""Seasonal-baseline anomaly detection over an event stream.

Operational analytics: learn the normal activity level for each
(key, season-slot) — e.g. "errors at 3 AM" — and flag time buckets
whose volume deviates from their own slot's history. The standard
same-slot-of-period baseline (the no-training seasonal model every
monitoring stack ships) rather than an opaque learned detector, so the
flags are explainable and an SQL oracle replays them exactly. No
counterpart exists in the reference.

Determinism contract: bucket counts are integers, and the baseline
mean/std come from ``standardize``'s exact n/Σv/Σv² moment algebra
(`operators/normalize.py`), so z-scores reproduce bit-exactly in an
external engine for these integral inputs.

Scale shape: one map-side-combinable groupBy builds the bucket counts
(output = |keys| × buckets, calendar-bounded — far smaller than the
event table, and the only pass over it); the baseline is a second tiny
aggregate over those buckets re-attached with the package's broadcast
NULL-safe join. The raw events shuffle once, on the bucket key.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

from kolang_spark.operators.normalize import standardize

__all__ = ["seasonal_anomaly", "cusum_shift"]

# Season slots from pure integer epoch arithmetic on the bucket start —
# NOT F.hour/F.dayofweek, which read spark.sql.session.timeZone and would
# silently shift slots for non-UTC sessions (advisor finding, r9). These
# are UTC semantics by construction, matching the SQL oracle exactly.
# day_of_week keeps Spark's 1=Sunday..7=Saturday convention: epoch day 0
# (1970-01-01) was a Thursday, hence the +4 offset.
def _epoch_hour_of_day(s):
    return F.floor(F.pmod(s, F.lit(86400)) / F.lit(3600))


def _epoch_day_of_week(s):
    return F.pmod(F.floor(s / F.lit(86400)) + F.lit(4), F.lit(7)) + F.lit(1)


_SEASONS = {
    "hour_of_day": _epoch_hour_of_day,
    "day_of_week": _epoch_day_of_week,
    "hour_of_week": lambda s: (_epoch_day_of_week(s) - 1) * 24
    + _epoch_hour_of_day(s),
}


def seasonal_anomaly(
    df: DataFrame,
    ts_col: str = "ts",
    by: Optional[Sequence[str]] = None,
    season: str = "hour_of_day",
    bucket_seconds: int = 3600,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Flag anomalous time buckets against their seasonal baseline.

    Buckets events into ``bucket_seconds`` windows per ``by`` key,
    computes each bucket's count, then z-scores every bucket within its
    (key, season-slot) population — slot = hour-of-day / day-of-week /
    hour-of-week of the bucket start, computed in UTC by integer epoch
    arithmetic (independent of ``spark.sql.session.timeZone``;
    day-of-week keeps Spark's 1=Sunday..7=Saturday numbering). Returns one row per non-empty
    bucket: the keys, ``bucket_start_s`` (epoch seconds), ``slot``,
    ``n_events``, ``z`` (NULL when the slot has <2 buckets or zero
    spread — no honest baseline), and ``is_anomaly`` (``|z| >
    z_threshold``; false when ``z`` is NULL).

    Caveat the caller owns: empty buckets are absent, not zero — a
    *silent outage* doesn't flag. Densify with ``resample_fill`` first
    when zero-activity buckets must participate in the baseline.
    """
    if season not in _SEASONS:
        raise ValueError(f"season must be one of {sorted(_SEASONS)}")
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    gb = list(by) if by else []

    ts = F.col(ts_col)
    # floor, not cast-truncation: pre-epoch timestamps are negative and
    # must bucket DOWN (floor(epoch/step)*step, the oracle convention)
    bucket_s = (
        F.floor(ts.cast("double") / bucket_seconds).cast("long")
        * bucket_seconds
    )
    buckets = (
        df.where(ts.isNotNull())
        .groupBy(*gb, bucket_s.alias("bucket_start_s"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .withColumn(
            "slot",
            _SEASONS[season](F.col("bucket_start_s")).cast("int"),
        )
    )
    scored = standardize(
        buckets, "n_events", by=gb + ["slot"], method="zscore", out_col="z"
    )
    return scored.select(
        *gb,
        "bucket_start_s",
        "slot",
        "n_events",
        "z",
        F.when(F.abs(F.col("z")) > F.lit(float(z_threshold)), F.lit(True))
        .otherwise(F.lit(False))
        .alias("is_anomaly"),
    )


def cusum_shift(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    by: Optional[Sequence[str]] = None,
    reference: int = 0,
    threshold: int = 0,
    side: str = "high",
) -> DataFrame:
    """One-sided CUSUM change detection (Page 1954) per ``by`` series →
    every input row plus ``cusum`` and ``alarm``.

    The textbook recursion s_0 = 0, s_i = max(0, s_{i-1} + (x_i −
    reference)) accumulates evidence of a sustained upward shift above
    ``reference`` (for ``side='low'``, of a downward shift below it:
    the deviation sign flips) and ``alarm`` fires while ``cusum`` >
    ``threshold``. Tune ``reference`` to (acceptable mean + half the
    shift you care about) and ``threshold`` to the evidence you demand
    — the public CUSUM design rules.

    Implemented via the reflection closed form — s_i = P_i −
    min(0, min_{j≤i} P_j) with P the running sum of deviations — which
    turns the sequential recursion into two cumulative window
    aggregates, so the operator is fully distributed (no per-series
    fold, no UDF) and an SQL oracle replays it with the same two
    windows. All arithmetic is integer (values and reference are cast
    to long): exact, order-independent, engine-identical.

    Timestamps must be unique within each ``by`` series (the usual
    shape: one bucket per period from an upstream groupBy) — ties make
    "running" ill-defined; the operator fails fast if any (by, ts)
    pair repeats. Rows with NULL value or ts are rejected too, same
    reason.

    Scale shape: one shuffle on the series key; both cumulative frames
    ride the same sort. Series length is calendar-bounded, so
    partitions stay small no matter how large the raw table was before
    its per-period aggregation.
    """
    if side not in ("high", "low"):
        raise ValueError("side must be 'high' or 'low'")
    gb = list(by) if by else []
    x = F.col(value_col).cast("long")
    dev = (x - F.lit(int(reference))) if side == "high" else (
        F.lit(int(reference)) - x
    )
    seq = Window.partitionBy(*gb).orderBy(F.col(ts_col))
    run = seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # fail fast on NULLs/ties (both corrupt the running sums). The tie
    # probe is lag(ts) == ts on the SAME sorted window — equal
    # timestamps are adjacent after the sort, so this catches every
    # tie without the extra shuffle a partitionBy(gb, ts) count
    # window would cost.
    dup = F.lag(F.col(ts_col)).over(seq).eqNullSafe(F.col(ts_col))
    checked = F.when(
        F.col(ts_col).isNull() | x.isNull(),
        F.raise_error(F.lit("cusum_shift: NULL ts/value in input")),
    ).when(
        dup,
        F.raise_error(F.lit("cusum_shift: duplicate timestamp in a series")),
    )
    # two stacked selects: windows can't nest inside one projection,
    # and both running frames share the same partition+sort so Spark
    # evaluates them in one sorted pass
    with_p = df.select(
        *df.columns,
        F.coalesce(checked.cast("long"), F.sum(dev).over(run)).alias("__p__"),
    )
    s = F.col("__p__") - F.least(
        F.lit(0).cast("long"), F.min("__p__").over(run)
    )
    return with_p.select(*df.columns, s.alias("cusum")).withColumn(
        "alarm", F.col("cusum") > F.lit(int(threshold))
    )
