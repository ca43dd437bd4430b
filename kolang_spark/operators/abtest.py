"""A/B experiment readout: per-variant conversion report with
two-proportion z statistics against the control.

The standard frequentist experiment summary (public textbook
statistics: pooled two-proportion z-test): one row per variant with
its sample size, conversions, rate, lift vs control, and z score —
the numbers a decision review actually reads. No counterpart exists
in the reference.

Determinism contract: counts are exact integers; every derived double
(rate, pooled rate, z) is computed by ONE fixed formula in a fixed
evaluation order, so an SQL oracle reproduces the values bit-for-bit:

    rate   = x / n
    pooled = (x + x0) / (n + n0)
    z      = (x/n − x0/n0)
             / sqrt(pooled · (1 − pooled) · (1/n + 1/n0))

z is NULL for the control row itself and for degenerate cases (either
side empty, or pooled rate 0/1 — no variance to test against).

Scale shape: ONE map-side-combinable groupBy on the variant label
(output = |variants| rows); the tiny aggregate is pinned with
``localCheckpoint`` and the control row's (n0, x0) are then read with
a bounded collect (≤1 row) and embedded as plan literals, so variant
rows never join at all. The raw assignment/metric table is scanned
once and never shuffled beyond the aggregate.

Eager-evaluation caveat (deliberate, unique in this package): calling
the operator runs Spark jobs immediately (the checkpoint + the 1-row
collect) — that is what guarantees the single scan and the fail-fast
on a missing control. Consequences the caller owns: the returned
frame is pinned to this session (localCheckpoint blocks are not
recomputable from source after the session ends) and the operator
cannot sit inside a streaming plan. A lazy alternative (broadcast
join of the 1-row control aggregate + ``raise_error`` guard) exists
but re-scans the raw table twice once Catalyst pushes the control
filter below the aggregate — the wrong trade at warehouse scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["ab_test_report"]


def ab_test_report(
    df: DataFrame,
    variant_col: str,
    success_col: str,
    control: str,
) -> DataFrame:
    """Summarize a binary-outcome experiment → one row per variant:
    ``(variant, n, x, rate, lift, z)``.

    ``success_col`` is interpreted as binary: any non-NULL non-zero
    value counts as a success (cast through ``!= 0``), NULL counts as
    a failure of exposure bookkeeping — the row still counts toward
    ``n`` (it was exposed) but not toward ``x``. ``lift`` is the
    absolute rate difference vs ``control``; relative lift is
    ``lift / control rate`` — left to the reader, the absolute one is
    the tested quantity. Rows whose variant is NULL are dropped
    (unassigned traffic).

    Raises if ``control`` has no rows — every comparison needs its
    denominator. NOTE: this operator evaluates EAGERLY (runs Spark
    jobs at call time — see the module docstring for why and what
    that implies).
    """
    succ = (
        F.col(success_col).isNotNull()
        & (F.col(success_col).cast("double") != 0.0)
    ).cast("long")
    per = (
        df.where(F.col(variant_col).isNotNull())
        .groupBy(F.col(variant_col).alias("variant"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(succ).alias("x"),
        )
    )
    # pin the tiny |variants|-row aggregate so the raw table is scanned
    # exactly once (the control read below and the returned frame both
    # reuse it), then a bounded collect (≤1 row — the control's own
    # aggregate): fail fast when the control label is absent, and embed
    # n0/x0 as plan literals so variant rows never join at all
    per = per.localCheckpoint(eager=True)
    ctrl_rows = per.where(F.col("variant") == F.lit(control)).collect()
    if not ctrl_rows:
        raise ValueError(f"control variant {control!r} has no rows")
    n0i, x0i = int(ctrl_rows[0]["n"]), int(ctrl_rows[0]["x"])
    n, x = F.col("n").cast("double"), F.col("x").cast("double")
    n0 = F.lit(float(n0i))
    x0 = F.lit(float(x0i))
    rate = x / n
    pooled = (x + x0) / (n + n0)
    z = (x / n - x0 / n0) / F.sqrt(
        pooled * (1 - pooled) * (1 / n + 1 / n0)
    )
    is_ctrl = F.col("variant") == F.lit(control)
    degenerate = (pooled <= 0) | (pooled >= 1)
    return per.select(
        "variant",
        "n",
        "x",
        rate.alias("rate"),
        F.when(~is_ctrl, rate - x0 / n0).alias("lift"),
        F.when(~is_ctrl & ~degenerate, z).alias("z"),
    )
