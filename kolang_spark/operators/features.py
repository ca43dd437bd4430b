"""Trailing-window feature generation over an event stream.

The feature-engineering staple behind fraud/abuse/ranking models:
"how many events (and how much value) did this entity produce in the
last hour / day / week, as of each event". One call adds all windows
at once. No counterpart exists in the reference.

Determinism contract: RANGE frames are tie-inclusive — every row whose
timestamp falls inside the window participates regardless of physical
order — so counts and integer sums are order-independent and an SQL
oracle (RANGE BETWEEN n PRECEDING AND CURRENT ROW over the same
integral timestamp) reproduces them exactly. Feed fixed-point integer
values (cents) where bit-exact replay matters, the engine's standard
idiom.

Scale shape: ONE shuffle on the entity key, one within-partition sort,
and every (window × agg) combination evaluated in the SAME window pass
— Spark collapses same-spec window frames, so adding a window adds an
accumulator, not a shuffle or a sort. The naive alternative (one
self-join per window: events ⋈ events on key + time band) costs a
join per window and fans out row-pairs; this costs none. Skewed
entities (one user = one partition's worth of events) are the caveat
the caller owns — cap with an upstream sample or sessionize first.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["trailing_window_agg", "target_encode", "event_transitions"]


def trailing_window_agg(
    df: DataFrame,
    by: Sequence[str],
    ts_col: str = "ts_ms",
    windows_ms: Sequence[int] = (3600_000, 86400_000),
    value_col: Optional[str] = None,
) -> DataFrame:
    """Add trailing-window features per ``by`` entity, as of each row:
    for every ``w`` in ``windows_ms``, ``n_{w}ms`` = events in
    ``[ts - w, ts]`` (both ends inclusive, current row included) and —
    when ``value_col`` is given — ``sum_{w}ms`` = its sum over the same
    frame (NULL values contribute nothing; an all-NULL frame sums to
    NULL, SQL semantics).

    ``ts_col`` must be integral (epoch milliseconds by convention) —
    RANGE frames over floats invite cross-engine ulp disagreements.
    Rows with NULL ``ts_col`` are dropped (they have no place on the
    time axis).
    """
    if not by:
        raise ValueError("by must be non-empty")
    ws = [int(w) for w in windows_ms]
    if not ws or any(w <= 0 for w in ws):
        raise ValueError("windows_ms must be positive")
    out = df.where(F.col(ts_col).isNotNull())
    cols = list(out.columns)
    for w in ws:
        frame = (
            Window.partitionBy(*by)
            .orderBy(F.col(ts_col).cast("long"))
            .rangeBetween(-w, 0)
        )
        cols.append(F.count(F.lit(1)).over(frame).alias(f"n_{w}ms"))
        if value_col is not None:
            cols.append(
                F.sum(F.col(value_col)).over(frame).alias(f"sum_{w}ms")
            )
    return out.select(*cols)


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    out_col: Optional[str] = None,
    smoothing: int = 0,
    leave_one_out: bool = False,
    units: Optional[int] = None,
) -> DataFrame:
    """Target (mean) encoding of a categorical column — the classic
    high-cardinality-category feature for tabular models. Adds
    ``out_col`` (default ``{cat_col}_te``).

    - plain: category mean of ``target_col``;
    - ``smoothing=m`` (m-estimate, public Micci-Barreca 2001 recipe):
      ``(sum + m·prior) / (n + m)`` with ``prior`` the global target
      mean — shrinks rare categories toward the prior;
    - ``leave_one_out=True``: each row's own target is excluded —
      ``(sum − y) / (n − 1)`` (with smoothing:
      ``(sum − y + m·prior) / (n − 1 + m)``) — the standard
      target-leakage guard for training folds. Singleton categories
      (n = 1, no smoothing) encode NULL: there is nothing left to
      average.

    Determinism: sums/counts are exact (feed integer targets — cents,
    0/1 labels — for bit-exact replay); the division order is fixed
    (sum-style numerator ÷ count-style denominator) so an SQL oracle
    reproduces the doubles. Rows with NULL target are excluded from
    the statistics but still receive the category's encoding; a NULL
    category is its own group (NULL-safe join).

    ``units=k`` (requires an integral target and ``smoothing=0``)
    switches the output to an exact LONG in 1/k units —
    ``(numerator · k) DIV denominator``, all-integer arithmetic, the
    package's ``p_micro`` idiom (``event_transitions`` below): no
    double ever materializes, so the value replays bit-for-bit on any
    engine/version — double ROUND at ~1e7 magnitude needs ~14
    significant digits and is exactly where engine rounding
    implementations diverge (round-10 external red). DIV truncates
    toward zero (floor for the non-negative targets this mode is
    meant for). The arithmetic is overflow-safe for any group SUM
    (scaled-division decomposition), but the RESULT itself —
    ``|mean|·units`` — must fit a signed 64-bit long; when it cannot
    (no correct long exists) an in-plan guard raises loudly UNDER ANY
    SESSION CONFIG (advisor r12: the previous behavior raised only
    under ANSI and silently wrapped negative in the package's default
    ANSI-off sessions) — pick smaller ``units`` for extreme target
    magnitudes. The guard is one representable value conservative at
    the exact ``2⁶³−1`` boundary.

    Scale shape: one map-side-combinable groupBy on the category (plus
    one global aggregate when priors are needed) re-attached with the
    package's broadcast NULL-safe join — detail rows never shuffle.
    """
    from ..utils import broadcast_join_nullsafe

    if smoothing < 0:
        raise ValueError("smoothing must be >= 0")
    out_col = out_col or f"{cat_col}_te"
    if units is not None:
        if smoothing:
            raise ValueError(
                "units (exact integer output) requires smoothing=0 — "
                "the m-estimate prior is a global mean (a double)"
            )
        if units <= 0:
            raise ValueError("units must be a positive integer")
        # enforce the documented integral-target precondition: with
        # ANSI off, cast('long') on a double column TRUNCATES each
        # value toward zero and the "exact" encoding is silently wrong
        # (review r11: all-0.9 scores -> te 0 instead of 900)
        t_dtype = dict(df.dtypes).get(target_col)
        if t_dtype not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"units mode requires an integral target column; "
                f"{target_col!r} is {t_dtype!r} — convert to integer "
                "units first (e.g. cents via floor(x*100 + 0.5))"
            )
        yl = F.col(target_col).cast("long")
        stats = df.groupBy(cat_col).agg(
            F.count(yl).alias("__te_n__"), F.sum(yl).alias("__te_s__")
        )
        joined = broadcast_join_nullsafe(df, stats, [cat_col])
        num = F.coalesce(F.col("__te_s__"), F.lit(0).cast("long"))
        den = F.col("__te_n__")
        if leave_one_out:
            num = num - F.coalesce(yl, F.lit(0).cast("long"))
            den = den - F.when(yl.isNotNull(), 1).otherwise(0)
        # overflow-safe scaled division: num·u DIV den would overflow
        # LONG once a group's target sum passes 2⁶³/u (~9.2e12 in
        # micro-units — reachable at 100 TB group sizes). Decompose by
        # the division identity num = q·den + r:
        # trunc(num·u/den) = q·u + trunc(r·u/den), with |r| < den so
        # r·u can only overflow if den itself exceeds 2⁶³/u. Exact
        # under trunc semantics for either sign; no double ever
        # materializes.
        u = int(units)
        # in-plan representability guard (advisor r12): under the
        # package's default ANSI-OFF sessions the q·u term would WRAP
        # silently — the "exact" encoding came back as a garbage
        # negative long with no error, and the documented
        # ARITHMETIC_OVERFLOW only existed under ANSI. Raise loudly in
        # either config. |q| ≥ 2⁶³DIV u ⇒ q·u + r-term can exceed
        # int64 (the ≥ is one representable value conservative at the
        # exact boundary — the message says to pick smaller units);
        # den > 2⁶³DIV u ⇒ the r·u term itself can wrap. Sign-safe
        # compares, not abs() (abs(-2⁶³) overflows under ANSI).
        lim = (2**63 - 1) // u
        qcol = F.expr("`__te_num__` DIV `__te_den__`")
        overflow = (
            (qcol >= F.lit(lim))
            | (qcol <= F.lit(-lim))
            | (F.col("__te_den__") > F.lit(lim))
        )
        exact = F.expr(
            f"(`__te_num__` DIV `__te_den__`) * {u}L"
            f" + ((`__te_num__` % `__te_den__`) * {u}L)"
            " DIV `__te_den__`"
        )
        return (
            joined.withColumn("__te_num__", num)
            .withColumn("__te_den__", den)
            .withColumn(
                out_col,
                F.when(
                    F.col("__te_den__") > 0,
                    F.when(
                        overflow,
                        F.raise_error(
                            F.concat(
                                F.lit(
                                    "target_encode units mode: "
                                    "|mean|*units would overflow BIGINT "
                                    "for a category group (num="
                                ),
                                F.col("__te_num__").cast("string"),
                                F.lit(", den="),
                                F.col("__te_den__").cast("string"),
                                F.lit(f", units={u}) — pick smaller units"),
                            )
                        ),
                    ).otherwise(exact),
                ),
            )
            .drop("__te_n__", "__te_s__", "__te_num__", "__te_den__")
        )
    y = F.col(target_col).cast("double")
    stats = df.groupBy(cat_col).agg(
        F.count(y).alias("__te_n__"), F.sum(y).alias("__te_s__")
    )
    joined = broadcast_join_nullsafe(df, stats, [cat_col])
    # SUM over zero non-NULL rows is NULL; coalesce to 0 so an
    # all-NULL-target category shrinks fully to the prior under
    # smoothing ((0 + m·prior)/(0 + m) = prior) instead of poisoning
    # the numerator to NULL (advisor finding, r9).
    num = F.coalesce(F.col("__te_s__"), F.lit(0.0))
    den = F.col("__te_n__").cast("double")
    if leave_one_out:
        num = num - F.coalesce(y, F.lit(0.0))
        den = den - F.when(y.isNotNull(), 1.0).otherwise(0.0)
    if smoothing:
        g = df.agg(
            (F.sum(y) / F.count(y)).alias("__te_prior__")
        )
        joined = joined.join(F.broadcast(g))
        num = num + F.lit(float(smoothing)) * F.col("__te_prior__")
        den = den + F.lit(float(smoothing))
    enc = F.when(den > 0, num / den)
    drop = ["__te_n__", "__te_s__"] + (["__te_prior__"] if smoothing else [])
    return joined.withColumn(out_col, enc).drop(*drop)


def event_transitions(
    df: DataFrame,
    by: Sequence[str],
    ts_col: str,
    state_col: str,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """First-order transition matrix of an event stream → one row per
    observed (from_state, to_state) pair: ``n`` (transition count) and
    ``p_micro`` (row-normalized probability in integer micro-units,
    ``n·1e6 DIV row_total`` — exact, no float drift). The user-journey
    / Markov-chain summary behind "what do users do after X".

    Consecutiveness is per ``by`` entity in (ts, *order_cols) order;
    pass ``order_cols`` (e.g. the event id) whenever timestamps can
    tie, otherwise ties make "next" nondeterministic and the operator
    fails fast (same peer-group probe as ``cusum_shift``).

    Scale shape: one shuffle on the entity key for the lead() window,
    then one map-side-combinable groupBy on the (from, to) pair —
    output is |states|², independent of stream size.
    """
    if not by:
        raise ValueError("by must be non-empty")
    order = [F.col(ts_col)] + [F.col(c) for c in order_cols]
    w = Window.partitionBy(*by).orderBy(*order)
    # tie probe on the SAME sorted window (equal ordering tuples are
    # adjacent after the sort — no second shuffle): lag of the full
    # ordering tuple equals the current one ⇒ tie
    key = F.struct(*order)
    dup = F.lag(key).over(w).eqNullSafe(key)
    nxt = F.when(
        dup,
        F.raise_error(
            F.lit("event_transitions: tied (ts, order_cols) in a series")
        ),
    ).otherwise(F.lead(state_col).over(w))
    pairs = (
        df.select(
            F.col(state_col).alias("from_state"), nxt.alias("to_state")
        )
        .where(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # the row total rides a partition-only window over the tiny
    # |states|² pair table — not over the stream
    row_tot = Window.partitionBy("from_state")
    return pairs.withColumn("__row_n__", F.sum("n").over(row_tot)).select(
        "from_state",
        "to_state",
        "n",
        F.expr("n * 1000000L DIV `__row_n__`").alias("p_micro"),
    )
