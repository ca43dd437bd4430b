"""Conversion attribution over an event stream.

Marketing/product analytics: credit each conversion event to the
touchpoint that preceded it — last-touch (the touch immediately before
the conversion) or first-touch (the user's earliest touch) — the two
standard single-touch models. No counterpart exists in the reference.

Determinism contract: "preceding" is defined by (ts, *order_cols)
order per entity; tied orderings fail fast (same peer-group probe as
``cusum_shift``), so the attributed touch is a pure function of the
input and an SQL oracle replays it with
``LAST_VALUE/FIRST_VALUE(… IGNORE NULLS)`` over the identical frame.

Scale shape: one shuffle on the entity key, one within-partition sort;
both models are IGNORE-NULLS window picks over the same frame — no
self-join of conversions against touches (the naive shape: conversions
⋈ touches on entity + time band, which fans out per touch).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["attribute_conversions"]


def attribute_conversions(
    df: DataFrame,
    by: Sequence[str],
    ts_col: str,
    state_col: str,
    conversion_states: Sequence[str],
    touch_states: Optional[Sequence[str]] = None,
    model: str = "last_touch",
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Return one row per conversion event: the ``by`` keys, ``ts_col``,
    the conversion state (``conversion``) and ``attributed`` — the
    credited touch state (NULL when the user converted with no prior
    touch; downstream reports usually bucket that as 'direct').

    - ``conversion_states``: states that count as conversions;
    - ``touch_states``: states eligible for credit (default: every
      state NOT in ``conversion_states``);
    - ``model='last_touch'``: the latest touch at or before the
      conversion; ``'first_touch'``: the earliest touch at or before
      it. A touch tied to the conversion's own timestamp counts as
      preceding only via ``order_cols`` order (strictly earlier rows).
    """
    if model not in ("last_touch", "first_touch"):
        raise ValueError("model must be 'last_touch' or 'first_touch'")
    if not by:
        raise ValueError("by must be non-empty")
    conv = [str(s) for s in conversion_states]
    if not conv:
        raise ValueError("conversion_states must be non-empty")

    s = F.col(state_col)
    is_conv = s.isin(conv)
    if touch_states is None:
        is_touch = ~is_conv & s.isNotNull()
    else:
        is_touch = s.isin([str(t) for t in touch_states])

    order = [F.col(ts_col)] + [F.col(c) for c in order_cols]
    seq = Window.partitionBy(*by).orderBy(*order)
    w = seq.rowsBetween(Window.unboundedPreceding, -1)
    # tie probe on the same sorted window — no second shuffle (see
    # event_transitions). The per-row lag==current flag alone is NOT
    # enough here: the conversion filter below is pushed under the
    # final projection, so a raise guard attached to non-conversion
    # rows would never be evaluated — lift the flag to a
    # whole-partition max so ANY tie in the series raises on the
    # conversion rows that do survive (same partitioning, no extra
    # shuffle).
    key = F.struct(*order)
    touch = F.when(is_touch, s)
    pick = (
        F.last(touch, ignorenulls=True)
        if model == "last_touch"
        else F.first(touch, ignorenulls=True)
    )
    # two stacked projections: windows can't nest, and the partition
    # max must be over the lag flag's OUTPUT
    staged = df.select(
        *by,
        F.col(ts_col),
        s.alias("conversion"),
        pick.over(w).alias("__pick__"),
        F.lag(key).over(seq).eqNullSafe(key).cast("int").alias("__tie__"),
        is_conv.alias("__is_conv__"),
    )
    any_tie = F.max("__tie__").over(Window.partitionBy(*by)) == 1
    attributed = F.when(
        any_tie,
        F.raise_error(
            F.lit("attribute_conversions: tied (ts, order_cols) in a series")
        ),
    ).otherwise(F.col("__pick__"))
    return (
        staged.select(
            *by,
            F.col(ts_col),
            "conversion",
            attributed.alias("attributed"),
            "__is_conv__",
        )
        .where(F.col("__is_conv__"))
        .drop("__is_conv__")
    )
