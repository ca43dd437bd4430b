"""Core window / aggregate / math column operators.

Parity targets (semantics, not implementation) are the reference's
``kolang/column_functions.py`` — file:line cites below point into
``/root/reference/``. All operators here:

* accept ``str | Column`` everywhere (the reference's ``median`` accepts
  only ``str`` — fixed here);
* return vanilla :class:`pyspark.sql.Column` (no subclassing, SURVEY §1.4);
* are UDF-free Catalyst expression trees.

Scale notes (100 TB posture, SURVEY §4): operators taking
``partition_by`` default to a *global* window when it is omitted, exactly
like the reference — which physically means a single-partition
``WindowExec``. That is fine for small grouped outputs (e.g. after a
``groupBy().count()`` with dozens of groups) but is the #1 hazard on raw
100 TB inputs. For those cases use the DataFrame-level rewrites in
:mod:`kolang_spark.operators.scale` (``with_percent``,
``with_cumulative_sum``) which compute grand totals via a broadcast
aggregate / bucketed two-pass prefix sum instead of a global window.
"""

from __future__ import annotations

import math
from functools import reduce
from typing import List, Optional, Sequence, Union

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from kolang_spark.utils import ColumnOrName, to_col, to_col_list, to_cols

__all__ = [
    "col",
    "str_to_column",
    "percent",
    "median",
    "cumulative_sum",
    "cumulative_percent",
    "cond_count",
    "condition_count",
    "weighted_average",
    "weighted_avg",
    "count_distinct_with_nulls",
    "cube_percent",
    "moving_average",
    "moving_avg",
    "bin",
    "quantiles",
    "sum_columns",
    "array_contains_column",
    "is_null_or_in",
]


def col(*cols: ColumnOrName) -> Union[Column, tuple]:
    """Coerce name(s) to Column(s).

    Parity: reference ``col``/``str_to_column``
    (``kolang/column_functions.py:12-27``). Deviation: for multiple
    arguments the reference returns a lazy *generator*; this returns a
    tuple (indexable, re-iterable — the generator behavior is a footgun).
    """
    out = to_cols(cols)
    return out[0] if len(out) == 1 else tuple(out)


str_to_column = col


def percent(
    col: ColumnOrName = "count",
    partition_by: Union[ColumnOrName, Sequence[ColumnOrName], None] = None,
    r: Optional[int] = 2,
) -> Column:
    """Each row's value as a percentage of the (partitioned) total.

    Parity: ``kolang/column_functions.py:30-67``. The default
    ``col='count'`` is designed to chain directly after
    ``df.groupBy(...).count()``.

    ``r=None`` skips rounding (extension; the reference always rounds).

    Scale: with ``partition_by=None`` this is a global window — apply it
    to *small grouped* frames. For large frames use
    :func:`kolang_spark.operators.scale.with_percent` (broadcast-total
    rewrite, no single-partition exchange).
    """
    c = to_col(col)
    w = Window.partitionBy(*to_col_list(partition_by))
    out = 100 * c / F.sum(c).over(w)
    return F.round(out, r) if r is not None else out


def median(col: ColumnOrName, exact: bool = True) -> Column:
    """Aggregate: median of the group.

    Parity: ``kolang/column_functions.py:70-94`` (exact
    ``percentile(col, 0.5)``; the reference only accepts ``str`` and
    aliases the result ``median(col)`` — here both ``str`` and ``Column``
    work, and the alias is applied only when the name is known).

    ``exact=False`` switches to ``approx_percentile`` (t-digest sketch,
    mergeable, no per-group sort buffer) — the right default at 100 TB.
    """
    c = to_col(col)
    out = F.percentile(c, F.lit(0.5)) if exact else F.approx_percentile(c, F.lit(0.5), F.lit(10000))
    if isinstance(col, str):
        out = out.alias(f"median({col})")
    return out


def quantiles(
    col: ColumnOrName,
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    exact: bool = True,
    accuracy: int = 10000,
) -> Column:
    """Aggregate: multi-quantile summary of the group
    (``array<double>``, one element per probability, linear
    interpolation — the ``median`` family generalized to a full
    per-group distribution profile in ONE sort/sketch pass instead of
    one per probability).

    ``exact=True`` → ``percentile(col, array(...))`` (per-group sort
    buffer); ``exact=False`` → ``approx_percentile`` (t-digest sketch,
    mergeable map-side, bounded memory) — the right default at 100 TB.
    DuckDB's ``quantile_cont(col, [..])`` computes the same
    interpolation, so exact results are oracle-comparable.
    """
    ps = [float(p) for p in probs]
    if not ps or not all(0.0 <= p <= 1.0 for p in ps):
        raise ValueError("probs must be non-empty, each in [0, 1]")
    c = to_col(col)
    arr = F.array(*[F.lit(p) for p in ps])
    if exact:
        return F.percentile(c, arr)
    return F.approx_percentile(c, arr, F.lit(accuracy))


def _ordered(on_col: ColumnOrName, ascending: bool) -> Column:
    c = to_col(on_col)
    return c if ascending else c.desc()


def cumulative_sum(
    col: ColumnOrName,
    on_col: ColumnOrName,
    ascending: bool = True,
    partition_by: Union[ColumnOrName, Sequence[ColumnOrName], None] = None,
) -> Column:
    """Running total of ``col`` ordered by ``on_col``.

    Parity: ``kolang/column_functions.py:176-215``. Uses a **RANGE**
    frame (unbounded preceding → current row): rows tied on ``on_col``
    all receive the full tied sum — verified reference behavior
    (SURVEY §2.1 C6); do not change to ROWS.

    Scale: no ``partition_by`` ⇒ single-partition window. For raw big
    tables use :func:`kolang_spark.operators.scale.with_cumulative_sum`
    (bucketed two-pass prefix sum).
    """
    w = (
        Window.partitionBy(*to_col_list(partition_by))
        .orderBy(_ordered(on_col, ascending))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return F.sum(to_col(col)).over(w)


def cumulative_percent(
    col: ColumnOrName,
    on_col: ColumnOrName,
    ascending: bool = True,
    partition_by: Union[ColumnOrName, Sequence[ColumnOrName], None] = None,
    r: Optional[int] = 2,
) -> Column:
    """Running share of the (partitioned) total, in percent.

    Parity: ``kolang/column_functions.py:562-613``. Ordered window keeps
    Spark's default RANGE cumulative frame (same tie semantics as
    :func:`cumulative_sum`); denominator is the partition total.
    """
    parts = to_col_list(partition_by)
    w_run = Window.partitionBy(*parts).orderBy(_ordered(on_col, ascending))
    w_tot = Window.partitionBy(*parts)
    c = to_col(col)
    out = 100 * F.sum(c).over(w_run) / F.sum(c).over(w_tot)
    return F.round(out, r) if r is not None else out


def cond_count(cond: ColumnOrName) -> Column:
    """Aggregate: number of rows satisfying a predicate.

    Parity: ``kolang/column_functions.py:311-331`` (str parsed as a SQL
    expression). Equivalent to ``count_if`` and never NULL (empty → 0).
    """
    c = F.expr(cond) if isinstance(cond, str) else cond
    return F.count(F.when(c, True))


condition_count = cond_count


def weighted_average(
    col: ColumnOrName,
    weight: ColumnOrName,
    r: Optional[int] = None,
) -> Column:
    """Aggregate: ``sum(col*weight) / sum(weight)``.

    Parity: ``kolang/column_functions.py:616-646``.
    """
    c, w = to_col(col), to_col(weight)
    out = F.sum(c * w) / F.sum(w)
    return F.round(out, r) if r is not None else out


weighted_avg = weighted_average


def count_distinct_with_nulls(
    col: ColumnOrName, exact: bool = True, rsd: float = 0.05
) -> Column:
    """Aggregate: distinct count where NULL counts as one extra value.

    Parity (intent): ``kolang/column_functions.py:649-664`` — the
    reference implementation is broken on every PySpark version
    (``F.col(<Column>)``, SURVEY §2.1 C17); this is the intended
    semantics: ``count_distinct(c) + (1 if any NULL else 0)``.

    ``exact=False`` switches to HyperLogLog++ (``approx_count_distinct``
    with relative error ``rsd``) — at 100 TB an exact distinct on a
    high-cardinality column shuffles every distinct value; the sketch
    shuffles a few KB per partition.
    """
    c = to_col(col)
    has_null = F.max(F.when(c.isNull(), 1).otherwise(0))
    base = F.count_distinct(c) if exact else F.approx_count_distinct(c, rsd)
    return base + F.coalesce(has_null, F.lit(0))


def cube_percent(
    col: ColumnOrName,
    cube_cols: Union[ColumnOrName, Sequence[ColumnOrName]],
    partition_by: Union[ColumnOrName, Sequence[ColumnOrName], None] = None,
    r: Optional[int] = 2,
) -> Column:
    """Percent-of-total for ``df.cube(...).agg(...)`` output rows.

    The denominator sums only rows where *every* cube column is non-NULL
    (the finest-granularity cells), so super-aggregate rows do not double
    it. Parity: ``kolang/column_functions.py:667-699``.

    Caveat (inherited, documented): a genuine NULL group key is
    indistinguishable from a rolled-up level under the NULL gate. When
    the frame still carries ``grouping_id`` information, prefer gating on
    ``F.grouping_id() == 0`` upstream and passing the gate via
    ``cube_cols``.
    """
    c = to_col(col)
    gate = reduce(
        lambda acc, cc: acc & cc.isNotNull(),
        to_col_list(cube_cols),
        F.lit(True),
    )
    w = Window.partitionBy(*to_col_list(partition_by))
    out = 100 * c / F.sum(F.when(gate, c)).over(w)
    return F.round(out, r) if r is not None else out


def moving_average(
    col_value: ColumnOrName,
    order_col: ColumnOrName,
    period: int,
    mode: str = "center",
    r: Optional[int] = None,
    partition_by: Union[ColumnOrName, Sequence[ColumnOrName], None] = None,
) -> Column:
    """Rolling mean over ``period`` rows ordered by ``order_col``.

    Parity: ``kolang/column_functions.py:702-745``. ROWS frame by mode:
    ``previous`` = (-(p-1), 0), ``center`` = (-ceil((p-1)/2),
    floor((p-1)/2)), ``next`` = (0, p-1). Partial frames at the edges
    average over the available rows (verified reference behavior).

    ``partition_by`` is an extension: the reference always uses a global
    window; pass a partition (e.g. a series key) to keep the window
    distributed on big data.
    """
    p = period - 1
    if mode == "previous":
        s, e = -p, 0
    elif mode == "center":
        s, e = -math.ceil(p / 2), math.floor(p / 2)
    elif mode == "next":
        s, e = 0, p
    else:
        raise ValueError(f"mode must be previous|center|next, got {mode!r}")
    w = (
        Window.partitionBy(*to_col_list(partition_by))
        .orderBy(_ordered(order_col, True))
        .rowsBetween(s, e)
    )
    out = F.avg(to_col(col_value)).over(w)
    return F.round(out, r) if r is not None else out


moving_avg = moving_average


def bin(
    col: ColumnOrName,
    scale: Union[int, float] = 10,
    flooring: bool = True,
) -> Column:
    """Histogram bucketing: snap values to multiples of ``scale``.

    Parity: ``kolang/column_functions.py:255-277`` —
    ``floor(col/scale)*scale`` or ``round(col/scale, 0)*scale``.
    """
    c = to_col(col)
    if flooring:
        return F.floor(c / scale) * scale
    return F.round(c / scale, 0) * scale


def sum_columns(
    cols: Sequence[ColumnOrName],
    ignore_nulls: bool = False,
) -> Column:
    """Horizontal (row-wise) sum across N columns.

    Parity: ``kolang/column_functions.py:489-527``: a NULL in any operand
    makes the sum NULL (verified). ``ignore_nulls=True`` (extension)
    treats NULLs as 0 via ``coalesce``.
    """
    cs = to_cols(cols)
    if ignore_nulls:
        cs = [F.coalesce(c, F.lit(0)) for c in cs]
    return reduce(lambda a, b: a + b, cs, F.lit(0))


def array_contains_column(col: ColumnOrName, array_col: ColumnOrName) -> Column:
    """Membership of a column *value* in an array *column*.

    Parity: ``kolang/column_functions.py:530-559``, including the NULL
    semantics of the intersect formulation: a NULL element or NULL array
    yields ``false``/NULL-safe behavior identical to the reference
    (``array_contains`` would return NULL for a NULL element instead).
    """
    c = to_col(col)
    return F.size(F.array_intersect(to_col(array_col), F.array(c))) >= 1


def is_null_or_in(col: ColumnOrName, *values) -> Column:
    """Predicate: ``col IS NULL OR col IN (values...)``.

    Parity: ``KolangColumn.isNullOrIn`` (``kolang/column.py:43-52``),
    re-expressed as a free function (no Column subclassing, SURVEY §1.4).
    """
    c = to_col(col)
    return c.isNull() | c.isin(*values)
