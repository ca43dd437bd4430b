"""Declarative data-contract validation (expectation checks).

The pre-flight a pipeline runs before trusting a new drop of data:
declare the invariants (non-null keys, uniqueness, value ranges,
accepted categories, regex shape) and get one verdict row per check.
The public shape follows the dbt-tests / Great Expectations idiom;
no counterpart exists in the reference.

Scale shape: EVERY check — including uniqueness, via exact
count(distinct struct(cols)) — folds into ONE aggregation pass over
the table; the long-form report is a ``stack`` over that single wide
row (driver-side metadata work). Adding a check adds an accumulator,
never a pass. All outputs are exact integer counts, so an SQL oracle
reproduces the report verbatim.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "not_null",
    "unique",
    "in_range",
    "accepted_values",
    "matches_regex",
    "validate",
]

# a check is (name, target, kind, violation_condition_or_cols): kept as
# plain tuples so checks serialize/compose trivially
_ROW = "row"
_UNIQUE = "unique"


def not_null(col: str) -> Tuple[str, str, str, Column]:
    """Violated by rows where ``col`` IS NULL."""
    return ("not_null", col, _ROW, F.col(col).isNull())


def unique(cols: Sequence[str]) -> Tuple[str, str, str, list]:
    """Violated by every surplus row of a duplicated key: violations =
    rows(all cols non-NULL) − distinct keys. Rows with a NULL component
    are skipped (ANSI uniqueness ignores NULLs) — pair with
    ``not_null`` when NULL keys are themselves illegal."""
    cs = list(cols)
    if not cs:
        raise ValueError("unique needs at least one column")
    return ("unique", ",".join(cs), _UNIQUE, cs)


def in_range(col: str, lo, hi) -> Tuple[str, str, str, Column]:
    """Violated by non-NULL values outside [lo, hi] (NULLs pass — use
    ``not_null`` to forbid them)."""
    c = F.col(col)
    return (
        f"in_range[{lo},{hi}]",
        col,
        _ROW,
        c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))),
    )


def accepted_values(col: str, values: Sequence) -> Tuple[str, str, str, Column]:
    """Violated by non-NULL values outside the accepted set."""
    c = F.col(col)
    return (
        "accepted_values",
        col,
        _ROW,
        c.isNotNull() & ~c.isin(list(values)),
    )


def matches_regex(col: str, pattern: str) -> Tuple[str, str, str, Column]:
    """Violated by non-NULL strings not fully matching ``pattern``
    (anchored semantics via rlike on the caller's pattern — anchor it
    yourself if you mean the whole string)."""
    c = F.col(col)
    return (
        "matches_regex",
        col,
        _ROW,
        c.isNotNull() & ~c.cast("string").rlike(pattern),
    )


def validate(df: DataFrame, checks: Sequence[tuple]) -> DataFrame:
    """Run ``checks`` (built with this module's constructors) over
    ``df`` in one aggregation pass → one row per check:
    ``(check, target, n_rows, n_violations, passed)``.

    ``n_rows`` is the table's row count (shared across checks);
    ``passed`` = zero violations. The report is deterministic and
    engine-replayable — every number is an exact count.
    """
    if not checks:
        raise ValueError("no checks given")
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for i, (name, target, kind, payload) in enumerate(checks):
        if kind == _ROW:
            aggs.append(F.count(F.when(payload, 1)).alias(f"__v_{i}__"))
        elif kind == _UNIQUE:
            all_set = None
            for c in payload:
                nn = F.col(c).isNotNull()
                all_set = nn if all_set is None else (all_set & nn)
            aggs.append(
                (
                    F.count(F.when(all_set, 1))
                    - F.count_distinct(
                        *[F.when(all_set, F.col(c)) for c in payload]
                    )
                ).alias(f"__v_{i}__")
            )
        else:  # pragma: no cover - constructors only emit known kinds
            raise ValueError(f"unknown check kind {kind!r}")
    one = df.agg(*aggs)

    stack_args = []
    for i, (name, target, _kind, _p) in enumerate(checks):
        if "'" in name or "'" in target:
            raise ValueError("check names/targets must not contain quotes")
        stack_args += [f"'{name}'", f"'{target}'", f"`__v_{i}__`"]
    return one.select(
        F.col("__n__").alias("n_rows"),
        F.expr(
            f"stack({len(checks)}, {', '.join(stack_args)}) AS "
            "(check, target, n_violations)"
        ),
    ).select(
        "check",
        "target",
        "n_rows",
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )
