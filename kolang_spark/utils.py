"""Shared helpers: str/Column coercion and list normalization.

Parity note: the reference coerces through ``kolang.column_functions.col``
(``/root/reference/kolang/column_functions.py:12-24``), which returns a
*generator* for multi-arg calls and re-classes results as ``KolangColumn``
(broken on PySpark 4 — SURVEY.md §1.4). Here coercion is a plain helper
returning vanilla ``Column`` objects / tuples.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def to_col(c: ColumnOrName) -> Column:
    """Coerce a column name into a :class:`Column`; pass Columns through."""
    if isinstance(c, str):
        return F.col(c)
    if isinstance(c, Column):
        return c
    raise TypeError(f"expected str or Column, got {type(c).__name__}")


def to_cols(cols: Iterable[ColumnOrName]) -> List[Column]:
    """Coerce an iterable of names/Columns into a list of Columns."""
    return [to_col(c) for c in cols]


def to_col_list(
    cols: Union[ColumnOrName, Sequence[ColumnOrName], None],
) -> List[Column]:
    """Normalize a ``partition_by``-style argument (None | single | list)."""
    if cols is None:
        return []
    if isinstance(cols, (str, Column)):
        return [to_col(cols)]
    return to_cols(cols)


def name_of(c: ColumnOrName, fallback: str = "value") -> str:
    """Best-effort name for aliasing: the string itself, else a fallback."""
    return c if isinstance(c, str) else fallback
