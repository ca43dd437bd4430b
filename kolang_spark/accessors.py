"""Optional fluent accessor: ``kl(df).percent(...).sessionize(...)``.

The reference made chaining ergonomic by re-classing ``Column``
(``KolangColumn`` — broken on PySpark 4.x, SURVEY §1.4). This layer
gets the same ergonomics with zero monkey-patching: a thin wrapper
holding a vanilla DataFrame; every operator returns a new wrapper;
``.df`` (or any native DataFrame attribute, via delegation) drops back
to plain PySpark at any point.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame

import kolang_spark.functions.core as _core
from kolang_spark.utils import ColumnOrName

__all__ = ["kl", "KolangFrame"]


class KolangFrame:
    """Chainable wrapper around a DataFrame. Operator methods add a
    column and return a new :class:`KolangFrame`; unknown attributes
    delegate to the wrapped DataFrame (so ``.where``, ``.groupBy`` etc.
    work in-line and return plain Spark objects)."""

    def __init__(self, df: DataFrame):
        self._df = df

    @property
    def df(self) -> DataFrame:
        return self._df

    def __getattr__(self, name: str):
        return getattr(self._df, name)

    def _with(self, out: str, col: Column) -> "KolangFrame":
        return KolangFrame(self._df.withColumn(out, col))

    # ------------------------------------------------ window/agg columns

    def percent(
        self,
        col: ColumnOrName = "count",
        partition_by=None,
        r: Optional[int] = 2,
        out: str = "percent",
    ) -> "KolangFrame":
        return self._with(out, _core.percent(col, partition_by, r))

    def cumulative_sum(
        self,
        col: ColumnOrName,
        on_col: ColumnOrName,
        ascending: bool = True,
        partition_by=None,
        out: str = "cumulative_sum",
    ) -> "KolangFrame":
        return self._with(
            out, _core.cumulative_sum(col, on_col, ascending, partition_by)
        )

    def cumulative_percent(
        self,
        col: ColumnOrName,
        on_col: ColumnOrName,
        ascending: bool = True,
        partition_by=None,
        r: Optional[int] = 2,
        out: str = "cumulative_percent",
    ) -> "KolangFrame":
        return self._with(
            out, _core.cumulative_percent(col, on_col, ascending, partition_by, r)
        )

    def moving_average(
        self,
        col: ColumnOrName,
        order_col: ColumnOrName,
        period: int,
        mode: str = "center",
        r: Optional[int] = None,
        out: str = "moving_average",
    ) -> "KolangFrame":
        return self._with(out, _core.moving_average(col, order_col, period, mode, r))

    def bin(
        self,
        col: ColumnOrName,
        scale: int = 10,
        flooring: bool = True,
        out: str = "bin",
    ) -> "KolangFrame":
        return self._with(out, _core.bin(col, scale, flooring))

    # ------------------------------------------------ DataFrame operators

    def session_id(
        self,
        device_id: ColumnOrName = "device_id",
        created_at: ColumnOrName = "created_at",
        session_time: int = 30,
        out: str = "session_id",
    ) -> "KolangFrame":
        from kolang_spark.operators.sessions import session_id

        return self._with(out, session_id(device_id, created_at, session_time))

    def unpivot(
        self,
        on_columns: Sequence[str],
        in_column: str,
        value_column: str = "value",
        ignore_null: bool = True,
    ) -> "KolangFrame":
        from kolang_spark.operators.reshape import unpivot

        return KolangFrame(
            unpivot(self._df, on_columns, in_column, value_column, ignore_null)
        )

    def union_all(self, *dfs: Union[DataFrame, "KolangFrame"]) -> "KolangFrame":
        from kolang_spark.operators.unions import union_all

        plain = [d.df if isinstance(d, KolangFrame) else d for d in dfs]
        return KolangFrame(union_all(self._df, *plain))

    def top_k_per_group(self, partition_by, order_by, k: int, **kw) -> "KolangFrame":
        from kolang_spark.operators.sampling import top_k_per_group

        return KolangFrame(top_k_per_group(self._df, partition_by, order_by, k, **kw))

    def mad_outliers(self, value_col: str, by=None, **kw) -> "KolangFrame":
        from kolang_spark.operators.robust import mad_outliers

        return KolangFrame(mad_outliers(self._df, value_col, by=by, **kw))

    def equi_depth_bin(self, value_col: str, n_bins: int = 10, **kw) -> "KolangFrame":
        from kolang_spark.operators.binning import equi_depth_bin

        return KolangFrame(equi_depth_bin(self._df, value_col, n_bins, **kw))

    def resample_fill(
        self, ts_col: str, value_col: str, step: str = "1 hour", **kw
    ) -> "KolangFrame":
        from kolang_spark.operators.resample import resample_fill

        return KolangFrame(resample_fill(self._df, ts_col, value_col, step, **kw))

    def zorder_by(self, cols: Sequence[str], **kw) -> "KolangFrame":
        from kolang_spark.operators.layout import zorder_by

        return KolangFrame(zorder_by(self._df, cols, **kw))

    def with_zorder_key(self, cols: Sequence[str], **kw) -> "KolangFrame":
        from kolang_spark.operators.layout import with_zorder_key

        return KolangFrame(with_zorder_key(self._df, cols, **kw))

    def winsorize(self, value_col: str, **kw) -> "KolangFrame":
        from kolang_spark.operators.normalize import winsorize

        return KolangFrame(winsorize(self._df, value_col, **kw))

    def standardize(self, value_col: str, **kw) -> "KolangFrame":
        from kolang_spark.operators.normalize import standardize

        return KolangFrame(standardize(self._df, value_col, **kw))

    def pack_examples(self, **kw) -> "KolangFrame":
        from kolang_spark.llm.prep import pack_examples

        return KolangFrame(pack_examples(self._df, **kw))

    def pack_balanced(self, **kw) -> "KolangFrame":
        from kolang_spark.llm.prep import pack_balanced

        return KolangFrame(pack_balanced(self._df, **kw))


def kl(df: DataFrame) -> KolangFrame:
    """Enter the fluent layer: ``kl(df).percent("count").df``."""
    return KolangFrame(df)
