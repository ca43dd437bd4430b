"""Top-k per group and deterministic sampling.

Sorts/limits are otherwise delegated to Spark (SURVEY §2.3); these two
are the composite shapes a data pipeline keeps rebuilding, written so
the physical plan is the good one.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kolang_spark.utils import ColumnOrName, to_col, to_col_list

__all__ = ["top_k_per_group", "deterministic_sample"]


def top_k_per_group(
    df: DataFrame,
    partition_by: Union[ColumnOrName, Sequence[ColumnOrName]],
    order_by: Union[ColumnOrName, Sequence[ColumnOrName]],
    k: int,
    ascending: bool = False,
    rank_col: Optional[str] = "rank",
) -> DataFrame:
    """First ``k`` rows per group by ``order_by`` (default: largest
    first). Ties break deterministically by the full ``order_by`` list —
    append a unique id as the last order column for total determinism.

    Plan note: ``row_number() ≤ k`` is recognized by Spark ≥3.5's
    ``WindowGroupLimit`` rule — each shuffle partition keeps only its
    local top-k before the final per-group pass, so the operator ships
    k·groups rows, not the whole table, through the last stage.
    """
    orders = [
        c.asc() if ascending else c.desc() for c in to_col_list(order_by)
    ]
    w = Window.partitionBy(*to_col_list(partition_by)).orderBy(*orders)
    ranked = df.withColumn("__ks_rank__", F.row_number().over(w)).where(
        F.col("__ks_rank__") <= k
    )
    if rank_col:
        return ranked.withColumnRenamed("__ks_rank__", rank_col)
    return ranked.drop("__ks_rank__")


def deterministic_sample(
    df: DataFrame,
    key: ColumnOrName,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Stable ``fraction``-sample keyed on ``key``: the same key is
    always in or always out — across runs, partitionings, and engines
    (md5-based bucket; DuckDB computes the identical value).

    ``df.sample()`` re-draws every run and shifts with partitioning;
    hash-gating is the reproducible-pipeline alternative, and it
    composes: the same (key, salt) subset is selected from any table
    sharing the key, so sampled joins stay consistent. ``salt`` yields
    independent samples from the same key space.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    c = to_col(key).cast("string")
    # 60-bit md5 bucket (engine-portable; see llm.textstats._token_hash60)
    h = F.conv(
        F.substring(F.md5(F.encode(F.concat(c, F.lit(salt)), "UTF-8")), 18, 15),
        16,
        10,
    ).cast("long")
    threshold = int(fraction * (1 << 60))
    return df.where(h < F.lit(threshold))
