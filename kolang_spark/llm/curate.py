"""End-to-end corpus curation: quality gate → language gate → exact
dedup, composed into one pass.

The standard pretraining-data funnel as a single DataFrame transform:
all three stages are pure Column algebra over one scan (two total
shuffles: the fingerprint window and whatever the caller does next), so
the full funnel runs at scan speed at 100 TB. Every stage's verdict is
kept as an audit column — a curation you can't explain per-document is
a curation you can't debug.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kolang_spark.llm.textstats import doc_fingerprint, lang_id, quality_metrics

__all__ = ["curate_flags", "curate"]


def curate_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: int = 60,
    langs: Sequence[str] = ("en",),
) -> DataFrame:
    """One row per input document with per-stage verdicts:

    ``quality_ok`` (composite score ≥ ``min_quality``), ``lang_ok``
    (predicted language ∈ ``langs``), and ``kept`` — passes both gates
    AND is the minimum-id representative of its exact-duplicate cluster
    *among passing documents* (a failing duplicate never blocks a
    passing one).
    """
    qs = quality_metrics(F.col(text_col))["quality_score"]
    staged = df.select(
        F.col(id_col),
        qs.alias("quality_score"),
        lang_id(F.col(text_col)).alias("lang_pred"),
        doc_fingerprint(text_col).alias("fingerprint"),
    )
    quality_ok = F.col("quality_score") >= min_quality
    lang_ok = F.col("lang_pred").isin(*langs)
    passes = quality_ok & lang_ok
    w = Window.partitionBy("fingerprint")
    keeper = F.min(F.when(passes, F.col(id_col))).over(w)
    return staged.select(
        id_col,
        "quality_score",
        "lang_pred",
        quality_ok.alias("quality_ok"),
        lang_ok.alias("lang_ok"),
        (passes & (F.col(id_col) == keeper)).alias("kept"),
    )


def curate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: int = 60,
    langs: Sequence[str] = ("en",),
) -> DataFrame:
    """The curated corpus itself: original columns, only ``kept`` rows."""
    flags = curate_flags(df, text_col, id_col, min_quality, langs)
    return df.join(
        flags.where("kept").select(id_col), id_col, "left_semi"
    )
