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

__all__ = ["curate_flags", "curate", "remove_boilerplate_lines"]


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


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 5,
    max_hot: int = 100_000,
    out_col: str | None = None,
) -> DataFrame:
    """Strip *boilerplate lines* — lines recurring across more than
    ``min_df`` documents (nav menus, footers, cookie banners): the
    C4/RefinedWeb line-level dedup rule, line order preserved.

    Plan shape (scale-first):

    1. document frequency per trimmed line — ``array_distinct`` per doc
       *before* the explode (each doc votes once), then one groupBy;
    2. the hot set is capped at ``max_hot`` lines (by df desc, line
       asc — deterministic) and collapsed to ONE map row
       (``line → true``), which rides a ``crossJoin(broadcast(...))``
       to every document: boilerplate is high-frequency by definition,
       so the hot set is small even at 100 TB (bounded by distinct
       lines with df > min_df, then capped);
    3. per-document filtering is then a pure Column ``filter`` +
       ``array_join`` — membership is an O(1) hash probe per line
       (``try_element_at`` on the broadcast map, not a linear array
       scan), original line text and order preserved with NO
       re-assembly shuffle (the explode/groupBy path would shuffle
       every line of every document a second time).

    Empty/whitespace-only lines are never boilerplate candidates: in
    any real corpus more than ``min_df`` documents contain a blank
    line, and stripping those would collapse paragraph structure
    corpus-wide — C4/RefinedWeb line dedup operates on non-empty lines.

    Matching is on ``trim(line)``; kept lines keep their original
    bytes. Adds ``n_lines_removed`` for auditability. ``out_col``
    defaults to replacing ``text_col`` in place.
    """
    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    out_col = out_col or text_col
    # explode_outer, not explode: bare explode infers+pushes a
    # size(...)>0 filter that re-evaluates the split/trim/distinct
    # chain; the `line != ''` gate below already drops outer NULLs
    lines = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(
            F.array_distinct(
                # NB: `lambda l: F.trim(l)`, not bare `F.trim` — transform
                # feeds (element, index) to two-parameter callables, and
                # trim's optional 2nd param would silently become the
                # index (trimming digit chars instead of whitespace)
                F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l))
            )
        ).alias("line"),
    )
    hot = (
        lines.where(F.col("line") != "")
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("line_df"))
        .where(F.col("line_df") > min_df)
        .orderBy(F.col("line_df").desc(), F.col("line"))
        .limit(max_hot)
    )
    hot_map = hot.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("line"), F.lit(True)))
        ).alias("__hot_map__")
    )
    arr = F.split(F.col(text_col), "\n")
    # try_element_at (not element_at): NULL on a missing key instead of
    # an ANSI MAP_KEY_DOES_NOT_EXIST error — missing means "keep"
    kept = F.filter(
        arr,
        lambda l: F.try_element_at(F.col("__hot_map__"), F.trim(l)).isNull(),
    )
    return (
        df.crossJoin(F.broadcast(hot_map))
        .withColumn("n_lines_removed", F.size(arr) - F.size(kept))
        .withColumn(out_col, F.array_join(kept, "\n"))
        .drop("__hot_map__")
    )
