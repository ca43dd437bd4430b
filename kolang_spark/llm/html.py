"""HTML → text extraction — the first step of every web-corpus
pipeline (Common-Crawl-style HTML shards → trainable text), as pure
Column regex algebra: no Python UDF, no external parser, pushdown and
codegen see through it.

Scope: the high-recall "content text" extraction production pipelines
run BEFORE quality filtering (C4/Gopher-style) — drop non-content
blocks (script/style/noscript), comments and tags, decode the common
entities, collapse whitespace. It is deliberately NOT a DOM parser:
malformed real-world HTML breaks strict parsers, while regex stripping
degrades gracefully; structure-aware extraction (boilerplate removal)
happens downstream on the extracted LINES
(:func:`kolang_spark.llm.curate.boilerplate_line_stats`).

Engine portability: every pattern is RE2-compatible (non-greedy,
inline flags, NO backreferences — script/style/noscript are stripped
by three separate literal-tag patterns), so the DuckDB oracle replays
the identical replace sequence.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

from kolang_spark.utils import ColumnOrName, to_col

__all__ = ["html_to_text", "extract_links", "HTML_ENTITY_TABLE"]

# decode order matters: named/numeric entities first, bare &amp; LAST —
# so the literal text "&amp;lt;" correctly becomes "&lt;", not "<"
HTML_ENTITY_TABLE: List[Tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def html_to_text(col: ColumnOrName) -> Column:
    """Extract readable text from an HTML string column.

    Pipeline (each stage one ``regexp_replace`` / ``replace``):

    1. drop ``<script>``/``<style>``/``<noscript>`` blocks including
       their content (non-greedy, case-insensitive, dotall; one
       pattern per tag — no backreferences, so RE2 engines replay it);
    2. drop ``<!-- comments -->``;
    3. every remaining tag → one space (text in adjacent elements
       stays separated);
    4. decode the common entities (``&amp;`` last — see
       ``HTML_ENTITY_TABLE``);
    5. collapse whitespace runs to single spaces and trim.

    NULL in → NULL out. Plain text without markup passes through
    (modulo whitespace collapse) — safe to run on mixed corpora.
    """
    c = to_col(col)
    for tag in ("script", "style", "noscript"):
        c = F.regexp_replace(
            c, f"(?is)<{tag}\\b[^>]*>.*?</{tag}\\s*>", " "
        )
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in HTML_ENTITY_TABLE:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def extract_links(col: ColumnOrName) -> Column:
    """All ``href`` targets of a page as ``array<string>`` (both quote
    styles, case-insensitive attribute) — feeds the URL/domain stats
    and crawl-frontier dedup chains. Order = document order even on
    pages mixing quote styles: ONE alternation pattern scans the page
    left to right (the old two-pass concat grouped all double-quoted
    hrefs before all single-quoted ones — ADVICE r7), then the
    surrounding quotes are stripped per element. No normalization
    (resolve/relativize downstream where the base URL is known)."""
    c = to_col(col)
    quoted = F.regexp_extract_all(
        c, F.lit(r"""(?i)href\s*=\s*("[^"]*"|'[^']*')"""), F.lit(1)
    )
    return F.transform(quoted, lambda s: s.substr(F.lit(2), F.length(s) - 2))
