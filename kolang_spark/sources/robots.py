"""robots.txt parsing and URL permission checking — the crawl-etiquette
gate every web-ingestion pipeline (Common Crawl replication, refresh
crawls) runs before fetching or before attributing a fetched page.

Both operators are pure DataFrame algebra: parsing is a per-file
posexplode + window pass (robots.txt files are KB-sized, so the
per-domain window partition is bounded by construction), and the
permission check is one domain equi-join + one aggregate — no UDFs.

Semantics implemented (RFC 9309 / Google subset):

- ``#`` comments, blank lines, case-insensitive directives;
- group structure: consecutive ``User-agent`` lines share the rule
  block that follows; a ``User-agent`` line after a rule starts a new
  group;
- ``Allow`` / ``Disallow`` with ``*`` wildcards and the ``$``
  end-anchor;
- longest-pattern-wins precedence, ``Allow`` wins ties;
- agent resolution: the exact agent's groups if any exist for the
  domain, else the ``*`` groups; no applicable rule → allowed;
- an empty ``Disallow:`` value disallows nothing (the rule is simply
  not emitted).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["parse_robots", "robots_allowed"]


def parse_robots(
    df: DataFrame,
    key_col: str = "domain",
    content_col: str = "robots_txt",
) -> DataFrame:
    """Parse one robots.txt file per row into a rule table:
    ``(key_col, agent, allow, path, rule_order)`` — one row per
    (agent, rule) pair, agents lower-cased, ``rule_order`` the source
    line position (stable tiebreak/debugging).

    Plan: posexplode lines → strip comments/whitespace → directive
    extraction → group ids via a lag window ordered by line position,
    PARTITIONED BY FILE (robots.txt is KB-scale; the window never sees
    more than one file's lines) → rules join their group's user-agent
    set. Two shuffles (window, group join), both keyed on the file.
    """
    lines = df.select(
        F.col(key_col).alias("_key"),
        F.posexplode(
            F.split(F.coalesce(F.col(content_col), F.lit("")), "\n", -1)
        ).alias("_pos", "_raw"),
    )
    cleaned = F.trim(F.regexp_replace(F.col("_raw"), "#.*$", ""))
    directive = F.lower(
        F.regexp_extract(cleaned, r"^([A-Za-z-]+)\s*:", 1)
    )
    value = F.trim(F.regexp_extract(cleaned, r"^[A-Za-z-]+\s*:(.*)$", 1))
    rel = (
        lines.select(
            "_key",
            "_pos",
            directive.alias("_dir"),
            value.alias("_val"),
        )
        .where(F.col("_dir").isin("user-agent", "allow", "disallow"))
    )
    w = Window.partitionBy("_key").orderBy("_pos")
    prev = F.lag("_dir").over(w)
    new_group = (F.col("_dir") == "user-agent") & (
        F.coalesce(prev, F.lit("")) != "user-agent"
    )
    grouped = rel.withColumn(
        "_grp",
        F.sum(new_group.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    agents = (
        grouped.where(F.col("_dir") == "user-agent")
        .where(F.col("_val") != "")
        .groupBy("_key", "_grp")
        .agg(
            F.array_distinct(F.collect_list(F.lower("_val"))).alias("_ua")
        )
    )
    rules = grouped.where(
        F.col("_dir").isin("allow", "disallow") & (F.col("_val") != "")
    )
    # LEFT join from the agent groups: a group whose every rule was
    # empty ('Disallow:' = disallow nothing) or that has no rules at
    # all still EXISTS for agent resolution — it comes back as one
    # marker row with NULL path/allow/rule_order. Without the marker,
    # 'User-agent: googlebot\nDisallow:\n\nUser-agent: *\nDisallow: /'
    # would wrongly send googlebot to the '*' group's blanket ban
    # (review r8).
    return (
        agents.join(rules, ["_key", "_grp"], "left")
        .select(
            F.col("_key").alias(key_col),
            F.explode("_ua").alias("agent"),
            (F.col("_dir") == "allow").alias("allow"),
            F.col("_val").alias("path"),
            F.col("_pos").cast("long").alias("rule_order"),
        )
    )


def _like_pattern(path: Column) -> Column:
    """robots path pattern → SQL LIKE pattern: strip one trailing '$'
    end-anchor, escape LIKE metacharacters (backslash first), turn '*'
    wildcards into '%', and leave the pattern open-ended (trailing '%')
    unless anchored. '*' and '$' are not LIKE-special, so they survive
    the escaping untouched for their own rewrites."""
    anchored = path.endswith("$")
    body = F.when(
        anchored, path.substr(F.lit(1), F.length(path) - 1)
    ).otherwise(path)
    esc = F.replace(body, F.lit("\\"), F.lit("\\\\"))
    esc = F.replace(esc, F.lit("%"), F.lit("\\%"))
    esc = F.replace(esc, F.lit("_"), F.lit("\\_"))
    esc = F.replace(esc, F.lit("*"), F.lit("%"))
    return F.when(anchored, esc).otherwise(F.concat(esc, F.lit("%")))


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    agent: str = "*",
    key_col: str = "domain",
    out_col: str = "crawl_allowed",
) -> DataFrame:
    """Check every URL row against a :func:`parse_robots` rule table →
    ``urls`` plus a boolean ``out_col`` (and ``matched_rule``, the
    winning pattern or NULL).

    Precedence per RFC 9309 as deployed by major crawlers: among the
    applicable agent's rules whose pattern matches the URL path, the
    LONGEST pattern wins; on equal length ``Allow`` beats ``Disallow``;
    nothing matches (or the domain has no rules) → allowed. Agent
    resolution is per-domain: the exact ``agent``'s groups when any
    exist, else the ``*`` groups.

    Scale shape: rules collapse to one row per domain (array of rule
    structs — a domain's robots rules are bounded by file size), then
    ONE equi-join on the domain key brings each URL its own rule set,
    and the winner is picked with array higher-order functions inside
    the same Project — no explode of URL×rule pairs, no groupBy back,
    no window over URLs. The URL side shuffles once (the domain join);
    pre-partitioned-by-domain inputs skip even that.
    """
    a = agent.lower()
    r = rules.select(
        F.col(key_col).alias("_key"),
        F.lower("agent").alias("_agent"),
        F.col("allow").alias("_allow"),
        F.col("path").alias("path"),
    ).where(F.col("_agent").isin(a, "*"))
    packed = (
        r.withColumn("_pat", _like_pattern(F.col("path")))
        .groupBy("_key")
        .agg(
            F.max((F.col("_agent") == a).cast("int")).alias("_has_exact"),
            F.collect_list(
                F.struct(
                    F.col("_agent"),
                    F.col("_allow"),
                    F.col("path").alias("_path"),
                    F.col("_pat"),
                )
            ).alias("_rules"),
        )
    )
    u = F.col(url_col)
    rest = F.regexp_replace(u, r"(?i)^https?://", "")
    host = F.lower(
        F.element_at(F.split(F.split(rest, r"[/?#]").getItem(0), "@"), -1)
    )
    host = F.regexp_replace(host, r":\d+$", "")
    path = F.regexp_replace(rest, r"^[^/?#]*", "")
    # fragments are client-only (never sent to the server): strip them
    # before matching, or '$'-anchored rules would miss '/page#sec'
    # while blocking '/page' (review r8). The '?query' part stays —
    # deployed robots patterns do match into the query string.
    path = F.regexp_replace(path, "#.*$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    with_rules = urls.withColumn("_ukey", host).join(
        packed, F.col("_ukey") == F.col("_key"), "left"
    )
    want_agent = F.when(
        F.coalesce(F.col("_has_exact"), F.lit(0)) == 1, F.lit(a)
    ).otherwise(F.lit("*"))
    # NULL rule arrays (domain without robots.txt) propagate through
    # filter/transform/array_max to a NULL winner → coalesce → allowed
    applicable = F.filter(
        F.col("_rules"), lambda s: s["_agent"] == want_agent
    )
    # match with column-to-column LIKE via expr (escape char '\')
    matched = F.expr(
        "filter(_applicable, s -> _upath LIKE s._pat ESCAPE '\\\\')"
    )
    # winner: longest pattern, Allow beats Disallow on ties
    winner = F.expr(
        "array_max(transform(_matched, s -> "
        "struct(length(s._path) AS l, cast(s._allow AS int) AS a, "
        "s._path AS p, s._allow AS al)))"
    )
    return (
        with_rules.withColumn("_upath", path)
        .withColumn("_applicable", applicable)
        .withColumn("_matched", matched)
        .withColumn("_w", winner)
        .withColumn(
            out_col,
            F.coalesce(F.col("_w.al"), F.lit(True)),
        )
        .withColumn("matched_rule", F.col("_w.p"))
        .drop(
            "_key",
            "_ukey",
            "_has_exact",
            "_rules",
            "_upath",
            "_applicable",
            "_matched",
            "_w",
        )
    )
