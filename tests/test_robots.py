"""robots.txt parsing + permission checking
(`kolang_spark/sources/robots.py`): RFC-9309-subset semantics against
hand-verified cases and an exact Python model of the matching rule."""

import re

import pytest
from hypothesis import given, settings, strategies as st

from tests.conftest import examples

from kolang_spark.sources.robots import parse_robots, robots_allowed

ROBOTS = """# example file
User-agent: *
Disallow: /private
Allow: /private/ok
Disallow: /w*z
Disallow: /tmp$
Disallow:

User-agent: evilbot
User-agent: badbot
Disallow: /

User-Agent: GoodBot
disallow: /good-only
"""


@pytest.fixture(scope="module")
def rules(spark):
    files = spark.createDataFrame(
        [("ex.com", ROBOTS), ("empty.com", ""), ("cmt.com", "# only\n"),
         ("null.com", None)],
        "domain string, robots_txt string",
    )
    return parse_robots(files).localCheckpoint(eager=True)


def test_parse_groups_agents_and_directive_case(rules):
    rows = {(r["domain"], r["agent"], r["allow"], r["path"])
            for r in rules.collect()}
    assert ("ex.com", "*", False, "/private") in rows
    assert ("ex.com", "*", True, "/private/ok") in rows
    # consecutive UA lines share the group's rules
    assert ("ex.com", "evilbot", False, "/") in rows
    assert ("ex.com", "badbot", False, "/") in rows
    # case-insensitive directives, lower-cased agents
    assert ("ex.com", "goodbot", False, "/good-only") in rows
    # empty Disallow emits no rule; empty/comment/null files emit none
    assert not [t for t in rows if t[3] == ""]
    assert not [t for t in rows if t[0] != "ex.com"]


def _check(spark, rules, urls, agent="*"):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "id long, url string"
    )
    out = robots_allowed(df, rules, agent=agent).orderBy("id").collect()
    return [(r["crawl_allowed"], r["matched_rule"]) for r in out]


def test_matching_precedence_wildcards_and_anchor(spark, rules):
    got = _check(spark, rules, [
        "http://ex.com/private/x",     # prefix block
        "http://ex.com/private/ok/y",  # longer Allow overrides
        "http://ex.com/public",        # no match
        "http://ex.com/tmp",           # $ anchor hits
        "http://ex.com/tmp2",          # $ anchor must NOT match
        "http://ex.com/wheeze",        # /w*z wildcard ('heeze' spans *)
        "http://ex.com/w",             # wildcard needs the z
        "http://EX.com:8080/private",  # host case + port stripped
        "http://ex.com",               # bare root → '/'
        "http://nowhere.com/x",        # unknown domain → allowed
    ])
    assert got == [
        (False, "/private"), (True, "/private/ok"), (True, None),
        (False, "/tmp$"), (True, None), (False, "/w*z"), (True, None),
        (False, "/private"), (True, None), (True, None),
    ]


def test_agent_resolution_exact_beats_star(spark, rules):
    urls = ["http://ex.com/anything", "http://ex.com/good-only/sub"]
    # evilbot has its own group: blocked everywhere, '*' rules ignored
    assert _check(spark, rules, urls, agent="EvilBot") == [
        (False, "/"), (False, "/"),
    ]
    # goodbot's group only blocks /good-only
    assert _check(spark, rules, urls, agent="goodbot") == [
        (True, None), (False, "/good-only"),
    ]
    # unknown agent falls back to '*'
    assert _check(spark, rules, ["http://ex.com/private/z"],
                  agent="newbot") == [(False, "/private")]


def test_like_metacharacters_in_rule_paths(spark):
    files = spark.createDataFrame(
        [("m.com", "User-agent: *\nDisallow: /100%_done\n")],
        "domain string, robots_txt string",
    )
    r = parse_robots(files)
    got = _check(spark, r, [
        "http://m.com/100%_done/x",   # literal % and _ must match
        "http://m.com/100X_done/x",   # % is NOT a wildcard here
        "http://m.com/100%Adone/x",   # _ is NOT a wildcard here
    ])
    assert got == [(False, "/100%_done"), (True, None), (True, None)]


def _match_model(rules, path, agent="*"):
    """Documented matching rule, verbatim: applicable agent group,
    longest pattern wins, Allow beats Disallow on ties, no match →
    allowed."""
    agents = {a for a, _, _ in rules}
    want = agent if agent in agents else "*"
    best = None
    for a, allow, pat in rules:
        if a != want:
            continue
        anchored = pat.endswith("$")
        body = pat[:-1] if anchored else pat
        rx = "^" + ".*".join(re.escape(p) for p in body.split("*"))
        rx += "$" if anchored else ""
        if re.match(rx, path):
            key = (len(pat), int(allow), pat)
            if best is None or key > best[0]:
                best = (key, allow, pat)
    return (True, None) if best is None else (best[1], best[2])


@settings(max_examples=examples(10), deadline=None)
@given(
    pats=st.lists(
        st.tuples(
            st.booleans(),
            st.sampled_from(
                ["/a", "/a/b", "/a*b", "/a$", "/ab", "/a/", "/*b$", "/b"]
            ),
        ),
        min_size=1, max_size=5,
    ),
    paths=st.lists(
        st.sampled_from(["/a", "/ab", "/a/b", "/axb", "/b", "/c", "/a/"]),
        min_size=1, max_size=4,
    ),
)
def test_matching_exact_model_random(spark_rb, pats, paths):
    content = "User-agent: *\n" + "".join(
        f"{'Allow' if al else 'Disallow'}: {p}\n" for al, p in pats
    )
    files = spark_rb.createDataFrame(
        [("h.com", content)], "domain string, robots_txt string"
    )
    r = parse_robots(files)
    got = _check(spark_rb, r, [f"http://h.com{p}" for p in paths])
    model_rules = [("*", al, p) for al, p in pats]
    want = [_match_model(model_rules, p) for p in paths]
    assert got == want


@pytest.fixture(scope="module")
def spark_rb(spark):
    return spark
