"""HTML -> text extraction (llm/html.py): tag/block stripping, entity
decode order, link harvesting — the web-corpus ingestion front door."""

import pytest
from pyspark.sql import functions as F

from kolang_spark.llm import extract_links, html_to_text


def _one(spark, s):
    df = spark.createDataFrame([(s,)], "h string")
    return df.select(html_to_text("h").alias("t")).first().t


def test_html_to_text_strips_blocks_tags_comments(spark):
    h = (
        "<html><head><title>T</title>"
        "<style>p { color: red }</style>"
        "<SCRIPT type='x'>var a = '<div>not text</div>';</SCRIPT>"
        "<noscript><p>enable js</p></noscript></head>"
        "<body><!-- multi\nline\ncomment --><h1>Head</h1>"
        "<p>one</p><p>two</p></body></html>"
    )
    assert _one(spark, h) == "T Head one two"


def test_html_to_text_entity_decode_order(spark):
    # &amp;lt; is the LITERAL text "&lt;" — decoding &amp; last keeps it
    assert _one(spark, "a &lt;b&gt; &quot;c&quot; &#39;d&#39; &nbsp;e &amp; f &amp;lt;") \
        == 'a <b> "c" \'d\' e & f &lt;'


def test_html_to_text_plain_and_edge_inputs(spark):
    assert _one(spark, "no markup   at  all") == "no markup at all"
    assert _one(spark, "") == ""
    assert _one(spark, "<p></p>") == ""
    # unclosed script swallows to end (non-greedy needs a closer; the
    # generic tag strip still removes the opener)
    assert _one(spark, "before <script>var x=1; after") == "before var x=1; after"
    df = spark.createDataFrame([(None,)], "h string")
    assert df.select(html_to_text("h").alias("t")).first().t is None


def test_html_to_text_escape_roundtrip(spark):
    """Encoding arbitrary text into an HTML body and extracting must
    recover it (modulo whitespace collapse)."""
    raw = 'x < y & y > "z" \'w\'  \n tail'
    df = spark.createDataFrame([(raw,)], "t string")
    esc = F.col("t")
    for a, b in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        esc = F.replace(esc, F.lit(a), F.lit(b))
    html = F.concat(F.lit("<body><p>"), esc, F.lit("</p></body>"))
    got = df.select(html_to_text(html).alias("t2")).first().t2
    assert got == 'x < y & y > "z" \'w\' tail'


def test_extract_links_both_quote_styles(spark):
    h = (
        '<a href="https://a.com/1">x</a>'
        "<A HREF='https://b.com/2'>y</A>"
        '<link rel="x" href="https://c.com/3">'
        "<a name='no-href'>z</a>"
    )
    df = spark.createDataFrame([(h,)], "h string")
    links = df.select(extract_links("h").alias("l")).first().l
    # document order even across mixed quote styles (ADVICE r7): the
    # single-quoted b.com link sits BETWEEN the two double-quoted ones
    assert links == [
        "https://a.com/1", "https://b.com/2", "https://c.com/3"
    ]


def test_extract_links_document_order_interleaved(spark):
    h = (
        "<a href='https://s1.org'>a</a>"
        '<a href="https://d1.org">b</a>'
        "<a href='https://s2.org'>c</a>"
        '<a href="https://d2.org">d</a>'
    )
    df = spark.createDataFrame([(h,)], "h string")
    links = df.select(extract_links("h").alias("l")).first().l
    assert links == [
        "https://s1.org", "https://d1.org", "https://s2.org", "https://d2.org"
    ]
    # empty href and no-href pages
    df2 = spark.createDataFrame(
        [('<a href="">e</a>',), ("<p>none</p>",)], "h string"
    )
    got = [r.l for r in df2.select(extract_links("h").alias("l")).collect()]
    assert got == [[""], []]


def test_canonicalize_url_cases(spark):
    """The URL-dedup key: scheme/host case, credentials, default
    ports, www, fragments, tracking params (incl. adjacent runs and
    value-embedded lookalikes), trailing slashes; non-http passthrough;
    NULL safety."""
    from kolang_spark.llm import canonicalize_url

    cases = [
        ("HTTP://WWW.Ex.com:80/a/?utm_source=x#frag", "http://ex.com/a"),
        ("https://Ex.COM:443/Path/Sub/", "https://ex.com/Path/Sub"),
        ("https://user:pw@ex.com/x?a=1&utm_medium=m&b=2",
         "https://ex.com/x?a=1&b=2"),
        ("http://ex.com/?utm_a=1&utm_b=2", "http://ex.com"),
        ("http://ex.com/p?utm_a=1&utm_b=2&c=3", "http://ex.com/p?c=3"),
        ("http://ex.com/p?a=ref=1", "http://ex.com/p?a=ref=1"),
        ("http://ex.com/p?ref=abc&fbclid=z&gclid=q", "http://ex.com/p"),
        ("http://ex.com:8080/p", "http://ex.com:8080/p"),  # non-default port kept
        ("https://ex.com", "https://ex.com"),
        ("https://ex.com/", "https://ex.com"),
        ("ftp://ex.com/x", "ftp://ex.com/x"),  # non-http passthrough
        ("  http://A.com/B  ", "http://a.com/B"),  # path case preserved
        (None, None),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "u string")
    got = [r.c for r in df.select(canonicalize_url("u").alias("c")).collect()]
    assert got == [want for _, want in cases]
