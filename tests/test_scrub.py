"""PII scrubbing + URL/domain extraction: golden examples, NULL safety,
engine-portable regex behavior."""

import pyspark.sql.functions as F
import pytest

from kolang_spark.llm import extract_urls, pii_counts, redact_pii, url_domains


@pytest.fixture()
def df(spark):
    rows = [
        (1, "write to john.doe+spam@example.co.uk or call +1 (415) 555-0199 now"),
        (2, "server at 10.0.255.7 failed; backup at 192.168.1.1:8080 is up"),
        (3, "see https://www.example.com/a/b?q=1 and http://user@sub.site.org:8080/x"),
        (4, "no pii here, just a version string 1.2.3 and the year 2024"),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_redact_pii_golden(spark, df):
    out = {
        r.doc_id: r.clean
        for r in df.select("doc_id", redact_pii("text").alias("clean")).collect()
    }
    assert out[1] == "write to <email> or call <phone> now"
    assert out[2] == "server at <ipv4> failed; backup at <ipv4>:8080 is up"
    # version strings / years must NOT be redacted (precision guard);
    # 1.2.3 is only three octets so the ipv4 pattern can't take it
    assert out[4] == "no pii here, just a version string 1.2.3 and the year 2024"
    assert out[5] is None


def test_pii_counts_and_kinds_subset(spark, df):
    counts = pii_counts("text")
    out = {r.doc_id: r for r in df.select("doc_id", *counts.values()).collect()}
    assert (out[1].n_email, out[1].n_phone, out[1].n_ipv4) == (1, 1, 0)
    assert out[2].n_ipv4 == 2
    assert (out[5].n_email, out[5].n_phone, out[5].n_ipv4) == (0, 0, 0)  # NULL → 0

    only_email = df.select(
        "doc_id", redact_pii("text", kinds=["email"]).alias("clean")
    ).where(F.col("doc_id") == 1).first()
    assert "<email>" in only_email.clean and "555-0199" in only_email.clean

    with pytest.raises(ValueError):
        redact_pii("text", kinds=["ssn"])


def test_extract_urls_and_domains(spark, df):
    out = {
        r.doc_id: (r.urls, r.doms)
        for r in df.select(
            "doc_id",
            extract_urls("text").alias("urls"),
            url_domains("text").alias("doms"),
        ).collect()
    }
    assert out[3][0] == [
        "https://www.example.com/a/b?q=1",
        "http://user@sub.site.org:8080/x",
    ]
    # www stripped, credentials stripped, port cut, lower-cased
    assert out[3][1] == ["example.com", "sub.site.org"]
    assert out[4][0] == [] and out[4][1] == []
    assert out[5][0] == [] and out[5][1] == []


def test_scrub_is_partition_independent(spark, df):
    a = df.select("doc_id", redact_pii("text").alias("c")).collect()
    b = df.repartition(5).select("doc_id", redact_pii("text").alias("c")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_duckdb_oracle_agreement(spark, df):
    """The exact regexes run in DuckDB (RE2) must reproduce Spark's
    (Java regex) redactions and extractions byte-for-byte — the
    engine-portability contract the driver oracle relies on."""
    import duckdb

    from kolang_spark.llm.scrub import PII_PATTERNS, URL_PATTERN

    rows = [(r.doc_id, r.text) for r in df.collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    email, ipv4, phone = (
        PII_PATTERNS["email"],
        PII_PATTERNS["ipv4"],
        PII_PATTERNS["phone"],
    )
    oracle = dict(
        con.execute(
            f"""
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '{email}', '<email>', 'g'),
                       '{ipv4}', '<ipv4>', 'g'),
                       '{phone}', '<phone>', 'g')
            FROM t
            """
        ).fetchall()
    )
    got = {
        r.doc_id: r.clean
        for r in df.select("doc_id", redact_pii("text").alias("clean")).collect()
    }
    assert got == oracle

    url_sql = URL_PATTERN.replace("'", "''")  # SQL-literal escape
    oracle_urls = dict(
        con.execute(
            f"SELECT doc_id, regexp_extract_all(coalesce(text,''), '{url_sql}') FROM t"
        ).fetchall()
    )
    got_urls = {
        r.doc_id: r.urls
        for r in df.select("doc_id", extract_urls("text").alias("urls")).collect()
    }
    assert got_urls == oracle_urls


def test_flag_blocked_terms_token_exact(spark):
    from kolang_spark.llm import flag_blocked_terms

    df = spark.createDataFrame(
        [
            (1, "please CLICK here to win"),          # phrase hit (cased)
            (2, "the classroom was classy"),           # substring traps
            (3, "spam spam and more spam"),            # 3 occurrences
            (4, "perfectly clean text"),
            (5, ""),                                   # empty doc
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: (r.n_hits, r.n_terms, r.is_blocked)
        for r in flag_blocked_terms(
            df, ["spam", "click here", "Ass"]
        ).collect()
    }
    assert out[1] == (1, 1, True)       # "click here" as adjacent words
    assert out[2] == (0, 0, False)      # "ass" must NOT hit class/classy
    assert out[3] == (3, 1, True)       # occurrences counted
    assert out[4] == (0, 0, False)
    assert out[5] == (0, 0, False)

    # DataFrame-shaped blocklist behaves identically
    tdf = spark.createDataFrame([("spam",), ("click here",)], ["term"])
    out2 = {
        r.doc_id: r.is_blocked
        for r in flag_blocked_terms(df, tdf).collect()
    }
    assert out2 == {1: True, 2: False, 3: True, 4: False, 5: False}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        flag_blocked_terms(df, ["", "   "])
