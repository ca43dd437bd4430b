"""WARC record parsing (sources/warc.py): record walk, HTTP unwrap,
poison/truncation contracts — pure-function tests plus the Spark
Arrow-stage round trip."""

import pytest
from pyspark.sql import functions as F

from kolang_spark.sources.warc import parse_warc, parse_warc_bytes


def _rec(wtype, payload, uri=None, date=None, extra=b""):
    h = b"WARC/1.0\r\nWARC-Type: " + wtype + b"\r\n"
    if uri:
        h += b"WARC-Target-URI: " + uri + b"\r\n"
    if date:
        h += b"WARC-Date: " + date + b"\r\n"
    h += extra
    h += b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
    return h + payload + b"\r\n\r\n"


def _http(body, status=b"200 OK", ctype=b"text/html; charset=utf-8"):
    return (
        b"HTTP/1.1 " + status + b"\r\nContent-Type: " + ctype
        + b"\r\nServer: x\r\n\r\n" + body
    )


def test_parse_warc_bytes_full_file():
    body = "café content".encode()
    blob = (
        _rec(b"warcinfo", b"software: test\r\n")
        + _rec(b"response", _http(body),
               uri=b"https://ex.com/a", date=b"2024-01-02T03:04:05Z")
        + _rec(b"request", b"GET /a HTTP/1.1\r\n", uri=b"https://ex.com/a")
    )
    recs = parse_warc_bytes(blob)
    assert [r[0] for r in recs] == [0, 1, 2]
    assert [r[1] for r in recs] == ["warcinfo", "response", "request"]
    wi, resp, req = recs
    assert wi[2] is None and wi[4] is None and wi[6] == b"software: test\r\n"
    assert resp[2] == "https://ex.com/a"
    assert resp[3] == "2024-01-02T03:04:05Z"
    assert resp[4] == 200
    assert resp[5] == "text/html; charset=utf-8"
    assert resp[6] == body
    # request records keep the raw payload, no HTTP unwrap
    assert req[4] is None and req[6].startswith(b"GET /a")


def test_parse_warc_bytes_poison_and_truncation():
    assert parse_warc_bytes(b"") == []
    assert parse_warc_bytes(b"not a warc at all") == []
    good = _rec(b"response", _http(b"ok"), uri=b"u")
    # truncated second record: first survives
    blob = good + _rec(b"response", _http(b"lost"), uri=b"v")[:-20]
    recs = parse_warc_bytes(blob)
    assert len(recs) == 2 or len(recs) == 1  # second may or may not fit
    assert recs[0][6] == b"ok"
    # bad content-length ends the walk cleanly
    bad = b"WARC/1.0\r\nWARC-Type: x\r\nContent-Length: nope\r\n\r\n"
    assert parse_warc_bytes(bad) == []
    # missing trailing separator on the final record is tolerated
    assert len(parse_warc_bytes(good[:-4])) == 1


def test_parse_warc_bytes_status_variants():
    r404 = _rec(b"response", _http(b"gone", status=b"404 Not Found"),
                uri=b"https://ex.com/x")
    recs = parse_warc_bytes(r404)
    assert recs[0][4] == 404
    # non-HTTP response payload: raw body, NULL status
    raw = _rec(b"response", b"not http bytes", uri=b"u")
    recs = parse_warc_bytes(raw)
    assert recs[0][4] is None and recs[0][6] == b"not http bytes"


def test_parse_warc_spark_stage(spark):
    b1 = _rec(b"response", _http(b"alpha"), uri=b"https://a/1",
              date=b"2024-01-01T00:00:00Z")
    b2 = (_rec(b"warcinfo", b"x: y\r\n")
          + _rec(b"response", _http(b"beta", status=b"301 Moved"),
                 uri=b"https://b/2"))
    rows = [(1, bytearray(b1)), (2, bytearray(b2)), (3, bytearray(b"junk"))]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = sorted(
        ((r.doc_id, r.record_idx, r.warc_type, r.target_uri,
          r.http_status, bytes(r.body) if r.body is not None else None)
         for r in parse_warc(df).collect())
    )
    assert out == [
        (1, 0, "response", "https://a/1", 200, b"alpha"),
        (2, 0, "warcinfo", None, None, b"x: y\r\n"),
        (2, 1, "response", "https://b/2", 301, b"beta"),
    ]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import examples


@given(
    bodies=st.lists(
        st.binary(min_size=0, max_size=60),
        min_size=1,
        max_size=8,
    ),
    plant=st.booleans(),
)
@settings(
    max_examples=examples(25),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_parse_warc_bytes_adversarial_bodies(bodies, plant):
    """The walk is driven by Content-Length, never by scanning for
    markers — so bodies containing 'WARC/1.0', header-block
    terminators, or record separators must neither split, hide, nor
    corrupt records."""
    if plant:
        bodies = [
            b"WARC/1.0\r\nWARC-Type: fake\r\n\r\n" + bodies[0],
            *bodies[1:],
            b"x\r\n\r\nWARC/1.0\r\n\r\n",
        ]
    blob = b"".join(
        _rec(b"resource", body, uri=b"u%d" % i)
        for i, body in enumerate(bodies)
    )
    recs = parse_warc_bytes(blob)
    assert len(recs) == len(bodies)
    for i, (rec, body) in enumerate(zip(recs, bodies)):
        assert rec[0] == i
        assert rec[1] == "resource"
        assert rec[2] == "u%d" % i
        assert rec[6] == body


# ---------------------------------------------------------------- gzip


def _gz(b: bytes) -> bytes:
    import zlib

    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    return co.compress(b) + co.flush()


def test_gunzip_members_roundtrip():
    from kolang_spark.sources.warc import gunzip_members

    parts = [b"alpha", b"", b"beta" * 100, bytes(range(256))]
    assert gunzip_members(b"".join(_gz(p) for p in parts)) == b"".join(parts)
    assert gunzip_members(b"") == b""
    assert gunzip_members(b"not gzip") == b""


def test_gunzip_members_truncated_and_corrupt():
    from kolang_spark.sources.warc import gunzip_members

    good, tail = _gz(b"complete member"), _gz(b"never seen")
    # truncated second member: everything before it survives
    assert gunzip_members(good + tail[:-5]) == b"complete member"
    # corrupt second member header/stream
    assert gunzip_members(good + b"\x1f\x8b\xff\xffgarbage") == b"complete member"
    # garbage (non-gzip) after a valid member ends the walk cleanly
    assert gunzip_members(good + b"WARC/1.0 plain tail") == b"complete member"


def test_parse_warc_bytes_gzip_members():
    """Per-record gzip members — the real .warc.gz Common Crawl
    layout — must parse identically to the uncompressed file."""
    body = "gzip café body".encode()
    recs_raw = [
        _rec(b"warcinfo", b"software: test\r\n"),
        _rec(b"response", _http(body),
             uri=b"https://ex.com/gz", date=b"2024-02-03T04:05:06Z"),
        _rec(b"resource", b"plain payload", uri=b"https://ex.com/r"),
    ]
    gz_blob = b"".join(_gz(r) for r in recs_raw)
    assert gz_blob.startswith(b"\x1f\x8b")
    got = parse_warc_bytes(gz_blob)
    assert got == parse_warc_bytes(b"".join(recs_raw))
    assert len(got) == 3 and got[1][4] == 200 and got[1][6] == body


def test_parse_warc_bytes_gzip_single_member_whole_file():
    """A whole-file single-member gzip (some tools write this) also
    parses: one member containing every record."""
    recs_raw = [_rec(b"resource", b"a"), _rec(b"resource", b"bb")]
    got = parse_warc_bytes(_gz(b"".join(recs_raw)))
    assert [r[6] for r in got] == [b"a", b"bb"]


def test_parse_warc_bytes_gzip_truncated_member_keeps_prefix():
    recs_raw = [
        _rec(b"resource", b"first", uri=b"u0"),
        _rec(b"resource", b"second", uri=b"u1"),
    ]
    blob = _gz(recs_raw[0]) + _gz(recs_raw[1])[:-6]
    got = parse_warc_bytes(blob)
    assert len(got) == 1 and got[0][6] == b"first"


@given(
    bodies=st.lists(st.binary(min_size=0, max_size=40), min_size=1, max_size=6),
    cut=st.integers(min_value=0, max_value=30),
)
@settings(
    max_examples=examples(25),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_parse_warc_bytes_gzip_property(bodies, cut):
    """Gzip-member parse == uncompressed parse, and any truncation of
    the member train yields a clean prefix of the records."""
    recs_raw = [
        _rec(b"resource", body, uri=b"u%d" % i)
        for i, body in enumerate(bodies)
    ]
    gz_blob = b"".join(_gz(r) for r in recs_raw)
    assert parse_warc_bytes(gz_blob) == parse_warc_bytes(b"".join(recs_raw))
    truncated = parse_warc_bytes(gz_blob[: max(2, len(gz_blob) - cut)])
    full = parse_warc_bytes(b"".join(recs_raw))
    assert truncated == full[: len(truncated)]
