"""Testdata readers: all tables load; events nanos shim works."""

from kolang_spark.sources.io import TABLE_NAMES, read_table, read_tables


def test_all_tables_load(spark, sf_dir):
    tables = read_tables(spark, sf_dir)
    assert set(tables) == set(TABLE_NAMES)
    for name, df in tables.items():
        assert df.count() > 0, name


def test_events_ts_normalized(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    types = dict(ev.dtypes)
    assert types["ts_ms"] == "bigint"
    assert types["ts"].startswith("timestamp")
    r = ev.selectExpr("min(ts_ms) as lo", "max(ts_ms) as hi").first()
    # epoch-millis plausibility (events are modern timestamps)
    assert r.lo > 1_000_000_000_000  # after 2001
    assert r.hi < 4_102_444_800_000  # before 2100


def test_embeddings_schema(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    assert dict(emb.dtypes)["embedding"] == "array<float>"
