"""JSON extraction helpers (Map/JSON category — reference has none)."""

import pyspark.sql.functions as F

from kolang_spark import json_get, json_map


def test_json_get_paths_and_cast(spark):
    df = spark.createDataFrame(
        [('{"k": 7, "tag": "x"}',), ('{"tag": "y"}',), ("not json",), (None,)],
        "props string",
    )
    rows = df.select(
        json_get("props", "$.k", cast="long").alias("k"),
        json_get("props", "$.tag").alias("tag"),
    ).collect()
    assert [r["k"] for r in rows] == [7, None, None, None]
    assert [r["tag"] for r in rows] == ["x", "y", None, None]


def test_json_map_dynamic_keys(spark):
    df = spark.createDataFrame([('{"a": "1", "b": "2"}',)], "props string")
    m = df.select(json_map("props").alias("m")).first()["m"]
    assert m == {"a": "1", "b": "2"}


def test_json_get_on_events(spark, sf_dir):
    from kolang_spark.sources.io import read_table

    ev = read_table(spark, sf_dir, "events")
    k = json_get("props", "$.k", cast="long")
    out = ev.select(k.alias("k")).where(F.col("k").isNotNull())
    assert out.count() > 0
