"""Curation funnel + streaming dedup."""

import uuid

import pytest

import pyspark.sql.functions as F

from kolang_spark.llm import curate, curate_flags
from kolang_spark.streaming import dedup_stream

GOOD = (
    "The quick brown fox jumps over the lazy dog and it was a fine day "
    "for all of the animals in the field as they played together happily."
)


def test_curate_flags_stages(spark):
    rows = [
        (1, GOOD),                      # passes everything
        (2, GOOD),                      # exact duplicate of 1 → dropped
        (3, "x" * 10),                  # too short → quality fail
        (4, "der die das und ist nicht mit ein eine zu " * 5),  # German
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in curate_flags(df).collect()}
    assert got[1]["kept"] and got[1]["quality_ok"] and got[1]["lang_ok"]
    assert not got[2]["kept"]           # duplicate loses to min id
    assert got[2]["quality_ok"]         # ...but passed the gates
    assert not got[3]["quality_ok"] and not got[3]["kept"]
    assert got[4]["lang_pred"] == "de" and not got[4]["lang_ok"]


def test_curate_failing_duplicate_does_not_block_passing_one(spark):
    # doc 1 canonically equals doc 2 (whitespace collapses in the
    # fingerprint) but its raw form blows the 100k-char quality gate —
    # doc 2 must be kept even though the failing doc 1 has the lower id
    bloated = GOOD.replace(" ", " " * 5000)
    df = spark.createDataFrame(
        [(1, bloated), (2, GOOD), (3, GOOD)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["kept"] for r in curate_flags(df).collect()}
    assert got == {1: False, 2: True, 3: False}


def test_curate_returns_filtered_corpus(spark):
    df = spark.createDataFrame(
        [(1, GOOD), (2, GOOD), (3, "zzz")], "doc_id long, text string"
    )
    out = curate(df)
    assert [r["doc_id"] for r in out.collect()] == [1]
    assert out.columns == df.columns


def test_dedup_stream_batch_semantics(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "A  b   C"), (3, "other")],
        "doc_id long, text string",
    )
    out = dedup_stream(df)
    # canonical form collapses 1 and 2; exactly one survives
    assert out.count() == 2


def test_dedup_stream_real_stream(spark, sf_dir, tmp_path):
    from kolang_spark.sources.io import read_table

    dc = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.current_timestamp().alias("ts")
    )
    src = str(tmp_path / "dd_src")
    dc.write.parquet(src)

    stream = spark.readStream.schema(dc.schema).parquet(src)
    deduped = dedup_stream(stream, ts_col="ts", watermark="1 hour")
    sink = f"dd_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_stream = spark.table(sink).count()
    n_batch = dedup_stream(dc.drop("ts")).count()
    assert n_stream == n_batch


def test_remove_boilerplate_lines(spark):
    """Lines recurring in > min_df docs are stripped (trim-matched,
    original bytes and order kept); rarer shared lines stay; audit
    count is exact; empty hot set is a no-op."""
    from kolang_spark.llm import remove_boilerplate_lines

    footer = "FOOTER: subscribe to our newsletter"
    rows = []
    for i in range(6):
        body = f"unique body line {i}"
        pair = "shared by two docs" if i < 2 else f"filler {i}"
        rows.append((i, f"{body}\n{pair}\n  {footer}  "))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = {
        r.doc_id: (r.text, r.n_lines_removed)
        for r in remove_boilerplate_lines(df, min_df=5).collect()
    }
    for i in range(6):
        body = f"unique body line {i}"
        pair = "shared by two docs" if i < 2 else f"filler {i}"
        assert out[i][0] == f"{body}\n{pair}", out[i]
        assert out[i][1] == 1
    # min_df=1: the two-doc shared line goes too
    out2 = {
        r.doc_id: r.n_lines_removed
        for r in remove_boilerplate_lines(df, min_df=1).collect()
    }
    assert out2[0] == 2 and out2[5] == 1
    # high threshold: nothing hot, text unchanged
    out3 = remove_boilerplate_lines(df, min_df=50).collect()
    assert all(r.n_lines_removed == 0 for r in out3)
    assert {r.text for r in out3} == {t for _, t in rows}
    with pytest.raises(ValueError):
        remove_boilerplate_lines(df, min_df=0)
