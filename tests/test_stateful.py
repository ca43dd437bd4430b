"""Custom stateful operator (applyInPandasWithState): the time-decayed
EWMA fold, driven as a real stream — state must persist across
micro-batches and match the sequential reference fold."""

import datetime as dt
import uuid

import pyspark.sql.functions as F
import pytest

from kolang_spark.streaming.stateful import ewma_batch_reference, stateful_ewma


def _events():
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    # two keys, irregular gaps spanning several half-lives
    ev = []
    for k, minutes in [
        (1, [0, 3, 5, 40, 41, 90]),
        (2, [10, 12, 100]),
    ]:
        for i, m in enumerate(minutes):
            ev.append((k, base + dt.timedelta(minutes=m), float(10 + i)))
    return ev


def _run_stream(spark, tmp_path, files):
    """files: list of row-lists → one parquet file each → one
    micro-batch each (maxFilesPerTrigger=1), in write order."""
    src = str(tmp_path / "ewma_src")
    schema = "user_id long, ts timestamp, value double"
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = stateful_ewma(stream, half_life_s=600.0)
    sink = f"ewma_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(sink)


def test_stream_matches_sequential_reference_across_batches(
    spark, tmp_path
):
    ev = sorted(_events(), key=lambda r: r[1])
    # split time-ordered events into 3 files → 3 micro-batches, so the
    # fold must survive state round-trips through the state store
    files = [ev[:4], ev[4:7], ev[7:]]
    table = _run_stream(spark, tmp_path, files)

    # update mode: several rows per key (one per batch) — final state =
    # the row with the largest n_events
    final = {
        r["user_id"]: (r["ewma"], r["n_events"])
        for r in table.orderBy("n_events").collect()
    }
    for k in (1, 2):
        rows = sorted(
            [(t, v) for kk, t, v in _events() if kk == k], key=lambda r: r[0]
        )
        expect = ewma_batch_reference(rows, half_life_s=600.0)
        got, n = final[k]
        assert n == len(rows)
        assert got == pytest.approx(expect, rel=1e-12), f"key {k}"


def test_intermediate_state_emitted_each_batch(spark, tmp_path):
    ev = sorted(_events(), key=lambda r: r[1])
    table = _run_stream(spark, tmp_path, [ev[:5], ev[5:]])
    per_key = {
        r["user_id"]: r["cnt"]
        for r in table.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    # key 1 appears in both batches, so it emits twice
    assert per_key[1] == 2


def test_decay_halves_at_half_life(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [(base, 8.0), (base + dt.timedelta(seconds=600), 0.0)]
    # one half-life later, a zero-value event leaves exactly half
    assert ewma_batch_reference(rows, half_life_s=600.0) == pytest.approx(4.0)


def test_closed_form_matches_streaming_fold(spark, tmp_path):
    """ewma_batch (native SQL closed form) == stateful_ewma's final
    state after replaying the same events as a real multi-batch
    stream — the batch surface the driver's oracle checks."""
    from kolang_spark.streaming import ewma_batch

    ev = sorted(_events(), key=lambda r: r[1])
    table = _run_stream(spark, tmp_path, [ev[:4], ev[4:7], ev[7:]])
    stream_final = {
        r["user_id"]: (r["ewma"], r["n_events"])
        for r in table.orderBy("n_events").collect()
    }

    df = spark.createDataFrame(ev, "user_id long, ts timestamp, value double")
    batch = {
        r["user_id"]: (r["ewma"], r["n_events"])
        for r in ewma_batch(df, half_life_s=600.0).collect()
    }
    assert set(batch) == set(stream_final)
    for k in batch:
        assert batch[k][1] == stream_final[k][1]
        assert batch[k][0] == pytest.approx(stream_final[k][0], rel=1e-9), f"key {k}"


def test_ewma_batch_single_shuffle(spark):
    """The window's hash partitioning must be reused by the groupBy —
    exactly one Exchange in the plan."""
    from kolang_spark.streaming import ewma_batch

    df = spark.createDataFrame(_events(), "user_id long, ts timestamp, value double")
    plan = ewma_batch(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_dedup_stream_order_col_keeps_min(spark):
    from kolang_spark.streaming import dedup_stream

    rows = [(3, "Same  Text"), (1, "same text"), (2, "other"), (9, "SAME TEXT ")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = sorted(r.doc_id for r in dedup_stream(df, order_col="doc_id").collect())
    # ids 1/3/9 canonicalize identically -> min id 1 survives; 2 unique
    assert out == [1, 2]


def test_dedup_stream_rejects_watermark_plus_order_col(spark):
    """order_col is batch-only; silently ignoring it under a watermark
    would hand back arbitrary-row dedup while the caller believes they
    requested deterministic min-order_col semantics."""
    from kolang_spark.streaming import dedup_stream

    df = spark.createDataFrame(
        [(1, "t")], "doc_id int, text string"
    ).withColumn("ts", F.current_timestamp())
    with pytest.raises(ValueError, match="batch-only"):
        dedup_stream(df, ts_col="ts", watermark="1 hour", order_col="doc_id")
