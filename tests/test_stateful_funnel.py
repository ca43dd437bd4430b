"""Streaming funnel (`streaming/stateful.py::stateful_funnel`): a real
multi-micro-batch stream must end in exactly the batch
`funnel_steps` state (stream == batch), including ties and chain
breaks."""

import uuid

import pytest
from pyspark.sql import functions as F

from kolang_spark.operators.funnel import funnel_steps
from kolang_spark.streaming.stateful import stateful_funnel

STEPS = ["view", "click", "buy"]
SCHEMA = "user_id long, ts_ms long, event_type string"


def _events():
    return [
        (1, 10, "view"), (1, 20, "click"), (1, 30, "buy"),
        (2, 10, "view"), (2, 5, "click"), (2, 40, "click"),
        (3, 50, "click"), (3, 60, "buy"),          # never viewed
        (4, 10, "view"), (4, 10, "click"),         # same-ts adjacent steps
        (5, 70, "view"),
    ]


def _run_stream(spark, tmp_path, files):
    src = str(tmp_path / "funnel_src")
    for rows in files:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = stateful_funnel(stream, STEPS)
    sink = f"funnel_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(sink)


def _final_rows(table):
    """Update mode emits one row per key per batch; the latest row per
    key is the one with the largest n_events (picked driver-side —
    memory-sink self-joins trip Spark's conflicting-reference check)."""
    best = {}
    for r in table.collect():
        cur = best.get(r["user_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            best[r["user_id"]] = r
    return {
        uid: (r["step_reached"], r["step_1_ms"], r["step_2_ms"],
              r["step_3_ms"])
        for uid, r in best.items()
    }


def test_stream_final_state_equals_batch(spark, tmp_path):
    ev = sorted(_events(), key=lambda r: r[1])
    files = [ev[:4], ev[4:8], ev[8:]]  # 3 time-ordered micro-batches
    got = _final_rows(_run_stream(spark, tmp_path, files))

    batch = {
        r["user_id"]: (r["step_reached"], r["step_1_ms"], r["step_2_ms"],
                       r["step_3_ms"])
        for r in funnel_steps(
            spark.createDataFrame(_events(), SCHEMA), STEPS
        ).collect()
    }
    # every batch row matches the stream's final state
    for uid, want in batch.items():
        assert got[uid] == want, uid
    # the stream additionally emits never-converted funnel-active keys
    assert got[3][0] == 0  # clicks/buys but no view → step_reached 0


def test_stream_emits_every_batch_a_key_appears_in(spark, tmp_path):
    ev = sorted(_events(), key=lambda r: r[1])
    table = _run_stream(spark, tmp_path, [ev[:6], ev[6:]])
    cnt = {
        r["user_id"]: r["c"]
        for r in table.groupBy("user_id").agg(F.count("*").alias("c")).collect()
    }
    assert cnt[1] >= 2  # user 1 has events in both halves


def test_single_batch_equals_batch_operator_on_sf0001(spark, tmp_path):
    from kolang_spark.sources.io import read_table

    real_steps = ["view", "click", "purchase"]
    ev = read_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts_ms", "event_type"
    )
    rows = [tuple(r) for r in ev.collect()]
    src = str(tmp_path / "funnel_real")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    sink = f"funnel_{uuid.uuid4().hex[:8]}"
    q = (
        stateful_funnel(stream, real_steps)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _final_rows(spark.table(sink))
    batch = {
        r["user_id"]: (r["step_reached"], r["step_1_ms"], r["step_2_ms"],
                       r["step_3_ms"])
        for r in funnel_steps(ev, real_steps).collect()
    }
    for uid, want in batch.items():
        assert got[uid] == want, uid
