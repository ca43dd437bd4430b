#!/usr/bin/env python
"""Round-12 scaling sweep: streaming-sink micro-batch throughput
(r11 verdict item 7 — the one mandate family without a 16× sweep).

``minhash_dedup_sink`` and ``cms_sink`` drain a two-micro-batch file
stream whose BATCH SIZE grows 1×/4×/16× (disjoint replicated copies of
the sf0.1 inputs, the sweep_r8..r11 methodology). What must hold for
the 100 TB story: per-row cost stays ~flat as batches grow — the
minhash sink's per-batch work is the banding expression (linear) + a
band-key equi-join against state + a within-batch band window (both
hash-partitioned, no driver folds), and the CMS sink's is one
map-side-combinable groupBy into ≤ depth×width rows regardless of
batch size. A superlinear point = a cliff to file for r13.

Each point runs a REAL foreachBatch StreamingQuery (availableNow)
against fresh scratch state, warm best-of-2. Each half of the input
is written as 4 files with pinned mtimes and the source reads with
maxFilesPerTrigger=4, so the stream drains in exactly two
micro-batches (half 1, then half 2) with 4-way read parallelism
inside each. One JSON line per point; paste the summary into
BASELINE.md.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def replicate(df, id_col, copies):
    if copies == 1:
        return df
    parts = [
        df.withColumn(id_col, F.col(id_col) + F.lit(i * 10_000_000).cast("long"))
        for i in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _pin_mtimes(*dirs):
    # the file source orders batches by mtime: pin batch 1 older
    t = time.time() - 1000
    for i, d in enumerate(dirs):
        for root, _, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (t + i * 100, t + i * 100))


def _two_batch_source(spark, df, split_col, base, schema):
    src = os.path.join(base, "src")
    os.makedirs(src)
    f1, f2 = os.path.join(src, "f1"), os.path.join(src, "f2")
    df.where(F.col(split_col) % 2 == 0).coalesce(4).write.parquet(f1)
    df.where(F.col(split_col) % 2 == 1).coalesce(4).write.parquet(f2)
    _pin_mtimes(f1, f2)
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(src + "/*")
    )


def run_minhash(spark, docs, base):
    from kolang_spark.streaming import minhash_dedup_sink

    stream = _two_batch_source(
        spark, docs, "doc_id", base, "doc_id long, text string"
    )
    t0 = time.perf_counter()
    q = minhash_dedup_sink(
        stream,
        os.path.join(base, "state"),
        os.path.join(base, "out"),
        checkpoint=os.path.join(base, "ckpt"),
    )
    q.awaitTermination(3600)
    return time.perf_counter() - t0


def run_cms(spark, events, base):
    from kolang_spark.streaming import cms_sink

    stream = _two_batch_source(
        spark, events, "user_id", base, "user_id long, event_id long"
    )
    t0 = time.perf_counter()
    q = cms_sink(
        stream,
        os.path.join(base, "state"),
        "user_id",
        depth=4,
        width=1024,
        checkpoint=os.path.join(base, "ckpt"),
    )
    q.awaitTermination(3600)
    return time.perf_counter() - t0


def timed_stream(fn, spark, df, runs=2):
    best = None
    for _ in range(runs):
        base = tempfile.mkdtemp(prefix="ks_sweep12_")
        try:
            dt = fn(spark, df, base)
        finally:
            shutil.rmtree(base, ignore_errors=True)
        best = dt if best is None else min(best, dt)
    return best


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("sweep-r12")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs_base = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text")
    )
    events_base = (
        spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        .select("user_id", "event_id")
    )

    for copies in (1, 4, 16):
        docs = replicate(docs_base, "doc_id", copies).localCheckpoint(eager=True)
        n_docs = docs.count()
        t_mh = timed_stream(run_minhash, spark, docs)
        events = replicate(events_base, "user_id", copies).localCheckpoint(
            eager=True
        )
        n_ev = events.count()
        t_cms = timed_stream(run_cms, spark, events)
        rec = {
            "copies": copies,
            "n_docs": n_docs,
            "minhash_sink_s": round(t_mh, 2),
            "minhash_docs_per_s": int(n_docs / t_mh),
            "n_events": n_ev,
            "cms_sink_s": round(t_cms, 2),
            "cms_events_per_s": int(n_ev / t_cms),
        }
        print("SWEEP " + json.dumps(rec), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
