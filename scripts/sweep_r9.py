#!/usr/bin/env python
"""Scaling sweep for the round-9 operators.

Measures wall time vs input scale by replicating sf0.1 inputs into
DISJOINT copies (suffixed ids — no artificial key collapse):

- ``langid`` (train once on the fixed seed corpus, classify documents
  at 1×/4×/16×): expected linear in corpus chars — the scoring pass
  is one explode + broadcast join + per-doc aggregate; the model grid
  is a constant-size broadcast.
- ``pq_encode`` (embeddings at 1×/4×/16×, m=8, ksub=64): expected
  linear in vectors — candidate scoring is a broadcast join with a
  map-side-completable argmin; no corpus shuffle beyond the two
  bounded aggregations.
- ``ivf_pq_topk`` with refine (corpus at 1×/4×, fixed 40 queries):
  expected ~linear in corpus — build/encode dominate; probe cost is
  nprobe/C of the corpus per query, refine touches Q·R rows.
- ``decode_gif_frames`` (synthesized multi-frame GIFs at 1×/4×/16×):
  expected linear in total frame bytes — embarrassingly parallel
  Arrow batches, no shuffle at all.

Timings are warm best-of-2 on an otherwise idle machine. One JSON
line per sweep point; paste the summary into BASELINE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def timed(fn, runs=2):
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()  # monotonic — the repo's timing convention
        n = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, n


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


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config(
            "spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g"
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod  # noqa: F401 (corpus fixtures)
    from kolang_spark.llm.langid import classify_lang, train_char_langid
    from kolang_spark.llm.multimodal import decode_gif_frames, synth_gif_blobs
    from kolang_spark.llm.similarity import ivf_pq_topk, pq_codebooks, pq_encode

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    em = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).where(
        F.col("embedding").isNotNull()
    )

    # --- langid classify ---
    seed = spark.createDataFrame(
        [
            (lang, s)
            for lang, ss in entry_mod._LANGID_SEED.items()
            for s in ss
        ],
        ["lang", "text"],
    )
    grid, priors = train_char_langid(seed)
    grid = grid.cache()
    priors = priors.cache()
    grid.count(), priors.count()
    for copies in (1, 4, 16):
        d = replicate(docs, "doc_id", copies).cache()
        n_in = d.count()
        dt, n = timed(
            lambda d=d: classify_lang(d, grid, priors).where(
                F.col("lang_pred").isNotNull()
            ).count()
        )
        print(json.dumps({"sweep": "langid_classify", "copies": copies, "rows": n_in, "sec": round(dt, 2)}))
        d.unpersist()

    # --- pq_encode ---
    cb = pq_codebooks(em, m=8, ksub=64, dims=64, method="stride", stride=25).cache()
    cb.count()
    for copies in (1, 4, 16):
        d = replicate(em, "vec_id", copies).cache()
        n_in = d.count()
        dt, n = timed(lambda d=d: pq_encode(d, cb, m=8, dims=64).count())
        print(json.dumps({"sweep": "pq_encode", "copies": copies, "rows": n_in, "sec": round(dt, 2)}))
        d.unpersist()

    # --- ivf_pq_topk end to end (build + encode + probe + refine) ---
    queries = em.orderBy("vec_id").limit(40).cache()
    queries.count()
    for copies in (1, 4):
        d = replicate(em, "vec_id", copies).cache()
        n_in = d.count()
        dt, n = timed(
            lambda d=d: ivf_pq_topk(
                d, queries, k=10, nprobe=2, m=8, ksub=64, dims=64, refine=50
            ).count()
        )
        print(json.dumps({"sweep": "ivf_pq_topk", "copies": copies, "rows": n_in, "sec": round(dt, 2)}))
        d.unpersist()

    # --- decode_gif_frames ---
    for copies in (1, 4, 16):
        d = replicate(docs.select("doc_id"), "doc_id", copies)
        blobs = synth_gif_blobs(d).cache()
        n_in = blobs.count()
        dt, n = timed(lambda b=blobs: decode_gif_frames(b).count())
        print(json.dumps({"sweep": "decode_gif_frames", "copies": copies, "rows": n_in, "frames": n, "sec": round(dt, 2)}))
        blobs.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
