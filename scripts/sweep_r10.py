#!/usr/bin/env python
"""Round-10 scaling sweep: the IVF coarse-quantizer default flip.

The r9 sweep measured the old stride default's C ∝ N growth (2.2× time
at 4× data end-to-end, superlinear build). r10 makes fixed-k sampled
k-means the default (`llm/similarity.py::_coarse_centroids`): C is
capped at min(4096, isqrt(N)), so the index build is ~linear in N and
the probe fan-out constant. This sweep re-runs the same end-to-end
shape (build + assign + probe + rank) at 1×/4×/16× disjoint copies of
the sf0.1 embeddings under BOTH quantizers, so the movement is directly
attributable to the default.

Timings are warm best-of-2. One JSON line per point; paste the summary
into BASELINE.md.
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
        t0 = time.perf_counter()
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
        .appName("sweep-r10")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from kolang_spark.llm.similarity import ivf_topk

    em = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = em.where(F.col("vec_id") % 100 == 0).cache()
    queries.count()

    for copies in (1, 4, 16):
        corpus = replicate(em, "vec_id", copies).cache()
        n_in = corpus.count()
        for mode in ("kmeans_default", "stride"):
            kwargs = {} if mode == "kmeans_default" else {"centroid_stride": 25}
            dt, n = timed(
                lambda c=corpus, kw=kwargs: ivf_topk(
                    c, queries, k=5, nprobe=2, dims=64, **kw
                ).count()
            )
            print(
                json.dumps(
                    {
                        "sweep": "ivf_topk_end_to_end",
                        "quantizer": mode,
                        "copies": copies,
                        "rows": n_in,
                        "out": n,
                        "sec": round(dt, 2),
                    }
                ),
                flush=True,
            )
        corpus.unpersist()

    spark.stop()


if __name__ == "__main__" and "--newops" not in sys.argv:
    main()


def sweep_new_ops():
    """Second r10 sweep: the round's new operators at 1x/4x/16x.

    - decode_avi_frames: expected linear in total container bytes —
      embarrassingly parallel Arrow batches, no shuffle (the GIF
      precedent, r9).
    - bpe_encode_ids: expected linear in documents — encode is pure
      Column algebra riding the scan; the vocabulary map is ONE
      broadcast row, so id lookup adds no shuffle and no per-row join.
    """
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("sweep-r10-newops")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F  # noqa: F811

    from kolang_spark.llm.bpe import bpe_encode_ids, bpe_train, bpe_vocab_ids
    from kolang_spark.llm.multimodal import decode_avi_frames, synth_avi_blobs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    merges = bpe_train(docs, num_merges=24, max_words=500)
    vocab = bpe_vocab_ids(docs, merges).cache()
    vocab.count()

    for copies in (1, 4, 16):
        d = replicate(docs, "doc_id", copies).cache()
        n_in = d.count()
        dt, n = timed(
            lambda d=d: bpe_encode_ids(d, merges, vocab)
            .select(F.sum(F.size("token_ids")).alias("s"))
            .collect()[0]["s"]
        )
        print(json.dumps({"sweep": "bpe_encode_ids", "copies": copies,
                          "rows": n_in, "total_ids": int(n),
                          "sec": round(dt, 2)}), flush=True)
        blobs = synth_avi_blobs(d.select("doc_id")).cache()
        blobs.count()
        dt, n = timed(lambda b=blobs: decode_avi_frames(b).count())
        print(json.dumps({"sweep": "decode_avi_frames", "copies": copies,
                          "rows": n_in, "frames": n,
                          "sec": round(dt, 2)}), flush=True)
        blobs.unpersist()
        d.unpersist()
    spark.stop()


if __name__ == "__main__" and "--newops" in sys.argv:
    sweep_new_ops()
