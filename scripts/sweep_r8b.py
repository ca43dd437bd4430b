#!/usr/bin/env python
"""Scaling sweep for the round-8 second-session operators.

Same methodology as scripts/sweep_r8.py: replicate the sf0.1 input
into DISJOINT copies (suffixed keys / salted text so copies never
collide), warm best-of-2 per point, idle machine. One JSON line per
point; summary belongs in BASELINE.md.

- ``cdc_chunks`` (Arrow numpy kernel): 1x/4x/16x documents. Expected
  linear in corpus bytes; no shuffle at all.
- ``incremental_cdc_ingest``: same scales, fresh state per point
  (chunk + state join + per-doc aggregate). Expected linear.
- ``edit_distance_pairs`` (PassJoin, d=1, 25-char titles): 1x/4x/16x
  with per-copy salt prefix. Expected linear — candidate keys are a
  constant fanout per row and the join is an equi-join.
- ``containment_pairs`` (inverted-index equi-join): 1x/2x/4x with
  salted text. Expected near-linear like jaccard.
- ``pmi_collocations``: 1x/4x/16x (two hash aggregates + term joins).
  Expected linear.
- ``mmr_rerank`` (k=3, pool 8): query count 20/80/320 via anchor
  stride. Expected linear in queries; corpus side fixed.
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
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, n


def replicate(dc, copies, salt_text=False):
    d = dc.withColumn(
        "cp", F.explode(F.array(*[F.lit(i) for i in range(copies)]))
    ).select(
        (F.col("doc_id") + F.col("cp") * 1_000_000).alias("doc_id"),
        (
            F.concat(F.col("cp").cast("string"), F.lit("~"), "text")
            if salt_text
            else F.col("text")
        ).alias("text"),
    )
    return d.repartition(int(CPUS))


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config(
            "spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g"
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = lambda name: spark.read.parquet(os.path.join(SF_DIR, name + ".parquet"))
    dc = t("documents").select("doc_id", "text")

    from kolang_spark.llm import (
        cdc_chunks,
        containment_pairs,
        edit_distance_pairs,
        incremental_cdc_ingest,
        pmi_collocations,
    )

    for copies in (1, 4, 16):
        d = replicate(dc, copies)
        sec, n = timed(lambda: cdc_chunks(d).count())
        print(json.dumps({"sweep": "cdc_chunks", "copies": copies,
                          "chunks": n, "sec": round(sec, 2)}))

    import shutil
    import tempfile

    for copies in (1, 4, 16):
        d = replicate(dc, copies)

        def ingest(d=d):
            base = tempfile.mkdtemp(prefix="ks_sweep_cdc_")
            try:
                return incremental_cdc_ingest(
                    spark, d, os.path.join(base, "state")
                ).count()
            finally:
                shutil.rmtree(base, ignore_errors=True)

        sec, n = timed(ingest)
        print(json.dumps({"sweep": "incremental_cdc_ingest",
                          "copies": copies, "docs": n,
                          "sec": round(sec, 2)}))

    for copies in (1, 4, 16):
        d = replicate(dc, copies, salt_text=True).select(
            "doc_id", F.substring("text", 1, 25).alias("title")
        )
        sec, n = timed(
            lambda: edit_distance_pairs(d, text_col="title", max_dist=1).count()
        )
        print(json.dumps({"sweep": "edit_distance_pairs", "copies": copies,
                          "pairs": n, "sec": round(sec, 2)}))

    for copies in (1, 2, 4):
        d = replicate(dc, copies, salt_text=True)
        sec, n = timed(lambda: containment_pairs(d, threshold=0.6).count())
        print(json.dumps({"sweep": "containment_pairs", "copies": copies,
                          "pairs": n, "sec": round(sec, 2)}))

    for copies in (1, 4, 16):
        d = replicate(dc, copies)
        sec, n = timed(
            lambda: pmi_collocations(d, top_k=60, min_count=5).count()
        )
        print(json.dumps({"sweep": "pmi_collocations", "copies": copies,
                          "rows": n, "sec": round(sec, 2)}))

    from kolang_spark.llm import brute_force_topk, mmr_rerank

    em = t("embeddings")
    for stride in (100, 25, 6):
        anchors = em.where(F.col("vec_id") % stride == 0)
        nq = anchors.count()
        # pin the first-stage pool OUTSIDE the timed region — the sweep
        # measures the reranker, not the brute-force retriever
        pool = brute_force_topk(em, anchors, k=8, dims=64).localCheckpoint(
            eager=True
        )

        sec, n = timed(
            lambda: mmr_rerank(pool, em, k=3, lam_num=7, lam_den=10,
                               dims=64).count()
        )
        print(json.dumps({"sweep": "mmr_rerank", "n_queries": nq,
                          "rows": n, "sec": round(sec, 2)}))

    spark.stop()


if __name__ == "__main__":
    main()
