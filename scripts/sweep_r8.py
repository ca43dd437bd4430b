#!/usr/bin/env python
"""Scaling sweep for the round-8 iterative/chain operators.

Measures wall time vs input scale for the operators added this round
whose cost model matters at 100 TB, by replicating the sf0.1 input
into DISJOINT copies (suffixed keys — no artificial key collapse):

- ``pagerank`` (unweighted, 4 damped iterations): the customer→
  supplier purchase graph at 1×/2×/4× edges. Expected: linear in
  |E|+|V| — each iteration is one equi-join + one map-side-combinable
  groupBy; the fixed-point arithmetic adds no driver sync beyond the
  observe-fused dangling scalar.
- ``bpe_encode`` (trained merges applied via the bounded-iteration
  Arrow pass): documents at 1×/4×/16×. Expected: linear in corpus
  bytes — merges are trained once (cost amortized, excluded here by
  training on the 1× corpus every time).
- ``dedup_keep_best`` chain (MinHash pairs → connected components →
  per-cluster argmax): documents at 1×/2×/4× with per-copy salted
  text (copies never collide ACROSS, duplicates within a copy
  remain). Expected: near-linear — banding is an equi-join and the
  pointer-jumping rounds grow O(log diameter).

Timings are warm best-of-2 on an otherwise idle machine (run this
BEFORE any concurrent pytest). Results go to stdout as one JSON line
per sweep point; paste the summary into BASELINE.md.
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


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    t = lambda name: spark.read.parquet(os.path.join(SF_DIR, name + ".parquet"))

    # --- pagerank: disjoint graph copies -----------------------------
    from kolang_spark.operators.graph import pagerank

    o, li = t("orders"), t("lineitem")
    base_edges = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    for copies in (1, 2, 4):
        e = base_edges.withColumn("cp", F.explode(F.array(
            *[F.lit(i) for i in range(copies)]
        ))).select(
            F.concat("src", F.lit("_"), "cp").alias("src"),
            F.concat("dst", F.lit("_"), "cp").alias("dst"),
        )
        sec, n = timed(lambda: pagerank(e, iterations=4,
                                        broadcast_ranks=True).count())
        print(json.dumps({"sweep": "pagerank", "copies": copies,
                          "nodes": n, "sec": round(sec, 2)}))

    # --- bpe_encode: replicated corpus -------------------------------
    from kolang_spark.llm.bpe import bpe_train, bpe_encode

    dc = t("documents").select("doc_id", "text")
    merges = bpe_train(dc, num_merges=50)
    for copies in (1, 4, 16):
        # repartition simulates the multiple input splits a real corpus
        # has (the sf0.1 table is one tiny file → one split, which
        # would serialize the embarrassingly-parallel encode)
        d = dc.withColumn("cp", F.explode(F.array(
            *[F.lit(i) for i in range(copies)]
        ))).select(
            (F.col("doc_id") + F.col("cp") * 1_000_000).alias("doc_id"),
            "text",
        ).repartition(int(CPUS))
        sec, n = timed(lambda: bpe_encode(d, merges, text_col="text").agg(
            F.count(F.lit(1)), F.sum(F.size("bpe_tokens"))
        ).collect()[0][0])
        print(json.dumps({"sweep": "bpe_encode", "copies": copies,
                          "docs": n, "sec": round(sec, 2)}))

    # --- dedup_keep_best chain: salted disjoint copies ---------------
    from kolang_spark.llm import (
        dedup_keep_best, minhash_candidate_pairs, quality_metrics,
    )

    for copies in (1, 2, 4):
        d = dc.withColumn("cp", F.explode(F.array(
            *[F.lit(i) for i in range(copies)]
        ))).select(
            (F.col("doc_id") + F.col("cp") * 1_000_000).alias("doc_id"),
            F.concat("text", F.lit(" zz"),
                     F.col("cp").cast("string")).alias("text"),
        )

        def chain(d=d):
            pairs = minhash_candidate_pairs(d, num_hashes=6, bands=3)
            score = quality_metrics(F.col("text"))["quality_score"]
            return dedup_keep_best(
                d, pairs, score=score, score_col="quality_score"
            ).count()

        sec, n = timed(chain)
        print(json.dumps({"sweep": "dedup_keep_best", "copies": copies,
                          "docs": n, "sec": round(sec, 2)}))

    spark.stop()


if __name__ == "__main__":
    main()
