#!/usr/bin/env python
"""Round-11 scaling sweep: the minhash production-hash default flip.

r11 promotes ``hash_fn='xxhash64'`` to the DEFAULT for the
minhash/simhash family (md5 hex strings through 100 TB of shingles are
the known production tax — BASELINE.md r4 measured parity at sf0.1
where the band-join shuffle dominates, leaving the expression-side win
invisible). This sweep makes the claim empirical at growing scale:
``minhash_candidate_pairs`` end-to-end (shingle → signature → band →
self-join → distinct, noop sink) at 1×/4×/16× disjoint copies of the
sf0.1 documents under BOTH hashes, same JVM, warm best-of-2 — the
expression cost grows with corpus size while the per-copy band join
stays disjoint, so the md5/xxhash64 gap at 16× is the production
story. simhash_hamming_pairs rides along at the same points.

One JSON line per point; paste the summary into BASELINE.md.
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
        .appName("sweep-r11")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from kolang_spark.llm import minhash_candidate_pairs, simhash_hamming_pairs

    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()
        return None

    for copies in (1, 4, 16):
        dc = replicate(base, "doc_id", copies).localCheckpoint(eager=True)
        n_docs = dc.count()
        rec = {"copies": copies, "n_docs": n_docs}
        for hash_fn in ("md5", "xxhash64"):
            t, _ = timed(
                lambda: noop(
                    minhash_candidate_pairs(
                        dc, num_hashes=6, bands=3, hash_fn=hash_fn
                    )
                )
            )
            rec[f"minhash_{hash_fn}_s"] = round(t, 2)
            t, _ = timed(
                lambda: noop(
                    simhash_hamming_pairs(
                        dc, bits=16, max_distance=2, hash_fn=hash_fn
                    )
                )
            )
            rec[f"simhash_{hash_fn}_s"] = round(t, 2)
        rec["minhash_speedup"] = round(
            rec["minhash_md5_s"] / rec["minhash_xxhash64_s"], 2
        )
        rec["simhash_speedup"] = round(
            rec["simhash_md5_s"] / rec["simhash_xxhash64_s"], 2
        )
        print("SWEEP " + json.dumps(rec), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
