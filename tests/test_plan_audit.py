"""Fleet-wide physical-plan audit over every driver query.

Enforces the engine's stated execution rules (SURVEY §4): no
row-at-a-time Python evaluation anywhere (``BatchEvalPython``), Arrow
``MapInPandas`` only in the explicitly-UDF-sanctioned multimodal decode,
and no cartesian products.
"""

import re

import pyspark.sql.functions as F

import pytest

import __spark_entry__ as entry_mod
from kolang_spark.plans.audit import explain_str
from tests.oracle import SF_ORACLE

QUERIES = entry_mod.queries()

# the one operator where Python is the sanctioned tool (media decode has
# no Catalyst expression); everything else must stay JVM-side
PANDAS_ALLOWED = {
    "multimodal_decode",
    "multimodal_decode_png",
    "multimodal_decode_wav",
    # JPEG: decode AND synthesis are Python (a huffman bitstream has no
    # Column expression) — still the one sanctioned media boundary
    "multimodal_decode_jpeg",
    "multimodal_blob_embed_ann",
    # STFT-style framing over raw PCM bytes: DSP with no Column
    # expression — same sanctioned media boundary as the decoders
    "multimodal_audio_frames",
    # CDC rolling-hash chunking: byte-level numeric kernel (same
    # sanctioned boundary — the pure-Column HOF formulations were
    # built and benched first at ~2 µs/byte interpreted; see the
    # operator docstring for the numbers)
    "cdc_chunks_documents",
    # perceptual hashing decodes image bytes (same boundary); the
    # downstream Hamming band join is pure Column algebra
    "multimodal_ahash_pairs",
    # decode + nearest-neighbor resample: same sanctioned media
    # boundary as the decoders
    "multimodal_resize",
    # greedy MMR selection (r13): the N² within-pool cosine table is
    # Column-native; the inherently-sequential per-query argmax loop
    # has no Catalyst expression that avoids k sequential distributed
    # steps, so it runs as ONE cogroup-applyInPandas pass over
    # pool-sized (never corpus-sized) frames — k barriers and ~33
    # scheduler jobs collapsed to 2 exchanges (llm/retrieval.py)
    "mmr_rerank_embeddings",
    # WARC record walk: byte-offset parsing has no Catalyst
    # expression — same sanctioned container-decode boundary
    "warc_parse_documents",
    # gzip variant: member compression (test-data synthesis) AND the
    # record walk are the same sanctioned boundary
    "warc_gzip_parse_documents",
    "web_ingest_pipeline",
    # multi-frame GIF container walk + general LZW decode: same
    # sanctioned container-decode boundary as the image decoders
    "multimodal_decode_gif",
    # same boundary; the downstream frame sampling + aHash are pure
    # Column algebra over the decoded index arrays
    "multimodal_gif_frame_ahash",
    # MJPEG-in-AVI: RIFF container walk + per-frame baseline-JPEG
    # decode (synthesis too — huffman bitstreams have no Column
    # expression); same sanctioned container-decode boundary
    "multimodal_decode_avi",
    # same boundary; downstream frame sampling, 8x-block downsample,
    # and aHash are pure Column algebra over the decoded pixel arrays
    "multimodal_avi_frame_ahash",
}

# Single-partition-fed Window nodes are the SURVEY §4 scale hazard. The
# queries below contain one BY DESIGN: their window runs over
# post-aggregate data whose cardinality is the group count (return
# flags, ship days, prefix-sum buckets), not the input row count —
# bounded at any corpus scale. Every other query must stay free of
# them; adding an entry here requires the same post-aggregate
# justification (round-4 verdict item 8 — regression lock).
GLOBAL_WINDOW_ALLOWED = {
    "percent_by_returnflag",  # pct-of-total over 3 returnflag groups
    "percent_partitioned",  # pct within returnflag partitions (post-agg)
    "cumulative_orders_by_day",  # running sum over ~2.4k daily rows
    "cumulative_revenue_by_shipdate",  # running sum over ship days
    "moving_average_revenue",  # ordered MA over daily aggregates
    "cube_percent_parts",  # pct-of-total over cube cells
    "scale_cumulative_revenue",  # bucket-level pass of the two-pass
    # distributed prefix sum (32 bucket totals — that IS the rewrite)
    "pack_examples_documents",  # same two-pass prefix-sum rewrite: the
    # un-partitioned window runs over the per-bucket TOTALS table
    # (N/bucket_size rows), never over the documents themselves
    "pack_examples_bpe",  # identical pack_examples call (real BPE
    # counts swapped in upstream) — same bucket-totals-only window
    "assign_shards_documents",  # same rewrite: the global window runs
    # over the ≤ n_buckets-row per-bucket offset table only
    "bpe_encode_ids",  # vocabulary id assignment: row_number over the
    # post-DISTINCT token set — vocabulary-sized (thousands of rows),
    # bounded at any corpus scale; the documents themselves never
    # touch a global window
    "pack_balanced_documents",  # the un-partitioned window runs over
    # the <= range_buckets-row bucket-count aggregate only (the
    # equi_depth_bin two-pass rank); documents rank within value-range
    # buckets
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_python_row_eval_and_no_cartesian(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    plan = explain_str(df, mode="simple")
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in PANDAS_ALLOWED:
        assert not re.search(
            r"MapInPandas|ArrowEvalPython|FlatMap(Co)?GroupsInPandas", plan
        ), f"{name}: unexpected Python boundary"
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_single_partition_window_regressions(spark, name):
    """No driver query may grow a single-partition Window outside the
    documented post-aggregate allowlist — the plan-level lock on the
    engine's distributed-window posture."""
    from kolang_spark.plans.audit import find_global_windows

    if name in GLOBAL_WINDOW_ALLOWED:
        return  # documented post-aggregate window; nothing to assert
    df = QUERIES[name](spark, SF_ORACLE)
    hits = find_global_windows(df)
    assert not hits, f"{name}: single-partition Window appeared: {hits}"


def test_filters_push_through_operators_to_scan(spark):
    """A filter applied above kolang columns must still reach the
    parquet scan (operators are plain Catalyst expressions — pushdown
    sees through them)."""
    import kolang_spark as ks
    from kolang_spark.plans.audit import pushed_filters, read_schema_columns
    from kolang_spark.sources.io import read_table

    li = read_table(spark, SF_ORACLE, "lineitem")
    df = (
        li.withColumn("b", ks.bin("l_quantity", 10))
        .withColumn("j", ks.jalali_date("l_shipdate"))
        .where("l_returnflag = 'R'")
        .select("l_orderkey", "b", "j")
    )
    assert any("l_returnflag" in f for f in pushed_filters(df))
    # column pruning: scan must not read every lineitem column
    cols = read_schema_columns(df)
    assert "l_comment" not in cols and "l_extendedprice" not in cols


def test_partition_pruning_on_partitioned_write(spark, tmp_path):
    """Hive-partitioned writes (the load_or_calculate_parquet layout)
    must prune directories: a filter on the partition column shows up in
    PartitionFilters and the scan touches only matching partitions."""
    from kolang_spark.plans.audit import explain_str
    from kolang_spark.sources.io import read_table

    ev = read_table(spark, SF_ORACLE, "events").withColumn(
        "day", F.to_date("ts")
    )
    path = str(tmp_path / "ev_part")
    ev.write.partitionBy("day").parquet(path)

    df = spark.read.parquet(path).where("day = DATE'2024-01-03'")
    plan = explain_str(df, mode="formatted")
    assert "PartitionFilters" in plan and "2024-01-03" in plan
    assert df.count() > 0


def test_q5_join_broadcasts_dims_and_pushes_region_filter(spark):
    """The six-table join must broadcast every dim side (no shuffle of
    supplier/nation/region) and push the region filter into its scan."""
    from kolang_spark.plans.audit import explain_str, pushed_filters

    df = entry_mod.queries()["join_revenue_by_nation"](spark, SF_ORACLE)
    plan = explain_str(df, mode="simple")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert any("r_name" in f for f in pushed_filters(df))


# Regression lock for the round-6 explode/pushdown fix: Catalyst's
# InferFiltersFromGenerate (and pushed where-predicates) used to
# duplicate the full shingle/tokenizer expression into scan-side
# filters — up to 6 copies across a self-join. Bounds = the structural
# minimum for each plan (one per scan branch).
EXPR_DUP_BOUNDS = {
    "jaccard_pairs_documents": ("array_distinct", 2),
    "minhash_pairs_documents": ("array_distinct", 2),
    "contamination_documents": ("array_distinct", 2),
    "tfidf_top_documents": ("split(trim", 2),
    "boilerplate_lines_documents": ("array_distinct", 1),
    # r14 lock for the interpreted IVF argmin (VERDICT r13 item 2):
    # the cell-assignment fold — `aggregate(transform(__cents__...))`,
    # a C-dot interpreted expression — must appear EXACTLY once per
    # plan. Before the explode_outer materialization the pushed
    # null-filter inlined it into the broadcast join CONDITION and
    # again into the projection (2x per corpus vector, both outside
    # codegen). Same lock for pq_encode's m per-subspace
    # `array_min(transform(...))` argmins: CodegenFallback gets no
    # common-subexpression elimination, so the pre-r14 double
    # reference re-ran all m x ksub d2 folds per output column.
    "ann_ivf_topk": ("aggregate(transform(", 1),
    "ann_ivf_recall_planted": ("aggregate(transform(", 1),
    "ann_ivf_kmeans_topk": ("aggregate(transform(", 1),
    "ann_ivf_pq_recall_planted": ("array_min(transform(", 4),
}


@pytest.mark.parametrize("name", sorted(EXPR_DUP_BOUNDS))
def test_no_expensive_expression_duplication(spark, name):
    marker, bound = EXPR_DUP_BOUNDS[name]
    df = QUERIES[name](spark, SF_ORACLE)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    n = plan.count(marker)
    assert n <= bound, (
        f"{name}: {marker!r} appears {n}x in the optimized plan "
        f"(bound {bound}) — an optimizer rule is duplicating the "
        "expression again (see explode_outer pattern in llm/dedup.py)"
    )


# Column-pruning lock: the scan must read EXACTLY the needed columns —
# through the events ts-normalization projection, operator expression
# trees, and explode/aggregate pipelines alike. A widened ReadSchema
# here means some new wrapper broke pruning for every query over that
# table.
PRUNING_EXPECTED = {
    "skew_report_events": {"user_id"},
    "cms_user_counts_events": {"user_id"},
    "bloom_users_events": {"event_type", "user_id"},
    "exact_dedup_documents": {"doc_id", "text"},
    "zorder_key_parts": {"p_partkey", "p_retailprice", "p_size"},
    "winsorize_events": {"event_id", "event_type", "value"},
    "gopher_rules_documents": {"doc_id", "text"},
    # planted-corpus queries synthesize vectors from the id alone — the
    # scan must never touch text/lang/embedding columns
    "hard_negatives_planted": {"doc_id"},
    "langid_train_classify": {"doc_id"},
}


@pytest.mark.parametrize("name", sorted(PRUNING_EXPECTED))
def test_scan_column_pruning_exact(spark, name):
    from kolang_spark.plans.audit import read_schema_columns

    df = QUERIES[name](spark, SF_ORACLE)
    cols = set(read_schema_columns(df))
    assert cols == PRUNING_EXPECTED[name], (
        f"{name}: scan reads {sorted(cols)}, expected "
        f"{sorted(PRUNING_EXPECTED[name])}"
    )


def test_minhash_default_plan_uses_xxhash64_not_md5(spark):
    """r11 default-flip audit: the production default must actually
    reach the physical plan — minhash_candidate_pairs with no hash_fn
    argument plans xxhash64 expressions and NO md5 (an md5 hex
    round-trip per shingle is the production tax the flip removed);
    the pinned-md5 oracle path still plans md5."""
    from kolang_spark.llm import minhash_candidate_pairs

    df = spark.createDataFrame(
        [(1, "one two three four five six seven")], ["doc_id", "text"]
    )
    plan_default = minhash_candidate_pairs(df)._jdf.queryExecution().optimizedPlan().toString()
    assert "xxhash64" in plan_default
    assert "md5" not in plan_default
    plan_md5 = minhash_candidate_pairs(df, hash_fn="md5")._jdf.queryExecution().optimizedPlan().toString()
    assert "md5" in plan_md5
    assert "xxhash64" not in plan_md5


def test_repaired_r10_queries_shuffle_counts_pinned(spark):
    """Structural pins for the two queries repaired this round — their
    scale story is a plan shape, so a regression should be a plan-audit
    failure, not a bench surprise:

    - trailing_features_events: all four trailing features (two RANGE
      windows x count+sum) ride ONE hash exchange + ONE sort (the
      same-spec frames share the window pass; the naive shape is a
      self-join per window);
    - target_encode_orders: ONE exchange total (the category-stats
      aggregate), re-attached by broadcast — detail rows never
      shuffle, and the integer micro-units path plans no Sort."""
    import re

    import __spark_entry__ as entry

    def counts(name):
        df = entry.queries()[name](spark, SF_ORACLE)
        p = df._jdf.queryExecution().executedPlan().toString()
        return (
            len(re.findall(r"\bExchange hashpartitioning", p)),
            len(re.findall(r"BroadcastExchange", p)),
            len(re.findall(r"\bSort \[", p)),
        )

    assert counts("trailing_features_events") == (1, 0, 1)
    assert counts("target_encode_orders") == (1, 1, 0)
