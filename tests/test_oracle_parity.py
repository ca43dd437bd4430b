"""Local mirror of the driver's correctness gate: every queries() entry
with an oracle must match DuckDB at sf0.01 (rowcount + schema + values)."""

import pytest

import __spark_entry__ as entry_mod
from tests.oracle import SF_ORACLE, compare

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    _assert_schema_atomic(name, df)
    ok, msg = compare(df, ORACLES[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    _assert_schema_atomic(name, df)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


# Registry queries allowed to emit top-level DOUBLE output columns.
# Every entry here is either (a) externally driver-green at least once
# (the driver's value-hash is exact, so the doubles are proven
# bit-stable across engines: fixed-order arithmetic on both sides at
# comfortable magnitudes), or (b) a raw pass-through of a stored
# parquet double column (bit-identical by construction). New queries
# should emit integer micro-units instead (the p_micro idiom) —
# ROUND(x, 6) on a large-magnitude computed double is exactly how
# target_encode_orders shipped externally red in r10.
_DOUBLE_OUTPUT_WHITELIST = {
    "ab_test_events": {"rate", "lift", "z"},
    "correlation_lineitem": {"corr"},
    "grouped_ols_orders": {"slope", "intercept", "r2"},
    "dp_counts_events": {"noise"},
    "ann_ivf_kmeans_topk": {"cos"},
    "ann_lsh_topk": {"cos"},
    "multimodal_blob_embed_ann": {"cos"},
    "semantic_dedup_embeddings": {"dup_cos"},
    "quality_classifier_documents": {"score", "prob"},
    "dsir_weights_documents": {"avg_logratio"},
    "dsir_resample_documents": {"dsir_key"},
    "bm25_topk_documents": {"score"},
    "bigram_lm_score_documents": {"avg_neg_logprob"},
    "semantic_contamination_embeddings": {"max_cos"},
    "ccnet_buckets_documents": {"score"},
    "containment_pairs_documents": {"containment"},
    "ngram_novelty_documents": {"novelty"},
    "retrieval_metrics_embeddings": {"recall_at_k"},
    "percent_by_returnflag": {"pct"},
    "unpivot_lineitem": {"val"},
    "skew_report_events": {"share_pct", "skew_factor"},
    "quantiles_events": {"p25", "p50", "p95"},
    "winsorize_events": {"value", "value_w"},
    "zscore_events": {"z"},
    "multimodal_decode_jpeg": {"mean_pixel"},
    "scale_cumulative_revenue": {"revenue", "cum_revenue"},
    "embedding_neardup_pairs": {"cos"},
    "multimodal_decode_png": {"mean_pixel"},
    "safe_union_mismatched": {"balance"},
    "mad_outliers_events": {"value", "group_median", "mad"},
    "ann_recall_planted": {"recall_at_10"},
    "ann_ivf_recall_planted": {"recall_at_10"},
    "tfidf_top_documents": {"tfidf"},
    "equi_depth_bin_events": {"value"},
    "multimodal_decode_wav": {"duration_s"},
    "percent_partitioned": {"pct", "pct_global"},
    "add_trend_line": {"trend", "n_orders"},
    "scale_percent_by_nation": {"pct"},
    "topk_orders_per_priority": {"o_totalprice"},
    "union_customers_suppliers": {"bal"},
    "add_trend_line_deg2": {"n_orders", "trend"},
    "ann_ivf_pq_recall_planted": {"recall_at_10"},
    "ann_ivf_topk": {"cos"},
    "asof_last_purchase": {"purchase_value"},
    "bloom_semi_join_orders": {"o_totalprice"},
    "contrastive_rows_planted": {"neg_cos", "pos_cos"},
    "corpus_report_documents": {"avg_quality", "chars_per_token"},
    "cosine_topk": {"cos"},
    # same claim as cosine_topk: ROUND(cos, 6) of a cosine in [-1, 1]
    # — comfortable magnitude, fixed-order HOF-fold arithmetic both
    # sides (the widened 256-d twin; local gate green at exact-float)
    "cosine_topk_wide": {"cos"},
    "cube_percent_parts": {"pct"},
    "cumulative_orders_by_day": {"cum_pct"},
    "cumulative_revenue_by_shipdate": {"cum_revenue", "revenue"},
    "duplication_mass_documents": {"token_share"},
    "embedding_neardup_lsh": {"cos"},
    "ewma_users": {"ewma"},
    "gopher_rules_documents": {"alpha_word_ratio", "bullet_line_ratio", "ellipsis_line_ratio", "ellipsis_word_ratio", "hash_word_ratio", "mean_word_len"},
    "hard_negatives_planted": {"cos"},
    "hypertable_rollup_events": {"sum_value"},
    "jaccard_pairs_documents": {"jaccard"},
    "jl_project_embeddings": {"value"},
    "langid_corpus_report": {"accuracy"},
    "lm_score_documents": {"avg_neg_logprob"},
    "median_acctbal_by_segment": {"med_bal"},
    "moving_average_revenue": {"mavg7", "revenue"},
    "multimodal_decode": {"mean_pixel"},
    "multimodal_decode_avi": {"mean_pixel"},
    "multimodal_decode_gif": {"mean_index"},
    "oov_stats_documents": {"oov_rate"},
    "pandas_bridge_region": {"key_f"},
    "psi_drift_events": {"hi", "lo", "psi_term"},
    "quality_documents": {"digit_ratio", "punct_ratio", "stop_ratio"},
    "quantize_embeddings": {"scale"},
    "range_join_error_clicks": {"click_value"},
    "repetition_documents": {"dup_2gram_ratio", "dup_word_ratio", "top_word_ratio"},
    "scd2_customer_history": {"c_acctbal"},
    "seasonal_anomaly_events": {"z"},
    "snapshot_diff_customer": {"c_acctbal"},
    "sum_columns_lineitem": {"hsum"},
    "weighted_avg_discount": {"wavg_discount"},
}


def _assert_schema_atomic(name, df):
    """The external driver canonicalizes results with pandas
    ``sort_values``, which raises ``unhashable type: 'list'`` on any
    array/map/struct output cell — r9's one external red
    (jl_project_embeddings) shipped exactly this way. Enforce the
    invariant at the schema level for EVERY registry entry: top-level
    output columns must be atomic types. BinaryType is also rejected:
    collect() yields bytearray, which the value hash treats
    inconsistently across engines.

    r14 suite-wall-clock restructure (VERDICT r13 item 1): this used
    to be ONE looped test re-CONSTRUCTING all 206 queries — but a
    handful of entries run eager Spark jobs at construction time (BPE
    training, the streaming sinks' full micro-batch drains), so the
    loop cost 114 s on top of the parametrized oracle tests that
    already construct every query. The check now rides those
    parametrized constructions instead (same per-entry coverage, zero
    extra jobs)."""
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        DoubleType,
        FloatType,
        MapType,
        StructType,
    )

    bad = []
    dbl = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (ArrayType, MapType, StructType, BinaryType)):
            bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
        if isinstance(f.dataType, (DoubleType, FloatType)):
            if f.name not in _DOUBLE_OUTPUT_WHITELIST.get(name, ()):
                dbl.append(f"{name}.{f.name}")
    assert not bad, (
        "non-atomic top-level output columns (the driver's pandas "
        "canonicalizer cannot sort them — explode or concat_ws in the "
        f"driver query): {bad}"
    )
    assert not dbl, (
        "raw DOUBLE top-level output columns outside the whitelist "
        "(r10 lesson: target_encode_orders shipped externally red on "
        "ROUND(te, 6) of a ~1.5e7 double — ~14 significant digits, "
        "where engine round implementations diverge; the local gate "
        "compares floats EXACTLY now, but external DuckDB versions "
        "still differ from local). Prefer integer micro-unit outputs "
        "(the p_micro idiom); if the double is genuinely bit-stable "
        "(fixed-order arithmetic both sides, comfortable magnitude) "
        f"add it to _DOUBLE_OUTPUT_WHITELIST with that claim: {dbl}"
    )


def test_external_window_composition():
    """The driver's correctness harness checks the FIRST 50 queries()
    entries. Round 6's only external red was a composition mistake —
    two rows-only queries inside that window scoring err=no_oracle.
    Lock the invariant: every window slot is oracle-backed, so the
    external record can be 50/50 green by construction."""
    names = list(QUERIES)
    window = names[:50]
    missing = [n for n in window if n not in ORACLES]
    assert not missing, f"rows-only queries in the external window: {missing}"
    # a duplicate key in the queries() dict LITERAL would silently
    # overwrite an entry and shift position 50 — the built dict can't
    # show it, so count the keys in the source text
    import inspect
    import re

    import __spark_entry__ as mod

    src = inspect.getsource(mod.queries)
    literal_keys = re.findall(r'^\s{8}"([a-z0-9_]+)": _q_', src, re.M)
    assert len(literal_keys) == len(set(literal_keys)), sorted(
        k for k in set(literal_keys) if literal_keys.count(k) > 1
    )
    assert len(literal_keys) == len(names)
    # every oracle has a registered query and vice versa (dangling
    # oracle entries silently weaken the gate)
    assert not set(ORACLES) - set(QUERIES)


def test_next_window_simulation():
    """The rotation scheduler's two load-bearing properties, proven by
    simulating rounds ahead from the on-disk history EXACTLY as the
    driver sees it (r11 rewrite, verdict item 3: the old version
    fabricated "the pinned first-50 goes green this round", which
    turned red the moment the real 48/50 CORRECTNESS_r10.json landed —
    no hypothetical greens anymore; each simulated round's window is
    the scheduler's own rank(), which is also how the registry gets
    re-pinned each round). Simulated twice: all-green (steady state),
    and transiently-red — every round the THREE highest-priority
    window slots (the overdue/debut tiers: the adversarial place for
    a red) fail on their first such attempt and green on the retry, a
    strictly harsher version of r10's two one-off debut reds; the
    cadence bound must absorb the retry echo (an overdue red
    re-enters at tier 0 next round), and absorption gets one extra
    round of slack. (A WHOLE-window failure is deliberately not
    modeled: shifting a 44-query cohort by a round collides with the
    next cohort's due date by design — that is a driver catastrophe,
    not a scheduling property.)

    1. no starvation — every oracle-backed debut earns an external
       green within three simulated rounds (the policy's true
       absorption time at 160+ registry queries — the r8 verdict's
       capacity finding);
    2. cadence — once green, no query's last external green ever ages
       past its per-query cadence bound (tier-0 queries always fit,
       i.e. the scheduler's own overdue warning never fires). The
       cadence is per-query: stable veterans (>= 2 distinct external
       greens as of the r10 re-tune; was 3) re-green every 6 rounds,
       younger queries every 5 (r11 re-tune; was 4). A uniform
       4-round cadence at 162 queries spends ~40 of 50 slots/round on
       maintenance, so an entire 50-strong past window cohort comes
       due at once and starves debuts — the failure THIS test caught
       when CORRECTNESS_r08 landed.

    Guards the r8 tiering fix (debuts preempt non-overdue greens), the
    r9 re-tiering (veteran cadence 6 + oldest-first spare filling),
    the r10 promotion-at-2 re-tune (a 45-young-query window otherwise
    stays cadence-4 through its second green and resonates over the
    50-slot capacity at +4 rounds — THIS test caught that too), and
    the r11 young-cadence-5 re-tune (at 4 the r8/r9/r10 cohorts'
    re-green waves saturate r12-r14 with zero slack, so the
    transiently-red scenario below overflows at r14 — THIS test
    caught that as well).
    """
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "next_window", os.path.join(root, "scripts", "next_window.py")
    )
    nw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(nw)

    backed = [q for q in QUERIES if q in ORACLES]

    def simulate(fail_first_attempt: bool):
        hist, last_round = nw.load_history(root)
        start = last_round + 1
        failed_once = set()
        for rnd in range(start, start + 25):
            window = nw.rank(backed, hist, rnd)[: nw.WINDOW]
            overdue_missed = [
                q
                for q in backed
                if q not in window
                and hist.get(q)
                and rnd - max(hist[q]) >= nw.cadence(hist[q])
            ]
            assert not overdue_missed, (fail_first_attempt, rnd, overdue_missed)
            reds = set()
            if fail_first_attempt:
                reds = set(
                    [q for q in window if q not in failed_once][:3]
                )
                failed_once |= reds  # red this round, retries next
            for q in window:
                if q in reds:
                    continue
                hist.setdefault(q, set()).add(rnd)
            slack = 4 if fail_first_attempt else 3
            if rnd >= start + slack - 1:
                never = [q for q in backed if not hist.get(q)]
                assert not never, (fail_first_attempt, rnd, never)

    simulate(fail_first_attempt=False)
    simulate(fail_first_attempt=True)


def test_gate_floats_compared_exactly():
    """The local gate must reject a 7th-significant-digit float
    divergence — the driver's value-hash is exact, and the old
    6-sig-digit normalization green-lit exactly the ROUND(x, 6)
    double noise that shipped target_encode_orders externally red in
    r10 (verdict item 2)."""
    from tests.oracle import normalize

    a = normalize(["x"], [(1.2345678,)])
    b = normalize(["x"], [(1.2345679,)])
    assert a != b
    # and NaN / -0.0 canonicalization still holds
    import math

    assert normalize(["x"], [(float("nan"),)]) == normalize(
        ["x"], [(float("nan"),)]
    )
    assert normalize(["x"], [(-0.0,)]) == normalize(["x"], [(0.0,)])


def test_gate_non_atomic_scan_survives_leading_nulls():
    """_reject_non_atomic must catch a list cell even after >1000
    leading all-NULL rows in that column (r10 advisor: the old
    rows[:1000] sample could be defeated by a NULL prefix)."""
    from tests.oracle import _reject_non_atomic

    rows = [(1, None)] * 1500 + [(2, [1, 2])]
    msg = _reject_non_atomic(["a", "b"], rows, "spark")
    assert msg and "'b'" in msg
    # clean columns retire after their first non-NULL cell — no error
    assert _reject_non_atomic(["a", "b"], [(1, "x")] * 10, "spark") is None


def test_oracle_output_types_portable():
    """r11 hardening, locked in: the two constructs behind the r10
    external reds must never reappear anywhere in the oracle set —

    - no oracle may call epoch_ms(): its ns→ms step is
      engine-version-dependent; derive ms as epoch_us(x) // 1000
      (explicit integer floor matching Spark's `ts div 1000000`);
    - no oracle OUTPUT column may be HUGEINT (DuckDB's SUM(BIGINT)
      result — the driver's pandas canonicalizer hashes it unlike an
      int64; CAST AS BIGINT), and DECIMAL outputs are whitelisted
      (exact-half values, r10 driver-proven) rather than free.

    DESCRIBE is plan-only, so this sweeps all 200+ oracles in
    seconds."""
    from tests.oracle import duckdb_conn

    allowed_decimal = {
        ("pandas_bridge_region", "key_f"),
        ("psi_drift_events", "lo"),
        ("psi_drift_events", "hi"),
    }
    bad = []
    con = duckdb_conn()
    try:
        for name, sql in ORACLES.items():
            if "epoch_ms(" in sql:
                bad.append(f"{name}: uses epoch_ms()")
            for col, typ, *_ in con.execute(
                f"DESCRIBE SELECT * FROM ({sql}) q"
            ).fetchall():
                up = typ.upper()
                if "HUGEINT" in up:
                    bad.append(f"{name}.{col}: {typ}")
                elif "DECIMAL" in up and (name, col) not in allowed_decimal:
                    bad.append(f"{name}.{col}: {typ} (not whitelisted)")
    finally:
        con.close()
    assert not bad, bad
