"""Production-width dispatch of the embedding arithmetic (r12 verdict
item 3, measured in r13 — scripts/sweep_r13.py + BASELINE.md): the
unrolled product-chain form blows the JVM JIT's 8 KB method limit by
64 dims (runs in the bytecode interpreter, 3-14x slower) and janino's
64 KB hard limit by 192 dims (whole-stage codegen silently disabled),
so `_dot`/`_norm`/`lsh_signature`/`_d2_arrays`/`_dot_arrays` route to
the bit-equal aggregate(zip_with(...)) HOF fold above
UNROLL_DIMS_LIMIT. These tests pin the dispatch, the prefix-slice
semantics (the zip_with null-padding trap), and — under
``spark.sql.codegen.fallback=false``, which turns a codegen compile
failure into an error instead of a silent interpreted fallback — that
every scoring path still COMPILES at production widths."""

import pytest
from pyspark.sql import functions as F

import kolang_spark.llm.similarity as S


def _sql(col) -> str:
    return str(col._jc) if hasattr(col, "_jc") else str(col)


def test_dispatch_forms_by_width(spark):
    lim = S.UNROLL_DIMS_LIMIT
    # at/below the limit: unrolled static chain, no HOF
    s = _sql(S._dot("a", "b", lim))
    assert f"a[{lim - 1}]" in s and "aggregate" not in s
    # above: HOF fold over the dims-prefix
    s = _sql(S._dot("a", "b", lim + 1))
    assert "aggregate" in s and f"slice(a, 1, {lim + 1})" in s
    s = _sql(S._norm("v", lim + 1))
    assert "aggregate" in s and f"slice(v, 1, {lim + 1})" in s
    assert "aggregate" not in _sql(S._norm("v", lim))
    # PQ subspace helpers follow the same rule on dsub
    assert "aggregate" not in _sql(S._d2_arrays("x", "y", lim))
    assert "aggregate" in _sql(S._d2_arrays("x", "y", lim + 1))
    assert "aggregate" in _sql(S._dot_arrays("x", "y", lim + 1))


def test_lsh_signature_routes_to_hof_above_limit(spark):
    lim = S.UNROLL_DIMS_LIMIT
    wide = _sql(S.lsh_signature("v", 4, lim + 1))
    assert wide == _sql(S.lsh_signature_hof("v", 4, lim + 1))
    narrow = _sql(S.lsh_signature("v", 4, lim))
    assert "aggregate" not in narrow


def test_hof_reads_dims_prefix_not_padded_nulls(spark):
    """zip_with pads the SHORTER array with nulls, so without slice()
    an over-length vector nulls the fold: cosine would go NULL and
    every over-length vector's LSH signature would collapse onto one
    all-zero bucket (mass false duplicates in the embedding dedup
    path — r13 review). The HOF forms must read the dims-PREFIX,
    matching the unrolled form bit-for-bit."""
    dims = S.UNROLL_DIMS_LIMIT + 4
    base = [float(i % 5) - 2.0 for i in range(dims)]
    df = spark.createDataFrame(
        [(base, base), (base + [9.0, -9.0], base)],  # over-length twin
        "a array<double>, b array<double>",
    )
    got = df.select(
        S.cosine("a", "b", dims).alias("c"),
        S.lsh_signature("a", 3, dims).alias("sig"),
    ).collect()
    assert got[0].c == pytest.approx(1.0)
    assert got[1].c == got[0].c            # prefix == exact twin
    assert got[0].sig == got[1].sig        # same signature, not bucket 0
    assert got[0].sig is not None


def test_scoring_paths_compile_at_production_dims(spark):
    """With codegen.fallback=false a whole-stage-codegen compile
    failure ABORTS the query instead of silently running interpreted
    (the pre-r13 behavior of every scoring path at >= 192 dims). The
    dispatched forms must execute at production widths; the negative
    control proves this test detects the failure it guards against.

    Width tiering (r14 suite wall-clock): the default tier runs at 384
    dims — past BOTH measured cliffs (JIT 8 KB at 64, janino 64 KB at
    192), and inside the 192-1000ish range where the negative
    control's forced unrolled chain parses but janino-fails (the
    comment below). SPARK_GRAFT_EXHAUSTIVE=1 restores the full 1536-dim
    production width, where the control dies at the SQL parser
    instead."""
    from tests.conftest import EXHAUSTIVE

    dims = 1536 if EXHAUSTIVE else 384
    corpus = spark.range(120).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dims - 1}), x -> "
            "sin(id * 1.7D + x * 0.13D))"
        ).alias("embedding"),
    )
    qs = corpus.where("vec_id % 60 = 0")
    prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        assert S.brute_force_topk(corpus, qs, k=3, dims=dims).count() > 0
        assert S.lsh_topk(corpus, qs, k=3, n_planes=8, dims=dims).count() >= 0
        assert (
            S.kmeans_centroids(corpus, k=4, dims=dims, iters=1).count() == 4
        )
        # negative control: forcing the unrolled chain at this width
        # must die — at 1536 dims the chain already exceeds the SQL
        # parser's complexity cap (FAILED_TO_PARSE_TOO_COMPLEX); at
        # 192-1000ish it parses but fails janino compile, which
        # fallback=false turns into an error. Either way it raises —
        # proving this test detects the silent-interpretation
        # regression it guards.
        old = S.UNROLL_DIMS_LIMIT
        S.UNROLL_DIMS_LIMIT = 10**9
        try:
            with pytest.raises(
                Exception, match="64 KB|CodeGen|compil|TOO_COMPLEX"
            ):
                S.brute_force_topk(corpus, qs, k=3, dims=dims).count()
        finally:
            S.UNROLL_DIMS_LIMIT = old
    finally:
        spark.conf.set("spark.sql.codegen.fallback", prev)
