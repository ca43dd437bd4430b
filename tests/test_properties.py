"""Property-based tests (Hypothesis) for the invariants SURVEY §5 flags
as the subtle ones: RANGE-frame tie semantics, the string-array parser's
edge grammar, and union-by-name schema reconciliation."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import examples

import pyspark.sql.functions as F

import kolang_spark as ks

_SETTINGS = dict(
    max_examples=examples(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(-100, 100)),  # (order_key, value)
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_cumulative_sum_range_tie_invariant(spark, rows):
    """Every row tied on the order key receives the FULL tied sum
    (RANGE frame) — the verified reference semantics (SURVEY C6)."""
    df = spark.createDataFrame(rows, "k int, v long")
    got = (
        df.withColumn("c", ks.cumulative_sum("v", "k"))
        .select("k", "v", "c")
        .collect()
    )
    # expected: cumulative by distinct key, all ties share the value
    totals: dict[int, int] = {}
    for k, v in rows:
        totals[k] = totals.get(k, 0) + v
    running, expect = 0, {}
    for k in sorted(totals):
        running += totals[k]
        expect[k] = running
    assert all(r["c"] == expect[r["k"]] for r in got)


@given(
    tokens=st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
            min_size=1,
            max_size=6,
        ),
        min_size=0,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_str_array_parser_roundtrip(spark, tokens):
    """'[a, b]' parses to its tokens; '[]' (empty) parses to NULL —
    verified reference grammar (SURVEY C4)."""
    s = "[" + ", ".join(tokens) + "]"
    df = spark.createDataFrame([(s,)], "s string")
    out = df.select(ks.str_array_to_array("s").alias("a")).first()["a"]
    if not tokens:
        assert out is None
    else:
        assert out == tokens


@given(
    cols_a=st.sets(st.sampled_from(["x", "y", "z", "w"]), min_size=1),
    cols_b=st.sets(st.sampled_from(["x", "y", "z", "w"]), min_size=1),
    n_a=st.integers(1, 5),
    n_b=st.integers(1, 5),
)
@settings(**_SETTINGS)
def test_union_all_schema_lattice(spark, cols_a, cols_b, n_a, n_b):
    """union_all over arbitrary column subsets: row count adds, the
    output schema is the first-seen ordered union, and columns missing
    on one side are NULL exactly for that side's rows."""
    a = spark.range(n_a).select(
        "id", *[F.lit(1).alias(c) for c in sorted(cols_a)]
    )
    b = spark.range(n_b).select(
        "id", *[F.lit(2).alias(c) for c in sorted(cols_b)]
    )
    out = ks.union_all(a, b)
    assert out.count() == n_a + n_b
    assert set(out.columns) == {"id"} | cols_a | cols_b
    # first-seen deterministic order: a's columns then b's extras
    assert out.columns == list(a.columns) + [
        c for c in b.columns if c not in a.columns
    ]
    only_b = cols_b - cols_a
    if only_b:
        c = sorted(only_b)[0]
        vals = [r[c] for r in out.collect()]
        assert vals.count(None) == n_a


@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=20),
    mode=st.sampled_from(["previous", "center", "next"]),
)
@settings(**_SETTINGS)
def test_moving_average_frame_semantics(spark, vals, mode):
    """ROWS-frame rolling mean with partial frames at the edges —
    verified reference behavior (SURVEY C19, p=3)."""
    import math

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i int, v long")
    got = [
        r["m"]
        for r in df.select(
            "i", ks.moving_average("v", "i", 3, mode=mode).alias("m")
        )
        .orderBy("i")
        .collect()
    ]
    p = 3
    if mode == "previous":
        lo, hi = -(p - 1), 0
    elif mode == "next":
        lo, hi = 0, p - 1
    else:
        lo, hi = -math.ceil((p - 1) / 2), (p - 1) // 2
    n = len(vals)
    expect = [
        sum(vals[max(0, i + lo) : min(n, i + hi + 1)])
        / len(vals[max(0, i + lo) : min(n, i + hi + 1)])
        for i in range(n)
    ]
    assert all(abs(g - e) < 1e-9 for g, e in zip(got, expect))


@given(
    texts=st.lists(
        st.lists(
            st.text(
                alphabet=st.characters(whitelist_categories=("Ll", "Nd")),
                min_size=1,
                max_size=6,
            ),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    ),
    chunk=st.integers(2, 12),
    overlap=st.integers(0, 5),
)
@settings(**_SETTINGS)
def test_chunk_documents_covers_all_tokens_exactly(spark, texts, chunk, overlap):
    """Chunking invariants for arbitrary token streams: every token is
    covered, window starts advance by exactly the stride, the final
    window reaches the last token, and de-overlapped concatenation
    reconstructs the document."""
    from kolang_spark.llm import chunk_documents

    overlap = min(overlap, chunk - 1)
    stride = chunk - overlap
    rows = [(i, " ".join(toks)) for i, toks in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    by_doc: dict[int, dict[int, str]] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_text
    for i, toks in enumerate(texts):
        if not toks:
            assert i not in by_doc
            continue
        chunks = by_doc[i]
        assert set(chunks) == set(range(len(chunks)))  # dense 0..nc-1
        rebuilt = (chunks[0].split(" ") if chunks[0] else [])
        for c in range(1, len(chunks)):
            rebuilt.extend(chunks[c].split(" ")[overlap:])
        assert rebuilt == toks  # full coverage, order preserved
        # every window except the last is full-size
        for c in range(len(chunks) - 1):
            assert len(chunks[c].split(" ")) == chunk


@given(
    n_docs=st.integers(1, 8),
    n=st.integers(2, 4),
)
@settings(**_SETTINGS)
def test_ngram_contamination_self_screen(spark, n_docs, n):
    """Screening a corpus against ITSELF must flag every document that
    has at least one n-gram (n_hits == n_ngrams), and never flag
    gram-less documents."""
    from kolang_spark.llm import ngram_contamination

    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(i % 6)))
        for i in range(n_docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ngram_contamination(df, df, n=n).collect()
    assert len(out) == n_docs
    for r in out:
        assert r.n_hits == r.n_ngrams
        assert r.contaminated == (r.n_ngrams > 0)


@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=3,
        max_size=25,
    ),
    k=st.sampled_from([1.5, 3.0]),
)
@settings(**_SETTINGS)
def test_mad_outliers_matches_numpy_reference(spark, vals, k):
    """mad_outliers flags must equal the straight numpy formulation
    (interpolated medians, scale*k threshold) for arbitrary floats."""
    import numpy as np

    from kolang_spark.operators import mad_outliers

    df = spark.createDataFrame([("g", float(v)) for v in vals], "g string, v double")
    got = {r.v: r.is_outlier for r in mad_outliers(df, "v", by=["g"], k=k).collect()}
    med = float(np.median(vals))
    adev = np.abs(np.array(vals) - med)
    mad = float(np.median(adev))
    for v, a in zip(vals, adev):
        expect = mad > 0 and a > (mad * 1.4826) * k
        assert got[float(v)] == expect, (v, med, mad)


@given(
    n=st.integers(8, 60),
    n_bins=st.sampled_from([2, 4, 5]),
)
@settings(**_SETTINGS)
def test_equi_depth_bin_balance_on_distinct_values(spark, n, n_bins):
    """On n distinct values the equi-depth buckets differ in size by at
    most 1 (the defining property), and bucket ids are the full 1..n_bins
    range when n >= n_bins."""
    from collections import Counter

    from kolang_spark.operators import equi_depth_bin

    df = spark.createDataFrame([(float(i),) for i in range(n)], "v double")
    out = equi_depth_bin(df, "v", n_bins=n_bins)
    counts = Counter(r.bin for r in out.collect())
    assert set(counts) == set(range(1, n_bins + 1))
    assert max(counts.values()) - min(counts.values()) <= 1


@given(
    toks=st.lists(st.integers(0, 30), min_size=1, max_size=25),
    cap=st.integers(1, 40),
)
@settings(**_SETTINGS)
def test_pack_examples_matches_sequential_reference(spark, toks, cap):
    """The bucketed distributed prefix sum must equal the sequential
    concat-and-chunk computation for any token-count sequence and
    example capacity (including zero-token documents)."""
    from kolang_spark.llm import pack_examples

    rows = [(i, int(t)) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, tok long")
    got = {
        r.doc_id: r
        for r in pack_examples(
            df, tokens_col="tok", example_tokens=cap, bucket_size=3
        ).collect()
    }
    off = 0
    for i, t in rows:
        r = got[i]
        assert r.n_tokens == t and r.token_offset == off
        if t == 0:
            assert r.first_example is None and r.n_examples == 0
        else:
            assert r.first_example == off // cap
            assert r.last_example == (off + t - 1) // cap
            assert r.n_examples == r.last_example - r.first_example + 1
        off += t
    assert len(got) == len(rows)


@given(
    base=st.dictionaries(
        st.integers(0, 12), st.tuples(st.integers(0, 2), st.integers(-50, 50)),
        min_size=1, max_size=10,
    ),
    ups=st.dictionaries(
        st.integers(0, 15), st.tuples(st.integers(0, 2), st.integers(-50, 50)),
        min_size=1, max_size=6,
    ),
)
@settings(max_examples=examples(8), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_upsert_partitioned_matches_dict_merge(spark, tmp_path_factory, base, ups):
    """For any base table and update set, the partition-pruned upsert
    must equal the plain dict merge (updates replace matching keys,
    new keys insert). Per the operator's documented contract, updates
    to EXISTING keys keep the key's partition (partition keys are
    immutable per row key — a move would leave the old row behind in
    the unrewritten partition, which is exactly why the contract
    exists); the generator enforces that here, new keys land anywhere."""
    from kolang_spark.sources.io import upsert_partitioned

    path = str(tmp_path_factory.mktemp("upsert") / "tbl")
    base_rows = [(k, f"p{p}", v) for k, (p, v) in base.items()]
    spark.createDataFrame(base_rows, "id long, p string, v long").write.partitionBy(
        "p"
    ).parquet(path)
    # contract: existing keys keep their base partition
    ups = {
        k: ((base[k][0] if k in base else p), v) for k, (p, v) in ups.items()
    }
    up_rows = [(k, f"p{p}", v) for k, (p, v) in ups.items()]
    upsert_partitioned(
        spark,
        path,
        spark.createDataFrame(up_rows, "id long, p string, v long"),
        keys=["id"],
        partition_by=["p"],
    )
    merged = {k: (f"p{p}", v) for k, (p, v) in {**base, **ups}.items()}
    got = {r.id: (r.p, r.v) for r in spark.read.parquet(path).collect()}
    assert got == merged


@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=2, max_size=40),
    bounds=st.tuples(
        st.floats(0.0, 0.45, allow_nan=False), st.floats(0.55, 1.0, allow_nan=False)
    ),
)
@settings(**_SETTINGS)
def test_winsorize_matches_numpy_percentile_clip(spark, vals, bounds):
    """winsorize == numpy clip at linear-interpolated percentiles
    (numpy 'linear' is Spark percentile's interpolation)."""
    import numpy as np

    lo_p, hi_p = bounds
    from kolang_spark.operators import winsorize

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    got = sorted(
        r.v_w for r in winsorize(df, "v", lower=lo_p, upper=hi_p).collect()
    )
    arr = np.array(vals, dtype=float)
    lo = np.percentile(arr, lo_p * 100, method="linear")
    hi = np.percentile(arr, hi_p * 100, method="linear")
    expect = sorted(np.clip(arr, lo, hi))
    assert got == _approx_list(expect)


def _approx_list(xs):
    import pytest as _pt

    return [_pt.approx(x, rel=1e-12, abs=1e-12) for x in xs]


@given(vals=st.lists(st.integers(-500, 500), min_size=2, max_size=40))
@settings(**_SETTINGS)
def test_standardize_zscore_matches_numpy(spark, vals):
    """standardize('zscore') == numpy sample-std z-scores (ddof=1),
    NULL when spread is zero."""
    import numpy as np

    from kolang_spark.operators import standardize

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "i long, v double"
    )
    got = {r.i: r.v_std for r in standardize(df, "v").collect()}
    arr = np.array(vals, dtype=float)
    sd = arr.std(ddof=1)
    if sd == 0:
        assert all(x is None for x in got.values())
    else:
        z = (arr - arr.mean()) / sd
        for i, expect in enumerate(z):
            assert got[i] == __import__("pytest").approx(expect, rel=1e-9, abs=1e-9)


@given(
    sigs=st.lists(
        st.integers(-(1 << 63), (1 << 63) - 1), min_size=2, max_size=25
    ),
    bits_and_d=st.tuples(st.integers(1, 64), st.integers(0, 4)).filter(
        lambda t: t[1] + 1 <= t[0]
    ),
)
@settings(**_SETTINGS)
def test_hamming_pairs_pigeonhole_complete(spark, sigs, bits_and_d):
    """Pigeonhole completeness at ARBITRARY (bits, max_distance): the
    banded join returns exactly the brute-force pair set, each pair
    once — including full-width single-band layouts (the r7 mask-
    overflow fix) and signatures with the sign bit set."""
    from kolang_spark.llm.dedup import hamming_pairs

    bits, d = bits_and_d
    mask = (1 << bits) - 1
    df = spark.createDataFrame(
        list(enumerate(sigs)), "doc_id long, sig long"
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_pairs(df, "doc_id", "sig", bits, d).collect()
    }
    brute = {}
    for a in range(len(sigs)):
        for b in range(a + 1, len(sigs)):
            h = bin((sigs[a] ^ sigs[b]) & mask).count("1")
            if h <= d:
                brute[(a, b)] = h
    assert got == brute


@given(
    fracs=st.lists(
        st.floats(0.01, 1.0, allow_nan=False), min_size=2, max_size=6
    ),
    n=st.integers(20, 120),
)
@settings(**_SETTINGS)
def test_split_dataset_total_and_local(spark, fracs, n):
    """For ANY normalized fraction vector: every key is assigned to
    exactly one split, and the assignment depends only on the key's
    hash position — shrinking the LAST split (growing none) never
    changes any non-last assignment."""
    from kolang_spark.operators.sampling import split_dataset

    total = sum(fracs)
    fracs = [f / total for f in fracs]
    names = [f"s{i}" for i in range(len(fracs))]
    splits = dict(zip(names, fracs))
    df = spark.range(n).withColumnRenamed("id", "k")
    got = {r.k: r.split for r in split_dataset(df, "k", splits).collect()}
    assert set(got) == set(range(n))  # total: every key assigned
    assert set(got.values()) <= set(names)
    # locality: moving mass from the last split into a NEW trailing
    # split keeps every earlier assignment
    half = fracs[-1] / 2
    splits2 = dict(zip(names, fracs[:-1] + [half]))
    splits2["s_new"] = fracs[-1] - half
    # renormalize float dust so validation passes
    drift = 1.0 - sum(splits2.values())
    splits2["s_new"] += drift
    got2 = {r.k: r.split for r in split_dataset(df, "k", splits2).collect()}
    for k, s in got.items():
        if s != names[-1]:
            assert got2[k] == s


@given(
    n=st.integers(30, 150),
    wts=st.lists(st.floats(0.05, 1.0, allow_nan=False), min_size=2, max_size=4),
    n_domains=st.integers(2, 4),
)
@settings(**_SETTINGS)
def test_mix_datasets_exact_membership_model(spark, n, wts, n_domains):
    """mix_datasets against an EXACT pure-Python model of the whole
    chain: per-domain counts -> T = min(n/p) -> frac -> 60-bit md5
    threshold -> membership. Catches any drift in the fraction
    arithmetic or the hash gate, not just aggregate proportions."""
    import hashlib

    from kolang_spark.operators.sampling import mix_datasets

    wts = wts[:n_domains]
    doms = [f"d{i}" for i in range(len(wts))]
    weights = dict(zip(doms, wts))
    rows = [(k, doms[k % len(doms)]) for k in range(n)]
    df = spark.createDataFrame(rows, "k long, dom string")
    got = sorted(r.k for r in mix_datasets(df, "dom", weights, "k").collect())

    counts: dict[str, int] = {}
    for _, d in rows:
        counts[d] = counts.get(d, 0) + 1
    t = min(counts[d] / p for d, p in weights.items())
    thr = {
        d: int(min(1.0, t * p / counts[d]) * (1 << 60))
        for d, p in weights.items()
    }

    def h60(k):
        return int(hashlib.md5(str(k).encode()).hexdigest()[17:32], 16)

    want = sorted(k for k, d in rows if h60(k) < thr[d])
    assert got == want


@given(
    src=st.tuples(st.integers(1, 9), st.integers(1, 9)),
    dst=st.tuples(st.integers(1, 6), st.integers(1, 6)),
    seed=st.integers(0, 10_000),
)
@settings(**_SETTINGS)
def test_resize_image_matches_numpy_model(spark, src, dst, seed):
    """resize_image over random source/target dims (down- AND upscale)
    vs an independent numpy nearest-neighbor-at-cell-centers model of
    the documented rule."""
    import numpy as np

    from kolang_spark.llm.multimodal import resize_image

    (w, h), (tw, th) = src, dst
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=h * w * 3, dtype=np.uint8)
    blob = f"P6\n{w} {h}\n255\n".encode() + px.tobytes()
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "doc_id long, content binary")
    out = resize_image(df, width=tw, height=th).first()
    assert (out.src_width, out.src_height) == (w, h)
    arr = px.reshape(h, w, 3)
    ys = (2 * np.arange(th) + 1) * h // (2 * th)
    xs = (2 * np.arange(tw) + 1) * w // (2 * tw)
    want = arr[np.ix_(ys, xs)].reshape(-1).tolist()
    assert out.pixels == want


@given(
    n=st.integers(5, 80),
    k=st.integers(1, 12),
    n_strata=st.integers(1, 4),
    salt=st.sampled_from(["", "a", "v2"]),
)
@settings(**_SETTINGS)
def test_stratified_fixed_sample_exact_membership_model(
    spark, n, k, n_strata, salt
):
    """stratified_fixed_sample row-for-row against the documented
    model: the k smallest md5 hashes of the key within each stratum."""
    import hashlib

    from kolang_spark.operators.sampling import stratified_fixed_sample

    rows = [(i, f"s{i % n_strata}") for i in range(n)]
    df = spark.createDataFrame(rows, "k long, g string")
    got = sorted(
        (r.g, r.k)
        for r in stratified_fixed_sample(df, "g", k, "k", salt=salt).collect()
    )

    def h60(key):
        return int(
            hashlib.md5((str(key) + salt).encode()).hexdigest()[17:32], 16
        )

    want = []
    for s in {g for _, g in rows}:
        members = sorted(
            (h60(i), str(i), i) for i, g in rows if g == s
        )
        want += [(s, i) for _, _, i in members[:k]]
    assert got == sorted(want)


@given(
    n=st.integers(5, 60),
    k=st.integers(1, 10),
    use_strata=st.booleans(),
    salt=st.sampled_from(["", "b"]),
)
@settings(**_SETTINGS)
def test_weighted_sample_exact_membership_model(spark, n, k, use_strata, salt):
    """weighted_sample row-for-row against the documented A-Res model:
    u = (hash60+0.5)/2^60, rank key ln(u)/w descending, top-k (per
    stratum when given), NULL/non-positive weights excluded."""
    import hashlib
    import math

    from kolang_spark.operators.sampling import weighted_sample

    rows = [
        (i, float(i % 7 + 1) if i % 11 else 0.0, f"g{i % 3}")
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "k long, w double, g string")
    got = sorted(
        r.k
        for r in weighted_sample(
            df, "k", "w", k, strata="g" if use_strata else None, salt=salt
        ).collect()
    )

    def ekey(key, w):
        h = int(hashlib.md5((str(key) + salt).encode()).hexdigest()[17:32], 16)
        return math.log((h + 0.5) / float(1 << 60)) / w

    eligible = [(i, w, g) for i, w, g in rows if w > 0]
    want = []
    if use_strata:
        for s in {g for _, _, g in eligible}:
            members = sorted(
                ((ekey(i, w), i) for i, w, g in eligible if g == s),
                reverse=True,
            )
            want += [i for _, i in members[:k]]
    else:
        members = sorted(((ekey(i, w), i) for i, w, _ in eligible), reverse=True)
        want = [i for _, i in members[:k]]
    assert got == sorted(want)


@given(
    pts=st.lists(st.integers(0, 3000), min_size=1, max_size=25),
    ivs=st.lists(
        st.tuples(st.integers(0, 3000), st.integers(0, 1500)),
        min_size=1,
        max_size=15,
    ),
    end_inclusive=st.booleans(),
    keyed=st.booleans(),
)
@settings(**_SETTINGS)
def test_point_in_interval_join_exact_model(
    spark, pts, ivs, end_inclusive, keyed
):
    """Bucketed point-in-interval join vs the naive model at random
    epochs straddling bucket boundaries, both end semantics, keyed and
    unkeyed — exactly once per containing pair, no boundary drift."""
    from kolang_spark.operators.rangejoin import point_in_interval_join

    p_rows = [(i, t, f"k{i % 2}") for i, t in enumerate(pts)]
    i_rows = [(j, s, s + d, f"k{j % 2}") for j, (s, d) in enumerate(ivs)]
    P = spark.createDataFrame(p_rows, "p_id long, pt long, pk string").select(
        "p_id", F.timestamp_seconds("pt").alias("pt"), "pk"
    )
    I = spark.createDataFrame(
        i_rows, "i_id long, s long, e long, ik string"
    ).select(
        "i_id",
        F.timestamp_seconds("s").alias("s"),
        F.timestamp_seconds("e").alias("e"),
        "ik",
    )
    on = [("pk", "ik")] if keyed else None
    got = sorted(
        (r.p_id, r.i_id)
        for r in point_in_interval_join(
            P, I, "pt", "s", "e", on=on, bucket=600,
            end_inclusive=end_inclusive,
        ).collect()
    )
    want = sorted(
        (pi, ii)
        for pi, t, pk in p_rows
        for ii, s, e, ik in i_rows
        if s <= t and (t <= e if end_inclusive else t < e)
        and (not keyed or pk == ik)
    )
    assert got == want


@given(
    lts=st.lists(
        st.tuples(st.integers(0, 3000), st.integers(0, 1200)),
        min_size=1,
        max_size=12,
    ),
    rts=st.lists(
        st.tuples(st.integers(0, 3000), st.integers(0, 1200)),
        min_size=1,
        max_size=12,
    ),
)
@settings(**_SETTINGS)
def test_interval_overlap_join_exact_model(spark, lts, rts):
    """Bucketed overlap join vs the naive closed-interval model —
    every overlapping pair exactly once (the first-shared-bucket rule
    must neither duplicate nor drop boundary-touching pairs)."""
    from kolang_spark.operators.rangejoin import interval_overlap_join

    l_rows = [(i, s, s + d) for i, (s, d) in enumerate(lts)]
    r_rows = [(j, s, s + d) for j, (s, d) in enumerate(rts)]
    L = spark.createDataFrame(l_rows, "l_id long, ls long, le long").select(
        "l_id",
        F.timestamp_seconds("ls").alias("ls"),
        F.timestamp_seconds("le").alias("le"),
    )
    R = spark.createDataFrame(r_rows, "r_id long, rs long, re long").select(
        "r_id",
        F.timestamp_seconds("rs").alias("rs"),
        F.timestamp_seconds("re").alias("re"),
    )
    got = sorted(
        (r.l_id, r.r_id)
        for r in interval_overlap_join(
            L, R, "ls", "le", "rs", "re", bucket=600
        ).collect()
    )
    want = sorted(
        (li, rj)
        for li, ls, le in l_rows
        for rj, rs, re in r_rows
        if ls <= re and rs <= le
    )
    assert got == want


@given(
    lefts=st.lists(st.integers(0, 500), min_size=1, max_size=15),
    rights=st.lists(st.integers(0, 500), min_size=1, max_size=15),
    tol=st.one_of(st.none(), st.integers(1, 200)),
)
@settings(**_SETTINGS)
def test_as_of_join_exact_model(spark, lefts, rights, tol):
    """Backward as-of join vs the naive model: latest right row
    at-or-before each left ts (per key), voided when older than the
    tolerance; ties at equal ts match."""
    from kolang_spark.operators.asof import as_of_join

    l_rows = [(i, f"k{i % 2}", t) for i, t in enumerate(lefts)]
    r_rows = [(j, f"k{j % 2}", t, t * 10) for j, t in enumerate(rights)]
    L = spark.createDataFrame(l_rows, "l_id long, k string, ts long").select(
        "l_id", "k", F.timestamp_seconds("ts").alias("ts")
    )
    R = spark.createDataFrame(
        r_rows, "r_id long, k string, ts long, payload long"
    ).select(
        "r_id", "k", F.timestamp_seconds("ts").alias("ts"), "payload"
    )
    tol_col = F.expr(f"INTERVAL {tol} SECOND") if tol is not None else None
    out = as_of_join(
        L, R.select("k", "ts", "payload"), on=["k"], tolerance=tol_col
    )
    got = {r.l_id: r.payload for r in out.collect()}
    for li, lk, lt in l_rows:
        cands = [
            (rt, pay)
            for _, rk, rt, pay in r_rows
            if rk == lk and rt <= lt and (tol is None or rt >= lt - tol)
        ]
        if not cands:
            assert got[li] is None, (li, got[li])
            continue
        best_ts = max(rt for rt, _ in cands)
        valid = {pay for rt, pay in cands if rt == best_ts}
        # latest ts wins; which row wins among equal-ts right rows is
        # implementation-defined, so accept any tied payload
        assert got[li] in valid, (li, got[li], valid)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(-5000, 5000),  # epoch seconds (incl. pre-1970)
            st.integers(-50, 50),
            st.sampled_from(["a", "b"]),
        ),
        min_size=1,
        max_size=25,
    ),
    step_s=st.sampled_from([60, 3600]),
    agg=st.sampled_from(["sum", "min", "max", "count"]),
    fill=st.sampled_from(["forward", "zero", "null"]),
)
@settings(**_SETTINGS)
def test_resample_fill_exact_model(spark, rows, step_s, agg, fill):
    """resample_fill vs a naive Python model: floor-to-grid bucketing
    (floored for negative epochs), per-key dense spine, exact
    aggregates, and all three fill modes."""
    from kolang_spark.operators.resample import resample_fill

    df = spark.createDataFrame(rows, "t long, v long, k string").select(
        F.timestamp_seconds("t").alias("t"), "v", "k"
    )
    step = {60: "1 minute", 3600: "1 hour"}[step_s]
    got = {
        (r.k, r.bucket_ts.timestamp(), r.is_filled): r.value
        for r in resample_fill(
            df, "t", "v", step=step, by=["k"], agg=agg, fill=fill
        ).collect()
    }

    from collections import defaultdict

    per = defaultdict(list)
    for t, v, k in rows:
        per[(k, t - t % step_s)].append(v)  # Python % floors like pmod
    fns = {"sum": sum, "min": min, "max": max, "count": len}
    want = {}
    for k in {k for _, _, k in rows}:
        bs = sorted(b for kk, b in per if kk == k)
        last = None
        for b in range(bs[0], bs[-1] + step_s, step_s):
            if (k, b) in per:
                val = fns[agg](per[(k, b)])
                last = val
                want[(k, float(b), False)] = val
            else:
                want[(k, float(b), True)] = (
                    last if fill == "forward"
                    else 0 if fill == "zero" else None
                )
    assert got == want


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=20,
    ),
    bits=st.integers(1, 8),
)
@settings(**_SETTINGS)
def test_morton_code_exact_model(spark, pts, bits):
    """morton_code vs a pure-Python bit interleave (first column in
    the least significant position of each bit group)."""
    from kolang_spark.operators.layout import morton_code

    df = spark.createDataFrame(
        list(enumerate(pts)), "i long, p struct<x: long, y: long>"
    ).select("i", F.col("p.x").alias("x"), F.col("p.y").alias("y"))
    got = {
        r.i: r.z
        for r in df.select(
            "i", morton_code([F.col("x"), F.col("y")], bits).alias("z")
        ).collect()
    }
    for i, (x, y) in enumerate(pts):
        z = 0
        for bit in range(bits):
            z |= ((x >> bit) & 1) << (2 * bit)
            z |= ((y >> bit) & 1) << (2 * bit + 1)
        assert got[i] == z, (i, x, y, bits)


@given(
    ids=st.sets(st.integers(0, 100_000), min_size=1, max_size=40),
    eps=st.integers(1, 10),
    salt=st.sampled_from(["", "ep1"]),
    n_buckets=st.sampled_from([1, 8, 1024]),
)
@settings(**_SETTINGS)
def test_assign_shards_exact_model(spark, ids, eps, salt, n_buckets):
    """assign_shards vs the naive model: global rank in (md5-hash, id)
    order, shard = rank // eps, pos = rank % eps — exact for any
    bucket count (bucketing is an implementation detail, never
    visible in the result)."""
    import hashlib

    from kolang_spark.llm import assign_shards

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = sorted(
        (r.doc_id, r.shard_id, r.pos_in_shard)
        for r in assign_shards(
            df, examples_per_shard=eps, salt=salt, n_buckets=n_buckets
        ).collect()
    )

    def h60(k):
        return int(hashlib.md5((str(k) + salt).encode()).hexdigest()[17:32], 16)

    order = sorted(ids, key=lambda i: (h60(i), i))
    want = sorted(
        (i, rank // eps, rank % eps) for rank, i in enumerate(order)
    )
    assert got == want


def test_mix_datasets_token_weighted(spark):
    """Token-budgeted mixing: capacities become weight sums, the
    limiting domain is decided by tokens (not docs), and the selected
    subset is the md5 gate at the token-derived thresholds."""
    import hashlib

    from kolang_spark.operators.sampling import mix_datasets
    from pyspark.sql import functions as F

    rows = []
    # domain A: 10 docs x 100 tokens = 1000; domain B: 40 docs x 5 = 200
    for i in range(10):
        rows.append((f"a{i}", "A", 100))
    for i in range(40):
        rows.append((f"b{i}", "B", 5))
    df = spark.createDataFrame(rows, "key string, dom string, n_tok int")

    # 50/50 token target: capacity = min(1000/.5, 200/.5) = 400
    # -> A keeps 400*.5/1000 = 20% of docs (by hash), B keeps all
    out = mix_datasets(
        df, "dom", {"A": 0.5, "B": 0.5}, "key", weight="n_tok"
    )
    got = {r.key for r in out.collect()}
    assert {k for k in got if k.startswith("b")} == {
        f"b{i}" for i in range(40)
    }
    frac_a = 400 * 0.5 / 1000.0
    expect_a = set()
    for i in range(10):
        # the engine's 60-bit gate: md5 hex chars 18-32 (_hash60)
        h = int(hashlib.md5(f"a{i}".encode()).hexdigest()[17:32], 16)
        if h < int(frac_a * (1 << 60)):
            expect_a.add(f"a{i}")
    assert {k for k in got if k.startswith("a")} == expect_a

    # doc-counted mixing picks a DIFFERENT limiting domain (B: 40 docs)
    out_docs = mix_datasets(df, "dom", {"A": 0.5, "B": 0.5}, "key")
    n_a_docs = out_docs.where(F.col("dom") == "A").count()
    assert n_a_docs >= 9  # capacity 80 -> A keeps ~100% of its 10 docs


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),  # category
            # Magnitude cap 9e12: the per-category MEAN is bounded by
            # the max element, so mean·units ≤ 9e12·1e6 = 9e18 < 2⁶³−1
            # and the TRUE result always fits a long — while the
            # intermediate num·units (Σ up to 25·9e12 = 2.25e14, ×1e6)
            # still blows far past int64, exercising the overflow-safe
            # decomposition. Values whose true result doesn't fit
            # (e.g. a lone 9.23e12 at units=1e6) correctly raise
            # ARITHMETIC_OVERFLOW under ANSI — covered by the explicit
            # test below, not by this model.
            st.one_of(
                st.none(),
                st.integers(-(9 * 10**12), 9 * 10**12),
            ),
        ),
        min_size=1,
        max_size=25,
    ),
    units=st.sampled_from([1, 1000, 1_000_000]),
    loo=st.booleans(),
)
@settings(**_SETTINGS)
def test_target_encode_units_matches_bigint_model(spark, rows, units, loo):
    """r11 `units` mode exactness model: for ANY integer targets
    (NULLs included, magnitudes deep in the num·units-overflow
    regime), the encoding equals the Python big-int truncating
    division trunc(num·units / den) — the overflow-safe scaled-
    division decomposition must be indistinguishable from unbounded
    integer arithmetic, for either sign."""
    from kolang_spark.operators.features import target_encode

    df = spark.createDataFrame(
        [(i, f"c{c}", v) for i, (c, v) in enumerate(rows)],
        "id long, cat string, y long",
    )
    got = {
        r.id: r.cat_te
        for r in target_encode(
            df, "cat", "y", leave_one_out=loo, units=units
        ).collect()
    }
    # python big-int reference (no overflow possible)
    from collections import defaultdict

    s = defaultdict(int)
    n = defaultdict(int)
    for c, v in rows:
        if v is not None:
            s[c] += v
            n[c] += 1
    for i, (c, v) in enumerate(rows):
        num, den = s[c], n[c]
        if loo and v is not None:
            num, den = num - v, den - 1
        if den > 0:
            q = num * units
            # trunc toward zero, like Spark's DIV
            expect = abs(q) // den * (1 if q >= 0 else -1)
            assert got[i] == expect, (i, rows, units, loo)
        else:
            assert got[i] is None


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),    # user
            st.integers(0, 12),   # ts (small range -> heavy ties)
            st.integers(-50, 50),  # value
        ),
        min_size=1,
        max_size=25,
    ),
    w=st.sampled_from([1, 3, 7]),
)
@settings(**_SETTINGS)
def test_trailing_window_agg_matches_bruteforce(spark, rows, w):
    """trailing_window_agg vs the O(n²) definition: for every row,
    count/sum over SAME-USER rows with ts in [cur−w, cur] — RANGE
    frames are tie-INCLUSIVE (all peers at the current ts belong to
    every peer's frame, regardless of row order), which is exactly
    what makes integer counts/sums order-independent and
    oracle-replayable (the r10-red repair relies on it)."""
    from kolang_spark.operators.features import trailing_window_agg

    df = spark.createDataFrame(
        [(i, u, t, v) for i, (u, t, v) in enumerate(rows)],
        "id long, user long, ts long, v long",
    )
    got = {
        r.id: (r[f"n_{w}ms"], r[f"sum_{w}ms"])
        for r in trailing_window_agg(
            df, ["user"], ts_col="ts", windows_ms=[w], value_col="v"
        ).collect()
    }
    for i, (u, t, v) in enumerate(rows):
        peers = [
            (u2, t2, v2)
            for (u2, t2, v2) in rows
            if u2 == u and t - w <= t2 <= t
        ]
        assert got[i] == (len(peers), sum(p[2] for p in peers)), (
            i, rows, w,
        )


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=6
        ).map(" ".join),
        min_size=1,
        max_size=12,
    ),
    split=st.integers(0, 2**32 - 1),
)
@settings(max_examples=examples(10), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_incremental_minhash_matches_python_model(
    spark, tmp_path_factory, docs, split
):
    """Random-corpus model of the ENTIRE incremental minhash contract
    (r12 — the DuckDB oracle replays it on the fixed testdata corpus;
    this replays it on adversarial tiny inputs: empty docs, sub-n
    docs, heavy shingle collisions, arbitrary batch splits). The
    Python reference re-derives banding (md5 path, bit-exact:
    trim/\\s+ tokenize -> distinct word n-grams -> per-i min of
    md5('i:'||gram) -> '|'-joined band rows) and the documented
    accept rule: flagged ⟺ any band in state OR an earlier-id doc in
    the SAME batch shares a band; accepted docs' bands extend the
    state; no-band docs are always accepted and never persisted."""
    import hashlib
    import re

    from kolang_spark.llm import incremental_minhash_dedup

    N, H, B = 2, 4, 2
    R = H // B

    def bands_of(text):
        t = text.strip()
        toks = [] if t == "" else re.split(r"\s+", t)
        if len(toks) < N:
            return None
        grams = {
            " ".join(toks[i : i + N]) for i in range(len(toks) - N + 1)
        }
        mh = [
            min(
                hashlib.md5(f"{i}:{g}".encode()).hexdigest() for g in grams
            )
            for i in range(H)
        ]
        return [
            (b, "|".join(mh[b * R : b * R + R])) for b in range(B)
        ]

    rows = list(enumerate(docs))
    b1 = [(i, t) for i, t in rows if (split >> (i % 32)) & 1 == 0]
    b2 = [(i, t) for i, t in rows if (split >> (i % 32)) & 1 == 1]
    batches = [b for b in (b1, b2) if b]

    # ---- python reference ----
    state: set = set()
    want = {}
    for batch in batches:
        bm = {i: bands_of(t) for i, t in batch}
        first: dict = {}
        for i in sorted(bm):
            for bk in bm[i] or []:
                first.setdefault(bk, i)
        for i, _t in batch:
            bks = bm[i]
            want[i] = bool(bks) and (
                any(bk in state for bk in bks)
                or any(first[bk] < i for bk in bks)
            )
        for i, _t in batch:
            if not want[i]:
                state.update(bm[i] or [])

    # ---- the operator ----
    base = tmp_path_factory.mktemp("incr_mh_model")
    sp = str(base / "state")
    got = {}
    for batch in batches:
        df = spark.createDataFrame(batch, "doc_id long, text string")
        out = incremental_minhash_dedup(
            spark, df, sp, n=N, num_hashes=H, bands=B, hash_fn="md5"
        )
        got.update(
            {r.doc_id: r.is_near_duplicate for r in out.collect()}
        )
    assert got == want, (docs, split)


@given(
    vals=st.lists(
        st.sampled_from(["a", "bb", "ccc", "dd", "e", "ff42", "zz"]),
        min_size=1,
        max_size=40,
    ),
    weights=st.booleans(),
    depth=st.integers(1, 4),
    width=st.integers(2, 16),
    salt=st.sampled_from(["", "s1"]),
)
@settings(max_examples=examples(10), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cms_matches_python_model(spark, vals, weights, depth, width, salt):
    """Random-corpus model of the ENTIRE CMS contract (r12 verdict item
    6 — promote the minhash property-model pattern to the CMS state
    family): a Python reference re-derives every counter bit-exactly
    (bucket = int(md5(f'{row}:{salt}:{v}')[17:32], 16) % width — the
    same 60-bit idiom the DuckDB oracles replay) and the estimate rule
    (min over depth counters, missing = 0, over-estimates only). Tiny
    widths force heavy bucket collisions — the regime where a wrong
    bucket/merge would hide at width 1024."""
    import hashlib

    from kolang_spark.operators.sketches import cms_estimate, cms_table

    rows = [(v, i % 3 + 1) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "v string, w long")
    wcol = "w" if weights else None

    def bucket(j, v):
        return int(
            hashlib.md5(f"{j}:{salt}:{v}".encode()).hexdigest()[17:32], 16
        ) % width

    counters: dict = {}
    for v, w in rows:
        for j in range(depth):
            key = (j, bucket(j, v))
            counters[key] = counters.get(key, 0) + (w if weights else 1)

    got = {
        (r.row, r.bucket): r.cnt
        for r in cms_table(
            df, "v", depth=depth, width=width, weight=wcol, salt=salt
        ).collect()
    }
    assert got == counters, (vals, depth, width, salt)

    # estimate rule: min over depth counters; >= true count always
    items = spark.createDataFrame([(v,) for v in set(vals)], "v string")
    est = {
        r.item: r.est_count
        for r in cms_estimate(
            cms_table(df, "v", depth=depth, width=width, weight=wcol, salt=salt),
            items, "v", depth=depth, width=width, salt=salt,
        ).collect()
    }
    true_counts: dict = {}
    for v, w in rows:
        true_counts[v] = true_counts.get(v, 0) + (w if weights else 1)
    for v in set(vals):
        want = min(
            counters.get((j, bucket(j, v)), 0) for j in range(depth)
        )
        assert est[v] == want, (v, vals)
        assert est[v] >= true_counts[v]  # biased high only


_VEC_POOL = [
    [1.0, 2.0, -1.5, 0.25],
    [1.0, 2.0, -1.5, 0.25],            # exact duplicate of pool[0]
    [2.0, 4.0, -3.0, 0.5],             # collinear with pool[0]
    [-1.0, 0.5, 3.25, -2.0],
    [0.125, -0.75, 1.0, 2.5],
    [1.0, 2.0, -1.5, 0.25, 9.0, -9.0], # over-length: dims-prefix only
    [1.0, 2.0],                        # short -> malformed
    None,                              # NULL -> malformed
    [1.0, None, -1.5, 0.25],           # NULL element -> malformed
    [0.0, 0.0, 0.0, 0.0],              # zero vector (valid: sign of 0 is +)
]


@given(
    picks=st.lists(st.integers(0, len(_VEC_POOL) - 1), min_size=1, max_size=12),
    split=st.integers(0, 2**12 - 1),
)
@settings(max_examples=examples(10), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_incremental_embedding_matches_python_model(
    spark, tmp_path_factory, picks, split
):
    """Random-corpus model of the ENTIRE incremental embedding-dedup
    contract (r12 verdict item 6 — the minhash property-model pattern
    applied to the embedding state family). The Python reference
    re-derives sign-LSH banding bit-exactly: per plane, the
    left-to-right fold acc += v[d]*plane_component(plane, d) from 0.0
    over the dims-PREFIX (over-length vectors read their prefix — the
    r13 zip_with-padding fix; without slice() they all collapse onto
    one all-zero bucket), sign >= 0 sets bit p, bucket per band joins
    as str(int). Accept rule: flagged iff any band key in state OR an
    earlier-id vector in the SAME batch shares one; accepted vectors'
    keys extend the state; malformed vectors (NULL / short / NULL
    element) are always accepted and never persisted."""
    from kolang_spark.llm import incremental_embedding_dedup
    from kolang_spark.llm.similarity import _plane_component

    DIMS, PPB, BANDS = 4, 3, 2

    def keys_of(vec):
        if vec is None or len(vec) < DIMS or any(x is None for x in vec):
            return None
        out = []
        for b in range(BANDS):
            bucket = 0
            for p in range(PPB):
                plane = b * PPB + p
                acc = 0.0
                for d in range(DIMS):
                    acc = acc + vec[d] * _plane_component(plane, d)
                if acc >= 0:
                    bucket += 1 << p
            out.append((b, str(bucket)))
        return out

    rows = [(i, _VEC_POOL[k]) for i, k in enumerate(picks)]
    b1 = [(i, v) for i, v in rows if (split >> (i % 12)) & 1 == 0]
    b2 = [(i, v) for i, v in rows if (split >> (i % 12)) & 1 == 1]
    batches = [b for b in (b1, b2) if b]

    # ---- python reference ----
    state: set = set()
    want = {}
    for batch in batches:
        km = {i: keys_of(v) for i, v in batch}
        first: dict = {}
        for i in sorted(km):
            for bk in km[i] or []:
                first.setdefault(bk, i)
        for i, _v in batch:
            bks = km[i]
            want[i] = bool(bks) and (
                any(bk in state for bk in bks)
                or any(first[bk] < i for bk in bks)
            )
        for i, _v in batch:
            if not want[i]:
                state.update(km[i] or [])

    # ---- the operator ----
    base = tmp_path_factory.mktemp("incr_emb_model")
    sp = str(base / "state")
    got = {}
    for batch in batches:
        df = spark.createDataFrame(
            batch, "vec_id long, embedding array<double>"
        )
        out = incremental_embedding_dedup(
            spark, df, sp, dims=DIMS, planes_per_band=PPB, bands=BANDS
        )
        got.update({r.vec_id: r.is_near_duplicate for r in out.collect()})
    assert got == want, (picks, split)
