"""MJPEG-in-AVI container surface (`llm/multimodal.py::synth_avi_blobs`
/ `_parse_avi` / `decode_avi_frames`): RIFF walk correctness, closed-form
frame statistics, the poison-blob contract, and the pad-byte /
nested-LIST corners a naive walk gets wrong."""

import numpy as np
from pyspark.sql import functions as F

from kolang_spark.llm.multimodal import (
    _build_avi,
    _encode_jpeg_gray,
    _parse_avi,
    decode_avi_frames,
    synth_avi_blobs,
)


def _flat_jpeg(v: int, w: int = 8, h: int = 8) -> bytes:
    return _encode_jpeg_gray(np.full((h, w), v, dtype=np.uint8))


def test_synth_decode_roundtrip_closed_form(spark):
    df = spark.range(0, 20).select(F.col("id").alias("doc_id"))
    out = decode_avi_frames(synth_avi_blobs(df)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, rows in by_doc.items():
        w, h = 8 * (1 + did % 3), 8 * (1 + did % 2)
        nf = 2 + did % 3
        assert len(rows) == nf
        bw, bh = w // 8, h // 8
        for r in sorted(rows, key=lambda r: r["frame_idx"]):
            f = r["frame_idx"]
            blocks = [2 * ((did * 17 + f * 31 + b * 29) % 128) for b in range(bw * bh)]
            assert (r["width"], r["height"]) == (w, h)
            assert r["n_frames"] == nf
            assert r["usec_per_frame"] == 40000 + 1000 * (did % 5)
            assert r["n_pixels"] == w * h
            assert r["sum_pixel"] == 64 * sum(blocks)
            assert r["first_pixel"] == blocks[0]


def test_parse_avi_pad_byte_between_chunks():
    """A JPEG payload of odd length forces the RIFF pad byte; the walk
    must skip it or every later chunk misaligns."""
    j1, j2 = _flat_jpeg(10), _flat_jpeg(20)
    if len(j1) % 2 == 0:
        j1 += b"\xd9"  # harmless trailing byte after EOI keeps it odd
        if len(j1) % 2 == 0:
            j1 = j1[:-1]
    assert len(j1) % 2 == 1
    avi = _build_avi([j1, j2], 8, 8, 40000)
    parsed = _parse_avi(avi)
    assert parsed is not None
    usec, declared, payloads = parsed
    assert usec == 40000 and declared == 2
    assert len(payloads) == 2
    assert payloads[0] == j1 and payloads[1] == j2


def test_parse_avi_rec_list_nesting():
    """Interleaved files wrap movi chunks in 'rec ' LISTs — the walk
    must descend into them."""
    j = _flat_jpeg(30)
    plain = _build_avi([j], 8, 8, 40000)
    # rebuild: wrap the 00dc chunk inside a rec LIST by hand
    from kolang_spark.llm.multimodal import _riff_chunk, _riff_list

    movi_at = plain.index(b"movi")
    chunk = _riff_chunk(b"00dc", j)
    movi = _riff_list(b"movi", _riff_list(b"rec ", chunk))
    new_body = plain[12 : movi_at - 8] + movi
    avi = b"RIFF" + (len(new_body) + 4).to_bytes(4, "little") + b"AVI " + new_body
    parsed = _parse_avi(avi)
    assert parsed is not None
    assert parsed[2] == [j]


def test_poison_blobs(spark):
    """Malformed containers and undecodable frames emit the single
    n_frames=0 row, never an exception."""
    good = _build_avi([_flat_jpeg(40)], 8, 8, 40000)
    bad_frame = _build_avi([b"not a jpeg"], 8, 8, 40000)
    rows = [
        (1, good),
        (2, b""),
        (3, b"RIFF\x04\x00\x00\x00WAVE"),
        (4, good[:30]),  # truncated mid-header
        (5, bad_frame),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in decode_avi_frames(df).collect()}
    assert out[1]["n_frames"] == 1 and out[1]["sum_pixel"] == 64 * 40
    for did in (2, 3, 4, 5, 6):
        assert out[did]["n_frames"] == 0
        assert out[did]["sum_pixel"] is None


def test_hostile_length_fields_never_overread():
    good = _build_avi([_flat_jpeg(50)], 8, 8, 40000)
    # corrupt the movi chunk size to a huge value: walk must fail
    # cleanly (None), not raise or scan past the buffer
    movi_at = good.index(b"00dc")
    hostile = (
        good[: movi_at + 4] + (0x7FFFFFFF).to_bytes(4, "little") + good[movi_at + 8 :]
    )
    assert _parse_avi(hostile) is None


def test_include_pixels_feeds_column_side(spark):
    df = spark.range(0, 3).select(F.col("id").alias("doc_id"))
    out = decode_avi_frames(synth_avi_blobs(df), include_pixels=True)
    r = out.where((F.col("doc_id") == 1) & (F.col("frame_idx") == 0)).head()
    assert len(r["pixels"]) == r["n_pixels"]
    assert sum(r["pixels"]) == r["sum_pixel"]


def test_block_downsample_and_ahash_chain(spark):
    """block_downsample picks each 8x8 tile's top-left pixel in
    row-major tile order; chained into frame_index_ahash it reproduces
    the closed-form hash over per-block values."""
    from kolang_spark.llm.multimodal import block_downsample, frame_index_ahash

    df = spark.range(2, 3).select(F.col("id").alias("doc_id"))  # 24x8, 4 frames
    frames = decode_avi_frames(synth_avi_blobs(df), include_pixels=True)
    out = frames.select(
        "doc_id",
        "frame_idx",
        block_downsample(
            F.col("pixels"), F.col("width"), F.col("height")
        ).alias("blocks"),
        frame_index_ahash(
            block_downsample(F.col("pixels"), F.col("width"), F.col("height"))
        ).alias("ahash"),
    ).collect()
    for r in out:
        f = r["frame_idx"]
        want = [2 * ((2 * 17 + f * 31 + b * 29) % 128) for b in range(3)]
        assert r["blocks"] == want
        s, n = sum(want), len(want)
        assert r["ahash"] == sum(1 << p for p, v in enumerate(want) if v * n > s)


def test_avi_roundtrip_property_fuzz():
    """Property fuzz (no Spark): arbitrary frame counts, block-grid
    dimensions, and frame rates round-trip through _build_avi →
    _parse_avi → _parse_jpeg with every pixel intact (even values are
    exact through the flat quant-16 JPEG)."""
    from hypothesis import given, settings
    from tests.conftest import examples
    from hypothesis import strategies as st

    from kolang_spark.llm.multimodal import _parse_jpeg

    @settings(max_examples=examples(25), deadline=None)
    @given(
        nf=st.integers(min_value=1, max_value=5),
        bw=st.integers(min_value=1, max_value=3),
        bh=st.integers(min_value=1, max_value=2),
        usec=st.integers(min_value=1, max_value=1_000_000),
        seed=st.integers(min_value=0, max_value=10_000),
    )
    def check(nf, bw, bh, usec, seed):
        w, h = bw * 8, bh * 8
        imgs = []
        for f in range(nf):
            img = np.zeros((h, w), dtype=np.uint8)
            for b in range(bw * bh):
                by, bx = divmod(b, bw)
                img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = 2 * (
                    (seed * 13 + f * 7 + b * 3) % 128
                )
            imgs.append(img)
        avi = _build_avi([_encode_jpeg_gray(i) for i in imgs], w, h, usec)
        parsed = _parse_avi(avi)
        assert parsed is not None
        got_usec, declared, payloads = parsed
        assert got_usec == usec and declared == nf and len(payloads) == nf
        for img, payload in zip(imgs, payloads):
            dec = _parse_jpeg(payload)
            assert dec is not None
            fmt, dw, dh, ch, px = dec
            assert (dw, dh, ch) == (w, h, 1)
            assert np.array_equal(px.reshape(h, w), img)

    check()


def test_block_downsample_rejects_indivisible_frames(spark):
    """A frame not divisible by the block (e.g. 4px wide) must FAIL
    loudly, not emit NULL-poisoned tiles (r10 review finding)."""
    import pytest

    from kolang_spark.llm.multimodal import block_downsample

    df = spark.createDataFrame(
        [(1, list(range(8)), 4, 2)], "doc_id long, pixels array<int>, w int, h int"
    )
    bad = df.select(
        block_downsample(F.col("pixels"), F.col("w"), F.col("h")).alias("t")
    )
    with pytest.raises(Exception, match="block_downsample"):
        bad.collect()


def test_block_downsample_rejects_bad_pixels_array(spark):
    """A NULL pixels array, or one shorter than width*height, passes
    the dimension checks but would NULL-poison every tile through
    element_at with ANSI off — the guard must fail it loudly too
    (r10 advisor finding)."""
    import pytest

    from kolang_spark.llm.multimodal import block_downsample

    for pixels in (None, list(range(32))):  # NULL / 32 < 8*8
        df = spark.createDataFrame(
            [(1, pixels, 8, 8)],
            "doc_id long, pixels array<int>, w int, h int",
        )
        bad = df.select(
            block_downsample(F.col("pixels"), F.col("w"), F.col("h")).alias("t")
        )
        with pytest.raises(Exception, match="block_downsample"):
            bad.collect()
