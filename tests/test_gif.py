"""Multi-frame GIF container (`kolang_spark/llm/multimodal.py::
synth_gif_blobs/_parse_gif/_gif_lzw_decode/decode_gif_frames`):
closed-form synth↔decode round trip, a REAL LZW compressor (with code
width growth + mid-stream CLEAR) exercising the general decoder path,
and the poison-blob contract."""

import random

from pyspark.sql import functions as F

from kolang_spark.llm.multimodal import (
    _gif_lzw_decode,
    _parse_gif,
    decode_gif_frames,
    synth_gif_blobs,
)


def _expected(doc_id):
    w, h, nf = 3 + doc_id % 4, 3 + doc_id % 3, 2 + doc_id % 3
    frames = []
    for f in range(nf):
        idx = [(doc_id * 7 + f * 31 + p * 13) % 128 for p in range(w * h)]
        frames.append((w, h, f, idx))
    return frames


def test_synth_decode_roundtrip(spark):
    df = spark.createDataFrame([(i,) for i in range(24)], ["doc_id"])
    out = decode_gif_frames(synth_gif_blobs(df)).collect()
    rows = {(r.doc_id, r.frame_idx): r for r in out}
    total = 0
    for i in range(24):
        frames = _expected(i)
        for f, (w, h, delay, idx) in enumerate(frames):
            r = rows[(i, f)]
            assert (r.width, r.height, r.delay_cs, r.n_frames) == (
                w,
                h,
                delay,
                len(frames),
            )
            assert r.n_pixels == w * h
            assert r.sum_index == sum(idx)
            assert r.first_index == idx[0]
            assert abs(r.mean_index - sum(idx) / len(idx)) < 1e-12
            total += 1
    assert len(out) == total


def test_parse_gif_bytes_directly(spark):
    """The container walk sees a GCT of 128 grayscale entries and the
    right screen descriptor."""
    df = spark.createDataFrame([(7,)], ["doc_id"])
    blob = bytes(synth_gif_blobs(df).collect()[0].content)
    assert blob[:6] == b"GIF89a"
    sw, sh, palette, frames = _parse_gif(blob)
    assert (sw, sh) == (3 + 7 % 4, 3 + 7 % 3)
    assert palette.shape == (128, 3)
    assert [tuple(p) for p in palette[:3]] == [(0, 0, 0), (2, 2, 2), (4, 4, 4)]
    assert len(frames) == 2 + 7 % 3


def _lzw_compress(indices, min_code_size, clear_every=None):
    """Reference GIF-LZW compressor (string-table build, LSB-first
    packing, width growth at table size 2^width, cap 12 bits,
    optional mid-stream CLEAR) — written here independently so the
    decoder is tested against real compressed streams, not just the
    byte-aligned synthesis case."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out_codes = [clear]

    def fresh():
        return {(c,): c for c in range(clear)}

    table = fresh()
    next_code = eoi + 1
    cur = ()
    emitted_since_clear = 0
    for s in indices:
        nxt = cur + (s,)
        if nxt in table:
            cur = nxt
            continue
        out_codes.append(table[cur])
        emitted_since_clear += 1
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
        cur = (s,)
        if clear_every and emitted_since_clear >= clear_every:
            # CLEAR must land on a phrase boundary: flush the pending
            # phrase first, or the compressor/decoder string tables
            # desynchronize by one entry
            out_codes.append(table[cur])
            out_codes.append(clear)
            table = fresh()
            next_code = eoi + 1
            cur = ()
            emitted_since_clear = 0
    if cur:
        out_codes.append(table[cur])
    out_codes.append(eoi)

    # pack: width tracks the DECODER's table size so both sides agree
    buf = bytearray()
    acc = nbits = 0
    width = min_code_size + 1
    dec_next = eoi + 1
    dec_primed = False
    for code in out_codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if code == clear:
            width = min_code_size + 1
            dec_next = eoi + 1
            dec_primed = False
        elif code != eoi:
            if dec_primed:
                dec_next += 1
                if dec_next == (1 << width) and width < 12:
                    width += 1
            dec_primed = True
    if nbits:
        buf.append(acc & 0xFF)
    return bytes(buf)


def test_lzw_decoder_against_reference_compressor():
    rng = random.Random(42)
    for mcs in (2, 4, 7):
        for trial in range(6):
            n = rng.randrange(200, 1500)
            sym = 1 << mcs
            # repetitive data drives real table growth (width increases)
            base = [rng.randrange(sym) for _ in range(12)]
            indices = [base[i % len(base)] for i in range(n)]
            stream = _lzw_compress(indices, mcs)
            got = _gif_lzw_decode(stream, mcs, n + 4096)
            assert got == indices, (mcs, trial, "plain")
            stream2 = _lzw_compress(indices, mcs, clear_every=50)
            got2 = _gif_lzw_decode(stream2, mcs, n + 4096)
            assert got2 == indices, (mcs, trial, "with clears")


def test_poison_blobs(spark):
    df = spark.createDataFrame(
        [(1, b"GIF89a\x00"), (2, b"not a gif"), (3, None), (4, b"")],
        "doc_id long, content binary",
    )
    rows = {r.doc_id: r for r in decode_gif_frames(df).collect()}
    assert len(rows) == 4
    for i in (1, 2, 3, 4):
        assert rows[i].n_frames == 0
        assert rows[i].frame_idx is None
        assert rows[i].width is None


def test_frames_feed_sample_frames_spine(spark):
    """The decoded frame stream joins the sample_frames index spine:
    sampling every 2nd frame of the real frame rows."""
    df = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    frames = decode_gif_frames(synth_gif_blobs(df))
    sampled = frames.where(F.col("frame_idx") % 2 == 0)
    got = sampled.groupBy("doc_id").count().collect()
    for r in got:
        nf = 2 + r.doc_id % 3
        assert r["count"] == (nf + 1) // 2


def test_frame_index_ahash_chain(spark):
    """include_pixels hands the decoded index arrays to Column-side
    ops; frame_index_ahash matches a python reference bit-for-bit."""
    from kolang_spark.llm.multimodal import frame_index_ahash

    df = spark.createDataFrame([(i,) for i in range(10)], ["doc_id"])
    frames = decode_gif_frames(synth_gif_blobs(df), include_pixels=True)
    rows = frames.select(
        "doc_id",
        "frame_idx",
        "indices",
        frame_index_ahash(F.col("indices")).alias("ahash"),
    ).collect()
    assert rows
    for r in rows:
        idx = list(r.indices)
        n, s = len(idx), sum(idx)
        expect = sum(1 << p for p, x in enumerate(idx) if x * n > s)
        assert r.ahash == expect, (r.doc_id, r.frame_idx)
        # and the decoded indices are the closed-form synthesis
        exp_idx = [
            (r.doc_id * 7 + r.frame_idx * 31 + p * 13) % 128
            for p in range(n)
        ]
        assert idx == exp_idx
