"""Multimodal column conventions: image/audio/video as opaque ``binary``
columns with typed metadata structs, plus Arrow-batched processing
(decode / feature-extract / frame-sample).

The decode step is REAL: :func:`decode_image` parses binary P6 PPM,
24-bit uncompressed BMP, and PNG (8-bit RGB/RGBA, stdlib ``zlib``
inflate + numpy scanline unfiltering for all five filter types)
payloads inside ``mapInPandas`` — header parse, stride/padding removal,
bottom-up row flip, BGR→RGB reorder, Sub/Up/Average/Paeth reversal —
and returns decoded dimensions plus pixel statistics that an
independent oracle can predict. Formats outside these come back as
``format='unknown'`` with NULL dimensions (no exception mid-pipeline at
scale). ``fake=True`` remains only as a test shim for exercising batch
plumbing with arbitrary (non-image) bytes.

:func:`synth_ppm_blobs` and :func:`synth_png_blobs` build *real* image
bytes natively in Column expressions (headers via ``encode``/hex
literals, pixels via hex-string → ``unhex``, PNG checksums via
closed-form adler32 + built-in ``crc32``), so a decode query needs no
Python on the synthesis side and a DuckDB oracle can predict every
decoded value closed-form from the id.

Scale posture: binary payloads ride the scan (parquet binary columns are
page-compressed and column-pruned like any other); metadata-only queries
never deserialize payload bytes; Arrow batching keeps the Python
boundary amortized (one buffer per ~10k rows, not per row). The decode
itself is the one sanctioned Python stage in the engine — per-byte media
parsing has no Catalyst expression.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "pack_blob",
    "blob_metadata",
    "synth_ppm_blobs",
    "synth_png_blobs",
    "synth_wav_blobs",
    "decode_image",
    "decode_audio",
    "extract_features",
    "sample_frames",
]

BLOB_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("header_hex", T.StringType()),
    ]
)


def pack_blob(
    df: DataFrame,
    src_col: str,
    out: str = "content",
    format: str = "bin",  # noqa: A002 — mirrors common metadata naming
) -> DataFrame:
    """Pack a string column into the canonical (binary content + metadata
    struct) convention. For real media the binary would come from
    ``spark.read.format('binaryFile')`` — the downstream plumbing is
    identical."""
    content = F.encode(F.col(src_col), "UTF-8")
    meta = F.struct(
        F.lit(format).alias("format"),
        F.octet_length(content).cast("long").alias("n_bytes"),
        F.substring(F.hex(content), 1, 8).alias("header_hex"),
    )
    return df.withColumn(out, content).withColumn(f"{out}_meta", meta)


def blob_metadata(df: DataFrame, blob_col: str = "content") -> DataFrame:
    """Metadata-only view of a blob column (no payload decode): size,
    header bytes. Pure expressions — a metadata query at 100 TB reads
    only the binary column's statistics-pruned pages it needs."""
    c = F.col(blob_col)
    return df.select(
        *[x for x in df.columns if x != blob_col],
        F.octet_length(c).cast("long").alias("n_bytes"),
        F.substring(F.hex(c), 1, 8).alias("header_hex"),
    )


# ------------------------------------------------------------ synthesis


def synth_ppm_blobs(
    df: DataFrame,
    id_col: str = "doc_id",
    out: str = "content",
) -> DataFrame:
    """Attach a *real*, valid binary P6 PPM blob per row, derived
    deterministically from ``id_col`` — pure Column expressions, no
    Python.

    Layout (all closed-form in the id, so an independent oracle can
    predict every decoded statistic without parsing bytes):

    - ``width  = 4 + id % 8``  (4..11)
    - ``height = 4 + id % 5``  (4..8)
    - header ``"P6\\n{w} {h}\\n255\\n"`` (ASCII)
    - pixel byte ``i`` (row-major RGB) = ``(id*7 + i*13) % 256``

    Pixels are built as a hex string (``transform`` over a ``sequence``
    spine, ``lpad(hex(...))`` per byte) and materialized with ``unhex``
    — the only way to construct arbitrary bytes JVM-side, and still a
    per-row O(w·h) codegen expression with no shuffle.
    """
    i = F.col(id_col).cast("long")
    w = (i % 8 + 4).cast("int")
    h = (i % 5 + 4).cast("int")
    npx = w.cast("long") * h.cast("long") * 3
    header = F.concat(
        F.lit("P6\n"),
        w.cast("string"),
        F.lit(" "),
        h.cast("string"),
        F.lit("\n255\n"),
    )
    pix_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0).cast("long"), npx - 1),
            lambda j: F.lpad(F.hex((i * 7 + j * 13) % 256), 2, "0"),
        ),
        "",
    )
    blob = F.concat(F.encode(header, "UTF-8"), F.unhex(pix_hex))
    return df.withColumn(out, blob)


def synth_png_blobs(
    df: DataFrame,
    id_col: str = "doc_id",
    out: str = "content",
) -> DataFrame:
    """Attach a *real*, spec-valid binary PNG per row (8-bit RGB,
    non-interlaced), derived deterministically from ``id_col`` — pure
    Column expressions, no Python and no compressor.

    Same closed-form pixel layout as :func:`synth_ppm_blobs` (so the
    oracle predicts identical pixel statistics):

    - ``width  = 4 + id % 8``, ``height = 4 + id % 5``
    - pixel byte ``i`` (row-major RGB) = ``(id*7 + i*13) % 256``
    - every scanline uses filter type 0 (None)

    The trick that keeps this JVM-side: the IDAT zlib stream uses a
    single **stored** (BTYPE=00, uncompressed) deflate block — legal
    zlib that needs no compressor — so the only non-trivial pieces are
    the adler32 checksum (closed-form two-sum ``F.aggregate`` over the
    byte sequence) and the per-chunk CRC-32, which is exactly Spark's
    built-in ``F.crc32``. Total blob length = ``68 + h*(1+3w)`` bytes.
    """
    i = F.col(id_col).cast("long")
    w = (i % 8 + 4).cast("long")
    h = (i % 5 + 4).cast("long")
    rowbytes = w * 3  # bytes per scanline, excluding the filter byte
    npx = rowbytes * h
    stream_len = (rowbytes + 1) * h  # raw deflate payload incl. filter bytes

    def byte_at(j):  # pixel byte j (row-major, filter bytes excluded)
        return (i * 7 + j * 13) % 256

    def hex2(c):
        return F.lpad(F.hex(c), 2, "0")

    def hex8(c):
        return F.lpad(F.hex(c), 8, "0")

    def le16(c):  # 2-byte little-endian hex
        return F.concat(hex2(c % 256), hex2(((c - c % 256) / 256).cast("long")))

    # raw stream: per row, one 0x00 filter byte then the row's pixels
    raw_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0).cast("long"), h - 1),
            lambda r: F.concat(
                F.lit("00"),
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(0).cast("long"), rowbytes - 1),
                        lambda k: hex2(byte_at(r * rowbytes + k)),
                    ),
                    "",
                ),
            ),
        ),
        "",
    )

    # adler32 over the raw stream: A = 1 + Σd  (mod 65521);
    # B = Σ_p A_after_p = L + Σ_p (L-p)·d_p (mod 65521). Filter bytes are
    # zero, so both sums run over pixel bytes only; pixel byte j sits at
    # stream position p(j) = j + j//rowbytes + 1.
    s_sum = F.aggregate(
        F.sequence(F.lit(0).cast("long"), npx - 1),
        F.lit(0).cast("long"),
        lambda acc, j: acc + byte_at(j),
    )
    w_sum = F.aggregate(
        F.sequence(F.lit(0).cast("long"), npx - 1),
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + (
            stream_len
            - (j + ((j - j % rowbytes) / rowbytes).cast("long") + 1)
        )
        * byte_at(j),
    )
    adler_a = (s_sum + 1) % 65521
    adler_b = (stream_len + w_sum) % 65521
    adler_hex = hex8(adler_b * 65536 + adler_a)

    # zlib: 0x78 0x01 header, one final stored block (BFINAL=1 BTYPE=00),
    # LEN/NLEN little-endian, raw bytes, adler32 big-endian
    z_hex = F.concat(
        F.lit("780101"),
        le16(stream_len),
        le16(65535 - stream_len),
        raw_hex,
        adler_hex,
    )

    ihdr_data_hex = F.concat(hex8(w), hex8(h), F.lit("0802000000"))
    crc_ihdr = hex8(F.crc32(F.unhex(F.concat(F.lit("49484452"), ihdr_data_hex))))
    crc_idat = hex8(F.crc32(F.unhex(F.concat(F.lit("49444154"), z_hex))))

    blob_hex = F.concat(
        F.lit("89504E470D0A1A0A"),  # PNG signature
        F.lit("0000000D49484452"),  # IHDR length + type
        ihdr_data_hex,
        crc_ihdr,
        hex8(stream_len + 11),  # IDAT length (zlib hdr 2 + stored hdr 5 + L + adler 4)
        F.lit("49444154"),
        z_hex,
        crc_idat,
        F.lit("0000000049454E44AE426082"),  # IEND
    )
    return df.withColumn(out, F.unhex(blob_hex))


def synth_wav_blobs(
    df: DataFrame,
    id_col: str = "doc_id",
    out: str = "content",
    sample_rate: int = 8000,
) -> DataFrame:
    """Attach a *real*, spec-valid RIFF/WAVE blob per row (mono 16-bit
    PCM), derived deterministically from ``id_col`` — pure Column
    expressions.

    Closed-form layout (everything oracle-predictable from the id):

    - ``n_samples = 64 + id % 64`` (64..127)
    - sample ``k``: the stored 16-bit word is ``w = (id*31 + k*17) %
      65536`` (little-endian); the decoded int16 is its two's
      complement reading, ``w - 65536 if w >= 32768 else w``

    Canonical 44-byte RIFF header (PCM fmt chunk) + the sample data;
    total blob length = ``44 + 2*n_samples`` bytes.
    """
    i = F.col(id_col).cast("long")
    n = (i % 64 + 64).cast("long")
    data_size = n * 2

    def hex2(c):
        return F.lpad(F.hex(c), 2, "0")

    def le16(c):
        return F.concat(hex2(c % 256), hex2(((c - c % 256) / 256).cast("long")))

    def le32(c):
        lo = c % 65536
        hi = ((c - lo) / 65536).cast("long")
        return F.concat(le16(lo), le16(hi))

    def le32_const(v: int) -> str:
        return bytes([v & 255, (v >> 8) & 255, (v >> 16) & 255, (v >> 24) & 255]).hex().upper()

    # unsigned 16-bit word per sample: (id*31 + k*17) % 65536 is the
    # two's-complement bit pattern of the int16 sample — emit it LE
    samples_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0).cast("long"), n - 1),
            lambda k: le16((i * 31 + k * 17) % 65536),
        ),
        "",
    )
    blob_hex = F.concat(
        F.lit("52494646"),  # 'RIFF'
        le32(data_size + 36),
        F.lit("57415645"),  # 'WAVE'
        F.lit("666D7420"),  # 'fmt '
        F.lit(le32_const(16)),  # fmt chunk size
        F.lit("0100"),  # PCM
        F.lit("0100"),  # mono
        F.lit(le32_const(sample_rate)),
        F.lit(le32_const(sample_rate * 2)),  # byte rate
        F.lit("0200"),  # block align
        F.lit("1000"),  # 16 bits
        F.lit("64617461"),  # 'data'
        le32(data_size),
        samples_hex,
    )
    return df.withColumn(out, F.unhex(blob_hex))


# -------------------------------------------------------------- decode


def _parse_ppm(b: bytes) -> Optional[Tuple[str, int, int, int, np.ndarray]]:
    """Binary P6 PPM: ``P6`` magic, whitespace/comment-separated ASCII
    width/height/maxval, one whitespace, then raw RGB rows."""
    if not b.startswith(b"P6"):
        return None
    pos, vals = 2, []
    n = len(b)
    while len(vals) < 3:
        while pos < n and b[pos : pos + 1].isspace():
            pos += 1
        if pos < n and b[pos : pos + 1] == b"#":  # comment to end of line
            while pos < n and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not b[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            return None
        try:
            vals.append(int(b[start:pos]))
        except ValueError:
            return None
    w, h, maxval = vals
    pos += 1  # exactly one whitespace byte after maxval
    need = w * h * 3
    if maxval != 255 or w <= 0 or h <= 0 or n - pos < need:
        return None
    px = np.frombuffer(b, dtype=np.uint8, offset=pos, count=need)
    return ("ppm", w, h, 3, px)


def _parse_bmp(b: bytes) -> Optional[Tuple[str, int, int, int, np.ndarray]]:
    """24-bit uncompressed (BI_RGB) BMP with a BITMAPINFOHEADER: rows
    padded to 4-byte stride, stored bottom-up (positive height) in BGR;
    returned as logical top-down row-major RGB bytes."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    off = int.from_bytes(b[10:14], "little")
    hdr_size = int.from_bytes(b[14:18], "little")
    if hdr_size < 40:
        return None
    w = int.from_bytes(b[18:22], "little", signed=True)
    h_raw = int.from_bytes(b[22:26], "little", signed=True)
    planes = int.from_bytes(b[26:28], "little")
    bpp = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if planes != 1 or bpp != 24 or compression != 0 or w <= 0 or h_raw == 0:
        return None
    bottom_up = h_raw > 0
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3
    if len(b) - off < stride * h:
        return None
    rows = np.frombuffer(b, dtype=np.uint8, offset=off, count=stride * h)
    rows = rows.reshape(h, stride)[:, : w * 3]  # drop row padding
    if bottom_up:
        rows = rows[::-1]
    px = rows.reshape(h, w, 3)[:, :, ::-1].reshape(-1)  # BGR → RGB
    return ("bmp", w, h, 3, np.ascontiguousarray(px))


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, w: int, h: int, ch: int) -> Optional[np.ndarray]:
    """Reverse PNG scanline filtering (types 0-4: None/Sub/Up/Average/
    Paeth) → top-down row-major pixel bytes. Up/None/Average vectorize
    per row; Sub/Paeth carry a within-row recurrence, walked per byte
    (scanlines are short; the Arrow batch amortizes the Python cost)."""
    stride = w * ch
    if len(raw) != h * (stride + 1):
        return None
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = arr[:, 0]
    data = arr[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        f = int(ftypes[r])
        cur = data[r]
        prior = out[r - 1].astype(np.int32) if r else zero_row
        if f == 0:
            rec = cur
        elif f == 2:  # Up
            rec = cur + prior
        elif f in (1, 3, 4):  # Sub / Average / Paeth: left-recurrent
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = int(rec[x - ch]) & 0xFF if x >= ch else 0
                up = int(prior[x]) & 0xFF
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + up) >> 1
                else:
                    c = int(prior[x - ch]) & 0xFF if x >= ch else 0
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                rec[x] = cur[x] + pred
        else:
            return None
        out[r] = rec & 0xFF
    return out.reshape(-1)


def _parse_png(b: bytes) -> Optional[Tuple[str, int, int, int, np.ndarray]]:
    """PNG (RFC 2083): 8-byte signature then length/type/data/crc chunks.
    Supported: 8-bit depth, color type 2 (RGB) / 6 (RGBA), deflate
    compression, filter method 0, non-interlaced — decoded with stdlib
    ``zlib`` + numpy unfiltering. Anything else → None (caller reports
    ``format='unknown'``)."""
    import zlib

    if b[:8] != _PNG_SIG:
        return None
    pos, n = 8, len(b)
    w = h = None
    ch = 0
    idat = []
    while pos + 8 <= n:
        ln = int.from_bytes(b[pos : pos + 4], "big")
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            return None
        if typ == b"IHDR":
            if ln < 13:
                return None
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            bitd, ct, comp, filt, ilace = data[8], data[9], data[10], data[11], data[12]
            if bitd != 8 or ct not in (2, 6) or comp or filt or ilace:
                return None
            ch = 3 if ct == 2 else 4
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # len + type + data + crc
    if not w or not h or not idat:
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    px = _png_unfilter(raw, w, h, ch)
    if px is None:
        return None
    return ("png", w, h, ch, px)


def _parse_image(b: bytes) -> Optional[Tuple[str, int, int, int, np.ndarray]]:
    if b[:2] == b"P6":
        return _parse_ppm(b)
    if b[:2] == b"BM":
        return _parse_bmp(b)
    if b[:8] == _PNG_SIG:
        return _parse_png(b)
    return None


def _parse_wav(b: bytes) -> Optional[Tuple[int, int, np.ndarray]]:
    """RIFF/WAVE with PCM (format 1) 16-bit samples: chunk-walk to the
    ``fmt `` and ``data`` chunks; returns (sample_rate, n_channels,
    int16 samples interleaved). Anything else (float/ADPCM/8-bit/
    truncated) → None."""
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, n = 12, len(b)
    rate = chans = bits = fmt_code = None
    data = None
    while pos + 8 <= n:
        typ = b[pos : pos + 4]
        ln = int.from_bytes(b[pos + 4 : pos + 8], "little")
        body = b[pos + 8 : pos + 8 + ln]
        if len(body) < ln:
            return None
        if typ == b"fmt ":
            if ln < 16:
                return None
            fmt_code = int.from_bytes(body[0:2], "little")
            chans = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif typ == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # RIFF chunks are word-aligned
    if fmt_code != 1 or bits != 16 or not rate or not chans or data is None:
        return None
    usable = len(data) - (len(data) % (2 * chans))
    samples = np.frombuffer(data, dtype="<i2", count=usable // 2)
    return (rate, chans, samples)


_DECODE_SCHEMA = (
    "doc_id long, format string, width int, height int, n_channels int, "
    "n_bytes long, sum_pixel long, first_pixel int, mean_pixel double"
)

_AUDIO_SCHEMA = (
    "doc_id long, format string, sample_rate int, n_channels int, "
    "n_samples long, n_bytes long, duration_s double, sum_sample long, "
    "first_sample int, peak_abs int"
)


def decode_image(
    df: DataFrame,
    blob_col: str = "content",
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """Decode image blobs via Arrow-batched ``mapInPandas``: P6 PPM and
    24-bit BMP are parsed for real (numpy header + pixel parse, stride
    and bottom-up handling, BGR→RGB); anything else yields
    ``format='unknown'`` with NULL dimensions rather than failing the
    stage — at 100 TB a poison blob must not kill the job.

    Output per blob: decoded ``width``/``height``/``n_channels`` plus
    pixel statistics (``sum_pixel``, ``first_pixel`` — the decoded
    top-left red byte, which proves row-flip/channel order — and
    ``mean_pixel``). All are oracle-predictable for
    :func:`synth_ppm_blobs` payloads.

    ``fake=True`` is a TEST SHIM ONLY: deterministic header-derived
    pseudo-dimensions for exercising batch plumbing with non-image bytes.

    The UDF boundary here is the *legitimate* use of Python: per-byte
    media decoding has no Catalyst expression. Batches arrive as Arrow
    buffers (zero-copy binary), one pandas frame per ~10k rows.
    """
    src = df.select(F.col(id_col).alias("doc_id"), F.col(blob_col).alias("blob"))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_rows = len(pdf)
            fmt = np.empty(n_rows, dtype=object)
            width = np.full(n_rows, None, dtype=object)
            height = np.full(n_rows, None, dtype=object)
            chans = np.full(n_rows, None, dtype=object)
            nbytes = np.zeros(n_rows, dtype=np.int64)
            sumpx = np.full(n_rows, None, dtype=object)
            firstpx = np.full(n_rows, None, dtype=object)
            meanpx = np.full(n_rows, None, dtype=object)
            for i, b in enumerate(pdf["blob"]):
                b = bytes(b) if b is not None else b""
                nbytes[i] = len(b)
                if fake:  # test shim: pseudo-dims from header bytes
                    fmt[i] = "fake"
                    width[i] = 16 + (b[0] if len(b) else 0)
                    height[i] = 16 + (b[1] if len(b) > 1 else 0)
                    chans[i] = 3
                    continue
                parsed = _parse_image(b)
                if parsed is None:
                    fmt[i] = "unknown"
                    continue
                f_, w_, h_, c_, px = parsed
                fmt[i] = f_
                width[i], height[i], chans[i] = w_, h_, c_
                s = int(px.sum(dtype=np.int64))
                sumpx[i] = s
                firstpx[i] = int(px[0]) if px.size else None
                meanpx[i] = s / px.size if px.size else None
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": fmt,
                    "width": width,
                    "height": height,
                    "n_channels": chans,
                    "n_bytes": nbytes,
                    "sum_pixel": sumpx,
                    "first_pixel": firstpx,
                    "mean_pixel": meanpx,
                }
            )

    return src.mapInPandas(decode_batches, schema=_DECODE_SCHEMA)


def decode_audio(
    df: DataFrame,
    blob_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decode audio blobs via Arrow-batched ``mapInPandas``: RIFF/WAVE
    PCM-16 is parsed for real (chunk walk, fmt/data extraction, numpy
    int16 samples); anything else yields ``format='unknown'`` with NULL
    audio fields — same poison-blob contract as :func:`decode_image`.

    Output per blob: ``sample_rate``/``n_channels``/``n_samples``
    (frames per channel)/``duration_s`` plus sample statistics
    (``sum_sample``, ``first_sample``, ``peak_abs``) — all
    oracle-predictable for :func:`synth_wav_blobs` payloads.
    """
    src = df.select(F.col(id_col).alias("doc_id"), F.col(blob_col).alias("blob"))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_rows = len(pdf)
            fmt = np.empty(n_rows, dtype=object)
            rate = np.full(n_rows, None, dtype=object)
            chans = np.full(n_rows, None, dtype=object)
            nsamp = np.full(n_rows, None, dtype=object)
            nbytes = np.zeros(n_rows, dtype=np.int64)
            dur = np.full(n_rows, None, dtype=object)
            ssum = np.full(n_rows, None, dtype=object)
            first = np.full(n_rows, None, dtype=object)
            peak = np.full(n_rows, None, dtype=object)
            for i, b in enumerate(pdf["blob"]):
                b = bytes(b) if b is not None else b""
                nbytes[i] = len(b)
                parsed = _parse_wav(b)
                if parsed is None:
                    fmt[i] = "unknown"
                    continue
                r_, c_, s = parsed
                frames = s.size // c_
                fmt[i] = "wav"
                rate[i], chans[i], nsamp[i] = r_, c_, frames
                dur[i] = frames / r_
                if s.size:
                    ssum[i] = int(s.sum(dtype=np.int64))
                    first[i] = int(s[0])
                    peak[i] = int(np.abs(s.astype(np.int32)).max())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": fmt,
                    "sample_rate": rate,
                    "n_channels": chans,
                    "n_samples": nsamp,
                    "n_bytes": nbytes,
                    "duration_s": dur,
                    "sum_sample": ssum,
                    "first_sample": first,
                    "peak_abs": peak,
                }
            )

    return src.mapInPandas(decode_batches, schema=_AUDIO_SCHEMA)


# ------------------------------------------------------------ features


def extract_features(
    df: DataFrame,
    blob_col: str = "content",
    id_col: str = "doc_id",
    dims: int = 64,
    fake: bool = False,
) -> DataFrame:
    """Blob → feature vector (``array<double>``), Arrow-batched — the
    bridge from the multimodal convention into the similarity stack
    (output feeds :func:`kolang_spark.llm.similarity.lsh_topk` /
    ``brute_force_topk`` unchanged).

    Real path (default): image blobs (PPM/BMP) are decoded and
    featurized from their *pixel* bytes; any other payload is featurized
    from its raw bytes. The feature fold is a strided positional mean —
    ``f[k] = mean(values at indices ≡ k mod dims) / 255`` (zero-padded
    to a multiple of ``dims``) — a real, content- and layout-sensitive
    signature that is deterministic under any partitioning. Not a neural
    encoder; swap the fold for one when a model runtime is available —
    the Arrow plumbing is identical.

    ``fake=True`` is a test shim (md5-seeded random vector per blob).
    """
    import hashlib

    src = df.select(F.col(id_col).alias("doc_id"), F.col(blob_col).alias("blob"))
    schema = "doc_id long, features array<double>"

    def _fold(values: np.ndarray) -> list:
        if values.size == 0:
            return [0.0] * dims
        pad = (-values.size) % dims
        v = np.pad(values.astype(np.float64), (0, pad))
        return (v.reshape(-1, dims).mean(axis=0) / 255.0).tolist()

    def embed_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:

                def vec(b: bytes):
                    seed = int.from_bytes(hashlib.md5(bytes(b)).digest()[:8], "big")
                    return np.random.default_rng(seed).random(dims).tolist()

            else:

                def vec(b: bytes):
                    b = bytes(b) if b is not None else b""
                    parsed = _parse_image(b)
                    values = (
                        parsed[4]
                        if parsed is not None
                        else np.frombuffer(b, dtype=np.uint8)
                    )
                    return _fold(values)

            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "features": pdf["blob"].map(vec)}
            )

    return src.mapInPandas(embed_batches, schema=schema)


def sample_frames(
    df: DataFrame,
    meta_col: str = "content_meta",
    id_col: str = "doc_id",
    fps: int = 1,
    duration_s_col: Optional[str] = None,
) -> DataFrame:
    """Frame-sampling plumbing for video blobs: one output row per
    sampled frame index. The index spine is a native
    ``sequence``+``explode`` (no Python); actual frame extraction would
    chain :func:`decode_image`-style ``mapInPandas`` on the exploded
    rows. Duration defaults to a bytes-derived deterministic stand-in
    when no duration column exists (stub container, same plumbing)."""
    duration = (
        F.col(duration_s_col)
        if duration_s_col
        else (F.col(meta_col)["n_bytes"] % 10 + 1)
    )
    n_frames = (duration * fps).cast("int")
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    )
