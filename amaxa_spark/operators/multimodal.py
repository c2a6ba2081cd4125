"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
typed metadata struct alongside. The Spark-side plumbing — schema,
Arrow batch shape, ``mapInPandas`` signatures, partitioning — is real
and tested; the actual codec work is stubbed (this environment ships
no image/audio libraries): :func:`decode_stub` parses a deterministic
fake header, and the real-codec entry points raise
``NotImplementedError`` with a clear marker.

At scale the pattern is: keep payloads in their own column so parquet
column pruning skips them unless touched, and run codec UDFs through
``mapInPandas`` (Arrow batches, one Python worker per core) with
``spark.sql.files.maxPartitionBytes`` sized so a batch of payloads
fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic fake payload: 8-byte magic + content bytes
_MAGIC = b"FAKEIMG1"


def _spread(df: DataFrame) -> DataFrame:
    """Spread a small input across idle cores before the per-row
    Python codec work: synthesis/decyphering gates read a tiny
    projection (doc ids) that arrives as ONE scan partition at bench
    scale, serializing every mapInPandas codec pass onto a single
    Python worker. Round-robin repartition to defaultParallelism ONLY
    when the plan yields fewer partitions (no-op at scale — guide
    §2.5 input skew / §4 keep every core's Python worker busy)."""
    from amaxa_spark.operators.similarity import _scale_out

    return _scale_out(df)


def synthesize_payload(df: DataFrame, src_col: str, out_col: str = "payload") -> DataFrame:
    """Build a deterministic binary payload column from a source
    column (test stand-in for real image/audio bytes)."""
    return df.withColumn(
        out_col,
        F.concat(F.lit(_MAGIC), F.encode(F.col(src_col).cast("string"), "UTF-8")),
    )


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decoder: derives plausible image metadata
    from the payload bytes. Replace with a real codec (PIL/ffmpeg)
    when available."""
    if payload is None:
        return {"valid": False, "n_bytes": 0, "width": 0, "height": 0, "fmt": None}
    n = len(payload)
    valid = payload[:8] == _MAGIC
    return {
        "valid": valid,
        "n_bytes": n,
        "width": (n % 640) + 1,
        "height": ((n * 7) % 480) + 1,
        "fmt": "fake/v1" if valid else None,
    }


def decode_real(payload: bytes) -> dict:
    """Real-codec injection point. Four raster formats decode
    natively without PIL/libvips — BMP (stdlib struct + numpy,
    :func:`decode_bmp`), PNG (stdlib zlib inflate + scanline
    unfiltering, :func:`decode_png`), baseline JPEG (pure
    Huffman + IDCT + 4:2:0 upsampling, :func:`decode_jpeg`), and
    GIF (variable-width LZW, :func:`decode_gif`); other formats
    (WebP/AVIF/...) still require an image library and raise with a
    clear marker."""
    if payload is not None and payload[:2] == _BMP_MAGIC:
        meta = decode_bmp(payload)
        fmt = "bmp/24"
    elif payload is not None and payload[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        meta = decode_png(payload)
        fmt = "png/rgb8"
    elif payload is not None and payload[:2] == _JPEG_SOI:
        meta = decode_jpeg(payload)
        fmt = "jpeg/baseline"
    elif payload is not None and payload[:6] in _GIF_MAGICS:
        meta = decode_gif(payload)
        fmt = "gif/8bpp"
    else:
        raise NotImplementedError(
            "non-BMP/PNG/JPEG/GIF image decode: codec libraries not available"
        )
    if meta is None:
        return {
            "valid": False, "n_bytes": len(payload),
            "width": 0, "height": 0, "fmt": None,
        }
    return {
        "valid": True,
        "n_bytes": len(payload),
        "width": meta["width"],
        "height": meta["height"],
        "fmt": fmt,
    }


def image_header_meta(payload: bytes) -> dict:
    """Header-ONLY image metadata — dimensions and format without
    decoding a single pixel: BMP from the BITMAPINFOHEADER, PNG from
    the IHDR chunk, JPEG by walking marker segments to the first SOFn
    (no entropy decode, no Huffman). This is the corpus-wide filter
    tool: ~3 orders of magnitude faster per image than a full decode
    (measured in SCALE_NOTES §"JPEG codec throughput ceiling"), so
    dimension/format selection over billions of images never pays the
    codec; the full decoder runs only on the selected subset.
    Returns the same dict shape as :func:`decode_real`; malformed
    payloads are ``valid: False`` rows, never exceptions."""
    import struct

    n = 0 if payload is None else len(payload)
    bad = {"valid": False, "n_bytes": n, "width": 0, "height": 0, "fmt": None}
    if payload is None:
        return bad
    try:
        if payload[:2] == _BMP_MAGIC:
            if n < 26:
                return bad
            w, h = struct.unpack_from("<ii", payload, 18)
            if w <= 0 or h == 0:
                # negative biHeight is legal (top-down rows); negative
                # biWidth and zero dims never are — same guard as
                # decode_bmp, so filter and decoder agree on validity
                return bad
            return {"valid": True, "n_bytes": n, "width": w,
                    "height": abs(h), "fmt": "bmp/24"}
        if payload[: len(_PNG_MAGIC)] == _PNG_MAGIC:
            if n < 24 or payload[12:16] != b"IHDR":
                return bad
            w, h = struct.unpack_from(">II", payload, 16)
            if w == 0 or h == 0:
                return bad  # zero dims are invalid per the PNG spec
            return {"valid": True, "n_bytes": n, "width": w,
                    "height": h, "fmt": "png/rgb8"}
        if payload[:6] in _GIF_MAGICS:
            # report the FIRST image descriptor's dims (what
            # decode_gif decodes), not the logical screen's — a real
            # GIF's first frame can be smaller than the canvas, and
            # the filter must agree with the decoder. Skipping the
            # color table and extension blocks is pure arithmetic on
            # length bytes; no pixel data is touched.
            if n < 13:
                return bad
            packed = payload[10]
            pos = 13
            if packed & 0x80:
                pos += 3 * (2 << (packed & 0x07))
            while pos < n:
                block = payload[pos]
                if block == 0x21:  # extension: label + sub-blocks
                    pos += 2
                    while pos < n and payload[pos] != 0:
                        pos += 1 + payload[pos]
                    pos += 1
                    continue
                if block != 0x2C:  # trailer/garbage before any image
                    return bad
                if pos + 9 >= n:
                    return bad
                w, h = struct.unpack_from("<HH", payload, pos + 5)
                if w == 0 or h == 0 or w * h > _GIF_MAX_PIXELS:
                    # decode_gif rejects zero-dim and over-budget
                    # frames — filter and decoder agree on validity
                    return bad
                return {"valid": True, "n_bytes": n, "width": w,
                        "height": h, "fmt": "gif/8bpp"}
            return bad
        if payload[:2] == _JPEG_SOI:
            i = 2
            while i + 4 <= n:
                if payload[i] != 0xFF:
                    return bad
                marker = payload[i + 1]
                if marker == 0xFF:
                    i += 1  # spec B.1.1.2: 0xFF fill bytes pad markers
                    continue
                if marker == 0xD9:
                    return bad  # EOI before any SOF: no frame header
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone markers carry no length
                    continue
                ln = struct.unpack_from(">H", payload, i + 2)[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    if i + 9 > n:
                        return bad
                    h, w = struct.unpack_from(">HH", payload, i + 5)
                    fmt = "jpeg/baseline" if marker == 0xC0 else "jpeg/other"
                    return {"valid": True, "n_bytes": n, "width": w,
                            "height": h, "fmt": fmt}
                if marker == 0xDA:  # scan begins, no SOF seen
                    return bad
                i += 2 + ln
            return bad
    except struct.error:
        return bad
    return bad


def extract_image_meta(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    codec=None,
) -> DataFrame:
    """mapInPandas metadata extraction over Arrow batches — the real
    distributed plumbing around a per-payload metadata function.
    ``codec(payload) -> dict`` defaults to the deterministic
    :func:`decode_stub`; pass :func:`image_header_meta` for the
    header-only fast path (the corpus-wide filter — ~4000× a full
    decode, SCALE_NOTES) or :func:`decode_real` for pixel-verified
    metadata.

    Returns (id, valid, n_bytes, width, height, fmt).
    """
    codec = codec or decode_stub
    schema = (
        f"{id_col} long, valid boolean, n_bytes int, width int, height int, fmt string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [codec(p) for p in pdf[payload_col]]
            out = pd.DataFrame(metas)
            out.insert(0, id_col, pdf[id_col].values)
            yield out[[id_col, "valid", "n_bytes", "width", "height", "fmt"]]

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def _resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resizer: keeps the magic header and
    truncates/pads the body to width*height//64 bytes — a stand-in
    with the same in/out contract as a real thumbnailer."""
    body_len = max(1, width * height // 64)
    body = payload[8 : 8 + body_len]
    return _MAGIC + body + b"\x00" * (body_len - len(body))


def resize_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    width: int = 224,
    height: int = 224,
    codec=None,
) -> DataFrame:
    """Image resize plumbing: mapInPandas over the binary column,
    returning (id, resized payload, out_bytes). ``codec(payload,
    width, height) -> bytes`` is the injection point for a real
    thumbnailer (PIL/libvips — not in this environment, so the
    default is the deterministic :func:`_resize_stub`; pass
    ``codec=multimodal.resize_real`` when the library exists).

    Scale notes: only (id, payload) is selected, so parquet column
    pruning skips every other column; Arrow moves the bytes to one
    Python worker per core in batches; output payload size is fixed
    by (width, height), so downstream partition sizing is
    predictable.
    """
    codec = codec or _resize_stub
    schema = f"{id_col} long, resized binary, out_bytes int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                None if p is None else codec(bytes(p), width, height)
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "resized": resized,
                    "out_bytes": [0 if r is None else len(r) for r in resized],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def resize_real(payload: bytes, width: int, height: int) -> bytes | None:
    """REAL image resize for BMP, PNG, and baseline-JPEG payloads —
    decode (:func:`decode_bmp` / :func:`decode_png` /
    :func:`decode_jpeg`), nearest-neighbor sample with the exact
    integer mapping ``src = (dst * src_dim) // dst_dim`` (replayable
    in SQL), re-encode in the SAME format. A
    CORRUPT payload (right magic but truncated/unsupported) returns
    ``None`` — a row-level data problem, handled by
    :func:`resize_images` as a null output, never an executor
    exception. Only genuinely unsupported formats (which would need
    PIL/libvips) raise, with a clear marker."""
    import numpy as np

    if payload is not None and payload[:2] == _BMP_MAGIC:
        m, encode = decode_bmp(payload), encode_bmp
    elif payload is not None and payload[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        m, encode = decode_png(payload), encode_png
    elif payload is not None and payload[:2] == _JPEG_SOI:
        m, encode = decode_jpeg(payload), encode_jpeg
    else:
        raise NotImplementedError(
            "non-BMP/PNG/JPEG image resize: codec libraries not available"
        )
    if m is None:
        return None
    px = m["pixels"]
    xs = (np.arange(width) * m["width"]) // width
    ys = (np.arange(height) * m["height"]) // height
    if encode is encode_jpeg:
        # a valid but high-frequency (noisy) source can produce AC
        # categories the baseline flat-quantization tables cannot
        # code (encode_jpeg raises ValueError) — that is a row-level
        # data limit of THIS encoder, not an executor error
        try:
            return encode(px[ys][:, xs])
        except ValueError:
            return None
    return encode(px[ys][:, xs])


def _frames_stub(payload: bytes, frame_bytes: int) -> list[bytes]:
    """Deterministic fake demuxer: the payload body is a sequence of
    fixed-size frames (last one ragged)."""
    body = payload[8:]
    return [body[i : i + frame_bytes] for i in range(0, len(body), frame_bytes)]


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_bytes: int = 16,
    every_n: int = 4,
    codec=None,
) -> DataFrame:
    """Video frame-sampling plumbing: mapInPandas demux returning one
    row per SAMPLED frame — (id, frame_idx, frame, n_frames_total).
    Row multiplicity changes inside the UDF (the part a scalar
    pandas_udf cannot do). ``codec(payload, frame_bytes) ->
    list[bytes]`` is the injection point for a real demuxer (ffmpeg —
    not in this environment; default is the fixed-size-chunk fake).

    At scale the output is ~1/every_n of the demuxed volume; sampling
    happens inside the Python worker so unsampled frames never cross
    back over Arrow.
    """
    codec = codec or _frames_stub
    schema = f"{id_col} long, frame_idx int, frame binary, n_frames_total int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, totals = [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                fs = codec(bytes(p), frame_bytes)
                for j in range(0, len(fs), every_n):
                    ids.append(i)
                    idxs.append(j)
                    frames.append(fs[j])
                    totals.append(len(fs))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                    "n_frames_total": pd.Series(totals, dtype="int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def frame_sample_real(payload: bytes, frame_bytes: int):  # pragma: no cover
    """STUB: real video demux requires ffmpeg bindings, not present
    in this environment."""
    raise NotImplementedError("video frame sampling: codec libraries not available")


# ---------------------------------------------------------------------------
# Image: REAL BMP codec (pure stdlib struct + numpy — no PIL needed).
# 24-bit uncompressed BITMAPINFOHEADER files are a genuine byte format
# with header offsets, 4-byte row padding, and bottom-up row order, so
# the decoder is tested against real structure, not a fake. The
# synthesizer is closed-form in the row id (like synthesize_wav), so
# the DuckDB oracle replays every derived statistic with pure
# arithmetic while the Spark path builds genuine BMP bytes and decodes
# them back through the decode_real injection path.

_BMP_MAGIC = b"BM"


def _round4(total, count) -> float:
    """Half-away-from-zero 4-decimal mean — the single rounding
    convention every codec statistic shares with the DuckDB oracles
    (DuckDB round() is half-away-from-zero; Python round() is
    banker's)."""
    import numpy as np

    return float(np.floor(total / count * 1e4 + 0.5) / 1e4)


def encode_bmp(pixels) -> bytes:
    """REAL 24-bit BMP encoder: (h, w, 3) uint8 RGB array in image
    orientation (y = 0 top) → canonical BITMAPINFOHEADER bytes
    (bottom-up rows, BGR order, 4-byte row padding). The exact inverse
    of :func:`decode_bmp`."""
    import struct

    h, w = pixels.shape[0], pixels.shape[1]
    pad = ((3 * w + 3) & ~3) - 3 * w
    bgr = pixels[..., ::-1]
    body = b"".join(
        bgr[y].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)
    )
    return (
        _BMP_MAGIC
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + body
    )


def synthesize_bmp(df: DataFrame, id_col: str, out_col: str = "image") -> DataFrame:
    """Deterministic 24-bit uncompressed BMP payloads: for row id
    ``d``, a ``(4 + d%5) × (3 + d%4)`` image whose pixel at image
    coordinates ``(x, y)`` (y = 0 is the TOP row) has channels
    ``r = (13d + 2x + y) % 256``, ``g = (11d + x + 2y) % 256``,
    ``b = (7d + 3x + 5y) % 256`` — encoded by :func:`encode_bmp` in
    the format's native bottom-up row order, BGR byte order, rows
    padded to 4 bytes. Closed-form in the id, so oracles replay every
    derived quantity."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for did in pdf[id_col]:
                d = int(did)
                w, h = 4 + d % 5, 3 + d % 4
                x = np.arange(w)
                y = np.arange(h)[:, None]
                r = (13 * d + 2 * x + y) % 256
                g = (11 * d + x + 2 * y) % 256
                b = (7 * d + 3 * x + 5 * y) % 256
                px = np.stack(
                    [r, g, b], axis=-1
                ).astype(np.uint8)  # (h, w, 3) RGB, y=0 top
                outs.append(encode_bmp(px))
            out = pdf.copy()
            out[out_col] = outs
            yield out

    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = StructType(list(df.schema.fields) + [StructField(out_col, BinaryType())])
    return _spread(df).mapInPandas(gen, schema=schema)


def decode_bmp(payload: bytes):
    """REAL 24-bit uncompressed BMP decoder. Honors the pixel-array
    offset from the file header, 4-byte row padding, and both
    bottom-up (positive height) and top-down (negative height) row
    orders. Returns ``{"width", "height", "pixels"}`` with pixels as
    an (h, w, 3) uint8 RGB array in image orientation (y = 0 top), or
    ``None`` for malformed/unsupported payloads (row-level errors,
    never executor exceptions)."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 54 or payload[:2] != _BMP_MAGIC:
        return None
    off = struct.unpack("<I", payload[10:14])[0]
    hdr_size, w, h = struct.unpack("<Iii", payload[14:26])
    _planes, bpp = struct.unpack("<HH", payload[26:30])
    comp = struct.unpack("<I", payload[30:34])[0]
    if hdr_size < 40 or bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = -h if top_down else h
    row_len = (3 * w + 3) & ~3
    if len(payload) < off + row_len * h:
        return None
    arr = np.frombuffer(
        payload, dtype=np.uint8, count=row_len * h, offset=off
    ).reshape(h, row_len)
    px = arr[:, : 3 * w].reshape(h, w, 3)  # file order, BGR
    if not top_down:
        px = px[::-1]
    return {"width": w, "height": h, "pixels": px[..., ::-1]}  # RGB


# ---------------------------------------------------------------------------
# Image: REAL PNG codec (pure stdlib zlib — no PIL needed). 8-bit
# truecolor non-interlaced PNG is a genuine compressed byte format:
# CRC-32-guarded chunks, one zlib-inflated pixel stream, and a
# per-scanline filter byte (None/Sub/Up/Average/Paeth) the decoder
# must invert against the reconstructed prior scanline. The encoder
# deliberately assigns filter ``y % 5`` to row y so a single
# round-trip exercises every filter type; the synthesizer is
# closed-form in the row id (like synthesize_bmp), so the DuckDB
# oracle replays every derived statistic with pure arithmetic while
# the Spark path inflates and unfilters genuine PNG bytes.

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data))
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4) — byte-exact integer form."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(pixels) -> bytes:
    """REAL 8-bit truecolor PNG encoder: (h, w, 3) uint8 RGB array →
    signature + IHDR + one zlib-compressed IDAT + IEND, CRC-32 per
    chunk. Scanline y carries filter type ``y % 5``, genuinely
    applied, so decoding exercises the full None/Sub/Up/Average/Paeth
    inverse set. The exact inverse of :func:`decode_png`."""
    import struct
    import zlib

    h, w = pixels.shape[0], pixels.shape[1]
    bpp = 3
    raw = pixels.astype("int64")  # filter arithmetic needs signed room
    lines = []
    for y in range(h):
        cur = raw[y].reshape(-1)
        prev = raw[y - 1].reshape(-1) if y > 0 else cur * 0
        ft = y % 5
        if ft == 0:
            filt = cur
        elif ft == 1:  # Sub
            left = cur * 0
            left[bpp:] = cur[:-bpp]
            filt = (cur - left) % 256
        elif ft == 2:  # Up
            filt = (cur - prev) % 256
        elif ft == 3:  # Average
            left = cur * 0
            left[bpp:] = cur[:-bpp]
            filt = (cur - (left + prev) // 2) % 256
        else:  # Paeth
            filt = cur.copy()
            for i in range(len(cur)):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                filt[i] = (int(cur[i]) - _paeth(a, b, c)) % 256
        lines.append(bytes([ft]) + bytes(filt.astype("uint8")))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """REAL 8-bit truecolor non-interlaced PNG decoder (stdlib zlib):
    verifies the signature and every chunk CRC, walks IHDR/IDAT/IEND
    (ancillary chunks skipped), inflates the concatenated IDAT stream,
    and inverts the per-scanline filter (None/Sub/Up/Average/Paeth —
    inherently sequential per pixel, fine at thumbnail sizes; a 100 TB
    corpus of large images would push this into a C codec behind the
    same seam). Returns ``{"width", "height", "pixels"}`` with pixels
    as an (h, w, 3) uint8 RGB array, or ``None`` for malformed or
    unsupported payloads (row-level errors, never executor
    exceptions)."""
    import struct
    import zlib

    import numpy as np

    if payload is None or payload[: len(_PNG_MAGIC)] != _PNG_MAGIC:
        return None
    pos, w = len(_PNG_MAGIC), None
    idat = []
    try:
        while pos + 8 <= len(payload):
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            tag = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + length]
            if len(data) < length or pos + 12 + length > len(payload):
                return None
            (crc,) = struct.unpack(
                ">I", payload[pos + 8 + length : pos + 12 + length]
            )
            if zlib.crc32(tag + data) != crc:
                return None
            pos += 12 + length
            if tag == b"IHDR":
                w, h, depth, ctype, comp, filt, ilace = struct.unpack(
                    ">IIBBBBB", data
                )
                if (depth, ctype, comp, filt, ilace) != (8, 2, 0, 0, 0):
                    return None  # only 8-bit RGB, no interlace
            elif tag == b"IDAT":
                idat.append(data)
            elif tag == b"IEND":
                break
        if w is None or not idat:
            return None
        raw = zlib.decompress(b"".join(idat))
    except (struct.error, zlib.error):
        return None
    bpp, stride = 3, 3 * w
    if len(raw) != h * (1 + stride):
        return None
    out = np.zeros((h, stride), dtype=np.int64)
    for y in range(h):
        line = raw[y * (1 + stride) : (y + 1) * (1 + stride)]
        ft, cur = line[0], np.frombuffer(
            line, dtype=np.uint8, offset=1
        ).astype(np.int64)
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        if ft == 0:
            rec = cur
        elif ft == 1:  # Sub
            rec = cur.copy()
            for i in range(bpp, stride):
                rec[i] = (rec[i] + rec[i - bpp]) % 256
        elif ft == 2:  # Up
            rec = (cur + prev) % 256
        elif ft == 3:  # Average
            rec = cur.copy()
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + (a + prev[i]) // 2) % 256
        elif ft == 4:  # Paeth
            rec = cur.copy()
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                c = int(prev[i - bpp]) if i >= bpp else 0
                rec[i] = (rec[i] + _paeth(a, int(prev[i]), c)) % 256
        else:
            return None
        out[y] = rec
    return {
        "width": w,
        "height": h,
        "pixels": out.astype(np.uint8).reshape(h, w, 3),
    }


def synthesize_png(df: DataFrame, id_col: str, out_col: str = "image") -> DataFrame:
    """Deterministic 8-bit RGB PNG payloads: for row id ``d``, a
    ``(4 + d%6) × (3 + d%5)`` image whose pixel at (x, y) has channels
    ``r = (13d + 2x + y) % 256``, ``g = (11d + x + 2y) % 256``,
    ``b = (7d + 3x + 5y) % 256`` (the synthesize_bmp formula over PNG
    dims), zlib-compressed by :func:`encode_png` with real per-row
    filters. Closed-form in the id, so oracles replay every derived
    quantity while Spark inflates genuine PNG bytes."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for did in pdf[id_col]:
                d = int(did)
                w, h = 4 + d % 6, 3 + d % 5
                x = np.arange(w)
                y = np.arange(h)[:, None]
                r = (13 * d + 2 * x + y) % 256
                g = (11 * d + x + 2 * y) % 256
                b = (7 * d + 3 * x + 5 * y) % 256
                px = np.stack([r, g, b], axis=-1).astype(np.uint8)
                outs.append(encode_png(px))
            out = pdf.copy()
            out[out_col] = outs
            yield out

    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = StructType(list(df.schema.fields) + [StructField(out_col, BinaryType())])
    return _spread(df).mapInPandas(gen, schema=schema)


def image_stats(
    df: DataFrame,
    payload_col: str = "image",
    id_col: str = "doc_id",
    decode=None,
) -> DataFrame:
    """REAL per-image channel statistics through a real decode path
    (``decode`` = :func:`decode_bmp` (default) or :func:`decode_png`):
    (id, valid, width, height, exact integer channel sums, means
    rounded 4, and ``px00_r`` — the top-left red value, which pins the
    bottom-up row flip: a decoder that forgets to flip reads the
    BOTTOM row there). Malformed payloads yield valid = false.

    Scale shape: payloads live in their own column (parquet-pruned
    unless touched); decode + reduce is one Arrow-batched mapInPandas
    projection, no shuffle; output is one fixed-width row per image."""
    import numpy as np

    decode = decode or decode_bmp

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                m = decode(None if p is None else bytes(p))
                if m is None:
                    rows.append(
                        (did, False, None, None, None, None, None,
                         None, None, None, None)
                    )
                    continue
                px = m["pixels"].astype(np.int64)
                w, h = m["width"], m["height"]
                s = px.sum(axis=(0, 1))
                mean = [_round4(v, w * h) for v in s]
                rows.append(
                    (did, True, w, h, int(s[0]), int(s[1]), int(s[2]),
                     mean[0], mean[1], mean[2], int(px[0, 0, 0]))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "valid", "width", "height",
                    "sum_r", "sum_g", "sum_b",
                    "mean_r", "mean_g", "mean_b", "px00_r",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        run,
        schema=f"{id_col} long, valid boolean, width int, height int, "
        "sum_r long, sum_g long, sum_b long, "
        "mean_r double, mean_g double, mean_b double, px00_r int",
    )


# ---------------------------------------------------------------------------
# Video: REAL Y4M (YUV4MPEG2) container — the public uncompressed
# format ffmpeg reads and writes, and the one video container fully
# parseable without codec libraries: a plain-text stream header
# ("YUV4MPEG2 W<w> H<h> F<n>:<d> ... C420jpeg\n") followed by
# "FRAME\n" markers, each carrying w*h luma bytes + two quarter-size
# chroma planes (4:2:0). The synthesizer is closed-form in the row id
# (like synthesize_wav/synthesize_bmp), so the DuckDB oracle replays
# every per-frame statistic while the Spark path builds and re-parses
# genuine container bytes.

_Y4M_MAGIC = b"YUV4MPEG2 "


def synthesize_y4m(df: DataFrame, id_col: str, out_col: str = "video") -> DataFrame:
    """Deterministic Y4M payloads: for row id ``d``, a
    ``(4 + 2·(d%3)) × (4 + 2·(d%2))`` 4:2:0 clip of ``2 + d%4``
    frames whose luma byte at flat index ``i`` of frame ``f`` is
    ``(5d + 7f + i) % 256`` (chroma: ``(d + 3f + i) % 256`` /
    ``(2d + f + i) % 256``). Closed-form in the id."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for did in pdf[id_col]:
                d = int(did)
                w, h = 4 + 2 * (d % 3), 4 + 2 * (d % 2)
                n_frames = 2 + d % 4
                parts = [b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420jpeg\n" % (w, h)]
                yn, cn = w * h, (w // 2) * (h // 2)
                for f in range(n_frames):
                    y = (5 * d + 7 * f + np.arange(yn)) % 256
                    u = (d + 3 * f + np.arange(cn)) % 256
                    v = (2 * d + f + np.arange(cn)) % 256
                    parts.append(
                        b"FRAME\n"
                        + y.astype(np.uint8).tobytes()
                        + u.astype(np.uint8).tobytes()
                        + v.astype(np.uint8).tobytes()
                    )
                outs.append(b"".join(parts))
            out = pdf.copy()
            out[out_col] = outs
            yield out

    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = StructType(list(df.schema.fields) + [StructField(out_col, BinaryType())])
    return _spread(df).mapInPandas(gen, schema=schema)


def demux_y4m(payload: bytes):
    """REAL YUV4MPEG2 demuxer (pure stdlib): parses the stream header
    (W/H/C tags; only 4:2:0 layouts supported), walks FRAME markers
    honoring optional frame parameters, and returns
    ``{"width", "height", "frames": [(y, u, v) bytes]}`` — or ``None``
    for malformed/unsupported payloads."""
    if payload is None or not payload.startswith(_Y4M_MAGIC):
        return None
    nl = payload.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    colorspace = "C420jpeg"
    try:
        for tag in payload[len(_Y4M_MAGIC):nl].split(b" "):
            if tag.startswith(b"W"):
                w = int(tag[1:])
            elif tag.startswith(b"H"):
                h = int(tag[1:])
            elif tag.startswith(b"C"):
                colorspace = tag.decode("ascii", "replace")
    except ValueError:
        # malformed numeric tag (W4x, bare W, ...) is a malformed
        # payload, not an executor exception
        return None
    if not w or not h or not colorspace.startswith("C420"):
        return None
    yn, cn = w * h, (w // 2) * (h // 2)
    frames = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            return None
        fnl = payload.find(b"\n", pos)  # frame params may follow FRAME
        if fnl < 0 or len(payload) < fnl + 1 + yn + 2 * cn:
            return None
        pos = fnl + 1
        frames.append(
            (
                payload[pos : pos + yn],
                payload[pos + yn : pos + yn + cn],
                payload[pos + yn + cn : pos + yn + 2 * cn],
            )
        )
        pos += yn + 2 * cn
    return {"width": w, "height": h, "frames": frames}


def y4m_frame_stats(
    df: DataFrame,
    payload_col: str = "video",
    id_col: str = "doc_id",
    every_n: int = 2,
) -> DataFrame:
    """REAL video frame statistics through the Y4M demux path: one row
    per SAMPLED frame (indices 0, every_n, …) with the exact integer
    luma sum and mean (rounded 4) — the frame-level feature-extraction
    shape with a real container parse instead of the fixed-chunk fake.
    Malformed payloads yield a single valid = false row; a
    structurally valid but FRAME-less clip yields one valid = true row
    with n_frames = 0 — every input clip appears in the output,
    exactly like :func:`image_stats`.

    Scale shape: payloads stay in their own parquet column; demux +
    reduce is one Arrow-batched mapInPandas; output multiplicity is
    n_frames/every_n per clip, known from the header."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                m = demux_y4m(None if p is None else bytes(p))
                if m is None:
                    rows.append((did, False, None, None, None, None, None, None))
                    continue
                n = len(m["frames"])
                if n == 0:
                    rows.append(
                        (did, True, m["width"], m["height"], 0, None, None, None)
                    )
                    continue
                for f in range(0, n, every_n):
                    y = np.frombuffer(m["frames"][f][0], dtype=np.uint8)
                    s = int(y.astype(np.int64).sum())
                    rows.append(
                        (
                            did, True, m["width"], m["height"], n, f, s,
                            _round4(s, y.size),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "valid", "width", "height",
                    "n_frames", "frame_idx", "luma_sum", "mean_luma",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        run,
        schema=f"{id_col} long, valid boolean, width int, height int, "
        "n_frames int, frame_idx int, luma_sum long, mean_luma double",
    )


def embed_payload(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = 8,
) -> DataFrame:
    """Feature-extraction plumbing: payload → fixed-dim float vector
    (id, embedding array<double>). The fake featurizer hashes the
    payload per dimension (deterministic); a real model swaps in at
    the same mapInPandas boundary with weights broadcast per
    executor."""
    import hashlib

    schema = f"{id_col} long, embedding array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for p in pdf[payload_col]:
                if p is None:
                    embs.append(None)
                    continue
                b = bytes(p)
                embs.append(
                    [
                        int(
                            hashlib.md5(b + bytes([d])).hexdigest()[:8], 16
                        )
                        / float(1 << 32)
                        for d in range(dim)
                    ]
                )
            yield pd.DataFrame({id_col: pdf[id_col].values, "embedding": embs})

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# Audio: REAL operators (no codec library needed). WAV/RIFF headers
# parse with stdlib struct; PCM16 DSP runs on numpy inside Arrow
# batches. Synthesis is closed-form from the row id, so the DuckDB
# oracle replays metadata and energy with pure arithmetic while the
# Spark path builds genuine WAV bytes and parses them back — the
# parser is tested against a real byte format, not a fake.

_WAV_RATE = 8000


def synthesize_wav(df: DataFrame, id_col: str, out_col: str = "audio") -> DataFrame:
    """Deterministic mono 16-bit PCM WAV payloads: for row id ``d``,
    an integer sawtooth ``sample[i] = (i * (1 + d % 7)) % 2000 - 1000``
    over ``800 + (d % 5) * 160`` frames at 8 kHz, wrapped in a
    canonical 44-byte RIFF/WAVE header. Closed-form in the id — no
    RNG, no transcendentals — so oracles can replay every derived
    quantity."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for did in pdf[id_col]:
                d = int(did)
                f = 1 + d % 7
                n = 800 + (d % 5) * 160
                i = np.arange(n, dtype=np.int64)
                data = ((i * f) % 2000 - 1000).astype("<i2").tobytes()
                outs.append(_wav_header(len(data)) + data)
            out = pdf.copy()
            out[out_col] = outs
            yield out

    from pyspark.sql.types import BinaryType, StructField, StructType

    # fresh StructType — StructType.add mutates the receiver, which
    # would corrupt df's own resolved schema
    schema = StructType(list(df.schema.fields) + [StructField(out_col, BinaryType())])
    return _spread(df).mapInPandas(gen, schema=schema)


def _wav_header(data_len: int, n_ch: int = 1, rate: int = _WAV_RATE, bits: int = 16) -> bytes:
    """Canonical 44-byte RIFF/WAVE header — the single source for
    every synthesizer, kept in lockstep with :func:`_parse_wav`."""
    import struct

    block = n_ch * bits // 8
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_len)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, n_ch, rate, rate * block, block, bits)
        + b"data"
        + struct.pack("<I", data_len)
    )


def _parse_wav(payload: bytes):
    """Minimal canonical-layout RIFF/WAVE parser (stdlib struct)."""
    import struct

    if payload is None or len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    fmt_tag, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", payload[20:36])
    data_len = struct.unpack("<I", payload[40:44])[0]
    # bits/rate of 0 must fail parse (valid=false), not divide by zero
    # in the frame/duration math downstream
    if fmt_tag != 1 or bits % 8 or bits == 0 or n_ch == 0 or rate == 0:
        return None
    # clamp to FULL frames of bytes actually present: a declared
    # data_len that overruns the payload, or an odd trailing byte,
    # must degrade to fewer frames — never reach np.frombuffer as a
    # non-multiple of the sample size (executor ValueError)
    data = payload[44 : 44 + data_len]
    frame_bytes = n_ch * bits // 8
    n_frames = len(data) // frame_bytes
    return n_ch, rate, bits, n_frames, data[: n_frames * frame_bytes]


def wav_meta(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """REAL audio metadata: parse each payload's RIFF/WAVE header —
    (id, n_channels, sample_rate, bits_per_sample, n_frames,
    duration_ms). Malformed payloads yield a row of nulls with
    ``valid = false`` (row-level errors, never executor exceptions).

    Scale shape: payloads stay in their own parquet column (pruned
    unless touched); the parse is an Arrow-batched mapInPandas
    projection, no shuffle."""

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                parsed = _parse_wav(payload)
                if parsed is None:
                    rows.append((did, False, None, None, None, None, None))
                    continue
                n_ch, rate, bits, n_frames, _ = parsed
                rows.append(
                    (
                        did, True, n_ch, rate, bits, n_frames,
                        n_frames * 1000 // rate,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "valid", "n_channels", "sample_rate",
                    "bits_per_sample", "n_frames", "duration_ms",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        meta,
        schema=f"{id_col} long, valid boolean, n_channels int, "
        "sample_rate int, bits_per_sample int, n_frames long, duration_ms long",
    )


def pcm_energy(
    df: DataFrame, payload_col: str, id_col: str, window: int = 256
) -> DataFrame:
    """REAL PCM DSP: windowed energy over mono 16-bit WAV payloads —
    one row per FULL ``window``-sample window with the exact integer
    sum of squares (hash-stable) and the RMS rounded to 4 decimals.
    The vectorized path: bytes → int16 numpy view → reshape(-1,
    window) → per-row int64 reduction, one BLAS-free pass per Arrow
    batch.

    Scale shape: mapInPandas projection; output multiplicity is
    n_frames/window per payload, bounded and known up front."""
    import numpy as np

    def energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, wins, sums, rms = [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                parsed = _parse_wav(payload)
                if parsed is None or parsed[0] != 1 or parsed[2] != 16:
                    continue
                data = parsed[4]
                samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
                n_full = len(samples) // window
                if n_full == 0:
                    continue
                sq = (samples[: n_full * window].reshape(n_full, window) ** 2).sum(
                    axis=1
                )
                ids.extend([did] * n_full)
                wins.extend(range(n_full))
                sums.extend(sq.tolist())
                rms.extend(
                    (np.floor(np.sqrt(sq / window) * 1e4 + 0.5) / 1e4).tolist()
                )
            yield pd.DataFrame(
                {id_col: ids, "window_id": wins, "sum_sq": sums, "rms": rms}
            )

    return df.select(id_col, payload_col).mapInPandas(
        energy,
        schema=f"{id_col} long, window_id int, sum_sq long, rms double",
    )


# ---------------------------------------------------------------------------
# JPEG: REAL baseline sequential DCT codec (ITU-T T.81), pure
# stdlib + numpy — the last image-codec stub retired. The DECODER is
# general within baseline: it parses DQT/DHT/SOF0/SOS from the file
# (Huffman tables and quantization come from the bitstream, never
# assumed), entropy-decodes with byte-unstuffing, dequantizes,
# inverse-zigzags, runs an exact orthonormal 8×8 IDCT, upsamples
# 4:2:0 chroma, and converts YCbCr→RGB. Supported subset: 8-bit,
# 3 components, 4:2:0 or 4:4:4, no progressive/restart — anything
# else returns None (row-level error, never an executor exception).
# The ENCODER emits genuine 4:2:0 baseline JFIF bytes (flat
# quality-100 quantization tables for near-lossless fidelity); it is
# the test-payload producer, so it guards against the one thing flat
# tables cannot express (AC categories beyond 10) by raising on
# pathological high-frequency content rather than emitting a corrupt
# scan. JPEG is LOSSY: roundtrip equality is bounded-error, not
# byte-exact — see jpeg_fidelity_stats for the oracle-friendly gate.

_JPEG_SOI = b"\xff\xd8"
_JPEG_ZZ_IDX = None  # lazy module-level np.array(_JPEG_ZZ), shared by codec halves


def _jpeg_zz_index():
    global _JPEG_ZZ_IDX
    if _JPEG_ZZ_IDX is None:
        import numpy as np

        _JPEG_ZZ_IDX = np.array(_JPEG_ZZ)
    return _JPEG_ZZ_IDX

# zigzag scan order: position k in the scan reads raster index _ZZ[k]
_JPEG_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Huffman table definitions written into DHT (ITU T.81 Annex K
# typical tables). The decoder reads them back FROM the file, so the
# roundtrip is self-consistent by construction.
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_codes(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman assignment (T.81 C.2): symbol -> (code, len)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _dct_mat():
    """Orthonormal 8x8 DCT-II basis: F = C @ f @ C.T, f = C.T @ F @ C."""
    import numpy as np

    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    C = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    C[0] /= np.sqrt(2)
    return C


class _JpegBitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (F.1.2.3)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, size: int) -> None:
        if size == 0:
            return
        self.acc = (self.acc << size) | (value & ((1 << size) - 1))
        self.n += size
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill (F.1.2.3)


def _jpeg_encode_block(bw, zz, pred_dc, dc_codes, ac_codes) -> int:
    """One quantized 8x8 block (zigzag order) to the entropy stream;
    returns the block's DC for the next prediction."""
    diff = int(zz[0]) - pred_dc
    s = int(abs(diff)).bit_length()
    try:
        code, ln = dc_codes[s]
    except KeyError:
        raise ValueError(f"DC category {s} exceeds baseline tables")
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    last = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last = i
            break
    run = 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = int(abs(v)).bit_length()
        sym = (run << 4) | s
        if sym not in ac_codes:
            raise ValueError(
                f"AC (run={run}, size={s}) exceeds baseline tables — "
                "content too high-frequency for flat quantization"
            )
        code, ln = ac_codes[sym]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def encode_jpeg(pixels) -> bytes:
    """REAL baseline JFIF encoder: (h, w, 3) uint8 RGB → SOI + APP0 +
    DQT (flat quality-100 tables) + SOF0 (4:2:0) + 4×DHT + SOS +
    entropy-coded scan + EOI. Color converts to YCbCr, pads to whole
    16×16 MCUs by edge replication, box-averages chroma 2×2, and
    Huffman-codes DC-predicted zigzag coefficients with byte
    stuffing."""
    import struct

    import numpy as np

    h, w = int(pixels.shape[0]), int(pixels.shape[1])
    p = pixels.astype(np.float64)
    R, G, B = p[..., 0], p[..., 1], p[..., 2]
    Y = 0.299 * R + 0.587 * G + 0.114 * B
    Cb = -0.168736 * R - 0.331264 * G + 0.5 * B + 128.0
    Cr = 0.5 * R - 0.418688 * G - 0.081312 * B + 128.0
    H16, W16 = -(-h // 16) * 16, -(-w // 16) * 16

    def pad(plane):
        out = np.empty((H16, W16))
        out[:h, :w] = plane
        out[h:, :w] = plane[-1:, :]
        out[:, w:] = out[:, w - 1 : w]
        return out

    Yp, Cbp, Crp = pad(Y), pad(Cb), pad(Cr)
    Cbs = Cbp.reshape(H16 // 2, 2, W16 // 2, 2).mean(axis=(1, 3))
    Crs = Crp.reshape(H16 // 2, 2, W16 // 2, 2).mean(axis=(1, 3))
    C = _dct_mat()

    zz_idx = _jpeg_zz_index()

    def quantized_zigzag(plane, oy, ox):
        block = plane[oy : oy + 8, ox : ox + 8] - 128.0
        coef = C @ block @ C.T  # flat quant table of 1s -> just round
        # np.rint == round-half-to-even, same as Python round()
        return np.rint(coef.reshape(-1)[zz_idx]).astype(np.int64).tolist()

    dc_l = _huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _huff_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _huff_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    bw = _JpegBitWriter()
    pred = [0, 0, 0]  # per-component DC predictors
    for my in range(H16 // 16):
        for mx in range(W16 // 16):
            for by in (0, 1):
                for bx in (0, 1):
                    zz = quantized_zigzag(Yp, my * 16 + by * 8, mx * 16 + bx * 8)
                    pred[0] = _jpeg_encode_block(bw, zz, pred[0], dc_l, ac_l)
            zz = quantized_zigzag(Cbs, my * 8, mx * 8)
            pred[1] = _jpeg_encode_block(bw, zz, pred[1], dc_c, ac_c)
            zz = quantized_zigzag(Crs, my * 8, mx * 8)
            pred[2] = _jpeg_encode_block(bw, zz, pred[2], dc_c, ac_c)
    bw.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    flat64 = bytes([1] * 64)
    out = bytearray()
    out += _JPEG_SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    out += seg(0xDB, b"\x00" + flat64 + b"\x01" + flat64)
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x22, 0])  # Y: 2x2 sampling, quant table 0
        + bytes([2, 0x11, 1])  # Cb: 1x1, quant table 1
        + bytes([3, 0x11, 1]),  # Cr
    )
    for cls_id, bits, vals in (
        (0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        out += seg(0xC4, bytes([cls_id]) + bytes(bits) + bytes(vals))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


class _JpegBitReader:
    """MSB-first bit reader with byte UNstuffing; raises EOFError at a
    marker (end of entropy-coded segment)."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.d):
            raise EOFError
        b = self.d[self.pos]
        if b == 0xFF:
            if self.pos + 1 < len(self.d) and self.d[self.pos + 1] == 0x00:
                self.pos += 2  # stuffed byte
            else:
                raise EOFError  # a real marker terminates the scan
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, size: int) -> int:
        while self.n < size:
            self._fill()
        self.n -= size
        v = (self.acc >> self.n) & ((1 << size) - 1)
        self.acc &= (1 << self.n) - 1
        return v


def _huff_decode_one(br, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.bits(1)
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


def decode_jpeg(payload: bytes):
    """REAL baseline JPEG decoder (see module note for the supported
    subset). Returns ``{"width", "height", "pixels"}`` with an
    (h, w, 3) uint8 RGB array, or None for malformed / unsupported
    payloads."""
    import struct

    import numpy as np

    if payload is None or payload[:2] != _JPEG_SOI:
        return None
    try:
        pos = 2
        qt: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], dict] = {}
        comps = None
        h = w = None
        scan = None
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker == 0xFF:
                pos += 1  # spec B.1.1.2: 0xFF fill bytes pad markers
                continue
            if marker == 0xD9:  # EOI
                break
            (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
            data = payload[pos + 4 : pos + 2 + seglen]
            if marker == 0xDB:  # DQT (possibly several tables)
                i = 0
                while i < len(data):
                    prec, tid = data[i] >> 4, data[i] & 0xF
                    if prec != 0:
                        return None  # 8-bit tables only
                    qt[tid] = list(data[i + 1 : i + 65])
                    i += 65
            elif marker == 0xC4:  # DHT
                i = 0
                while i < len(data):
                    cls, tid = data[i] >> 4, data[i] & 0xF
                    bits = list(data[i + 1 : i + 17])
                    nvals = sum(bits)
                    vals = list(data[i + 17 : i + 17 + nvals])
                    table = {}
                    code, k = 0, 0
                    for length in range(1, 17):
                        for _ in range(bits[length - 1]):
                            table[(length, code)] = vals[k]
                            code += 1
                            k += 1
                        code <<= 1
                    huff[(cls, tid)] = table
                    i += 17 + nvals
            elif marker == 0xC0:  # SOF0 baseline
                prec, h, w, nc = struct.unpack(">BHHB", data[:6])
                if prec != 8 or nc != 3:
                    return None
                comps = []
                for c in range(nc):
                    cid, samp, qid = data[6 + 3 * c : 9 + 3 * c]
                    comps.append((cid, samp >> 4, samp & 0xF, qid))
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
                return None  # non-baseline frame types
            elif marker == 0xDD:
                return None  # restart intervals unsupported
            elif marker == 0xDA:  # SOS — entropy data follows
                ns = data[0]
                scan = []
                for c in range(ns):
                    cid, tabs = data[1 + 2 * c], data[2 + 2 * c]
                    scan.append((cid, tabs >> 4, tabs & 0xF))
                pos = pos + 2 + seglen
                break
            pos += 2 + seglen
        if comps is None or scan is None or h is None:
            return None
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        samplings = sorted((c[1], c[2]) for c in comps)
        if not (
            (hmax, vmax) == (1, 1)
            or samplings == [(1, 1), (1, 1), (2, 2)]
        ):
            return None  # only 4:4:4 and 4:2:0
        mcu_w, mcu_h = 8 * hmax, 8 * vmax
        mcus_x = -(-w // mcu_w)
        mcus_y = -(-h // mcu_h)
        planes = {}
        for cid, ch, cv, _q in comps:
            planes[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8))
        C = _dct_mat()
        zz_idx = _jpeg_zz_index()
        br = _JpegBitReader(payload, pos)
        pred = {cid: 0 for cid, *_ in comps}
        by_id = {cid: (ch, cv, qid) for cid, ch, cv, qid in comps}
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for cid, dc_id, ac_id in scan:
                    ch, cv, qid = by_id[cid]
                    q = qt[qid]
                    for by in range(cv):
                        for bx in range(ch):
                            s = _huff_decode_one(br, huff[(0, dc_id)])
                            diff = _extend(br.bits(s), s) if s else 0
                            pred[cid] += diff
                            zz = [0] * 64
                            zz[0] = pred[cid] * q[0]
                            k = 1
                            while k < 64:
                                sym = _huff_decode_one(br, huff[(1, ac_id)])
                                if sym == 0x00:  # EOB
                                    break
                                run, size = sym >> 4, sym & 0xF
                                if size == 0:
                                    if run == 15:  # ZRL
                                        k += 16
                                        continue
                                    return None
                                k += run
                                if k > 63:
                                    return None
                                zz[k] = _extend(br.bits(size), size) * q[k]
                                k += 1
                            coef = np.zeros(64)
                            coef[zz_idx] = zz  # inverse zigzag
                            block = C.T @ coef.reshape(8, 8) @ C + 128.0
                            oy = (my * cv + by) * 8
                            ox = (mx * ch + bx) * 8
                            planes[cid][oy : oy + 8, ox : ox + 8] = block
        # upsample to full resolution and crop
        full = {}
        for cid, ch, cv, _q in comps:
            pl = planes[cid]
            pl = np.repeat(np.repeat(pl, vmax // cv, axis=0), hmax // ch, axis=1)
            full[cid] = pl[:h, :w]
        # identify components by SAMPLING and JFIF ids, not scan
        # position — T.81 allows any component order in SOF/SOS
        ids = [s[0] for s in scan]
        if len(ids) != 3:
            return None
        if (hmax, vmax) == (1, 1):
            # 4:4:4: sampling cannot single out luma; require the
            # JFIF id convention (1=Y, 2=Cb, 3=Cr) or refuse
            if sorted(ids) != [1, 2, 3]:
                return None
            y_id, cb_id, cr_id = 1, 2, 3
        else:
            # 4:2:0: luma IS the 2x2-sampled component wherever it
            # sits; the Cb/Cr pair is only distinguishable through the
            # JFIF id convention (2=Cb, 3=Cr) — non-JFIF ids would
            # force a guess that silently swaps red/blue, so refuse
            # (same policy as the 4:4:4 branch)
            y_id = next(
                cid for cid, ch, cv, _q in comps if (ch, cv) == (2, 2)
            )
            chroma = sorted(cid for cid in ids if cid != y_id)
            if y_id != 1 or chroma != [2, 3]:
                return None
            cb_id, cr_id = 2, 3
        Y, Cb, Cr = full[y_id], full[cb_id] - 128.0, full[cr_id] - 128.0
        R = Y + 1.402 * Cr
        G = Y - 0.344136 * Cb - 0.714136 * Cr
        B = Y + 1.772 * Cb
        rgb = np.stack([R, G, B], axis=-1)
        return {
            "width": w,
            "height": h,
            "pixels": np.clip(np.round(rgb), 0, 255).astype(np.uint8),
        }
    except (struct.error, IndexError, KeyError, ValueError, EOFError):
        return None


def jpeg_expected_pixels(d: int):
    """Closed-form test image for doc id ``d`` — SMOOTH gradients
    (no modulo wrap inside an image), so 4:2:0 subsampling and DCT
    rounding stay bounded-error and the fidelity gate is
    deterministic. Dims (12 + d%9) × (10 + d%7) span one to two
    16×16 MCUs, exercising edge-replication padding and multi-block
    scans."""
    import numpy as np

    w, h = 12 + d % 9, 10 + d % 7
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    r = (3 * d) % 160 + x + y  # peaks at 193 — never wraps mod 256
    g = (5 * d) % 140 + 2 * x + y  # peaks at 192
    b = (7 * d) % 120 + x + 2 * y  # peaks at 168
    return np.stack(
        [np.broadcast_to(c, (h, w)) for c in (r, g, b)], axis=-1
    ).astype(np.uint8)


def jpeg_expected_resized(d: int, width: int, height: int):
    """Closed-form nearest-neighbor resize of the test image — the
    pixels a LOSSLESS decode→resize pipeline would produce; the
    fidelity gate for the lossy roundtrip compares against this with
    a bounded tolerance."""
    import numpy as np

    px = jpeg_expected_pixels(d)
    xs = (np.arange(width) * px.shape[1]) // width
    ys = (np.arange(height) * px.shape[0]) // height
    return px[ys][:, xs]


def synthesize_jpeg(df: DataFrame, id_col: str, out_col: str = "image") -> DataFrame:
    """Deterministic baseline-JFIF payloads: :func:`jpeg_expected_pixels`
    per row id, compressed by :func:`encode_jpeg` — genuine marker
    segments, Huffman scan, byte stuffing. Closed-form dims let the
    oracle replay width/height while Spark decodes real JPEG bytes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out[out_col] = [
                encode_jpeg(jpeg_expected_pixels(int(d))) for d in pdf[id_col]
            ]
            yield out

    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = StructType(list(df.schema.fields) + [StructField(out_col, BinaryType())])
    return _spread(df).mapInPandas(gen, schema=schema)


def jpeg_fidelity_stats(
    df: DataFrame,
    payload_col: str = "image",
    id_col: str = "doc_id",
    expected=None,
    tol: int = 8,
) -> DataFrame:
    """Oracle-friendly gate for a LOSSY codec: decode each payload and
    compare against ``expected(id) -> (h, w, 3) uint8`` (default
    :func:`jpeg_expected_pixels`). JPEG roundtrips are bounded-error,
    not byte-exact, so the hashable outputs are the decoded DIMENSIONS
    (exact, from SOF0) plus ``ok`` = max per-channel absolute error
    <= ``tol`` — a broken Huffman walk, IDCT, upsampler, or color
    transform blows the bound immediately, while legitimate
    quantization noise never does (measured max error ~5 on the
    synthetic corpus; tests pin it). ``max_err`` rides along for
    humans but is excluded from gate queries' selected columns.

    Scale shape: identical to :func:`image_stats` — payload column
    pruned unless touched, one Arrow-batched mapInPandas, no
    shuffle."""
    import numpy as np

    expected = expected or jpeg_expected_pixels

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                m = decode_jpeg(None if p is None else bytes(p))
                if m is None:
                    rows.append((did, False, None, None, False, None))
                    continue
                exp = expected(int(did))
                if m["pixels"].shape != exp.shape:
                    rows.append(
                        (did, True, m["width"], m["height"], False, None)
                    )
                    continue
                err = int(
                    np.abs(
                        m["pixels"].astype(np.int64) - exp.astype(np.int64)
                    ).max()
                )
                rows.append(
                    (did, True, m["width"], m["height"], err <= tol, err)
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "valid", "width", "height", "ok", "max_err"],
            )

    return df.select(id_col, payload_col).mapInPandas(
        run,
        schema=f"{id_col} long, valid boolean, width int, height int, "
        "ok boolean, max_err int",
    )


# Compressed video: REAL MJPEG-in-AVI — the one COMPRESSED video
# format fully decodable here, because the frames are baseline JPEGs
# (our own codec) inside a RIFF container (pure struct). This closes
# the "compressed video demux" gap for the motion-JPEG family;
# inter-frame codecs (H.26x/VP9/AV1) still genuinely need
# ffmpeg-class libraries (ROADMAP). Reference has no media at all
# (amaxa/loader/core.py:243-248 excludes even base64 fields).

_RIFF_MAGIC = b"RIFF"


def mjpeg_expected_pixels(d: int, f: int):
    """Closed-form frame ``f`` of test clip ``d``:
    :func:`jpeg_expected_pixels`'s image (ONE definition of the base
    pattern — tuning it cannot desynchronize the two gates) plus a
    per-frame brightness term, bounded so nothing wraps (base peaks
    193/193/168, frame term adds ≤ 12/8/4 for f ≤ 4)."""
    import numpy as np

    return (
        jpeg_expected_pixels(d).astype(np.int16)
        + np.array([3 * f, 2 * f, f], dtype=np.int16)
    ).astype(np.uint8)


def _avi_chunk(fourcc: bytes, body: bytes) -> bytes:
    import struct

    pad = b"\x00" if len(body) % 2 else b""  # RIFF chunks align to 2
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _avi_list(list_type: bytes, body: bytes) -> bytes:
    return _avi_chunk(b"LIST", list_type + body)


def synthesize_avi_mjpeg(
    df: DataFrame, id_col: str, out_col: str = "video"
) -> DataFrame:
    """Deterministic MJPEG AVI payloads: for row id ``d``, a genuine
    RIFF/AVI file — ``hdrl`` (avih + one ``vids``/``MJPG`` stream
    header + BITMAPINFOHEADER) and a ``movi`` list of ``00dc``
    chunks, each a REAL baseline JPEG of
    :func:`mjpeg_expected_pixels`, plus an ``idx1`` index. Dims
    ``(12+d%9)×(10+d%7)``, ``2+d%4`` frames — closed-form, so the
    oracle replays structure while Spark demuxes real container
    bytes and entropy-decodes real frames."""
    import struct

    def build(d: int) -> bytes:
        w, h = 12 + d % 9, 10 + d % 7
        n_frames = 2 + d % 4
        frames = [
            encode_jpeg(mjpeg_expected_pixels(d, f)) for f in range(n_frames)
        ]
        bufsize = max(len(fr) for fr in frames)
        avih = struct.pack(
            "<IIIIIIIIIIIIII",
            40_000,  # us per frame (25 fps)
            bufsize * 25,  # max bytes/sec
            0,  # padding granularity
            0x10,  # AVIF_HASINDEX
            n_frames, 0, 1, bufsize, w, h, 0, 0, 0, 0,
        )
        strh = struct.pack(
            "<4s4sIHHIIIIIIIIhhhh",
            b"vids", b"MJPG", 0, 0, 0, 0,
            1, 25,  # scale/rate = 25 fps
            0, n_frames, bufsize, 0xFFFFFFFF, 0,
            0, 0, w, h,  # rcFrame
        )
        strf = struct.pack(
            "<IiiHH4sIiiII",
            40, w, h, 1, 24, b"MJPG",
            w * h * 3, 0, 0, 0, 0,
        )
        hdrl = _avi_list(
            b"hdrl",
            _avi_chunk(b"avih", avih)
            + _avi_list(
                b"strl", _avi_chunk(b"strh", strh) + _avi_chunk(b"strf", strf)
            ),
        )
        movi_chunks = [_avi_chunk(b"00dc", fr) for fr in frames]
        movi = _avi_list(b"movi", b"".join(movi_chunks))
        # idx1: offsets relative to the start of the movi list data
        # (after its "movi" type fourcc), per the classic convention
        idx_entries = []
        off = 4
        for fr, ch in zip(frames, movi_chunks):
            idx_entries.append(
                struct.pack("<4sIII", b"00dc", 0x10, off, len(fr))
            )
            off += len(ch)
        idx1 = _avi_chunk(b"idx1", b"".join(idx_entries))
        body = b"AVI " + hdrl + movi + idx1
        return _RIFF_MAGIC + struct.pack("<I", len(body)) + body

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out[out_col] = [build(int(d)) for d in pdf[id_col]]
            yield out

    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = StructType(list(df.schema.fields) + [StructField(out_col, BinaryType())])
    return _spread(df).mapInPandas(gen, schema=schema)


def demux_avi_mjpeg(payload: bytes):
    """REAL AVI demuxer (pure struct): verifies the RIFF/AVI
    signature, walks chunks generically (honoring 2-byte alignment,
    skipping unknown chunks), pulls dims/frame count from ``avih``,
    and collects every video frame chunk (``NNdc``/``NNdb``) from the
    ``movi`` list — compressed frame BYTES, not pixels; pair with
    :func:`decode_jpeg` for MJPG streams. Returns ``{"width",
    "height", "n_frames_header", "frames": [bytes]}`` or ``None`` for
    malformed payloads (row-level, never an exception)."""
    import struct

    if (
        payload is None
        or len(payload) < 12
        or payload[:4] != _RIFF_MAGIC
        or payload[8:12] != b"AVI "
    ):
        return None
    try:
        riff_len = struct.unpack_from("<I", payload, 4)[0]
        end = min(len(payload), 8 + riff_len)
        width = height = n_frames_header = None
        frames: list[bytes] = []
        # explicit (pos, stop) stack, not recursion: a payload that is
        # nothing but nested LIST headers would otherwise blow the
        # interpreter's recursion limit out of the documented
        # row-level-None contract (each frame enters the stack once,
        # so the walk stays O(bytes))
        spans = [(12, end)]
        while spans:
            pos, stop = spans.pop()
            while pos + 8 <= stop:
                fourcc = payload[pos : pos + 4]
                size = struct.unpack_from("<I", payload, pos + 4)[0]
                body_start = pos + 8
                body_end = body_start + size
                if body_end > stop:
                    return None
                if fourcc == b"LIST":
                    if size < 4:
                        return None
                    # descend in FILE order: park this level's
                    # remaining siblings, enter the list body (past
                    # its 4-byte type) now — frame chunks must append
                    # in the order they appear in the container
                    spans.append((body_end + (size % 2), stop))
                    pos, stop = body_start + 4, body_end
                    continue
                if fourcc == b"avih":
                    if size < 40:
                        return None
                    vals = struct.unpack_from("<10I", payload, body_start)
                    n_frames_header = vals[4]
                    width, height = vals[8], vals[9]
                elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                    frames.append(payload[body_start:body_end])
                pos = body_end + (size % 2)  # chunks are 2-byte aligned
        if not width or not height:
            return None
        if width >= 1 << 31 or height >= 1 << 31:
            # raw unsigned avih values beyond int32 are a corrupt
            # header, not dimensions — letting them through would wrap
            # in downstream int32 schemas
            return None
        return {
            "width": width,
            "height": height,
            "n_frames_header": n_frames_header,
            "frames": frames,
        }
    except struct.error:
        return None


def mjpeg_frame_stats(
    df: DataFrame,
    payload_col: str = "video",
    id_col: str = "doc_id",
    expected=None,
    tol: int = 8,
) -> DataFrame:
    """COMPRESSED-video gate: demux the AVI container, entropy-decode
    every MJPEG frame, and emit one row per frame with exact header
    dims plus the bounded-error fidelity verdict against
    ``expected(id, frame) -> (h, w, 3) uint8`` (default
    :func:`mjpeg_expected_pixels`) — the :func:`jpeg_fidelity_stats`
    contract lifted to multi-frame payloads. Malformed containers
    yield one ``valid = false`` row; an undecodable frame yields its
    row with ``ok = false``. Scale shape: one Arrow-batched
    mapInPandas, no shuffle; output multiplicity is the frame count,
    known from the header."""
    import numpy as np

    expected = expected or mjpeg_expected_pixels

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                m = demux_avi_mjpeg(None if p is None else bytes(p))
                if m is None:
                    rows.append((did, False, None, None, None, None, False))
                    continue
                n = len(m["frames"])
                if n == 0:
                    rows.append(
                        (did, True, m["width"], m["height"], 0, None, False)
                    )
                    continue
                for f, fr in enumerate(m["frames"]):
                    dec = decode_jpeg(fr)
                    if dec is None:
                        rows.append(
                            (did, True, m["width"], m["height"], n, f, False)
                        )
                        continue
                    exp = expected(int(did), f)
                    ok = dec["pixels"].shape == exp.shape and int(
                        np.abs(
                            dec["pixels"].astype(np.int64)
                            - exp.astype(np.int64)
                        ).max()
                    ) <= tol
                    rows.append(
                        (did, True, m["width"], m["height"], n, f, ok)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "valid", "width", "height",
                    "n_frames", "frame_idx", "ok",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        run,
        schema=f"{id_col} long, valid boolean, width int, height int, "
        "n_frames int, frame_idx int, ok boolean",
    )


# GIF: REAL GIF89a codec (pure stdlib) — variable-width LSB-first
# LZW with clear/EOI codes and 4096-entry dictionary resets, global
# color table, extension-block skipping, interlace deinterlacing.
# Lossless and palette-exact, so its gate hashes exact channel sums
# (the BMP/PNG contract), unlike the bounded-error JPEG gates.

_GIF_MAGICS = (b"GIF87a", b"GIF89a")
# per-frame pixel budget: a tiny adversarial payload can DECLARE an
# enormous frame and feed it a high-expansion LZW stream (up to
# ~2700x once the table holds long entries), forcing multi-GB
# allocations before any validity check can fire. 16M pixels
# (4096x4096) bounds outpix + the RGB expansion to ~64 MB per row —
# the same bounded-allocation contract as demux_avi_mjpeg's dims
# guard. The header filter mirrors the cap so filter and decoder
# agree on validity.
_GIF_MAX_PIXELS = 1 << 24


def _gif_lzw_encode(indices, min_code: int) -> bytes:
    """Variable-width LSB-first GIF-LZW over a flat uint8 index
    sequence: clear code up front, dictionary reset at 4096 entries,
    EOI last. Returns the raw code stream (no sub-block framing)."""
    import numpy as np

    clear, eoi = 1 << min_code, (1 << min_code) + 1
    bits: list[int] = []
    width = min_code + 1

    def emit(code: int, width: int) -> None:
        for b in range(width):  # LSB first
            bits.append((code >> b) & 1)

    table = {(i,): i for i in range(1 << min_code)}
    next_code = eoi + 1
    emit(clear, width)
    seq: tuple = ()
    for v in np.asarray(indices, dtype=np.uint8).reshape(-1).tolist():
        cand = seq + (v,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {(i,): i for i in range(1 << min_code)}
            next_code = eoi + 1
            width = min_code + 1
        seq = (v,)
    if seq:
        emit(table[seq], width)
    emit(eoi, width)
    data = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, bit in enumerate(bits[i : i + 8]):
            byte |= bit << j
        data.append(byte)
    return bytes(data)


def _gif_sub_blocks(data: bytes) -> bytes:
    """Frame a byte stream into GIF 255-byte sub-blocks + terminator."""
    out = []
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(bytes([len(chunk)]) + chunk)
    out.append(b"\x00")
    return b"".join(out)


def _gif_header(w: int, h: int, palette) -> tuple[bytes, int]:
    """GIF89a signature + logical screen descriptor + global color
    table. Returns (bytes, min_code)."""
    import struct

    n_colors = len(palette)
    assert n_colors >= 2 and n_colors & (n_colors - 1) == 0
    size_bits = max(1, (n_colors - 1).bit_length())
    hdr = (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (size_bits - 1), 0, 0)
        + b"".join(bytes(c) for c in palette)
    )
    return hdr, max(2, size_bits)


def encode_gif(indices, palette) -> bytes:
    """Encode an (h, w) uint8 index array over ``palette``
    (list of (r, g, b), length a power of two ≥ 2) as a genuine
    GIF89a: logical screen descriptor + global color table + image
    descriptor + real LZW-compressed pixel stream in 255-byte
    sub-blocks."""
    import struct

    h, w = indices.shape
    hdr, min_code = _gif_header(w, h, palette)
    return (
        hdr
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([min_code])
        + _gif_sub_blocks(_gif_lzw_encode(indices, min_code))
        + b"\x3b"
    )


def encode_gif_anim(frames, palette, delays_cs=None, loop: int = 0) -> bytes:
    """Encode a list of same-shape (h, w) uint8 index arrays as an
    ANIMATED GIF89a: NETSCAPE2.0 looping application extension, then
    per frame a Graphic Control Extension (delay in centiseconds) +
    image descriptor + LZW stream. Every frame is full-canvas with
    disposal 'none', so each decodes standalone (no compositing)."""
    import struct

    h, w = frames[0].shape
    hdr, min_code = _gif_header(w, h, palette)
    out = [
        hdr,
        # NETSCAPE2.0 application extension: loop count (0 = forever)
        b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00",
    ]
    for f, frame in enumerate(frames):
        assert frame.shape == (h, w)
        delay = 0 if delays_cs is None else int(delays_cs[f])
        out.append(b"\x21\xf9\x04\x00" + struct.pack("<H", delay) + b"\x00\x00")
        out.append(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0))
        out.append(bytes([min_code]))
        out.append(_gif_sub_blocks(_gif_lzw_encode(frame, min_code)))
    out.append(b"\x3b")
    return b"".join(out)


def _gif_decode_frames(payload: bytes, max_frames: int):
    """Multi-frame GIF decode core: walks every block in order,
    remembers the Graphic Control Extension delay preceding each
    image, and LZW-decodes up to ``max_frames`` images. Returns a
    list of ``{"width", "height", "pixels", "delay_cs"}`` dicts, or
    ``None`` if the payload is malformed anywhere up to the point of
    the last decoded frame (strict: a broken later frame poisons the
    whole payload — row-level error semantics, never an exception)."""
    import struct

    import numpy as np

    if payload is None or payload[:6] not in _GIF_MAGICS:
        return None
    try:
        w_screen, h_screen, packed, _bg, _ar = struct.unpack_from(
            "<HHBBB", payload, 6
        )
        pos = 13
        global_pal = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            global_pal = np.frombuffer(
                payload[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        frames: list[dict] = []
        delay_cs = 0
        while pos < len(payload):
            block = payload[pos]
            if block == 0x3B:  # trailer: end of stream
                break
            if block == 0x21:  # extension: label + sub-blocks
                label = payload[pos + 1] if pos + 1 < len(payload) else 0
                pos += 2
                first = True
                while pos < len(payload) and payload[pos] != 0:
                    ln = payload[pos]
                    if first and label == 0xF9 and ln >= 3:
                        # GCE: packed byte, then uint16 delay (cs)
                        delay_cs = payload[pos + 2] | (payload[pos + 3] << 8)
                    first = False
                    pos += 1 + ln
                pos += 1
                continue
            if block != 0x2C:
                return None
            x0, y0, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            pal = global_pal
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(
                    payload[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None or not w or not h or w * h > _GIF_MAX_PIXELS:
                return None
            min_code = payload[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                return None
            data = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            # LZW decode (LSB-first variable width)
            clear, eoi = 1 << min_code, (1 << min_code) + 1
            table: list[bytes] = [bytes([i]) for i in range(1 << min_code)]
            table += [b"", b""]  # clear/eoi placeholders
            width = min_code + 1
            acc = bit_n = 0
            prev: bytes | None = None
            outpix = bytearray()
            need = w * h
            ended = False  # EOI terminates the WHOLE image stream —
            # resuming past it would decode trailing garbage with
            # stale table/prev state into "valid" pixels
            for byte in data:
                if ended:
                    break
                acc |= byte << bit_n
                bit_n += 8
                while bit_n >= width:
                    code = acc & ((1 << width) - 1)
                    acc >>= width
                    bit_n -= width
                    if code == clear:
                        table = [bytes([i]) for i in range(1 << min_code)]
                        table += [b"", b""]
                        width = min_code + 1
                        prev = None
                        continue
                    if code == eoi:
                        ended = True
                        break
                    if prev is None:
                        if code >= len(table):
                            return None
                        entry = table[code]
                    elif code < len(table):
                        entry = table[code]
                        table.append(prev + entry[:1])
                    elif code == len(table):
                        entry = prev + prev[:1]
                        table.append(entry)
                    else:
                        return None
                    outpix += entry
                    prev = entry
                    # the decoder's table is one entry BEHIND the
                    # encoder's (the KwKwK lag), so its width bump
                    # fires at 2^width where the encoder's fires at
                    # 2^width + 1
                    if len(table) == (1 << width) and width < 12:
                        width += 1
                    if len(outpix) >= need:
                        break
                if len(outpix) >= need:
                    break
            if len(outpix) < need:
                return None
            idx = np.frombuffer(bytes(outpix[:need]), dtype=np.uint8)
            if int(idx.max()) >= len(pal):
                return None
            rows = idx.reshape(h, w)
            if ipacked & 0x40:  # interlaced: 8/8, 8/8+4, 4/4+2, 2/2+1
                order = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                de = np.empty_like(rows)
                de[order] = rows
                rows = de
            frames.append(
                {
                    "width": w,
                    "height": h,
                    "pixels": pal[rows].astype(np.uint8),
                    "delay_cs": delay_cs,
                }
            )
            delay_cs = 0
            # consume the data terminator so the walk can reach the
            # next block of a multi-image stream
            if pos < len(payload) and payload[pos] == 0:
                pos += 1
            if len(frames) >= max_frames:
                break
        return frames or None
    except (struct.error, IndexError, ValueError):
        # ValueError: a truncated color table fails the reshape
        return None


def decode_gif(payload: bytes):
    """REAL GIF decoder (pure stdlib): header + logical screen
    descriptor, global/local color tables, extension blocks skipped,
    variable-width LSB-first LZW with clear/EOI and dictionary
    resets, interlaced images deinterlaced. Returns ``{"width",
    "height", "pixels"((h, w, 3) uint8)}`` for the FIRST image, or
    ``None`` for malformed/unsupported payloads (row-level, never an
    exception)."""
    frames = _gif_decode_frames(payload, 1)
    if not frames:
        return None
    f = frames[0]
    return {"width": f["width"], "height": f["height"], "pixels": f["pixels"]}


def gif_frames(payload: bytes, max_frames: int = 4096):
    """Decode ALL frames of a (possibly animated) GIF: list of
    ``{"width", "height", "pixels", "delay_cs"}`` in stream order, or
    ``None`` for malformed payloads. ``max_frames`` bounds work on
    adversarial payloads (a tiny file can declare an enormous
    animation; the cap keeps per-row cost bounded, the same contract
    as demux_avi_mjpeg's frame cap)."""
    return _gif_decode_frames(payload, max_frames)


def gif_test_palette():
    """The 16-color closed-form palette the GIF gate uses: entry k is
    ``(16k, 255-16k, 8k+3)`` — distinct channels so a palette-index
    mixup shows in every statistic."""
    return [(16 * k, 255 - 16 * k, 8 * k + 3) for k in range(16)]


def synthesize_gif(df: DataFrame, id_col: str, out_col: str = "image") -> DataFrame:
    """Deterministic GIF89a payloads: for row id ``d``, a
    ``(8+4·(d%3)) × (4+4·(d%2))`` image over :func:`gif_test_palette`
    whose index at flat position ``i`` is ``(d + i) % 16``. The pixel
    count is always divisible by 16, so every palette entry appears
    exactly ``w·h/16`` times and the channel sums are closed-form."""
    import numpy as np

    pal = gif_test_palette()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            payloads = []
            for did in pdf[id_col]:
                d = int(did)
                w, h = 8 + 4 * (d % 3), 4 + 4 * (d % 2)
                idx = ((d + np.arange(w * h)) % 16).astype(np.uint8)
                payloads.append(encode_gif(idx.reshape(h, w), pal))
            out[out_col] = payloads
            yield out

    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = StructType(list(df.schema.fields) + [StructField(out_col, BinaryType())])
    return _spread(df).mapInPandas(gen, schema=schema)


# Audio spectral analysis: real FFT features over PCM payloads — the
# frequency-domain complement of pcm_energy's time-domain windows.
# The gate synthesizes PURE TONES with an exact integer number of
# cycles per analysis window, so the dominant DFT bin is closed-form
# (the oracle replays it with integer arithmetic) while the
# noise-sensitive statistics (centroid, flatness, Parseval power)
# are emitted as bounded-error verdict booleans, the lossy-codec
# gate contract (see encode_jpeg's header comment).

_TONE_WINDOW = 1024  # analysis window: 128 ms at 8 kHz
_TONE_AMP = 8000


def synthesize_tone_wav(df: DataFrame, id_col: str, out_col: str = "audio") -> DataFrame:
    """Deterministic pure-tone WAV payloads: for row id ``d``, a mono
    16-bit sine with ``k = 10 + d % 50`` cycles per 1024-sample
    window (so bin ``k`` is the exact DFT line), amplitude 8000, over
    ``2 + d % 3`` full windows at 8 kHz. Samples are
    ``rint(8000 · sin(2π·k·i/1024))`` — the ±0.5 rounding is the only
    departure from the ideal tone, and every bounded-error verdict in
    :func:`audio_spectral` budgets for exactly that."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for did in pdf[id_col]:
                d = int(did)
                k = 10 + d % 50
                n = (2 + d % 3) * _TONE_WINDOW
                i = np.arange(n, dtype=np.float64)
                data = np.rint(
                    _TONE_AMP * np.sin(2.0 * np.pi * k * i / _TONE_WINDOW)
                ).astype("<i2").tobytes()
                outs.append(_wav_header(len(data)) + data)
            out = pdf.copy()
            out[out_col] = outs
            yield out

    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = StructType(list(df.schema.fields) + [StructField(out_col, BinaryType())])
    return _spread(df).mapInPandas(gen, schema=schema)


def audio_spectral(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    window: int = _TONE_WINDOW,
    tone_amp: float = _TONE_AMP,
) -> DataFrame:
    """REAL frequency-domain DSP: per full ``window``-sample window of
    each mono 16-bit WAV payload, an rFFT magnitude spectrum reduced
    to — ``dominant_bin`` (argmax over non-DC bins) and its
    ``dominant_hz``, plus three bounded-error verdicts computed
    entirely from the signal (no oracle knowledge): ``ok_centroid``
    (magnitude-weighted mean bin within 1.0 of the dominant line —
    true for a pure tone, false for broadband), ``ok_power``
    (time-domain sum-of-squares within 0.1% of a single
    ``tone_amp``-amplitude tone's A²·N/2), ``ok_flat`` (spectral
    flatness < 0.1 — a tone is a line spectrum, white noise ≈ 1).

    Scale shape: one Arrow-batched mapInPandas projection, payload
    column pruned until touched, no shuffle; the rFFT batches all of
    a payload's windows in a single ``(n_windows, window)``
    vectorized call."""
    import numpy as np

    half = window // 2

    def spectral(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, wins, dom, hz, okc, okp, okf = [], [], [], [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                parsed = _parse_wav(payload)
                if parsed is None or parsed[0] != 1 or parsed[2] != 16:
                    continue
                rate = parsed[1]
                samples = np.frombuffer(parsed[4], dtype="<i2").astype(np.float64)
                n_full = len(samples) // window
                if n_full == 0:
                    continue
                frames = samples[: n_full * window].reshape(n_full, window)
                mags = np.abs(np.fft.rfft(frames, axis=1))[:, 1 : half + 1]
                bins = np.arange(1, half + 1, dtype=np.float64)
                dom_bin = np.argmax(mags, axis=1) + 1
                total = mags.sum(axis=1)
                centroid = (mags @ bins) / np.where(total > 0, total, 1.0)
                sum_sq = (frames * frames).sum(axis=1)
                expected = tone_amp * tone_amp * window / 2.0
                flat = np.exp(np.log(mags + 1e-12).mean(axis=1)) / np.where(
                    total > 0, total / half, 1.0
                )
                ids.extend([did] * n_full)
                wins.extend(range(n_full))
                dom.extend(dom_bin.tolist())
                hz.extend((dom_bin * (rate / window)).tolist())
                okc.extend((np.abs(centroid - dom_bin) < 1.0).tolist())
                okp.extend(
                    (np.abs(sum_sq / expected - 1.0) < 1e-3).tolist()
                )
                okf.extend((flat < 0.1).tolist())
            yield pd.DataFrame(
                {
                    id_col: ids, "window_id": wins, "dominant_bin": dom,
                    "dominant_hz": hz, "ok_centroid": okc,
                    "ok_power": okp, "ok_flat": okf,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        spectral,
        schema=f"{id_col} long, window_id int, dominant_bin int, "
        "dominant_hz double, ok_centroid boolean, ok_power boolean, "
        "ok_flat boolean",
    )


def synthesize_gif_anim(df: DataFrame, id_col: str, out_col: str = "video") -> DataFrame:
    """Deterministic ANIMATED GIF89a payloads: for row id ``d``,
    ``2 + d % 3`` full-canvas frames of the still-gate geometry
    (``(8+4·(d%3)) × (4+4·(d%2))`` over :func:`gif_test_palette`),
    frame ``f``'s index at flat position ``i`` being
    ``(d + f + i) % 16`` and its GCE delay ``4 + (d + f) % 6``
    centiseconds. Channel sums stay closed-form per frame (every
    palette entry appears exactly w·h/16 times) while ``px00_r``
    pins the per-frame phase — a frame mixup shows immediately."""
    import numpy as np

    pal = gif_test_palette()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                d = int(did)
                w, h = 8 + 4 * (d % 3), 4 + 4 * (d % 2)
                nf = 2 + d % 3
                frames = [
                    ((d + f + np.arange(w * h)) % 16)
                    .astype(np.uint8)
                    .reshape(h, w)
                    for f in range(nf)
                ]
                delays = [4 + (d + f) % 6 for f in range(nf)]
                payloads.append(encode_gif_anim(frames, pal, delays))
            out = pdf.copy()
            out[out_col] = payloads
            yield out

    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = StructType(list(df.schema.fields) + [StructField(out_col, BinaryType())])
    return _spread(df).mapInPandas(gen, schema=schema)


def gif_frame_stats(
    df: DataFrame, payload_col: str, id_col: str, max_frames: int = 4096
) -> DataFrame:
    """REAL animated-GIF analysis: demux + LZW-decode every frame of
    each payload (:func:`gif_frames`) and emit one row per frame with
    its GCE delay, exact per-channel sums (GIF is lossless — the
    BMP/PNG hash-exact contract), and the top-left red value pinning
    frame identity. Malformed payloads yield one ``valid = false``
    row, never an executor exception.

    Scale shape: payload column pruned until touched, one
    Arrow-batched mapInPandas, no shuffle; output multiplicity is the
    (capped) frame count."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                frames = gif_frames(
                    None if p is None else bytes(p), max_frames
                )
                if not frames:
                    rows.append(
                        (did, False, None, None, None, None, None,
                         None, None, None, None)
                    )
                    continue
                nf = len(frames)
                for f, m in enumerate(frames):
                    px = m["pixels"].astype(np.int64)
                    rows.append(
                        (
                            did, True, m["width"], m["height"], nf, f,
                            m["delay_cs"], int(px[..., 0].sum()),
                            int(px[..., 1].sum()), int(px[..., 2].sum()),
                            int(m["pixels"][0, 0, 0]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "valid", "width", "height", "n_frames",
                    "frame_idx", "delay_cs", "sum_r", "sum_g", "sum_b",
                    "px00_r",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        run,
        schema=f"{id_col} long, valid boolean, width int, height int, "
        "n_frames int, frame_idx int, delay_cs int, sum_r long, "
        "sum_g long, sum_b long, px00_r int",
    )


def synthesize_bmp_pairs(
    df: DataFrame, id_col: str, out_col: str = "image"
) -> DataFrame:
    """Deterministic NEAR-DUPLICATE image pairs for the perceptual-
    hash gate: ids ``2e`` and ``2e+1`` share one closed-form 12×10
    BMP keyed on ``e = d // 2``, and the ODD id perturbs pixel
    (0, 0)'s red channel by +40 (mod 256) — a change confined to ONE
    cell of any downsampled grid, so the pair's difference hash
    differs in at most one bit. The channel formulas are
    built by INTEGER DIVISION of a per-image scramble by a per-pixel
    divisor — ``r = (e·2654435761 + 101) // (1 + x + 12y) % 256``
    etc. The division is load-bearing: any formula of the shape
    ``f(e)·g(x,y) mod 256`` depends on ``f(e) mod 256`` ONLY, so the
    whole image space collapses to 256 distinct images and at 50k
    docs every one repeats ~100 times — the 'near-dup' output
    explodes to millions of genuine-but-degenerate pairs (reproduced,
    along with the all-identical-dhash failure of a plain linear
    gradient). Quotients by 72 different divisors escape the modular
    structure, so distinct e give distinct images and unrelated
    dhashes are ~uniform. Closed-form in the id, so oracles replay
    hashes and pairs exactly."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for did in pdf[id_col]:
                d = int(did)
                base = (d // 2) * 2654435761 + 101
                w, h = 12, 10
                x = np.arange(w, dtype=np.int64)
                y = np.arange(h, dtype=np.int64)[:, None]
                r = (base // (1 + x + 12 * y)) % 256
                g = (base // (7 + 2 * x + 5 * y)) % 256
                b = (base // (13 + 3 * x + y)) % 256
                if d % 2 == 1:
                    r = r.copy()
                    r[0, 0] = (r[0, 0] + 40) % 256
                px = np.stack([r, g, b], axis=-1).astype(np.uint8)
                outs.append(encode_bmp(px))
            out = pdf.copy()
            out[out_col] = outs
            yield out

    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = StructType(
        df.schema.fields + [StructField(out_col, BinaryType())]
    )
    return _spread(df).mapInPandas(gen, schema=schema)


_DHASH_GRID_W = 9   # 8 horizontal comparisons per row
_DHASH_GRID_H = 7   # 7 rows -> 56 bits, exactly a non-negative long


def dhash_bits(pixels) -> int:
    """56-bit difference hash of an (h, w, 3) uint8 RGB array:
    nearest-neighbor downsample to a 9×7 grid (``src = (dst ·
    src_dim) // dst_dim`` — the codec family's exact integer
    mapping), integer luma ``(299r + 587g + 114b) // 1000``, then bit
    ``y*8 + x`` is set when ``gray[y][x] > gray[y][x+1]``. 56 bits
    (not 64) keeps the value positive in a signed long — the same
    choice as dedup.simhash."""
    import numpy as np

    h, w = pixels.shape[0], pixels.shape[1]
    sy = (np.arange(_DHASH_GRID_H) * h) // _DHASH_GRID_H
    sx = (np.arange(_DHASH_GRID_W) * w) // _DHASH_GRID_W
    p = pixels.astype(np.int64)
    gray = (299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]) // 1000
    grid = gray[np.ix_(sy, sx)]
    bits = grid[:, :-1] > grid[:, 1:]
    out = 0
    for yy in range(_DHASH_GRID_H):
        for xx in range(_DHASH_GRID_W - 1):
            if bits[yy, xx]:
                out |= 1 << (yy * 8 + xx)
    return out


def dhash_images(
    df: DataFrame, img_col: str, id_col: str, out_col: str = "dhash"
) -> DataFrame:
    """Perceptual difference hash per image payload over the REAL
    decode path (BMP/PNG — the pixel-returning codecs): one
    Arrow-batched mapInPandas projection, no shuffle; undecodable or
    null payloads hash to null (row-level data problems, never
    executor exceptions). The output feeds
    :func:`dedup.hamming_near_dups` — visually-near-identical images
    (re-encodes, tiny edits) land within a few bits of each other,
    which byte-level hashing can never see."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for payload in pdf[img_col]:
                val = None
                if payload is not None:
                    raw = bytes(payload)
                    meta = None
                    if raw[:2] == _BMP_MAGIC:
                        meta = decode_bmp(raw)
                    elif raw[: len(_PNG_MAGIC)] == _PNG_MAGIC:
                        meta = decode_png(raw)
                    if meta is not None:
                        val = dhash_bits(meta["pixels"])
                hashes.append(val)
            yield pd.DataFrame(
                {id_col: pdf[id_col], out_col: pd.array(hashes, dtype="Int64")}
            )

    from pyspark.sql.types import LongType, StructField, StructType

    id_type = df.schema[id_col].dataType
    schema = StructType(
        [StructField(id_col, id_type), StructField(out_col, LongType())]
    )
    return _spread(df).mapInPandas(gen, schema=schema)


_FP_WINDOW = 512        # fingerprint analysis window (64 ms at 8 kHz)
_FP_WINDOWS = 57        # 57 dominant bins -> 56 adjacent comparisons


def synthesize_chirp_wav_pairs(
    df: DataFrame, id_col: str, out_col: str = "audio"
) -> DataFrame:
    """Deterministic NEAR-DUPLICATE audio pairs for the fingerprint
    gate: ids ``2e`` and ``2e+1`` share one 57-window stepped-tone WAV
    (window ``w`` is a pure sine with EXACTLY ``k_w = 5 +
    (base // (w+1)) % 200`` cycles per 512-sample window, ``base =
    e·2654435761 + 101`` — the same division trick as the image
    pairs, so the bin sequence is aperiodic in e), and the ODD id
    shifts WINDOW 0's tone up one bin — a change confined to one
    comparison of the difference fingerprint, so the pair lands
    within 1 bit while unrelated ids differ ~everywhere. Closed-form
    in the id for oracle replay; the DSP side (FFT, argmax) stays
    genuinely real."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            i = np.arange(_FP_WINDOW, dtype=np.float64)
            for did in pdf[id_col]:
                d = int(did)
                base = (d // 2) * 2654435761 + 101
                chunks = []
                for w in range(_FP_WINDOWS):
                    k = 5 + (base // (w + 1)) % 200
                    if d % 2 == 1 and w == 0:
                        k += 1
                    chunks.append(
                        np.rint(
                            _TONE_AMP
                            * np.sin(2.0 * np.pi * k * i / _FP_WINDOW)
                        ).astype("<i2")
                    )
                data = np.concatenate(chunks).tobytes()
                outs.append(_wav_header(len(data)) + data)
            out = pdf.copy()
            out[out_col] = outs
            yield out

    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, BinaryType())]
    )
    return _spread(df).mapInPandas(gen, schema=schema)


def audio_fingerprint(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    out_col: str = "afp",
    window: int = _FP_WINDOW,
) -> DataFrame:
    """56-bit audio difference fingerprint over the REAL DSP path —
    the Shazam-shaped idea reduced to its pairable core: per full
    ``window``-sample window an rFFT finds the DOMINANT bin (argmax
    over non-DC magnitudes), and bit ``w`` is set when window ``w``'s
    dominant bin exceeds window ``w+1``'s — the spectral trajectory's
    sign pattern, robust to amplitude/level changes the way dhash is
    robust to brightness. Payloads with fewer than 57 full windows
    (or non-mono/non-16-bit WAVs) fingerprint to null. One
    Arrow-batched mapInPandas projection, no shuffle; feeds
    :func:`dedup.hamming_near_dups`."""
    import numpy as np

    half = window // 2

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for payload in pdf[payload_col]:
                out = None
                parsed = _parse_wav(bytes(payload)) if payload is not None else None
                if parsed is not None and parsed[0] == 1 and parsed[2] == 16:
                    samples = np.frombuffer(
                        parsed[4], dtype="<i2"
                    ).astype(np.float64)
                    n_full = len(samples) // window
                    if n_full >= _FP_WINDOWS:
                        frames = samples[
                            : _FP_WINDOWS * window
                        ].reshape(_FP_WINDOWS, window)
                        mags = np.abs(np.fft.rfft(frames, axis=1))[
                            :, 1 : half + 1
                        ]
                        bins = mags.argmax(axis=1) + 1  # 1-based bin
                        out = 0
                        for w in range(_FP_WINDOWS - 1):
                            if bins[w] > bins[w + 1]:
                                out |= 1 << w
                vals.append(out)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: pd.array(vals, dtype="Int64"),
                }
            )

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField(out_col, LongType()),
        ]
    )
    return _spread(df).mapInPandas(gen, schema=schema)
