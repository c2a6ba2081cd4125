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


def decode_real(payload: bytes) -> dict:  # pragma: no cover - stub
    """STUB: real image decode requires PIL/libvips, not present in
    this environment."""
    raise NotImplementedError("real image decode: codec libraries not available")


def extract_image_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """mapInPandas metadata extraction over Arrow batches — the real
    distributed plumbing around the (stubbed) decoder.

    Returns (id, valid, n_bytes, width, height, fmt).
    """
    schema = (
        f"{id_col} long, valid boolean, n_bytes int, width int, height int, fmt string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_stub(p) for p in pdf[payload_col]]
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


def resize_real(payload: bytes, width: int, height: int) -> bytes:  # pragma: no cover
    """STUB: real image resize requires PIL/libvips, not present in
    this environment."""
    raise NotImplementedError("image resize: codec libraries not available")


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
