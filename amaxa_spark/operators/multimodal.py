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


def resize_images(
    df: DataFrame, payload_col: str = "payload", width: int = 224, height: int = 224
) -> DataFrame:  # pragma: no cover - stub
    """STUB: image resize requires PIL/libvips; the distributed shape
    is identical to :func:`extract_image_meta` (mapInPandas over the
    binary column, returning a new binary column)."""
    raise NotImplementedError("image resize: codec libraries not available")


def frame_sample(
    df: DataFrame, payload_col: str = "payload", every_n: int = 10
) -> DataFrame:  # pragma: no cover - stub
    """STUB: video frame sampling requires ffmpeg bindings."""
    raise NotImplementedError("video frame sampling: codec libraries not available")
