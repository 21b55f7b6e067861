"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed in Arrow-batched UDFs.

The decode step itself is STUBBED (this container ships no image/audio
libs — see the import-try below): ``decode_image`` raises
``NotImplementedError`` unless PIL is importable, and the tested path uses
``fake_decode_meta``, a deterministic pure function of the bytes, so the
Spark-side plumbing — schema, batch shape, ``mapInArrow`` signature,
partition behavior — is real and covered by tests/oracles.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame

try:  # real decoders, absent in this image
    from PIL import Image  # noqa: F401
    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MEDIA_META_DDL = ("doc_id bigint, n_bytes bigint, fake_width int, "
                  "fake_height int, fake_frames int")


def decode_image(data: bytes):
    """Real image decode — gated on PIL availability."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decoding requires PIL; not available in this container")
    import io

    from PIL import Image
    return Image.open(io.BytesIO(data))


def fake_decode_meta(ids: pa.Array, blobs: pa.Array) -> pa.RecordBatch:
    """Deterministic stand-in for decode: metadata derived from byte length
    only — replayable in ANSI SQL for the oracle (octet_length % k)."""
    blobs = blobs.cast(pa.large_binary())
    offsets = np.frombuffer(blobs.buffers()[1], dtype=np.int64,
                            count=len(blobs) + 1, offset=blobs.offset * 8)
    n_bytes = np.diff(offsets)
    return pa.record_batch(
        [
            ids.cast(pa.int64()),
            pa.array(n_bytes, type=pa.int64()),
            pa.array((n_bytes % 640).astype(np.int32), type=pa.int32()),
            pa.array((n_bytes % 480).astype(np.int32), type=pa.int32()),
            pa.array((n_bytes % 7).astype(np.int32), type=pa.int32()),
        ],
        names=["doc_id", "n_bytes", "fake_width", "fake_height", "fake_frames"],
    )


def media_metadata(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """The production plumbing: binary column in, typed metadata out, one
    ``mapInArrow`` stage, zero shuffles, batch-at-a-time memory profile
    (a 100 TB media table streams through without materializing blobs)."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            yield fake_decode_meta(b.column(id_col), b.column(blob_col))

    return df.select(id_col, blob_col).mapInArrow(run, MEDIA_META_DDL)


def frame_sample_positions(n_frames: int, every: int = 5) -> list[int]:
    """Frame-sampling policy (pure, shared with tests)."""
    return list(range(0, max(n_frames, 0), every))
