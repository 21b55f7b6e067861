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


FRAME_DDL = "doc_id bigint, frame_idx int, frame_off bigint"


def sample_frames(df: DataFrame, id_col: str, blob_col: str,
                  every: int = 2) -> DataFrame:
    """Video-style frame sampling plumbing: one output row per sampled
    frame (1->N fan-out INSIDE the Arrow batch — np.repeat expansion, no
    per-row Python, no shuffle). Frame count/offsets come from the same
    deterministic byte-length fake as ``media_metadata`` (real containers
    would parse the header here); ``frame_off`` is the byte offset a real
    demuxer would seek to."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = np.asarray(b.column(id_col).cast(pa.int64()))
            blobs = b.column(blob_col).cast(pa.large_binary())
            offsets = np.frombuffer(blobs.buffers()[1], dtype=np.int64,
                                    count=len(blobs) + 1,
                                    offset=blobs.offset * 8)
            n_bytes = np.diff(offsets)
            f = n_bytes % 7  # fake frame count (matches media_metadata)
            counts = np.where(f > 0, (f - 1) // every + 1, 0).astype(np.int64)
            total = int(counts.sum())
            if total == 0:
                continue
            starts = np.repeat(np.cumsum(counts) - counts, counts)
            local = np.arange(total) - starts
            frame_idx = (local * every).astype(np.int32)
            rep_nb = np.repeat(n_bytes, counts)
            rep_f = np.repeat(f, counts)
            frame_off = frame_idx * (rep_nb // np.maximum(rep_f, 1))
            yield pa.record_batch(
                [pa.array(np.repeat(ids, counts), type=pa.int64()),
                 pa.array(frame_idx, type=pa.int32()),
                 pa.array(frame_off, type=pa.int64())],
                names=["doc_id", "frame_idx", "frame_off"])

    return df.select(id_col, blob_col).mapInArrow(run, FRAME_DDL)


def resize_images(df: DataFrame, id_col: str, blob_col: str,
                  width: int = 64, height: int = 64) -> DataFrame:
    """Image-resize plumbing: binary in, fixed-size binary out (one
    ``width*height`` grayscale byte plane per row), one mapInArrow stage.

    With PIL present the real decode->resize->tobytes path runs; in this
    container (no image libs — module docstring) the DETERMINISTIC FAKE
    stride-samples the raw bytes down to exactly ``width*height`` — a
    pure function of the input, so the Spark-side plumbing (schema,
    batching, whole-batch numpy gather, fixed output geometry) is real
    and testable. Empty blobs yield empty bytes."""
    target = width * height

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..codecs.base import bytes_to_arrow

        for b in batches:
            ids = b.column(id_col).cast(pa.int64())
            blobs = b.column(blob_col).cast(pa.large_binary())
            bufs = blobs.buffers()
            offsets = np.frombuffer(bufs[1], dtype=np.int64,
                                    count=len(blobs) + 1,
                                    offset=blobs.offset * 8)
            data = np.frombuffer(bufs[2], dtype=np.uint8,
                                 count=int(offsets[-1]))[offsets[0]:]
            n_bytes = np.diff(offsets)
            if HAVE_PIL:  # pragma: no cover - image libs absent here
                import io

                from PIL import Image

                outs = []
                for i in range(len(blobs)):
                    raw = blobs[i].as_py()
                    if not raw:
                        outs.append(b"")
                        continue
                    img = Image.open(io.BytesIO(raw)).convert("L")
                    outs.append(img.resize((width, height)).tobytes())
                lengths = np.array([len(o) for o in outs], dtype=np.int64)
                payload = b"".join(outs)
            else:
                pos = np.flatnonzero(n_bytes > 0)
                nb = n_bytes[pos]
                # per nonempty row: gather `target` bytes at even strides
                grid = np.tile(np.arange(target, dtype=np.int64), pos.size)
                base = np.repeat(offsets[pos] - offsets[0], target)
                take = base + grid * np.repeat(nb, target) // target
                sampled = data[take]
                lengths = np.where(n_bytes > 0, target, 0).astype(np.int64)
                payload = sampled.tobytes()
            out = bytes_to_arrow(lengths, payload, pa.large_binary())
            yield pa.record_batch(
                [ids, out,
                 pa.array(np.full(len(blobs), width, dtype=np.int32)),
                 pa.array(np.full(len(blobs), height, dtype=np.int32))],
                names=["doc_id", "image", "width", "height"])

    return df.select(id_col, blob_col).mapInArrow(
        run, "doc_id bigint, image binary, width int, height int")


def audio_windows(df: DataFrame, id_col: str, blob_col: str,
                  window: int = 4096, hop: int = 2048) -> DataFrame:
    """Audio plumbing: slice a PCM-like byte blob into overlapping
    fixed-size windows (the framing every audio featurizer starts with) —
    1->N fan-out that carries the ACTUAL window bytes, not just offsets.
    A real deployment decodes the container first (decode step stubbed —
    module docstring); framing raw bytes keeps the plumbing — schema,
    fan-out, whole-batch numpy gather — real and testable.

    Output: (id, win_idx, win_off, chunk binary); trailing partial
    windows are dropped (standard STFT framing semantics). Whole-batch:
    one np gather builds every window of every row at once."""
    assert hop > 0 and window > 0

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..codecs.base import bytes_to_arrow

        for b in batches:
            ids = np.asarray(b.column(id_col).cast(pa.int64()))
            blobs = b.column(blob_col).cast(pa.large_binary())
            bufs = blobs.buffers()
            offsets = np.frombuffer(bufs[1], dtype=np.int64,
                                    count=len(blobs) + 1,
                                    offset=blobs.offset * 8)
            data = np.frombuffer(bufs[2], dtype=np.uint8,
                                 count=int(offsets[-1]))[offsets[0]:]
            n_bytes = np.diff(offsets)
            counts = np.maximum((n_bytes - window) // hop + 1, 0)
            total = int(counts.sum())
            if total == 0:
                continue
            row_pos = np.flatnonzero(counts)
            starts = np.repeat(np.cumsum(counts) - counts, counts)
            win_idx = (np.arange(total) - starts).astype(np.int64)
            win_off = win_idx * hop
            base = np.repeat(offsets[:-1] - offsets[0], counts)
            take = (base + win_off)[:, None] + np.arange(window)
            chunks = data[take.reshape(-1)]
            lengths = np.full(total, window, dtype=np.int64)
            out = bytes_to_arrow(lengths, chunks.tobytes(),
                                 pa.large_binary())
            del row_pos
            yield pa.record_batch(
                [pa.array(np.repeat(ids, counts), type=pa.int64()),
                 pa.array(win_idx.astype(np.int32), type=pa.int32()),
                 pa.array(win_off, type=pa.int64()),
                 out],
                names=["doc_id", "win_idx", "win_off", "chunk"])

    return df.select(id_col, blob_col).mapInArrow(
        run, "doc_id bigint, win_idx int, win_off bigint, chunk binary")


def extract_features(df: DataFrame, id_col: str, blob_col: str,
                     dim: int = 16) -> DataFrame:
    """Feature-extraction plumbing: binary in, fixed-dim float vector out,
    one mapInArrow stage. The deterministic fake feature is the normalized
    ``dim``-bucket byte histogram (a real deployment swaps in the model
    forward pass here — same schema, same batch shape). Whole-batch numpy:
    one bincount over (row * dim + bucket)."""
    assert 256 % dim == 0

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        shift = 8 - (dim - 1).bit_length()
        for b in batches:
            ids = b.column(id_col).cast(pa.int64())
            blobs = b.column(blob_col).cast(pa.large_binary())
            bufs = blobs.buffers()
            offsets = np.frombuffer(bufs[1], dtype=np.int64,
                                    count=len(blobs) + 1,
                                    offset=blobs.offset * 8)
            data = np.frombuffer(bufs[2], dtype=np.uint8,
                                 count=int(offsets[-1]))[offsets[0]:]
            n = len(blobs)
            n_bytes = np.diff(offsets)
            row_of_byte = np.repeat(np.arange(n, dtype=np.int64), n_bytes)
            buckets = (data >> shift).astype(np.int64)
            hist = np.bincount(row_of_byte * dim + buckets,
                               minlength=n * dim).reshape(n, dim)
            feats = hist / np.maximum(n_bytes, 1)[:, None]
            yield pa.record_batch(
                [ids, pa.array(list(feats.astype(np.float32)))],
                names=["doc_id", "features"])

    return df.select(id_col, blob_col).mapInArrow(
        run, "doc_id bigint, features array<float>")
