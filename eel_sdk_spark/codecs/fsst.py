"""FSST-style symbol-table compression for text columns.

Like FSST (Boncz, Neumann, Mühleisen: "FSST: Fast Random Access String
Compression", VLDB 2020), we learn a small table of frequent multi-byte
symbols from a sample and replace occurrences with single codes. The
construction here is byte-pair-merge based (BPE) because pair-merge is
expressible as whole-array numpy ops — the north rule forbids per-row
Python, and a longest-match trie encoder cannot be vectorized in numpy.

Train: iteratively merge the most frequent adjacent code pair on a bounded
sample (greedy-left overlap resolution, fully vectorized), stopping early
when the best pair's sample frequency falls below ``min_pair_frac`` (the
Zipf tail: merges cost a full replay pass each but stop paying for
themselves once rare — the stop rule is the measured knee of the
ratio/throughput curve).

Replay kernel (round 7): codes are int16 (495 max fits comfortably) —
halving the memory traffic of the pass loop measured 36 -> 62 MB/s/core
at the compression knee and 5.1 -> 5.9 at archive merges on real corpus
text; output bit-identical. Multi-merge batch replay was prototyped
TWICE more and re-rejected with data: an EXACT conflict-free batcher
(pairs whose {b} never meets another's {a} provably have disjoint
matches, so one vectorized pass equals sequential replay — verified
bit-identical) ran 0.5-0.6x the sequential int16 kernel both via
searchsorted key matching and via a 2^20-entry LUT gather, because the
pair-key construction (astype + shift + or = 3 full passes) costs more
than the two compares it replaces and conflict-free batches on English
text are small (median ~3, max 9 — common letters chain through
space/e/t). The sequential pass loop IS the numpy ceiling; see
BENCH.md round-7 FSST table. Encode: replay the learned merges over the
concatenated column bytes; the final code stream is stored as raw uint16
(BYTE-ALIGNED, not bit-packed: measured on webtext, the zstd cascade both
compresses aligned codes better — 26.2x -> 28.5x with full merges — and
runs ~10x faster on them, because bit-packing destroys the byte-aligned
repeats zstd's match finder needs). Decode: expand each code to its byte
expansion via one object-array gather + join.

The reference has no text codec at all (strings go to parquet dictionary
pages, RowParquetWriterFn.scala:44); this is a from-scratch addition
mandated by the north rule.
"""

from __future__ import annotations

import numpy as np

from . import for_
from .base import Encoded
from .bitpack import bit_width, unpack_uints

NAME = "fsst"

MAX_MERGES = 240  # code space caps at 496 codes (fits uint16 storage)
SAMPLE_CAP = 1 << 16  # train on at most 64 KiB (measured: ratio within 4%
                      # of a 256 KiB sample at 3x lower training cost)
MIN_PAIR_COUNT = 8  # stop when the best pair is this rare in the sample
# adaptive stop: end training when the best pair covers less than this
# fraction of the (shrinking) sample — each merge costs one full replay
# pass over the real data, and past this knee the ratio gain no longer
# pays for it (measured on webtext: 0 -> 240 merges @2.6 MB/s/core,
# 0.006 -> ~50 merges @6.5 MB/s/core at ~40% of the extra ratio; the
# outer zstd-9 cascade recovers most of the rest on aligned codes).
# min_pair_frac=0.0 restores exhaustive merging (max-ratio archival).
MIN_PAIR_FRAC = 0.006

# profile -> merge-stop fraction ladder (measured on webtext, BENCH.md
# round-5 "FSST preset ladder"): 'compression' sits at the knee where
# most of the ratio is kept at a fraction of the replay cost;
# 'archive' merges exhaustively for max ratio (cold data written once,
# read rarely — replay cost is paid once, bytes are paid forever).
PROFILE_PAIR_FRAC = {
    "speed": MIN_PAIR_FRAC,        # selector rarely routes text here
    "compression": 0.02,  # tuned by the round-5 measurement
    "archive": 0.0,
}


def frac_for_profile(profile: str) -> float:
    return PROFILE_PAIR_FRAC.get(profile, MIN_PAIR_FRAC)


def _apply_merge(codes: np.ndarray, a: int, b: int, new: int) -> np.ndarray:
    m = np.flatnonzero((codes[:-1] == a) & (codes[1:] == b))
    if m.size == 0:
        return codes
    if a == b:
        # greedy-left within runs of overlapping matches: keep even offsets
        rs = np.diff(m, prepend=m[0] - 2) != 1
        run_starts = m[rs]
        run_id = np.cumsum(rs) - 1
        offset = m - run_starts[run_id]
        m = m[offset % 2 == 0]
    codes[m] = new
    keep = np.ones(codes.size, dtype=bool)
    keep[m + 1] = False
    return codes[keep]


def train(sample: bytes, max_merges: int = MAX_MERGES,
          min_pair_frac: float = MIN_PAIR_FRAC) -> list[tuple[int, int]]:
    """Learn merge rules from a byte sample. Returns ordered (a, b) pairs."""
    if len(sample) > SAMPLE_CAP:
        sample = sample[:SAMPLE_CAP]
    codes = np.frombuffer(sample, dtype=np.uint8).astype(np.int16)
    merges: list[tuple[int, int]] = []
    for i in range(max_merges):
        if codes.size < 2:
            break
        pairs = codes[:-1].astype(np.int64) * 0x10000 + codes[1:]
        uniq, counts = np.unique(pairs, return_counts=True)
        j = int(np.argmax(counts))
        if counts[j] < max(MIN_PAIR_COUNT, min_pair_frac * codes.size):
            break
        best = int(uniq[j])
        a, b = best >> 16, best & 0xFFFF
        merges.append((a, b))
        codes = _apply_merge(codes, a, b, 256 + i)
    return merges


def _expansions(merges: list[tuple[int, int]]) -> np.ndarray:
    """code -> bytes expansion table as an object ndarray for fast gather."""
    syms: list[bytes] = [bytes([i]) for i in range(256)]
    for a, b in merges:
        syms.append(syms[a] + syms[b])
    return np.array(syms, dtype=object)


def apply_merges(data: bytes, merges: list[tuple[int, int]]) -> np.ndarray:
    """Sequential merge replay in training (frequency) order.

    Note: a round-batched variant (grouping dependency-independent merges
    into one vectorized pass) was measured and REJECTED: batching inverts
    merge priority inside overlap runs, costing ~20% compression, and the
    slower array shrinkage erases the pass-count win. Frequency-ordered
    sequential passes shrink the array geometrically — most passes touch a
    small fraction of the original bytes."""
    codes = np.frombuffer(data, dtype=np.uint8).astype(np.int16)
    for i, (a, b) in enumerate(merges):
        codes = _apply_merge(codes, a, b, 256 + i)
    return codes


def encode(lengths: np.ndarray, data: bytes,
           merges: list[tuple[int, int]] | None = None) -> Encoded:
    """lengths/data: the bytes_view of a non-null string column.

    Code stream stored as raw little-endian uint16 (``w: 0``): byte
    alignment lets the outer zstd cascade find the repeats the merges did
    not cover (measured better AND faster than bit-packing, module doc)."""
    if merges is None:
        merges = train(data)
    codes = apply_merges(data, merges)
    payload = codes.astype("<u2").tobytes()
    lens_enc = for_.encode(lengths.astype(np.int64))
    merge_arr = np.array(merges, dtype=np.uint16).tobytes() if merges else b""
    return Encoded(
        NAME,
        payload,
        {"n": len(lengths), "nc": codes.size, "w": 0,
         "nm": len(merges), "lp": lens_enc.params},
        {"merges": merge_arr, "lens": lens_enc.payload},
    )


def decode(payload: bytes, params: dict, tables: dict) -> tuple[np.ndarray, bytes]:
    """Returns (lengths, data) matching bytes_view. ``w > 0`` decodes the
    round-1 bit-packed layout (back-compat for already-written blocks)."""
    nm = params["nm"]
    merges = (
        [tuple(p) for p in np.frombuffer(tables["merges"], dtype=np.uint16)
         .reshape(nm, 2).astype(int)]
        if nm else []
    )
    if params["w"]:
        codes = unpack_uints(payload, params["w"], params["nc"]).astype(np.int64)
    else:
        codes = np.frombuffer(payload, dtype="<u2").astype(np.int64)
    table = _expansions(merges)
    data = b"".join(table[codes]) if codes.size else b""
    lengths = for_.decode(tables["lens"], params["lp"], {})
    return lengths, data


def estimate_ratio(sample: bytes, merges: list[tuple[int, int]]) -> float:
    """Estimated encoded-bits-per-original-byte on a sample (selector hook).
    Uses the effective post-zstd width: the uint16 stream's high bytes are
    near-constant and vanish in the cascade, so the pre-cascade cost is
    ~bit_width bits per code."""
    if not sample:
        return 1.0
    sample = sample[:SAMPLE_CAP]
    codes = apply_merges(sample, merges)
    width = bit_width(255 + len(merges))
    return (codes.size * width) / (len(sample) * 8.0)
