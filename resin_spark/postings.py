"""Posting-block codec: delta + varint encoding in vectorized numpy.

The reference stores postings as raw ``[count:int64][docId:int64]*``
(/root/reference/src/Sir.VectorSpace/PostingsReader.cs:37-62 — 8 bytes per
docID, no compression; QuickLZ exists but is dead code).  Per the north
rule we delta-encode sorted doc_ids and varint-pack them; Parquet then
applies zstd page compression on top (block-compression), typically
>10x smaller than raw int64 postings.

Encode/decode are numpy-vectorized (no per-int Python loops beyond a
bounded <=10-iteration shift loop) and run inside Arrow-batched pandas
UDFs — the "vectorized pandas/Arrow UDFs (no per-row Python)" requirement
of the input hint.

Block layout (one Parquet row per (field, term, block_id, segment)):
    doc_ids_bin : varint(delta(sorted doc_ids)))
    tfs_bin     : varint(tf per posting, same order)
    dls_bin     : varint(dl per posting) — storing dl inline makes query
                  scoring self-contained (no doclens join at query time;
                  late materialization, SURVEY.md §4.1)
    df_block, max_tf, min_dl : block metadata for df aggregation and
                  block-max WAND upper bounds (computed query-time with the
                  *current* avgdl so bounds stay valid as segments land)
"""

from __future__ import annotations

import numpy as np

_THRESH = [1 << (7 * k) for k in range(1, 10)]  # 2^7, 2^14, ... 2^63


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-style varint encoding of a uint64 array, vectorized.  One
    codec implementation only: this is the single-segment case of
    varint_encode_segmented."""
    return varint_encode_segmented(
        np.asarray(values), np.array([0, len(values)], dtype=np.int64)
    )[0]


def varint_encode_segmented(values: np.ndarray,
                            seg_offsets: np.ndarray) -> list[bytes]:
    """Varint-encode a FLAT uint64 array and split the output at the given
    element offsets (seg_offsets: len k+1, row i = values[o[i]:o[i+1]]).

    One vectorized pass over the whole batch instead of one 30-op numpy
    pipeline per row — this is what keeps the posting-block encoder's
    per-row Python overhead at ~0 for Arrow batches of thousands of
    blocks."""
    if len(values) == 0:
        return [b""] * (len(seg_offsets) - 1)
    v = values.astype(np.uint64, copy=False)
    nbytes = np.ones(len(v), dtype=np.int64)
    for t in _THRESH:
        nbytes += (v >= np.uint64(t)).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(nbytes)))
    total = int(offsets[-1])
    # one flat pass over the OUTPUT bytes: for output byte k belonging to
    # value i, emit (v[i] >> 7*(k - start_i)) & 0x7F with the continuation
    # bit while more bytes follow — elementwise shifts instead of
    # 10 masked rounds
    val_idx = np.repeat(np.arange(len(v), dtype=np.int64), nbytes)
    byte_pos = np.arange(total, dtype=np.int64) - offsets[val_idx]
    chunk = (v[val_idx] >> (7 * byte_pos).astype(np.uint64)) & np.uint64(0x7F)
    cont = byte_pos < (nbytes[val_idx] - 1)
    out = (chunk | (cont.astype(np.uint64) << np.uint64(7))).astype(np.uint8)
    buf = out.tobytes()
    byte_bounds = offsets[seg_offsets]
    return [buf[int(a):int(b)] for a, b in zip(byte_bounds[:-1], byte_bounds[1:])]


def varint_decode(buf: bytes) -> np.ndarray:
    """Inverse of varint_encode — vectorized (<=10 shift rounds)."""
    if not buf:
        return np.zeros(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    ends = np.nonzero((b & 0x80) == 0)[0]
    starts = np.concatenate(([0], ends[:-1] + 1)).astype(np.int64)
    vals = np.zeros(len(ends), dtype=np.uint64)
    for j in range(10):
        pos = starts + j
        active = pos <= ends
        if not active.any():
            break
        vals[active] |= (b[pos[active]].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * j)
    return vals


def encode_doc_ids(doc_ids: np.ndarray) -> bytes:
    """Delta + varint for a sorted int64 doc_id array."""
    d = np.asarray(doc_ids, dtype=np.int64)
    deltas = np.empty_like(d)
    if len(d):
        deltas[0] = d[0]
        np.subtract(d[1:], d[:-1], out=deltas[1:])
    return varint_encode(deltas.astype(np.uint64))


def decode_doc_ids(buf: bytes) -> np.ndarray:
    deltas = varint_decode(buf).astype(np.int64)
    return np.cumsum(deltas, dtype=np.int64)


def encode_counts(counts: np.ndarray) -> bytes:
    return varint_encode(np.asarray(counts, dtype=np.int64).astype(np.uint64))


def decode_counts(buf: bytes) -> np.ndarray:
    return varint_decode(buf).astype(np.int64)


def decode_positions(buf: bytes, tfs: np.ndarray) -> np.ndarray:
    """Flat absolute token positions for one posting block.

    ``buf`` holds varint position GAPS laid out per posting in doc order:
    each doc's run opens with its absolute first position, followed by
    deltas to the next occurrences (positions are sorted within a doc, so
    gaps are non-negative).  ``tfs`` (the block's per-posting term
    frequencies) give the run lengths — tf IS the occurrence count, so
    the positional layout needs no extra length prefix.  Returns a flat
    int64 array of len sum(tfs); slice per doc with cumsum(tfs)."""
    tfs = np.asarray(tfs, dtype=np.int64)
    gaps = varint_decode(buf).astype(np.int64)
    if not len(gaps):
        return gaps
    cs = np.cumsum(gaps, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(tfs, dtype=np.int64)[:-1]))
    # cumulative sum BEFORE each doc-run start — subtracting it resets
    # the running sum so each run restarts at its absolute first position
    base = cs[starts] - gaps[starts]
    return cs - np.repeat(base, tfs)
