"""Posting-list block codec: delta + varint (PForDelta-style blocks).

Each block holds up to BLOCK_SIZE postings of one term within one doc
shard: doc-id deltas (first delta is vs `first_doc_id`, so every block
decodes independently — enabling block skipping) followed by tf values,
all varint-encoded.  Block metadata (first/last doc id, max tf, max
WAND upper bound) lives in the postings table columns, not the blob, so
the query planner can skip blocks without touching bytes.

Vectorized: encode/decode are NumPy bit-twiddling over whole arrays —
no per-posting Python in the hot path.  The reference delegates all of
this to Elasticsearch/Lucene (north rule obliges a native build).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def _varint_encode(values: np.ndarray) -> bytes:
    """LEB128 varint encode a uint64 array, vectorized.

    Builds all bytes column-wise: byte k of each value exists iff the
    value needs > 7*k bits; continuation bit set iff a later byte exists.
    """
    if len(values) == 0:
        return b""
    v = values.astype(np.uint64, copy=True)
    if len(v) and int(v.max()) >= (1 << 63):
        raise ValueError("varint payload out of range")
    # number of 7-bit groups per value (at least 1)
    nbytes = np.maximum((64 - np.uint64(0) - _clz64(v) + 6) // 7, 1).astype(np.int64)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    # offsets of each value's first byte
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    max_b = int(nbytes.max())
    for k in range(max_b):
        mask = nbytes > k
        chunk = ((v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[starts[mask] + k] = chunk | cont
    return out.tobytes()


def _clz64(v: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64 array (for bit-length)."""
    bits = np.zeros(len(v), dtype=np.uint64)
    x = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        mask = x >> s != 0
        bits[mask] += np.uint64(shift)
        x[mask] >>= s
    # bits = floor(log2(v)) for v>0; bit length = bits+1; v==0 → length 1
    return np.where(v == 0, np.uint64(63), np.uint64(63) - bits)


def _varint_decode(buf: bytes, count: int) -> np.ndarray:
    """Decode `count` varints from buf; vectorized via byte-plane masks."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    is_last = (raw & 0x80) == 0
    ends = np.flatnonzero(is_last)[:count]
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    out = np.zeros(count, dtype=np.uint64)
    max_b = int(lengths.max())
    for k in range(max_b):
        mask = lengths > k
        out[mask] |= (raw[starts[mask] + k] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * k)
    return out


def encode_block(doc_ids: np.ndarray, tfs: np.ndarray, first_doc_id: int) -> bytes:
    """Encode one block: varint(deltas) ++ varint(tfs).

    `doc_ids` must be strictly increasing; the first delta is relative to
    `first_doc_id` (== doc_ids[0], so it encodes as 0 — kept for
    self-describing blocks)."""
    d = np.asarray(doc_ids, dtype=np.uint64)
    deltas = np.empty_like(d)
    deltas[0] = d[0] - np.uint64(first_doc_id)
    deltas[1:] = d[1:] - d[:-1]
    payload_docs = _varint_encode(deltas)
    payload_tfs = _varint_encode(np.asarray(tfs, dtype=np.uint64))
    header = len(payload_docs).to_bytes(4, "little")
    return header + payload_docs + payload_tfs


def decode_block(data: bytes, first_doc_id: int, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode one block → (doc_ids int64[n], tfs int32[n])."""
    doc_len = int.from_bytes(data[:4], "little")
    deltas = _varint_decode(data[4 : 4 + doc_len], n)
    tfs = _varint_decode(data[4 + doc_len :], n)
    doc_ids = np.cumsum(deltas, dtype=np.uint64) + np.uint64(first_doc_id)
    return doc_ids.astype(np.int64), tfs.astype(np.int32)
