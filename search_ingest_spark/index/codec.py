"""Posting-list block codec: delta + varint (PForDelta-style blocks).

Each block holds up to BLOCK_SIZE postings of one term within one doc
shard, three varint sections: doc-id deltas (first delta vs
`first_doc_id`, so every block decodes independently — enabling block
skipping), term frequencies, and document lengths.

Carrying dl inside the block is a deliberate scale decision: BM25's
tf-norm needs dl per posting, and shipping it with the posting makes
the query-side scorer a pure function of the (term-pruned) postings
scan — no join against a 10^12-row doc_lens table per query.  Cost is
~1 varint/posting; doc_lens remains as a separate stats table.

Block metadata (first/last doc id, max tf, max WAND upper bound) lives
in postings-table columns, not the blob, so block skipping never
touches bytes.  Encode/decode are NumPy-vectorized — no per-posting
Python.  The reference delegates all of this to Elasticsearch/Lucene
(north rule obliges a native build).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def _clz64(v: np.ndarray) -> np.ndarray:
    """Count leading zeros of a uint64 array (for bit length)."""
    bits = np.zeros(len(v), dtype=np.uint64)
    x = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        mask = x >> s != 0
        bits[mask] += np.uint64(shift)
        x[mask] >>= s
    return np.where(v == 0, np.uint64(63), np.uint64(63) - bits)


def _varint_encode(values: np.ndarray) -> bytes:
    """LEB128 varint encode a uint64 array, vectorized by byte plane."""
    if len(values) == 0:
        return b""
    v = values.astype(np.uint64, copy=True)
    if int(v.max()) >= (1 << 63):
        raise ValueError("varint payload out of range")
    nbytes = np.maximum((np.uint64(64) - _clz64(v) + np.uint64(6)) // np.uint64(7),
                        np.uint64(1)).astype(np.int64)
    out = np.empty(int(nbytes.sum()), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    for k in range(int(nbytes.max())):
        mask = nbytes > k
        chunk = ((v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[starts[mask] + k] = chunk | cont
    return out.tobytes()


def _varint_decode(buf: bytes, count: int) -> np.ndarray:
    """Decode `count` varints from buf, vectorized by byte plane."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    ends = np.flatnonzero((raw & 0x80) == 0)[:count]
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    out = np.zeros(count, dtype=np.uint64)
    for k in range(int(lengths.max())):
        mask = lengths > k
        out[mask] |= (raw[starts[mask] + k] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * k)
    return out


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """Byte length each value takes under LEB128 (vectorized)."""
    v = values.astype(np.uint64, copy=False)
    return np.maximum((np.uint64(64) - _clz64(v) + np.uint64(6)) // np.uint64(7),
                      np.uint64(1)).astype(np.int64)


def encode_blocks_bulk(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_starts: np.ndarray,
    block_ends: np.ndarray,
) -> list[bytes]:
    """Encode MANY blocks in one vectorized pass.

    `block_starts/ends` delimit blocks inside the flat arrays; each
    block's first delta is 0 by construction (first_doc_id column ==
    doc_ids[start]).  The three varint streams are encoded over the
    whole batch at once; per-block blobs are cheap byte slices — this
    removes the per-block Python cost that dominates when posting runs
    are short (small corpora / rare terms).
    """
    d = doc_ids.astype(np.uint64, copy=False)
    deltas = np.empty_like(d)
    deltas[1:] = d[1:] - d[:-1]
    deltas[block_starts] = 0
    streams = []
    offsets = []
    for arr in (deltas, tfs.astype(np.uint64, copy=False), dls.astype(np.uint64, copy=False)):
        payload = _varint_encode(arr)
        lens = varint_lengths(arr)
        off = np.zeros(len(arr) + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        streams.append(payload)
        offsets.append(off)
    blobs: list[bytes] = []
    sd, st_, sl = streams
    od, ot, ol = offsets
    for s, e in zip(block_starts, block_ends):
        p_docs = sd[od[s] : od[e]]
        p_tfs = st_[ot[s] : ot[e]]
        p_dls = sl[ol[s] : ol[e]]
        blobs.append(
            len(p_docs).to_bytes(4, "little")
            + len(p_tfs).to_bytes(4, "little")
            + p_docs + p_tfs + p_dls
        )
    return blobs


def encode_block(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, first_doc_id: int
) -> bytes:
    """Encode one block: header(doc_len,tf_len) ++ varint(deltas) ++
    varint(tfs) ++ varint(dls).  `doc_ids` must be strictly increasing."""
    d = np.asarray(doc_ids, dtype=np.uint64)
    deltas = np.empty_like(d)
    deltas[0] = d[0] - np.uint64(first_doc_id)
    deltas[1:] = d[1:] - d[:-1]
    p_docs = _varint_encode(deltas)
    p_tfs = _varint_encode(np.asarray(tfs, dtype=np.uint64))
    p_dls = _varint_encode(np.asarray(dls, dtype=np.uint64))
    header = len(p_docs).to_bytes(4, "little") + len(p_tfs).to_bytes(4, "little")
    return header + p_docs + p_tfs + p_dls


def decode_block(
    data: bytes, first_doc_id: int, n: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one block → (doc_ids int64[n], tfs int32[n], dls int32[n])."""
    doc_len = int.from_bytes(data[:4], "little")
    tf_len = int.from_bytes(data[4:8], "little")
    off = 8
    deltas = _varint_decode(data[off : off + doc_len], n)
    tfs = _varint_decode(data[off + doc_len : off + doc_len + tf_len], n)
    dls = _varint_decode(data[off + doc_len + tf_len :], n)
    doc_ids = np.cumsum(deltas, dtype=np.uint64) + np.uint64(first_doc_id)
    return doc_ids.astype(np.int64), tfs.astype(np.int32), dls.astype(np.int32)


def decode_blocks_bulk(
    datas, first_doc_ids: np.ndarray, ns: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode MANY blocks in one vectorized pass →
    (doc_ids int64, tfs int32, dls int32, offsets int64[len+1]);
    block i's postings live at [offsets[i], offsets[i+1]).

    Per-block decode costs ~40 µs in numpy-call overhead alone (three
    byte-plane decodes of ≤128 ints each); a hot query touching
    thousands of blocks pays seconds for microseconds of work.  Here
    the three varint streams of ALL blocks are spliced into three
    contiguous buffers (pure byte slices) and each is decoded in ONE
    byte-plane pass; doc ids come from a segmented cumsum.  Produces
    byte-identical arrays to per-block decode_block calls."""
    n_blocks = len(datas)
    if n_blocks == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.astype(np.int32), z.astype(np.int32), np.zeros(1, np.int64)
    ns = np.asarray(ns, dtype=np.int64)
    firsts = np.asarray(first_doc_ids, dtype=np.uint64)
    doc_parts: list = [None] * n_blocks
    tf_parts: list = [None] * n_blocks
    dl_parts: list = [None] * n_blocks
    for i, data in enumerate(datas):
        doc_len = int.from_bytes(data[:4], "little")
        tf_len = int.from_bytes(data[4:8], "little")
        doc_parts[i] = data[8 : 8 + doc_len]
        tf_parts[i] = data[8 + doc_len : 8 + doc_len + tf_len]
        dl_parts[i] = data[8 + doc_len + tf_len :]
    total = int(ns.sum())
    deltas = _varint_decode(b"".join(doc_parts), total)
    tfs = _varint_decode(b"".join(tf_parts), total)
    dls = _varint_decode(b"".join(dl_parts), total)
    offsets = np.zeros(n_blocks + 1, dtype=np.int64)
    np.cumsum(ns, out=offsets[1:])
    # segmented cumsum: global cumsum minus the running total at each
    # block start, plus the block's own first delta and first_doc_id —
    # identical (mod 2^64) to per-block cumsum(deltas) + first_doc_id
    cum = np.cumsum(deltas, dtype=np.uint64)
    starts = offsets[:-1]
    adj = firsts + deltas[starts] - cum[starts]
    doc_ids = cum + np.repeat(adj, ns)
    return (doc_ids.astype(np.int64), tfs.astype(np.int32),
            dls.astype(np.int32), offsets)


# ---------------------------------------------------------------------------
# impact-quantized blocks (scoring="quantized")
#
# Lucene-style impact postings: instead of (tf, dl) pairs the block
# stores ONE byte per posting — the tf-norm quantized at build time
# (q = floor(tf_norm * 100), tf_norm < k1+1 = 2.2 so q ≤ 220).  The
# query-side contribution is idf * (q + 0.5) / 100: dl never ships, the
# blob is (varint deltas + n raw bytes), and the per-block max impact
# gives an EXACT per-term upper bound (vs the (max_tf, min_dl) proxy on
# the exact path) — so block-max pruning skips strictly more data.
# Trade: avgdl is baked into q at build time (like Lucene norms) and
# scores are ~1% quantization-noisy — hence a separate, opt-in mode
# with its own oracle that models the same quantization.
# ---------------------------------------------------------------------------

IMPACT_SCALE = 100.0


def encode_impact_blocks_bulk(
    doc_ids: np.ndarray,
    impacts: np.ndarray,
    block_starts: np.ndarray,
    block_ends: np.ndarray,
) -> list[bytes]:
    """Encode many impact blocks in one vectorized pass: per block,
    header(doc_len) ++ varint(deltas) ++ raw uint8 impacts."""
    d = doc_ids.astype(np.uint64, copy=False)
    deltas = np.empty_like(d)
    deltas[1:] = d[1:] - d[:-1]
    deltas[block_starts] = 0
    payload = _varint_encode(deltas)
    lens = varint_lengths(deltas)
    off = np.zeros(len(deltas) + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    imp = impacts.astype(np.uint8, copy=False).tobytes()
    blobs: list[bytes] = []
    for s, e in zip(block_starts, block_ends):
        p_docs = payload[off[s] : off[e]]
        blobs.append(
            len(p_docs).to_bytes(4, "little") + p_docs + imp[s:e]
        )
    return blobs


def decode_impact_block(
    data: bytes, first_doc_id: int, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Decode one impact block → (doc_ids int64[n], impacts int32[n])."""
    doc_len = int.from_bytes(data[:4], "little")
    deltas = _varint_decode(data[4 : 4 + doc_len], n)
    doc_ids = np.cumsum(deltas, dtype=np.uint64) + np.uint64(first_doc_id)
    impacts = np.frombuffer(data, dtype=np.uint8, count=n, offset=4 + doc_len)
    return doc_ids.astype(np.int64), impacts.astype(np.int32)


def decode_impact_blocks_bulk(
    datas, first_doc_ids: np.ndarray, ns: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode MANY impact blocks in one vectorized pass →
    (doc_ids int64, impacts int32, offsets int64[len+1]); same
    construction (and byte-identity guarantee vs per-block calls) as
    decode_blocks_bulk."""
    n_blocks = len(datas)
    if n_blocks == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.astype(np.int32), np.zeros(1, np.int64)
    ns = np.asarray(ns, dtype=np.int64)
    firsts = np.asarray(first_doc_ids, dtype=np.uint64)
    doc_parts: list = [None] * n_blocks
    imp_parts: list = [None] * n_blocks
    for i, data in enumerate(datas):
        doc_len = int.from_bytes(data[:4], "little")
        doc_parts[i] = data[4 : 4 + doc_len]
        imp_parts[i] = data[4 + doc_len :]
    total = int(ns.sum())
    deltas = _varint_decode(b"".join(doc_parts), total)
    impacts = np.frombuffer(b"".join(imp_parts), dtype=np.uint8, count=total)
    offsets = np.zeros(n_blocks + 1, dtype=np.int64)
    np.cumsum(ns, out=offsets[1:])
    cum = np.cumsum(deltas, dtype=np.uint64)
    starts = offsets[:-1]
    adj = firsts + deltas[starts] - cum[starts]
    doc_ids = cum + np.repeat(adj, ns)
    return doc_ids.astype(np.int64), impacts.astype(np.int32), offsets
