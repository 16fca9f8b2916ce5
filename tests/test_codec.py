"""Property-based roundtrip tests for the posting block codec — an
upgrade over the reference's test strategy (it has no property tests;
SURVEY §5)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_ingest_spark.index.codec import (
    BLOCK_SIZE,
    decode_block,
    encode_block,
)


@st.composite
def posting_block(draw):
    n = draw(st.integers(min_value=1, max_value=BLOCK_SIZE))
    start = draw(st.integers(min_value=0, max_value=2**40))
    gaps = draw(
        st.lists(st.integers(min_value=1, max_value=2**20), min_size=n, max_size=n)
    )
    doc_ids = np.cumsum(np.array(gaps, dtype=np.int64)) + start
    ints = st.lists(st.integers(min_value=1, max_value=2**16), min_size=n, max_size=n)
    tfs = np.array(draw(ints), dtype=np.int64)
    dls = np.array(draw(ints), dtype=np.int64)
    return doc_ids, tfs, dls


@settings(max_examples=200, deadline=None)
@given(posting_block())
def test_roundtrip_identity(block):
    doc_ids, tfs, dls = block
    first = int(doc_ids[0])
    blob = encode_block(doc_ids, tfs, dls, first)
    d2, t2, l2 = decode_block(blob, first, len(doc_ids))
    assert np.array_equal(d2, doc_ids)
    assert np.array_equal(t2, tfs.astype(np.int32))
    assert np.array_equal(l2, dls.astype(np.int32))


def test_single_posting():
    blob = encode_block(np.array([7]), np.array([3]), np.array([11]), 7)
    d, t, l = decode_block(blob, 7, 1)
    assert list(d) == [7] and list(t) == [3] and list(l) == [11]


def test_compression_beats_raw():
    # dense small deltas should compress far below 16 bytes/posting raw
    doc_ids = np.arange(1000, 1000 + BLOCK_SIZE, dtype=np.int64)
    tfs = np.ones(BLOCK_SIZE, dtype=np.int64)
    dls = np.full(BLOCK_SIZE, 40, dtype=np.int64)
    blob = encode_block(doc_ids, tfs, dls, int(doc_ids[0]))
    assert len(blob) < BLOCK_SIZE * 4  # ~3 bytes/posting here vs 16 raw


def test_block_decodes_independently():
    # first_doc_id baseline makes each block self-contained (block skipping)
    doc_ids = np.array([500, 600, 700], dtype=np.int64)
    tfs = np.array([1, 2, 3], dtype=np.int64)
    dls = np.array([10, 20, 30], dtype=np.int64)
    blob = encode_block(doc_ids, tfs, dls, 500)
    d, t, l = decode_block(blob, 500, 3)
    assert list(d) == [500, 600, 700] and list(l) == [10, 20, 30]


@settings(max_examples=50, deadline=None)
@given(st.lists(posting_block(), min_size=1, max_size=8))
def test_bulk_decode_identical_to_per_block(blocks):
    from search_ingest_spark.index.codec import decode_blocks_bulk

    datas, firsts, ns = [], [], []
    for doc_ids, tfs, dls in blocks:
        first = int(doc_ids[0]) - 1
        datas.append(encode_block(doc_ids, tfs, dls, first))
        firsts.append(first)
        ns.append(len(doc_ids))
    D, TF, DL, OFF = decode_blocks_bulk(
        datas, np.array(firsts), np.array(ns))
    for i, (data, first, n) in enumerate(zip(datas, firsts, ns)):
        d1, tf1, dl1 = decode_block(data, first, n)
        s, e = OFF[i], OFF[i + 1]
        assert np.array_equal(D[s:e], d1)
        assert np.array_equal(TF[s:e], tf1)
        assert np.array_equal(DL[s:e], dl1)


@settings(max_examples=50, deadline=None)
@given(st.lists(posting_block(), min_size=1, max_size=8))
def test_bulk_impact_decode_identical_to_per_block(blocks):
    from search_ingest_spark.index.codec import (
        decode_impact_block,
        decode_impact_blocks_bulk,
        encode_impact_blocks_bulk,
    )

    # flatten the drawn blocks into one run with per-block boundaries,
    # impacts clamped to one byte
    doc_arrays = []
    base = 0
    starts, ends = [], []
    for doc_ids, tfs, _dls in blocks:
        starts.append(base)
        base += len(doc_ids)
        ends.append(base)
        doc_arrays.append(doc_ids)
    # shift each block's doc ids so the flat run is strictly increasing
    shifted, offset = [], 0
    for d in doc_arrays:
        shifted.append(d + offset)
        offset = int(shifted[-1][-1]) + 1
    flat_docs = np.concatenate(shifted).astype(np.uint64)
    impacts = (np.concatenate([tfs for _, tfs, _ in blocks]) % 220
               ).astype(np.uint8)
    blobs = encode_impact_blocks_bulk(
        flat_docs, impacts, np.array(starts), np.array(ends))
    firsts = np.array([int(flat_docs[s]) for s in starts])
    ns = np.array([e - s for s, e in zip(starts, ends)])
    D, Q, OFF = decode_impact_blocks_bulk(blobs, firsts, ns)
    for i, (blob, first, n) in enumerate(zip(blobs, firsts, ns)):
        d1, q1 = decode_impact_block(blob, int(first), int(n))
        s, e = OFF[i], OFF[i + 1]
        assert np.array_equal(D[s:e], d1)
        assert np.array_equal(Q[s:e], q1)
