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
