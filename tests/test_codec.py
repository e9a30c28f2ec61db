"""Varint/delta/block codec round-trips (SURVEY §5.2 item 2)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from elastic_indexer4s_spark.functions.codec import (
    concat_postings, decode_block, decode_postings, encode_postings,
    varint_decode, varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    a = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(a)), a)


@given(
    st.sets(st.integers(min_value=0, max_value=10**9), max_size=500),
    st.integers(min_value=1, max_value=200),
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(doc_set, block_size):
    docs = np.array(sorted(doc_set), dtype=np.int64)
    n = len(docs)
    tfs = (docs % 17 + 1).astype(np.int64)
    dls = (docs % 311 + 1).astype(np.int64)
    enc = encode_postings(docs, tfs, dls, block_size)
    d, t, l = decode_postings(enc)
    assert np.array_equal(d, docs)
    assert np.array_equal(t, tfs)
    assert np.array_equal(l, dls)
    assert enc.df == n
    # per-block decode stitches back to the same list
    if n:
        parts = [decode_block(enc, i) for i in range(len(enc.block_count))]
        assert np.array_equal(np.concatenate([p[0] for p in parts]), docs)
        # sidecar invariants
        starts = np.cumsum(np.concatenate(([0], enc.block_count[:-1]))).astype(int)
        assert np.array_equal(enc.block_maxtf,
                              np.maximum.reduceat(tfs, starts))
        assert np.array_equal(enc.block_min_dl,
                              np.minimum.reduceat(dls, starts))


def test_concat_equals_whole():
    docs = np.unique(np.random.default_rng(7).integers(0, 10**6, 4000)).astype(np.int64)
    tfs = (docs % 9 + 1).astype(np.int64)
    dls = (docs % 100 + 5).astype(np.int64)
    cuts = [0, 1000, 1003, 2500, len(docs)]
    parts = [encode_postings(docs[a:b], tfs[a:b], dls[a:b], 128)
             for a, b in zip(cuts, cuts[1:])]
    merged = concat_postings(parts)
    d, t, l = decode_postings(merged)
    assert np.array_equal(d, docs)
    assert np.array_equal(t, tfs)
    assert np.array_equal(l, dls)
    assert merged.df == len(docs)


def test_dense_ids_compress_to_about_one_byte():
    docs = np.arange(100_000, dtype=np.int64)
    enc = encode_postings(docs, np.ones(100_000, np.int64),
                          np.full(100_000, 50, np.int64), 128)
    assert len(enc.doc_blob) / len(docs) < 1.1
