"""Property test: the vectorized block-max WAND scorer is exactly the
exhaustive scorer on arbitrary posting lists.

Pure scorer-level fuzz (no Spark): random multi-term posting lists with
deliberately TIE-HEAVY tf/dl domains (ties at the k-boundary are where a
pruning scorer's tie-break can silently diverge), random block sizes so
frontier rounds cross block boundaries in every shape, and both OR/AND
modes.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from elastic_indexer4s_spark.functions.codec import encode_postings
from elastic_indexer4s_spark.operators.query import (
    _idf,
    _shard_exhaustive,
    _shard_wand,
)


@st.composite
def shard_postings(draw):
    n_terms = draw(st.integers(1, 4))
    n_docs = draw(st.integers(1, 60))
    # doc lengths from a tiny domain -> many exact score ties
    dls = draw(st.lists(st.integers(1, 3), min_size=n_docs,
                        max_size=n_docs))
    encs = []
    for t in range(n_terms):
        mask = draw(st.lists(st.booleans(), min_size=n_docs,
                             max_size=n_docs))
        doc_ids = np.nonzero(mask)[0].astype(np.int64)
        if doc_ids.size == 0:
            continue
        tfs = np.array(
            draw(st.lists(st.integers(1, 2), min_size=len(doc_ids),
                          max_size=len(doc_ids))), dtype=np.int64)
        dl_arr = np.array([dls[d] for d in doc_ids], dtype=np.int64)
        block = draw(st.integers(1, 8))
        encs.append((f"t{t}", encode_postings(doc_ids, tfs, dl_arr, block)))
    return encs, n_docs


@settings(max_examples=200, deadline=None)
@given(shard_postings(), st.integers(1, 12), st.booleans())
def test_wand_equals_exhaustive(sp, k, conjunctive):
    encs, n_docs = sp
    if not encs:
        return
    # per-term df from the encoded lists themselves
    idfs = {t: _idf(n_docs, e.df) for t, e in encs}
    require_all = len(encs) if conjunctive else 0
    args = (idfs, 1.2, 0.75, 2.0, k, require_all)
    wand = _shard_wand(list(encs), *args)
    ex = _shard_exhaustive(list(encs), *args)
    assert list(wand["doc_id"]) == list(ex["doc_id"])
    assert np.allclose(wand["score"], ex["score"], rtol=0, atol=0), \
        "scores must be BIT-identical (same fp accumulation order)"
