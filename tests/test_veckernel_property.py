"""Property fuzz for the NumPy scoring kernels: every kernel must reproduce
a pure-Python left-associative reference BIT-exactly — that identity is what
lets the ANN operators hash-verify against the DuckDB oracle's expression
chains while keeping constant plan size (no Spark needed here; the Spark
paths are pinned by the expr-twin tests and contract rows)."""

import math

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from elastic_indexer4s_spark.functions import veckernel as vk

finite = st.floats(min_value=-1e3, max_value=1e3, allow_nan=False,
                   allow_subnormal=False, width=32)


def _py_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


@settings(max_examples=150, deadline=None)
@given(st.integers(1, 6), st.integers(1, 5), st.integers(1, 7),
       st.data())
def test_gemm_and_rowdot_bit_exact(n, k, dim, data):
    X = np.array(data.draw(st.lists(st.lists(finite, min_size=dim,
                                             max_size=dim),
                                    min_size=n, max_size=n)),
                 dtype=np.float64)
    C = np.array(data.draw(st.lists(st.lists(finite, min_size=dim,
                                             max_size=dim),
                                    min_size=k, max_size=k)),
                 dtype=np.float64)
    G = vk.leftassoc_gemm(X, C)
    for i in range(n):
        for j in range(k):
            assert G[i, j] == _py_dot(X[i], C[j])
    R = vk.leftassoc_rowdot(X, X)
    for i in range(n):
        assert R[i] == _py_dot(X[i], X[i])


@settings(max_examples=150, deadline=None)
@given(st.integers(1, 6), st.integers(1, 7), st.data())
def test_cosine_rows_bit_exact(n, dim, data):
    rows = st.lists(st.lists(finite, min_size=dim, max_size=dim),
                    min_size=n, max_size=n)
    A = np.array(data.draw(rows), dtype=np.float64)
    B = np.array(data.draw(rows), dtype=np.float64)
    got = vk.cosine_rows(A, B)
    for i in range(n):
        na, nb = _py_dot(A[i], A[i]), _py_dot(B[i], B[i])
        denom = math.sqrt(na) * math.sqrt(nb)
        if denom == 0.0:
            assert np.isnan(got[i])
        else:
            assert got[i] == _py_dot(A[i], B[i]) / denom


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(
    st.floats(min_value=-10, max_value=10, allow_nan=False),
    st.integers(0, 50)), min_size=1, max_size=30),
    st.integers(1, 8))
def test_topk_rows_matches_sorted_selection(pairs, k):
    scores = np.array([p[0] for p in pairs], dtype=np.float64)
    ids = np.array([p[1] for p in pairs], dtype=np.int64)
    keep = vk.topk_rows(scores, ids, k)
    got = [(scores[i], ids[i]) for i in keep]
    exp = sorted(zip(scores, ids), key=lambda t: (-t[0], t[1]))[:k]
    assert got == exp


def test_stack_arrays_widens_float32_exactly():
    s = pd.Series([np.array([0.1, 0.2], dtype=np.float32),
                   np.array([1.5, -2.25], dtype=np.float32)])
    X = vk.stack_arrays(s)
    assert X.dtype == np.float64
    assert X[0, 0] == float(np.float32(0.1))       # exact widening
    assert X[1, 1] == -2.25
    assert vk.stack_arrays(pd.Series([], dtype=object), 4).shape == (0, 4)
