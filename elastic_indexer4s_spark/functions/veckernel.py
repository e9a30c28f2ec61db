"""Vectorized NumPy kernels for embedding scoring with *bit-exact* fp parity.

The ANN operators (similarity.py) are hash-verified against a DuckDB oracle.
Round 2 kept Spark and the oracle bit-identical by inlining the dot-product
chains as constant-folded SQL expressions — which blew past Janino's 64 KB
codegen limit at 8 centroids x 64 dims (the stage silently fell back to
interpreted evaluation) and grows O(K*dim) in plan size: unusable at
production centroid counts.

These kernels replace the expression chains with NumPy loops that accumulate
in the SAME left-associative order the SQL chains use:

    0.0 + x[0]*c[0] + x[1]*c[1] + ... + x[dim-1]*c[dim-1]

IEEE-754 double add/mul/sqrt are deterministic and identical across the JVM,
DuckDB and NumPy, so accumulating dimension-by-dimension (one vectorized
``acc += X[:, d] * C[:, d]`` per dim, NOT a BLAS matmul whose pairwise/FMA
summation order differs) reproduces the SQL chain bit-for-bit while keeping
the Spark plan size CONSTANT in K and dim.

Cost: ``dim`` vectorized ops per batch instead of one GEMM — still ~100x
faster than interpreted expression eval, and the plan never grows.  Callers
that do not need cross-engine bit-parity can flip ``exact_order=False`` to
get the single BLAS GEMM.
"""

from __future__ import annotations

import numpy as np


def stack_arrays(series, dim: int | None = None) -> np.ndarray:
    """pd.Series of array<float|double> -> (n, dim) float64 matrix.

    float32 -> float64 widening is exact, mirroring the SQL ``CAST(x AS
    DOUBLE)`` on every element.
    """
    if len(series) == 0:
        return np.empty((0, dim or 0), dtype=np.float64)
    return np.vstack(series.to_numpy()).astype(np.float64, copy=False)


def leftassoc_gemm(X: np.ndarray, C: np.ndarray,
                   exact_order: bool = True) -> np.ndarray:
    """(n, dim) x (K, dim) -> (n, K) score matrix.

    exact_order=True accumulates d=0..dim-1 left-assoc (bit-parity with the
    SQL chain); False uses one BLAS matmul (faster, different fp rounding).
    """
    if not exact_order:
        return X @ C.T
    acc = np.zeros((X.shape[0], C.shape[0]), dtype=np.float64)
    for d in range(X.shape[1]):
        acc += X[:, d, None] * C[None, :, d]
    return acc


def leftassoc_rowdot(A: np.ndarray, B: np.ndarray,
                     exact_order: bool = True) -> np.ndarray:
    """Row-wise dot of two (n, dim) matrices, left-assoc accumulation."""
    if not exact_order:
        return np.einsum("ij,ij->i", A, B)
    acc = np.zeros(A.shape[0], dtype=np.float64)
    for d in range(A.shape[1]):
        acc += A[:, d] * B[:, d]
    return acc


def cosine_rows(A: np.ndarray, B: np.ndarray,
                exact_order: bool = True) -> np.ndarray:
    """Row-wise cosine = dot / (sqrt(|a|^2) * sqrt(|b|^2)); zero norm -> NaN
    (the SQL twin's ``nullif(.., 0.0)`` null).  Each of dot / |a|^2 / |b|^2
    is a left-assoc sum; the final expression order matches
    ``dot / (sqrt(na) * sqrt(nb))`` exactly."""
    dot = leftassoc_rowdot(A, B, exact_order)
    na = leftassoc_rowdot(A, A, exact_order)
    nb = leftassoc_rowdot(B, B, exact_order)
    denom = np.sqrt(na) * np.sqrt(nb)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = dot / denom
    out[denom == 0.0] = np.nan
    return out


def topk_rows(scores: np.ndarray, ids: np.ndarray, k: int):
    """Indices of the top-k rows by (score DESC, id ASC), exact comparisons
    on the float64 scores — same order as ``ORDER BY s DESC, id`` (NaN
    sorts last, matching SQL NULLS LAST)."""
    order = np.lexsort((ids, -scores))
    return order[:k]
