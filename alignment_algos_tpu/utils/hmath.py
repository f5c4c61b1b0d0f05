"""Math helpers mirroring hmath.h semantics (dot products, z-normalization,
Pearson correlation) as vectorized numpy, float32 throughout."""

from __future__ import annotations

import numpy as np


def norm_elements_vec(v: np.ndarray) -> np.ndarray:
    """Z-normalize a vector (hmath.h norm_elements): (v - mean) / std with
    var = E[v^2] - E[v]^2."""
    v = v.astype(np.float32)
    n = np.float32(v.size)
    avg = np.float32(v.sum(dtype=np.float32) / n)
    sumsq = np.float32((v * v).sum(dtype=np.float32))
    var = np.float32(sumsq / n - avg * avg)
    std = np.sqrt(var)
    return ((v - avg) / std).astype(np.float32)


def norm_elements_region(m: np.ndarray, i0: int, i1: int, j0: int, j1: int) -> np.ndarray:
    """Z-normalize the [i0:i1, j0:j1) region of a matrix in place-like fashion
    (hmath.h norm_elements(matrix) overload). Returns a new array."""
    if i0 >= i1 or j0 >= j1:
        i0, j0, i1, j1 = 0, 0, m.shape[0], m.shape[1]
    out = m.astype(np.float32).copy()
    region = out[i0:i1, j0:j1]
    out[i0:i1, j0:j1] = norm_elements_vec(region.ravel()).reshape(region.shape)
    return out


def shift_elements_region(m: np.ndarray, i0: int, i1: int, j0: int, j1: int,
                          shift: float) -> np.ndarray:
    """Add ``shift`` to the region (hmath.h shift_elements)."""
    if i0 >= i1 or j0 >= j1:
        i0, j0, i1, j1 = 0, 0, m.shape[0], m.shape[1]
    out = m.astype(np.float32).copy()
    out[i0:i1, j0:j1] = out[i0:i1, j0:j1] + np.float32(shift)
    return out


def pearson_rows(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pearson correlation between every row of ``a`` (N,K) and every row of
    ``b`` (M,K) -> (N,M), mirroring hmath.h pearson_corr which z-normalizes
    each K-vector then takes dot/K."""
    a = a.astype(np.float32)
    b = b.astype(np.float32)
    k = a.shape[1]

    def znorm(rows):
        avg = rows.mean(axis=1, keepdims=True, dtype=np.float32)
        sumsq = (rows * rows).sum(axis=1, keepdims=True, dtype=np.float32)
        var = sumsq / np.float32(k) - avg * avg
        std = np.sqrt(var)
        with np.errstate(divide="ignore", invalid="ignore"):
            return (rows - avg) / std

    za = znorm(a)
    zb = znorm(b)
    return (za @ zb.T / np.float32(k)).astype(np.float32)
