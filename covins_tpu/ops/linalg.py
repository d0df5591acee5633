"""TPU-safe small linear algebra.

XLA:TPU implements LU/SVD/Cholesky custom-calls only for f32 (the solver
state here is f64, matching the reference's double precision,
`typedefs_base.hpp:129`).  The solvers' decompositions are all SMALL and
batched — 3x3 landmark blocks, 6x6 pose blocks, 15x15 keyframe-state
blocks — so we unroll them in pure jnp primitives (elementwise + matmul),
which XLA compiles for any dtype on any backend and fuses into the
surrounding graph.  The only large decompositions (the 8pt/17pt nullspace
SVDs) go through `svd_cast`, which drops to f32 *just for the SVD* on
TPU — RANSAC model fitting tolerates f32 (pixel-scale thresholds), and
everything before/after stays f64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inv33(A):
    """Closed-form batched 3x3 inverse (adjugate / determinant)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A00 = e * i - f * h
    A01 = c * h - b * i
    A02 = b * f - c * e
    A10 = f * g - d * i
    A11 = a * i - c * g
    A12 = c * d - a * f
    A20 = d * h - e * g
    A21 = b * g - a * h
    A22 = a * e - b * d
    det = a * A00 + b * A10 + c * A20
    det = jnp.where(jnp.abs(det) < 1e-300, 1e-300, det)
    adj = jnp.stack([
        jnp.stack([A00, A01, A02], -1),
        jnp.stack([A10, A11, A12], -1),
        jnp.stack([A20, A21, A22], -1),
    ], -2)
    return adj / det[..., None, None]


def cholesky_small(A, eps: float = 1e-18):
    """Unrolled Cholesky (lower) for small trailing dims, any dtype."""
    n = A.shape[-1]
    L = jnp.zeros_like(A)
    for j in range(n):
        s = A[..., j, j] - jnp.sum(L[..., j, :j] ** 2, axis=-1)
        ljj = jnp.sqrt(jnp.maximum(s, eps))
        L = L.at[..., j, j].set(ljj)
        if j + 1 < n:
            s2 = A[..., j + 1:, j] - jnp.einsum(
                "...ik,...k->...i", L[..., j + 1:, :j], L[..., j, :j]
            )
            L = L.at[..., j + 1:, j].set(s2 / ljj[..., None])
    return L


def _solve_tril(L, b):
    """L y = b, L lower-triangular, unrolled."""
    n = L.shape[-1]
    ys = []
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[..., i, k] * ys[k]
        ys.append(s / L[..., i, i])
    return jnp.stack(ys, axis=-1)


def _solve_triu_t(L, y):
    """L^T x = y, unrolled."""
    n = L.shape[-1]
    xs: list = [None] * n
    for i in reversed(range(n)):
        s = y[..., i]
        for k in range(i + 1, n):
            s = s - L[..., k, i] * xs[k]
        xs[i] = s / L[..., i, i]
    return jnp.stack(xs, axis=-1)


def solve_psd_small(A, b):
    """Solve A x = b for small symmetric positive-(semi)definite A."""
    L = cholesky_small(A)
    return _solve_triu_t(L, _solve_tril(L, b))


def inv_psd_small(A):
    """Inverse of small batched SPD matrices via unrolled Cholesky."""
    n = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    cols = [solve_psd_small(A, eye[..., i]) for i in range(n)]
    return jnp.stack(cols, axis=-1)


def svd_cast(A, full_matrices=True):
    """SVD that works for f64 on TPU: decompose in f32 there (RANSAC
    model fitting is threshold-driven; f32 singular vectors are ample),
    native dtype elsewhere.  Returns (U, S, Vt) in A's dtype."""
    if A.dtype == jnp.float64 and jax.default_backend() == "tpu":
        U, S, Vt = jnp.linalg.svd(A.astype(jnp.float32),
                                  full_matrices=full_matrices)
        return U.astype(A.dtype), S.astype(A.dtype), Vt.astype(A.dtype)
    return jnp.linalg.svd(A, full_matrices=full_matrices)


def det33(A):
    """Closed-form batched 3x3 determinant (no LU custom call)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
