"""TPU-safe small linear algebra — NO LAPACK-style custom calls at all.

The TPU backend in this deployment does not execute XLA's SVD/Eig custom
calls (they hang at runtime, r04 finding; and LU/SVD/Cholesky custom calls
only exist for f32 while the solver state is f64, matching the reference's
double precision, `typedefs_base.hpp:129`).  Every decomposition here is
therefore built from pure jnp primitives (elementwise + matmul) that XLA
compiles for any dtype on any backend and fuses into the surrounding graph:

* small SPD systems (3x3 landmark blocks, 6x6 pose blocks, 15x15 keyframe
  states): unrolled Cholesky;
* symmetric eigendecompositions (Horn 4x4 quaternion alignment, 3x3
  singular pieces): unrolled cyclic Jacobi — quadratically convergent,
  a handful of sweeps reaches machine precision;
* nullspace vectors for the 8pt/17pt linear solvers: shifted inverse
  iteration on A^T A via the unrolled Cholesky (the target eigenvalue is
  ~0, so convergence is one or two applications);
* 3x3 SVD (essential-matrix projection/decomposition, SO(3) projection):
  closed composition of the Jacobi eigensolver on A^T A with a
  cross-product-completed left basis.
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
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack([
        jnp.stack([A00, A01, A02], -1),
        jnp.stack([A10, A11, A12], -1),
        jnp.stack([A20, A21, A22], -1),
    ], -2)
    return adj / det[..., None, None]


# Above this trailing dim, decompositions run as masked lax.fori_loop
# bodies (O(1) HLO regardless of n) instead of fully unrolled Python
# loops: the unrolled 15x15/18x18 variants blow up the HLO under the TPU
# backend's f64 emulation and compile for tens of minutes (r04 finding).
_UNROLL_MAX = 8


def cholesky_small(A, eps: float = 1e-18):
    """Cholesky (lower) for small trailing dims, any dtype, batched.

    Unrolled for n <= _UNROLL_MAX (fastest runtime, fuses fully), masked
    fori_loop above (compact HLO, fast compile)."""
    n = A.shape[-1]
    if n <= _UNROLL_MAX:
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

    idx = jnp.arange(n)

    def body(j, L):
        # s_i = A[i, j] - sum_{k<j} L[i, k] L[j, k]   for i >= j
        mask_k = (idx < j).astype(A.dtype)                      # (n,)
        rowj = jnp.take_along_axis(
            L, jnp.broadcast_to(j, L.shape[:-2] + (1, 1)).astype(idx.dtype),
            axis=-2,
        )[..., 0, :] * mask_k                                    # (..., n)
        colj = jnp.take_along_axis(
            A, jnp.broadcast_to(j, A.shape[:-2] + (1, 1)).astype(idx.dtype),
            axis=-1,
        )[..., 0]                                                # (..., n)
        s = colj - jnp.einsum("...ik,...k->...i", L, rowj)
        sj = jnp.take_along_axis(
            s, jnp.broadcast_to(j, s.shape[:-1] + (1,)).astype(idx.dtype),
            axis=-1,
        )[..., 0]
        ljj = jnp.sqrt(jnp.maximum(sj, eps))
        col = jnp.where(idx >= j, s / ljj[..., None], 0.0)
        return _set_col(L, j, col)

    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(A))


def _set_col(M, j, col):
    """M[..., :, j] = col with traced j (dynamic-update-slice)."""
    return jax.lax.dynamic_update_slice_in_dim(
        M, col[..., None], j, axis=M.ndim - 1
    )


def _take1(v, i):
    """v[..., i] with traced i."""
    return jnp.take_along_axis(
        v, jnp.broadcast_to(i, v.shape[:-1] + (1,)).astype(jnp.int32), axis=-1
    )[..., 0]


def _solve_tril(L, b):
    """L y = b, L lower-triangular, batched."""
    n = L.shape[-1]
    if n <= _UNROLL_MAX:
        ys = []
        for i in range(n):
            s = b[..., i]
            for k in range(i):
                s = s - L[..., i, k] * ys[k]
            ys.append(s / L[..., i, i])
        return jnp.stack(ys, axis=-1)

    idx = jnp.arange(n)

    def body(i, y):
        rowi = jnp.take_along_axis(
            L, jnp.broadcast_to(i, L.shape[:-2] + (1, 1)).astype(jnp.int32),
            axis=-2,
        )[..., 0, :]                                             # (..., n)
        s = _take1(b, i) - jnp.sum(rowi * y * (idx < i), axis=-1)
        yi = s / _take1(rowi, i)
        return _set_elem(y, i, yi)

    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(b))


def _set_elem(v, i, val):
    return jax.lax.dynamic_update_slice_in_dim(
        v, val[..., None], i, axis=v.ndim - 1
    )


def _solve_triu_t(L, y):
    """L^T x = y, batched."""
    n = L.shape[-1]
    if n <= _UNROLL_MAX:
        xs: list = [None] * n
        for i in reversed(range(n)):
            s = y[..., i]
            for k in range(i + 1, n):
                s = s - L[..., k, i] * xs[k]
            xs[i] = s / L[..., i, i]
        return jnp.stack(xs, axis=-1)

    idx = jnp.arange(n)

    def body(t, x):
        i = n - 1 - t
        coli = jnp.take_along_axis(
            L, jnp.broadcast_to(i, L.shape[:-1] + (1,)).astype(jnp.int32),
            axis=-1,
        )[..., 0]                                                # (..., n) = L[:, i]
        s = _take1(y, i) - jnp.sum(coli * x * (idx > i), axis=-1)
        xi = s / _take1(coli, i)
        return _set_elem(x, i, xi)

    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(y))


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


def jacobi_eigh(A, sweeps: int = 8):
    """Batched symmetric eigendecomposition by unrolled cyclic Jacobi.

    A: (..., N, N) symmetric, N small & static.  Returns
    ``(eigvals (..., N) ascending, eigvecs (..., N, N) columns)``.
    Pure elementwise/matmul ops — lowers on any backend, any dtype.
    """
    n = A.shape[-1]
    V = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    for _ in range(sweeps):
        for p in range(n - 1):
            for q in range(p + 1, n):
                app = A[..., p, p]
                aqq = A[..., q, q]
                apq = A[..., p, q]
                # Division-free rotation angle: tan(2 phi) = 2 apq/(aqq-app).
                # atan2 is total, so no guard divisions that misbehave under
                # the TPU backend's f64 emulation (theta = diff/(2 apq) went
                # NaN there once off-diagonals converged to ~0).
                small = jnp.abs(apq) <= 1e-14 * (jnp.abs(app) + jnp.abs(aqq))
                phi = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
                c = jnp.where(small, 1.0, jnp.cos(phi))[..., None]
                s = jnp.where(small, 0.0, jnp.sin(phi))[..., None]
                # rows
                rp = c * A[..., p, :] - s * A[..., q, :]
                rq = s * A[..., p, :] + c * A[..., q, :]
                A = A.at[..., p, :].set(rp).at[..., q, :].set(rq)
                # columns
                cp = c * A[..., :, p] - s * A[..., :, q]
                cq = s * A[..., :, p] + c * A[..., :, q]
                A = A.at[..., :, p].set(cp).at[..., :, q].set(cq)
                # accumulate eigenvectors
                vp = c * V[..., :, p] - s * V[..., :, q]
                vq = s * V[..., :, p] + c * V[..., :, q]
                V = V.at[..., :, p].set(vp).at[..., :, q].set(vq)
    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w, V


def min_eigvec_psd(M, iters: int = 4):
    """Eigenvector of the smallest eigenvalue of a symmetric PSD matrix
    (..., N, N) by shifted inverse iteration via the unrolled Cholesky.

    Built for nullspace extraction (A^T A with lambda_min ~ 0): each solve
    amplifies the target direction by ~lambda_1/shift, so a few iterations
    reach machine precision.  Returns a unit vector (..., N).
    """
    n = M.shape[-1]
    tr = jnp.trace(M, axis1=-2, axis2=-1)
    shift = (1e-10 * tr + 1e-30)[..., None, None]
    Ms = M + shift * jnp.eye(n, dtype=M.dtype)
    L = cholesky_small(Ms, eps=1e-30)
    # deterministic full-rank-ish start (not orthogonal to anything in
    # practice; RANSAC scoring discards pathological hypotheses anyway)
    x = jnp.ones(M.shape[:-1], M.dtype) + 1e-3 * jnp.arange(n, dtype=M.dtype)
    for _ in range(iters):
        x = _solve_triu_t(L, _solve_tril(L, x))
        x = x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-30
        )
    return x


def _orthogonal_unit(u):
    """Some unit vector orthogonal to unit vector u (..., 3)."""
    ex = jnp.zeros_like(u).at[..., 0].set(1.0)
    ey = jnp.zeros_like(u).at[..., 1].set(1.0)
    c = jnp.cross(u, ex)
    alt = jnp.cross(u, ey)
    n1 = jnp.linalg.norm(c, axis=-1, keepdims=True)
    use_alt = n1 < 1e-6
    c = jnp.where(use_alt, alt, c)
    return c / jnp.maximum(jnp.linalg.norm(c, axis=-1, keepdims=True), 1e-30)


def svd3x3(A, sweeps: int = 8):
    """Batched 3x3 SVD without LAPACK: eigendecompose A^T A by Jacobi,
    recover the left basis by applying A and completing with cross
    products.  Returns (U (..., 3, 3), S (..., 3) descending >= 0,
    Vt (..., 3, 3)); A = U @ diag(S') @ Vt where S' = S up to the sign of
    the smallest singular value when det(A) < 0 (standard ambiguity —
    callers here only use U/Vt for projections and handle det signs
    themselves, exactly as they would with LAPACK output).
    """
    M = jnp.swapaxes(A, -1, -2) @ A
    w, V = jacobi_eigh(M, sweeps=sweeps)
    # descending
    w = w[..., ::-1]
    V = V[..., ::-1]
    S = jnp.sqrt(jnp.maximum(w, 0.0))
    AV = A @ V  # columns = s_i u_i
    eps = 1e-12 * (1.0 + S[..., :1])
    # u0
    u0 = AV[..., :, 0]
    n0 = jnp.linalg.norm(u0, axis=-1, keepdims=True)
    u0 = jnp.where(n0 > eps, u0 / jnp.maximum(n0, 1e-30),
                   jnp.zeros_like(u0).at[..., 0].set(1.0))
    # u1: Gram-Schmidt against u0, fallback to any orthogonal direction
    u1 = AV[..., :, 1]
    u1 = u1 - jnp.sum(u1 * u0, -1, keepdims=True) * u0
    n1 = jnp.linalg.norm(u1, axis=-1, keepdims=True)
    u1 = jnp.where(n1 > eps, u1 / jnp.maximum(n1, 1e-30), _orthogonal_unit(u0))
    # u2: complete the right-handed frame; flip sign to match A v2 when
    # it is observable so that A ~= U S Vt holds for full-rank inputs.
    u2 = jnp.cross(u0, u1)
    a2 = AV[..., :, 2]
    d2 = jnp.sum(a2 * u2, -1, keepdims=True)
    flip = jnp.where(jnp.abs(d2) > eps, jnp.sign(d2), 1.0)
    u2 = u2 * flip
    U = jnp.stack([u0, u1, u2], axis=-1)
    return U, S, jnp.swapaxes(V, -1, -2)


def det33(A):
    """Closed-form batched 3x3 determinant (no LU custom call)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
