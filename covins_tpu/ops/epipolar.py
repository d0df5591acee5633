"""Relative-pose estimation: central essential matrix + non-central
(generalized) 17-point solver, vmapped RANSAC, and sampling-based covariance.

TPU-native replacement for the reference's COVINS-G solver stack
(`covins_backend/src/covins_backend/RelNonCentralPosSolver.cpp`):

* per-pair central relative pose (reference: OpenGV 5-pt STEWENIUS RANSAC,
  `RelNonCentralPosSolver.cpp:343-377`) — here the linear 8-point essential
  solve (batched SVD) + cheirality disambiguation.  8pt needs 8 matches
  instead of 5; the pipeline always has far more, and a linear solve maps to
  the MXU where Stewenius' Groebner basis would not.
* non-central 17-point linear solver over the generalized epipolar
  constraint (reference: OpenGV SEVENTEENPT, `RelNonCentralPosSolver.cpp:146-176`)
  — recovers metric-scale (R, t) between two multi-keyframe "virtual rigs".
* sampling-based 6-DoF covariance (reference: `RelNonCentralPosSolver.cpp:187-296`):
  re-solve on random inlier subsets, keep high-inlier re-solves, empirical
  covariance of [so(3)-log rotation deviation, translation deviation].

Rays are (origin v, unit direction f) pairs in their rig frame; a central
camera has v = 0.  The generalized epipolar constraint for transform
T_a_b = (R, t) mapping rig-b coordinates into rig-a:

    f_a^T [t]x R f_b  +  f_a^T R (v_b x f_b)  +  (v_a x f_a)^T R f_b  =  0

which is linear in the 18 unknowns (E = [t]x R, R).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from covins_tpu.ops import linalg as la_small
from covins_tpu.ops import polynomial as poly
from covins_tpu.ops import ransac
from covins_tpu.utils import geometry as geo


# ---------------------------------------------------------------------------
# Triangulation + scoring (shared by central / non-central paths)
# ---------------------------------------------------------------------------


def triangulate_midpoint(o1, d1, o2, d2):
    """Midpoint of the common perpendicular of two 3D lines.

    o*, d*: (..., 3) origins and unit directions (same frame).
    Returns (point (..., 3), valid (...,)).
    """
    w0 = o1 - o2
    a = jnp.sum(d1 * d1, -1)
    b = jnp.sum(d1 * d2, -1)
    c = jnp.sum(d2 * d2, -1)
    d = jnp.sum(d1 * w0, -1)
    e = jnp.sum(d2 * w0, -1)
    denom = a * c - b * b
    ok = jnp.abs(denom) > 1e-12
    denom_s = jnp.where(ok, denom, 1.0)
    s = (b * e - c * d) / denom_s
    t = (a * e - b * d) / denom_s
    p1 = o1 + s[..., None] * d1
    p2 = o2 + t[..., None] * d2
    return 0.5 * (p1 + p2), ok & (s > 0) & (t > 0)


def ray_angular_error(T_a_b, va, fa, vb, fb):
    """Max angular error (radians) of the two rays w.r.t. the midpoint-
    triangulated point, given candidate transforms.

    T_a_b: (..., 7); va/fa/vb/fb: (N, 3).  Returns (..., N).
    """
    ob = geo.pose_apply(T_a_b[..., None, :], vb)  # rig-b ray origins in a
    db = geo.quat_rotate(geo.pose_q(T_a_b)[..., None, :], fb)
    va_b = jnp.broadcast_to(va, ob.shape)
    fa_b = jnp.broadcast_to(fa, db.shape)
    X, ok = triangulate_midpoint(va_b, fa_b, ob, db)

    def ang(origin, direction, X):
        v = X - origin
        n = jnp.linalg.norm(v, axis=-1)
        cosang = jnp.sum(v * direction, -1) / jnp.maximum(n, 1e-12)
        return jnp.arccos(jnp.clip(cosang, -1.0, 1.0))

    err = jnp.maximum(ang(va_b, fa_b, X), ang(ob, db, X))
    return jnp.where(ok, err, jnp.pi)


# ---------------------------------------------------------------------------
# Central 8-point essential matrix
# ---------------------------------------------------------------------------


def essential_8pt(fa, fb, weights=None):
    """Linear essential-matrix estimate from bearing correspondences.

    fa, fb: (N, 3) unit bearings in frames a / b (N >= 8).
    Constraint: fa^T E fb = 0.  Returns E (3, 3) with singular values
    projected to (1, 1, 0).
    """
    A = (fa[:, :, None] * fb[:, None, :]).reshape(fa.shape[0], 9)
    if weights is not None:
        A = A * weights[:, None]
    x = la_small.min_eigvec_psd(A.T @ A)  # nullspace of A (no SVD on TPU)
    E = x.reshape(3, 3)
    U, _, Vt2 = la_small.svd3x3(E)
    # enforce rank-2 with equal singular values, keep det(U)=det(V)=+1
    D = jnp.asarray([1.0, 1.0, 0.0], E.dtype)
    return (U * D[None, :]) @ Vt2


def decompose_essential(E):
    """E -> 4 candidate T_a_b poses (R, unit t): (4, 7)."""
    U, _, Vt = la_small.svd3x3(E)
    # make proper rotations
    U = U * jnp.sign(la_small.det33(U))
    Vt = Vt * jnp.sign(la_small.det33(Vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    poses = []
    for R in (R1, R2):
        for s in (1.0, -1.0):
            poses.append(geo.pose_from_qt(geo.matrix_to_quat(R), s * t))
    return jnp.stack(poses)


@functools.partial(jax.jit, static_argnames=('n_hypotheses',))
def relative_pose_ransac_central(
    key, fa, fb, mask, n_hypotheses: int = 128, threshold_rad: float = 0.004
):
    """8-pt essential RANSAC over central bearings.  The per-keyframe-pair
    solver role of `RelNonCentralPosSolver::computePose` (:343-377).

    Returns dict with `T_a_b` (7,) (unit-norm translation — central relative
    pose is scale-free), `inliers` (N,), `n_inliers`.
    """
    idx = ransac.sample_minimal_sets(key, mask, n_hypotheses, 8)

    def solve_one(ix):
        E = essential_8pt(fa[ix], fb[ix])
        return decompose_essential(E)  # (4, 7)

    T = jax.vmap(solve_one)(idx).reshape(-1, 7)  # (H*4, 7)
    zeros = jnp.zeros_like(fa)
    err = ray_angular_error(T, zeros, fa, zeros, fb)  # (H*4, N)
    inl = (err < threshold_rad) & mask[None, :]
    counts = inl.sum(axis=-1)
    best = jnp.argmax(counts)
    return {"T_a_b": T[best], "inliers": inl[best], "n_inliers": counts[best]}


# ---------------------------------------------------------------------------
# Central 5-point essential matrix (Nister / Stewenius minimal case)
# ---------------------------------------------------------------------------
#
# The reference's per-pair prefilter is a 5-pt STEWENIUS central RANSAC
# (`RelNonCentralPosSolver.cpp:343-377` via OpenGV).  A minimal 5-pt set is
# ~2.4x more likely to be outlier-free than an 8-pt set at 30% outliers, so
# this matters on hard loops.  Stewenius' Groebner action matrix needs a
# nonsymmetric 10x10 eigensolver (complex pairs) that the TPU cannot lower;
# we instead follow Nister's elimination to a degree-10 univariate
# polynomial and find its real roots with the TPU-safe bracketing solver
# (`polynomial.solve_poly_real`).  The polynomial coefficients are built
# NUMERICALLY by trivariate polynomial arithmetic (dense (4,4,4) exponent
# grids multiplied by 3-D convolution) rather than a generated symbolic
# expansion — same math, no thousand-term code.


def _pmul(p, q):
    """Product of trivariate polynomials on dense exponent grids.

    p: (dx, dy, dz) coefficient grid with p[i,j,k] the coefficient of
    x^i y^j z^k; likewise q.  Full 3-D convolution.
    """
    return jax.scipy.signal.convolve(p, q, mode="full")


# Nister's 20-monomial order (PAMI'04 SS3.2): columns 0..9 are eliminated,
# columns 10..19 = [xz^2, xz, x, yz^2, yz, y, z^3, z^2, z, 1].
_NISTER_MONOMIALS = (
    (3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1),
    (2, 0, 0), (0, 2, 1), (0, 2, 0), (1, 1, 1), (1, 1, 0),
    (1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1),
    (0, 1, 0), (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0),
)


def _cubic_to_row(p):
    """(4,4,4) cubic coefficient grid -> (20,) row in Nister order."""
    return jnp.stack([p[i, j, k] for (i, j, k) in _NISTER_MONOMIALS])


def _gauss_jordan(A):
    """Reduced row echelon over the leading 10 columns of a (10, 20)
    system, partial pivoting.  Unrolled: 10 static elimination steps."""
    n = A.shape[0]
    for col in range(n):
        piv = col + jnp.argmax(jnp.abs(A[col:, col]))
        # swap rows col <-> piv (gather-based, traceable)
        perm = jnp.arange(n)
        perm = perm.at[col].set(piv).at[piv].set(col)
        A = A[perm]
        A = A.at[col].set(A[col] / _psafe(A[col, col]))
        factors = A[:, col].at[col].set(0.0)
        A = A - factors[:, None] * A[col][None, :]
    return A


def _psafe(x, eps=1e-20):
    return jnp.where(jnp.abs(x) < eps, jnp.where(x < 0, -eps, eps), x)


def essential_5pt(fa, fb):
    """Nister 5-point: exactly 5 bearing pairs -> up to 10 essential
    matrices.  fa, fb: (5, 3) unit bearings, constraint fa^T E fb = 0.

    Returns ``(E (10, 3, 3), valid (10,))`` — one candidate per real root
    of the degree-10 polynomial.
    """
    dtype = fa.dtype
    A = (fa[:, :, None] * fb[:, None, :]).reshape(5, 9)
    # 4-dim nullspace basis from the 4 smallest eigenvectors of A^T A
    _, V = la_small.jacobi_eigh(A.T @ A)
    basis = V[:, :4].T.reshape(4, 3, 3)  # E1, E2, E3, E4

    # E(x,y,z) = x E1 + y E2 + z E3 + E4 as (3,3) grid of linear trivariates
    E_lin = jnp.zeros((3, 3, 2, 2, 2), dtype)
    E_lin = E_lin.at[:, :, 1, 0, 0].set(basis[0])
    E_lin = E_lin.at[:, :, 0, 1, 0].set(basis[1])
    E_lin = E_lin.at[:, :, 0, 0, 1].set(basis[2])
    E_lin = E_lin.at[:, :, 0, 0, 0].set(basis[3])

    def lin(i, j):
        return E_lin[i, j]

    # det(E): cofactor expansion, (2,2,2)*(2,2,2)->(3,3,3), *(2,2,2)->(4,4,4)
    def minor(i0, i1, j0, j1):
        return _pmul(lin(i0, j0), lin(i1, j1)) - _pmul(lin(i0, j1), lin(i1, j0))

    det = (
        _pmul(lin(0, 0), minor(1, 2, 1, 2))
        - _pmul(lin(0, 1), minor(1, 2, 0, 2))
        + _pmul(lin(0, 2), minor(1, 2, 0, 1))
    )

    # trace constraint: 2 E E^T E - tr(E E^T) E = 0  (9 cubic equations)
    EEt = [[sum(_pmul(lin(i, k), lin(j, k)) for k in range(3))
            for j in range(3)] for i in range(3)]
    tr = EEt[0][0] + EEt[1][1] + EEt[2][2]
    rows = [det]
    for i in range(3):
        for j in range(3):
            cub = sum(_pmul(EEt[i][k], lin(k, j)) for k in range(3))
            rows.append(2.0 * cub - _pmul(tr, lin(i, j)))
    M = jnp.stack([_cubic_to_row(r) for r in rows])  # (10, 20)

    R = _gauss_jordan(M)
    # rows 4..9 lead with [x^2 z, x^2, y^2 z, y^2, xyz, xy]; eliminating the
    # leads pairwise via multiplication by z yields 3 equations linear in
    # (x, y) with polynomial-in-z coefficients:
    #   row(4) - z row(5), row(6) - z row(7), row(8) - z row(9)
    # tail columns: x*(z^2,z,1) -> 10..12, y*(z^2,z,1) -> 13..15,
    # (z^3,z^2,z,1) -> 16..19.  (Leading 1 in its own column contributes
    # nothing to the tail.)
    def poly_pair(ra, rb, cols, pad):
        # coeff vector of tail(ra) - z * tail(rb), highest power first
        a = jnp.concatenate([jnp.zeros((1,), dtype), R[ra, cols]])
        b = jnp.concatenate([R[rb, cols], jnp.zeros((1,), dtype)])
        return -(a - b)  # leading monomial moved to RHS: lead = -tail

    pairs = [(4, 5), (6, 7), (8, 9)]
    Bx = jnp.stack([poly_pair(a, b, slice(10, 13), 1) for a, b in pairs])
    By = jnp.stack([poly_pair(a, b, slice(13, 16), 1) for a, b in pairs])
    Bz = jnp.stack([
        -(jnp.concatenate([jnp.zeros((1,), dtype), R[a, 16:20]])
          - jnp.concatenate([R[b, 16:20], jnp.zeros((1,), dtype)]))
        for a, b in pairs
    ])  # (3, 5): z^4..z^0

    # det of the 3x3 polynomial matrix [Bx | By | Bz] -> degree-10 in z
    def conv(u, v):
        return jnp.convolve(u, v)

    def det2(col1, col2, r0, r1):
        return conv(col1[r0], col2[r1]) - conv(col1[r1], col2[r0])

    p10 = (
        conv(Bx[0], det2(By, Bz, 1, 2))
        - conv(By[0], det2(Bx, Bz, 1, 2))
        + conv(Bz[0], det2(Bx, By, 1, 2))
    )  # (11,)

    # Nister-poly roots are O(1) after the solver's Fujiwara rescale, so a
    # modest grid resolves them; 1024 points measurably slowed the CPU
    # test lane for no accuracy gain.
    z_roots, valid = poly.solve_poly_real(p10, n_grid=256, bisect_iters=44)

    # back-substitute each root: [Bx(z) By(z)] [x y]^T = -Bz(z), 3x2 lsq
    def at_z(coeffs, z):
        # coeffs (..., D+1) highest-first evaluated at scalar z
        out = jnp.zeros(coeffs.shape[:-1], coeffs.dtype)
        for i in range(coeffs.shape[-1]):
            out = out * z + coeffs[..., i]
        return out

    def solve_root(z):
        ax = at_z(Bx, z)
        ay = at_z(By, z)
        az = at_z(Bz, z)
        Mz = jnp.stack([ax, ay], axis=-1)  # (3, 2)
        N = Mz.T @ Mz
        rhs = -Mz.T @ az
        d = N[0, 0] * N[1, 1] - N[0, 1] * N[1, 0]
        x = (rhs[0] * N[1, 1] - rhs[1] * N[0, 1]) / _psafe(d)
        y = (N[0, 0] * rhs[1] - N[1, 0] * rhs[0]) / _psafe(d)
        E = x * basis[0] + y * basis[1] + z * basis[2] + basis[3]
        return E / jnp.maximum(jnp.linalg.norm(E), 1e-30)

    E_all = jax.vmap(solve_root)(z_roots)  # (10, 3, 3)
    return E_all, valid


@functools.partial(jax.jit, static_argnames=('n_hypotheses',))
def relative_pose_ransac_central_5pt(
    key, fa, fb, mask, n_hypotheses: int = 64, threshold_rad: float = 0.004
):
    """5-pt essential RANSAC over central bearings — the minimal-sample
    counterpart of :func:`relative_pose_ransac_central` and the parity
    match for the reference's OpenGV STEWENIUS prefilter
    (`RelNonCentralPosSolver.cpp:343-377`).

    Each hypothesis yields up to 10 essential matrices x 4 decompositions;
    all are scored jointly.  Returns the same dict shape as the 8-pt
    variant: `T_a_b` (7,), `inliers` (N,), `n_inliers`.
    """
    idx = ransac.sample_minimal_sets(key, mask, n_hypotheses, 5)

    def solve_one(ix):
        E_all, valid = essential_5pt(fa[ix], fb[ix])
        T = jax.vmap(decompose_essential)(E_all)  # (10, 4, 7)
        return T.reshape(-1, 7), jnp.repeat(valid, 4)

    T, valid = jax.vmap(solve_one)(idx)
    T = T.reshape(-1, 7)              # (H*40, 7)
    valid = valid.reshape(-1)
    zeros = jnp.zeros_like(fa)
    err = ray_angular_error(T, zeros, fa, zeros, fb)  # (H*40, N)
    inl = (err < threshold_rad) & mask[None, :] & valid[:, None]
    counts = inl.sum(axis=-1)
    best = jnp.argmax(counts)
    return {"T_a_b": T[best], "inliers": inl[best], "n_inliers": counts[best]}


# ---------------------------------------------------------------------------
# Non-central 17-point solver (generalized epipolar constraint)
# ---------------------------------------------------------------------------


def _gec_rows(va, fa, vb, fb):
    """Rows of the linear system in [vec(E); vec(R)] (row-major 3x3 vecs).

    One row per correspondence:
      sum_ij fa_i fb_j E_ij + sum_ij [ fa_i (vb x fb)_j + (va x fa)_i fb_j ] R_ij
    """
    mE = fa[:, :, None] * fb[:, None, :]  # (N, 3, 3)
    mR = fa[:, :, None] * jnp.cross(vb, fb)[:, None, :] + jnp.cross(va, fa)[
        :, :, None
    ] * fb[:, None, :]
    return jnp.concatenate([mE.reshape(-1, 9), mR.reshape(-1, 9)], axis=-1)


def _skew_vee(M):
    return 0.5 * jnp.stack(
        [M[..., 2, 1] - M[..., 1, 2], M[..., 0, 2] - M[..., 2, 0], M[..., 1, 0] - M[..., 0, 1]],
        axis=-1,
    )


def gep_17pt(va, fa, vb, fb, weights=None):
    """Linear 17-point non-central relative pose (Li et al. 2008).

    va/fa: (N, 3) ray origins/directions in rig a; vb/fb likewise in rig b
    (N >= 17).  Returns T_a_b (7,) with METRIC-scale translation (the
    non-central geometry observes scale, which is why COVINS-G can close
    loops without map points).
    """
    A = _gec_rows(va, fa, vb, fb)
    if weights is not None:
        A = A * weights[:, None]
    x = la_small.min_eigvec_psd(A.T @ A)  # 18-dim nullspace vector
    Rpart = x[9:].reshape(3, 3)
    # fix the nullvector scale: ||R||_F = sqrt(3)
    lam = jnp.sqrt(3.0) / jnp.maximum(jnp.linalg.norm(Rpart), 1e-12)
    sign = jnp.sign(la_small.det33(Rpart))
    sign = jnp.where(sign == 0, 1.0, sign)
    x = x * lam * sign
    Epart = x[:9].reshape(3, 3)
    Rpart = x[9:].reshape(3, 3)
    # project R to SO(3)
    U, _, Vt2 = la_small.svd3x3(Rpart)
    d = jnp.sign(la_small.det33(U @ Vt2))
    D = jnp.asarray([1.0, 1.0, 0.0], x.dtype) + jnp.asarray([0.0, 0.0, 1.0], x.dtype) * d
    R = (U * D[None, :]) @ Vt2
    # E = [t]x R  =>  [t]x = E R^T
    t = _skew_vee(Epart @ R.T)
    return geo.pose_from_qt(geo.matrix_to_quat(R), t)


@functools.partial(jax.jit, static_argnames=('n_hypotheses', 'refine_top'))
def relative_pose_ransac_noncentral(
    key,
    va, fa, vb, fb,
    mask,
    n_hypotheses: int = 64,
    threshold_rad: float = 0.004,
    refine_top: bool = True,
):
    """17-pt generalized-epipolar RANSAC (the SEVENTEENPT stage,
    `RelNonCentralPosSolver.cpp:146-176`), scored by triangulated ray
    angular error with the OpenGV-style pixel threshold mapped to radians.

    Returns dict with `T_a_b` (7,), `inliers` (N,), `n_inliers`.
    """
    idx = ransac.sample_minimal_sets(key, mask, n_hypotheses, 17)

    def solve_one(ix):
        return gep_17pt(va[ix], fa[ix], vb[ix], fb[ix])

    T = jax.vmap(solve_one)(idx)  # (H, 7)
    err = ray_angular_error(T, va, fa, vb, fb)  # (H, N)
    inl = (err < threshold_rad) & mask[None, :]
    counts = inl.sum(axis=-1)
    best = jnp.argmax(counts)
    T_best, inl_best = T[best], inl[best]

    if refine_top:
        # one weighted re-solve on all inliers (linear least squares)
        w = inl_best.astype(fa.dtype)
        T_ref = gep_17pt(va, fa, vb, fb, weights=w)
        err_r = ray_angular_error(T_ref, va, fa, vb, fb)
        inl_r = (err_r < threshold_rad) & mask
        better = inl_r.sum() >= counts[best]
        T_best = jnp.where(better, T_ref, T_best)
        inl_best = jnp.where(better, inl_r, inl_best)

    return {"T_a_b": T_best, "inliers": inl_best, "n_inliers": inl_best.sum()}


@functools.partial(jax.jit, static_argnames=('n_samples', 'sample_size'))
def sampling_covariance(
    key,
    T_best,
    va, fa, vb, fb,
    inliers,
    n_samples: int = 64,
    sample_size: int = 17,
    threshold_rad: float = 0.004,
    min_inlier_ratio: float = 0.8,
):
    """Empirical 6-DoF covariance of the non-central relative pose by
    re-solving on random inlier subsets (`RelNonCentralPosSolver.cpp:187-296`:
    iterate, keep re-solves with > 80% inlier ratio, deviation = [quat-log
    rotation, translation], empirical covariance; loop accepted iff
    trace(cov) < cov_thres).

    Returns (cov (6, 6), n_used ()).
    """
    idx = ransac.sample_minimal_sets(key, inliers, n_samples, sample_size)

    def solve_one(ix):
        return gep_17pt(va[ix], fa[ix], vb[ix], fb[ix])

    T = jax.vmap(solve_one)(idx)  # (S, 7)
    err = ray_angular_error(T, va, fa, vb, fb)
    inl = (err < threshold_rad) & inliers[None, :]
    ratio = inl.sum(-1).astype(jnp.float32) / jnp.maximum(inliers.sum(), 1)
    keep = ratio > min_inlier_ratio

    dq = geo.quat_multiply(
        geo.quat_conjugate(geo.pose_q(T_best))[None, :], geo.pose_q(T)
    )
    dev = jnp.concatenate(
        [geo.quat_log(dq), geo.pose_t(T) - geo.pose_t(T_best)[None, :]], axis=-1
    )  # (S, 6)
    w = keep.astype(dev.dtype)[:, None]
    n_used = jnp.sum(keep)
    denom = jnp.maximum(n_used - 1, 1).astype(dev.dtype)
    cov = (w * dev).T @ (w * dev) / denom
    return cov, n_used
