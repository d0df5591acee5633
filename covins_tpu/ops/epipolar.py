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
