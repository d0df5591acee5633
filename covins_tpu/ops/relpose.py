"""Relative-pose Gauss-Newton refinement — `Optimization::OptimizeRelativePose`
(`covins_backend/src/covins_backend/optimization_be.cpp:620-831`) re-designed
as a fixed-iteration jit'd solve.

Reference semantics preserved:
* one 7-parameter relative pose block ``T_12`` (quaternion local param ->
  here a 6-dof right-tangent update);
* per match a PAIRED residual: landmark of KF2 projected into KF1 through
  ``T_12`` (kNormal) and landmark of KF1 projected into KF2 through
  ``T_12^{-1}`` (kInverse);
* robust loss on the first round, outlier pruning at ``th_outlier_align``
  (residual norm in px), then a clean second round;
* returns the refined pose + inlier count (caller gates on
  ``inliers_thres`` >= 12, `placerec_be.cpp:142-163`).

TPU design: residuals/Jacobians for ALL matches in one vmapped batch;
the 6x6 normal system is formed with one einsum contraction (an MXU matmul)
and solved in closed form.  Both rounds and all GN iterations are unrolled
under jit — no data-dependent control flow.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from covins_tpu.ops import residuals as res
from covins_tpu.ops import linalg as la_small
from covins_tpu.utils import cameras as cam_mod
from covins_tpu.utils import geometry as geo


def _gn_rounds(cam1, cam2, T12, p1, p2, w, n_iters, damping, huber_delta=0.0):
    """Run `n_iters` damped GN steps on the 6-dof tangent of T12.

    w: (N,) per-match weights (0 = pruned/invalid).
    huber_delta: if > 0, Huber IRLS reweighting (robust round-1; the
    reference relies on RANSAC pre-filtering alone, this is strictly more
    tolerant of residual mismatches).
    """

    def residual_at(xi, T):
        T_cur = geo.pose_boxplus(T, xi)
        r, valid = res.relative_reprojection_residual(cam1, cam2, T_cur, p1, p2)
        return r, valid

    def robust_cost(r, valid):
        """sum_i w_i * rho(||r_i||): Huber if huber_delta > 0 else squared."""
        rn2 = jnp.sum(r * r, axis=-1)
        if huber_delta > 0:
            rn = jnp.sqrt(jnp.maximum(rn2, 1e-24))
            rho = jnp.where(
                rn <= huber_delta,
                rn2,
                huber_delta * (2.0 * rn - huber_delta),
            )
        else:
            rho = rn2
        return jnp.sum(w * valid.astype(r.dtype) * rho)

    def step(T, _):
        zero = jnp.zeros(6, T.dtype)
        (r, valid), = (residual_at(zero, T),)
        J = jax.jacfwd(lambda xi: residual_at(xi, T)[0])(zero)  # (N, 4, 6)
        ww = w * valid.astype(T.dtype)
        if huber_delta > 0:
            rn = jnp.linalg.norm(r, axis=-1)
            ww = ww * jnp.minimum(1.0, huber_delta / jnp.maximum(rn, 1e-12))
        Jw = J * ww[:, None, None]
        H = jnp.einsum("nri,nrj->ij", Jw, J)
        b = -jnp.einsum("nri,nr->i", Jw, r)
        H = H + damping * jnp.eye(6, dtype=T.dtype)
        xi = la_small.solve_psd_small(H, b)
        r_new, valid_new = residual_at(xi, T)
        cost_old = robust_cost(r, valid)
        cost_new = robust_cost(r_new, valid_new)
        T_new = geo.pose_boxplus(T, xi)
        T = jnp.where(cost_new < cost_old, T_new, T)
        return T, None

    T_out, _ = jax.lax.scan(step, T12, None, length=n_iters)
    return T_out


@partial(jax.jit, static_argnames=("n_iters", "th_outlier"))
def _optimize(cam1, cam2, T12_init, p1, p2, mask, th_outlier, n_iters):
    dtype = T12_init.dtype
    w0 = mask.astype(dtype)
    # Round 1 (Huber-robust so gross outliers cannot drag the estimate)
    T1 = _gn_rounds(
        cam1, cam2, T12_init, p1, p2, w0, n_iters, damping=1e-6,
        huber_delta=th_outlier,
    )
    # Outlier pruning at th_outlier (per-direction px norm, matching the
    # reference's per-residual-block check, `optimization_be.cpp:744-784`).
    r, valid = res.relative_reprojection_residual(cam1, cam2, T1, p1, p2)
    n1 = jnp.linalg.norm(r[:, :2], axis=-1)
    n2 = jnp.linalg.norm(r[:, 2:], axis=-1)
    inl = mask & valid & (n1 < th_outlier) & (n2 < th_outlier)
    # Round 2 on inliers only
    T2 = _gn_rounds(cam1, cam2, T1, p1, p2, inl.astype(dtype), n_iters, damping=1e-6)
    r2, valid2 = res.relative_reprojection_residual(cam1, cam2, T2, p1, p2)
    n1 = jnp.linalg.norm(r2[:, :2], axis=-1)
    n2 = jnp.linalg.norm(r2[:, 2:], axis=-1)
    inl2 = mask & valid2 & (n1 < th_outlier) & (n2 < th_outlier)
    return T2, inl2, jnp.sum(inl2)


def optimize_relative_pose(
    cam1: cam_mod.Camera,
    cam2: cam_mod.Camera,
    T12_init,
    p1,
    p2,
    mask,
    th_outlier: float = 4.0,
    n_iters: int = 8,
):
    """Refine ``T_12`` from paired 3D-3D correspondences with known
    per-frame observations.

    Args:
      cam1, cam2: the two keyframes' cameras.
      T12_init: (7,) initial relative pose (e.g. from P3P/17pt RANSAC).
      p1: (N, 3) matched landmark positions in KF1 BODY frame.
      p2: (N, 3) the same landmarks in KF2 BODY frame.
      mask: (N,) valid matches.
      th_outlier: px pruning threshold (`opt.th_outlier_align`).
      n_iters: GN iterations per round.

    Returns:
      (T12 (7,), inliers (N,) bool, n_inliers ()) — caller applies the
      >= 12 gate (`optimization_be.cpp:825-828`).
    """
    return _optimize(cam1, cam2, T12_init, p1, p2, mask, th_outlier, n_iters)
