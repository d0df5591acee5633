"""3D-3D correspondence alignment with vmapped RANSAC.

The loop-closure transform estimator for landmark-based place recognition:
the reference solves GP3P over matched landmarks (`Se3Solver.cpp:59-110`);
since in a VI collaborative map BOTH keyframes carry metrically-scaled 3D
landmarks, the equivalent (and better-conditioned) TPU formulation aligns
the matched 3D point sets directly: minimal 3-point Umeyama hypotheses,
batched scoring, optional weighted re-fit on inliers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from covins_tpu.ops import ransac
from covins_tpu.utils import geometry as geo


def align_ransac_3d3d(
    key,
    p1,
    p2,
    mask,
    n_hypotheses: int = 256,
    threshold: float = 0.3,
    refine: bool = True,
):
    """Estimate T_12 such that p1 ~= T_12 * p2 from noisy matched points.

    Args:
      p1: (N, 3) points in frame 1 (e.g. query-KF body frame).
      p2: (N, 3) the same physical points in frame 2.
      mask: (N,) valid matches.
      threshold: inlier distance (meters).

    Returns dict with `T_12` (7,), `inliers` (N,), `n_inliers` ().
    """
    idx = ransac.sample_minimal_sets(key, mask, n_hypotheses, 3)

    def solve_one(ix):
        g = geo.umeyama_alignment(p2[ix], p1[ix], with_scale=False)
        return g[:7]

    T = jax.vmap(solve_one)(idx)  # (H, 7)
    pred = geo.pose_apply(T[:, None, :], p2[None, :, :])  # (H, N, 3)
    err = jnp.linalg.norm(pred - p1[None], axis=-1)
    inl = (err < threshold) & mask[None, :]
    counts = inl.sum(axis=-1)
    best = jnp.argmax(counts)
    T_best, inl_best = T[best], inl[best]

    if refine:
        w = inl_best.astype(p1.dtype)
        g = geo.umeyama_alignment(p2, p1, weights=w, with_scale=False)
        T_ref = g[:7]
        err_r = jnp.linalg.norm(geo.pose_apply(T_ref[None], p2) - p1, axis=-1)
        inl_r = (err_r < threshold) & mask
        better = inl_r.sum() >= counts[best]
        T_best = jnp.where(better, T_ref, T_best)
        inl_best = jnp.where(better, inl_r, inl_best)

    return {"T_12": T_best, "inliers": inl_best, "n_inliers": inl_best.sum()}
