"""Absolute-pose estimation: batched P3P + vmapped RANSAC.

TPU-native replacement for the reference's ``Se3Solver::projectiveAlignment``
(`covins_backend/src/covins_backend/Se3Solver.cpp:59-110`), which runs
OpenGV's GP3P inside a sequential RANSAC loop.  Here the keyframe is a
single camera rig, so we solve the central P3P in the *camera* frame
(Grunert's closed form -> quartic, `covins_tpu.ops.polynomial`) and compose
the body pose through the extrinsic ``T_s_c`` afterwards — same estimate,
no non-central machinery needed.

RANSAC is fixed-iteration and fully vectorized: all hypotheses are solved
with one vmapped quartic batch and scored against all correspondences with
one (H*4, N) matmul-shaped reprojection check — the TPU analog of OpenGV's
adaptive sequential sampler.  Scoring uses the angular/bearing error so it
works for any camera model (the reference thresholds RANSAC on reprojection
px via focal length; we expose the same `threshold_px / focal` conversion).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from covins_tpu.ops import polynomial as poly
from covins_tpu.ops import ransac
from covins_tpu.utils import geometry as geo


def p3p_grunert(points_w, bearings):
    """Central P3P (Grunert 1841 / Haralick et al.).

    Args:
      points_w: (3, 3) world points.
      bearings: (3, 3) unit bearing vectors in the camera frame.

    Returns:
      (T_c_w (4, 7), valid (4,)) — up to 4 candidate camera-from-world poses.
    """
    dtype = points_w.dtype
    P1, P2, P3 = points_w[0], points_w[1], points_w[2]
    f1, f2, f3 = bearings[0], bearings[1], bearings[2]

    a2 = jnp.sum((P2 - P3) ** 2)  # opposite P1
    b2 = jnp.sum((P1 - P3) ** 2)  # opposite P2
    c2 = jnp.sum((P1 - P2) ** 2)  # opposite P3
    ca = jnp.clip(jnp.dot(f2, f3), -1.0, 1.0)  # cos(alpha)
    cb = jnp.clip(jnp.dot(f1, f3), -1.0, 1.0)  # cos(beta)
    cg = jnp.clip(jnp.dot(f1, f2), -1.0, 1.0)  # cos(gamma)

    eps = jnp.asarray(1e-12, dtype)
    q = (a2 - c2) / jnp.maximum(b2, eps)  # (a^2 - c^2) / b^2
    p = (a2 + c2) / jnp.maximum(b2, eps)

    # Grunert's quartic in v = s2/s1 (Haralick et al. 1994, eq. system).
    A4 = (q - 1.0) ** 2 - 4.0 * c2 / jnp.maximum(b2, eps) * ca * ca
    A3 = 4.0 * (q * (1.0 - q) * cb - (1.0 - p) * ca * cg + 2.0 * c2 / jnp.maximum(b2, eps) * ca * ca * cb)
    A2 = 2.0 * (q * q - 1.0 + 2.0 * q * q * cb * cb + 2.0 * (b2 - c2) / jnp.maximum(b2, eps) * ca * ca
                - 4.0 * p * ca * cb * cg + 2.0 * (b2 - a2) / jnp.maximum(b2, eps) * cg * cg)
    A1 = 4.0 * (-q * (1.0 + q) * cb + 2.0 * a2 / jnp.maximum(b2, eps) * cg * cg * cb - (1.0 - p) * ca * cg)
    A0 = (1.0 + q) ** 2 - 4.0 * a2 / jnp.maximum(b2, eps) * cg * cg

    roots, is_real = poly.solve_quartic(A4, A3, A2, A1, A0)
    coeffs = jnp.stack([A4, A3, A2, A1, A0]).astype(dtype)
    v = poly.polish_real_roots(coeffs, roots.astype(dtype))  # (4,) real

    # Haralick's quartic unknown is v = s3/s1 (tied to side b / angle beta):
    #   s1^2 (1 + v^2 - 2 v cos(beta)) = b^2
    denom1 = 1.0 + v * v - 2.0 * v * cb
    s1 = jnp.sqrt(b2 / jnp.maximum(denom1, eps))
    s3 = v * s1
    # u = s2/s1.  Subtract the remaining two law-of-cosines constraints
    #   u^2 + v^2 - 2 u v cos(alpha) = a^2 / s1^2   (side a: P2-P3)
    #   1 + u^2   - 2 u   cos(gamma) = c^2 / s1^2   (side c: P1-P2)
    # -> linear in u:
    den_u = 2.0 * (v * ca - cg)
    num_u = v * v - 1.0 - (a2 - c2) * denom1 / jnp.maximum(b2, eps)
    u = num_u / jnp.where(jnp.abs(den_u) < 1e-12, 1e-12, den_u)
    s2 = u * s1

    valid = (
        is_real
        & (s1 > 0) & (s2 > 0) & (s3 > 0)
        & (denom1 > eps) & (jnp.abs(den_u) > 1e-12)
    )

    # Camera-frame points, then rigid alignment world -> camera.
    def align(si):
        s1i, s2i, s3i = si
        Xc = jnp.stack([s1i * f1, s2i * f2, s3i * f3], axis=0)  # (3, 3)
        g = geo.umeyama_alignment(points_w, Xc, with_scale=False)
        return g[:7]  # pose T_c_w

    T = jax.vmap(align)(jnp.stack([s1, s2, s3], axis=-1))
    return T, valid


def reprojection_angular_error(T_c_w, points_w, bearings):
    """Angular error (radians) between predicted and observed bearings.

    T_c_w: (..., 7); points_w: (N, 3); bearings: (N, 3) unit.
    Returns (..., N).
    """
    p_c = geo.pose_apply(T_c_w[..., None, :], points_w)  # (..., N, 3)
    n = jnp.linalg.norm(p_c, axis=-1)
    pred = p_c / jnp.maximum(n, 1e-12)[..., None]
    cosang = jnp.clip(jnp.sum(pred * bearings, axis=-1), -1.0, 1.0)
    err = jnp.arccos(cosang)
    # Points behind the camera: force max error.
    return jnp.where(n > 1e-9, err, jnp.pi)


def px_threshold_to_angular(threshold_px, focal):
    """The reference thresholds RANSAC at `ransac.probability`-driven px
    error; OpenGV converts px -> angular as 1 - cos(atan(px/f))
    (`RelNonCentralPosSolver.cpp:49` uses the same form).  We score in
    radians, so the equivalent is atan(px / f)."""
    return jnp.arctan2(threshold_px, focal)


@functools.partial(jax.jit, static_argnames=('n_hypotheses',))
def absolute_pose_ransac(
    key,
    points_w,
    bearings,
    mask,
    n_hypotheses: int = 256,
    threshold_rad: float = 0.006,
):
    """Vectorized P3P RANSAC (the `Se3Solver::projectiveAlignment` role,
    `Se3Solver.cpp:59-110`: minimum 3-pt samples, inlier classification,
    best-model selection).

    Args:
      key: PRNG key.
      points_w: (N, 3) world/map-frame landmark positions.
      bearings: (N, 3) unit bearings of the observing keyframe (camera frame).
      mask: (N,) bool validity of each correspondence.
      n_hypotheses: fixed RANSAC iterations (vmapped, no early exit).
      threshold_rad: angular inlier threshold.

    Returns dict with `T_c_w` (7,), `inliers` (N,) bool, `n_inliers` ().
    """
    idx = ransac.sample_minimal_sets(key, mask, n_hypotheses, 3)

    def solve_one(ix):
        return p3p_grunert(points_w[ix], bearings[ix])

    T, valid = jax.vmap(solve_one)(idx)  # (H, 4, 7), (H, 4)
    T = T.reshape(-1, 7)
    valid = valid.reshape(-1)

    err = reprojection_angular_error(T, points_w, bearings)  # (H*4, N)
    inl = (err < threshold_rad) & mask[None, :]
    counts = jnp.where(valid, inl.sum(axis=-1), -1)
    best = jnp.argmax(counts)
    return {
        "T_c_w": T[best],
        "inliers": inl[best],
        "n_inliers": jnp.maximum(counts[best], 0),
    }
