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


def gp3p_kneip(points_w, origins, bearings, n_grid: int = 512,
               bisect_iters: int = 40):
    """Non-central (generalized) P3P: three rays with DISTINCT origins.

    The true minimal solver behind the reference's
    ``Se3Solver::projectiveAlignment`` (OpenGV GP3P, `Se3Solver.cpp:59-110`)
    for multi-camera / multi-keyframe rigs; the central
    :func:`p3p_grunert` is its ``origins = 0`` special case.

    Args:
      points_w: (3, 3) world points.
      origins: (3, 3) ray origins in the rig frame.
      bearings: (3, 3) unit ray directions in the rig frame.

    Returns ``(T_rig_w (8, 7), valid (8,))`` — up to 8 candidates (the
    Bezout bound of the three pairwise-distance quadrics).

    Method (TPU-safe, no Groebner/eigensolver): the three constraints
    ``|x_i - x_j| = |p_i - p_j|`` with ``x_i = v_i + lam_i f_i`` couple
    (lam_1, lam_3) and (lam_2, lam_3) through quadratics that are solved
    in closed form per branch sign; substituting into the (1,2) constraint
    leaves one continuous function of lam_3 per branch pair, whose sign
    changes are bracketed on a compactified grid and bisected.  Rigid
    alignment of the recovered rig-frame triangle then gives the pose.
    """
    dtype = points_w.dtype
    d2 = jnp.stack([
        jnp.sum((points_w[0] - points_w[1]) ** 2),
        jnp.sum((points_w[0] - points_w[2]) ** 2),
        jnp.sum((points_w[1] - points_w[2]) ** 2),
    ])  # d12^2, d13^2, d23^2

    # normalize the metric scale so lam is O(1) on the search grid
    scale = jnp.sqrt(jnp.maximum(jnp.max(d2), 1e-24))
    v = origins / scale
    d2 = d2 / (scale * scale)
    f = bearings

    w13 = v[0] - v[2]
    w23 = v[1] - v[2]
    w12 = v[0] - v[1]
    c13 = jnp.dot(f[0], f[2])
    c23 = jnp.dot(f[1], f[2])
    c12 = jnp.dot(f[0], f[1])

    def lam1_of(lam3, sign):
        # E13: lam1^2 + 2 b lam1 + c = 0  (monic)
        b = jnp.dot(f[0], w13) - lam3 * c13
        c = lam3 * lam3 - 2.0 * lam3 * jnp.dot(f[2], w13) + jnp.dot(w13, w13) - d2[1]
        disc = b * b - c
        ok = disc >= 0
        return -b + sign * jnp.sqrt(jnp.maximum(disc, 0.0)), ok

    def lam2_of(lam3, sign):
        b = jnp.dot(f[1], w23) - lam3 * c23
        c = lam3 * lam3 - 2.0 * lam3 * jnp.dot(f[2], w23) + jnp.dot(w23, w23) - d2[2]
        disc = b * b - c
        ok = disc >= 0
        return -b + sign * jnp.sqrt(jnp.maximum(disc, 0.0)), ok

    def resid12(lam1, lam2):
        x1 = v[0] + lam1 * f[0]
        x2 = v[1] + lam2 * f[1]
        return jnp.sum((x1 - x2) ** 2) - d2[0]

    def g(lam3, s1, s2):
        l1, ok1 = lam1_of(lam3, s1)
        l2, ok2 = lam2_of(lam3, s2)
        return resid12(l1, l2), ok1 & ok2

    # compactified positive grid: lam3 = u / (1 - u), u in (0, 1)
    u = jnp.linspace(1e-3, 1.0 - 2e-3, n_grid)
    lam3_grid = u / (1.0 - u)

    sols = []
    valids = []
    for s1 in (1.0, -1.0):
        for s2 in (1.0, -1.0):
            gv, ok = jax.vmap(lambda l: g(l, s1, s2))(lam3_grid)
            sgn = jnp.sign(gv)
            change = (sgn[:-1] * sgn[1:] < 0) & ok[:-1] & ok[1:]
            rank = jnp.cumsum(change)
            for slot in range(2):  # up to 2 roots per branch (8 total)
                hit = change & (rank == slot + 1)
                has = jnp.any(hit)
                i0 = jnp.argmax(hit)
                lo = lam3_grid[i0]
                hi = lam3_grid[i0 + 1]
                g_lo, _ = g(lo, s1, s2)
                for _ in range(bisect_iters):
                    mid = 0.5 * (lo + hi)
                    g_mid, _ = g(mid, s1, s2)
                    left = g_lo * g_mid <= 0
                    hi = jnp.where(left, mid, hi)
                    lo = jnp.where(left, lo, mid)
                    g_lo = jnp.where(left, g_lo, g_mid)
                lam3 = 0.5 * (lo + hi)
                l1, ok1 = lam1_of(lam3, s1)
                l2, ok2 = lam2_of(lam3, s2)
                sols.append(jnp.stack([l1, l2, lam3]))
                valids.append(has & ok1 & ok2 & (l1 > 0) & (l2 > 0)
                              & (lam3 > 0))
    lam = jnp.stack(sols)          # (8, 3) in normalized units
    valid = jnp.stack(valids)      # (8,)

    def align(lams):
        X = v + lams[:, None] * f          # rig-frame triangle (normalized)
        g7 = geo.umeyama_alignment(points_w, X * scale, with_scale=False)
        return g7[:7]

    T = jax.vmap(align)(lam)
    return T, valid


def generalized_reprojection_angular_error(T_rig_w, points_w, origins,
                                           bearings):
    """Angular error between each non-central ray and the direction to its
    world point mapped into the rig frame.  T_rig_w: (..., 7);
    points_w/origins/bearings: (N, 3).  Returns (..., N)."""
    p_r = geo.pose_apply(T_rig_w[..., None, :], points_w)  # (..., N, 3)
    d = p_r - origins
    n = jnp.linalg.norm(d, axis=-1)
    pred = d / jnp.maximum(n, 1e-12)[..., None]
    cosang = jnp.clip(jnp.sum(pred * bearings, axis=-1), -1.0, 1.0)
    return jnp.where(n > 1e-9, jnp.arccos(cosang), jnp.pi)


@functools.partial(jax.jit, static_argnames=('n_hypotheses',))
def generalized_absolute_pose_ransac(
    key,
    points_w,
    origins,
    bearings,
    mask,
    n_hypotheses: int = 256,
    threshold_rad: float = 0.006,
):
    """GP3P RANSAC over a non-central rig (multi-keyframe 2D-3D
    verification, the full OpenGV-GP3P role of `Se3Solver.cpp:59-110`).

    Same contract as :func:`absolute_pose_ransac` plus per-ray `origins`;
    returns `T_rig_w` mapping world into the rig frame."""
    idx = ransac.sample_minimal_sets(key, mask, n_hypotheses, 3)

    def solve_one(ix):
        return gp3p_kneip(points_w[ix], origins[ix], bearings[ix],
                          n_grid=128, bisect_iters=32)

    T, valid = jax.vmap(solve_one)(idx)  # (H, 8, 7), (H, 8)
    T = T.reshape(-1, 7)
    valid = valid.reshape(-1)

    err = generalized_reprojection_angular_error(
        T, points_w, origins, bearings)  # (H*8, N)
    inl = (err < threshold_rad) & mask[None, :]
    counts = jnp.where(valid, inl.sum(axis=-1), -1)
    best = jnp.argmax(counts)
    return {
        "T_rig_w": T[best],
        "inliers": inl[best],
        "n_inliers": jnp.maximum(counts[best], 0),
    }


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
