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


def gp3p_kneip(points_w, origins, bearings):
    """Non-central (generalized) P3P: three rays with DISTINCT origins.

    The true minimal solver behind the reference's
    ``Se3Solver::projectiveAlignment`` (OpenGV GP3P, `Se3Solver.cpp:59-110`)
    for multi-camera / multi-keyframe rigs; the central
    :func:`p3p_grunert` is its ``origins = 0`` special case.

    Args:
      points_w: (3, 3) world points.
      origins: (3, 3) ray origins in the rig frame.
      bearings: (3, 3) unit ray directions in the rig frame.

    Returns ``(T_rig_w (8, 7), valid (8,))`` — up to 8 candidate poses
    (the Bezout bound of the three pairwise-distance quadrics); extraneous
    resultant roots are masked by the residual check.

    Method (TPU-safe, no Groebner basis / eigensolver / complex dtype):
    the pairwise-distance constraints ``|x_i - x_j| = |p_i - p_j|`` with
    ``x_i = v_i + lam_i f_i`` are quadrics E12, E13, E23 where E13 couples
    only (lam_1, lam_3) and E23 only (lam_2, lam_3).  Eliminate lam_1 by
    taking the product of E12 over the two conjugate roots of E13 (a
    sqrt-free polynomial identity), then eliminate lam_2 the same way
    against E23 — pure univariate polynomial arithmetic (convolutions) in
    lam_3.  Real roots come from `polynomial.solve_poly_real`; lam_1/2
    are recovered per root from the closed-form quadratics, picking the
    branch pair that satisfies E12.  Rigid alignment (Horn) of the
    recovered rig-frame triangle gives each pose.
    """
    dtype = points_w.dtype
    d2 = jnp.stack([
        jnp.sum((points_w[0] - points_w[1]) ** 2),
        jnp.sum((points_w[0] - points_w[2]) ** 2),
        jnp.sum((points_w[1] - points_w[2]) ** 2),
    ])  # d12^2, d13^2, d23^2

    # normalize the metric scale so lam is O(1) for the root finder
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

    # E13: lam1^2 + 2 b1(lam3) lam1 + c1(lam3) = 0   (coeffs lowest-first)
    b1 = jnp.stack([jnp.dot(f[0], w13), -c13])
    c1 = jnp.stack([jnp.dot(w13, w13) - d2[1], -2.0 * jnp.dot(f[2], w13),
                    jnp.ones((), dtype)])
    # E23: lam2^2 + 2 b2(lam3) lam2 + c2(lam3) = 0
    b2 = jnp.stack([jnp.dot(f[1], w23), -c23])
    c2 = jnp.stack([jnp.dot(w23, w23) - d2[2], -2.0 * jnp.dot(f[2], w23),
                    jnp.ones((), dtype)])

    conv = jnp.convolve

    # E12 as a monic quadratic in lam1 with lam2-polynomial coefficients:
    #   lam1^2 + 2 beta(lam2) lam1 + gamma(lam2),
    #   beta = f0.w12 - c12 lam2,  gamma = lam2^2 - 2 f1.w12 lam2 + k12
    # Eliminate lam1 via E12(l1+) * E12(l1-) with l1± the E13 roots:
    # E12(l1) == 2(beta - b1) l1 + (gamma - c1)  (mod E13), so the product
    # is 4(beta-b1)^2 c1 - 4 b1 (beta-b1)(gamma-c1) + (gamma-c1)^2 — a
    # bivariate polynomial R1[lam2-deg, lam3-deg] built by 2-D convolution.
    conv2 = jax.scipy.signal.convolve

    def biv(rows):
        """rows: list of lam3-coefficient arrays, index = lam2 degree."""
        width = max(r.shape[0] for r in rows)
        return jnp.stack([
            jnp.pad(r, (0, width - r.shape[0])) for r in rows
        ])

    k12 = jnp.dot(w12, w12) - d2[0]
    beta_m_b1 = biv([-b1 + jnp.pad(jnp.dot(f[0], w12)[None], (0, 1)),
                     jnp.stack([-c12, jnp.zeros((), dtype)])])  # (2, 2)
    gamma_m_c1 = biv([
        -c1 + jnp.pad(k12[None], (0, 2)),
        jnp.pad((-2.0 * jnp.dot(f[1], w12))[None], (0, 2)),
        jnp.pad(jnp.ones((1,), dtype), (0, 2)),
    ])  # (3, 3)
    t1 = 4.0 * conv2(conv2(beta_m_b1, beta_m_b1), c1[None, :])
    t2 = -4.0 * conv2(conv2(b1[None, :], beta_m_b1), gamma_m_c1)
    t3 = conv2(gamma_m_c1, gamma_m_c1)

    def pad_to(M, shape):
        return jnp.pad(M, ((0, shape[0] - M.shape[0]),
                           (0, shape[1] - M.shape[1])))

    H = max(t1.shape[0], t2.shape[0], t3.shape[0])
    W = max(t1.shape[1], t2.shape[1], t3.shape[1])
    R1 = pad_to(t1, (H, W)) + pad_to(t2, (H, W)) + pad_to(t3, (H, W))
    # R1: (5, W) — lam2-degree up to 4, lam3-coeff arrays of width W

    # Reduce R1 modulo E23 (lam2^2 = -2 b2 lam2 - c2): lam2^k == u_k lam2
    # + w_k with polynomial-in-lam3 pairs, then R1 == p lam2 + q.
    u_k = [jnp.zeros((1,), dtype), jnp.ones((1,), dtype)]
    w_k = [jnp.ones((1,), dtype), jnp.zeros((1,), dtype)]
    for _ in range(2, R1.shape[0]):
        u_n = _padd(w_k[-1], -2.0 * conv(b2, u_k[-1]))
        w_n = -conv(c2, u_k[-1])
        u_k.append(u_n)
        w_k.append(w_n)
    p = jnp.zeros((1,), dtype)
    q = jnp.zeros((1,), dtype)
    for k in range(R1.shape[0]):
        p = _padd(p, conv(R1[k], u_k[k]))
        q = _padd(q, conv(R1[k], w_k[k]))
    # Product over the two E23 roots: (p l2+ + q)(p l2- + q)
    #   = p^2 c2 - 2 b2 p q + q^2  -> the univariate resultant in lam3.
    F = _padd(_padd(conv(conv(p, p), c2), -2.0 * conv(conv(b2, p), q)),
              conv(q, q))
    # R1 has total degree 4 in (lam2, lam3), so the resultant's true degree
    # is 8; entries above that are cancellation noise from the convolution
    # chain — drop them before root finding (they would poison the
    # Fujiwara scaling with a near-zero leading coefficient).
    F = F[:9]

    roots, valid = poly.solve_poly_real(F[::-1])  # highest-first
    n_roots = roots.shape[0]

    def recover(lam3, ok):
        db1 = b1[0] + b1[1] * lam3
        dc1 = c1[0] + c1[1] * lam3 + c1[2] * lam3 * lam3
        db2 = b2[0] + b2[1] * lam3
        dc2 = c2[0] + c2[1] * lam3 + c2[2] * lam3 * lam3
        s1 = jnp.sqrt(jnp.maximum(db1 * db1 - dc1, 0.0))
        s2 = jnp.sqrt(jnp.maximum(db2 * db2 - dc2, 0.0))
        l1s = jnp.stack([-db1 + s1, -db1 - s1])
        l2s = jnp.stack([-db2 + s2, -db2 - s2])

        def e12(l1, l2):
            x1 = v[0] + l1 * f[0]
            x2 = v[1] + l2 * f[1]
            return jnp.abs(jnp.sum((x1 - x2) ** 2) - d2[0])

        r = jax.vmap(lambda l1: jax.vmap(lambda l2: e12(l1, l2))(l2s))(l1s)
        flat = jnp.argmin(r.reshape(-1))
        l1 = l1s[flat // 2]
        l2 = l2s[flat % 2]
        resid = r.reshape(-1)[flat]
        good = (ok & (resid < 1e-4) & (l1 > 0) & (l2 > 0) & (lam3 > 0)
                & (db1 * db1 - dc1 >= -1e-9) & (db2 * db2 - dc2 >= -1e-9))
        return jnp.stack([l1, l2, lam3]), good

    lam, good = jax.vmap(recover)(roots, valid)  # (R, 3), (R,)

    def align(lams):
        X = v + lams[:, None] * f          # rig-frame triangle (normalized)
        g7 = geo.umeyama_alignment(points_w, X * scale, with_scale=False)
        return g7[:7]

    T = jax.vmap(align)(lam)
    return T, good


def _padd(a, b):
    """Add two lowest-first coefficient arrays of different lengths."""
    n = max(a.shape[0], b.shape[0])
    return (jnp.pad(a, (0, n - a.shape[0]))
            + jnp.pad(b, (0, n - b.shape[0])))


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
        return gp3p_kneip(points_w[ix], origins[ix], bearings[ix])

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
