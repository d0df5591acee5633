"""SO(3) / SE(3) / Sim(3) manifold operations, batched and jit-friendly.

TPU-native re-design of the quaternion/pose math used throughout the reference
(robopt_open quaternion ops + `covins_comm/.../utils_base.hpp:65-135` helpers
`R2ypr`, `normalizeAngle`).  Everything here is pure jnp, dtype-polymorphic,
and vectorized over arbitrary leading batch dimensions.

Conventions
-----------
* Quaternions are ``(..., 4)`` arrays in ``[w, x, y, z]`` (Hamilton) order.
* A pose is a single ``(..., 7)`` array ``[qw, qx, qy, qz, tx, ty, tz]``
  representing ``T_a_b`` (maps points expressed in frame ``b`` to frame ``a``),
  matching the reference's ``T_w_s`` convention
  (`covins_comm/include/covins/covins_base/typedefs_base.hpp:127-196`).
* A Sim(3) element is ``(..., 8)``: ``[qw, qx, qy, qz, tx, ty, tz, s]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternion ops ([w, x, y, z])
# ---------------------------------------------------------------------------


def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q):
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(n, jnp.asarray(1e-12, q.dtype))
    # Canonicalize sign (w >= 0) so compositions are deterministic.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0).astype(q.dtype)


def quat_multiply(q1, q2):
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_rotate(q, v):
    """Rotate vectors ``v`` (..., 3) by quaternions ``q`` (..., 4)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q):
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    r = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(R):
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4), branch-free.

    Uses the 4-candidate construction (Shepperd's method) with a jnp.where
    select so it vectorizes/jits cleanly.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-24))

    # candidate 0: trace-dominant
    s0 = safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], -1)
    # candidate 1: m00 dominant
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], -1)
    # candidate 2: m11 dominant
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], -1)
    # candidate 3: m22 dominant
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], -1)

    cond0 = tr > 0.0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None], q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return quat_normalize(q)


def _safe_norm(x, axis=-1, keepdims=True):
    """Norm whose derivative is finite at x == 0 (sqrt clamped away from 0,
    so autodiff through the zero-rotation point yields 0 instead of NaN)."""
    n2 = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(n2, jnp.asarray(1e-24, x.dtype)))


def quat_exp(w):
    """so(3) tangent (..., 3) -> unit quaternion (..., 4)."""
    theta = _safe_norm(w)
    half = 0.5 * theta
    small = theta < 1e-6
    sinc = jnp.where(small, 0.5 - theta**2 / 48.0, jnp.sin(half) / jnp.maximum(theta, 1e-24))
    qw = jnp.cos(half)
    return quat_normalize(jnp.concatenate([qw, sinc * w], axis=-1))


def quat_log(q):
    """Unit quaternion (..., 4) -> so(3) tangent (..., 3)."""
    q = quat_normalize(q)
    w = q[..., :1]
    v = q[..., 1:]
    vn = _safe_norm(v)
    theta = 2.0 * jnp.arctan2(vn, w)
    small = vn < 1e-9
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 1e-12), theta / jnp.maximum(vn, 1e-24))
    return scale * v


def so3_hat(w):
    """(..., 3) -> skew-symmetric (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    m = jnp.stack([z, -wz, wy, wz, z, -wx, -wy, wx, z], axis=-1)
    return m.reshape(w.shape[:-1] + (3, 3))


def so3_exp_matrix(w):
    """Rodrigues: (..., 3) -> (..., 3, 3)."""
    return quat_to_matrix(quat_exp(w))


def so3_log_matrix(R):
    return quat_log(matrix_to_quat(R))


def so3_left_jacobian(w):
    """Left Jacobian of SO(3): J_l(w), (..., 3, 3)."""
    theta = _safe_norm(w)[..., None]
    W = so3_hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    t2 = theta * theta
    small = theta < 1e-5
    a = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(t2, 1e-24))
    b = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (theta - jnp.sin(theta)) / jnp.maximum(t2 * theta, 1e-24))
    return I + a * W + b * W2


# ---------------------------------------------------------------------------
# SE(3) poses as (..., 7) arrays [qw qx qy qz tx ty tz]
# ---------------------------------------------------------------------------


def pose_from_qt(q, t):
    return jnp.concatenate([quat_normalize(q), t], axis=-1)


def pose_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0, 0, 0, 0, 0, 0], dtype=dtype)


def pose_q(p):
    return p[..., :4]


def pose_t(p):
    return p[..., 4:7]


def pose_from_matrix(T):
    return pose_from_qt(matrix_to_quat(T[..., :3, :3]), T[..., :3, 3])


def pose_to_matrix(p):
    R = quat_to_matrix(pose_q(p))
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], p.dtype), p.shape[:-1] + (4,)
    )
    top = jnp.concatenate([R, pose_t(p)[..., :, None]], axis=-1)
    return jnp.concatenate([top, bottom[..., None, :]], axis=-2)


def pose_compose(p1, p2):
    """T_a_c = T_a_b ∘ T_b_c."""
    q1, t1 = pose_q(p1), pose_t(p1)
    q2, t2 = pose_q(p2), pose_t(p2)
    return pose_from_qt(quat_multiply(q1, q2), quat_rotate(q1, t2) + t1)


def pose_inverse(p):
    qi = quat_conjugate(pose_q(p))
    return pose_from_qt(qi, -quat_rotate(qi, pose_t(p)))


def pose_apply(p, x):
    """Transform points ``x`` (..., 3) by pose ``p``."""
    return quat_rotate(pose_q(p), x) + pose_t(p)


def pose_relative(p_a, p_b):
    """T_a_b given T_w_a, T_w_b (both in the same world frame)."""
    return pose_compose(pose_inverse(p_a), p_b)


def se3_exp(xi):
    """se(3) tangent (..., 6) [rot, trans] -> pose (..., 7)."""
    w, v = xi[..., :3], xi[..., 3:]
    q = quat_exp(w)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(w), v)
    return pose_from_qt(q, t)


def se3_log(p):
    """pose (..., 7) -> se(3) tangent (..., 6) [rot, trans]."""
    w = quat_log(pose_q(p))
    W = so3_left_jacobian(w)
    from covins_tpu.ops.linalg import inv33
    Jl_inv = inv33(W)
    v = jnp.einsum("...ij,...j->...i", Jl_inv, pose_t(p))
    return jnp.concatenate([w, v], axis=-1)


def pose_boxplus(p, xi):
    """Right-perturbation retraction: p ⊞ xi = p ∘ Exp(xi)."""
    return pose_compose(p, se3_exp(xi))


def pose_boxminus(p1, p2):
    """Inverse retraction: Log(p2⁻¹ ∘ p1)."""
    return se3_log(pose_compose(pose_inverse(p2), p1))


# ---------------------------------------------------------------------------
# Sim(3) as (..., 8) arrays [qw qx qy qz tx ty tz s]
# ---------------------------------------------------------------------------


def sim3_from_pose_scale(p, s):
    return jnp.concatenate([p, jnp.asarray(s, p.dtype)[..., None]], axis=-1)


def sim3_apply(g, x):
    return g[..., 7:8] * quat_rotate(g[..., :4], x) + g[..., 4:7]


def sim3_compose(g1, g2):
    q = quat_multiply(g1[..., :4], g2[..., :4])
    t = g1[..., 7:8] * quat_rotate(g1[..., :4], g2[..., 4:7]) + g1[..., 4:7]
    s = g1[..., 7:8] * g2[..., 7:8]
    return jnp.concatenate([quat_normalize(q), t, s], axis=-1)


def sim3_inverse(g):
    qi = quat_conjugate(g[..., :4])
    si = 1.0 / g[..., 7:8]
    ti = -si * quat_rotate(qi, g[..., 4:7])
    return jnp.concatenate([qi, ti, si], axis=-1)


# ---------------------------------------------------------------------------
# Euler helpers (reference: Utils::R2ypr / normalizeAngle,
# covins_comm/include/covins/covins_base/utils_base.hpp:65-135)
# ---------------------------------------------------------------------------


def rotation_to_ypr(R):
    """Rotation matrix -> [yaw, pitch, roll] in radians (ZYX convention)."""
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    pitch = jnp.arctan2(
        -R[..., 2, 0], jnp.sqrt(R[..., 2, 1] ** 2 + R[..., 2, 2] ** 2)
    )
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return jnp.stack([yaw, pitch, roll], axis=-1)


def normalize_angle(a):
    """Wrap angle to (-pi, pi]."""
    return a - 2.0 * jnp.pi * jnp.floor((a + jnp.pi) / (2.0 * jnp.pi))


# ---------------------------------------------------------------------------
# Alignment (Umeyama / Horn) — used for Sim(3) map alignment and ATE eval
# ---------------------------------------------------------------------------


def umeyama_alignment(src, dst, weights=None, with_scale=True):
    """Least-squares similarity transform aligning ``src`` -> ``dst``.

    Horn's closed-form quaternion method (Horn 1987): the optimal rotation
    is the top eigenvector of the 4x4 symmetric N-matrix built from the
    weighted cross-correlation — solved by the unrolled Jacobi eigensolver,
    because this TPU backend executes no LAPACK-style custom calls (no SVD).
    Always yields a PROPER rotation (no reflection-sign bookkeeping).

    Args:
      src, dst: (N, 3) point sets.
      weights: optional (N,) nonnegative weights (masked points get 0).
      with_scale: solve Sim(3) if True else SE(3).

    Returns:
      sim3 (8,) g with ``dst ≈ sim3_apply(g, src)``.
    """
    if weights is None:
        weights = jnp.ones(src.shape[0], src.dtype)
    wsum = jnp.maximum(jnp.sum(weights), 1e-12)
    w = (weights / wsum)[:, None]
    mu_s = jnp.sum(w * src, axis=0)
    mu_d = jnp.sum(w * dst, axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    # Horn's S-matrix: S_ab = sum_i w_i xs_i[a] xd_i[b]  (src x dst)
    S = (w * xs).T @ xd  # 3x3
    Sxx, Sxy, Sxz = S[0, 0], S[0, 1], S[0, 2]
    Syx, Syy, Syz = S[1, 0], S[1, 1], S[1, 2]
    Szx, Szy, Szz = S[2, 0], S[2, 1], S[2, 2]
    N = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx]),
        jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz]),
        jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy]),
        jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz]),
    ])
    from covins_tpu.ops.linalg import jacobi_eigh
    evals, evecs = jacobi_eigh(N)  # ascending
    q = evecs[:, -1]  # (w, x, y, z), rotates src into dst
    q = q * jnp.where(q[0] >= 0, 1.0, -1.0)
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-30)
    R = quat_to_matrix(q)
    var_s = jnp.sum(w * xs * xs)
    # Horn: sum_i w_i xd_i . (R xs_i) equals the top eigenvalue of N.
    scale = jnp.where(
        with_scale, evals[-1] / jnp.maximum(var_s, 1e-12), 1.0
    ).astype(src.dtype)
    t = mu_d - scale * (R @ mu_s)
    return jnp.concatenate([q, t, scale[None]], axis=-1)


def ate_rmse(est, gt, weights=None, align_scale=True):
    """Absolute trajectory error RMSE after Sim(3) (or SE(3)) alignment.

    Mirrors the `evo_ape euroc ... -vas` protocol the reference documents
    (`/root/reference/docs/run_COVINS.md:106-115`).
    Returns (rmse, aligned_est).
    """
    g = umeyama_alignment(est, gt, weights, with_scale=align_scale)
    aligned = sim3_apply(g, est)
    err2 = jnp.sum((aligned - gt) ** 2, axis=-1)
    if weights is None:
        rmse = jnp.sqrt(jnp.mean(err2))
    else:
        rmse = jnp.sqrt(jnp.sum(err2 * weights) / jnp.maximum(jnp.sum(weights), 1e-12))
    return rmse, aligned
