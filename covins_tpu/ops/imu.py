"""On-manifold IMU preintegration (Forster et al., TRO'16) as a jit'd scan.

TPU-native replacement for robopt_open's ``PreintegrationBase`` /
``PreintegrationFactor`` that the reference uses for keyframe IMU terms
(rebuild from raw samples: `covins_backend/src/covins_backend/keyframe_be.cpp:186-207`;
re-propagation at the current bias estimate inside GBA:
`optimization_be.cpp:132-143`).  Raw samples are kept in fixed-capacity
padded arrays with a validity mask so re-propagation is a single
`lax.scan` under jit and fusing two preintegrations (keyframe culling,
`keyframe_be.cpp:413-440`) is array concatenation.

Design notes (TPU-first):
* Propagation is a `lax.scan` with a midpoint-attitude scheme (2nd order).
* The bias Jacobians used for first-order bias correction are computed by
  `jax.jacfwd` THROUGH the scan — exact to machine precision against the
  integrator, instead of the hand-derived recursions C++ systems maintain.
* Covariance of [phi, dv, dp] is propagated in closed form inside the scan.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from covins_tpu.utils import geometry as geo

GRAVITY = 9.81


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "dq", "dv", "dp", "J_q_bg", "J_v_bg", "J_v_ba", "J_p_bg", "J_p_ba",
        "cov", "dt", "bg_ref", "ba_ref",
    ],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Preintegrated:
    dq: jax.Array  # (..., 4) delta rotation body_i -> body_j
    dv: jax.Array  # (..., 3)
    dp: jax.Array  # (..., 3)
    J_q_bg: jax.Array  # (..., 3, 3) d Log(dq_ref^-1 dq(bg)) / d bg
    J_v_bg: jax.Array  # (..., 3, 3)
    J_v_ba: jax.Array  # (..., 3, 3)
    J_p_bg: jax.Array  # (..., 3, 3)
    J_p_ba: jax.Array  # (..., 3, 3)
    cov: jax.Array  # (..., 9, 9) covariance of [phi, dv, dp]
    dt: jax.Array  # (...,) total integration time
    bg_ref: jax.Array  # (..., 3) gyro bias used for propagation
    ba_ref: jax.Array  # (..., 3) accel bias used for propagation


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["acc_noise", "gyro_noise", "acc_walk", "gyro_walk"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class ImuNoise:
    """Continuous-time noise densities (EuRoC-style units)."""

    acc_noise: jax.Array  # m/s^2 / sqrt(Hz)
    gyro_noise: jax.Array  # rad/s / sqrt(Hz)
    acc_walk: jax.Array  # m/s^3 / sqrt(Hz)
    gyro_walk: jax.Array  # rad/s^2 / sqrt(Hz)


def default_noise(dtype=jnp.float64):
    # EuRoC MAV ADIS16448 datasheet values used across the reference configs.
    return ImuNoise(
        acc_noise=jnp.asarray(2.0e-3, dtype),
        gyro_noise=jnp.asarray(1.7e-4, dtype),
        acc_walk=jnp.asarray(3.0e-3, dtype),
        gyro_walk=jnp.asarray(2.0e-5, dtype),
    )


def _propagate(acc, gyro, dts, mask, bg, ba, noise: ImuNoise):
    """Scan over samples. Returns (dq, dv, dp, cov, dt_total)."""
    dtype = acc.dtype
    I3 = jnp.eye(3, dtype=dtype)

    def step(carry, inp):
        dq, dv, dp, cov, T = carry
        a, w, dt, m = inp
        dt = dt * m  # masked samples integrate for 0 seconds (no-op)
        a_hat = a - ba
        w_hat = w - bg
        dtheta = w_hat * dt
        dq_inc = geo.quat_exp(dtheta)
        # Midpoint attitude for the specific-force rotation (2nd order).
        R = geo.quat_to_matrix(geo.quat_multiply(dq, geo.quat_exp(0.5 * dtheta)))
        Ra = R @ a_hat
        dp_new = dp + dv * dt + 0.5 * Ra * dt * dt
        dv_new = dv + Ra * dt
        dq_new = geo.quat_normalize(geo.quat_multiply(dq, dq_inc))

        # Covariance propagation for [phi, dv, dp].
        A = geo.so3_hat(Ra)
        dR_inc_T = jnp.swapaxes(geo.quat_to_matrix(dq_inc), -1, -2)
        Jr = _right_jacobian(dtheta)
        F = jnp.zeros((9, 9), dtype)
        F = F.at[0:3, 0:3].set(dR_inc_T)
        F = F.at[3:6, 0:3].set(-A * dt)
        F = F.at[3:6, 3:6].set(I3)
        F = F.at[6:9, 0:3].set(-0.5 * A * dt * dt)
        F = F.at[6:9, 3:6].set(I3 * dt)
        F = F.at[6:9, 6:9].set(I3)
        G = jnp.zeros((9, 6), dtype)
        G = G.at[0:3, 0:3].set(Jr * dt)
        G = G.at[3:6, 3:6].set(R * dt)
        G = G.at[6:9, 3:6].set(0.5 * R * dt * dt)
        dt_safe = jnp.maximum(dt, 1e-9)
        qdiag = jnp.concatenate(
            [
                jnp.full((3,), noise.gyro_noise**2 / dt_safe, dtype),
                jnp.full((3,), noise.acc_noise**2 / dt_safe, dtype),
            ]
        )
        cov_new = F @ cov @ F.T + (G * qdiag[None, :]) @ G.T
        cov_new = jnp.where(m > 0, cov_new, cov)
        return (dq_new, dv_new, dp_new, cov_new, T + dt), None

    zero3 = jnp.zeros(3, dtype)
    init = (
        geo.quat_identity(dtype), zero3, zero3,
        jnp.zeros((9, 9), dtype), jnp.zeros((), dtype),
    )
    out, _ = jax.lax.scan(step, init, (acc, gyro, dts, mask.astype(dtype)))
    return out


def preintegrate(acc, gyro, dts, mask, bg, ba, noise: ImuNoise):
    """Integrate raw IMU samples into a relative motion constraint.

    Args:
      acc:  (N, 3) body-frame accelerometer samples (includes gravity).
      gyro: (N, 3) body-frame gyroscope samples.
      dts:  (N,) per-sample integration intervals (seconds).
      mask: (N,) 1.0 for valid samples, 0.0 for padding.
      bg, ba: (3,) gyro / accel bias at which to propagate.
      noise: continuous-time noise densities.

    Returns: `Preintegrated` with exact (autodiff) bias Jacobians.
    """
    dq, dv, dp, cov, T = _propagate(acc, gyro, dts, mask, bg, ba, noise)
    dq_ref_conj = geo.quat_conjugate(dq)

    def deltas(b):
        dq2, dv2, dp2, _, _ = _propagate(acc, gyro, dts, mask, b[:3], b[3:], noise)
        phi = geo.quat_log(geo.quat_multiply(dq_ref_conj, dq2))
        return jnp.concatenate([phi, dv2, dp2])

    J = jax.jacfwd(deltas)(jnp.concatenate([bg, ba]))  # (9, 6)
    return Preintegrated(
        dq=dq, dv=dv, dp=dp,
        J_q_bg=J[0:3, 0:3],
        J_v_bg=J[3:6, 0:3], J_v_ba=J[3:6, 3:6],
        J_p_bg=J[6:9, 0:3], J_p_ba=J[6:9, 3:6],
        cov=cov, dt=T, bg_ref=bg, ba_ref=ba,
    )


def _right_jacobian(theta_vec):
    """Right Jacobian of SO(3)."""
    t = geo._safe_norm(theta_vec)[..., None]
    W = geo.so3_hat(theta_vec)
    W2 = W @ W
    I = jnp.eye(3, dtype=theta_vec.dtype)
    t2 = t * t
    small = t < 1e-5
    a = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / jnp.maximum(t2, 1e-24))
    b = jnp.where(
        small, 1.0 / 6.0 - t2 / 120.0,
        (t - jnp.sin(t)) / jnp.maximum(t2 * t, 1e-24),
    )
    return I - a * W + b * W2


def bias_corrected_delta(pre: Preintegrated, bg, ba):
    """First-order-corrected (dq, dv, dp) at new biases (bg, ba)."""
    dbg = bg - pre.bg_ref
    dba = ba - pre.ba_ref
    dq = geo.quat_multiply(pre.dq, geo.quat_exp(pre.J_q_bg @ dbg))
    dv = pre.dv + pre.J_v_bg @ dbg + pre.J_v_ba @ dba
    dp = pre.dp + pre.J_p_bg @ dbg + pre.J_p_ba @ dba
    return dq, dv, dp


def imu_residual(
    pre: Preintegrated,
    pose_i, vel_i, bg_i, ba_i,
    pose_j, vel_j,
    gravity=None,
):
    """9-vector residual [r_phi, r_v, r_p] of the preintegration factor.

    Convention matches the standard VI factor: poses are T_w_s (body to
    world), gravity points down in world (-z by default).
    """
    dtype = pose_i.dtype
    if gravity is None:
        gravity = jnp.asarray([0.0, 0.0, -GRAVITY], dtype)
    dq, dv, dp = bias_corrected_delta(pre, bg_i, ba_i)
    q_i, p_i = geo.pose_q(pose_i), geo.pose_t(pose_i)
    q_j, p_j = geo.pose_q(pose_j), geo.pose_t(pose_j)
    q_i_inv = geo.quat_conjugate(q_i)
    dt = pre.dt

    q_ij = geo.quat_multiply(q_i_inv, q_j)
    r_phi = geo.quat_log(geo.quat_multiply(geo.quat_conjugate(dq), q_ij))
    r_v = geo.quat_rotate(q_i_inv, vel_j - vel_i - gravity * dt) - dv
    r_p = (
        geo.quat_rotate(q_i_inv, p_j - p_i - vel_i * dt - 0.5 * gravity * dt * dt)
        - dp
    )
    return jnp.concatenate([r_phi, r_v, r_p], axis=-1)


def fuse_samples(acc1, gyro1, dts1, mask1, acc2, gyro2, dts2, mask2):
    """Concatenate two raw sample windows (keyframe culling merges the
    removed KF's preintegration into its successor,
    `keyframe_be.cpp:413-440`).  Caller re-propagates afterwards."""
    return (
        jnp.concatenate([acc1, acc2], axis=0),
        jnp.concatenate([gyro1, gyro2], axis=0),
        jnp.concatenate([dts1, dts2], axis=0),
        jnp.concatenate([mask1, mask2], axis=0),
    )
