"""Synthetic visual-inertial trajectory generator.

Produces analytically-consistent ground truth (poses, velocities, IMU
samples, landmarks, projected keypoints) so the whole back-end can be
integration-tested deterministically with no dataset download — the test
strategy SURVEY.md §4 calls for (the reference itself has no tests and
validates only via EuRoC end-to-end runs).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from covins_tpu.ops import imu as imu_mod
from covins_tpu.utils import geometry as geo


@dataclasses.dataclass
class SyntheticTrajectory:
    times: jax.Array  # (K,) keyframe timestamps
    poses: jax.Array  # (K, 7) T_w_s ground truth
    vels: jax.Array  # (K, 3) world-frame velocities
    imu_acc: jax.Array  # (K-1, S, 3) body-frame accel samples between KFs
    imu_gyro: jax.Array  # (K-1, S, 3)
    imu_dts: jax.Array  # (K-1, S)
    imu_mask: jax.Array  # (K-1, S)


def _position(t, radius=5.0, climb=0.15, freq=0.25):
    """Smooth figure-8-ish 3D curve."""
    w = 2.0 * jnp.pi * freq
    return jnp.stack(
        [
            radius * jnp.sin(w * t),
            radius * 0.6 * jnp.sin(2.0 * w * t),
            climb * t + 0.4 * jnp.sin(0.7 * w * t),
        ],
        axis=-1,
    )


def _orientation(t):
    """Smoothly varying body orientation (yaw sweep + gentle roll/pitch)."""
    w = 2.0 * jnp.pi * 0.25
    yaw = 0.6 * jnp.sin(0.5 * w * t)
    pitch = 0.15 * jnp.sin(0.9 * w * t + 0.3)
    roll = 0.1 * jnp.sin(1.3 * w * t + 1.1)
    qz = geo.quat_exp(jnp.stack([jnp.zeros_like(t), jnp.zeros_like(t), yaw], -1))
    qy = geo.quat_exp(jnp.stack([jnp.zeros_like(t), pitch, jnp.zeros_like(t)], -1))
    qx = geo.quat_exp(jnp.stack([roll, jnp.zeros_like(t), jnp.zeros_like(t)], -1))
    return geo.quat_multiply(geo.quat_multiply(qz, qy), qx)


def imu_from_trajectory(t):
    """Exact body-frame IMU measurements at scalar time t (via autodiff)."""
    vel = jax.jacfwd(_position)(t)
    acc_w = jax.jacfwd(jax.jacfwd(_position))(t)
    q = _orientation(t)
    # angular velocity in body frame: w = vee(R^T dR/dt)
    dR = jax.jacfwd(lambda s: geo.quat_to_matrix(_orientation(s)))(t)
    R = geo.quat_to_matrix(q)
    Wb = R.T @ dR
    gyro = jnp.stack([Wb[2, 1], Wb[0, 2], Wb[1, 0]])
    g_w = jnp.asarray([0.0, 0.0, -imu_mod.GRAVITY], t.dtype)
    acc_body = R.T @ (acc_w - g_w)  # accelerometer measures f = a - g
    return acc_body, gyro, vel, q


def generate(
    n_keyframes=20,
    kf_dt=0.5,
    imu_rate=200.0,
    t0=0.0,
    dtype=jnp.float64,
):
    """Build a SyntheticTrajectory with exact IMU between keyframes."""
    times = t0 + jnp.arange(n_keyframes, dtype=dtype) * kf_dt
    q = _orientation(times)
    p = _position(times)
    poses = geo.pose_from_qt(q, p)
    vels = jax.vmap(jax.jacfwd(_position))(times)

    samples_per_kf = int(round(kf_dt * imu_rate))
    dt_s = kf_dt / samples_per_kf
    # Sample at interval midpoints: the preintegrator treats each sample as
    # constant over its dt, so midpoint sampling makes the synthetic data
    # second-order consistent with the integrator.
    offs = (jnp.arange(samples_per_kf, dtype=dtype) + 0.5) * dt_s
    seg_t = times[:-1, None] + offs[None, :]  # (K-1, S)

    acc, gyro, _, _ = jax.vmap(jax.vmap(imu_from_trajectory))(seg_t)
    dts = jnp.full(seg_t.shape, dt_s, dtype)
    mask = jnp.ones(seg_t.shape, dtype)
    return SyntheticTrajectory(times, poses, vels, acc, gyro, dts, mask)


def generate_landmarks(key, n=500, radius=12.0, dtype=jnp.float64):
    """Landmarks scattered around the trajectory volume."""
    pts = jax.random.uniform(key, (n, 3), minval=-1.0, maxval=1.0)
    scale = jnp.asarray([radius, radius, radius * 0.4], dtype)
    return pts.astype(dtype) * scale + jnp.asarray([0.0, 0.0, 2.0], dtype)
