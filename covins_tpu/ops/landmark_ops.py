"""Batched landmark maintenance: representative descriptors and normals.

TPU-native replacement for the per-landmark loops the reference runs at
ingest (`Communicator::ProcessNewKeyframes` calls `ComputeDescriptor` +
`UpdateNormal` per landmark, `communicator_be.cpp:181-205` — the O(obs^2)
Hamming loop in `landmark_be.cpp:49-92` and the normal average in
`:185-220`).  Here whole cohorts of landmarks are processed in one batched
kernel: observations are padded to a fixed per-landmark width.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from covins_tpu.ops import descriptors as desc_ops


@jax.jit
def representative_descriptors(descs_u8, mask):
    """Min-median-Hamming representative descriptor per landmark
    (`Landmark::ComputeDescriptor`, `landmark_be.cpp:49-92`).

    Args:
      descs_u8: (L, P, B) uint8 — per landmark, P padded observation
        descriptors.
      mask: (L, P) validity.

    Returns (L, B) uint8 — the observation descriptor whose median distance
    to the other observations is smallest.
    """
    L, P, B = descs_u8.shape

    def one(d, m):
        dist = desc_ops.hamming_distance(d, d).astype(jnp.float32)  # (P, P)
        big = jnp.float32(1e9)
        dist = jnp.where(m[None, :], dist, big)
        # median over valid columns: sort row, take element at (n_valid-1)//2
        # (counting the self-distance 0, as the reference does by taking the
        # median of the full row including self)
        srt = jnp.sort(dist, axis=1)
        n_valid = jnp.sum(m).astype(jnp.int32)
        med_idx = jnp.maximum((n_valid - 1) // 2, 0)
        med = jnp.take_along_axis(srt, jnp.full((P, 1), med_idx), axis=1)[:, 0]
        med = jnp.where(m, med, big)
        return d[jnp.argmin(med)]

    return jax.vmap(one)(descs_u8, mask)


@partial(jax.jit, static_argnames=("scale_factor", "n_levels"))
def distance_invariance(lm_pos, obs_cam_centers, obs_octaves, mask,
                        scale_factor: float = 1.2, n_levels: int = 8):
    """Scale-invariance distance range per landmark
    (`Landmark::UpdateNormal`, `landmark_base.cpp:68-133`: the reference
    takes the ref-KF observation's distance d and octave o and sets
    max_dist = d * sf^o, min_dist = max_dist / sf^(n_levels-1)).

    Batched analog over the padded observation window: the per-observation
    estimates d_i * sf^oct_i are averaged (each observation predicts the
    same pyramid-level-0 distance up to noise), which is strictly more
    information than the reference's single-ref-KF estimate.

    Returns (L, 2): [min_dist, max_dist]; rows with no valid observation
    get (0, 0) = "unknown, do not gate".
    """
    d = jnp.linalg.norm(obs_cam_centers - lm_pos[:, None, :], axis=-1)
    est_max = d * jnp.power(scale_factor, obs_octaves)  # (L, P)
    w = mask.astype(d.dtype)
    n = jnp.sum(w, axis=1)
    max_dist = jnp.sum(est_max * w, axis=1) / jnp.maximum(n, 1.0)
    min_dist = max_dist / scale_factor ** (n_levels - 1)
    has = n > 0
    return jnp.where(
        has[:, None], jnp.stack([min_dist, max_dist], axis=-1), 0.0
    )


@jax.jit
def landmark_normals(lm_pos, obs_cam_centers, mask):
    """Mean viewing direction per landmark (`Landmark::UpdateNormal`,
    `landmark_be.cpp:185-220`).

    Args:
      lm_pos: (L, 3) world positions.
      obs_cam_centers: (L, P, 3) world positions of observing cameras.
      mask: (L, P).

    Returns (L, 3) unit normals (landmark -> cameras average direction).
    """
    d = obs_cam_centers - lm_pos[:, None, :]
    n = jnp.linalg.norm(d, axis=-1, keepdims=True)
    d = d / jnp.maximum(n, 1e-12)
    d = d * mask[..., None]
    mean = jnp.sum(d, axis=1) / jnp.maximum(
        jnp.sum(mask, axis=1)[:, None], 1.0
    )
    mn = jnp.linalg.norm(mean, axis=-1, keepdims=True)
    return mean / jnp.maximum(mn, 1e-12)
