"""Covisibility-graph and keyframe-redundancy ops over the observation COO.

TPU-native replacement for the reference's per-keyframe covisibility
bookkeeping (`KeyframeBase::UpdateCovisibilityConnections`,
`covins_backend/src/covins_backend/keyframe_be.cpp:559-608`: count shared
landmarks per keyframe pair, keep weights >= covis_thres) and the
redundancy scoring used by keyframe culling
(`Keyframe::ComputeRedundancyValue`, `keyframe_be.cpp:228-256` — the
Schmuck & Chli 3DV'19 scheme).

Instead of per-KF sorted neighbor lists updated under a lock, the
observation list (obs_kf, obs_lm) IS the covisibility structure; weights
are computed in batch with two segment-sums whenever needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_kf", "n_lm"))
def covis_weights_for(query_kf, obs_kf, obs_lm, obs_mask, n_kf: int, n_lm: int):
    """Covisibility weights of one keyframe against all others.

    Args:
      query_kf: () int32 keyframe row.
      obs_kf/obs_lm: (O,) observation COO.
      obs_mask: (O,) validity.
      n_kf, n_lm: row capacities (static).

    Returns (n_kf,) int32 shared-landmark counts (query row itself = 0).
    """
    seen = jnp.zeros((n_lm,), jnp.int32).at[obs_lm].max(
        ((obs_kf == query_kf) & obs_mask).astype(jnp.int32)
    )
    contrib = seen[obs_lm] * obs_mask.astype(jnp.int32)
    counts = jnp.zeros((n_kf,), jnp.int32).at[obs_kf].add(contrib)
    return counts.at[query_kf].set(0)


@partial(jax.jit, static_argnames=("n_kf", "n_lm"))
def covis_weights_batch(query_kfs, obs_kf, obs_lm, obs_mask, n_kf: int, n_lm: int):
    """(Q,) query rows -> (Q, n_kf) covisibility counts."""
    return jax.vmap(
        lambda q: covis_weights_for(q, obs_kf, obs_lm, obs_mask, n_kf, n_lm)
    )(query_kfs)


# Redundancy score table by landmark observation count
# ({2: 0, 3: 0.4, 4: 0.7, 5: 0.9, >=6: 1.0}, `keyframe_be.cpp:228-256`).
_RED_TABLE = jnp.asarray([0.0, 0.0, 0.0, 0.4, 0.7, 0.9, 1.0], jnp.float32)


@partial(jax.jit, static_argnames=("n_kf", "n_lm"))
def redundancy_values(obs_kf, obs_lm, obs_mask, n_kf: int, n_lm: int):
    """Per-keyframe redundancy value: mean over its observations of the
    score of each landmark's total observation count.

    Returns (n_kf,) float32 (0 for keyframes with no observations).
    """
    w = obs_mask.astype(jnp.int32)
    lm_counts = jnp.zeros((n_lm,), jnp.int32).at[obs_lm].add(w)
    score = _RED_TABLE[jnp.clip(lm_counts, 0, 6)]
    per_obs = score[obs_lm] * obs_mask
    tot = jnp.zeros((n_kf,), jnp.float32).at[obs_kf].add(per_obs)
    cnt = jnp.zeros((n_kf,), jnp.float32).at[obs_kf].add(obs_mask.astype(jnp.float32))
    return tot / jnp.maximum(cnt, 1.0)


@partial(jax.jit, static_argnames=("n_lm",))
def landmark_obs_counts(obs_lm, obs_mask, n_lm: int):
    return jnp.zeros((n_lm,), jnp.int32).at[obs_lm].add(obs_mask.astype(jnp.int32))
