"""Shared helpers for the vmapped fixed-iteration RANSAC harnesses.

The reference runs OpenGV's sequential adaptive RANSAC loops
(`Se3Solver.cpp:59-110`, `RelNonCentralPosSolver.cpp:146-176,343-377`); on
TPU every hypothesis is solved and scored in one batched dispatch, so the
samplers here draw ALL minimal sets at once.  Sampling is **without
replacement within each set** — a repeated index makes a minimal linear
system rank-deficient, which for nullspace solvers (17-pt) yields a
spurious solution rather than a harmlessly-invalid one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_minimal_sets(key, mask, n_sets: int, set_size: int):
    """Draw `n_sets` index sets of `set_size` distinct valid indices.

    Gumbel top-k trick: one (n_sets, N) uniform draw, invalid entries get
    -inf, per-row top-k = a without-replacement sample.  O(n_sets * N) and
    fully batched (no per-set choice() loop).
    """
    n = mask.shape[0]
    g = jax.random.gumbel(key, (n_sets, n))
    g = jnp.where(mask[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, set_size)
    return idx


def best_hypothesis(counts, valid=None):
    """Index of the highest-inlier-count valid hypothesis."""
    if valid is not None:
        counts = jnp.where(valid, counts, -1)
    return jnp.argmax(counts)
