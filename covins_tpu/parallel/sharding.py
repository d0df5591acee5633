"""Device-mesh sharding for the back-end's two scaling axes.

The reference scales by threads on one CPU box (8 Ceres threads,
`optimization_be.cpp:259-260`; an 8-worker matcher pool,
`dense_matcher/ThreadPool.hpp:57-95`).  The TPU-native scaling story
(SURVEY.md §2.5/§5) replaces both:

* **retrieval axis** — the descriptor/BoW database grows with mission
  length; shard its rows over the mesh, query = local matvec + top-k,
  merged with one `all_gather` of per-shard top-k (k << rows).
* **solver axis** — GBA's observation COO and landmark blocks shard over
  the mesh (the Hll elimination is embarrassingly landmark-parallel);
  the reduced camera system's segment-sums become `psum`s via GSPMD.

Everything here uses `jax.sharding` + jit sharding constraints, so the
same code runs single-chip (trivial mesh) and on an N-chip slice over ICI;
`jax.distributed` extends the mesh across hosts (DCN) without code change.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), axis_names=(axis,))


def shard_rows(mesh: Mesh, x, axis: str = "data"):
    """Place `x` with its leading dim sharded over the mesh."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


# ---------------------------------------------------------------------------
# Sharded retrieval: row-sharded BoW database, shard-local top-k + merge
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("k",))
def sharded_topk_scores(db_bow, query, mask, k: int = 10):
    """Cosine retrieval over a (possibly row-sharded) database.

    With `db_bow` sharded over rows, XLA computes the matvec shard-locally
    and the `top_k` via a cross-shard reduction — the psum-merged top-k of
    SURVEY.md §5.  Returns (scores_k, idx_k).
    """
    scores = db_bow @ query
    scores = jnp.where(mask, scores, -1.0)
    return jax.lax.top_k(scores, k)


@partial(jax.jit, static_argnames=("k",))
def sharded_hamming_knn(db_desc_pm1, query_pm1, k: int = 2):
    """Brute-force descriptor k-NN against a row-sharded ±1-unpacked
    database: one MXU matmul per shard + global top-k merge.

    db_desc_pm1: (N, D) float/bf16 in {-1, +1}; query_pm1: (Q, D).
    Returns (dist_k (Q, k), idx_k (Q, k)) — exact Hamming distances.
    """
    nbits = db_desc_pm1.shape[-1]
    dots = jax.lax.dot_general(
        query_pm1, db_desc_pm1,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Q, N); hamming = (nbits - dot) / 2, so max dot = min distance
    top, idx = jax.lax.top_k(dots, k)
    return ((nbits - top) * 0.5).astype(jnp.int32), idx


# ---------------------------------------------------------------------------
# Sharded GBA: observation/landmark-parallel Schur GN step
# ---------------------------------------------------------------------------


def shard_gba_problem(mesh: Mesh, p, axis: str = "data"):
    """Lay out a GBAProblem for an N-device mesh: observation COO and
    landmark blocks sharded by row; keyframe states replicated (pose count
    << observation count, the reduced system is small and dense).

    Capacities must be divisible by the mesh size — pad with masked slots.
    """
    def rows(x):
        return shard_rows(mesh, x, axis)

    def repl(x):
        return replicate(mesh, x)

    return dataclasses.replace(
        p,
        obs_kf=rows(p.obs_kf), obs_lm=rows(p.obs_lm), obs_uv=rows(p.obs_uv),
        obs_w=rows(p.obs_w), obs_mask=rows(p.obs_mask),
        lms=rows(p.lms), lm_mask=rows(p.lm_mask),
        poses=repl(p.poses), vels=repl(p.vels), biases=repl(p.biases),
        kf_mask=repl(p.kf_mask), kf_fixed=repl(p.kf_fixed),
    )


def shard_pose_graph(mesh: Mesh, g, axis: str = "data", multiple: int = None):
    """Lay out a PoseGraph for an N-device mesh: EDGE arrays sharded by
    row (every GN iteration evaluates all edge residuals in one vmapped
    batch, so edges are the data axis), poses replicated (pose count <<
    edge count; the PCG mat-vec's segment-sum reduces across shards via a
    psum XLA inserts).  Pads the edge capacity to the mesh size."""
    import numpy as np

    n_dev = int(np.prod(mesh.devices.shape))
    mult = multiple or n_dev
    E = g.edge_i.shape[0]
    pad = (-E) % mult
    if pad:
        z6 = jnp.zeros((pad, 6, 6), g.edge_sqrt_info.dtype)
        ident = jnp.zeros((pad, 7), g.edge_T.dtype).at[:, 0].set(1.0)
        g = dataclasses.replace(
            g,
            edge_i=jnp.concatenate([g.edge_i, jnp.zeros(pad, g.edge_i.dtype)]),
            edge_j=jnp.concatenate([g.edge_j, jnp.zeros(pad, g.edge_j.dtype)]),
            edge_T=jnp.concatenate([g.edge_T, ident]),
            edge_sqrt_info=jnp.concatenate([g.edge_sqrt_info, z6]),
            edge_mask=jnp.concatenate([g.edge_mask, jnp.zeros(pad, bool)]),
            edge_is_loop=jnp.concatenate(
                [g.edge_is_loop, jnp.zeros(pad, bool)]),
        )

    def rows(x):
        return shard_rows(mesh, x, axis)

    def repl(x):
        return replicate(mesh, x)

    return dataclasses.replace(
        g,
        edge_i=rows(g.edge_i), edge_j=rows(g.edge_j), edge_T=rows(g.edge_T),
        edge_sqrt_info=rows(g.edge_sqrt_info), edge_mask=rows(g.edge_mask),
        edge_is_loop=rows(g.edge_is_loop),
        poses=repl(g.poses), pose_mask=repl(g.pose_mask), fixed=repl(g.fixed),
    )


def pad_to_multiple(p, multiple: int):
    """Pad a GBAProblem's observation and landmark axes (masked slots) so
    they shard evenly over `multiple` devices."""
    import covins_tpu.ops.gba as gba_mod  # noqa: F401 (type anchor)

    def pad1(x, n_pad, fill=0):
        if n_pad == 0:
            return x
        pad_shape = (n_pad,) + x.shape[1:]
        return jnp.concatenate([x, jnp.full(pad_shape, fill, x.dtype)])

    o = p.obs_kf.shape[0]
    m = p.lms.shape[0]
    o_pad = (-o) % multiple
    m_pad = (-m) % multiple
    return dataclasses.replace(
        p,
        obs_kf=pad1(p.obs_kf, o_pad), obs_lm=pad1(p.obs_lm, o_pad),
        obs_uv=pad1(p.obs_uv, o_pad), obs_w=pad1(p.obs_w, o_pad),
        obs_mask=pad1(p.obs_mask, o_pad, fill=False),
        lms=pad1(p.lms, m_pad), lm_mask=pad1(p.lm_mask, m_pad, fill=False),
    )


def gba_step_sharded(mesh: Mesh, p, state, lam, n_cg: int = 30,
                     visual_only: bool = False, cg_variant: str = "fused"):
    """One LM/Schur GBA step with mesh-sharded data (GSPMD inserts the
    collectives: the per-shard partial J^T r / J^T J segment-sums reduce
    with psum — the TPU analog of Ceres' 8-thread shared-memory solve)."""
    from covins_tpu.ops import gba as gba_mod

    with mesh:
        return gba_mod._gn_schur_step(p, state, lam, n_cg, visual_only,
                                      cg_variant=cg_variant)


def count_collectives(mesh: Mesh, p, state, lam, n_cg: int = 30,
                      cg_variant: str = "fused") -> dict:
    """Compile the sharded GBA step and count collective ops in the
    optimized HLO — the objective evidence for the fused-reduction CG's
    claim (SCALING r04 diagnosis: per-iteration all-reduces dominate
    multi-host GBA)."""
    import jax

    from covins_tpu.ops import gba as gba_mod

    def step(p_, st, lam_):
        return gba_mod._gn_schur_step(p_, st, lam_, n_cg, False,
                                      cg_variant=cg_variant)

    with mesh:
        lowered = jax.jit(
            step, static_argnames=()
        ).lower(p, state, lam)
        txt = lowered.compile().as_text()
    return {
        "all_reduce": txt.count("all-reduce("),
        "all_reduce_start": txt.count("all-reduce-start("),
        "all_gather": txt.count("all-gather("),
        "reduce_scatter": txt.count("reduce-scatter("),
        "collective_permute": txt.count("collective-permute("),
    }


def multihost_initialize(coordinator: str, num_processes: int, process_id: int):
    """Join a multi-host mesh over DCN (`jax.distributed`).  Single-host
    slices don't need this; call once per host before building meshes."""
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


# ---------------------------------------------------------------------------
# Multi-host (multi-process) array placement: `jax.device_put` only reaches
# addressable devices, so global arrays are assembled from per-process
# shards via `make_array_from_callback` (every process holds the same full
# host array — deterministic construction — and contributes its shards).
# ---------------------------------------------------------------------------


def shard_rows_global(mesh: Mesh, x, axis: str = "data"):
    """Row-shard `x` over a (possibly multi-process) mesh."""
    x = np.asarray(x)
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.make_array_from_callback(
        x.shape, NamedSharding(mesh, spec), lambda idx: x[idx]
    )


def replicate_global(mesh: Mesh, x):
    x = np.asarray(x)
    return jax.make_array_from_callback(
        x.shape, NamedSharding(mesh, P()), lambda idx: x[idx]
    )


def shard_gba_problem_global(mesh: Mesh, p, axis: str = "data"):
    """`shard_gba_problem` for multi-process meshes (same layout)."""
    def rows(x):
        return shard_rows_global(mesh, x, axis)

    def repl(x):
        return replicate_global(mesh, x)

    return dataclasses.replace(
        p,
        obs_kf=rows(p.obs_kf), obs_lm=rows(p.obs_lm), obs_uv=rows(p.obs_uv),
        obs_w=rows(p.obs_w), obs_mask=rows(p.obs_mask),
        lms=rows(p.lms), lm_mask=rows(p.lm_mask),
        poses=repl(p.poses), vels=repl(p.vels), biases=repl(p.biases),
        kf_mask=repl(p.kf_mask), kf_fixed=repl(p.kf_fixed),
    )
