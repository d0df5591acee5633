"""Pose-graph optimization tests: drift correction with loop closures."""

import jax
import jax.numpy as jnp
import numpy as np

from covins_tpu.ops import pgo
from covins_tpu.utils import geometry as geo, synthetic


def _drifted_graph(n=40, drift_rot=0.002, drift_trans=0.01, seed=0):
    """Ground-truth trajectory; odometry edges are EXACT, initial poses
    accumulate drift; one loop edge ties the end back to ground truth."""
    traj = synthetic.generate(n_keyframes=n, kf_dt=0.4)
    gt = traj.poses

    # exact relative measurements (successor edges, the VIO-odometry edges)
    T_rel = jax.vmap(geo.pose_relative)(gt[:-1], gt[1:])

    # drifted initial estimate: integrate odometry with small per-step error
    key = jax.random.PRNGKey(seed)
    noise = jax.random.normal(key, (n - 1, 6), jnp.float64)
    noise = noise * jnp.asarray([drift_rot] * 3 + [drift_trans] * 3)
    est = [gt[0]]
    for k in range(n - 1):
        est.append(geo.pose_compose(est[-1], geo.pose_boxplus(T_rel[k], noise[k])))
    est = jnp.stack(est)

    # edges: successors + one loop (last KF vs KF0 with exact measurement)
    ei = jnp.arange(n - 1, dtype=jnp.int32)
    ej = ei + 1
    loop_i = jnp.asarray([0], jnp.int32)
    loop_j = jnp.asarray([n - 1], jnp.int32)
    loop_T = geo.pose_relative(gt[0], gt[n - 1])[None]

    edge_i = jnp.concatenate([ei, loop_i])
    edge_j = jnp.concatenate([ej, loop_j])
    edge_T = jnp.concatenate([T_rel, loop_T])
    sqrt_info = pgo.make_sqrt_info(1.0, 1.0, n)  # odometry weight
    loop_info = pgo.make_sqrt_info(100.0, 100.0, 1)
    edge_sqrt_info = jnp.concatenate([sqrt_info[: n - 1], loop_info])
    is_loop = jnp.concatenate([jnp.zeros(n - 1, bool), jnp.ones(1, bool)])

    g = pgo.PoseGraph(
        poses=est,
        pose_mask=jnp.ones(n, bool),
        fixed=jnp.zeros(n, bool).at[0].set(True),
        edge_i=edge_i,
        edge_j=edge_j,
        edge_T=edge_T,
        edge_sqrt_info=edge_sqrt_info,
        edge_mask=jnp.ones(n, bool),
        edge_is_loop=is_loop,
    )
    return g, gt, est


def _ate(poses, gt):
    rmse, _ = geo.ate_rmse(poses[:, 4:7], gt[:, 4:7], align_scale=False)
    return float(rmse)


def test_pgo_reduces_drift():
    g, gt, est = _drifted_graph(n=40)
    ate_before = _ate(est, gt)
    poses, cost = pgo.optimize_pose_graph(g, n_gn=10, n_cg=120)
    ate_after = _ate(poses, gt)
    assert ate_before > 0.01  # drift is visible
    assert ate_after < 0.35 * ate_before, (ate_before, ate_after)
    assert float(cost) >= 0.0


def test_pgo_exact_loop_consistency():
    """With exact odometry edges and no noise, PGO must keep poses at GT."""
    g, gt, est = _drifted_graph(n=25, drift_rot=0.0, drift_trans=0.0)
    poses, cost = pgo.optimize_pose_graph(g, n_gn=4, n_cg=60)
    err = np.asarray(jax.vmap(geo.pose_boxminus)(poses, gt))
    assert np.abs(err).max() < 1e-8
    assert float(cost) < 1e-12


def test_pgo_fixed_pose_respected():
    g, gt, est = _drifted_graph(n=30)
    poses, _ = pgo.optimize_pose_graph(g, n_gn=6, n_cg=80)
    np.testing.assert_allclose(
        np.asarray(poses[0]), np.asarray(g.poses[0]), atol=1e-12
    )


def test_pgo_masked_edges_ignored():
    g, gt, est = _drifted_graph(n=20)
    # disable the loop edge -> expect no improvement vs odometry-only
    mask = g.edge_mask.at[-1].set(False)
    g2 = pgo.PoseGraph(**{**{f.name: getattr(g, f.name) for f in
                             __import__("dataclasses").fields(g)},
                          "edge_mask": mask})
    poses, _ = pgo.optimize_pose_graph(g2, n_gn=6, n_cg=80)
    # without the loop edge, the chain converges to the odometry exactly
    # (n-1 free poses, n-1 edge constraints): relative poses == measurements
    rel = jax.vmap(geo.pose_relative)(poses[:-1], poses[1:])
    d = np.asarray(jax.vmap(geo.pose_boxminus)(rel, g.edge_T[:-1]))
    assert np.abs(d).max() < 1e-5
