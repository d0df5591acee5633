"""Relative-pose GN refinement tests."""

import jax
import jax.numpy as jnp

from covins_tpu.ops import relpose
from covins_tpu.utils import cameras as cam_mod
from covins_tpu.utils import geometry as geo


def _setup(key, n=60):
    k1, k2, k3 = jax.random.split(key, 3)
    cam = cam_mod.make_pinhole_radtan(458.0, 457.0, 367.0, 248.0, [0.0, 0.0, 0.0, 0.0])
    pts_w = jax.random.uniform(k1, (n, 3), jnp.float64, -3.0, 3.0) + jnp.asarray(
        [0.0, 0.0, 8.0]
    )
    w = jax.random.normal(k2, (3,), jnp.float64) * 0.15
    t = jax.random.normal(k3, (3,), jnp.float64) * 0.8
    T_12 = geo.pose_from_qt(geo.quat_exp(w), t)  # KF2 body in KF1 body
    p1 = pts_w  # treat world == KF1 body
    p2 = geo.pose_apply(geo.pose_inverse(T_12)[None], pts_w)
    return cam, T_12, p1, p2


def test_refine_from_perturbed_init():
    cam, T_true, p1, p2 = _setup(jax.random.PRNGKey(0))
    T_init = geo.pose_boxplus(T_true, jnp.asarray([0.03, -0.02, 0.04, 0.1, -0.15, 0.08]))
    mask = jnp.ones(p1.shape[0], bool)
    T_opt, inl, n = relpose.optimize_relative_pose(cam, cam, T_init, p1, p2, mask)
    assert float(jnp.linalg.norm(geo.pose_boxminus(T_opt, T_true))) < 1e-8
    assert int(n) == p1.shape[0]


def test_refine_prunes_outliers():
    key = jax.random.PRNGKey(2)
    cam, T_true, p1, p2 = _setup(key, n=80)
    # corrupt 15 of the p2 points (bad matches)
    bad = jax.random.normal(key, (15, 3), jnp.float64) * 2.0
    p2 = p2.at[:15].add(bad)
    T_init = geo.pose_boxplus(T_true, jnp.asarray([0.02, 0.01, -0.02, 0.05, 0.05, -0.04]))
    mask = jnp.ones(80, bool)
    T_opt, inl, n = relpose.optimize_relative_pose(
        cam, cam, T_init, p1, p2, mask, th_outlier=2.0
    )
    assert float(jnp.linalg.norm(geo.pose_boxminus(T_opt, T_true))) < 1e-6
    assert int(inl[:15].sum()) == 0
    assert int(n) >= 60


def test_jit_cache_reuse():
    cam, T_true, p1, p2 = _setup(jax.random.PRNGKey(4))
    mask = jnp.ones(p1.shape[0], bool)
    # two calls with same shapes should not retrace (weak check: both work)
    for _ in range(2):
        T_opt, _, n = relpose.optimize_relative_pose(cam, cam, T_true, p1, p2, mask)
        assert int(n) == p1.shape[0]
