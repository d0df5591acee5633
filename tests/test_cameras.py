import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covins_tpu.utils import cameras as cam_mod
from covins_tpu.utils import geometry as geo
from covins_tpu.utils.cameras import (
    DIST_NONE,
    EQUIDISTANT,
    FISHEYE,
    OMNI,
    PINHOLE,
    RADTAN,
    Camera,
)

# EuRoC cam0 calibration (pinhole radtan)
EUROC = dict(
    fx=458.654, fy=457.296, cx=367.215, cy=248.375,
    dist=[-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05],
)


def euroc_cam(dtype=jnp.float64):
    return cam_mod.make_pinhole_radtan(**EUROC, dtype=dtype)


def make_cam(cm, dm, dtype=jnp.float64):
    dist = {
        DIST_NONE: [0.0, 0, 0, 0],
        RADTAN: [-0.28, 0.07, 1e-4, 2e-5],
        EQUIDISTANT: [-0.01, 0.02, -0.005, 0.001],
        FISHEYE: [0.9, 0, 0, 0],
    }[dm]
    intr = jnp.asarray([460.0, 455.0, 360.0, 240.0, 0.8], dtype)
    return Camera(intr, jnp.asarray(dist, dtype), geo.pose_identity(dtype), cm, dm)


ALL_MODELS = [
    (PINHOLE, DIST_NONE), (PINHOLE, RADTAN), (PINHOLE, EQUIDISTANT),
    (PINHOLE, FISHEYE), (OMNI, DIST_NONE), (OMNI, RADTAN),
    (OMNI, EQUIDISTANT), (OMNI, FISHEYE),
]


@pytest.mark.parametrize("cm,dm", ALL_MODELS)
def test_project_backproject_roundtrip(cm, dm):
    """back_project3(project3(p)) must return the bearing of p."""
    cam = make_cam(cm, dm)
    key = jax.random.PRNGKey(cm * 10 + dm)
    # points in a forward cone (moderate FOV so distortion stays invertible)
    d = jax.random.uniform(key, (200, 2), minval=-0.35, maxval=0.35)
    p = jnp.concatenate([d, jnp.ones((200, 1))], -1) * jax.random.uniform(
        jax.random.PRNGKey(1), (200, 1), minval=0.5, maxval=10.0
    )
    uv, valid = cam_mod.project3(cam, p)
    assert bool(jnp.all(valid))
    b = cam_mod.back_project3(cam, uv)
    b_true = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    np.testing.assert_allclose(b, b_true, atol=1e-7)


def test_euroc_projection_center():
    cam = euroc_cam()
    uv, valid = cam_mod.project3(cam, jnp.array([0.0, 0.0, 5.0]))
    assert bool(valid)
    np.testing.assert_allclose(uv, [EUROC["cx"], EUROC["cy"]], atol=1e-9)


def test_behind_camera_invalid():
    cam = euroc_cam()
    _, valid = cam_mod.project3(cam, jnp.array([0.1, 0.2, -1.0]))
    assert not bool(valid)


def test_undistort_keypoints_matches_pinhole_reprojection():
    """Undistorted keypoints must equal the ideal-pinhole projection of the
    same bearing (the property the reference keyframe ctor relies on)."""
    cam = euroc_cam()
    key = jax.random.PRNGKey(3)
    d = jax.random.uniform(key, (100, 2), minval=-0.4, maxval=0.4)
    p = jnp.concatenate([d, jnp.ones((100, 1))], -1)
    uv_dist, _ = cam_mod.project3(cam, p)
    uv_undist = cam_mod.undistort_keypoints(cam, uv_dist)
    ideal = Camera(cam.intrinsics, jnp.zeros(4), cam.T_s_c, PINHOLE, DIST_NONE)
    uv_ideal, _ = cam_mod.project3(ideal, p)
    np.testing.assert_allclose(uv_undist, uv_ideal, atol=1e-7)


def test_project_world_chain():
    cam = cam_mod.make_pinhole_radtan(
        **EUROC, T_s_c=geo.pose_from_qt(
            geo.quat_exp(jnp.array([0.02, -0.01, 0.03])), jnp.array([0.1, 0.0, 0.05])
        )
    )
    T_w_s = geo.pose_from_qt(
        geo.quat_exp(jnp.array([0.1, 0.2, -0.1])), jnp.array([1.0, 2.0, 3.0])
    )
    p_c = jnp.array([0.2, -0.1, 4.0])
    # place the world point so its camera-frame coords are p_c
    T_w_c = geo.pose_compose(T_w_s, cam.T_s_c)
    p_w = geo.pose_apply(T_w_c, p_c)
    uv, valid = cam_mod.project_world(cam, T_w_s, p_w)
    uv_direct, _ = cam_mod.project3(cam, p_c)
    assert bool(valid)
    np.testing.assert_allclose(uv, uv_direct, atol=1e-9)


def test_projection_differentiable():
    cam = euroc_cam()
    grad = jax.jacfwd(lambda p: cam_mod.project3(cam, p)[0])(
        jnp.array([0.1, 0.2, 3.0])
    )
    assert grad.shape == (2, 3)
    assert bool(jnp.all(jnp.isfinite(grad)))
    # numeric check of d(u)/d(z): moving away shrinks |u - cx|
    assert float(grad[0, 2]) < 0  # u > cx here, so du/dz < 0


def test_jit_and_vmap():
    cam = euroc_cam()
    pts = jax.random.uniform(jax.random.PRNGKey(5), (64, 3), minval=0.1, maxval=2.0)
    f = jax.jit(lambda p: cam_mod.project3(cam, p))
    uv1, _ = f(pts)
    uv2, _ = cam_mod.project3(cam, pts)
    np.testing.assert_allclose(uv1, uv2, atol=1e-12)
