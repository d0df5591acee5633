"""Vectorized camera models: {pinhole, unified-projection} x {none, radtan,
equidistant, fisheye-FOV}.

TPU-native replacement for the aslam_cv2 camera/distortion grid the reference
links against (used in `covins_backend/src/covins_backend/optimization_be.cpp:178-235`
for reprojection residuals and in `keyframe_be.cpp:42-226` for keypoint
undistortion / bearing computation).  All functions are pure jnp, batched over
leading dims, and differentiable (so reprojection Jacobians come from
`jax.jacfwd` or the analytic forms in `covins_tpu.ops.residuals`).

Model/parameter conventions
---------------------------
* ``intrinsics``: ``(5,)`` array ``[fx, fy, cx, cy, xi]``; ``xi`` is the
  unified-projection mirror parameter (ignored for pinhole).
* ``dist``: ``(4,)`` distortion parameters:
  - radtan:       ``[k1, k2, p1, p2]``
  - equidistant:  ``[k1, k2, k3, k4]``
  - fisheye(FOV): ``[w, 0, 0, 0]``
* Camera/distortion model codes mirror the reference enums
  (`typedefs_base.hpp:247-262`).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

# Camera model codes (reference: eCamModel, typedefs_base.hpp:255)
PINHOLE = 0
OMNI = 1  # unified projection / MEI

# Distortion model codes (reference: eDistortionModel, typedefs_base.hpp:247)
DIST_NONE = 0
RADTAN = 1
EQUIDISTANT = 2
FISHEYE = 3  # FOV model (aslam::FisheyeDistortion)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["intrinsics", "dist", "T_s_c"],
    meta_fields=["cam_model", "dist_model"],
)
@dataclasses.dataclass(frozen=True)
class Camera:
    """A single camera (per-agent calibration). Static model codes, dynamic
    parameters, and the IMU->camera extrinsic ``T_s_c`` as a (7,) pose."""

    intrinsics: jax.Array  # (5,) [fx, fy, cx, cy, xi]
    dist: jax.Array  # (4,)
    T_s_c: jax.Array  # (7,) pose
    cam_model: int = PINHOLE
    dist_model: int = RADTAN


def make_pinhole_radtan(fx, fy, cx, cy, dist, T_s_c=None, dtype=jnp.float64):
    import covins_tpu.utils.geometry as geo

    if T_s_c is None:
        T_s_c = geo.pose_identity(dtype)
    intr = jnp.asarray([fx, fy, cx, cy, 0.0], dtype)
    d = jnp.zeros(4, dtype).at[: len(dist)].set(jnp.asarray(dist, dtype))
    return Camera(intr, d, jnp.asarray(T_s_c, dtype), PINHOLE, RADTAN)


# ---------------------------------------------------------------------------
# Distortion in normalized image coordinates
# ---------------------------------------------------------------------------


def _distort_radtan(dist, xy):
    k1, k2, p1, p2 = dist[0], dist[1], dist[2], dist[3]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + 2.0 * p2 * x * y + p1 * (r2 + 2.0 * y * y)
    return jnp.stack([xd, yd], axis=-1)


def _distort_equidistant(dist, xy):
    k1, k2, k3, k4 = dist[0], dist[1], dist[2], dist[3]
    r = jnp.linalg.norm(xy, axis=-1, keepdims=True)
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1 + k1 * t2 + k2 * t2**2 + k3 * t2**3 + k4 * t2**4)
    scale = jnp.where(r > 1e-8, theta_d / jnp.maximum(r, 1e-12), 1.0)
    return xy * scale


def _distort_fisheye_fov(dist, xy):
    w = dist[0]
    r = jnp.linalg.norm(xy, axis=-1, keepdims=True)
    tan_half_w = jnp.tan(w / 2.0)
    rd = jnp.arctan(2.0 * r * tan_half_w) / jnp.maximum(w, 1e-12)
    scale = jnp.where(r > 1e-8, rd / jnp.maximum(r, 1e-12), 1.0)
    return xy * scale


def distort(dist_model: int, dist, xy):
    if dist_model == DIST_NONE:
        return xy
    if dist_model == RADTAN:
        return _distort_radtan(dist, xy)
    if dist_model == EQUIDISTANT:
        return _distort_equidistant(dist, xy)
    if dist_model == FISHEYE:
        return _distort_fisheye_fov(dist, xy)
    raise ValueError(f"unknown distortion model {dist_model}")


@partial(jax.jit, static_argnames=("dist_model", "iters"))
def undistort(dist_model: int, dist, xy_d, iters: int = 20):
    """Invert ``distort`` by fixed-iteration Gauss-Newton (jit-friendly)."""
    if dist_model == DIST_NONE:
        return xy_d

    def body(_, xy):
        # Newton on f(xy) = distort(xy) - xy_d with Jacobian from jacfwd.
        f = distort(dist_model, dist, xy) - xy_d
        J = jax.vmap(jax.jacfwd(lambda p: distort(dist_model, dist, p)))(
            xy.reshape(-1, 2)
        ).reshape(xy.shape[:-1] + (2, 2))
        # closed-form 2x2 solve (adjugate/det): TPU has no f64
        # LuDecomposition, and this fuses into the loop body anyway
        a, b = J[..., 0, 0], J[..., 0, 1]
        c, d = J[..., 1, 0], J[..., 1, 1]
        det = a * d - b * c
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        fx, fy = f[..., 0], f[..., 1]
        delta = jnp.stack(
            [(d * fx - b * fy) / det, (a * fy - c * fx) / det], axis=-1
        )
        return xy - delta

    return jax.lax.fori_loop(0, iters, body, xy_d)


# ---------------------------------------------------------------------------
# Projection: camera-frame 3D point -> pixel
# ---------------------------------------------------------------------------


@jax.jit
def project3(cam: Camera, p_c):
    """Project points ``p_c`` (..., 3) in the CAMERA frame to pixels.

    Returns (uv (..., 2), valid (...,) bool) — mirrors aslam's
    ``project3`` status used by the reference's matchers/residuals.
    """
    fx, fy, cx, cy, xi = (cam.intrinsics[i] for i in range(5))
    x, y, z = p_c[..., 0], p_c[..., 1], p_c[..., 2]
    if cam.cam_model == PINHOLE:
        valid = z > 1e-6
        zs = jnp.where(valid, z, 1.0)
        xy = jnp.stack([x / zs, y / zs], axis=-1)
    elif cam.cam_model == OMNI:
        d = jnp.sqrt(x * x + y * y + z * z)
        denom = z + xi * d
        valid = denom > 1e-6
        denom = jnp.where(valid, denom, 1.0)
        xy = jnp.stack([x / denom, y / denom], axis=-1)
    else:
        raise ValueError(f"unknown camera model {cam.cam_model}")
    xy = distort(cam.dist_model, cam.dist, xy)
    uv = jnp.stack(
        [fx * xy[..., 0] + cx, fy * xy[..., 1] + cy], axis=-1
    )
    return uv, valid


@jax.jit
def back_project3(cam: Camera, uv):
    """Pixel (..., 2) -> unit bearing vector (..., 3) in the camera frame.

    Mirrors the bearing computation in the reference keyframe ctor
    (`keyframe_be.cpp:209-225`).
    """
    fx, fy, cx, cy, xi = (cam.intrinsics[i] for i in range(5))
    xy_d = jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)
    xy = undistort(cam.dist_model, cam.dist, xy_d)
    if cam.cam_model == PINHOLE:
        b = jnp.concatenate([xy, jnp.ones(xy.shape[:-1] + (1,), xy.dtype)], -1)
    elif cam.cam_model == OMNI:
        # Invert unified projection: m = (mx, my), solve for z on unit sphere.
        r2 = jnp.sum(xy * xy, axis=-1, keepdims=True)
        beta = 1.0 + (1.0 - xi * xi) * r2
        eta = (xi + jnp.sqrt(jnp.maximum(beta, 0.0))) / (1.0 + r2)
        b = jnp.concatenate([eta * xy, eta[..., :] - xi * jnp.ones_like(r2)], -1)
    else:
        raise ValueError(f"unknown camera model {cam.cam_model}")
    return b / jnp.linalg.norm(b, axis=-1, keepdims=True)


@jax.jit
def undistort_keypoints(cam: Camera, uv):
    """Distorted pixel keypoints -> undistorted pixel keypoints under the
    same K (the reference's keypoint undistortion, `keyframe_be.cpp:101-140`)."""
    fx, fy, cx, cy, _ = (cam.intrinsics[i] for i in range(5))
    xy_d = jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)
    xy = undistort(cam.dist_model, cam.dist, xy_d)
    return jnp.stack([fx * xy[..., 0] + cx, fy * xy[..., 1] + cy], axis=-1)


@jax.jit
def project_world(cam: Camera, T_w_s, p_w):
    """World point -> pixel through body pose ``T_w_s`` and extrinsic
    ``T_s_c``: the full projection chain used by GBA residuals
    (`optimization_be.cpp:178-235`)."""
    import covins_tpu.utils.geometry as geo

    T_w_c = geo.pose_compose(T_w_s, cam.T_s_c)
    p_c = geo.pose_apply(geo.pose_inverse(T_w_c), p_w)
    return project3(cam, p_c)
