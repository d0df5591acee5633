"""Factor residuals for the optimization stack.

TPU-native re-derivation of the robopt_open factor zoo the reference links
(`optimization_be.cpp:40-44`): ``GlobalEuclideanReprError``,
``RelativeEuclideanReprError`` (kNormal/kInverse), ``SixDofBetweenError``,
and the IMU ``PreintegrationFactor`` (the latter lives in
`covins_tpu.ops.imu.imu_residual`).  All residuals are pure functions of
(..., 7) poses / (..., 3) points, batched over leading dims; Jacobians come
from `jax.jacfwd` w.r.t. right-perturbation se(3) tangents so the manifold
structure matches Ceres' quaternion local parameterization.

Weighting conventions copied from the reference:
* reprojection sigma = (octave + 1) * 2 px (`optimization_be.cpp:178-235`);
* loop-edge sqrt-info: rotation x100 / translation x1e4 fixed weights
  (COVINS, `optimization_be.cpp:238-254`) or Cholesky of the inverse
  sampling covariance (COVINS-G, `optimization_be.cpp:889-944`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from covins_tpu.ops import linalg as la_small
from covins_tpu.utils import cameras as cam_mod
from covins_tpu.utils import geometry as geo


def reprojection_residual(cam: cam_mod.Camera, T_w_s, p_w, uv_obs):
    """Pixel residual of a world point observed by a keyframe.

    T_w_s: (..., 7) body-to-world pose; p_w: (..., 3); uv_obs: (..., 2).
    Returns ((..., 2) residual, (...,) valid).
    """
    T_s_w = geo.pose_inverse(T_w_s)
    p_s = geo.pose_apply(T_s_w, p_w)
    p_c = geo.pose_apply(geo.pose_inverse(cam.T_s_c), p_s)
    uv, valid = cam_mod.project3(cam, p_c)
    return uv - uv_obs, valid


def reprojection_weight(octave, base_sigma: float = 2.0):
    """1/sigma with sigma = (octave + 1) * 2 px (`optimization_be.cpp:206`)."""
    return 1.0 / (base_sigma * (octave.astype(jnp.float32) + 1.0))


def six_dof_between_residual(T_w_i, T_w_j, T_ij_meas):
    """6-vector residual Log(T_ij_meas^-1 * (T_w_i^-1 * T_w_j)).

    The `SixDofBetweenError` semantics used for loop edges and PGO
    successor/neighbor edges (`optimization_be.cpp:238-254,946-1021`).
    """
    T_ij = geo.pose_compose(geo.pose_inverse(T_w_i), T_w_j)
    return geo.pose_boxminus(T_ij, T_ij_meas)


def loop_sqrt_info_fixed(dtype=jnp.float64):
    """COVINS fixed loop-edge weights: rot x100, trans x1e4
    (`optimization_be.cpp:247-249`).  Order [rot(3), trans(3)]."""
    return jnp.diag(jnp.asarray([100.0] * 3 + [1e4] * 3, dtype))


def sqrt_info_from_covariance(cov, jitter: float = 1e-12):
    """Upper-triangular sqrt-information from a covariance (COVINS-G loop
    edges carry the sampling covariance, `optimization_be.cpp:889-944`)."""
    info = la_small.inv_psd_small(cov + jitter * jnp.eye(cov.shape[-1], dtype=cov.dtype))
    return la_small.cholesky_small(info).swapaxes(-1, -2)  # upper: L^T


def cauchy_weight(r2, scale: float):
    """IRLS weight sqrt(rho'(r^2)) for the Cauchy robust loss used on PGO
    loop edges (`optimization_be.cpp:905-914`)."""
    return 1.0 / jnp.sqrt(1.0 + r2 / (scale * scale))


def relative_reprojection_residual(
    cam1: cam_mod.Camera, cam2: cam_mod.Camera, T_12, p1, p2
):
    """Paired residual of `OptimizeRelativePose`'s cost
    (`optimization_be.cpp:620-831`): landmark p2 (in KF2 body frame)
    projected into KF1 through T_12 (kNormal), and p1 projected into KF2
    through T_12^-1 (kInverse).  Residuals are computed against each
    camera's observation of its OWN landmark, i.e. the projections of p1 in
    cam1 / p2 in cam2 act as the measurements.

    Returns ((..., 4) residual [r_normal(2), r_inverse(2)], (...,) valid).
    """
    # Measurements: where each KF actually saw its own point.
    uv1_meas, v1 = cam_mod.project3(cam1, geo.pose_apply(geo.pose_inverse(cam1.T_s_c), p1))
    uv2_meas, v2 = cam_mod.project3(cam2, geo.pose_apply(geo.pose_inverse(cam2.T_s_c), p2))
    # Predictions through the relative pose.
    p2_in_1 = geo.pose_apply(T_12, p2)
    uv1_pred, v3 = cam_mod.project3(
        cam1, geo.pose_apply(geo.pose_inverse(cam1.T_s_c), p2_in_1)
    )
    p1_in_2 = geo.pose_apply(geo.pose_inverse(T_12), p1)
    uv2_pred, v4 = cam_mod.project3(
        cam2, geo.pose_apply(geo.pose_inverse(cam2.T_s_c), p1_in_2)
    )
    r = jnp.concatenate([uv1_pred - uv1_meas, uv2_pred - uv2_meas], axis=-1)
    return r, v1 & v2 & v3 & v4
