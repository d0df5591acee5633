"""Batched project-and-match: the TPU-native FeatureMatcher.

Replaces the reference's per-point projection matchers
(`covins_backend/src/covins_backend/feature_matcher_be.cpp`):

* `SearchByProjection` (`:168-291`): project candidate landmarks into a
  keyframe, gate by depth / image bounds / viewing angle / pixel radius,
  match each landmark to the best free feature by descriptor distance.
* `SearchBySE3` (`:293-501`): mutual projection matching of two keyframes'
  landmark sets through an estimated relative transform.
* `Fuse` (`:66-166`): the matching stage of landmark fusion (the fuse
  bookkeeping itself lives in `map_store.Map.fuse_landmark`).

Instead of looping landmarks and querying a 48x64 feature grid per point,
everything is one fixed-shape kernel: project all L landmarks at once,
build the (L, F) pixel-distance and descriptor-distance matrices, mask by
the gates, take a row argmin, and resolve feature conflicts with a
scatter-min.  XLA fuses the gates into the distance matmul; the (L, F)
products are MXU work.

Distance-invariance gating (reference parity): each landmark carries a
[min, max] valid observation-distance range (`landmark_base.cpp:68-133`),
candidates outside [0.8 min, 1.2 max] are rejected, and the predicted
pyramid level log_sf(max_dist / dist) gates candidate features to
octave +/- 1 of the prediction (`feature_matcher_be.cpp:66-166`).  The
radius additionally scales with the feature's octave.  Landmarks whose
range is unknown ((0, 0)) skip the gate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from covins_tpu.ops import descriptors as d_ops
from covins_tpu.utils import cameras as cam_mod
from covins_tpu.utils import geometry as geo


@partial(jax.jit, static_argnames=("check_view_angle", "metric"))
def _project_match_impl(
    cam: cam_mod.Camera,
    T_cw,            # (7,) world -> camera
    p_w,             # (L, 3) landmark world positions
    lm_desc_pm1,     # (L, D) landmark descriptors, ±1-unpacked (or raw float)
    lm_normal,       # (L, 3) landmark viewing normals
    lm_mask,         # (L,) bool
    lm_dist_rng,     # (L, 2) [min, max] distance invariance; (0,0) = unknown
    kp_uv,           # (F, 2) keypoint pixel coords (undistorted)
    kp_desc_pm1,     # (F, D) feature descriptors, same unpacking
    kp_octave,       # (F,) float octave of each feature
    kp_free,         # (F,) bool: feature is available for matching
    radius_px: float,
    max_dist: float,
    img_w: float,
    img_h: float,
    check_view_angle: bool = True,
    metric: str = "hamming",
    scale_factor: float = 2.0,
):
    L = p_w.shape[0]
    F = kp_uv.shape[0]

    p_c = geo.pose_apply(T_cw[None], p_w)  # (L, 3)
    uv, proj_ok = cam_mod.project3(cam, p_c)  # (L, 2), (L,)
    depth_ok = p_c[:, 2] > 0.0
    in_img = (
        (uv[:, 0] >= 0.0) & (uv[:, 0] < img_w)
        & (uv[:, 1] >= 0.0) & (uv[:, 1] < img_h)
    )
    lm_ok = lm_mask & depth_ok & proj_ok & in_img

    O_w = geo.pose_t(geo.pose_inverse(T_cw))
    PO = p_w - O_w[None, :]
    dist3 = jnp.linalg.norm(PO, axis=-1)  # (L,) camera-center distance

    if check_view_angle:
        # viewing direction within 60 deg of the landmark normal
        # (`feature_matcher_be.cpp:222-226`: PO . Pn >= 0.5 * dist)
        cosv = jnp.sum(PO * lm_normal, axis=-1)
        has_normal = jnp.linalg.norm(lm_normal, axis=-1) > 1e-6
        lm_ok = lm_ok & (~has_normal | (cosv >= 0.5 * dist3))

    # distance-invariance gate (`feature_matcher_be.cpp:216-220`:
    # reject dist outside [0.8 min, 1.2 max]); (0, 0) range = unknown
    has_rng = lm_dist_rng[:, 1] > 0.0
    in_rng = (
        (dist3 >= 0.8 * lm_dist_rng[:, 0])
        & (dist3 <= 1.2 * lm_dist_rng[:, 1])
    )
    lm_ok = lm_ok & (~has_rng | in_rng)

    # predicted pyramid level (`landmark_base.cpp:107-133` PredictScale:
    # level = ceil(log(max_dist / dist) / log(sf))), candidate features
    # gated to +/- 1 of it (`feature_matcher_be.cpp:231-238`)
    pred = jnp.ceil(
        jnp.log(jnp.maximum(lm_dist_rng[:, 1], 1e-9)
                / jnp.maximum(dist3, 1e-9))
        / jnp.log(jnp.asarray(1.2, dist3.dtype))
    )
    pred = jnp.clip(pred, 0.0, 16.0)
    oct_ok = jnp.abs(kp_octave[None, :] - pred[:, None]) <= 1.0  # (L, F)
    oct_ok = oct_ok | ~has_rng[:, None]

    # pixel-radius gate: (L, F)
    d_px = jnp.linalg.norm(uv[:, None, :] - kp_uv[None, :, :], axis=-1)
    radius = radius_px * jnp.power(scale_factor, kp_octave)  # (F,)
    in_radius = (d_px <= radius[None, :]) & oct_ok

    # descriptor distances (MXU matmul over the unpacked descriptors)
    if metric == "hamming":
        # pm1-unpacked: hamming = (D - dot) / 2
        desc_dist = lm_desc_pm1.shape[-1] / 2.0 - 0.5 * (lm_desc_pm1 @ kp_desc_pm1.T)
    else:
        desc_dist = jnp.sqrt(
            jnp.maximum(d_ops.l2_distance_sq(lm_desc_pm1, kp_desc_pm1), 0.0)
        )

    BIG = jnp.asarray(1e9, desc_dist.dtype)
    gated = jnp.where(
        in_radius & lm_ok[:, None] & kp_free[None, :], desc_dist, BIG
    )
    best_f = jnp.argmin(gated, axis=1)               # (L,)
    best_d = jnp.take_along_axis(gated, best_f[:, None], axis=1)[:, 0]
    valid = best_d <= max_dist

    # conflict resolution: if several landmarks picked the same feature,
    # keep the best distance (ties -> lowest landmark row)
    score = best_d + jnp.arange(L, dtype=best_d.dtype) * 1e-7
    score = jnp.where(valid, score, BIG)
    col_min = jnp.full((F,), BIG, best_d.dtype).at[best_f].min(score)
    winner = valid & (score <= col_min[best_f])

    match_feat = jnp.where(winner, best_f, -1)
    return match_feat, jnp.where(winner, best_d, BIG)


def _unpack(desc):
    """±1-unpack uint8 descriptors so Hamming becomes a matmul; float
    descriptors (SIFT) pass through for L2."""
    if desc.dtype == jnp.uint8:
        return d_ops.unpack_to_pm1(desc)
    return desc.astype(jnp.float64)


def project_match(cam, T_cw, p_w, lm_desc, lm_normal, lm_mask,
                  kp_uv, kp_desc, kp_octave, kp_free,
                  radius_px, max_dist, img_w, img_h,
                  check_view_angle=True, lm_dist_rng=None):
    """SearchByProjection: match landmarks to a keyframe's free features.

    Returns (match_feat (L,) int32 with -1 = no match, best_dist (L,)).
    """
    p_w = jnp.asarray(p_w)
    if lm_dist_rng is None:
        lm_dist_rng = jnp.zeros((p_w.shape[0], 2), p_w.dtype)
    metric = "hamming" if jnp.asarray(lm_desc).dtype == jnp.uint8 else "l2"
    return _project_match_impl(
        cam, T_cw, p_w, _unpack(jnp.asarray(lm_desc)), lm_normal, lm_mask,
        jnp.asarray(lm_dist_rng, p_w.dtype),
        kp_uv, _unpack(jnp.asarray(kp_desc)), kp_octave, kp_free,
        float(radius_px), float(max_dist), float(img_w), float(img_h),
        check_view_angle=check_view_angle, metric=metric,
    )
