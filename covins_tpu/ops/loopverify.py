"""Fused loop-closure verification: ComputeSE3 in two async dispatches.

The reference verifies each loop candidate with a 5-stage CPU pipeline
(`covins_backend/src/covins_backend/placerec_be.cpp:63-220`): descriptor
matching, GP3P RANSAC, SearchBySE3 match extension, relative-pose GN
refinement, and a loop-neighborhood projection with a total-match gate.
Our round-4 port ran each stage as its own device call with a host fetch
between stages (~5 host<->device syncs per candidate; at ~34 ms/sync over
the tunneled chip that is ~170 ms of pure stall per candidate — the whole
end-to-end budget).

This module fuses the pipeline into device programs with fixed-shape
masked intermediates: every stage's accept gate becomes a device-side
count, stage outputs stay device-resident, and the host fetches ONE
packed result per candidate.  Because nothing blocks until the final
fetch, a drained window of candidates can be dispatched back-to-back and
the per-candidate tunnel latency overlaps with device compute
(JAX async dispatch).

Compile-stability design: stages 1-4 always run at the map's feature
capacity (Q = C = max_features), so the BIG kernel has exactly ONE shape
signature for the whole run — no mid-stream recompiles as maps grow.
Stage 5's loop-neighborhood size is unbounded, so it lives in its own
SMALL jit, bucketed coarsely (base 2048); its inputs chain from stage
1-4's device outputs without any host sync.

Host protocol:
    job = dispatch_covins_verify(...)     # gathers + 2 async device calls
    out = finalize_covins_verify(job)     # 1 device_get -> result or None
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from covins_tpu.ops import descriptors as d_ops
from covins_tpu.ops import pnp, relpose
from covins_tpu.ops.projmatch import _project_match_impl
from covins_tpu.utils import cameras as cam_mod
from covins_tpu.utils import geometry as geo


def _covins_stage14_body(
    key,
    cam_q: cam_mod.Camera,
    cam_c: cam_mod.Camera,
    # stage 1: observation-list matching (Q / C = max_features slots)
    q_obs_desc,      # (Q, D) u8 query-KF descriptors at landmark features
    q_obs_uv,        # (Q, 2) distorted pixels of those features
    q_obs_feat,      # (Q,)  int32 feature index in [0, F)
    q_obs_lm_body,   # (Q, 3) landmark position in query BODY frame
    q_obs_valid,     # (Q,)  bool
    c_obs_desc,      # (C, D) u8 candidate-KF descriptors at lm features
    c_obs_valid,     # (C,)  bool
    # candidate landmark list (1:1 with c obs slots)
    c_lm_w,          # (C, 3) world positions (candidate map world)
    c_lm_body,       # (C, 3) candidate-BODY positions
    c_lm_desc,       # (C, D) representative descriptors
    c_lm_normal,     # (C, 3)
    c_lm_rng,        # (C, 2) distance-invariance range
    c_lm_alive,      # (C,)  bool (landmark mask)
    c_lm_row,        # (C,)  int32 global landmark row in the candidate map
    # full query feature arrays (stage 3; re-used by stage 5)
    kp_uv,           # (F, 2)
    kp_desc,         # (F, D)
    kp_oct,          # (F,)
    kp_valid,        # (F,)  bool: slot < n_feat
    q_feat_lm_body,  # (F, 3) body-frame lm position per feature (or 0)
    q_feat_has_lm,   # (F,)  bool
    # poses + dynamic thresholds
    T_wc_sc,         # (7,) candidate body pose in candidate world
    min_matches, desc_max_dist, thr2_rad, ransac_min_inliers,
    radius_se3, img_w, img_h, inliers_thres,
    th_outlier_align,
    n_hyp: int = 256,
):
    """Stages 1-4 (matching, GP3P RANSAC, SearchBySE3 extension, GN
    refinement) as one program at fixed feature-capacity shapes."""
    F = kp_uv.shape[0]
    C = c_lm_w.shape[0]

    # ---- stage 1: brute-force matching over the two observation lists ----
    dist = d_ops.hamming_distance_best(q_obs_desc, c_obs_desc)
    dist = d_ops.masked_dist(dist, q_obs_valid, c_obs_valid)
    midx = d_ops.match_mutual_nn(dist, max_dist=desc_max_dist)  # (Q,)
    matched = (midx >= 0) & q_obs_valid
    n_matched = jnp.sum(matched)

    # ---- stage 2: P3P RANSAC, query bearings vs candidate-world points ----
    bear_q = cam_mod.back_project3(cam_q, q_obs_uv)  # undistorts internally
    p_w = c_lm_w[jnp.clip(midx, 0, C - 1)]           # (Q, 3)
    out2 = pnp.absolute_pose_ransac(
        key, p_w, bear_q, matched,
        n_hypotheses=n_hyp, threshold_rad=thr2_rad,
    )
    n_inl2 = out2["n_inliers"]
    T_cq_wc = out2["T_c_w"]
    T_wc_cq = geo.pose_inverse(T_cq_wc)
    T_wc_sq = geo.pose_compose(T_wc_cq, geo.pose_inverse(cam_q.T_s_c))
    T_12_est = geo.pose_compose(geo.pose_inverse(T_wc_sq), T_wc_sc)

    # ---- stage 3: SearchBySE3 match extension through the estimate ----
    taken_q = jnp.zeros(F, jnp.int32).at[q_obs_feat].max(
        matched.astype(jnp.int32)) > 0
    c_already = jnp.zeros(C, jnp.int32).at[jnp.clip(midx, 0, C - 1)].max(
        matched.astype(jnp.int32)) > 0
    T_cqw = geo.pose_compose(geo.pose_inverse(cam_q.T_s_c),
                             geo.pose_inverse(T_wc_sq))
    kp_pm1 = d_ops.unpack_to_pm1(kp_desc)
    mfeat, _ = _project_match_impl(
        cam_q, T_cqw, c_lm_w, d_ops.unpack_to_pm1(c_lm_desc), c_lm_normal,
        c_obs_valid & ~c_already & c_lm_alive, c_lm_rng,
        kp_uv, kp_pm1, kp_oct, kp_valid & ~taken_q,
        radius_se3, desc_max_dist, img_w, img_h,
        check_view_angle=False, metric="hamming",
    )
    ext = mfeat >= 0  # (C,)

    # ---- stage 4: GN refinement on 3D-3D pairs with both-side landmarks --
    mfeat_c = jnp.clip(mfeat, 0, F - 1)
    p1 = jnp.concatenate([q_obs_lm_body, q_feat_lm_body[mfeat_c]])
    p2 = jnp.concatenate([c_lm_body[jnp.clip(midx, 0, C - 1)], c_lm_body])
    m4 = jnp.concatenate([matched, ext & q_feat_has_lm[mfeat_c]])
    T_12, _, n_inl4 = relpose.optimize_relative_pose(
        cam_q, cam_c, T_12_est, p1, p2, m4, th_outlier=th_outlier_align,
    )

    # bookkeeping stage 5 consumes (device-resident; no host sync):
    # landmark rows already paired, and features already taken
    pair_crow = jnp.concatenate([
        jnp.where(matched, c_lm_row[jnp.clip(midx, 0, C - 1)], -1),
        jnp.where(ext, c_lm_row, -1),
    ])  # (Q + C,)
    taken_q5 = taken_q | (
        jnp.zeros(F, jnp.int32).at[mfeat_c].max(ext.astype(jnp.int32)) > 0)

    ok14 = (n_matched >= min_matches) & (n_inl2 >= ransac_min_inliers) \
        & (n_inl4 >= inliers_thres)
    return {
        "ok14": ok14, "T_12": T_12,
        "n_matched": n_matched, "n_inl2": n_inl2, "n_inl4": n_inl4,
        "n_ext": jnp.sum(ext), "midx": midx, "mfeat": mfeat,
        "pair_crow": pair_crow, "taken_q5": taken_q5,
    }


def _covins_stage5_body(
    cam_q: cam_mod.Camera,
    T_12,            # (7,) refined relative pose from stage 4
    T_wc_sc,         # (7,) candidate body pose in candidate world
    ok14, n_base,    # stage 1-4 gate + match count (device scalars)
    pair_crow,       # (Q + C,) landmark rows already paired (-1 = unused)
    taken_q5,        # (F,) features already taken by stage 1-3 pairs
    hood_lm_w, hood_desc, hood_normal, hood_rng,   # (H, ...)
    hood_alive,      # (H,) bool
    hood_lm_row,     # (H,) int32 global landmark row
    kp_uv, kp_desc, kp_oct, kp_valid,              # (F, ...)
    desc_max_dist, radius_proj, img_w, img_h, total_matches_thres,
):
    """Stage 5: loop-neighborhood projection + total-match gate.  Small
    program in its own jit so the unbounded neighborhood size buckets
    independently of the fixed-shape stage 1-4 kernel."""
    T_wc_sq_corr = geo.pose_compose(T_wc_sc, geo.pose_inverse(T_12))
    T_cqw_corr = geo.pose_compose(geo.pose_inverse(cam_q.T_s_c),
                                  geo.pose_inverse(T_wc_sq_corr))
    hood_in_pairs = jnp.any(
        hood_lm_row[:, None] == pair_crow[None, :], axis=-1)
    hfeat, _ = _project_match_impl(
        cam_q, T_cqw_corr, hood_lm_w, d_ops.unpack_to_pm1(hood_desc),
        hood_normal, hood_alive & ~hood_in_pairs, hood_rng,
        kp_uv, d_ops.unpack_to_pm1(kp_desc), kp_oct, kp_valid & ~taken_q5,
        radius_proj, desc_max_dist, img_w, img_h,
        check_view_angle=True, metric="hamming",
    )
    n_total = n_base + jnp.sum(hfeat >= 0)
    return {
        "ok": ok14 & (n_total >= total_matches_thres),
        "n_total": n_total, "hfeat": hfeat,
    }


def _pad_rows(a: np.ndarray, base: int):
    n = a.shape[0]
    b = base
    while b < n:
        b *= 2
    out = np.zeros((b,) + a.shape[1:], a.dtype)
    out[:n] = a
    return out, n


# ---------------------------------------------------------------------------
# Packed entry points: over a tunneled chip every host->device transfer is
# its own RPC (~3-5 ms), and the naive dispatch shipped ~30 arrays per
# candidate — more wall-clock than the kernels themselves.  The host packs
# everything into FOUR typed blobs (f64 / u8 / i32 / bool); the jitted
# wrappers slice them back out (free on device).  Config thresholds are
# STATIC: they are per-run constants, so baking them into the executable
# removes another ~10 scalar transfers per candidate without recompiles.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=(
    "F", "C", "min_matches", "desc_max_dist", "thr2_rad",
    "ransac_min_inliers", "radius_se3", "img_w", "img_h", "inliers_thres",
    "th_outlier_align", "n_hyp"))
def _covins_stage14_packed(
    key, cam_q, cam_c, fblob, u8blob, iblob, bblob,
    F: int, C: int,
    min_matches: int, desc_max_dist: float, thr2_rad: float,
    ransac_min_inliers: int, radius_se3: float, img_w: float, img_h: float,
    inliers_thres: int, th_outlier_align: float, n_hyp: int,
):
    o = [0]

    def take(n, shape=None):
        v = jax.lax.dynamic_slice_in_dim(fblob, o[0], n)
        o[0] += n
        return v.reshape(shape) if shape else v

    q_obs_uv = take(2 * F, (F, 2))
    q_obs_lm_body = take(3 * F, (F, 3))
    c_lm_w = take(3 * C, (C, 3))
    c_lm_body = take(3 * C, (C, 3))
    c_lm_normal = take(3 * C, (C, 3))
    c_lm_rng = take(2 * C, (C, 2))
    kp_uv = take(2 * F, (F, 2))
    kp_oct = take(F)
    q_feat_lm_body = take(3 * F, (F, 3))
    T_wc_sc = take(7)
    q_obs_desc, c_obs_desc = u8blob[:F], u8blob[F:F + C]
    c_lm_desc, kp_desc = u8blob[F + C:F + 2 * C], u8blob[F + 2 * C:]
    q_obs_feat, c_lm_row = iblob[:F], iblob[F:]
    q_obs_valid, c_obs_valid = bblob[:F], bblob[F:F + C]
    c_lm_alive = bblob[F + C:F + 2 * C]
    kp_valid = bblob[F + 2 * C:2 * F + 2 * C]
    q_feat_has_lm = bblob[2 * F + 2 * C:]
    return _covins_stage14_body(
        key, cam_q, cam_c,
        q_obs_desc, q_obs_uv, q_obs_feat, q_obs_lm_body, q_obs_valid,
        c_obs_desc, c_obs_valid,
        c_lm_w, c_lm_body, c_lm_desc, c_lm_normal, c_lm_rng, c_lm_alive,
        c_lm_row,
        kp_uv, kp_desc, kp_oct, kp_valid, q_feat_lm_body, q_feat_has_lm,
        T_wc_sc,
        min_matches, desc_max_dist, thr2_rad, ransac_min_inliers,
        radius_se3, img_w, img_h, inliers_thres, th_outlier_align,
        n_hyp=n_hyp,
    )


@partial(jax.jit, static_argnames=(
    "F", "C", "H", "desc_max_dist", "radius_proj", "img_w", "img_h",
    "total_matches_thres"))
def _covins_stage5_packed(
    cam_q, T_12, ok14, n_matched, n_ext, pair_crow, taken_q5,
    fblob, u8blob, bblob,           # the stage-14 blobs (device-resident)
    hfblob, hu8blob, hiblob, hbblob,  # hood blobs
    F: int, C: int, H: int,
    desc_max_dist: float, radius_proj: float, img_w: float, img_h: float,
    total_matches_thres: int,
):
    base = 2 * F + 3 * F + 3 * C + 3 * C + 3 * C + 2 * C
    kp_uv = jax.lax.dynamic_slice_in_dim(fblob, base, 2 * F).reshape(F, 2)
    kp_oct = jax.lax.dynamic_slice_in_dim(fblob, base + 2 * F, F)
    T_wc_sc = jax.lax.dynamic_slice_in_dim(
        fblob, base + 2 * F + F + 3 * F, 7)
    kp_desc = u8blob[F + 2 * C:]
    kp_valid = bblob[F + 2 * C:2 * F + 2 * C]
    hood_lm_w = hfblob[:3 * H].reshape(H, 3)
    hood_normal = hfblob[3 * H:6 * H].reshape(H, 3)
    hood_rng = hfblob[6 * H:].reshape(H, 2)
    return _covins_stage5_body(
        cam_q, T_12, T_wc_sc, ok14, n_matched + n_ext, pair_crow, taken_q5,
        hood_lm_w, hu8blob, hood_normal, hood_rng, hbblob, hiblob,
        kp_uv, kp_desc, kp_oct, kp_valid,
        desc_max_dist, radius_proj, img_w, img_h, total_matches_thres,
    )


def dispatch_covins_verify(key, mp_q, q_row: int, mp_c, c_row: int, cfg,
                           cam_q: cam_mod.Camera, cam_c: cam_mod.Camera):
    """Host gather + two chained async device dispatches of the 5-stage
    verifier (no host sync between them).

    Returns an opaque job (or None when a host-side precondition fails:
    fewer than 3 landmark observations on either side,
    `placerec_be.cpp:75-82`).  Pass the job to
    :func:`finalize_covins_verify`.
    """
    from covins_tpu.utils import npgeo

    def kf_landmarks(mp, row):
        o = mp.n_obs
        sel = (mp.obs_kf[:o] == row) & mp.obs_mask[:o]
        return mp.obs_lm[:o][sel], mp.obs_feat[:o][sel]

    q_lms, q_feats = kf_landmarks(mp_q, q_row)
    c_lms, c_feats = kf_landmarks(mp_c, c_row)
    if len(q_lms) < 3 or len(c_lms) < 3:
        return None
    same_map = mp_q is mp_c
    thres = cfg.matches_thres if same_map else cfg.matches_thres_merge

    F = mp_q.max_features
    Fc = mp_c.max_features
    calib_q = mp_q.calib[int(mp_q.kf_ids[q_row, 1])]
    focal = float(calib_q.intrinsics[0])

    # body-frame landmark coordinates (host numpy; no device sync)
    T_sq_w = npgeo.pose_inverse(mp_q.kf_pose[q_row])
    T_sc_w = npgeo.pose_inverse(mp_c.kf_pose[c_row])
    q_lm_body = npgeo.pose_apply(T_sq_w, mp_q.lm_pos[q_lms])
    c_lm_body_ = npgeo.pose_apply(T_sc_w, mp_c.lm_pos[c_lms])
    q_feat_lm = mp_q.kf_feat_lm[q_row]  # (F,)
    q_feat_has_lm = q_feat_lm >= 0
    q_feat_lm_body = npgeo.pose_apply(
        T_sq_w, mp_q.lm_pos[np.clip(q_feat_lm, 0, None)])
    q_feat_lm_body[~q_feat_has_lm] = 0.0

    # loop-neighborhood landmarks (candidate covisibles + itself)
    covis_c = mp_c.covis_weights(c_row)
    nbr_rows = np.append(np.where(covis_c > 0)[0], c_row)
    o = mp_c.n_obs
    sel = np.isin(mp_c.obs_kf[:o], nbr_rows) & mp_c.obs_mask[:o]
    hood = np.setdiff1d(np.unique(mp_c.obs_lm[:o][sel]), c_lms)

    # FIXED shapes for the big kernel (obs lists never exceed feature
    # capacity), coarse bucket for the unbounded neighborhood
    qp, nq = _pad_rows(q_feats.astype(np.int32), F)
    cp, nc = _pad_rows(c_lms.astype(np.int64), Fc)
    hp, nh = _pad_rows(hood.astype(np.int64), 2048)
    q_valid = np.arange(len(qp)) < nq
    c_valid = np.arange(len(cp)) < nc
    h_valid = np.arange(len(hp)) < nh
    cfp, _ = _pad_rows(c_feats.astype(np.int32), Fc)
    qlb, _ = _pad_rows(q_lm_body, F)
    clb, _ = _pad_rows(c_lm_body_, Fc)

    # pack everything into four typed blobs: ONE transfer RPC each over
    # the tunnel instead of ~30 (see the packed entry points above)
    fblob = jnp.asarray(np.concatenate([
        mp_q.kp_uv[q_row, qp].reshape(-1).astype(np.float64),
        qlb.reshape(-1),
        mp_c.lm_pos[cp].reshape(-1),
        clb.reshape(-1),
        mp_c.lm_normal[cp].reshape(-1),
        mp_c.lm_dist_rng[cp].reshape(-1),
        mp_q.kp_uv[q_row].reshape(-1).astype(np.float64),
        mp_q.kp_aors[q_row, :, 1].astype(np.float64),
        q_feat_lm_body.reshape(-1),
        mp_c.kf_pose[c_row],
    ]))
    u8blob = jnp.asarray(np.concatenate([
        mp_q.descriptors[q_row, qp],
        mp_c.descriptors[c_row, cfp],
        mp_c.lm_desc[cp],
        mp_q.descriptors[q_row],
    ]))
    iblob = jnp.asarray(np.concatenate([qp, cp.astype(np.int32)]))
    bblob = jnp.asarray(np.concatenate([
        q_valid, c_valid, mp_c.lm_mask[cp] & c_valid,
        np.arange(F) < int(mp_q.kf_n_feat[q_row]),
        q_feat_has_lm,
    ]))

    out14 = _covins_stage14_packed(
        key, cam_q, cam_c, fblob, u8blob, iblob, bblob,
        F=F, C=Fc,
        min_matches=min(thres, 8),
        desc_max_dist=float(cfg.desc_matching_th_low),
        thr2_rad=float(np.arctan2(cfg.ransac_class_threshold, focal)),
        ransac_min_inliers=cfg.ransac_min_inliers,
        radius_se3=float(cfg.search_radius_SE3),
        img_w=float(calib_q.img_w), img_h=float(calib_q.img_h),
        inliers_thres=cfg.inliers_thres,
        th_outlier_align=float(cfg.th_outlier_align),
        n_hyp=min(cfg.ransac_max_iterations, 512),
    )
    H = len(hp)
    hfblob = jnp.asarray(np.concatenate([
        mp_c.lm_pos[hp].reshape(-1),
        mp_c.lm_normal[hp].reshape(-1),
        mp_c.lm_dist_rng[hp].reshape(-1),
    ]))
    out5 = _covins_stage5_packed(
        cam_q, out14["T_12"],
        out14["ok14"], out14["n_matched"], out14["n_ext"],
        out14["pair_crow"], out14["taken_q5"],
        fblob, u8blob, bblob,
        hfblob, jnp.asarray(mp_c.lm_desc[hp]),
        jnp.asarray(hp.astype(np.int32)),
        jnp.asarray(mp_c.lm_mask[hp] & h_valid),
        F=F, C=Fc, H=H,
        desc_max_dist=float(cfg.desc_matching_th_low),
        radius_proj=float(cfg.search_radius_proj),
        img_w=float(calib_q.img_w), img_h=float(calib_q.img_h),
        total_matches_thres=cfg.total_matches_thres,
    )
    meta = {"q_feats": q_feats, "c_lms": c_lms, "hood": hood,
            "nq": nq, "nc": nc, "nh": nh}
    out = {"ok": out5["ok"], "T_12": out14["T_12"],
           "n_matched": out14["n_matched"], "n_inl2": out14["n_inl2"],
           "n_inl4": out14["n_inl4"], "midx": out14["midx"],
           "mfeat": out14["mfeat"], "hfeat": out5["hfeat"],
           "n_total": out5["n_total"]}
    return meta, out


def finalize_covins_verify(job, on_reject=None) -> Optional[tuple]:
    """ONE host fetch; returns (T_12, n_inliers, pairs (M,2) int32) or None.

    pairs rows are (query feature idx, candidate-map landmark row) — the
    reference's mvpCurrentMatchedPoints (`placerec_be.cpp:265-282`).
    `on_reject(stage, **counts)` is the optional debug hook (the placerec
    COUT-diagnostics role).
    """
    if job is None:
        return None
    meta, out = job
    out = jax.device_get(out)
    if not bool(out["ok"]):
        if on_reject is not None:
            on_reject(
                "covins_fused",
                n_matched=int(out["n_matched"]),
                n_inl2=int(out["n_inl2"]),
                n_inl4=int(out["n_inl4"]),
                n_total=int(out["n_total"]),
            )
        return None
    q_feats, c_lms, hood = meta["q_feats"], meta["c_lms"], meta["hood"]
    midx = out["midx"][: meta["nq"]][: len(q_feats)]
    mfeat = out["mfeat"][: meta["nc"]][: len(c_lms)]
    hfeat = out["hfeat"][: meta["nh"]][: len(hood)]
    m = midx >= 0
    init_pairs = np.stack([q_feats[m], c_lms[np.clip(midx[m], 0, None)]], 1)
    e = np.where(mfeat >= 0)[0]
    ext_pairs = np.stack([mfeat[e], c_lms[e]], 1)
    h = np.where(hfeat >= 0)[0]
    hood_pairs = np.stack([hfeat[h], hood[h]], 1)
    pairs = np.concatenate([init_pairs, ext_pairs, hood_pairs]).astype(
        np.int32)
    return np.asarray(out["T_12"]), int(out["n_inl4"]), pairs


# ---------------------------------------------------------------------------
# COVINS-G: 2D-only rig verification fused into one dispatch
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=(
    "nq_rig", "nc_rig", "Fq", "Fc", "n_hyp5", "n_hyp17", "n_cov",
    "solver", "metric"))
def _covinsg_verify_impl(
    key,
    qo, qd_dirs,     # (nq_rig*Fq, 3) ray origins / directions, query anchor frame
    co, cd_dirs,     # (nc_rig*Fc, 3) same for the candidate rig
    q_desc, c_desc,  # (nq_rig*Fq, D), (nc_rig*Fc, D) pose-estimation descriptors
    qmask, cmask,    # (nq_rig*Fq,), (nc_rig*Fc,) bool feature validity
    qbear, cbear,    # camera-frame bearings (central prefilter inputs)
    img_match_thres, ratio_thres, thr5,
    rel_min_img_matches, rel_min_inliers,
    thr17, nc_min_inliers, thr_cov_rad, nc_cov_thres,
    nq_rig: int, nc_rig: int, Fq: int, Fc: int,
    n_hyp5: int, n_hyp17: int, n_cov: int,
    solver: str = "5pt", metric: str = "hamming",
):
    """The COVINS-G verification pipeline (`placerec_gen_be.cpp:82-167` +
    `RelNonCentralPosSolver.cpp:61-296`) as one fused device program:

    * ratio matching per (query-rig KF, candidate-rig KF) pair over ONE
      shared descriptor-distance matrix;
    * per-pair central relative-pose prefilter (5pt Nister or linear 8pt)
      — the round-4 port ran these as `nq_rig*nc_rig` separate device
      calls with an `int(n_inliers)` host sync each;
    * pooled 17-pt non-central RANSAC over the surviving correspondences;
    * sampling covariance of the winning transform.

    All accept gates are device-side counts; the host fetches one packed
    result (the yaw/translation gate needs map poses and runs on the
    host at finalize time, `placerec_gen_be.cpp:156-167`)."""
    from covins_tpu.ops import epipolar

    if metric == "hamming":
        dist = d_ops.hamming_distance_best(q_desc, c_desc)
    else:
        dist = jnp.sqrt(d_ops.l2_distance_sq(q_desc, c_desc))
    dist = d_ops.masked_dist(dist, qmask, cmask)

    n_pairs = nq_rig * nc_rig
    keys = jax.random.split(key, n_pairs + 2)
    pool_parts, qidx_parts, cidx_parts = [], [], []
    pairs_ok = jnp.asarray(True)
    diag_match, diag_inl = [], []
    k_i = 0
    for iq in range(nq_rig):
        for jc in range(nc_rig):
            block = dist[iq * Fq:(iq + 1) * Fq, jc * Fc:(jc + 1) * Fc]
            midx = d_ops.match_ratio(
                block, max_dist=img_match_thres, ratio=ratio_thres)
            matched = midx >= 0
            n_match = jnp.sum(matched)
            bq = qbear[iq * Fq:(iq + 1) * Fq]
            bc = cbear[jc * Fc + jnp.clip(midx, 0, Fc - 1)]
            central = (epipolar.relative_pose_ransac_central_5pt
                       if solver == "5pt"
                       else epipolar.relative_pose_ransac_central)
            out5 = central(keys[k_i], bq, bc, matched,
                           n_hypotheses=n_hyp5, threshold_rad=thr5)
            k_i += 1
            pairs_ok &= (n_match >= rel_min_img_matches) & (
                out5["n_inliers"] >= rel_min_inliers)
            pool_parts.append(out5["inliers"] & matched)
            qidx_parts.append(iq * Fq + jnp.arange(Fq))
            cidx_parts.append(jc * Fc + jnp.clip(midx, 0, Fc - 1))
            diag_match.append(n_match)
            diag_inl.append(out5["n_inliers"])

    pool = jnp.concatenate(pool_parts)      # (n_pairs * Fq,)
    qidx = jnp.concatenate(qidx_parts)
    cidx = jnp.concatenate(cidx_parts)
    n_pool = jnp.sum(pool)
    va, fa = qo[qidx], qd_dirs[qidx]
    vb, fb = co[cidx], cd_dirs[cidx]
    out17 = epipolar.relative_pose_ransac_noncentral(
        keys[-2], va, fa, vb, fb, pool,
        n_hypotheses=n_hyp17, threshold_rad=thr17)
    cov, n_used = epipolar.sampling_covariance(
        keys[-1], out17["T_a_b"], va, fa, vb, fb, out17["inliers"],
        n_samples=n_cov, threshold_rad=thr_cov_rad)
    min_inl = jnp.minimum(
        nc_min_inliers,
        jnp.maximum(17, (0.5 * n_pool).astype(jnp.int32)))
    ok = (
        pairs_ok
        & (n_pool >= 17)
        & (out17["n_inliers"] >= min_inl)
        & (jnp.trace(cov) <= nc_cov_thres)
    )
    return {
        "ok": ok, "pairs_ok": pairs_ok, "T_12": out17["T_a_b"],
        "n_inliers": out17["n_inliers"], "cov": cov, "n_pool": n_pool,
        "pair_n_match": jnp.stack(diag_match),
        "pair_n_inl": jnp.stack(diag_inl),
    }
