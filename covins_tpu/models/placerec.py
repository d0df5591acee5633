"""Place recognition: loop detection, loop-transform estimation, loop
correction and map-merge registration.

TPU-native re-design of the reference's two PR pipelines:

* COVINS (landmark-based), `covins_backend/src/covins_backend/placerec_be.cpp`:
  Run -> DetectLoop -> ComputeSE3 -> CorrectLoop, always AddToDatabase.
* COVINS-G (2D-only), `placerec_gen_be.cpp`: same skeleton, temporal-
  neighbor connectivity, multi-keyframe 17-pt relative pose with sampling
  covariance, yaw gate, loop constraints carrying covariance.

Batched mapping:
  DBoW2 inverted-index scan      -> one BoW matvec (`kf_database.py`)
  ThreadPool brute-force matcher -> one Hamming matmul + mutual-NN
  OpenGV GP3P sequential RANSAC  -> vmapped 3D-3D alignment RANSAC
  OpenGV 17pt sequential RANSAC  -> vmapped 17-pt nullspace RANSAC
  Ceres OptimizeRelativePose     -> jit'd GN with Huber round + prune

Pose convention: a loop result carries ``T_12 = T_sq_sc`` — it maps
candidate-body coordinates into query-body coordinates.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from covins_tpu.models.kf_database import KeyframeDatabase
from covins_tpu.models.map_store import Map
from covins_tpu.ops import align3d, covisibility as cov_ops, descriptors as d_ops
from covins_tpu.ops import epipolar, relpose
from covins_tpu.utils import cameras as cam_mod
from covins_tpu.utils import geometry as geo
from covins_tpu.utils.config import Config


@dataclasses.dataclass
class LoopResult:
    query_id: tuple
    candidate_id: tuple
    T_12: np.ndarray  # T_sq_sc: candidate body -> query body
    n_inliers: int
    cov: Optional[np.ndarray] = None


def _camera_of(mp: Map, client_id: int) -> cam_mod.Camera:
    calib = mp.calib[client_id]
    return cam_mod.Camera(
        intrinsics=jnp.asarray(calib.intrinsics, jnp.float64),
        dist=jnp.asarray(calib.dist, jnp.float64),
        T_s_c=jnp.asarray(calib.T_s_c, jnp.float64),
        cam_model=calib.cam_model,
        dist_model=calib.dist_model,
    )


def _pad_rows(a: np.ndarray, base: int = 128):
    """Zero-pad the leading axis to a power-of-two bucket (stable jit
    signatures across the keyframe stream)."""
    n = a.shape[0]
    b = base
    while b < n:
        b *= 2
    out = np.zeros((b,) + a.shape[1:], a.dtype)
    out[:n] = a
    return out, n


def _covis_of(mp: Map, row: int) -> np.ndarray:
    """Covisibility weights at CAPACITY shapes (the obs arrays beyond
    n_obs are zero-filled with mask False, so passing the full buffers is
    exact) — capacities double, so jit signatures stay stable across the
    stream instead of retracing every keyframe."""
    cap_kf = mp.kf_ids.shape[0]
    cap_lm = max(mp.lm_ids.shape[0], 1)
    w = np.asarray(
        cov_ops.covis_weights_for(
            jnp.asarray(row),
            jnp.asarray(mp.obs_kf),
            jnp.asarray(mp.obs_lm),
            jnp.asarray(mp.obs_mask),
            n_kf=cap_kf, n_lm=cap_lm,
        )
    )
    return w[: mp.n_kf]


class PlaceRecognition:
    """One PR instance per agent (`AgentHandler`, `handler_be.cpp:41-48`),
    sharing the global `KeyframeDatabase`.  Mode selected by
    `config.placerec_type` ∈ {COVINS, COVINS_G}.  The `resolve` callable
    maps a keyframe id -> (Map, row) so candidates from OTHER maps are
    reachable (inter-map loop detection drives map merging)."""

    def __init__(
        self,
        client_id: int,
        database: KeyframeDatabase,
        resolve,  # (kf_id) -> (Map, row) or (None, -1)
        config: Optional[Config] = None,
        rng_seed: int = 0,
    ):
        self.client_id = client_id
        self.db = database
        self.resolve = resolve
        self.cfg = config or Config()
        self._key = jax.random.PRNGKey(rng_seed + 1000 * client_id)
        self.last_loop_kf_id = -(10**9)
        self._consistent_groups: list[tuple[set, int]] = []
        self.db_rows: Dict[tuple, int] = {}

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # ------------------------------------------------------------- detection
    def detect_loop(self, mp: Map, kf_row: int) -> list[tuple]:
        """BoW retrieval + exclusions + consistency grouping
        (`DetectLoop`, `placerec_be.cpp:346-463`).  Returns candidate
        keyframe IDs (possibly in other maps)."""
        cfg = self.cfg
        kf_id = tuple(mp.kf_ids[kf_row])
        if kf_id[0] < cfg.start_after_kf:
            return []
        if kf_id[0] - self.last_loop_kf_id < cfg.consecutive_loop_dist:
            return []

        n_feat = int(mp.kf_n_feat[kf_row])
        if n_feat == 0:
            return []
        descs = mp.descriptors[kf_row, :n_feat]

        covis = _covis_of(mp, kf_row)
        exclude_rows = []
        for kid, db_row in self.db_rows.items():
            krow = mp.kf_row(kid)
            if krow >= 0 and covis[krow] > 0:
                exclude_rows.append(db_row)
            elif kid[1] == kf_id[1] and abs(kid[0] - kf_id[0]) < cfg.min_loop_dist:
                exclude_rows.append(db_row)
            elif kid[0] < cfg.exclude_kfs_with_id_less_than:
                exclude_rows.append(db_row)

        scores, _ = self.db.query(descs, exclude_rows=np.asarray(exclude_rows))
        if scores.size == 0:
            return []

        # min covisible BoW score (`placerec_be.cpp:372-385`)
        covis_db = [
            self.db_rows.get(tuple(mp.kf_ids[r]))
            for r in np.where(covis >= cfg.covis_thres)[0]
        ]
        covis_db = [r for r in covis_db if r is not None]
        if covis_db:
            qv = self.db.bow_vector(descs)
            sims = np.asarray(self.db._db[jnp.asarray(covis_db)] @ qv)
            min_score = max(float(sims.min()), 0.05)
        else:
            min_score = 0.05
        frac = 0.8 if cfg.placerec_type == "COVINS" else 0.7
        cand_rows = np.where(scores >= frac * min_score)[0]
        if len(cand_rows) == 0:
            self._consistent_groups = []
            return []
        cand_rows = cand_rows[np.argsort(-scores[cand_rows])][: cfg.retrieval_topk]

        # consistency groups over candidate covisibility neighborhoods
        # (`placerec_be.cpp:408-453`); groups are sets of keyframe IDs so
        # they survive map merges
        cands: list[tuple] = []
        new_groups: list[tuple[set, int]] = []
        for db_row in cand_rows:
            kid = self.db.row_ids[db_row]
            cmp_, crow = self.resolve(kid)
            if cmp_ is None:
                continue
            if cfg.inter_map_matches_only and cmp_ is mp:
                continue
            gw = _covis_of(cmp_, crow)
            group = {tuple(cmp_.kf_ids[r]) for r in np.where(gw > 0)[0]} | {kid}
            best_count = 0
            for prev_group, count in self._consistent_groups:
                if group & prev_group:
                    best_count = max(best_count, count + 1)
            new_groups.append((group, best_count))
            if best_count + 1 >= cfg.cov_consistency_thres:
                cands.append(kid)
        self._consistent_groups = new_groups
        return cands

    # -------------------------------------------------------- pose estimation
    def compute_se3_covins(self, mp_q: Map, q_row: int, mp_c: Map, c_row: int):
        """Landmark-based loop transform (`ComputeSE3`, `placerec_be.cpp:63-220`):
        batched landmark-descriptor matching, 3D-3D RANSAC alignment (the
        GP3P role — both sides carry metric 3D), GN refinement with the
        `inliers_thres` gate.  Returns (T_12, n_inliers) or None."""
        cfg = self.cfg

        def kf_landmarks(mp, row):
            o = mp.n_obs
            sel = (mp.obs_kf[:o] == row) & mp.obs_mask[:o]
            return mp.obs_lm[:o][sel], mp.obs_feat[:o][sel]

        q_lms, q_feats = kf_landmarks(mp_q, q_row)
        c_lms, c_feats = kf_landmarks(mp_c, c_row)
        same_map = mp_q is mp_c
        thres = cfg.matches_thres if same_map else cfg.matches_thres_merge
        if len(q_lms) < 3 or len(c_lms) < 3:
            return None
        dq, nq = _pad_rows(mp_q.descriptors[q_row, q_feats])
        dc, nc = _pad_rows(mp_c.descriptors[c_row, c_feats])
        dist = d_ops.hamming_distance(jnp.asarray(dq), jnp.asarray(dc))
        dist = d_ops.masked_dist(
            dist, jnp.arange(dq.shape[0]) < nq, jnp.arange(dc.shape[0]) < nc
        )
        midx = np.asarray(
            d_ops.match_mutual_nn(dist, max_dist=cfg.desc_matching_th_low)
        )[:nq]
        matched = np.where(midx >= 0)[0]
        if len(matched) < min(thres, 8):
            return None

        p_w_q = mp_q.lm_pos[q_lms[matched]]
        p_w_c = mp_c.lm_pos[c_lms[midx[matched]]]
        T_sq_w = geo.pose_inverse(jnp.asarray(mp_q.kf_pose[q_row]))
        T_sc_w = geo.pose_inverse(jnp.asarray(mp_c.kf_pose[c_row]))
        p1 = np.asarray(geo.pose_apply(T_sq_w[None], jnp.asarray(p_w_q)))
        p2 = np.asarray(geo.pose_apply(T_sc_w[None], jnp.asarray(p_w_c)))
        p1, nm = _pad_rows(p1, base=64)
        p2, _ = _pad_rows(p2, base=64)
        match_mask = jnp.arange(p1.shape[0]) < nm
        p1, p2 = jnp.asarray(p1), jnp.asarray(p2)

        out = align3d.align_ransac_3d3d(
            self._next_key(), p1, p2, match_mask,
            n_hypotheses=min(cfg.ransac_max_iterations, 512),
            threshold=0.5,
        )
        if int(out["n_inliers"]) < cfg.ransac_min_inliers:
            return None

        cam_q = _camera_of(mp_q, int(mp_q.kf_ids[q_row, 1]))
        cam_c = _camera_of(mp_c, int(mp_c.kf_ids[c_row, 1]))
        T_opt, inl, n_inl = relpose.optimize_relative_pose(
            cam_q, cam_c, out["T_12"], p1, p2, out["inliers"] & match_mask,
            th_outlier=cfg.th_outlier_align,
        )
        if int(n_inl) < cfg.inliers_thres:
            return None
        return np.asarray(T_opt), int(n_inl)

    def compute_se3_covins_g(self, mp_q: Map, q_row: int, mp_c: Map, c_row: int):
        """2D-only loop transform (`placerec_gen_be.cpp:82-167` +
        `RelNonCentralPosSolver`): ratio matching over the rigs' features,
        multi-keyframe 17-pt non-central RANSAC, sampling covariance with
        the `cov_thres` gate, yaw gate.  Returns (T_12, n_inliers, cov)."""
        cfg = self.cfg

        def rig_rows(mp, row, want):
            rows = [row]
            r = row
            while len(rows) < want:
                r = mp.kf_pred[r]
                if r < 0:
                    break
                rows.append(int(r))
            return rows

        def rig_data(mp, rows, anchor):
            """Rays + descriptors in a FIXED (len(rows) * max_features)
            layout (stable jit signatures; invalid feature slots masked)."""
            F = mp.max_features
            T_w_anchor = jnp.asarray(mp.kf_pose[anchor])
            cam = _camera_of(mp, int(mp.kf_ids[anchor, 1]))
            origins, dirs, descs, masks = [], [], [], []
            for r in rows:
                uv = jnp.asarray(mp.kp_undist[r], jnp.float64)  # (F, 2)
                bear_c = cam_mod.back_project3(cam, uv)
                T_anchor_r = geo.pose_relative(T_w_anchor, jnp.asarray(mp.kf_pose[r]))
                T_anchor_cam = geo.pose_compose(T_anchor_r, cam.T_s_c)
                d = geo.quat_rotate(geo.pose_q(T_anchor_cam)[None], bear_c)
                origins.append(jnp.broadcast_to(geo.pose_t(T_anchor_cam), d.shape))
                dirs.append(d)
                descs.append(mp.descriptors[r])
                masks.append(np.arange(F) < int(mp.kf_n_feat[r]))
            return (jnp.concatenate(origins), jnp.concatenate(dirs),
                    np.concatenate(descs), np.concatenate(masks))

        q_rig = rig_rows(mp_q, q_row, 2)
        c_rig = rig_rows(mp_c, c_row, 3)
        qo, qd, dq, qmask = rig_data(mp_q, q_rig, q_row)
        co, cd, dc, cmask = rig_data(mp_c, c_rig, c_row)
        if qmask.sum() < cfg.rel_min_img_matches or cmask.sum() < cfg.rel_min_img_matches:
            return None
        if dq.dtype == np.uint8:
            dist = d_ops.hamming_distance(jnp.asarray(dq), jnp.asarray(dc))
        else:
            # SIFT mode (`feat.type: SIFT`): L2 matching, FLANN role
            # (`placerec_gen_be.cpp:82-126`); thresholds are linear L2
            dist = jnp.sqrt(
                d_ops.l2_distance_sq(jnp.asarray(dq), jnp.asarray(dc))
            )
        dist = d_ops.masked_dist(dist, jnp.asarray(qmask), jnp.asarray(cmask))
        midx = np.asarray(d_ops.match_ratio(
            dist, max_dist=cfg.img_match_thres, ratio=cfg.ratio_thres
        ))
        matched = np.where(midx >= 0)[0]
        if len(matched) < max(cfg.rel_min_img_matches, 17):
            return None

        qi, _ = _pad_rows(matched.astype(np.int32), base=64)
        ci, _ = _pad_rows(midx[matched].astype(np.int32), base=64)
        nm = len(matched)
        match_mask = jnp.arange(len(qi)) < nm
        va = qo[jnp.asarray(qi)]
        fa = qd[jnp.asarray(qi)]
        vb = co[jnp.asarray(ci)]
        fb = cd[jnp.asarray(ci)]
        focal = float(mp_q.calib[int(mp_q.kf_ids[q_row, 1])].intrinsics[0])
        thr = math.atan2(cfg.nc_rp_error, focal)
        out = epipolar.relative_pose_ransac_noncentral(
            self._next_key(), va, fa, vb, fb, match_mask,
            n_hypotheses=min(cfg.nc_max_iters, 512),
            threshold_rad=thr,
        )
        min_inl = min(cfg.nc_min_inliers, max(17, int(0.5 * nm)))
        if int(out["n_inliers"]) < min_inl:
            return None

        thr_cov = math.atan2(cfg.nc_rp_error_cov, focal)
        cov, n_used = epipolar.sampling_covariance(
            self._next_key(), out["T_a_b"], va, fa, vb, fb, out["inliers"],
            n_samples=2 * cfg.nc_cov_iters, threshold_rad=thr_cov,
        )
        cov = np.asarray(cov)
        if float(np.trace(cov)) > cfg.nc_cov_thres:
            return None

        T_12 = np.asarray(out["T_a_b"])
        # yaw gate (`placerec_gen_be.cpp:156-167`): reject loops implying an
        # implausible in-place yaw between the matched views
        ypr = np.asarray(geo.rotation_to_ypr(geo.quat_to_matrix(jnp.asarray(T_12[:4]))))
        if abs(np.degrees(float(ypr[0]))) > cfg.max_yaw:
            return None
        return T_12, int(out["n_inliers"]), cov

    # --------------------------------------------------------------- pipeline
    def process_keyframe(self, mp: Map, kf_row: int) -> Optional[LoopResult]:
        """The Run() body (`placerec_be.cpp:508-537`): detect -> compute ->
        return a LoopResult (correction/merge applied by the MapManager),
        and ALWAYS add the query to the database."""
        cfg = self.cfg
        kf_id = tuple(mp.kf_ids[kf_row])
        result = None
        if cfg.placerec_active:
            for cand_id in self.detect_loop(mp, kf_row):
                mp_c, c_row = self.resolve(cand_id)
                if mp_c is None:
                    continue
                if cfg.placerec_type == "COVINS_G":
                    got = self.compute_se3_covins_g(mp, kf_row, mp_c, c_row)
                    if got is None:
                        continue
                    T_12, n_inl, cov = got
                else:
                    got = self.compute_se3_covins(mp, kf_row, mp_c, c_row)
                    if got is None:
                        continue
                    T_12, n_inl = got
                    cov = None
                self.last_loop_kf_id = kf_id[0]
                result = LoopResult(
                    query_id=kf_id, candidate_id=cand_id,
                    T_12=T_12, n_inliers=n_inl, cov=cov,
                )
                break
        n_feat = int(mp.kf_n_feat[kf_row])
        if n_feat > 0:
            db_row = self.db.add_keyframe(kf_id, mp.descriptors[kf_row, :n_feat])
            self.db_rows[kf_id] = db_row
        return result
