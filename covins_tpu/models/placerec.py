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
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from covins_tpu.models.kf_database import KeyframeDatabase
from covins_tpu.models.map_store import Map
from covins_tpu.ops import covisibility as cov_ops, descriptors as d_ops
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
    # verified (query feature idx, candidate-map landmark row) pairs — the
    # reference's mvpCurrentMatchedPoints; drives landmark fusion in
    # ConnectLoop (`placerec_be.cpp:265-282`).  Landmark rows index the
    # CANDIDATE map at detection time.
    matches: Optional[np.ndarray] = None  # (M, 2) int32


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


def _temporal_neighbors(mp: Map, row: int, k: int = 10) -> np.ndarray:
    """Temporal pred/succ chain neighbors (COVINS-G's connectivity,
    `KeyframeBase::GetConnectedNeighborKeyframes` /
    `EstablishNeighbors`, `keyframe_be.cpp:385-410`)."""
    rows = []
    r = int(mp.kf_pred[row])
    while r >= 0 and len(rows) < k:
        if mp.kf_mask[r]:
            rows.append(r)
        r = int(mp.kf_pred[r])
    r = int(mp.kf_succ[row])
    while r >= 0 and len(rows) < k:
        if mp.kf_mask[r]:
            rows.append(r)
        r = int(mp.kf_succ[r])
    return np.asarray(rows, np.int64)


def _covis_of(mp: Map, row: int) -> np.ndarray:
    """Covisibility weights (delegates to the map's capacity-shaped
    batched reduction, stable jit signatures across the stream)."""
    return mp.covis_weights(row)


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

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # verbose rejection tracing (the reference's COUT diagnostics role);
    # enable with COVINS_TPU_PR_DEBUG=1
    _debug = os.environ.get("COVINS_TPU_PR_DEBUG") == "1"

    def _reject(self, stage, **kw):
        if self._debug:
            print(f"[placerec] reject at {stage}: " +
                  ", ".join(f"{k}={v}" for k, v in kw.items()), flush=True)
        return None

    # ------------------------------------------------------------- detection
    def detect_loop(self, mp: Map, kf_row: int, pre: Optional[dict] = None
                    ) -> list[tuple]:
        """BoW retrieval + exclusions + consistency grouping
        (`DetectLoop`, `placerec_be.cpp:346-463`).  Returns candidate
        keyframe IDs (possibly in other maps).

        ``pre`` carries precomputed raw retrieval data from
        `KeyframeDatabase.add_and_query_batch` (scores/common/valid) so a
        WINDOW of keyframes costs one device dispatch; without it the
        single-query device path is used."""
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
        # exclusion mask over db rows, vectorized (`DetectCandidates`
        # filters, `kf_database.cpp:47-187`): id floor + same-agent
        # proximity from the row metadata arrays; covisibility from the
        # (small) covisible set via the id->row dict
        n_db = self.db.n
        row_kf = self.db.row_kf[:n_db]
        row_client = self.db.row_client[:n_db]
        excl = row_kf < cfg.exclude_kfs_with_id_less_than
        excl |= (row_client == kf_id[1]) & (
            np.abs(row_kf - kf_id[0]) < cfg.min_loop_dist
        )
        covis_rows = np.where(covis > 0)[0]
        covis_dbr = np.full(len(covis_rows), -1, np.int64)
        for j, r in enumerate(covis_rows):
            dbr = self.db.row_of.get(tuple(int(x) for x in mp.kf_ids[r]), -1)
            if dbr >= 0:
                excl[dbr] = True
                covis_dbr[j] = dbr

        if pre is not None:
            # host-side gating over the precomputed raw scores — mirrors
            # `KeyframeDatabase.query` (0.8*max-common-words gate) exactly.
            # Under deferred placerec the DB may have GROWN since this
            # keyframe's insert; rows added later are not candidates
            # (sequential semantics, as in the reference's in-order DB),
            # so gate over the snapshot length.
            n_pre = min(n_db, len(pre["scores"]))
            raw_s = pre["scores"][:n_pre]
            raw_c = pre["common"][:n_pre]
            m = pre["valid"][:n_pre] & ~excl[:n_pre]
            if not m.any():
                self._consistent_groups = []
                return []
            max_common = int((raw_c * m).max())
            keep = raw_c >= 0.8 * max_common
            scores = np.where(keep & m, raw_s, -1.0)
        else:
            scores, _ = self.db.query(descs, exclude_rows=np.where(excl)[0])
        if scores.size == 0:
            return []

        # min covisible BoW score (`placerec_be.cpp:372-385`)
        covis_sel = covis[covis_rows] >= cfg.covis_thres
        covis_db = [int(r) for r in covis_dbr[covis_sel] if r >= 0]
        if pre is not None:
            # raw scores against db rows ARE cosine(query, row); restrict
            # to rows inserted before the query (sequential semantics)
            covis_db = [r for r in covis_db
                        if r < len(pre["valid"]) and pre["valid"][r]]
        if covis_db:
            if pre is not None:
                sims = pre["scores"][covis_db]
            else:
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

        # covisibility-group score ACCUMULATION (`kf_database.cpp:131-183`):
        # each scoring candidate accumulates the scores of its top-10
        # covisible keyframes (temporal neighbors in COVINS-G) that also
        # scored for this query; groups with accScore > 0.75 * best
        # accumulated score survive, represented by their best-scoring
        # member.
        def group_rows(cmp_, crow):
            if cfg.placerec_type == "COVINS_G":
                return _temporal_neighbors(cmp_, crow, k=10)
            gw = _covis_of(cmp_, crow)
            nz = np.where(gw > 0)[0]
            return nz[np.argsort(-gw[nz])][:10]

        acc_list = []  # (acc_score, best_db_row, group id set)
        best_acc = frac * min_score
        for db_row in cand_rows:
            kid = self.db.row_ids[db_row]
            cmp_, crow = self.resolve(kid)
            if cmp_ is None:
                continue
            if cfg.inter_map_matches_only and cmp_ is mp:
                continue
            members = group_rows(cmp_, crow)
            group = {tuple(cmp_.kf_ids[r]) for r in members} | {kid}
            acc_score = float(scores[db_row])
            best_row = db_row
            best_score = acc_score
            for r in members:
                dbr = self.db.row_of.get(tuple(int(x) for x in cmp_.kf_ids[r]), -1)
                if 0 <= dbr < len(scores) and scores[dbr] > 0:
                    acc_score += float(scores[dbr])
                    if scores[dbr] > best_score:
                        best_score = float(scores[dbr])
                        best_row = dbr
            acc_list.append((acc_score, best_row, group))
            best_acc = max(best_acc, acc_score)
        retain = 0.75 * best_acc
        acc_list = [a for a in acc_list if a[0] > retain or len(acc_list) == 1]
        acc_list.sort(key=lambda a: -a[0])
        seen_rows: set = set()
        winners = []
        for acc_score, best_row, group in acc_list[: cfg.retrieval_topk]:
            if best_row in seen_rows:
                continue
            seen_rows.add(best_row)
            winners.append((best_row, group))

        # consistency groups over candidate covisibility neighborhoods
        # (`placerec_be.cpp:408-453`); groups are sets of keyframe IDs so
        # they survive map merges
        cands: list[tuple] = []
        new_groups: list[tuple[set, int]] = []
        for db_row, group in winners:
            kid = self.db.row_ids[db_row]
            cmp_, crow = self.resolve(kid)
            if cmp_ is None:
                continue
            group = group | {kid}
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
        """Landmark-based loop transform (`ComputeSE3`, `placerec_be.cpp:63-220`),
        all five reference stages:

        1. batched landmark-descriptor matching (DenseMatcher role) with
           the `matches_thres` gate;
        2. GP3P RANSAC — 2D query bearings vs 3D candidate landmarks
           (`Se3Solver::projectiveAlignment`, `Se3Solver.cpp:59-110`) via
           the vmapped P3P harness;
        3. match extension through the estimated transform
           (`FeatureMatcher::SearchBySE3`, `feature_matcher_be.cpp:293+`)
           as one batched project-and-match;
        4. GN refinement with the `inliers_thres` gate
           (`OptimizeRelativePose`, `optimization_be.cpp:620-831`);
        5. projection of the loop-neighborhood landmarks into the query
           with the `total_matches_thres` accept gate
           (`placerec_be.cpp:176-219`).

        Returns (T_12, n_inliers, matches (M,2) [q_feat, c_lm_row]) or None."""
        from covins_tpu.ops import pnp, projmatch

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

        # ---- stage 1: brute-force landmark matching -----------------------
        dq, nq = _pad_rows(mp_q.descriptors[q_row, q_feats])
        dc, nc = _pad_rows(mp_c.descriptors[c_row, c_feats])
        dist = d_ops.hamming_distance_best(jnp.asarray(dq), jnp.asarray(dc))
        dist = d_ops.masked_dist(
            dist, jnp.arange(dq.shape[0]) < nq, jnp.arange(dc.shape[0]) < nc
        )
        midx = np.asarray(
            d_ops.match_mutual_nn(dist, max_dist=cfg.desc_matching_th_low)
        )[:nq]
        matched = np.where(midx >= 0)[0]
        if len(matched) < min(thres, 8):
            return None

        cam_q = _camera_of(mp_q, int(mp_q.kf_ids[q_row, 1]))
        cam_c = _camera_of(mp_c, int(mp_c.kf_ids[c_row, 1]))
        calib_q = mp_q.calib[int(mp_q.kf_ids[q_row, 1])]
        focal = float(calib_q.intrinsics[0])

        # ---- stage 2: GP3P RANSAC (2D-3D) ---------------------------------
        # query-side bearings are more reliable than query-side depths, so
        # the hypothesis stage uses candidate-map 3D vs query bearings
        # (`Se3Solver.cpp:59-110`), solved in the candidate world frame.
        q_feat_matched = q_feats[matched]
        c_lm_matched = c_lms[midx[matched]]
        p_w_c = mp_c.lm_pos[c_lm_matched]  # (M, 3) candidate world
        # DISTORTED pixels: back_project3 undistorts internally
        uv_q = mp_q.kp_uv[q_row, q_feat_matched]
        bear_q = np.asarray(
            cam_mod.back_project3(cam_q, jnp.asarray(uv_q, jnp.float64))
        )
        pw_pad, nm = _pad_rows(p_w_c.astype(np.float64), base=64)
        bq_pad, _ = _pad_rows(bear_q, base=64)
        mmask = jnp.arange(len(pw_pad)) < nm
        out = pnp.absolute_pose_ransac(
            self._next_key(), jnp.asarray(pw_pad), jnp.asarray(bq_pad), mmask,
            n_hypotheses=min(cfg.ransac_max_iterations, 512),
            threshold_rad=float(
                pnp.px_threshold_to_angular(cfg.ransac_class_threshold, focal)
            ),
        )
        if int(out["n_inliers"]) < cfg.ransac_min_inliers:
            return None
        # query camera pose in candidate world; lift to body level
        T_cq_wc = out["T_c_w"]
        T_wc_cq = geo.pose_inverse(T_cq_wc)
        T_wc_sq = geo.pose_compose(T_wc_cq, geo.pose_inverse(cam_q.T_s_c))
        T_wc_sc = jnp.asarray(mp_c.kf_pose[c_row])
        # T_12 = T_sq_sc = inv(T_wc_sq) o T_wc_sc  (candidate body -> query body)
        T_12_est = geo.pose_compose(geo.pose_inverse(T_wc_sq), T_wc_sc)

        # ---- stage 3: SearchBySE3 — extend matches through the transform --
        F = mp_q.max_features
        calib_c = mp_c.calib[int(mp_c.kf_ids[c_row, 1])]
        taken_q = np.zeros(F, bool)
        taken_q[q_feat_matched] = True
        # candidate KF's landmarks -> free query features, projecting with
        # the estimated query pose IN CANDIDATE WORLD
        cl_pad, ncl = _pad_rows(c_lms.astype(np.int32), base=128)
        c_valid = np.arange(len(cl_pad)) < ncl
        c_already = np.isin(cl_pad, c_lm_matched) & c_valid
        T_cqw = geo.pose_compose(geo.pose_inverse(cam_q.T_s_c),
                                 geo.pose_inverse(T_wc_sq))  # cand world -> q cam
        mfeat, mdist = projmatch.project_match(
            cam_q, T_cqw,
            jnp.asarray(mp_c.lm_pos[cl_pad]),
            jnp.asarray(mp_c.lm_desc[cl_pad]),
            jnp.asarray(mp_c.lm_normal[cl_pad]),
            jnp.asarray(c_valid & ~c_already & mp_c.lm_mask[cl_pad]),
            jnp.asarray(mp_q.kp_uv[q_row], jnp.float64),
            jnp.asarray(mp_q.descriptors[q_row]),
            jnp.asarray(mp_q.kp_aors[q_row, :, 1], jnp.float64),
            jnp.asarray(
                (~taken_q) & (np.arange(F) < int(mp_q.kf_n_feat[q_row]))
            ),
            radius_px=cfg.search_radius_SE3,
            max_dist=cfg.desc_matching_th_low,
            img_w=calib_q.img_w, img_h=calib_q.img_h,
            check_view_angle=False,
            lm_dist_rng=jnp.asarray(mp_c.lm_dist_rng[cl_pad]),
        )
        mfeat = np.asarray(mfeat)[:ncl]
        ext = np.where(mfeat >= 0)[0]
        ext_pairs = (
            np.stack([mfeat[ext], c_lms[ext]], axis=1)
            if len(ext) else np.zeros((0, 2), np.int64)
        )
        init_pairs = np.stack([q_feat_matched, c_lm_matched], axis=1)
        all_pairs = np.concatenate([init_pairs, ext_pairs]).astype(np.int64)

        # ---- stage 4: GN refinement (3D-3D over pairs with both sides) ----
        q_lm_of_feat = mp_q.kf_feat_lm[q_row]  # (F,)
        both = q_lm_of_feat[all_pairs[:, 0]] >= 0
        q_lm_sel = q_lm_of_feat[all_pairs[both, 0]]
        c_lm_sel = all_pairs[both, 1]
        # pure-host frame changes (lm_pos / kf_pose are numpy): avoids two
        # device round-trips per verification — on the tunneled chip every
        # host<->device sync costs ~34 ms
        from covins_tpu.utils import npgeo as _npg
        T_sq_w_np = _npg.pose_inverse(mp_q.kf_pose[q_row])
        T_sc_w_np = _npg.pose_inverse(mp_c.kf_pose[c_row])  # == inv(T_wc_sc)
        p1 = _npg.pose_apply(T_sq_w_np, mp_q.lm_pos[q_lm_sel])
        p2 = _npg.pose_apply(T_sc_w_np, mp_c.lm_pos[c_lm_sel])
        p1, nm2 = _pad_rows(p1, base=64)
        p2, _ = _pad_rows(p2, base=64)
        gn_mask = jnp.arange(len(p1)) < nm2
        T_opt, inl, n_inl = relpose.optimize_relative_pose(
            cam_q, cam_c, T_12_est, jnp.asarray(p1), jnp.asarray(p2), gn_mask,
            th_outlier=cfg.th_outlier_align,
        )
        T_12, n_inl = jax.device_get((T_opt, n_inl))  # ONE sync
        n_inl = int(n_inl)
        if n_inl < cfg.inliers_thres:
            return None

        # ---- stage 5: loop-neighborhood projection + total gate -----------
        # landmarks of the candidate's covisible keyframes + itself
        covis_c = _covis_of(mp_c, c_row)
        nbr_rows = list(np.where(covis_c > 0)[0]) + [c_row]
        o = mp_c.n_obs
        sel = np.isin(mp_c.obs_kf[:o], np.asarray(nbr_rows)) & mp_c.obs_mask[:o]
        hood_lms = np.unique(mp_c.obs_lm[:o][sel])
        hood_lms = hood_lms[~np.isin(hood_lms, all_pairs[:, 1])]
        taken_q = np.zeros(F, bool)
        taken_q[all_pairs[:, 0]] = True
        n_total = len(all_pairs)
        if len(hood_lms):
            hl_pad, nhl = _pad_rows(hood_lms.astype(np.int32), base=256)
            h_valid = np.arange(len(hl_pad)) < nhl
            # corrected query pose: T_wc_sq from the refined transform
            T_wc_sq_corr = geo.pose_compose(T_wc_sc, geo.pose_inverse(jnp.asarray(T_12)))
            T_cqw_corr = geo.pose_compose(geo.pose_inverse(cam_q.T_s_c),
                                          geo.pose_inverse(T_wc_sq_corr))
            hfeat, _ = projmatch.project_match(
                cam_q, T_cqw_corr,
                jnp.asarray(mp_c.lm_pos[hl_pad]),
                jnp.asarray(mp_c.lm_desc[hl_pad]),
                jnp.asarray(mp_c.lm_normal[hl_pad]),
                jnp.asarray(h_valid & mp_c.lm_mask[hl_pad]),
                jnp.asarray(mp_q.kp_uv[q_row], jnp.float64),
                jnp.asarray(mp_q.descriptors[q_row]),
                jnp.asarray(mp_q.kp_aors[q_row, :, 1], jnp.float64),
                jnp.asarray(
                    (~taken_q) & (np.arange(F) < int(mp_q.kf_n_feat[q_row]))
                ),
                radius_px=cfg.search_radius_proj,
                max_dist=cfg.desc_matching_th_low,
                img_w=calib_q.img_w, img_h=calib_q.img_h,
                check_view_angle=True,
                lm_dist_rng=jnp.asarray(mp_c.lm_dist_rng[hl_pad]),
            )
            hfeat = np.asarray(hfeat)[:nhl]
            hext = np.where(hfeat >= 0)[0]
            if len(hext):
                hood_pairs = np.stack([hfeat[hext], hood_lms[hext]], axis=1)
                all_pairs = np.concatenate([all_pairs, hood_pairs.astype(np.int64)])
            n_total = len(all_pairs)
        if n_total < cfg.total_matches_thres:
            return None
        return T_12, int(n_inl), all_pairs.astype(np.int32)

    def compute_se3_covins_g(self, mp_q: Map, q_row: int, mp_c: Map, c_row: int):
        """2D-only loop transform (`placerec_gen_be.cpp:82-167` +
        `RelNonCentralPosSolver`): per-pair ratio matching over the rigs'
        pose-estimation features with a per-pair CENTRAL relative-pose
        prefilter (the 5pt STEWENIUS stage, `RelNonCentralPosSolver.cpp:
        127,343-377` — here the batched 8pt solver), multi-keyframe 17-pt
        non-central RANSAC over the surviving correspondences, sampling
        covariance with the `cov_thres` gate, and the yaw + translation
        gate (`placerec_gen_be.cpp:156-167`).  Returns (T_12, n_inliers,
        cov)."""
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
            layout (stable jit signatures; invalid feature slots masked).
            Uses the pose-estimation (`_add`) feature set when present
            (`placerec_gen_be.cpp:99` matches `descriptors_add_`)."""
            F = mp.max_features
            T_w_anchor = jnp.asarray(mp.kf_pose[anchor])
            cam = _camera_of(mp, int(mp.kf_ids[anchor, 1]))
            origins, dirs, descs, masks, bearings = [], [], [], [], []
            for r in rows:
                kp, dsc, n = mp.match_features(r)
                uv = jnp.asarray(kp, jnp.float64)  # (F, 2)
                bear_c = cam_mod.back_project3(cam, uv)
                T_anchor_r = geo.pose_relative(T_w_anchor, jnp.asarray(mp.kf_pose[r]))
                T_anchor_cam = geo.pose_compose(T_anchor_r, cam.T_s_c)
                d = geo.quat_rotate(geo.pose_q(T_anchor_cam)[None], bear_c)
                origins.append(jnp.broadcast_to(geo.pose_t(T_anchor_cam), d.shape))
                dirs.append(d)
                descs.append(dsc)
                masks.append(np.arange(F) < n)
                bearings.append(bear_c)
            return (jnp.concatenate(origins), jnp.concatenate(dirs),
                    np.concatenate(descs), np.concatenate(masks),
                    jnp.concatenate(bearings))

        q_rig = rig_rows(mp_q, q_row, 2)
        c_rig = rig_rows(mp_c, c_row, 3)
        qo, qd, dq, qmask, qbear = rig_data(mp_q, q_rig, q_row)
        co, cd, dc, cmask, cbear = rig_data(mp_c, c_rig, c_row)
        if qmask.sum() < cfg.rel_min_img_matches or cmask.sum() < cfg.rel_min_img_matches:
            return self._reject("rig_features", nq=int(qmask.sum()),
                                nc=int(cmask.sum()))
        if dq.dtype == np.uint8:
            dist = d_ops.hamming_distance_best(jnp.asarray(dq), jnp.asarray(dc))
        else:
            # SIFT mode (`feat.type: SIFT`): L2 matching, FLANN role
            # (`placerec_gen_be.cpp:82-126`); thresholds are linear L2
            dist = jnp.sqrt(
                d_ops.l2_distance_sq(jnp.asarray(dq), jnp.asarray(dc))
            )
        dist = d_ops.masked_dist(dist, jnp.asarray(qmask), jnp.asarray(cmask))

        focal = float(mp_q.calib[int(mp_q.kf_ids[q_row, 1])].intrinsics[0])
        thr5 = math.atan2(cfg.rel_error_thres, focal)

        # per-pair matching + central relative-pose prefilter: every
        # (query-rig KF, candidate-rig KF) pair must yield enough matches
        # AND a consistent central pose, else the candidate is rejected
        # (`RelNonCentralPosSolver::computeNonCentralRelPose`, `:61-144`);
        # the surviving per-pair inliers feed the non-central stage.
        Fq, Fc = mp_q.max_features, mp_c.max_features
        qi_all, ci_all = [], []
        for iq in range(len(q_rig)):
            for jc in range(len(c_rig)):
                block = dist[iq * Fq : (iq + 1) * Fq, jc * Fc : (jc + 1) * Fc]
                midx = np.asarray(d_ops.match_ratio(
                    block, max_dist=cfg.img_match_thres, ratio=cfg.ratio_thres
                ))
                matched = np.where(midx >= 0)[0]
                if len(matched) < cfg.rel_min_img_matches:
                    return self._reject("pair_matches", pair=(iq, jc),
                                        n=len(matched))
                gq = (iq * Fq + matched).astype(np.int32)
                gc = (jc * Fc + midx[matched]).astype(np.int32)
                pq, nm5 = _pad_rows(gq, base=64)
                pc, _ = _pad_rows(gc, base=64)
                m5 = jnp.arange(len(pq)) < nm5
                # qbear/cbear are concatenated over ALL rig rows in the same
                # iq*Fq+f layout as `dist`, so the global padded indices index
                # them directly (pad rows are masked by m5).
                # minimal 5-pt (Nister; reference STEWENIUS parity) or
                # linear 8-pt, per `rel_minimal_solver`.  Each 5-pt sample
                # yields up to 10 essentials (vs the 8-pt's single E), so
                # a quarter of the hypothesis budget scores the same
                # number of candidate poses at the better minimal-sample
                # inlier odds.
                if cfg.rel_minimal_solver == "5pt":
                    central_ransac = epipolar.relative_pose_ransac_central_5pt
                    n_hyp = min(max(cfg.rel_max_iters // 4, 16), 64)
                else:
                    central_ransac = epipolar.relative_pose_ransac_central
                    n_hyp = min(cfg.rel_max_iters, 256)
                out5 = central_ransac(
                    self._next_key(),
                    qbear[jnp.asarray(pq)],
                    cbear[jnp.asarray(pc)],
                    m5,
                    n_hypotheses=n_hyp,
                    threshold_rad=thr5,
                )
                if int(out5["n_inliers"]) < cfg.rel_min_inliers:
                    return self._reject("pair_5pt", pair=(iq, jc),
                                        n_inl=int(out5["n_inliers"]),
                                        need=cfg.rel_min_inliers)
                inl5 = np.asarray(out5["inliers"])[: len(gq)]
                qi_all.append(gq[inl5[: len(gq)]])
                ci_all.append(gc[inl5[: len(gc)]])

        qall = np.concatenate(qi_all)
        call = np.concatenate(ci_all)
        if len(qall) < 17:
            return self._reject("pooled_pairs", n=len(qall))
        qi, nm = _pad_rows(qall.astype(np.int32), base=64)
        ci, _ = _pad_rows(call.astype(np.int32), base=64)
        match_mask = jnp.arange(len(qi)) < nm
        va = qo[jnp.asarray(qi)]
        fa = qd[jnp.asarray(qi)]
        vb = co[jnp.asarray(ci)]
        fb = cd[jnp.asarray(ci)]
        thr = math.atan2(cfg.nc_rp_error, focal)
        out = epipolar.relative_pose_ransac_noncentral(
            self._next_key(), va, fa, vb, fb, match_mask,
            n_hypotheses=min(cfg.nc_max_iters, 512),
            threshold_rad=thr,
        )
        min_inl = min(cfg.nc_min_inliers, max(17, int(0.5 * nm)))
        if int(out["n_inliers"]) < min_inl:
            return self._reject("17pt", n_inl=int(out["n_inliers"]),
                                need=min_inl)

        thr_cov = math.atan2(cfg.nc_rp_error_cov, focal)
        cov, n_used = epipolar.sampling_covariance(
            self._next_key(), out["T_a_b"], va, fa, vb, fb, out["inliers"],
            n_samples=2 * cfg.nc_cov_iters, threshold_rad=thr_cov,
        )
        cov = np.asarray(cov)
        if float(np.trace(cov)) > cfg.nc_cov_thres:
            return self._reject("cov_trace", tr=float(np.trace(cov)),
                                thres=cfg.nc_cov_thres)

        T_12 = np.asarray(out["T_a_b"])
        # yaw + translation gate (`placerec_gen_be.cpp:156-167`): the
        # relative yaw between the candidate's world yaw and the query's
        # loop-corrected world yaw, and the loop translation magnitude
        T_21 = np.asarray(geo.pose_inverse(jnp.asarray(T_12)))  # T_smatch_squery
        T_w_s_cand = jnp.asarray(mp_c.kf_pose[c_row])
        yaw_match = float(geo.rotation_to_ypr(geo.quat_to_matrix(T_w_s_cand[:4]))[0])
        corrected = geo.pose_compose(T_w_s_cand, jnp.asarray(T_21))
        yaw_query = float(geo.rotation_to_ypr(geo.quat_to_matrix(corrected[:4]))[0])
        rel_yaw = math.degrees(
            (yaw_query - yaw_match + math.pi) % (2 * math.pi) - math.pi
        )
        if abs(rel_yaw) > cfg.max_yaw or float(np.linalg.norm(T_21[4:7])) > cfg.max_trans:
            return self._reject("yaw_trans", yaw=rel_yaw,
                                trans=float(np.linalg.norm(T_21[4:7])))
        return T_12, int(out["n_inliers"]), cov

    # --------------------------------------------------------------- pipeline
    def process_keyframe(self, mp: Map, kf_row: int,
                         pre: Optional[dict] = None) -> Optional[LoopResult]:
        """The Run() body (`placerec_be.cpp:508-537`): detect -> compute ->
        return a LoopResult (correction/merge applied by the MapManager),
        and ALWAYS add the query to the database (already done when the
        batched `pre` data is supplied)."""
        cfg = self.cfg
        kf_id = tuple(mp.kf_ids[kf_row])
        result = None
        if cfg.placerec_active:
            for cand_id in self.detect_loop(mp, kf_row, pre=pre):
                mp_c, c_row = self.resolve(cand_id)
                if mp_c is None:
                    continue
                if cfg.placerec_type == "COVINS_G":
                    got = self.compute_se3_covins_g(mp, kf_row, mp_c, c_row)
                    if got is None:
                        continue
                    T_12, n_inl, cov = got
                    matches = None
                else:
                    got = self.compute_se3_covins(mp, kf_row, mp_c, c_row)
                    if got is None:
                        continue
                    T_12, n_inl, matches = got
                    cov = None
                self.last_loop_kf_id = kf_id[0]
                result = LoopResult(
                    query_id=kf_id, candidate_id=cand_id,
                    T_12=T_12, n_inliers=n_inl, cov=cov, matches=matches,
                )
                break
        if pre is None:
            n_feat = int(mp.kf_n_feat[kf_row])
            if n_feat > 0:
                self.db.add_keyframe(kf_id, mp.pr_descriptors(kf_row)[:n_feat])
        return result
