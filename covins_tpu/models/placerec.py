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


_CAM_CACHE: dict = {}


def _camera_of(mp: Map, client_id: int) -> cam_mod.Camera:
    """Device-resident Camera per calibration object.  Cached so repeated
    verifications ship ZERO calibration bytes over the (tunneled) device
    link — each pytree leaf would otherwise be its own transfer RPC.  The
    cache holds a strong reference to the calibration, so the id() key
    cannot be re-used while the entry lives."""
    calib = mp.calib[client_id]
    hit = _CAM_CACHE.get(id(calib))
    if hit is not None and hit[0] is calib:
        return hit[1]
    cam = cam_mod.Camera(
        intrinsics=jnp.asarray(calib.intrinsics, jnp.float64),
        dist=jnp.asarray(calib.dist, jnp.float64),
        T_s_c=jnp.asarray(calib.T_s_c, jnp.float64),
        cam_model=calib.cam_model,
        dist_model=calib.dist_model,
    )
    _CAM_CACHE[id(calib)] = (calib, cam)
    return cam


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
            # AND the insert-time snapshot with the LIVE mask: rows erased
            # between enqueue and drain (kf culling / prunemap) must not be
            # candidate-eligible, matching the non-deferred `db.query` path
            m = (pre["valid"][:n_pre] & self.db._mask[:n_pre]
                 & ~excl[:n_pre])
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
    def dispatch_verify_covins(self, mp_q: Map, q_row: int,
                               mp_c: Map, c_row: int):
        """Landmark-based loop verification (`ComputeSE3`,
        `placerec_be.cpp:63-220`), all five reference stages fused into ONE
        asynchronous device dispatch (see `ops/loopverify.py`):

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

        Returns an opaque job for `loopverify.finalize_covins_verify`
        (None if host preconditions fail)."""
        from covins_tpu.ops import loopverify

        cam_q = _camera_of(mp_q, int(mp_q.kf_ids[q_row, 1]))
        cam_c = _camera_of(mp_c, int(mp_c.kf_ids[c_row, 1]))
        return loopverify.dispatch_covins_verify(
            self._next_key(), mp_q, q_row, mp_c, c_row, self.cfg,
            cam_q, cam_c,
        )

    def compute_se3_covins(self, mp_q: Map, q_row: int, mp_c: Map, c_row: int):
        """Synchronous wrapper: dispatch + finalize in one call.

        Returns (T_12, n_inliers, matches (M,2) [q_feat, c_lm_row]) or
        None.  The batched drain path uses dispatch/finalize directly so a
        window of candidates pays ONE host fetch each, overlapped."""
        from covins_tpu.ops import loopverify

        job = self.dispatch_verify_covins(mp_q, q_row, mp_c, c_row)
        return loopverify.finalize_covins_verify(job)

    def compute_se3_covins_g(self, mp_q: Map, q_row: int, mp_c: Map, c_row: int):
        """2D-only loop transform (`placerec_gen_be.cpp:82-167` +
        `RelNonCentralPosSolver`): per-pair ratio matching over the rigs'
        pose-estimation features with a per-pair CENTRAL relative-pose
        prefilter (the 5pt STEWENIUS stage, `RelNonCentralPosSolver.cpp:
        127,343-377` — the batched Nister 5pt by default, linear 8pt via
        `placerec.rel_minimal_solver: 8pt`), multi-keyframe 17-pt
        non-central RANSAC over the surviving correspondences, sampling
        covariance with the `cov_thres` gate, and the yaw + translation
        gate (`placerec_gen_be.cpp:156-167`).  Returns (T_12, n_inliers,
        cov)."""
        job = self.dispatch_verify_covins_g(mp_q, q_row, mp_c, c_row)
        if job is None:
            return None
        return self.finalize_covins_g(job)

    def dispatch_verify_covins_g(self, mp_q: Map, q_row: int,
                                 mp_c: Map, c_row: int):
        """Rig assembly + ONE fused async device dispatch of the COVINS-G
        pipeline (`ops/loopverify._covinsg_verify_impl`): per-pair ratio
        matching, the central 5pt/8pt prefilter for ALL rig pairs in a
        single program (the round-4 port synced the host once per pair),
        pooled 17-pt non-central RANSAC, and sampling covariance.  Returns
        an opaque job for `finalize_covins_g`, or None when the rigs lack
        features (host precondition)."""
        from covins_tpu.ops import loopverify

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

        focal = float(mp_q.calib[int(mp_q.kf_ids[q_row, 1])].intrinsics[0])
        # minimal 5-pt (Nister; reference STEWENIUS parity) or linear
        # 8-pt, per `rel_minimal_solver`.  Each 5-pt sample yields up to
        # 10 essentials (vs the 8-pt's single E), so a quarter of the
        # hypothesis budget scores the same number of candidate poses at
        # the better minimal-sample inlier odds.
        if cfg.rel_minimal_solver == "5pt":
            n_hyp5 = min(max(cfg.rel_max_iters // 4, 16), 64)
        else:
            n_hyp5 = min(cfg.rel_max_iters, 256)
        # SIFT mode (`feat.type: SIFT`): L2 matching, FLANN role
        # (`placerec_gen_be.cpp:82-126`); thresholds are linear L2
        metric = "hamming" if dq.dtype == np.uint8 else "l2"
        out = loopverify._covinsg_verify_impl(
            self._next_key(),
            qo, qd, co, cd,
            jnp.asarray(dq), jnp.asarray(dc),
            jnp.asarray(qmask), jnp.asarray(cmask),
            qbear, cbear,
            float(cfg.img_match_thres), float(cfg.ratio_thres),
            math.atan2(cfg.rel_error_thres, focal),
            cfg.rel_min_img_matches, cfg.rel_min_inliers,
            math.atan2(cfg.nc_rp_error, focal), cfg.nc_min_inliers,
            math.atan2(cfg.nc_rp_error_cov, focal),
            float(cfg.nc_cov_thres),
            nq_rig=len(q_rig), nc_rig=len(c_rig),
            Fq=mp_q.max_features, Fc=mp_c.max_features,
            n_hyp5=n_hyp5, n_hyp17=min(cfg.nc_max_iters, 512),
            n_cov=2 * cfg.nc_cov_iters,
            solver=cfg.rel_minimal_solver, metric=metric,
        )
        # candidate pose snapshot for the host-side yaw/translation gate
        meta = {"T_w_s_cand": mp_c.kf_pose[c_row].copy()}
        return meta, out

    def finalize_covins_g(self, job):
        """ONE host fetch of the fused COVINS-G result, then the
        yaw + translation gate (`placerec_gen_be.cpp:156-167`): the
        relative yaw between the candidate's world yaw and the query's
        loop-corrected world yaw, and the loop translation magnitude.
        Returns (T_12, n_inliers, cov (6,6)) or None."""
        from covins_tpu.utils import npgeo

        cfg = self.cfg
        meta, out = job
        out = jax.device_get(out)
        if not bool(out["ok"]):
            if self._debug:
                self._reject(
                    "covins_g_fused", pairs_ok=bool(out["pairs_ok"]),
                    n_pool=int(out["n_pool"]),
                    n_inl17=int(out["n_inliers"]),
                    cov_tr=float(np.trace(out["cov"])),
                    pair_n_match=out["pair_n_match"].tolist(),
                    pair_n_inl=out["pair_n_inl"].tolist(),
                )
            return None
        T_12 = np.asarray(out["T_12"])
        cov = np.asarray(out["cov"])
        T_21 = npgeo.pose_inverse(T_12)  # T_smatch_squery
        T_w_s_cand = meta["T_w_s_cand"]

        def yaw_of(q):
            R = npgeo.quat_to_matrix(np.asarray(q))
            return math.atan2(R[1, 0], R[0, 0])  # ZYX yaw

        yaw_match = yaw_of(T_w_s_cand[:4])
        corrected = npgeo.pose_compose(T_w_s_cand, T_21)
        yaw_query = yaw_of(corrected[:4])
        rel_yaw = math.degrees(
            (yaw_query - yaw_match + math.pi) % (2 * math.pi) - math.pi
        )
        if abs(rel_yaw) > cfg.max_yaw or float(np.linalg.norm(T_21[4:7])) > cfg.max_trans:
            return self._reject("yaw_trans", yaw=rel_yaw,
                                trans=float(np.linalg.norm(T_21[4:7])))
        return T_12, int(out["n_inliers"]), cov

    # ----------------------------------------------- batched two-phase API
    def dispatch_verify(self, mp_q: Map, q_row: int, mp_c: Map, c_row: int):
        """Mode-dispatching verification kickoff for the window-batched
        drain: both modes go through their fused one-dispatch kernel.
        Returns an opaque job or None."""
        if self.cfg.placerec_type == "COVINS_G":
            job = self.dispatch_verify_covins_g(mp_q, q_row, mp_c, c_row)
            return None if job is None else ("g", job)
        job = self.dispatch_verify_covins(mp_q, q_row, mp_c, c_row)
        return None if job is None else ("covins", job)

    def finalize_verify(self, tagged):
        """Fetch/compute one dispatched verification.

        Returns (T_12, n_inliers, cov, matches) or None."""
        from covins_tpu.ops import loopverify

        kind, job = tagged
        if kind == "g":
            got = self.finalize_covins_g(job)
            if got is None:
                return None
            T_12, n_inl, cov = got
            return T_12, n_inl, cov, None
        got = loopverify.finalize_covins_verify(
            job, on_reject=(self._reject if self._debug else None))
        if got is None:
            return None
        T_12, n_inl, pairs = got
        return T_12, n_inl, None, pairs

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
