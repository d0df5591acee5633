"""Map manager: per-agent map registry, loop correction, map merging.

TPU-native re-design of the reference `MapManager`
(`covins_backend/src/covins_backend/map_be.cpp:37-322`): the checkout/
return mutex protocol becomes plain synchronous method calls on the host
orchestration thread (the compute-heavy work happens inside jit'd kernels
that operate on snapshots), and the merge queue becomes an immediate
`perform_merge` (the reference queues merges only to serialize them across
threads, `RegisterMerge`/`CheckMergeBuffer`, `:169-244`).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from covins_tpu.models.kf_database import KeyframeDatabase
from covins_tpu.models.map_store import Map
from covins_tpu.models.placerec import LoopResult
from covins_tpu.ops import pgo as pgo_mod
from covins_tpu.utils import geometry as geo
from covins_tpu.utils.config import Config


class MapManager:
    def __init__(self, vocabulary: np.ndarray, config: Optional[Config] = None,
                 output_dir: Optional[str] = None):
        self.cfg = config or Config()
        self.database = KeyframeDatabase(vocabulary)
        self.maps: Dict[int, Map] = {}
        self.map_of_client: Dict[int, int] = {}
        self._next_map_id = 0
        self.n_merges = 0
        self.n_loops = 0
        self.n_fused = 0  # landmarks deduplicated by loop fusion
        # map id -> PGO pose seed for loops applied with defer_pgo=True
        self.pending_pgo: Dict[int, Optional[np.ndarray]] = {}
        # when set, maps write trajectories every 50 KFs (`map_be.cpp:391-395`)
        self.output_dir = output_dir

    def _attach(self, mp: Map):
        mp.database = self.database
        if self.output_dir:
            mp.traj_dir = self.output_dir
            mp.traj_fmt = self.cfg.trajectory_format

    # ------------------------------------------------------------- registry
    def init_map(self, client_id: int) -> Map:
        """`MapManager::InitializeMap` — one fresh map per new agent."""
        mp = Map(
            self._next_map_id,
            desc_bytes=self.cfg.desc_length,
            desc_dtype=(np.float32 if self.cfg.feat_type == "SIFT" else np.uint8),
        )
        self._attach(mp)
        self.maps[mp.id] = mp
        self.map_of_client[client_id] = mp.id
        self._next_map_id += 1
        return mp

    def register_map(self, mp: Map):
        """`MapManager::RegisterMap` — attach a loaded map."""
        mp.id = self._next_map_id
        self._attach(mp)
        self._next_map_id += 1
        self.maps[mp.id] = mp
        for cid in mp.associated_clients:
            self.map_of_client[cid] = mp.id
        # re-index its keyframes into the retrieval database
        for row in mp.live_kf_rows():
            nf = int(mp.kf_n_feat[row])
            if nf > 0:
                kid = tuple(mp.kf_ids[row])
                self.database.add_keyframe(kid, mp.descriptors[row, :nf])

    def map_of(self, client_id: int) -> Map:
        return self.maps[self.map_of_client[client_id]]

    def resolve(self, kf_id: tuple) -> Tuple[Optional[Map], int]:
        """kf id -> (map, row) across all registered maps.

        O(1) in the common case: a keyframe id is (kf, client), and the
        owning client's map (kept current across merges by
        `map_of_client`) almost always holds it — each map's `kf_row` is
        itself a dict lookup.  The scan fallback only runs for keyframes
        of de-registered clients (e.g. loaded maps with no live session).
        """
        mid = self.map_of_client.get(int(kf_id[1]))
        if mid is not None:
            mp = self.maps.get(mid)
            if mp is not None:
                row = mp.kf_row(kf_id)
                if row >= 0:
                    return mp, row
        for mp in self.maps.values():
            row = mp.kf_row(kf_id)
            if row >= 0:
                return mp, row
        return None, -1

    # --------------------------------------------------------------- loops
    def handle_loop(self, loop: LoopResult, defer_pgo: bool = False) -> str:
        """`CorrectLoop` (`placerec_be.cpp:287-344`): same map -> fuse
        duplicated landmarks, add the constraint, seed PGO with corrected
        poses; different maps -> merge.  Returns 'loop' | 'merge' |
        'ignored'.

        ``defer_pgo`` records the PGO seed in `pending_pgo` instead of
        solving immediately — the window-batched drain closes several
        loops per drain and one PGO over the final constraint set equals
        N intermediate solves (the constraints accumulate in the map;
        only the seed of the LAST correction is kept).  Callers run
        :meth:`flush_pending_pgo` at window end."""
        mp_q, q_row = self.resolve(loop.query_id)
        mp_c, c_row = self.resolve(loop.candidate_id)
        if mp_q is None or mp_c is None:
            return "ignored"
        if mp_q is mp_c:
            # duplicate-constraint guard (`placerec_be.cpp:295-305`)
            for lc in mp_q.loops:
                if {lc["kf1"], lc["kf2"]} == {q_row, c_row}:
                    return "ignored"
            # corrected poses BEFORE fusing/constraint so the deltas come
            # from the uncorrected state (`ConnectLoop`, `placerec_be.cpp:222-285`)
            corrected = self._corrected_poses(mp_q, q_row, c_row, loop.T_12)
            self._apply_fusion(mp_q, q_row, loop.matches)
            mp_q.add_loop_constraint(q_row, c_row, self._loop_T_c_q(loop),
                                     cov=loop.cov)
            self.n_loops += 1
            if self.cfg.perform_pgo:
                if defer_pgo:
                    self.pending_pgo[mp_q.id] = corrected
                else:
                    self.run_pgo(mp_q, poses_init=corrected)
            return "loop"
        self.perform_merge(mp_q, q_row, mp_c, c_row, loop,
                           defer_pgo=defer_pgo)
        return "merge"

    def flush_pending_pgo(self):
        """Run the deferred PGO solves queued by
        ``handle_loop(defer_pgo=True)`` — one per affected map."""
        pending, self.pending_pgo = self.pending_pgo, {}
        for mid, seed in pending.items():
            mp = self.maps.get(mid)
            if mp is None:
                continue  # merged away; the target map has its own entry
            if seed is not None and len(seed) != mp.n_kf:
                seed = None  # map grew/merged since the seed was taken
            self.run_pgo(mp, poses_init=seed)

    def _corrected_poses(self, mp: Map, q_row: int, c_row: int,
                         T_12: np.ndarray) -> np.ndarray:
        """Corrected poses for the query's covisible set and successor
        chain (`ConnectLoop` `placerec_be.cpp:222-285` +
        `Map::ApplyLoopCorrection` `map_be.cpp:411-431`): the loop
        transform implies a world-frame left-delta for the query; apply it
        to the query, its covisible neighborhood, and every successor —
        PGO then starts near the closed solution instead of having to pull
        a potentially huge accumulated drift in
        (`optimization_be.cpp:875-887`)."""
        import jax.numpy as jnp

        n = mp.n_kf
        poses = mp.kf_pose[:n].copy()
        T_w_sq = jnp.asarray(poses[q_row])
        T_w_sc = jnp.asarray(poses[c_row])
        T_w_sq_corr = geo.pose_compose(
            T_w_sc, geo.pose_inverse(jnp.asarray(T_12, np.float64))
        )
        delta = np.asarray(
            geo.pose_compose(T_w_sq_corr, geo.pose_inverse(T_w_sq))
        )
        rows = {int(q_row)}
        covis = mp.covis_weights(q_row)
        rows |= {int(r) for r in np.where(covis > 0)[0]}
        r = int(mp.kf_succ[q_row])
        while r >= 0:
            rows.add(r)
            r = int(mp.kf_succ[r])
        rows = np.asarray(sorted(rows), np.int64)
        poses[rows] = np.asarray(
            geo.pose_compose(jnp.asarray(delta)[None], jnp.asarray(poses[rows]))
        )
        return poses

    def _apply_fusion(self, mp: Map, q_row: int, matches: Optional[np.ndarray]):
        """Landmark fusion for the verified loop matches (`ConnectLoop`
        match handling, `placerec_be.cpp:265-282`): the query's own
        landmark at a matched feature fuses into the loop landmark; bare
        features gain an observation of the loop landmark."""
        if matches is None or len(matches) == 0:
            return
        refreshed = []
        for feat, c_lm in np.asarray(matches, np.int64):
            feat, c_lm = int(feat), int(c_lm)
            if not mp.lm_mask[c_lm]:
                continue
            q_lm = int(mp.kf_feat_lm[q_row, feat])
            if q_lm == c_lm:
                continue
            if q_lm >= 0:
                if mp.fuse_landmark(target=c_lm, tofuse=q_lm):
                    self.n_fused += 1
            else:
                if q_row in set(int(k) for k in mp.observing_kfs(c_lm)):
                    continue
                mp.add_observation(q_row, c_lm, feat)
            refreshed.append(c_lm)
        if refreshed:
            mp.update_landmark_attributes(np.unique(np.asarray(refreshed)))

    @staticmethod
    def _loop_T_c_q(loop: LoopResult) -> np.ndarray:
        """Loop edges are stored as T_12 between (kf1=query, kf2=candidate)
        meaning T_{kf1}_{kf2} = T_sq_sc — exactly loop.T_12."""
        return np.asarray(loop.T_12, np.float64)

    def perform_merge(self, mp_q: Map, q_row: int, mp_c: Map, c_row: int,
                      loop: LoopResult, defer_pgo: bool = False):
        """`MapManager::PerformMerge` (`map_be.cpp:192-244`): fuse the
        query's map into the candidate's map with
        ``T_wc_wq = T_wc_sc * T_12^-1 * T_sq_wq``."""
        T_12 = jnp.asarray(loop.T_12)  # T_sq_sc
        T_wq_sq = jnp.asarray(mp_q.kf_pose[q_row])
        T_wc_sc = jnp.asarray(mp_c.kf_pose[c_row])
        T_wc_wq = geo.pose_compose(
            T_wc_sc, geo.pose_compose(geo.pose_inverse(T_12),
                                      geo.pose_inverse(T_wq_sq))
        )
        kf_off = mp_c.n_kf
        mp_c.merge_from(mp_q, np.asarray(T_wc_wq))
        # the fused query row is offset into the target map
        q_row_merged = q_row + kf_off
        # fuse duplicated landmarks: the candidate-map landmark rows in the
        # match set are unchanged by the merge; the query's own landmarks
        # moved by lm_off (handled through kf_feat_lm, already re-indexed)
        self._apply_fusion(mp_c, q_row_merged, loop.matches)
        mp_c.add_loop_constraint(q_row_merged, c_row,
                                 self._loop_T_c_q(loop), cov=loop.cov)
        # re-point all clients of the fused map
        for cid in list(mp_q.associated_clients):
            self.map_of_client[cid] = mp_c.id
        self.maps.pop(mp_q.id, None)
        # a pending seed for the absorbed map no longer applies
        self.pending_pgo.pop(mp_q.id, None)
        self.n_merges += 1
        self.n_loops += 1
        if self.cfg.perform_pgo:
            if defer_pgo:
                self.pending_pgo[mp_c.id] = None
            else:
                self.run_pgo(mp_c)

    def replay_placerec(self, mp: Map, perform_pgo: bool = True) -> dict:
        """Replay a LOADED map's keyframes through place recognition
        (`CallbackLoadMap` optional placerec pass, `backend.cpp:247-283`):
        keyframes sorted by stamp (newest first, as the reference does),
        each queried against the full database — loops found against
        previously loaded maps trigger merges, intra-map loops add
        constraints; optionally finish with PGO."""
        from covins_tpu.models.placerec import PlaceRecognition

        client = min(mp.associated_clients) if mp.associated_clients else -1
        pr = PlaceRecognition(client, self.database, self.resolve, self.cfg)
        rows = mp.live_kf_rows()
        rows = rows[np.argsort(-mp.kf_stamp[rows])]
        kf_ids = [tuple(mp.kf_ids[r]) for r in rows]
        n_loops0, n_merges0 = self.n_loops, self.n_merges
        # the replay's PGO choice comes from the service action code, not
        # the config (`backend.cpp:214-237` action semantics)
        pgo_flag = self.cfg.perform_pgo
        self.cfg.perform_pgo = perform_pgo
        try:
            for kid in kf_ids:
                cur, row = self.resolve(kid)
                if cur is None:
                    continue
                loop = pr.process_keyframe(cur, row)
                if loop is not None:
                    self.handle_loop(loop)
        finally:
            self.cfg.perform_pgo = pgo_flag
        return {"loops": self.n_loops - n_loops0,
                "merges": self.n_merges - n_merges0}

    # ----------------------------------------------------------------- PGO
    def run_pgo(self, mp: Map, poses_init: Optional[np.ndarray] = None):
        cfg = self.cfg
        g = mp.to_pose_graph(
            wt_kf_R=cfg.wt_kf_R, wt_kf_T=cfg.wt_kf_T,
            use_nbr_kfs=cfg.use_nbr_kfs,
            wt_kf_n1=cfg.wt_kf_n1, wt_kf_n23=cfg.wt_kf_n23,
            wt_kf_n45=cfg.wt_kf_n45,
            fix_optimized_kfs=cfg.pgo_fix_kfs_after_gba,
            poses_init=poses_init,
        )
        poses, _ = pgo_mod.optimize_pose_graph(
            g, n_gn=self.cfg.pgo_iteration_limit, n_cg=100,
            cauchy_scale=(self.cfg.robust_loss_threshold
                          if self.cfg.use_robust_loss else 0.0),
        )
        mp.apply_pose_graph_result(np.asarray(poses))

    # --------------------------------------------------------------- admin
    def run_gba(self, map_id: int, visual_only: bool = False,
                outlier_removal: bool = True,
                time_budget_s: float | None = None):
        """`CallbackGBA` action semantics (`backend.cpp:128-176`): action
        codes select visual-only and outlier-removal variants; the whitened
        residual is pruned at `th_gba_outlier_global` directly (0.92, the
        Ceres residual-norm threshold, `optimization_be.cpp:269-292`).
        After write-back, landmark attributes (representative descriptor +
        normal) are refreshed — the re-covisibility step of the reference;
        covisibility itself is derived from the live observation COO here,
        so pruned observations update it implicitly."""
        from covins_tpu.ops import gba as gba_mod

        mp = self.maps[map_id]
        p = mp.to_gba_problem()
        p2, info = gba_mod.global_bundle_adjustment(
            p, n_gn=self.cfg.gba_iteration_limit, n_cg=60,
            visual_only=visual_only,
            outlier_removal=outlier_removal,
            th_outlier=self.cfg.th_gba_outlier_global,
            time_budget_s=time_budget_s,
        )
        mp.apply_gba_result(p2)
        if outlier_removal and info.get("n_pruned", 0) > 0:
            mp.update_landmark_attributes()
        return info
