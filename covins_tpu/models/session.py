"""Per-agent server session: the ingest -> place-recognition -> correction
pipeline (the reference's server-side `Communicator::Run` loop body,
`covins_backend/src/covins_backend/communicator_be.cpp:215-260`, and
`AgentHandler` wiring, `handler_be.cpp:34-57`) as synchronous host
orchestration around jit'd kernels.

Message-processing semantics preserved:
* keyframe messages construct rows + connections (`ProcessKeyframeMessages`);
* landmark messages bind observations (`ProcessLandmarkMessages`);
* a keyframe enters place recognition once its landmark batch has arrived
  (`ProcessNewKeyframes` pushes to the placerec queue) — here: when the
  NEXT keyframe arrives or on flush();
* landmark culling runs per iteration (`LandmarkCulling(2, 5)`,
  `communicator_be.cpp:71-105`).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from covins_tpu.comm import messages as msgs
from covins_tpu.models.map_manager import MapManager
from covins_tpu.models.placerec import PlaceRecognition
from covins_tpu.utils.config import Config
from covins_tpu.utils.metrics import Metrics


class AgentSession:
    """Server-side state for one connected agent.

    Unlike the reference — which fatally errors when an agent re-sends a
    known keyframe id after a front-end reset (`readme.md:315-318`) —
    sessions are RESUMABLE: duplicate keyframes/landmarks are skipped, so
    an agent may reconnect and replay from anywhere in its stream.
    """

    def __init__(self, client_id: int, manager: MapManager,
                 config: Optional[Config] = None,
                 metrics: Optional[Metrics] = None):
        self.client_id = client_id
        self.manager = manager
        self.cfg = config or manager.cfg
        self.metrics = metrics or Metrics()
        self.map = manager.init_map(client_id)
        self.placerec = PlaceRecognition(
            client_id, manager.database, manager.resolve, self.cfg
        )
        self._pending_kf_id: Optional[tuple] = None
        # deferred place-recognition queue (cfg.placerec_defer): the
        # reference runs detection/verification in its own thread
        # (`placerec_be.cpp:508-537` CheckBuffer loop); here the queue is
        # drained when the server worker is idle (single-writer preserved)
        self._pr_queue: list = []
        self.stats = {"keyframes": 0, "landmarks": 0, "loops": 0,
                      "merges": 0, "duplicates": 0}

    def _current_map(self):
        return self.manager.map_of(self.client_id)

    def ingest(self, msg) -> Optional[str]:
        """Feed one message.  Returns 'loop'/'merge' when one was closed."""
        out = self.ingest_many([msg])
        return out[0] if out else None

    def ingest_many(self, messages) -> list:
        """Feed a WINDOW of messages (the TPU-native analog of the
        reference placerec thread draining its queue, `placerec_be.cpp:
        508-537` + `CheckBufferExt`): host bookkeeping runs in stream
        order, then the keyframes whose landmark batches completed are
        finalized together — one batched device dispatch for the BoW
        insert+query of the whole window (`KeyframeDatabase.
        add_and_query_batch`) instead of per-keyframe round-trips.

        Returns the list of non-None loop/merge outcomes."""
        finalized: list[tuple] = []
        lm_buffer: list = []  # consecutive landmark msgs, bulk-inserted

        def flush_lms():
            if lm_buffer:
                self._current_map().add_landmarks_batch(lm_buffer)
                lm_buffer.clear()

        for msg in messages:
            if isinstance(msg, msgs.MsgKeyframe):
                flush_lms()
                mp = self._current_map()
                if mp.kf_row(tuple(msg.id)) >= 0:  # resumed agent replaying
                    self.stats["duplicates"] += 1
                    continue
                if self._pending_kf_id is not None:
                    finalized.append(self._pending_kf_id)
                with self.metrics.timer("ingest_kf"):
                    mp.add_keyframe(msg)
                self._pending_kf_id = tuple(msg.id)
                self.stats["keyframes"] += 1
                self.metrics.count("keyframes")
                if self.cfg.activate_lm_culling:
                    mp.landmark_culling(min_obs=2, max_gap=5)
            elif isinstance(msg, msgs.MsgLandmark):
                mp = self._current_map()
                if mp.lm_row(tuple(msg.id)) >= 0:
                    # re-sent landmark: merge new observations + refresh pos
                    # (`communicator_be.cpp:172-176`).  Flush first so an
                    # intra-window insert of the same id keeps stream order.
                    flush_lms()
                    self.stats["duplicates"] += 1
                    mp.add_landmark(msg)
                    continue
                lm_buffer.append(msg)
                self.stats["landmarks"] += 1
            elif isinstance(msg, msgs.MsgKeyframeUpdate):
                if self.cfg.send_updates:
                    self._current_map().update_keyframe_pose(msg)
            elif isinstance(msg, msgs.MsgLandmarkUpdate):
                # gated on `comm.send_updates` (`communicator_be.cpp:157-163`).
                # Flush buffered landmark inserts first: an update arriving
                # between a landmark's creation and the next keyframe must
                # see the row or it would be silently dropped.
                if self.cfg.send_updates:
                    flush_lms()
                    self._current_map().update_landmark_pos(msg)
            else:
                raise TypeError(f"unknown message type {type(msg)}")
        flush_lms()
        return self._finalize_many(finalized)

    def _finalize_many(self, kf_ids: list) -> list:
        """Place recognition for keyframes whose landmark batches are now
        complete (`ProcessNewKeyframes`, `communicator_be.cpp:181-205`)."""
        if not kf_ids:
            return []
        mp = self._current_map()
        rows = [mp.kf_row(k) for k in kf_ids]
        live = [(k, r) for k, r in zip(kf_ids, rows) if r >= 0]
        if not live:
            return []

        # 1. one batched landmark-attribute refresh for the union cohort
        # (lazy under deferred placerec: dispatch now, commit at drain —
        # the ingest hot path then performs no host<->device sync at all)
        defer = bool(self.cfg.placerec_defer)
        o = mp.n_obs
        row_arr = np.asarray([r for _, r in live], np.int64)
        sel = np.isin(mp.obs_kf[:o], row_arr) & mp.obs_mask[:o]
        mp.update_landmark_attributes(np.unique(mp.obs_lm[:o][sel]),
                                      lazy=defer)

        # 2. one batched BoW insert+query for the window
        with_feats = [(k, r) for k, r in live if int(mp.kf_n_feat[r]) > 0]
        pre_of: dict = {}
        if with_feats:
            pres = self.placerec.db.add_and_query_batch(
                [k for k, _ in with_feats],
                [mp.pr_descriptors(r)[: int(mp.kf_n_feat[r])]
                 for _, r in with_feats],
                lazy=defer,
            )
            pre_of = {k: p for (k, _), p in zip(with_feats, pres)}

        # 3. per-keyframe detection/verification on the precomputed scores
        items = [(kf_id, pre_of.get(kf_id)) for kf_id, _ in live]
        if self.cfg.placerec_defer:
            self._pr_queue.extend(items)
            return []
        return self._run_placerec(items)

    def _run_placerec(self, items) -> list:
        """Window-batched detect -> verify -> apply.

        The reference's PlaceRecognition thread verifies candidates one at
        a time (`placerec_be.cpp:508-537`); over a tunneled chip the old
        per-stage host syncs cost ~170 ms/candidate.  Here detection runs
        sequentially on the host (consistency groups are stateful), every
        surviving candidate's 5-stage verification is DISPATCHED
        asynchronously (one fused device call each, `ops/loopverify.py`),
        and results are fetched and applied in keyframe order — each fetch
        overlaps the remaining candidates' device compute.

        Sequential-semantics note: a loop accepted at keyframe i gates
        detection for keyframes within `consecutive_loop_dist`; detection
        ran optimistically before the verdicts, so the gate is re-applied
        at apply time and late-gated results are discarded.
        """
        from covins_tpu.models.placerec import LoopResult

        cfg = self.cfg
        outcomes = []
        # Phase 1: sequential host detection + async device dispatch
        jobs = []
        for kf_id, pre in items:
            mp = self._current_map()  # may have merged mid-window
            row = mp.kf_row(kf_id)
            if row < 0:
                continue
            dispatched = []
            if cfg.placerec_active:
                with self.metrics.timer("placerec_detect"):
                    cands = self.placerec.detect_loop(mp, row, pre=pre)
                for cand_id in cands:
                    mp_c, c_row = self.manager.resolve(cand_id)
                    if mp_c is None:
                        continue
                    job = self.placerec.dispatch_verify(mp, row, mp_c, c_row)
                    if job is not None:
                        dispatched.append((cand_id, mp_c, job))
            if dispatched:
                jobs.append((kf_id, dispatched))
            if pre is None:
                # non-batched path: the DB insert process_keyframe would do
                n_feat = int(mp.kf_n_feat[row])
                if n_feat > 0:
                    self.placerec.db.add_keyframe(
                        kf_id, mp.pr_descriptors(row)[:n_feat])
        # Phase 2: in-order finalize (ONE host fetch per candidate) + apply
        for kf_id, dispatched in jobs:
            if (kf_id[0] - self.placerec.last_loop_kf_id
                    < cfg.consecutive_loop_dist):
                continue  # loop accepted earlier in this window gates this KF
            for cand_id, mp_c_snap, job in dispatched:
                with self.metrics.timer("placerec_verify"):
                    got = self.placerec.finalize_verify(job)
                if got is None:
                    continue
                T_12, n_inl, cov, matches = got
                matches = self._rebind_matches(cand_id, mp_c_snap, matches)
                self.placerec.last_loop_kf_id = kf_id[0]
                loop = LoopResult(
                    query_id=kf_id, candidate_id=cand_id, T_12=T_12,
                    n_inliers=n_inl, cov=cov, matches=matches,
                )
                # PGO is deferred to one solve per affected map at window
                # end: the constraints accumulate in the map, so N
                # intermediate solves equal the final one — this drops the
                # drain's dominant cost (measured ~2 s per on-chip PGO,
                # once per accepted loop)
                outcome = self.manager.handle_loop(loop, defer_pgo=True)
                if outcome == "loop":
                    self.stats["loops"] += 1
                elif outcome == "merge":
                    self.stats["merges"] += 1
                if outcome in ("loop", "merge"):
                    outcomes.append(outcome)
                break  # first accepted candidate wins (placerec_be.cpp:529)
        with self.metrics.timer("placerec_pgo"):
            self.manager.flush_pending_pgo()
        return outcomes

    def _rebind_matches(self, cand_id, mp_c_snap, matches):
        """Landmark rows in a verification result index the candidate map
        AT DISPATCH TIME; if that map was merged away by an earlier loop in
        the same window, translate rows through the stable landmark ids."""
        if matches is None or len(matches) == 0:
            return matches
        mp_now, _ = self.manager.resolve(cand_id)
        if mp_now is mp_c_snap or mp_now is None:
            return matches
        ids = mp_c_snap.lm_ids[matches[:, 1]]
        rows = np.asarray([mp_now.lm_row(tuple(int(x) for x in i))
                           for i in ids])
        keep = rows >= 0
        out = matches[keep].copy()
        out[:, 1] = rows[keep]
        return out

    @property
    def placerec_backlog(self) -> int:
        return len(self._pr_queue)

    def drain_placerec(self, max_items: Optional[int] = None) -> list:
        """Run deferred detection/verification for up to `max_items`
        queued keyframes (all, if None)."""
        n = len(self._pr_queue) if max_items is None else min(
            max_items, len(self._pr_queue))
        items = self._pr_queue[:n]
        del self._pr_queue[:n]
        # commit lazily-dispatched state the verifiers read: landmark
        # attributes (all maps — candidates may live elsewhere) and the
        # queued windows' BoW scores, each in one batched sync
        for mp in self.manager.maps.values():
            mp.commit_landmark_attributes()
        import jax

        dev = [p for _, p in items
               if p is not None and not isinstance(p["scores"], np.ndarray)]
        if dev:
            fetched = jax.device_get([(p["scores"], p["common"])
                                      for p in dev])
            for p, (s, c) in zip(dev, fetched):
                p["scores"], p["common"] = s, c
        return self._run_placerec(items)

    def flush(self) -> Optional[str]:
        """Process the final buffered keyframe and drain any deferred
        place-recognition backlog (agent finished)."""
        outs = []
        if self._pending_kf_id is not None:
            kf_id = self._pending_kf_id
            self._pending_kf_id = None
            outs = list(self._finalize_many([kf_id]))
        outs += self.drain_placerec()
        return outs[0] if outs else None
