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
        self.stats = {"keyframes": 0, "landmarks": 0, "loops": 0,
                      "merges": 0, "duplicates": 0}

    def _current_map(self):
        return self.manager.map_of(self.client_id)

    def ingest(self, msg) -> Optional[str]:
        """Feed one message.  Returns 'loop'/'merge' when one was closed."""
        if isinstance(msg, msgs.MsgKeyframe):
            mp = self._current_map()
            if mp.kf_row(tuple(msg.id)) >= 0:  # resumed agent replaying
                self.stats["duplicates"] += 1
                return None
            out = self._finalize_pending()
            # place recognition may have MERGED this agent's map away —
            # re-resolve before mutating (`PerformMerge` re-points all
            # clients of the fused map, `map_be.cpp:192-244`)
            mp = self._current_map()
            with self.metrics.timer("ingest_kf"):
                mp.add_keyframe(msg)
            self._pending_kf_id = tuple(msg.id)
            self.stats["keyframes"] += 1
            self.metrics.count("keyframes")
            if self.cfg.activate_lm_culling:
                mp.landmark_culling(min_obs=2, max_gap=5)
            return out
        if isinstance(msg, msgs.MsgLandmark):
            mp = self._current_map()
            if mp.lm_row(tuple(msg.id)) >= 0:
                # re-sent landmark: merge new observations + refresh pos
                # (`communicator_be.cpp:172-176`)
                self.stats["duplicates"] += 1
                mp.add_landmark(msg)
                return None
            mp.add_landmark(msg)
            self.stats["landmarks"] += 1
            return None
        if isinstance(msg, msgs.MsgKeyframeUpdate):
            if self.cfg.send_updates:
                self._current_map().update_keyframe_pose(msg)
            return None
        if isinstance(msg, msgs.MsgLandmarkUpdate):
            # gated on `comm.send_updates` (`communicator_be.cpp:157-163`)
            if self.cfg.send_updates:
                self._current_map().update_landmark_pos(msg)
            return None
        raise TypeError(f"unknown message type {type(msg)}")

    def _finalize_pending(self) -> Optional[str]:
        """Run place recognition for the keyframe whose landmark batch is
        now complete."""
        if self._pending_kf_id is None:
            return None
        kf_id = self._pending_kf_id
        self._pending_kf_id = None
        mp = self._current_map()
        row = mp.kf_row(kf_id)
        if row < 0:
            return None
        # refresh landmark attributes for this KF's cohort (ProcessNewKeyframes)
        o = mp.n_obs
        sel = (mp.obs_kf[:o] == row) & mp.obs_mask[:o]
        mp.update_landmark_attributes(np.unique(mp.obs_lm[:o][sel]))
        with self.metrics.timer("placerec"):
            loop = self.placerec.process_keyframe(mp, row)
        if loop is None:
            return None
        outcome = self.manager.handle_loop(loop)
        if outcome == "loop":
            self.stats["loops"] += 1
        elif outcome == "merge":
            self.stats["merges"] += 1
        return outcome

    def flush(self) -> Optional[str]:
        """Process the final buffered keyframe (agent finished)."""
        return self._finalize_pending()
