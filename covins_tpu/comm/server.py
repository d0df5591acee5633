"""TCP ingest server: the agent-facing plane of the back-end.

Re-design of the reference server front door (`CovinsBackend::Run` accept
loop, `covins_backend/src/covins_backend/backend.cpp:72-113,359-401` and
the per-agent server `Communicator`, `communicator_be.cpp`): an asyncio
acceptor assigns monotonically-increasing client ids (the handshake of
`communicator_be.cpp:41-48`), decodes wire frames into messages, and feeds
them to a single worker thread that owns all map mutation (the functional
equivalent of the reference's MapManager checkout/return protocol — one
writer, snapshot readers).

An admin channel on the same socket accepts JSON control frames carrying
the four ROS-service verbs (`backend.cpp:128-357`): gba / savemap /
loadmap / prunemap, plus stats.
"""

from __future__ import annotations

import asyncio
import json
import queue
import threading
from typing import Dict, Optional

import numpy as np

from covins_tpu.comm import messages as msgs
from covins_tpu.comm import wire
from covins_tpu.models.map_manager import MapManager
from covins_tpu.models.session import AgentSession
from covins_tpu.utils.config import Config

MSG_ADMIN = 100
MSG_ADMIN_REPLY = 101


class CovinsServer:
    def __init__(
        self,
        vocabulary: np.ndarray,
        config: Optional[Config] = None,
        host: str = "0.0.0.0",
        port: int = 9871,
        output_dir: str = "output",
    ):
        self.cfg = config or Config()
        self.host = host
        self.port = port
        self.output_dir = output_dir
        self.manager = MapManager(vocabulary, self.cfg)
        self.sessions: Dict[int, AgentSession] = {}
        self._next_client_id = 0
        self._work: "queue.Queue[tuple]" = queue.Queue()
        self._worker = threading.Thread(target=self._work_loop, daemon=True)
        self._stop = threading.Event()
        self._server: Optional[asyncio.AbstractServer] = None

    # ------------------------------------------------------------ worker
    def _work_loop(self):
        """Single map-mutation thread (the checkout-protocol replacement)."""
        while not self._stop.is_set():
            try:
                item = self._work.get(timeout=0.2)
            except queue.Empty:
                continue
            kind, payload, done = item
            try:
                if kind == "msg":
                    client_id, msg = payload
                    self.sessions[client_id].ingest(msg)
                elif kind == "finish":
                    client_id = payload
                    sess = self.sessions.get(client_id)
                    if sess:
                        sess.flush()
                        mp = self.manager.map_of(client_id)
                        mp.write_trajectories(
                            self.output_dir, fmt=self.cfg.trajectory_format
                        )
                elif kind == "admin":
                    cmd, reply = payload
                    reply["result"] = self._admin(cmd)
            except Exception as e:  # keep the worker alive; report
                if kind == "admin":
                    payload[1]["error"] = repr(e)
                else:
                    print(f"[covins-server] worker error: {e!r}")
            finally:
                if done is not None:
                    done.set()

    def _admin(self, cmd: dict):
        """The four service verbs (`backend.cpp:128-357`)."""
        verb = cmd.get("verb")
        if verb == "gba":
            map_id = int(cmd.get("map_id", 0))
            visual_only = bool(cmd.get("visual_only", False))
            info = self.manager.run_gba(map_id, visual_only=visual_only)
            mp = self.manager.maps[map_id]
            mp.write_trajectories(self.output_dir, fmt=self.cfg.trajectory_format)
            return {"ok": True, "n_pruned": info.get("n_pruned", 0),
                    "final_cost": float(np.asarray(info["costs"])[-1])}
        if verb == "pgo":
            map_id = int(cmd.get("map_id", 0))
            self.manager.run_pgo(self.manager.maps[map_id])
            return {"ok": True}
        if verb == "savemap":
            map_id = int(cmd.get("map_id", 0))
            path = cmd.get("path", f"{self.output_dir}/map_{map_id}.npz")
            self.manager.maps[map_id].save(path)
            return {"ok": True, "path": path}
        if verb == "loadmap":
            from covins_tpu.models.map_store import Map
            if self.sessions:
                # load only before agents register (`backend.cpp:198-202`)
                return {"ok": False, "error": "agents already registered"}
            mp = Map.load(cmd["path"])
            self.manager.register_map(mp)
            return {"ok": True, "map_id": mp.id, "n_kf": int(mp.kf_mask.sum())}
        if verb == "prunemap":
            map_id = int(cmd.get("map_id", 0))
            mp = self.manager.maps[map_id]
            removed = mp.remove_redundant_keyframes(
                threshold=self.cfg.kf_culling_th_red,
                max_time_dist=self.cfg.kf_culling_max_time_dist,
                target_kf_count=cmd.get("max_num_kfs"),
            )
            return {"ok": True, "removed": removed}
        if verb == "stats":
            return {
                "ok": True,
                "maps": {
                    mid: {"n_kf": int(mp.kf_mask[: mp.n_kf].sum()),
                          "n_lm": int(mp.lm_mask[: mp.n_lm].sum()),
                          "clients": sorted(mp.associated_clients),
                          "loops": len(mp.loops)}
                    for mid, mp in self.manager.maps.items()
                },
                "n_merges": self.manager.n_merges,
                "n_loops": self.manager.n_loops,
                "sessions": {cid: s.stats for cid, s in self.sessions.items()},
            }
        return {"ok": False, "error": f"unknown verb {verb}"}

    # ------------------------------------------------------------ asyncio
    async def _handle_conn(self, reader: asyncio.StreamReader,
                           writer: asyncio.StreamWriter):
        client_id = self._next_client_id
        self._next_client_id += 1
        self.sessions[client_id] = AgentSession(client_id, self.manager, self.cfg)
        # handshake: assign the client id (`communicator_be.cpp:41-48`)
        hs = wire.frame(msgs.MSG_HANDSHAKE,
                        json.dumps({"client_id": client_id}).encode())
        writer.write(hs)
        await writer.drain()
        try:
            while True:
                hdr = await reader.readexactly(wire.HEADER_SIZE)
                msg_type, plen = wire.parse_header(hdr)
                payload = await reader.readexactly(plen)
                if msg_type == msgs.MSG_FINISH:
                    break
                if msg_type == msgs.MSG_HANDSHAKE:
                    # resume request: re-attach to an existing session
                    # (improvement over the reference, which fatals on a
                    # reconnecting agent's duplicate KF ids, readme.md:315-318)
                    req = json.loads(bytes(payload))
                    rid = int(req.get("resume_client_id", -1))
                    if rid in self.sessions:
                        client_id = rid
                    continue
                if msg_type == MSG_ADMIN:
                    cmd = json.loads(bytes(payload))
                    reply: dict = {}
                    done = threading.Event()
                    self._work.put(("admin", (cmd, reply), done))
                    await asyncio.get_event_loop().run_in_executor(None, done.wait)
                    writer.write(wire.frame(MSG_ADMIN_REPLY,
                                            json.dumps(reply).encode()))
                    await writer.drain()
                    continue
                msg = wire.decode_message(msg_type, memoryview(payload))
                self._work.put(("msg", (client_id, msg), None))
        except (asyncio.IncompleteReadError, ConnectionResetError):
            pass  # hang-up == finish (`communicator_base.cpp:233-244`)
        finally:
            done = threading.Event()
            self._work.put(("finish", client_id, done))
            await asyncio.get_event_loop().run_in_executor(None, done.wait)
            writer.close()

    async def serve(self):
        self._worker.start()
        self._server = await asyncio.start_server(
            self._handle_conn, self.host, self.port
        )
        async with self._server:
            await self._server.serve_forever()

    def run(self):
        try:
            asyncio.run(self.serve())
        except KeyboardInterrupt:
            pass
        finally:
            self._stop.set()

    async def shutdown(self):
        if self._server:
            self._server.close()
            await self._server.wait_closed()
        self._stop.set()
