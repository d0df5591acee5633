"""Agent-side client: connect, receive the id handshake, stream messages.

The counterpart of the reference's agent `Communicator`
(`orb_slam3/src/comm/communicator.cpp:54-139` and
`CommunicatorBase::ConnectToServer`, `communicator_base.cpp:65-108`), as a
small synchronous socket wrapper usable from any front-end/replay process.
"""

from __future__ import annotations

import json
import socket
from typing import Optional

from covins_tpu.comm import messages as msgs
from covins_tpu.comm import wire


class AgentClient:
    def __init__(self, host: str = "127.0.0.1", port: int = 9871,
                 timeout: float = 30.0, resume_client_id: Optional[int] = None):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        # server->agent pushed messages (`data_to_client` plane,
        # `communicator_be.cpp:51-69`): keyframe-update messages carrying
        # server-optimized poses, collected while reading replies or via
        # `poll_updates()`
        self.updates: list = []
        self.client_id = self._recv_handshake()
        if resume_client_id is not None:
            self.sock.sendall(wire.frame(
                msgs.MSG_HANDSHAKE,
                json.dumps({"resume_client_id": resume_client_id}).encode(),
            ))
            self.client_id = resume_client_id

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("server closed connection")
            buf += chunk
        return buf

    def _recv_frame(self):
        hdr = self._recv_exact(wire.HEADER_SIZE)
        msg_type, plen = wire.parse_header(hdr)
        payload = self._recv_exact(plen)
        return msg_type, payload

    def _recv_handshake(self) -> int:
        msg_type, payload = self._recv_frame()
        assert msg_type == msgs.MSG_HANDSHAKE
        return int(json.loads(payload)["client_id"])

    def _stash(self, msg_type: int, payload: bytes) -> None:
        self.updates.append(wire.decode_message(msg_type, memoryview(payload)))

    def send(self, msg) -> None:
        self.sock.sendall(wire.encode_message(msg))

    def poll_updates(self, timeout: float = 0.0) -> list:
        """Drain any server-pushed messages; returns the accumulated list."""
        self.sock.settimeout(timeout if timeout > 0 else 0.000001)
        try:
            while True:
                msg_type, payload = self._recv_frame()
                self._stash(msg_type, payload)
        except (socket.timeout, BlockingIOError):
            pass
        finally:
            self.sock.settimeout(None)
        return self.updates

    def admin(self, verb: str, **kw) -> dict:
        from covins_tpu.comm.server import MSG_ADMIN, MSG_ADMIN_REPLY
        cmd = {"verb": verb, **kw}
        self.sock.sendall(wire.frame(MSG_ADMIN, json.dumps(cmd).encode()))
        while True:
            msg_type, payload = self._recv_frame()
            if msg_type == MSG_ADMIN_REPLY:
                return json.loads(payload)
            self._stash(msg_type, payload)  # pushed update in between

    def finish(self):
        try:
            self.sock.sendall(wire.frame(msgs.MSG_FINISH, b""))
        finally:
            self.sock.close()
